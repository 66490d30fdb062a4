"""Hop-exactness of the Python reference model vs the actual WASM blob.

Gated on the native wasm2c path (gcc + reference checkout).  These tests
pin the reverse-engineered algorithm (docs/WASM-ALGO.md): if the model
drifts from the blob, the JAX engine's fidelity mode has no anchor.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")
from golden_wasm import harness  # noqa: E402

pytestmark = pytest.mark.skipif(
    not harness.available(), reason="no WASM execution path (gcc)"
)


def _drive(semitones, rate, n_hops=12, seed=5,
           formant_semitones=0.0, formant_compensation=False,
           formant_base_hz=0.0, block=512, interval=128):
    import ctypes

    from golden_wasm.native import NativeStretch
    from golden_wasm.pymodel import ModelConfig, SpectralModel, analyse, blob_window

    cfg = ModelConfig(1, block, interval)
    B, F, I, WIN = cfg.bands, cfg.fft_size, cfg.interval, cfg.block
    wa = blob_window(WIN, I)
    rng = np.random.default_rng(seed)
    sr = 44100.0
    t = np.arange(44100) / sr
    track = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1318.5 * t)
        + 0.05 * rng.standard_normal(len(t))
    ).astype(np.float32)
    tpad = np.concatenate([np.zeros(2 * WIN), track, np.zeros(2 * WIN)])

    w = NativeStretch()
    w._configure(1, block, interval, 1)
    w._setTransposeSemitones(semitones, 8000.0 / sr)
    if formant_semitones or formant_compensation:
        w._setFormantSemitones(formant_semitones, 1 if formant_compensation else 0)
        w._setFormantBase(formant_base_hz / sr)
    out_lat = w._outputLatency()
    in_lat = w._inputLatency()
    buf_len = in_lat + out_lat
    ptr = w._setBuffers(1, buf_len)

    def u32(a):
        return int.from_bytes(
            bytes((ctypes.c_uint8 * 4).from_address(w.lib.wasm_mem_ptr() + a)),
            "little",
        )

    def f32(a):
        import struct

        return struct.unpack(
            "<f", bytes((ctypes.c_uint8 * 4).from_address(w.lib.wasm_mem_ptr() + a))
        )[0]

    def bands():
        n = B * 7
        arr = np.ctypeslib.as_array(
            (ctypes.c_float * n).from_address(w.lib.wasm_mem_ptr() + u32(6600))
        ).copy()
        return arr.reshape(B, 7)

    model = SpectralModel(cfg)
    # pin the engine's MINSTD state (addr 6672) to a fixed value, then sync
    # the model to it: the draws are only consumed when timeFactor > 2
    # (rate < 0.5), and pinning makes the error magnitude deterministic
    # (the recurrence's float-drift amplification is draw-dependent)
    (ctypes.c_uint32 * 1).from_address(w.lib.wasm_mem_ptr() + 6672)[0] = 271828183
    model.rng_state = u32(6672)
    mult = float(np.exp2(semitones / 12.0))
    limit = float(f32(6172))
    errs = []
    for q in range(n_hops):
        # drive one hop per call: render exactly `interval` output samples
        # (the reference worklet uses 128-sample quanta, but the ABI's
        # _process(0, n) is n-agnostic; with n == interval each call fires
        # exactly one hop, which keeps this drive geometry-general —
        # overlap-1 configs have interval > the 128 quantum)
        ie = round((q * I + out_lat) * rate) + in_lat
        w.mem_f32(ptr, buf_len)[:] = tpad[ie + 2 * WIN - buf_len : ie + 2 * WIN]
        w._seek(buf_len, rate)
        w._process(0, I)
        S = bands()
        blob_out = S[:, 4] + 1j * S[:, 5]
        spec_in = analyse(tpad[ie + 2 * WIN - WIN : ie + 2 * WIN], wa, F)
        spec_prev = analyse(
            tpad[ie + 2 * WIN - WIN - I : ie + 2 * WIN - I], wa, F
        )
        out = model.hop(
            # blob seek law: timeFactor = f32(min(1/rate, interval)) — the
            # stored tf saturates once rate advances < 1 sample per hop
            spec_in[None], spec_prev[None], min(1.0 / rate, float(I)),
            freq_multiplier=mult, freq_tonality_limit=limit,
            formant_factor=float(np.exp2(formant_semitones / 12.0))
            if formant_semitones else 1.0,
            formant_compensation=formant_compensation,
            formant_base=formant_base_hz / sr,
        )
        errs.append(
            float(np.abs(out[0] - blob_out).max() / np.abs(blob_out).max())
        )
    return max(errs)


def test_identity_hops_exact():
    assert _drive(semitones=0.0, rate=0.5) < 1e-3


def test_pitch_up_hops_exact():
    assert _drive(semitones=12.0, rate=1.0) < 1e-3


def test_pitch_down_with_rate():
    assert _drive(semitones=-7.0, rate=1.25) < 1e-3


def test_extreme_stretch_minstd_hops_exact():
    """rate < 0.5 engages the blob's MINSTD-random vertical time step (the
    kiosk regime); the model must replicate the exact draw stream.  The
    threshold is looser than the deterministic cases: the random vertical
    steps amplify per-hop float drift (a WRONG draw stream errs at ~1.0,
    measured — tests/test_spectral.py pins the stream itself exactly)."""
    assert _drive(semitones=0.0, rate=0.25) < 1e-2


def test_extreme_stretch_minstd_with_pitch():
    assert _drive(semitones=5.0, rate=0.125) < 1e-2


def test_formant_shift_hops_exact():
    """Formant envelope shift (factor != 1, no compensation)."""
    assert _drive(semitones=0.0, rate=1.0, formant_semitones=5.0) < 1e-3


def test_formant_base_hops_exact():
    """Explicit formantBase replaces the auto f0 smoothing width."""
    assert _drive(semitones=0.0, rate=1.0, formant_semitones=-7.0,
                  formant_base_hz=200.0) < 1e-3


def test_formant_compensation_hops_exact():
    """Compensation: envelope lookup in transpose-mapped space."""
    assert _drive(semitones=12.0, rate=1.0, formant_compensation=True) < 1e-3


def test_overlap1_hops_exact():
    """The DEPLOYED kiosk geometry class: overlap = 1 (interval == block,
    reference app/multi/app.mjs:124-130 ships blockMs=200/overlap=1.0).
    Structurally distinct: no window overlap in the OLA and long_step =
    round(fft/interval) at its minimum of 1, so the long-step prediction
    family degenerates onto the one-bin shift.  The model must stay
    hop-exact vs the live blob there."""
    assert _drive(semitones=0.0, rate=1.0, block=512, interval=512) < 1e-3


def test_overlap1_extreme_stretch_minstd_hops_exact():
    """overlap-1 + rate << 0.5 — the kiosk's actual operating regime
    (MINSTD vertical steps at timeFactor = 1000)."""
    assert _drive(semitones=0.0, rate=0.001, block=512, interval=512) < 1e-2


def test_overlap1_pitch_hops_exact():
    assert _drive(semitones=7.0, rate=0.01, block=512, interval=512) < 1e-2


def test_formants_with_everything():
    """Pitch + rate + formant shift + compensation + MINSTD together."""
    assert _drive(semitones=3.0, rate=0.25, formant_semitones=-5.0,
                  formant_compensation=True, formant_base_hz=150.0) < 1e-2
