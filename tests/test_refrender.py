"""End-to-end fidelity of the full-loop numpy oracle vs the reference blob.

These tests close the loop SURVEY.md §4 prescribes: the exact reference
WASM engine (AOT-translated, tools/golden_wasm/native.py) is driven through
the worklet hot-loop semantics and compared in the time domain against the
reverse-engineered model (tools/golden_wasm/refrender.py).

The BASELINE bound (>=40 dB SNR, rate 0.5-2.0, +/-12 semitones) is asserted
on a deterministic harmonic test signal over a full 2 s render.  Chaos
context (measured, see docs/WASM-ALGO.md "Sensitivity"): the reference
renderer itself amplifies 1-ULP input perturbations to ~-63..-83 dB over
the same window on the same material, and its band recurrence amplifies
in-spectrum noise ~1000x within a single hop — so time-domain SNR against
it is bounded for ANY reimplementation; white-noise-heavy material
saturates lower (the phase of noise bands is chaotic), which is why the
golden material is tonal.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")
from golden_wasm import harness  # noqa: E402

pytestmark = pytest.mark.skipif(
    not harness.available(), reason="no WASM execution path (gcc)"
)

SR = 44100.0


def golden_signal(n: int) -> np.ndarray:
    """Deterministic harmonic two-note chord with per-harmonic AM."""
    t = np.arange(n) / SR
    x = np.zeros(n)
    for f0, a in ((220.0, 0.25), (330.0, 0.18)):
        for k in range(1, 4):
            x += (
                (a / k)
                * np.sin(2 * np.pi * f0 * k * t + 0.1 * k)
                * (1 + 0.15 * np.sin(2 * np.pi * (1.5 + 0.3 * k) * t))
            )
    return x.astype(np.float32)


def snr_model_vs_blob(rate: float, semitones: float, seconds: float = 2.0) -> float:
    from golden_wasm import native
    from golden_wasm.refrender import render_model

    n = int(seconds * SR * max(rate, 1.0)) + int(SR)
    x = golden_signal(n)[None]
    n_out = int(seconds * SR)
    ref = native.render_reference(
        x, SR, n_out, rate=rate, semitones=semitones, split_computation=True
    )
    got = render_model(x, SR, n_out, rate=rate, semitones=semitones)
    block = round(0.12 * SR)
    a, b = ref[:, block:], got[:, block:]
    return float(10 * np.log10(np.mean(a**2) / max(np.mean((a - b) ** 2), 1e-30)))


@pytest.mark.parametrize(
    "rate,semitones",
    [(0.5, 0.0), (2.0, 0.0), (1.0, 12.0), (0.5, -12.0), (2.0, 12.0)],
)
def test_oracle_snr_vs_blob(rate, semitones):
    snr = snr_model_vs_blob(rate, semitones)
    assert snr > 40.0, f"rate={rate} st={semitones}: {snr:.1f} dB"


def test_identity_is_near_exact():
    assert snr_model_vs_blob(1.0, 0.0) > 80.0
