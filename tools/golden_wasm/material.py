"""Golden test material + the fixture case matrix.

The material is TONAL by design: the reference renderer's phase recurrence
chaotically amplifies the phase of noise bands (~1000x per hop in-spectrum,
measured — docs/WASM-ALGO.md "Sensitivity"), so broadband-noise material
makes time-domain SNR against it saturate near -25..-40 dB for ANY
reimplementation.  Harmonic material keeps the recurrence contractive,
which is also the instrument's actual use case (music at extreme stretch).
"""

from __future__ import annotations

import numpy as np

SR = 44100.0

#: the golden case matrix: (name, rate, semitones, channels, extras)
#: extras: optional formant controls forwarded to the renderers
#: (formant_semitones / formant_compensation / formant_base_hz)
CASES = [
    ("r05_st0", 0.5, 0.0, 1, {}),
    ("r05_stm12", 0.5, -12.0, 1, {}),
    ("r05_stp12", 0.5, 12.0, 1, {}),
    ("r10_st0", 1.0, 0.0, 1, {}),
    ("r10_stm12", 1.0, -12.0, 1, {}),
    ("r10_stp12", 1.0, 12.0, 1, {}),
    ("r20_st0", 2.0, 0.0, 1, {}),
    ("r20_stm12", 2.0, -12.0, 1, {}),
    ("r20_stp12", 2.0, 12.0, 1, {}),
    ("stereo_r07_stp5", 0.7, 5.0, 2, {}),
    ("stereo_r15_stm12", 1.5, -12.0, 2, {}),
    # rate < 0.5 engages the MINSTD-random vertical steps (timeFactor > 2);
    # replicating them requires the per-render seed stored as {name}__seed
    ("r025_st0", 0.25, 0.0, 1, {}),
    ("r025_stp12", 0.25, 12.0, 1, {}),
    ("r0001_st0", 0.001, 0.0, 1, {}),  # the kiosk's deployed rate
    # formant processing end-to-end (step 5): shift, explicit base,
    # compensation under pitch shift, and everything combined.
    # "_compare_sec" (test-side option, stripped before rendering) bounds
    # the SNR window for AUTO-F0 cases: the f0 peak index is a DISCRETE
    # switch, and a sub-ULP energy difference eventually flips a harmonic
    # fold — measured on this material the float64 oracle itself diverges
    # from the blob at ~1.2 s (70 dB -> 14 dB) through the phase
    # recurrence.  Auto-f0 exactness is pinned at the hop level instead
    # (tests/test_pymodel.py, tests/test_spectral.py).
    ("r10_fp7", 1.0, 0.0, 1, {"formant_semitones": 7.0, "_compare_sec": 1.0}),
    ("r10_fm5_base200", 1.0, 0.0, 1,
     {"formant_semitones": -5.0, "formant_base_hz": 200.0}),
    ("r10_stp12_comp", 1.0, 12.0, 1,
     {"formant_compensation": True, "_compare_sec": 1.0}),
    ("stereo_r07_stp5_f4_comp", 0.7, 5.0, 2,
     {"formant_semitones": 4.0, "formant_compensation": True}),
    # splitComputation=false: the _configure ABI's second mode (reference
    # app/SignalsmithStretch.mjs:787-801).  Decoded round 4 by store-tracing
    # the blob (tools/golden_wasm/verify_splitoff.py): prev analysis window
    # has its first interval zeroed; frames land one interval earlier.
    ("r10_stp12_splitoff", 1.0, 12.0, 1, {"split_computation": False}),
    ("r025_st0_splitoff", 0.25, 0.0, 1, {"split_computation": False}),
    # the DEPLOYED kiosk operating point: blockMs=200, overlap=1.0
    # (interval == block), splitComputation=true, rate ~0.001
    # (reference app/multi/app.mjs:113,124-130 — "big win in cpu" :128;
    # README-signalsmith.md:176-180 runs 0.01 -> 0.001).  overlap=1 is a
    # structurally distinct corner: no window overlap in the OLA and
    # long_step = round(fft/interval) at its minimum (1).
    ("kiosk_r0001_st0", 0.001, 0.0, 1,
     {"block_ms": 200.0, "interval_ms": 200.0}),
    ("kiosk_r001_st0", 0.01, 0.0, 1,
     {"block_ms": 200.0, "interval_ms": 200.0}),
    ("kiosk_stereo_r001_stp5", 0.01, 5.0, 2,
     {"block_ms": 200.0, "interval_ms": 200.0}),
]

#: coupled (live-input) golden cases: (name, semitones, channels, extras).
#: The reference live branch copies each render quantum into the input
#: planes and processes coupled (app/SignalsmithStretch.mjs:870-882) —
#: rate does not apply; pitch/formant controls do.
LIVE_CASES = [
    ("live_st0", 0.0, 1, {}),
    ("live_stp12", 12.0, 1, {}),
    ("live_stereo_stm7", -7.0, 2, {}),
    ("live_stp5_f4_comp", 5.0, 2,
     {"formant_semitones": 4.0, "formant_compensation": True,
      "_compare_sec": 1.0}),
    # the deployed kiosk geometry, coupled
    ("live_kiosk_stp5", 5.0, 1, {"block_ms": 200.0, "interval_ms": 200.0}),
    # coupled x splitComputation=false (the ring law is unchanged:
    # lockstep-verified 2026-08-20, same drift trajectory as split-on)
    ("live_stp12_splitoff", 12.0, 1, {"split_computation": False}),
]


def renderer_extras(extras: dict) -> dict:
    """The renderer-facing subset of a case's extras (drops test options)."""
    return {k: v for k, v in extras.items() if not k.startswith("_")}


def case_render_kwargs(extras: dict) -> dict:
    """Full renderer kwargs for a case: the default golden geometry overlaid
    with the case's extras (kiosk cases carry their own block_ms /
    interval_ms, so extras take precedence)."""
    kw = dict(block_ms=BLOCK_MS, interval_ms=INTERVAL_MS)
    kw.update(renderer_extras(extras))
    return kw


def case_skip(extras: dict) -> int:
    """Per-case SNR skip (latency ramp-in): one block of samples."""
    return round(extras.get("block_ms", BLOCK_MS) / 1000 * SR)

SECONDS = 2.0
BLOCK_MS = 120.0
INTERVAL_MS = 30.0
TONALITY_HZ = 8000.0


def golden_signal(n: int, channel: int = 0) -> np.ndarray:
    """Deterministic harmonic two-note chord with per-harmonic AM; stereo
    channels get a small detune + phase offset so inter-channel phase
    locking is exercised."""
    t = np.arange(n) / SR
    detune = 1.5 * channel
    phase = 0.9 * channel
    x = np.zeros(n)
    for f0, a in ((220.0 + detune, 0.25), (330.0 + detune, 0.18)):
        for k in range(1, 4):
            x += (
                (a / k)
                * np.sin(2 * np.pi * f0 * k * t + 0.1 * k + phase)
                * (1 + 0.15 * np.sin(2 * np.pi * (1.5 + 0.3 * k) * t))
            )
    return x.astype(np.float32)


def case_input(rate: float, channels: int, seconds: float = SECONDS) -> np.ndarray:
    n = int(seconds * SR * max(rate, 1.0)) + int(SR)
    return np.stack([golden_signal(n, c) for c in range(channels)])


def snr_db(ref: np.ndarray, got: np.ndarray, skip: int) -> float:
    a, b = ref[..., skip:], got[..., skip:]
    return float(10 * np.log10(np.mean(a**2) / max(np.mean((a - b) ** 2), 1e-30)))
