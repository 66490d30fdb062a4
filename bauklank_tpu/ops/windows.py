"""Analysis/synthesis windows with enforced perfect reconstruction.

The reference DSP core (Signalsmith Stretch, shipped only as a WASM blob —
reference: app/SignalsmithStretch.mjs:265) uses Kaiser-family windows whose
shape follows the block/interval ("overlap") ratio, with the synthesis window
rescaled so that weighted overlap-add reconstructs the input exactly
(intervalMs = blockMs / overlap — reference: README-signalsmith.md:43-55,
app/multi/app.mjs:409-417).

We reproduce the *property*, not the blob: ``pr_window_pair`` returns an
(analysis, synthesis) pair such that for any hop ``H`` dividing the frame
placement, ``sum_k analysis[n-kH] * synthesis[n-kH] == 1`` for every sample
``n`` in steady state.  That makes identity processing (no spectral edits)
bit-faithful up to float rounding regardless of the window family, which is
what the round-trip tests assert.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["kaiser", "kaiser_beta_for_overlap", "pr_window_pair", "ola_norm"]


def kaiser_beta_for_overlap(block: int, interval: int) -> float:
    """Kaiser beta from the block/interval ratio.

    Chooses the main-lobe bandwidth (in bins) to match the frame rate so the
    window pair stays near-orthogonal at the configured overlap: a standard
    phase-vocoder design rule.  ``overlap = block / interval``; bandwidth
    ``b ~= overlap`` bins, ``beta = pi * sqrt(max(b^2/4 - 1, 0))``.
    """
    overlap = block / max(1, interval)
    b = max(2.0, overlap)
    return float(np.pi * np.sqrt(max(b * b / 4.0 - 1.0, 0.0)))


@functools.lru_cache(maxsize=64)
def _kaiser_cached(n: int, beta: float) -> np.ndarray:
    # Symmetric Kaiser over the open interval (0, n) sampled at k+0.5 —
    # "periodic-centered" sampling matches frame centers at (block-1)/2 + 0.5
    # and avoids zero endpoints that waste block samples.
    k = (np.arange(n) + 0.5) / n * 2.0 - 1.0  # in (-1, 1)
    win = np.i0(beta * np.sqrt(np.maximum(0.0, 1.0 - k * k))) / np.i0(beta)
    return win.astype(np.float64)


def kaiser(n: int, beta: float) -> np.ndarray:
    """Kaiser window of length ``n`` (float64 numpy; cast at use site)."""
    return _kaiser_cached(int(n), float(beta))


def ola_norm(window_product: np.ndarray, interval: int) -> np.ndarray:
    """Per-sample overlap-add sum ``sum_k w[n - k*interval]`` (steady state).

    Computed over all integer shifts of the window by ``interval``; the result
    is periodic with period ``interval`` so only ``interval`` values matter.
    """
    n = window_product.shape[0]
    acc = np.zeros(interval, dtype=np.float64)
    for start in range(0, n, interval):
        seg = window_product[start : start + interval]
        acc[: seg.shape[0]] += seg
    return np.tile(acc, (n + interval - 1) // interval)[:n]


def pr_window_pair(block: int, interval: int, beta: float | None = None):
    """(analysis, synthesis) float32 windows with exact COLA at ``interval``.

    analysis = kaiser(beta); synthesis = analysis / ola_norm(analysis^2)
    so that ``sum_k analysis[n-kH]*synthesis[n-kH] == 1`` in steady state.
    """
    if beta is None:
        beta = kaiser_beta_for_overlap(block, interval)
    w = kaiser(block, beta)
    norm = ola_norm(w * w, interval)
    synth = w / norm
    return w.astype(np.float32), synth.astype(np.float32)
