"""FFT-fast size selection for the TPU backend.

Measured on TPU v5e (XLA FFT, complex64, batch 8192): sizes whose odd part
is small scale linearly with N (n=4096: 11.5 ms, n=5376=2^8*3*7: 15.0 ms,
n=6144=2^11*3: 15.2 ms), while other composite sizes fall off a cliff
(n=5292=2^2*3^3*7^2: 49.6 ms — 4.3x worse than pow2 per element).

``fast_fft_size(n)`` returns the smallest size >= n of the form
``2^a * k`` with ``k in {1, 3, 7, 9, 21}`` (all measured-fast families).
The engine rounds block sizes up to this grid — the same move the
reference's DSP core makes internally when it picks an FFT size at or above
the requested block.
"""

from __future__ import annotations

import functools

__all__ = ["fast_fft_size"]

_ODD_PARTS = (1, 3, 7, 9, 21)


@functools.lru_cache(maxsize=256)
def fast_fft_size(n: int) -> int:
    n = max(2, int(n))
    best = None
    for k in _ODD_PARTS:
        m = k
        while m < n:
            m *= 2
        if best is None or m < best:
            best = m
    return best
