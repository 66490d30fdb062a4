"""Modified real DFT: bands centered at (k + 1/2) bins.

The band grid deliberately places bin centers at ``f_k = (k + 0.5) / N``
(cycles/sample).  Compared with the standard rFFT grid this removes the DC
and Nyquist special cases, so a block of ``N`` real samples maps to exactly
``N/2`` structurally identical complex bands — the whole spectral pipeline
(map/rotate/formant) vectorizes with no edge lanes, which is what the TPU VPU
wants.  It is also the natural grid for a pitch mapper: every band has a
well-defined nonzero center frequency.  (The reference engine exposes the
same banding through its opaque WASM core; our public surface only promises
``bins == block // 2`` and band centers at (k+0.5)/N.)

Forward:  X[k] = sum_n x[n] * exp(-2i*pi*(k+1/2)*n/N),  k in [0, N/2)
Inverse:  x[n] = (2/N) * Re( sum_k X[k] * exp(+2i*pi*(k+1/2)*n/N) )

Implemented with one complex FFT of size N via premodulation by
exp(-i*pi*n/N).  TODO(perf): N/2-point complex FFT factorization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mdft", "imdft", "num_bands", "band_freqs"]


def num_bands(block: int) -> int:
    return block // 2


def band_freqs(block: int) -> np.ndarray:
    """Band center frequencies in cycles/sample (numpy, host-side)."""
    return ((np.arange(block // 2) + 0.5) / block).astype(np.float32)


def _premod(n: int) -> jnp.ndarray:
    # Complex twiddles are built on-device from a real constant: some TPU
    # attachment paths cannot transfer complex arrays host<->device, so no
    # complex constant may cross the boundary.
    phase = (np.pi / n) * np.arange(n, dtype=np.float32)
    return jax.lax.complex(jnp.cos(phase), -jnp.sin(phase)).astype(jnp.complex64)


def _postmod(n: int) -> jnp.ndarray:
    phase = (np.pi / n) * np.arange(n, dtype=np.float32)
    return jax.lax.complex(jnp.cos(phase), jnp.sin(phase)).astype(jnp.complex64)


def mdft(x: jnp.ndarray) -> jnp.ndarray:
    """Forward modified real DFT over the last axis.

    x: real [..., N]  ->  complex64 [..., N/2]
    """
    n = x.shape[-1]
    y = x.astype(jnp.float32) * _premod(n)
    spec = jnp.fft.fft(y, axis=-1)
    return spec[..., : n // 2].astype(jnp.complex64)


def imdft(spec: jnp.ndarray, block: int) -> jnp.ndarray:
    """Inverse modified real DFT over the last axis.

    spec: complex [..., N/2]  ->  real float32 [..., N]
    """
    half = spec.shape[-1]
    assert block == 2 * half, (block, half)
    z = jnp.concatenate(
        [spec, jnp.zeros(spec.shape[:-1] + (block - half,), spec.dtype)], axis=-1
    )
    t = jnp.fft.ifft(z, axis=-1) * _postmod(block)
    return (2.0 * jnp.real(t)).astype(jnp.float32)
