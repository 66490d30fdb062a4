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

Fast path (the default): decimation-in-time over even/odd samples packs the
real input into ONE complex FFT of size N/2 — half the FFT work of the
naive premodulate-then-size-N-FFT route.  With E[m] = x[2m], O[m] = x[2m+1]
and the half-bin transform T[f][k] = sum_m f[m] e^{-2i pi (k+1/2) m / M}
(M = N/2, conjugate-symmetric for real f: T[M-1-k] = conj(T[k])):

    X[k] = T[E][k] + w_k * T[O][k],      w_k = e^{-2i pi (k+1/2) / N}

T[E +iO] is computed with one premodulated size-M complex FFT and unpacked
through the symmetry.  The inverse runs the algebra backwards (exact).
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


def _unit_phase(phase: np.ndarray) -> jnp.ndarray:
    """Complex exponential built on-device from a real numpy constant (some
    TPU attachment paths cannot transfer complex arrays host<->device)."""
    p = phase.astype(np.float32)
    return jax.lax.complex(jnp.cos(jnp.asarray(p)), jnp.sin(jnp.asarray(p))).astype(jnp.complex64)


def _halfbin_fwd(z: jnp.ndarray, m: int) -> jnp.ndarray:
    """T[z][k] = sum_m z[m] e^{-2i pi (k+1/2) m / M} via premod + FFT."""
    pre = _unit_phase(-np.pi * np.arange(m) / m)
    return jnp.fft.fft(z * pre, axis=-1)


def _halfbin_inv(spec: jnp.ndarray, m: int) -> jnp.ndarray:
    post = _unit_phase(np.pi * np.arange(m) / m)
    return jnp.fft.ifft(spec, axis=-1) * post


def mdft(x: jnp.ndarray) -> jnp.ndarray:
    """Forward modified real DFT over the last axis.

    x: real [..., N]  ->  complex64 [..., N/2]
    """
    n = x.shape[-1]
    m = n // 2
    x = x.astype(jnp.float32)
    even = x[..., 0::2]
    odd = x[..., 1::2]
    tz = _halfbin_fwd(jax.lax.complex(even, odd), m)  # [..., M]
    tz_rev = jnp.conj(tz[..., ::-1])
    te = 0.5 * (tz + tz_rev)
    to = -0.5j * (tz - tz_rev)
    w = _unit_phase(-2.0 * np.pi * (np.arange(m) + 0.5) / n)
    return (te + w * to).astype(jnp.complex64)


def imdft(spec: jnp.ndarray, block: int) -> jnp.ndarray:
    """Inverse modified real DFT over the last axis.

    spec: complex [..., N/2]  ->  real float32 [..., N]
    """
    half = spec.shape[-1]
    assert block == 2 * half, (block, half)
    m = half
    x_rev = jnp.conj(spec[..., ::-1])
    te = 0.5 * (spec + x_rev)
    w = _unit_phase(-2.0 * np.pi * (np.arange(m) + 0.5) / block)
    to = (spec - x_rev) * (0.5 / w)
    z = _halfbin_inv(te + 1j * to, m)
    even = jnp.real(z)
    odd = jnp.imag(z)
    out = jnp.stack([even, odd], axis=-1).reshape(spec.shape[:-1] + (block,))
    return out.astype(jnp.float32)


# ---------------------------------------------------------------- reference
def _mdft_direct(x: jnp.ndarray) -> jnp.ndarray:
    """Naive premod + size-N complex FFT (kept as the test oracle)."""
    n = x.shape[-1]
    pre = _unit_phase(-np.pi * np.arange(n) / n)
    y = x.astype(jnp.float32) * pre
    return jnp.fft.fft(y, axis=-1)[..., : n // 2].astype(jnp.complex64)


def _imdft_direct(spec: jnp.ndarray, block: int) -> jnp.ndarray:
    half = spec.shape[-1]
    assert block == 2 * half
    z = jnp.concatenate(
        [spec, jnp.zeros(spec.shape[:-1] + (block - half,), spec.dtype)], axis=-1
    )
    post = _unit_phase(np.pi * np.arange(block) / block)
    t = jnp.fft.ifft(z, axis=-1) * post
    return (2.0 * jnp.real(t)).astype(jnp.float32)