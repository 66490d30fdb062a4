"""Exact fractional row gather as one-hot block matmuls (MXU).

The fidelity engine's hot loop reads spectra at per-(hop, stream) fractional
band positions (`engine.spectral._get_fractional`).  XLA's gather moves one
tiny row (~16 B) per ~constant cost on TPU, which made the five-family
lookup the dominant serving stage (measured 19 ms/hop at 64 streams,
benchmarks/profile_chain_inputs.py).  The positions are NOT monotone in the
kiosk regime (the blob's MINSTD vertical steps scatter them by up to
±timeFactor bands), so the fast engine's banded-interpolation matmuls
(ops/pitchmap) do not apply.

This module reformulates the gather exactly, with no gather/scatter ops:

1. the band axis is cut into ``nblk = B/t`` blocks; an overlapped copy
   ``arr_over[j] = arr[j*t : j*t + 2t]`` makes both taps of any linear
   interpolation land inside one block;
2. a one-hot [K, nblk] block-selection matrix (iota compare) times
   ``arr_over`` fetches each output row's 2t-wide candidate window — a
   dense MXU matmul instead of K tiny gathers (0/1 weights copy f32 values
   exactly under HIGHEST precision);
3. the two taps are selected in-register by an iota==offset compare and
   combined with the interpolation weights, reproducing
   ``_get_fractional``'s zero-outside-[0,B) semantics term for term.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["block_gather", "block_gather_complex"]


def block_gather(
    arrs: jnp.ndarray,  # [N, B, P] float32
    pos: jnp.ndarray,   # [N, K] float32
    t: int = 32,
    chunk: int = 16,
) -> jnp.ndarray:
    """Linear interpolation ``arrs[n, pos[n, k], p]`` with zeros outside
    [0, B) — exact `_get_fractional` semantics.  Returns [N, K, P].

    ``t``: block granularity (B must divide by t).
    ``chunk``: examples per matmul batch (bounds the one-hot transient).
    """
    n, b, p = arrs.shape
    k = pos.shape[1]
    assert b % t == 0, (b, t)
    nblk = b // t

    # overlapped blocks: arr_over[n, j] = arr[n, j*t : j*t + 2t]
    padded = jnp.pad(arrs, ((0, 0), (0, t), (0, 0)))
    a0 = arrs.reshape(n, nblk, t, p)
    a1 = padded[:, t:].reshape(n, nblk, t, p)
    arr_over = jnp.concatenate([a0, a1], axis=2).reshape(n, nblk, 2 * t * p)

    i0 = jnp.floor(pos).astype(jnp.int32)              # [N, K]
    frac = (pos - i0).astype(jnp.float32)
    ok0 = ((i0 >= 0) & (i0 < b)).astype(jnp.float32)
    ok1 = ((i0 + 1 >= 0) & (i0 + 1 < b)).astype(jnp.float32)
    blk = jnp.clip(i0, 0, b - 1) // t                  # [N, K]
    off = i0 - blk * t                                 # [-inf, 2t) effective
    w0 = ok0 * (1.0 - frac)                            # [N, K]
    w1 = ok1 * frac

    # the [*, K, nblk] one-hot and [*, K, 2t] tap masks are built INSIDE
    # the chunked map: materialized for all N at once they dominate HBM
    # (4.7 GB at the serving shape S=64 H=8 B=2688 — OOMs the v5e)
    def one_chunk(args):
        blk_c, off_c, w0_c, w1_c, arr_o = args
        oh_blk = (blk_c[..., None] == jnp.arange(nblk)).astype(jnp.float32)
        rows = jnp.einsum(
            "nkj,njr->nkr", oh_blk, arr_o,
            precision=jax.lax.Precision.HIGHEST,
        )                                              # [c, K, 2t*P]
        rows = rows.reshape(rows.shape[0], k, 2 * t, p)
        oto = jnp.arange(2 * t, dtype=jnp.int32)
        mm = (oto == off_c[..., None]).astype(jnp.float32) * w0_c[..., None] + (
            oto == (off_c + 1)[..., None]
        ).astype(jnp.float32) * w1_c[..., None]        # [c, K, 2t]
        return jnp.sum(rows * mm[..., None], axis=2)   # [c, K, P]

    if n > chunk:
        # pad N up to a chunk multiple (zero rows, zero weights): chunking
        # must never silently disable — the full one-hot/tap transients for
        # all N at once are the documented multi-GB OOM hazard (ADVICE r3)
        pad_n = (-n) % chunk
        def padn(x):
            return jnp.pad(x, ((0, pad_n),) + ((0, 0),) * (x.ndim - 1))
        blk, off, w0, w1, arr_over = map(padn, (blk, off, w0, w1, arr_over))
        shape = ((n + pad_n) // chunk, chunk)
        out = jax.lax.map(
            one_chunk,
            (
                blk.reshape(shape + (k,)),
                off.reshape(shape + (k,)),
                w0.reshape(shape + (k,)),
                w1.reshape(shape + (k,)),
                arr_over.reshape(shape + (nblk, 2 * t * p)),
            ),
        )
        return out.reshape(n + pad_n, k, p)[:n]
    return one_chunk((blk, off, w0, w1, arr_over))


def block_gather_complex(
    arrs: jnp.ndarray,  # [N, B] complex64 (or [N, B, P] pre-split planes)
    pos: jnp.ndarray,   # [N, K]
    t: int = 32,
    chunk: int = 16,
) -> jnp.ndarray:
    """Complex wrapper: gathers re/im planes together, returns [N, K]."""
    planes = jnp.stack([jnp.real(arrs), jnp.imag(arrs)], axis=-1)
    out = block_gather(planes, pos, t=t, chunk=chunk)
    return jax.lax.complex(out[..., 0], out[..., 1])
