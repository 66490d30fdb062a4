"""Pallas kernel: exact fractional row gather with in-VMEM one-hot masks.

`ops.blockgather.block_gather` (the XLA form) is bound by one-hot mask
GENERATION on the VPU, not by HBM or the MXU: at the five-family serving
shape the [K, nblk] + [K, 2t] masks cost ~3G compare/convert lane-ops per
call (~9 of 14.6 ms measured; benchmarks/exp_selection.py — DEFAULT
precision is only 1.3x faster than HIGHEST and a bf16 mask barely moves
it, so neither MXU passes nor mask bytes dominate).  XLA offers no way to
shrink the mask without materializing a multi-GB intermediate.

This kernel restructures the selection so the mask work is ~2.6x smaller
and nothing round-trips HBM:

- the band axis is cut into ``nhi = B/t1`` hi-blocks with ``t1`` chosen
  so nhi <= 128 (B=3072 -> t1=24, nhi=128): the block one-hot is a
  [nhi, K_tile] iota compare (vs [K, B/8] in the XLA form at t=8);
- K rides the LANE axis end to end (k-major): the selection matmul is
  ``arr3_T [2*t1*P, nhi] @ oh [nhi, K_tile]`` — full 128-deep MXU
  contraction at HIGHEST precision (0/1 weights copy f32 rows exactly;
  Mosaic rejects Precision.HIGH, HIGHEST is the house precision,
  ops/pallas/interp.py);
- the two taps reduce over the sublane axis with PURE 0/1 masks inside
  the kernel; the interpolation weights apply OUTSIDE at top level with
  `_get_fractional`'s exact rounding sequence (the lax.map FMA lesson,
  ops/blockgather.py — same contract here).

Semantics: exact `_get_fractional` — linear interpolation with zeros
outside [0, B).  CPU (tests, golden gates) runs interpret mode = plain
f32 jnp ops = bit-exact vs the XLA form by construction.

Reference parity: the gather this accelerates is the blob's getFractional
over the five step-6/7 position families
(/root/reference/app/SignalsmithStretch.mjs:826-954 hot loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_gather", "pallas_supported"]


def pallas_supported(b: int, k: int) -> bool:
    """Shapes the kernel handles: band axis splittable into <=128
    hi-blocks and a lane-tileable K."""
    t1 = -(-b // 128)
    return b % t1 == 0 and b // t1 >= 8 and k >= 128


def _kernel(t1: int, p: int, k_tile: int,
            hi_ref, off_ref, arr_ref, ga_ref, gb_ref):
    # hi-block one-hot, j on sublanes, k on lanes: [nhi, K_tile]
    hi = hi_ref[0, 0, :]                                 # [K_tile] int32
    jj = jax.lax.broadcasted_iota(jnp.int32, (arr_ref.shape[-1], k_tile), 0)
    oh = (jj == hi[None, :]).astype(jnp.float32)
    # selection matmul: rows_T [2*t1*P, K_tile] — one-hot columns copy
    # f32 rows exactly under HIGHEST (6-pass bf16 split; house precision)
    rows = jnp.dot(arr_ref[0], oh, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    rows = rows.reshape(2 * t1, p, k_tile)
    # pure 0/1 tap reduce on sublanes (weights stay OUTSIDE the kernel:
    # in-kernel mul+add invites FMA contraction, ops/blockgather.py)
    off = off_ref[0, 0, :]                               # [K_tile] int32
    oo = jax.lax.broadcasted_iota(jnp.int32, (2 * t1, k_tile), 0)
    m0 = (oo == off[None, :]).astype(jnp.float32)        # [2*t1, K_tile]
    m1 = (oo == (off + 1)[None, :]).astype(jnp.float32)
    ga_ref[0] = jnp.sum(rows * m0[:, None, :], axis=0)   # [P, K_tile]
    gb_ref[0] = jnp.sum(rows * m1[:, None, :], axis=0)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _taps(arr3_t: jnp.ndarray,   # [N, 2*t1*P, nhi] f32 windows, j minor
          hi: jnp.ndarray,       # [N, K] int32 hi-block index
          off: jnp.ndarray,      # [N, K] int32 tap offset in window
          t1: int, k_tile: int,
          interpret: bool = False):
    n, row, nhi = arr3_t.shape
    k = hi.shape[1]
    p = row // (2 * t1)
    grid = (n, k // k_tile)
    out_sd = jax.ShapeDtypeStruct((n, p, k), jnp.float32)
    return pl.pallas_call(
        functools.partial(_kernel, t1, p, k_tile),
        out_shape=(out_sd, out_sd),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                # (1, 1, kt): Mosaic wants last-two block dims (8, 128)-
                # divisible OR equal to the array dims — the singleton
                # middle axis satisfies the "equal" clause
                pl.BlockSpec((1, 1, k_tile), lambda ni, ki: (ni, 0, ki),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, k_tile), lambda ni, ki: (ni, 0, ki),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, row, nhi), lambda ni, ki: (ni, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, p, k_tile), lambda ni, ki: (ni, 0, ki),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p, k_tile), lambda ni, ki: (ni, 0, ki),
                             memory_space=pltpu.VMEM),
            ),
        ),
        interpret=interpret,
    )(hi[:, None], off[:, None], arr3_t)


def pallas_gather(
    arrs: jnp.ndarray,  # [N, B, P] float32
    pos: jnp.ndarray,   # [N, K] float32
    k_tile: int = 3072,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for `ops.blockgather.block_gather` on supported shapes:
    linear interpolation ``arrs[n, pos[n, k], p]``, zeros outside [0, B).
    Returns [N, K, P]."""
    n, b, p = arrs.shape
    k = pos.shape[1]
    t1 = -(-b // 128)
    nhi = b // t1
    assert b % t1 == 0, (b, t1)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # overlapped hi-block windows, hi-block index MINOR (k-major MXU):
    # arr3_t[n, o*P + q, j] = padded[n, j*t1 + o, q], o in [0, 2*t1)
    padded = jnp.pad(arrs, ((0, 0), (0, t1), (0, 0)))
    a0 = arrs.reshape(n, nhi, t1, p)
    a1 = padded[:, t1:].reshape(n, nhi, t1, p)
    win = jnp.concatenate([a0, a1], axis=2)              # [N, nhi, 2t1, P]
    arr3_t = win.transpose(0, 2, 3, 1).reshape(n, 2 * t1 * p, nhi)

    i0 = jnp.floor(pos).astype(jnp.int32)                # [N, K]
    frac = (pos - i0).astype(jnp.float32)
    ok0 = ((i0 >= 0) & (i0 < b)).astype(jnp.float32)
    ok1 = ((i0 + 1 >= 0) & (i0 + 1 < b)).astype(jnp.float32)
    hi = jnp.clip(i0, 0, b - 1) // t1
    off = i0 - hi * t1                                   # in [0, t1) valid
    w0 = ok0 * (1.0 - frac)
    w1 = ok1 * frac

    kt = min(k_tile, k)
    pad_k = (-k) % kt
    if pad_k:
        # pad positions out of range: taps select nothing, rows are 0
        hi = jnp.pad(hi, ((0, 0), (0, pad_k)), constant_values=0)
        off = jnp.pad(off, ((0, 0), (0, pad_k)), constant_values=2 * t1)

    ga_t, gb_t = _taps(arr3_t, hi, off, t1, kt, interpret)
    ga = jnp.moveaxis(ga_t[..., :k], 1, 2)               # [N, K, P]
    gb = jnp.moveaxis(gb_t[..., :k], 1, 2)
    return ga * w0[..., None] + gb * w1[..., None]
