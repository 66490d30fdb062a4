"""Pallas kernel: sequential compensated (double-float32) cumulative sum.

``engine.spectral._comp_cumsum`` feeds the peaks map's prefix-difference
segment sums (the findPeaks accumulators of the reference hot loop,
``app/SignalsmithStretch.mjs:826-954``).  As an ``associative_scan`` over
[N, B, K] double-f32 pairs it does O(B log B) TwoSum combines through
XLA's recursive tree — measured 6.2 ms at N=1024, B=3072, K=3 on the
v5e.  This kernel runs the same scan as a LEFT-TO-RIGHT sequential fold —
O(B) combines — with bands on the sublane axis and the batch on lanes
(the bandchain kernel's layout, ``ops/pallas/bandchain.py``), carrying
the running pair in VMEM scratch across band-chunks of the grid.

The fold op is exactly ``engine.spectral._df_combine(acc, (x, 0))``:

    hi, e = TwoSum(acc_hi, x);  lo = (acc_lo + 0) + e
    s = hi + lo;  acc = (s, lo - (s - hi))

(TwoSum has no multiplies, so there is nothing for an FMA contraction to
perturb — the ops/blockgather.py hazard does not apply.)

Numerics: sequential-fold prefixes differ from the associative tree's in
ulp (mathematically equal, different rounding paths) — the same hazard
class as TPU-vs-CPU ``associative_scan`` itself (CLAUDE.md round-4
GOTCHA), so enabling this kernel is golden-gated on-chip
(``benchmarks/check_tpu_golden.py``).  Two properties the peaks map
relies on are PRESERVED:

- **gap constancy**: folding an exact zero into a normalized pair
  returns the bitwise-identical pair — ``hi + lo`` re-rounds to ``hi``
  because ``lo`` is the exact residual of the rounding that produced
  ``hi`` (so ``fl(hi + lo) = fl(`` the pre-rounding value ``) = hi``).
  Hence ``cs[end_pos[s]] == cs[start_pos[s+1]-1]`` still holds bitwise.
- **integer exactness**: a channel of 0/1 integers folds with zero
  ``lo`` throughout (every partial sum < 2^24 is exact), so the
  boundary-count channel stays the exact integer cumsum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["comp_cumsum_seq"]

LANE = 128
B_CHUNK = 256


def _kernel(k_n, b_chunk, x_ref, hi_ref, lo_ref, acc):
    # grid = (lane_tile, band_chunk); the band-chunk axis is minor
    # (fastest), so the running pair carries across chunks and resets
    # when a new lane tile begins
    @pl.when(pl.program_id(1) == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    def body(i, _):
        for k in range(k_n):
            x = x_ref[k, pl.ds(i, 1), :][0]
            ah = acc[k, 0, :]
            al = acc[k, 1, :]
            # TwoSum(ah, x) — exact error term under IEEE round-to-nearest
            s1 = ah + x
            v = s1 - ah
            e = (ah - (s1 - v)) + (x - v)
            lo = al + e
            s = s1 + lo
            nl = lo - (s - s1)
            hi_ref[k, pl.ds(i, 1), :] = s[None]
            lo_ref[k, pl.ds(i, 1), :] = nl[None]
            acc[k, 0, :] = s
            acc[k, 1, :] = nl
        return 0

    jax.lax.fori_loop(0, b_chunk, body, 0)


@functools.partial(jax.jit, static_argnums=(1,))
def comp_cumsum_seq(
    x: jnp.ndarray,              # [K, B, N] f32, N % LANE == 0
    interpret: bool | None = None,
):
    """Sequential compensated cumsum along axis 1; returns (hi, lo).

    Layout contract: channels leading, bands on the sublane axis, batch
    on lanes (transpose [N, B, K] inputs before calling).  B is padded
    to the chunk size internally (zero rows extend the fold exactly)."""
    k_n, b_n, n = x.shape
    assert n % LANE == 0, n
    assert x.dtype == jnp.float32, x.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pad_b = (-b_n) % B_CHUNK
    if pad_b:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, 0)))
    bp = b_n + pad_b

    grid = (n // LANE, bp // B_CHUNK)
    hi, lo = pl.pallas_call(
        functools.partial(_kernel, k_n, B_CHUNK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k_n, B_CHUNK, LANE), lambda ni, bi: (0, bi, ni)),
        ],
        out_specs=[
            pl.BlockSpec((k_n, B_CHUNK, LANE), lambda ni, bi: (0, bi, ni)),
            pl.BlockSpec((k_n, B_CHUNK, LANE), lambda ni, bi: (0, bi, ni)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_n, bp, n), jnp.float32),
            jax.ShapeDtypeStruct((k_n, bp, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_n, 2, LANE), jnp.float32),  # running (hi, lo)
        ],
        interpret=interpret,
    )(x)
    if pad_b:
        hi, lo = hi[:, :b_n], lo[:, :b_n]
    return hi, lo
