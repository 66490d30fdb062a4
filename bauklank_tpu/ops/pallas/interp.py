"""Pallas kernel: banded fractional band-gather (the pitch mapper's core).

Fuses, per 128-band output tile: the dynamic input-window fetch (async DMA
from HBM with a scalar-prefetched start), the comparison-built linear-
interpolation matrix, and the MXU matmul — one kernel instead of the XLA
dynamic_slice + elementwise-build + einsum pipeline in
:func:`bauklank_tpu.ops.pitchmap._interp_real`.

Semantics match ``_interp_real(..., oob="zero")``: positions are monotone
fractional input-band indices; out-of-range positions read 0.

Layout: x [S, P, bins] float32 (S = streams with distinct position maps,
P = folded batch rows — re/im x channels x hops), pos [S, bins_out].
Grid is (S, bins_out / TILE).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["banded_interp"]

TILE = 128


def _kernel(bins: int, window: int, starts_ref, pos_ref, x_hbm, out_ref, xwin, sem):
    s = pl.program_id(0)
    t = pl.program_id(1)
    # starts are pre-aligned to 128 (Mosaic requires lane-dim DMA offsets on
    # the tiling grid); multiple_of lets the compiler prove it.
    start = pl.multiple_of(starts_ref[s, t], 128)

    dma = pltpu.make_async_copy(
        x_hbm.at[s, :, pl.ds(start, window)], xwin, sem
    )
    dma.start()

    pos = pos_ref[0, t, :]  # [TILE] (whole per-stream table is resident)
    rel = pos - start.astype(jnp.float32)
    i0 = jnp.floor(rel).astype(jnp.int32)          # [TILE]
    w = rel - i0.astype(jnp.float32)
    gidx = i0 + start                               # global source index
    valid0 = ((gidx >= 0) & (gidx < bins)).astype(jnp.float32)
    valid1 = ((gidx + 1 >= 0) & (gidx + 1 < bins)).astype(jnp.float32)

    ww = jax.lax.broadcasted_iota(jnp.int32, (window, TILE), 0)
    m = (ww == i0[None, :]).astype(jnp.float32) * ((1.0 - w) * valid0)[None, :] + (
        ww == (i0 + 1)[None, :]
    ).astype(jnp.float32) * (w * valid1)[None, :]

    dma.wait()
    # HIGHEST: default MXU precision is single-pass bf16 (measured 1e-3
    # level interpolation error); audio fidelity needs full f32.  A manual
    # bf16x3 split (3 passes, ~1.5e-5 error) was measured at identical
    # end-to-end speed — the kernel is DMA-bound, not MXU-bound — so full
    # precision is free.  (Mosaic rejects Precision.HIGH outright.)
    out_ref[0] = jnp.dot(
        xwin[:], m, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnums=(2, 3))
def banded_interp(
    x: jnp.ndarray,
    pos: jnp.ndarray,
    window: int = 768,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x [S, P, bins] f32, pos [S, bins_out] monotone -> [S, P, bins_out].

    ``interpret=None`` auto-selects interpreter mode off-TPU (tests).
    """
    s, p, bins = x.shape
    bins_out = pos.shape[1]
    assert bins_out % TILE == 0, bins_out
    assert bins % TILE == 0, bins  # lane-tiled DMA needs 128-aligned rows
    # widen the fetch by one tile: starts get aligned *down* to 128
    window = min(window + TILE, bins)
    n_tiles = bins_out // TILE
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # per-tile window starts, 128-aligned (Mosaic lane-dim DMA constraint)
    first = pos[:, ::TILE]  # [S, n_tiles]
    starts = jnp.clip(jnp.floor(first).astype(jnp.int32) - 1, 0, max(bins - window, 0))
    starts = (starts // TILE) * TILE

    pos3 = pos.reshape(s, n_tiles, TILE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s, n_tiles),
        in_specs=[
            # whole per-stream position table (tiny) — tile row picked in-kernel
            pl.BlockSpec((1, n_tiles, TILE), lambda si, ti, starts: (si, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual DMA
        ],
        out_specs=pl.BlockSpec((1, p, TILE), lambda si, ti, starts: (si, 0, ti)),
        scratch_shapes=[
            pltpu.VMEM((p, window), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, bins, window),
        out_shape=jax.ShapeDtypeStruct((s, p, bins_out), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, pos3, x)
