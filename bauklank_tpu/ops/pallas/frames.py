"""Pallas kernel: windowed analysis-frame fetch.

The engine's frame gather (batched dynamic_slice over a zero-padded track)
lowers to an XLA gather running at ~10 GB/s effective — the largest single
cost in the serving step after the FFT work.  This kernel fetches each
frame with an aligned async DMA at HBM bandwidth and resolves the sub-tile
(lane) misalignment with a 128x128 rotation matrix on the MXU:

  - frame start s is split into a 128-aligned DMA start and a residue
    r < 256 (the clip slack); three static 128-shifted views of the fetched
    buffer are lane-rotated by ``r mod 128`` via one comparison-built
    permutation matmul, and combined with an iota select;
  - the analysis window is applied in-kernel (frames leave ready for the
    MDFT);
  - out-of-range samples are masked to zero from the true start index
    (callers pass the track pre-padded so partially-out-of-range frames are
    alignment-exact, like ops.framing.gather_frames).

Layout: audio [S, C, Tp] (pre-padded), starts [S, F] (true, unpadded frame
starts), output [S, F, C, B].  Grid (S, F).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_frames_windowed", "PAD"]

LANE = 128
PAD = 0  # computed per block size: see _pad_for


def _pad_for(block: int) -> int:
    return block + 2 * LANE


def _kernel(t_true: int, pad_left: int, block: int,
            starts_ref, x_hbm, win_ref, out_ref, buf, sem):
    s = pl.program_id(0)
    f = pl.program_id(1)
    c = out_ref.shape[2]
    true_start = starts_ref[s, f]
    padded = true_start + pad_left
    bp = block + 3 * LANE  # DMA width: block + 256 slack + 128 rotation room
    tp = t_true + 2 * pad_left
    al = jnp.clip((padded // LANE) * LANE, 0, tp - bp)
    al = pl.multiple_of(al, LANE)
    r = padded - al  # in [0, 256) for in-range frames

    dma = pltpu.make_async_copy(x_hbm.at[s, :, pl.ds(al, bp)], buf, sem)
    dma.start()

    # 128x128 lane-rotation matrix for r mod 128: P[j, l] = (j == (l + rm) % 128)
    rm = jnp.remainder(r, LANE)
    jj = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    p = (jj == jnp.remainder(ll + rm, LANE)).astype(jnp.float32)

    dma.wait()

    n_t = block // LANE

    def rotated(off):  # static 128-tile offset view, lane-rotated by rm
        x = buf[:, off : off + block].reshape(c * n_t, LANE)
        return jnp.dot(x, p, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST).reshape(c, block)

    x0 = rotated(0)
    x1 = rotated(LANE)
    x2 = rotated(2 * LANE)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (c, block), 1) % LANE
    in_tile = lanes < (LANE - rm)  # element comes from the same 128-tile
    big = r >= LANE  # residue spilled into the second tile
    lo = jnp.where(big, x1, x0)
    hi = jnp.where(big, x2, x1)
    frame = jnp.where(in_tile, lo, hi)

    # zero-mask samples outside the true track, then window
    gidx = jax.lax.broadcasted_iota(jnp.int32, (c, block), 1) + true_start
    valid = (gidx >= 0) & (gidx < t_true)
    out_ref[0, 0] = frame * valid * win_ref[0, :][None, :]


@functools.partial(jax.jit, static_argnums=(3, 4))
def gather_frames_windowed(
    audio: jnp.ndarray,
    starts: jnp.ndarray,
    window: jnp.ndarray,
    block: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """audio [S, C, T] (unpadded), starts [S, F] true frame starts,
    window [block] analysis window -> windowed frames [S, F, C, block]."""
    s, c, t = audio.shape
    f = starts.shape[1]
    assert block % LANE == 0, block
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pad_left = block + 2 * LANE
    audio_p = jnp.pad(audio, ((0, 0), (0, 0), (pad_left, pad_left)))
    win2 = jnp.asarray(window, jnp.float32).reshape(1, block)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s, f),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, block), lambda si, fi, st: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, c, block), lambda si, fi, st: (si, fi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((c, block + 3 * LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, t, pad_left, block),
        out_shape=jax.ShapeDtypeStruct((s, f, c, block), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts.astype(jnp.int32), audio_p, win2)