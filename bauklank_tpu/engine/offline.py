"""Offline stretch driver: whole-track rendering via chunked hop batches.

BASELINE configs 1-3 (fixed-rate, rate-sweep, stretch+pitch offline renders)
run through here.  The driver slices the output timeline into fixed-size hop
chunks, computes per-hop input positions host-side (or from a rate schedule)
and calls the jitted :func:`bauklank_tpu.engine.core.process_chunk`, carrying
engine state between chunks.  One compiled executable serves any track
length at a given config.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bauklank_tpu.engine.config import StretchConfig
from bauklank_tpu.engine.core import init_state, process_chunk
from bauklank_tpu.engine.params import StretchParams

__all__ = ["stretch_offline", "frame_ends_for", "CHUNK_HOPS"]

CHUNK_HOPS = 64  # hops per dispatch: balances FFT batch size vs memory


def frame_ends_for(config: StretchConfig, out_start: int, n_hops: int, rate, in_start: float = 0.0):
    """Input analysis-frame end positions for hops covering output samples
    ``[out_start, out_start + n_hops * interval)`` at a fixed rate.

    Alignment contract (see :func:`process_chunk`): hop ``h``'s output frame
    center is ``out_start + h*I + B/2``; its input center is
    ``in_start + (out_start + h*I + B/2) * rate``; the frame end is the
    center + B/2.  At rate=1, in_start=0 this reduces to ``h*I + B`` —
    sample-exact identity.
    """
    b, i = config.block, config.interval
    h = np.arange(n_hops, dtype=np.float64)
    centers = np.asarray(in_start, np.float64) + (out_start + h * i + b / 2.0) * np.asarray(rate, np.float64)
    return np.round(centers).astype(np.int64) + b // 2


@functools.partial(jax.jit, static_argnums=(0,))
def _chunk_jit(config, state, audio, frame_ends, params):
    return process_chunk(config, state, audio, frame_ends, params)


def stretch_offline(
    audio: np.ndarray | jnp.ndarray,
    rate: float,
    config: StretchConfig,
    params: StretchParams | None = None,
    n_out: int | None = None,
    chunk_hops: int = CHUNK_HOPS,
) -> np.ndarray:
    """Render a whole track at a fixed stretch rate (+ params pitch/formant).

    audio: [C, T] float32.  rate: input samples per output sample (0.5 =
    2x longer, 2.0 = 2x shorter — reference UI range 0-2,
    app/multi/index.html:86).  Returns [C, n_out] float32.
    """
    audio = jnp.asarray(audio, jnp.float32)
    assert audio.ndim == 2 and audio.shape[0] == config.channels, audio.shape
    t_in = audio.shape[1]
    if n_out is None:
        n_out = int(round(t_in / max(rate, 1e-9)))
    if params is None:
        params = StretchParams.make(rate=rate)

    i = config.interval
    total_hops = -(-n_out // i)
    n_chunks = -(-total_hops // chunk_hops)

    state = init_state(config)
    pieces = []
    for ci in range(n_chunks):
        ends = frame_ends_for(config, ci * chunk_hops * i, chunk_hops, rate)
        state, out = _chunk_jit(config, state, audio, jnp.asarray(ends, jnp.int32), params)
        pieces.append(out)  # stays on device; one transfer at the end
    y = np.asarray(jnp.concatenate(pieces, axis=1)[:, :n_out])
    return y
