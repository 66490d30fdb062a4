"""Mesh construction and stream sharding.

The reference has no distributed anything (SURVEY.md §2.2) — its concurrency
is two browser worklets.  Scale-out here is over a ``jax.sharding.Mesh``:

- ``stream``: data parallelism over independent voices — zero collectives,
  perfectly ICI-free, the dominant axis for serving fleets.
- ``seq``: optional intra-stream sequence (hop) parallelism for very long
  offline renders — hops of one stream are spread over chips; the carried
  rotation product and the OLA boundary cross chips, handled in
  :func:`bauklank_tpu.parallel.seqpar.stretch_offline_sharded` with XLA
  collectives.

Shardings are expressed with NamedSharding so the same jitted step runs on
one chip (trivial mesh) or a pod slice without code changes.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bauklank_tpu.engine.batched import batched_process_chunk

__all__ = [
    "stream_mesh", "shard_streams", "sharded_step", "sharded_fidelity_step",
    "sharded_live_fidelity_step",
]


def stream_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the ``stream`` axis."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), ("stream",))


def shard_streams(mesh: Mesh, tree):
    """Place a pytree with leading stream axes onto the mesh (stream-sharded)."""
    sharding = NamedSharding(mesh, P("stream"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def sharded_step(config, mesh: Mesh):
    """Compile the batched serving step with stream sharding over ``mesh``.

    Returns a function (states, audios, frame_ends, params) -> (states, out)
    where every argument and result is sharded on its leading stream axis.
    States are donated: steady-state serving does not reallocate.
    """
    s = NamedSharding(mesh, P("stream"))
    fn = functools.partial(batched_process_chunk, config)

    @functools.partial(
        jax.jit,
        in_shardings=(s, s, s, s),
        out_shardings=(s, s),
        donate_argnums=(0,),
    )
    def step(states, audios, frame_ends, params):
        return fn(states, audios, frame_ends, params)

    return step


def sharded_fidelity_step(scfg, mesh: Mesh, formants: bool = False):
    """Compile the blob-exact fidelity pool step
    (:func:`bauklank_tpu.engine.fidelity.batched_fidelity_chunk`) with
    stream sharding over ``mesh``.

    Streams are pure data parallelism — zero collectives: every per-hop
    stage (MDFT analysis, chain-input precompute, the sequential band
    chain, synthesis OLA) is independent per stream, so hops of one stream
    stay on one device and the mesh spreads streams.  The hop axis inside
    the chunk is a lax.scan carried per shard (the band chain is
    order-dependent, reference processSpectrum
    app/SignalsmithStretch.mjs:826-954 — not shardable across hops).

    Returns ``step(states, audios, ends, tf, mult, limit, active, *fmt)``
    with every argument/result sharded on its leading stream axis and
    states donated.
    """
    from bauklank_tpu.engine.fidelity import batched_fidelity_chunk

    s = NamedSharding(mesh, P("stream"))
    n_pos = 7 + (3 if formants else 0)

    @functools.partial(
        jax.jit,
        in_shardings=(s,) * n_pos,
        out_shardings=(s, s),
        donate_argnums=(0,),
    )
    def step(states, audios, ends, tf, mult, limit, active, *fmt):
        return batched_fidelity_chunk(
            scfg, states, audios, ends, tf, mult, limit, active, *fmt
        )

    return step


def sharded_live_fidelity_step(scfg, hops: int, mesh: Mesh,
                               formants: bool = False):
    """Compile the blob-exact COUPLED (live-input) step
    (:func:`bauklank_tpu.engine.fidelity.batched_live_fidelity_chunk`)
    with stream sharding over ``mesh``.

    Live voices are the purest stream-DP case: each voice carries its own
    input ring and consumes its own chunk (reference live branch
    app/SignalsmithStretch.mjs:870-882), so there are zero collectives —
    the mesh spreads voices and every stage stays on-device.

    Returns ``step(states, chunks, mult, limit, active, *fmt)`` with every
    argument/result sharded on its leading stream axis and states donated.
    ``chunks`` is ``[S, C, hops * scfg.interval]`` live input.
    """
    from bauklank_tpu.engine.fidelity import batched_live_fidelity_chunk

    s = NamedSharding(mesh, P("stream"))
    n_pos = 5 + (3 if formants else 0)

    @functools.partial(
        jax.jit,
        in_shardings=(s,) * n_pos,
        out_shardings=(s, s),
        donate_argnums=(0,),
    )
    def step(states, chunks, mult, limit, active, *fmt):
        return batched_live_fidelity_chunk(
            scfg, states, chunks, mult, limit, active, *fmt
        )

    return step
