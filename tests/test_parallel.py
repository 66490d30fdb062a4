"""Batched + sharded serving step on a virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from tests.util import tone

from bauklank_tpu.engine import StretchConfig, StretchParams
from bauklank_tpu.engine.batched import batched_process_chunk, init_batched_state
from bauklank_tpu.engine.offline import frame_ends_for
from bauklank_tpu.parallel import shard_streams, sharded_step, stream_mesh

SR = 44100.0
CFG = StretchConfig(channels=2, block=512, interval=128, formants=True)


def _setup(n_streams, t=12000, hops=16):
    rng = np.random.default_rng(0)
    audios = rng.standard_normal((n_streams, 2, t)).astype(np.float32) * 0.2
    rates = np.linspace(0.5, 2.0, n_streams)
    params = StretchParams.stack(
        [
            StretchParams.make(rate=r, semitones=s, sample_rate=SR)
            for r, s in zip(rates, np.linspace(-12, 12, n_streams))
        ]
    )
    ends = np.stack([frame_ends_for(CFG, 0, hops, r) for r in rates])
    states = init_batched_state(CFG, n_streams)
    return states, jnp.asarray(audios), jnp.asarray(ends, jnp.int32), params


def test_batched_matches_per_stream():
    from bauklank_tpu.engine.core import init_state, process_chunk

    states, audios, ends, params = _setup(4)
    _, out_b = batched_process_chunk(CFG, states, audios, ends, params)
    out_b = np.asarray(out_b)
    for i in range(4):
        st = init_state(CFG)
        p_i = jax.tree.map(lambda x: x[i], params)
        _, o = process_chunk(CFG, st, audios[i], ends[i], p_i)
        np.testing.assert_allclose(out_b[i], np.asarray(o), atol=1e-4)


def test_sharded_step_runs_on_8_device_mesh():
    assert jax.device_count() >= 8, jax.devices()
    mesh = stream_mesh(8)
    states, audios, ends, params = _setup(16)
    states, audios, ends, params = shard_streams(mesh, (states, audios, ends, params))
    step = sharded_step(CFG, mesh)
    new_states, out = step(states, audios, ends, params)
    assert out.shape == (16, 2, 16 * CFG.interval)
    # sharded across 8 devices on the stream axis
    assert len(out.sharding.device_set) == 8
    # a second step runs with the donated state
    ends2 = jnp.asarray(np.asarray(ends) + 16 * CFG.interval)
    ends2 = jax.device_put(ends2, out.sharding.spec and jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("stream")))
    _, out2 = step(new_states, audios, ends2, params)
    assert np.isfinite(np.asarray(out2)).all()


def test_sharded_matches_unsharded():
    mesh = stream_mesh(8)
    states, audios, ends, params = _setup(8)
    _, out_ref = batched_process_chunk(CFG, states, audios, ends, params)
    sh_args = shard_streams(mesh, (states, audios, ends, params))
    step = sharded_step(CFG, mesh)
    _, out_sh = step(*sh_args)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_sh), atol=2e-4)
