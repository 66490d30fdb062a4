"""Batched live-input pool: per-stream shifts, underrun silence."""

import numpy as np

from tests.util import dominant_freq, tone

from bauklank_tpu.engine.config import StretchConfig
from bauklank_tpu.serve.livepool import LivePool

SR = 44100.0


def test_livepool_per_stream_shifts_and_underrun():
    cfg = StretchConfig(channels=1, block=1024, interval=256, formants=False)
    pool = LivePool(capacity=3, sample_rate=SR, channels=1, config=cfg,
                    names=["a", "b", "c"])
    pool.schedule("a", {"output": 0.0, "active": True, "semitones": 0})
    pool.schedule("b", {"output": 0.0, "active": True, "semitones": 12})
    pool.schedule("c", {"output": 0.0, "active": True})
    x = tone(440.0, 24576, SR)
    pool.feed("a", x)
    pool.feed("b", x)
    # c gets NO input -> silence

    outs = [pool.step() for _ in range(24576 // cfg.interval)]
    y = np.concatenate(outs, axis=2)  # [3, 1, T]
    seg_a = y[0, 0, 4 * cfg.block :]
    seg_b = y[1, 0, 4 * cfg.block :]
    assert abs(dominant_freq(seg_a, SR) - 440.0) < 6.0
    assert abs(dominant_freq(seg_b, SR) - 880.0) < 6.0
    assert np.abs(y[2]).max() < 1e-6
    # live output at rate 1: energy flows through
    assert np.sqrt((seg_a**2).mean()) > 0.2


def test_livepool_control_plane_interface():
    cfg = StretchConfig(channels=1, block=512, interval=128, formants=False)
    pool = LivePool(capacity=2, sample_rate=SR, channels=1, config=cfg, names=["a", "b"])
    assert pool.apply_set("a", "tone", -100)  # clamped
    assert pool.timemaps[0].segments[-1].semitones == -48.0
    assert pool.apply_set("a", "tonalityHz", 12000)
    assert pool.apply_set("a", "volume", 50)   # acknowledged no-op for live
    assert not pool.apply_set("zz", "tone", 1)
    assert not pool.apply_set("a", "bogus", 1)
    pool.schedule("a", {"output": 0.0, "active": True})
    pool.feed("a", np.zeros(512, np.float32))
    pool.step()
    m = pool.metrics()
    assert m["steps"] == 1 and m["p50_ms"] >= 0


def test_livepool_multi_hop_steps_match_single():
    cfg = StretchConfig(channels=1, block=512, interval=128, formants=False)
    x = tone(550.0, 8192, SR)

    def run(hps):
        pool = LivePool(capacity=2, sample_rate=SR, channels=1, config=cfg,
                        names=["a", "b"], hops_per_step=hps)
        pool.schedule("a", {"output": 0.0, "active": True, "semitones": 7})
        pool.schedule("b", {"output": 0.0, "active": True})
        pool.feed("a", x)
        pool.feed("b", x * 0.5)
        outs = [pool.step() for _ in range(8192 // (cfg.interval * hps))]
        return np.concatenate(outs, axis=2)

    y1, y4 = run(1), run(4)
    np.testing.assert_allclose(y1, y4, atol=2e-4)


def test_livepool_fidelity_engine():
    """LivePool(engine="fidelity"): the blob-exact coupled mode serves live
    voices (VERDICT r4 missing #2).  Pitch shift applies; a starved voice
    emits silence; the pool plumbing is bit-identical to driving
    batched_live_fidelity_chunk directly."""
    import jax.numpy as jnp

    from bauklank_tpu.engine.fidelity import init_batched_live_fidelity_state
    from bauklank_tpu.engine.spectral import SpectralConfig

    cfg = StretchConfig(channels=1, block=512, interval=128, formants=False)
    pool = LivePool(capacity=2, sample_rate=SR, channels=1, config=cfg,
                    names=["a", "b"], hops_per_step=8, engine="fidelity")
    assert pool.engine == "fidelity"
    pool.schedule("a", {"output": 0.0, "active": True, "semitones": 12})
    pool.schedule("b", {"output": 0.0, "active": True})
    x = tone(440.0, 16384, SR)
    pool.feed("a", x)
    # b gets NO input -> silence
    n = cfg.interval * 8
    outs = [pool.step() for _ in range(16384 // n)]
    y = np.concatenate(outs, axis=2)
    seg_a = y[0, 0, 4 * cfg.block:]
    assert abs(dominant_freq(seg_a, SR) - 880.0) < 8.0
    assert np.sqrt((seg_a ** 2).mean()) > 0.1
    assert np.abs(y[1]).max() < 1e-6

    # plumbing bit-identity: drive the pool's OWN jitted step with
    # hand-built chunks/params — pins the FIFO chunking, the timemap
    # param packing, and the state threading.  (An eager engine-level
    # drive is NOT a fair bitwise oracle: jit-vs-eager ulp differences
    # compound through the hop recurrence to ~2e-3 over 128 hops, the
    # same drift class as docs/STATUS-r4.md's CPU-vs-TPU scan trees.)
    from bauklank_tpu.serve.livepool import _live_fidelity_step

    scfg = SpectralConfig(1, 512, 128)
    st = init_batched_live_fidelity_state(scfg, 8, 2)
    packed = np.zeros((2, 7), np.float32)
    packed[0] = (1.0, 1.0, 2.0 ** (12 / 12.0), 8000.0 / SR, 1.0, 0.0, 0.0)
    packed[1] = (1.0, 1.0, 1.0, 8000.0 / SR, 1.0, 0.0, 0.0)
    ref = []
    for c in range(16384 // n):
        chunk = np.zeros((2, 1, n), np.float32)
        chunk[0, 0] = x[c * n:(c + 1) * n]
        st, emit = _live_fidelity_step(
            scfg, st, jnp.asarray(chunk), jnp.asarray(packed))
        ref.append(np.asarray(emit))
    np.testing.assert_array_equal(y, np.concatenate(ref, axis=-1))
