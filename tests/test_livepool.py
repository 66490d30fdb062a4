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
