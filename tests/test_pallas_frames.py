"""Pallas windowed frame-fetch kernel vs the XLA gather (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from bauklank_tpu.ops.framing import gather_frames
from bauklank_tpu.ops.pallas.frames import gather_frames_windowed


def test_frames_kernel_matches_gather():
    rng = np.random.default_rng(0)
    s, c, t, block, f = 3, 2, 9000, 512, 7
    audio = rng.standard_normal((s, c, t)).astype(np.float32)
    win = rng.uniform(0.1, 1.0, block).astype(np.float32)
    # starts cover: negative partial, aligned, arbitrary residues, end
    # partial, fully out of range both sides
    starts = np.array([
        [-300, 0, 128, 131, 1000, t - 200, t + 50],
        [-600, 5, 255, 256, 4321, t - block, -5000],
        [7, 64, 129, 2048, t - block // 2, t - 1, 3333],
    ], np.int32)

    got = np.asarray(gather_frames_windowed(
        jnp.asarray(audio), jnp.asarray(starts), jnp.asarray(win), block, True
    ))
    assert got.shape == (s, f, c, block)
    for si in range(s):
        want = np.asarray(gather_frames(jnp.asarray(audio[si]), jnp.asarray(starts[si]), block))
        want = want * win  # [C, F, B]
        np.testing.assert_allclose(
            got[si].transpose(1, 0, 2), want, atol=1e-5,
            err_msg=f"stream {si}",
        )
