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


def test_kernel_bit_exact_at_fidelity_block():
    """The fidelity engine's analysis fetch (engine/fidelity._analyse_many):
    block 5292 is not lane-divisible, so the kernel fetches the next
    128-multiple (5376) with the window zero-extended; the windowed frame
    must be BIT-IDENTICAL to the dynamic_slice form's — the one-hot
    rotation matmul and the validity mask are exact copies, and the
    window multiply is the same single f32 rounding."""
    rng = np.random.default_rng(5)
    s, c, t, block = 2, 2, 30000, 5292
    blk = -(-block // 128) * 128
    audio = rng.standard_normal((s, c, t)).astype(np.float32)
    win = rng.uniform(0.1, 1.0, block).astype(np.float32)
    wp = np.zeros(blk, np.float32)
    wp[:block] = win
    starts = np.array([
        [-1000, 0, 131, t - 2000, t - block],
        [-6000, 77, 4096, t - 1, 12345],
    ], np.int32)

    got = np.asarray(gather_frames_windowed(
        jnp.asarray(audio), jnp.asarray(starts), jnp.asarray(wp), blk, True
    ))                                               # [S, F, C, blk]
    assert got.shape == (s, starts.shape[1], c, blk)
    np.testing.assert_array_equal(got[..., block:], 0.0)
    for si in range(s):
        want = np.asarray(gather_frames(
            jnp.asarray(audio[si]), jnp.asarray(starts[si]), block)) * win
        np.testing.assert_array_equal(
            got[si, :, :, :block].transpose(1, 0, 2), want)
