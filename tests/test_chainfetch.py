"""ops.pallas.selection + ops.pallas.chainfetch vs the pinned gather
semantics (interpret mode on CPU = plain f32 jnp ops, so every check is
bit-exact by construction — the same contract `ops.blockgather` carries).
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from bauklank_tpu.ops.blockgather import block_gather  # noqa: E402
from bauklank_tpu.ops.pallas.chainfetch import (  # noqa: E402
    chainfetch,
    chainfetch_t1,
)
from bauklank_tpu.ops.pallas.selection import (  # noqa: E402
    pallas_gather,
    pallas_supported,
)


def _adversarial_positions(rng, n, k, b):
    """Fractional positions hitting every edge class: negative, >= B,
    exactly integral, block boundaries, non-monotone."""
    base = rng.uniform(-3.0, b + 3.0, (n, k - 10)).astype(np.float32)
    edges = np.tile(
        np.asarray(
            [-1.0, -0.25, 0.0, 0.5, 127.75, 128.0, b - 1.0, b - 0.5,
             float(b), b + 2.0],
            np.float32,
        ),
        (n, 1),
    )
    return np.concatenate([base, edges], axis=1)


@pytest.mark.parametrize("n,b,p,k", [(5, 3072, 4, 1280), (3, 256, 2, 700),
                                     (4, 2688, 6, 512)])
def test_pallas_gather_bit_exact_vs_block_gather(n, b, p, k):
    rng = np.random.default_rng(11)
    arrs = (rng.standard_normal((n, b, p))
            * 10.0 ** rng.uniform(-12, 12, (n, b, p))).astype(np.float32)
    pos = _adversarial_positions(rng, n, k, b)
    assert pallas_supported(b, k)
    ref = np.asarray(block_gather(jnp.asarray(arrs), jnp.asarray(pos),
                                  t=8, chunk=8))
    got = np.asarray(pallas_gather(jnp.asarray(arrs), jnp.asarray(pos)))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("b,long_step", [(3072, 5), (256, 4), (2688, 4)])
def test_chainfetch_bit_exact_vs_block_gather(b, long_step):
    """The fused deterministic-regime kernel == the two generic
    block_gather calls it replaces, bit for bit, at adversarial
    input_bin tables (non-monotone, edge-touching) and step extremes."""
    rng = np.random.default_rng(23)
    n, c = 6, 2
    t1 = chainfetch_t1(b, long_step)
    assert t1 is not None and t1 >= 2 * long_step + 3

    spec_p = rng.standard_normal((n, b, 2 * c)).astype(np.float32)
    prev_p = rng.standard_normal((n, b, 2 * c)).astype(np.float32)
    en_p = np.abs(rng.standard_normal((n, b, c))).astype(np.float32)
    # input_bin: non-monotone map in [0, B) plus exact-edge rows
    ib = rng.uniform(0, b - 1e-3, (n, b)).astype(np.float32)
    ib[:, :4] = [0.0, b - 1.0, b - 0.51, 1.0]
    step = np.asarray([0.5, 0.8, 1.0, 1.3, 1.7, 2.0], np.float32)[:n]

    ib_j = jnp.asarray(ib)
    c_col = jnp.asarray(step)[:, None]
    zf = jnp.zeros((n, 1), jnp.float32)
    us_pos = jnp.concatenate([ib_j[:, 1:], zf], axis=1) - c_col
    ul_pos = (
        jnp.concatenate(
            [ib_j[:, long_step:], jnp.zeros((n, long_step), jnp.float32)],
            axis=1)
        - c_col * long_step
    )
    pos5 = jnp.concatenate(
        [ib_j, ib_j - c_col, ib_j - c_col * long_step, us_pos, ul_pos],
        axis=1)

    five, comb = chainfetch(
        jnp.asarray(spec_p), jnp.asarray(prev_p), jnp.asarray(en_p),
        ib_j, us_pos, ul_pos, jnp.asarray(step),
        long_step=long_step, t1=t1)

    five_ref = block_gather(jnp.asarray(spec_p), pos5, t=8, chunk=8)
    comb_all = jnp.concatenate([jnp.asarray(prev_p), jnp.asarray(en_p)],
                               axis=2)
    comb_ref = block_gather(comb_all, ib_j, t=8, chunk=8)
    np.testing.assert_array_equal(np.asarray(five), np.asarray(five_ref))
    np.testing.assert_array_equal(np.asarray(comb), np.asarray(comb_ref))


def test_chainfetch_t1_rules():
    assert chainfetch_t1(3072, 5) == 24      # nhi == 128 preferred
    assert chainfetch_t1(2688, 4) == 21      # 2688/128
    assert chainfetch_t1(256, 4) == 16       # small grid fallback
    assert chainfetch_t1(96, 4) is None      # too few bands
    assert chainfetch_t1(250, 5) is None     # no dividing block size
