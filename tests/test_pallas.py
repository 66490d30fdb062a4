"""Pallas banded-interp kernel vs the XLA reference implementation
(interpreter mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from bauklank_tpu.ops.pallas.interp import banded_interp
from bauklank_tpu.ops.pitchmap import _interp_real


def test_banded_interp_matches_xla_impl():
    rng = np.random.default_rng(0)
    s, p, bins = 3, 8, 512
    x = jnp.asarray(rng.standard_normal((s, p, bins)).astype(np.float32))
    # monotone positions incl. out-of-range at both ends (like a real pitch map)
    base = np.sort(rng.uniform(-4, bins + 4, size=(s, bins))).astype(np.float32)
    pos = jnp.asarray(base)

    got = banded_interp(x, pos, window=256, interpret=True)
    want = jnp.stack(
        [_interp_real(x[i], pos[i], "zero", 128, 256) for i in range(s)]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_banded_interp_identity_positions():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 256)).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(256, dtype=jnp.float32), (2, 256))
    # window must cover TILE * slope + guard (slope 1 here) — 128 would clip
    got = banded_interp(x, pos, window=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-6)
