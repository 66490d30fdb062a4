"""Pallas sequential compensated-cumsum kernel (interpret mode).

Pins three contracts of ``ops/pallas/compsum.py``:

1. bitwise equality with a numpy left-to-right ``_df_combine(acc, (x, 0))``
   fold (the kernel IS that fold — any Mosaic/interpret lowering that
   reassociates or contracts the TwoSum would break this);
2. ~49-bit accuracy vs an f64 cumsum on adversarial magnitudes
   (the property the compensation exists for — plain f32 prefix
   differences cancel catastrophically, engine/spectral._comp_cumsum);
3. gap constancy: folding exact zeros leaves the (hi, lo) pair bitwise
   unchanged — the identity the peaks map's halved boundary lookup
   relies on (cs[end_pos[s]] == cs[start_pos[s+1]-1], docs/STATUS-r4.md).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bauklank_tpu.ops.pallas.compsum import comp_cumsum_seq


def _np_fold(x):
    k, b, n = x.shape
    hi = np.zeros_like(x)
    lo = np.zeros_like(x)
    ah = np.zeros((k, n), np.float32)
    al = np.zeros((k, n), np.float32)
    for i in range(b):
        xi = x[:, i]
        s1 = ah + xi
        v = s1 - ah
        e = (ah - (s1 - v)) + (xi - v)
        l_ = al + e
        s = s1 + l_
        nl = l_ - (s - s1)
        hi[:, i] = s
        lo[:, i] = nl
        ah, al = s, nl
    return hi, lo


@pytest.fixture(scope="module")
def adversarial():
    rng = np.random.default_rng(7)
    # huge dynamic range + an exact-zero gap + a 0/1 integer channel —
    # the three channel regimes the peaks map feeds (w, w*b, run_start)
    x = rng.standard_normal((3, 700, 128)).astype(np.float32)
    x[0] *= np.exp2(rng.integers(-60, 60, (700, 128))).astype(np.float32)
    x[1, 100:200] = 0.0
    x[2] = rng.integers(0, 2, (700, 128)).astype(np.float32)
    return x


def test_bitwise_vs_sequential_fold(adversarial):
    hi, lo = comp_cumsum_seq(jnp.asarray(adversarial), True)
    rhi, rlo = _np_fold(adversarial)
    np.testing.assert_array_equal(np.asarray(hi), rhi)
    np.testing.assert_array_equal(np.asarray(lo), rlo)


def test_accuracy_vs_f64(adversarial):
    hi, lo = comp_cumsum_seq(jnp.asarray(adversarial), True)
    f64 = np.cumsum(adversarial.astype(np.float64), axis=1)
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    rel = np.abs(got - f64) / np.maximum(np.abs(f64), 1e-30)
    assert rel.max() < 1e-9  # ~49-bit pairs; plain f32 would be ~1e-2 here


def test_gap_constancy(adversarial):
    hi, lo = comp_cumsum_seq(jnp.asarray(adversarial), True)
    # channel 1 is zero over bands [100, 200): the pair must be frozen
    np.testing.assert_array_equal(np.asarray(hi)[1, 99], np.asarray(hi)[1, 199])
    np.testing.assert_array_equal(np.asarray(lo)[1, 99], np.asarray(lo)[1, 199])


def test_band_padding_path():
    # B not a multiple of the chunk: the zero-padded tail must not
    # perturb the real range
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 300, 128)).astype(np.float32)
    hi, lo = comp_cumsum_seq(jnp.asarray(x), True)
    rhi, rlo = _np_fold(x)
    assert hi.shape == (2, 300, 128)
    np.testing.assert_array_equal(np.asarray(hi), rhi)
    np.testing.assert_array_equal(np.asarray(lo), rlo)


def test_comp_cumsum_dispatch_unchanged_on_cpu():
    # engine/spectral._comp_cumsum keeps the associative form on CPU —
    # the hop-exact pinning must not silently start using the kernel
    from bauklank_tpu.engine import spectral

    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 64, 3)).astype(np.float32)
    hi, lo = spectral._comp_cumsum(jnp.asarray(x), axis=1)
    import jax

    zeros = jnp.zeros_like(jnp.asarray(x))
    rhi, rlo = jax.lax.associative_scan(
        spectral._df_combine, (jnp.asarray(x), zeros), axis=1
    )
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(rhi))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(rlo))
