"""Pallas band-chain kernel vs a straight-numpy restatement of the chain."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from bauklank_tpu.ops.pallas.bandchain import band_chain  # noqa: E402

EPS = 1e-15


def _chain_numpy(d1, d2, u, pe, pi, mc, lock, pec, pic, long_step):
    """[S] streams x [B] bands x [C] channels reference chain."""
    s_n, b_n = pe.shape
    c_n = lock.shape[0]
    out = np.zeros((c_n, s_n, b_n), complex)
    for s in range(s_n):
        for b in range(b_n):
            m = mc[s, b]
            ph = u[s, b]
            if b >= 1:
                ph += out[m, s, b - 1] * d1[s, b]
            if b >= long_step:
                ph += out[m, s, b - long_step] * d2[s, b]
            p2 = abs(ph) ** 2
            if p2 <= EPS:
                ph = pi[s, b]
                p2 = abs(ph) ** 2 + EPS
            om = np.sqrt(pe[s, b] / p2) * ph
            for c in range(c_n):
                if c == m:
                    out[c, s, b] = om
                    continue
                phc = om * lock[c, s, b]
                p2c = abs(phc) ** 2
                if p2c <= EPS:
                    phc = pic[c, s, b]
                    p2c = abs(phc) ** 2 + EPS
                out[c, s, b] = np.sqrt(pec[c, s, b] / p2c) * phc
    return out


@pytest.mark.parametrize("c_n,long_step,b_n", [(1, 4, 256), (2, 5, 512)])
def test_band_chain_matches_numpy(c_n, long_step, b_n):
    s_n = 128  # one lane tile
    rng = np.random.default_rng(3)

    def cplx(shape):
        return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
            np.complex64
        )

    d1, d2, u, pi = (cplx((s_n, b_n)) * 0.5 for _ in range(4))
    pe = np.abs(rng.standard_normal((s_n, b_n))).astype(np.float32) + 0.01
    mc = rng.integers(0, c_n, (s_n, b_n)).astype(np.int32)
    lock = cplx((c_n, s_n, b_n))
    pec = np.abs(rng.standard_normal((c_n, s_n, b_n))).astype(np.float32) + 0.01
    pic = cplx((c_n, s_n, b_n))
    # sprinkle exact zeros to exercise the EPS fallbacks
    u[:, 5] = 0.0
    d1[:, 5] = 0.0
    d2[:, 5] = 0.0

    want = _chain_numpy(d1, d2, u, pe, pi, mc, lock, pec, pic, long_step)

    def plane(z):  # [S, B] complex -> re/im [B, S]
        return np.real(z).T.astype(np.float32), np.imag(z).T.astype(np.float32)

    lead = np.stack(
        [*plane(d1), *plane(d2), *plane(u), *plane(pi),
         pe.T.astype(np.float32)]
    )  # [9, B, S]
    onehot = (np.arange(c_n)[:, None, None] == mc[None]).astype(np.float32)
    chan = np.stack(
        [
            np.stack([
                onehot[c].T,
                *[a.T.astype(np.float32) for a in
                  (np.real(lock[c]), np.imag(lock[c]))],
                pec[c].T.astype(np.float32),
                *[a.T.astype(np.float32) for a in
                  (np.real(pic[c]), np.imag(pic[c]))],
            ])
            for c in range(c_n)
        ]
    )  # [C, 6, B, S]

    out = np.asarray(band_chain(jnp.asarray(lead), jnp.asarray(chan), long_step,
                                True))
    got = (out[:, 0] + 1j * out[:, 1]).transpose(0, 2, 1)  # [C, S, B]
    # float64 oracle vs the f32 kernel: a few elements near normalization
    # boundaries differ at ~1e-4; the strict f32-vs-f32 equivalence against
    # the engine's lax.scan is pinned in tests/test_spectral.py
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def test_spectral_hop_batched_kernel_matches_scan():
    """spectral_hop_batched with the Pallas chain (interpret mode) must
    match the vmapped lax.scan path bit-for-bit-ish (same f32 math)."""
    from bauklank_tpu.engine.spectral import (
        SpectralConfig, init_spectral_state, spectral_hop_batched,
    )

    cfg = SpectralConfig(2, 256, 64)
    s_n = 4
    rng = np.random.default_rng(9)

    def spectra(shape):
        re = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        im = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        return jax.jit(jax.lax.complex)(re, im)

    si = spectra((s_n, cfg.channels, cfg.bands))
    sp = spectra((s_n, cfg.channels, cfg.bands))
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (s_n,) + x.shape).copy(),
        init_spectral_state(cfg),
    )
    tf = jnp.asarray(np.linspace(0.8, 4.0, s_n), jnp.float32)  # incl. MINSTD
    mult = jnp.asarray(np.linspace(0.7, 1.6, s_n), jnp.float32)
    lim = jnp.full((s_n,), 0.18, jnp.float32)

    st_k, out_k = spectral_hop_batched(cfg, states, si, sp, tf, mult, lim,
                                       use_kernel=True)
    st_s, out_s = spectral_hop_batched(cfg, states, si, sp, tf, mult, lim,
                                       use_kernel=False)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(st_k.rng), np.asarray(st_s.rng))
