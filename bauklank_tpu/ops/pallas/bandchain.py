"""Pallas kernel: the blob's sequential per-band Gauss-Seidel phase chain.

The fidelity engine's step 7 (docs/WASM-ALGO.md) finalizes band ``b`` from
band ``b-1`` and ``b-long_step`` — an irreducibly sequential chain over
~thousands of bands.  As a ``lax.scan`` the per-iteration operands are a
handful of [streams]-wide vectors, so XLA's loop overhead dominates
(measured ~16 µs/band → ~50 ms per hop for a whole pool).  This kernel
runs the chain as an in-core ``fori_loop`` over VMEM-resident planes with
STREAMS ON THE LANE DIMENSION: one iteration is ~40 vector ops on
[tile]-wide lanes, with the last ``long_step`` finalized rows carried in a
ring scratch that persists across band-chunks of the grid.

Math is identical to the scan in ``engine.spectral.spectral_hop``:

    ph   = u[b] + 1{b>=1} out[mc, b-1]·d1[b] + 1{b>=L} out[mc, b-L]·d2[b]
    (|ph|^2 <= EPS -> ph = pi[b])
    out[mc, b] = sqrt(pe[b]/|ph|^2)·ph
    out[c, b]  = sqrt(pec[c,b]/|out_mc·lock[c,b]|^2)·(out_mc·lock[c,b])
                 (same EPS fallback with pic[c,b])

Layouts (S = streams, padded to the lane tile; B = bands; C = channels):
    lead [9, B, S] f32: d1.re, d1.im, d2.re, d2.im, u.re, u.im,
                        pi.re, pi.im, pe            (leader-selected)
    chan [C, 6, B, S] f32: onehot(mc), lock.re, lock.im, pec,
                           pic.re, pic.im
    out  [C, 2, B, S] f32: out.re, out.im
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["band_chain"]

EPS = 1e-15  # engine.spectral.EPS
LANE = 128
B_CHUNK = 256


def _kernel(channels, long_step, b_chunk, lead_ref, chan_ref, out_ref, ring):
    # grid = (stream_tile, band_chunk); the band-chunk axis is minor
    # (fastest), so the ring scratch carries the chain across chunks and
    # resets when a new stream tile begins
    @pl.when(pl.program_id(1) == 0)
    def _init():
        ring[...] = jnp.zeros_like(ring)

    base = pl.program_id(1) * b_chunk

    def body(i, _):
        b = base + i

        def lead(k):
            return lead_ref[k, pl.ds(i, 1), :][0]

        d1r, d1i = lead(0), lead(1)
        d2r, d2i = lead(2), lead(3)
        ur, ui = lead(4), lead(5)
        pir, pii = lead(6), lead(7)
        pe = lead(8)

        # leader's previous outputs from the ring: row L-1 = band b-1,
        # row 0 = band b-long_step; leader channel via the onehot plane
        o1r = jnp.zeros_like(ur)
        o1i = jnp.zeros_like(ur)
        oLr = jnp.zeros_like(ur)
        oLi = jnp.zeros_like(ur)
        for c in range(channels):
            oh = chan_ref[c, 0, pl.ds(i, 1), :][0]
            o1r += ring[c, 0, long_step - 1, :] * oh
            o1i += ring[c, 1, long_step - 1, :] * oh
            oLr += ring[c, 0, 0, :] * oh
            oLi += ring[c, 1, 0, :] * oh

        hs = (b >= 1).astype(jnp.float32)
        hl = (b >= long_step).astype(jnp.float32)
        phr = ur + hs * (o1r * d1r - o1i * d1i) + hl * (oLr * d2r - oLi * d2i)
        phi = ui + hs * (o1r * d1i + o1i * d1r) + hl * (oLr * d2i + oLi * d2r)
        p2 = phr * phr + phi * phi
        tiny = p2 <= EPS
        phr = jnp.where(tiny, pir, phr)
        phi = jnp.where(tiny, pii, phi)
        p2 = jnp.where(tiny, pir * pir + pii * pii + EPS, p2)
        s = jnp.sqrt(pe / p2)
        omr = s * phr
        omi = s * phi

        for c in range(channels):
            oh = chan_ref[c, 0, pl.ds(i, 1), :][0]
            lr = chan_ref[c, 1, pl.ds(i, 1), :][0]
            li = chan_ref[c, 2, pl.ds(i, 1), :][0]
            pec = chan_ref[c, 3, pl.ds(i, 1), :][0]
            pcr = chan_ref[c, 4, pl.ds(i, 1), :][0]
            pci = chan_ref[c, 5, pl.ds(i, 1), :][0]
            cr = omr * lr - omi * li
            ci = omr * li + omi * lr
            c2 = cr * cr + ci * ci
            tc = c2 <= EPS
            cr = jnp.where(tc, pcr, cr)
            ci = jnp.where(tc, pci, ci)
            c2 = jnp.where(tc, pcr * pcr + pci * pci + EPS, c2)
            sc = jnp.sqrt(pec / c2)
            ocr = jnp.where(oh > 0.5, omr, sc * cr)
            oci = jnp.where(oh > 0.5, omi, sc * ci)
            out_ref[c, 0, pl.ds(i, 1), :] = ocr[None]
            out_ref[c, 1, pl.ds(i, 1), :] = oci[None]
            # ring shift: drop the oldest, append band b.  At
            # long_step == 1 (overlap-1 geometries: interval == block,
            # the deployed kiosk config) band b-1 IS band b-long_step,
            # the ring is a single row, and the shift degenerates to a
            # replace (an empty `ring[1:]` slice is rejected by Pallas).
            if long_step > 1:
                ring[c, 0, :, :] = jnp.concatenate(
                    [ring[c, 0, 1:, :], ocr[None]], axis=0
                )
                ring[c, 1, :, :] = jnp.concatenate(
                    [ring[c, 1, 1:, :], oci[None]], axis=0
                )
            else:
                ring[c, 0, :, :] = ocr[None]
                ring[c, 1, :, :] = oci[None]
        return 0

    jax.lax.fori_loop(0, b_chunk, body, 0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def band_chain(
    lead: jnp.ndarray,   # [9, B, S] f32
    chan: jnp.ndarray,   # [C, 6, B, S] f32
    long_step: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Run the chain; returns out [C, 2, B, S] f32 (re/im planes)."""
    _, b_n, s_n = lead.shape
    c_n = chan.shape[0]
    assert s_n % LANE == 0, s_n
    b_chunk = B_CHUNK if b_n % B_CHUNK == 0 else b_n
    n_chunks = b_n // b_chunk
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid = (s_n // LANE, n_chunks)
    return pl.pallas_call(
        functools.partial(_kernel, c_n, long_step, b_chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, b_chunk, LANE), lambda si, ti: (0, ti, si)),
            pl.BlockSpec((c_n, 6, b_chunk, LANE), lambda si, ti: (0, 0, ti, si)),
        ],
        out_specs=pl.BlockSpec(
            (c_n, 2, b_chunk, LANE), lambda si, ti: (0, 0, ti, si)
        ),
        out_shape=jax.ShapeDtypeStruct((c_n, 2, b_n, s_n), jnp.float32),
        scratch_shapes=[
            # [C, 2(re/im), L, LANE]: the last long_step finalized bands,
            # persisting across band-chunks of one stream tile
            pltpu.VMEM((c_n, 2, long_step, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(lead, chan)
