"""Shared-window six-family gather in pure XLA (the chainfetch idea,
MXU-batched).

In the deterministic time-step regime (every stream at timeFactor <= 2,
i.e. rate >= 0.5 — the whole BASELINE matrix) the blob's vertical steps
are the scalar clamp(tf, 0.5, 2), so the six chain-input gather families
(`engine.spectral._hop_inputs_hoisted`) all read within a 2L+1-band
window of input_bin[k]:

    pred    @ input_bin[k]
    down_s  @ input_bin[k] - c            (c in [0.5, 2])
    down_l  @ input_bin[k] - L*c
    us      @ input_bin[k+1] - c          (the next band's window)
    ul      @ input_bin[k+L] - L*c
    comb    @ input_bin[k]                (prev_rot + energy planes)

The generic path (`ops.blockgather`) runs one one-hot selection PER
position: ~52*B^2 selection MACs and ~6M/example of VPU mask generation
(the measured wall, benchmarks/exp_selection.py).  Here ONE window
selection per output band serves every family: a [B, nhi] block one-hot
times the overlapped window payload fetches each band's 2*t1-wide
candidate strip for ALL 10 payload planes in one batched einsum
(20*B^2 MACs, 2.6x fewer), and the per-family taps are pure 0/1
selections inside that strip.

The same idea as a Pallas kernel (ops/pallas/chainfetch.py) is a
measured NEGATIVE on the v5e — its per-N grid runs B-wide matmuls that
never tile the MXU (57.3 vs 39.7 ms at S=64 H=8).  This module keeps
the math in XLA so the selection einsum batches across all N examples
exactly like the blockgather einsum that beat it.

Exactness (the repo's maxdiff==0 contract vs `_get_fractional`):

- the selection einsum is one-hot x f32 at HIGHEST precision — exact
  row copies (each output sums exactly one nonzero product);
- tap selection is PURE 0/1 (every product is 0 or a copy, exact under
  any dot/FMA lowering) and runs inside the lax.map chunk body; the
  interpolation-weighted combine happens ONCE at the caller's top level
  (the chunked-gather FMA hazard, ops/blockgather.py taps_chunk);
- in this regime the six families need only THREE tap selections:
  pred and comb share the input_bin position (one selection over all 10
  payload planes), and us/ul taps are exact lane shifts of down_s /
  down_l taps (us_pos[k] = input_bin[k+1] - c = the down_s position at
  band k+1, since the step is the same scalar for every band; weights
  shift identically, being functions of the same float positions).  The
  last ``shift`` lanes have no k+shift source — there the only
  possibly-valid tap is band 0 (upper tap of a position in (-1, 0)),
  patched directly (tail_fix, same law as chainfetch's).

Reference parity: the gathers this fuses are the blob's getFractional
calls in steps 6-7 (/root/reference/app/SignalsmithStretch.mjs:826-954);
semantics pinned by tests/test_windowgather.py (bit-identity vs
`ops.blockgather.block_gather` after the weighted combine) and the
tests/test_spectral.py hoisted-vs-local maxdiff==0 micro-check.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["window_gather_taps", "window_t1"]


def window_t1(bands: int, long_step: int) -> int | None:
    """Smallest block size t1 with bands % t1 == 0 whose 2*t1 window
    covers the family span (anchor = floor(input_bin - L*c) with
    c <= 2: the furthest tap is floor(input_bin)+1 <= anchor + 2L+2,
    so t1 >= 2L+3 suffices).  Smaller t1 = narrower tap masks (VPU) at
    the same total einsum MACs; None if the band grid can't host one."""
    span = 2 * long_step + 3
    for t1 in (16, 24, 32, 48, 64, 96, 128):
        if t1 >= span and bands % t1 == 0 and bands // t1 >= 8:
            return t1
    return None


def _lshift(x: jnp.ndarray, sh: int) -> jnp.ndarray:
    """Lane shift left (zero fill) on the last axis."""
    return jnp.concatenate(
        [x[..., sh:], jnp.zeros_like(x[..., :sh])], axis=-1)


def window_gather_taps(
    spec_planes: jnp.ndarray,   # [N, B, 2C] f32 — spec_in re/im planes
    prev_planes: jnp.ndarray,   # [N, B, 2C] f32 — rotated prev planes
    energy: jnp.ndarray,        # [N, B, C]  f32 — energy_c planes
    input_bin: jnp.ndarray,     # [N, B] f32
    pos5: jnp.ndarray,          # [N, 5B] f32 — pred|down_s|down_l|us|ul
    step: jnp.ndarray,          # [N] f32 — the scalar c = clamp(tf,.5,2)
    long_step: int = 5,
    t1: int = 16,
    chunk: int = 8,
):
    """Uncombined taps for the five-family and comb gathers, in the
    exact layouts `_hop_inputs_hoisted` consumes:

        (ga5, gb5) [N, 5B, 2C]  — lower/upper taps at pos5
        (gac, gbc) [N, B, 3C]   — lower/upper taps at input_bin

    The caller combines ``ga*w0 + gb*w1`` at its top level with the
    weights `ops.blockgather.block_gather(return_taps=True)` would
    return (identical formula from the same positions).  Tap values
    match block_gather's wherever the weight is nonzero; where a weight
    is zero the tap may be 0 instead of block_gather's clipped-window
    residue — the combined result is bit-identical either way."""
    n, b, p_spec = spec_planes.shape
    c2 = prev_planes.shape[2]
    ce = energy.shape[2]
    p_all = p_spec + c2 + ce
    nhi = b // t1
    lf = float(long_step)
    c = step[:, None]                                     # [N, 1]

    payload = jnp.concatenate([spec_planes, prev_planes, energy], axis=2)
    padded = jnp.pad(payload, ((0, 0), (0, t1), (0, 0)))
    a0 = payload.reshape(n, nhi, t1, p_all)
    a1 = padded[:, t1:].reshape(n, nhi, t1, p_all)
    win = jnp.concatenate([a0, a1], axis=2).reshape(n, nhi, 2 * t1 * p_all)

    # window anchor: the lowest family floor is floor(input_bin - L*c)
    anchor = jnp.clip(
        jnp.floor(input_bin - lf * c).astype(jnp.int32), 0, b - 1)
    hi = anchor // t1                                     # [N, B]

    # The six families collapse to THREE tap selections in this regime:
    # pred and comb share the position input_bin (one selection over all
    # 10 payload planes), and because the step is the SAME scalar c for
    # every band, us_pos[k] = input_bin[k+1] - c = down_s position at
    # band k+1 and ul_pos[k] = down_l position at band k+L — us/ul taps
    # are exact lane shifts of down_s/down_l taps (their interpolation
    # weights shift identically, being functions of the same float
    # positions), reconstructed at top level below.
    pos_f = [input_bin, pos5[:, b: 2 * b], pos5[:, 2 * b: 3 * b]]
    deltas = []
    for pos in pos_f:
        i0 = jnp.floor(pos).astype(jnp.int32)
        deltas.append(i0 - hi * t1)                       # [N, B] tap offset
    delta = jnp.stack(deltas, axis=1)                     # [N, 3, B] int32

    fam_planes = ((0, p_all), (0, p_spec), (0, p_spec))

    def taps_chunk(args):
        """PURE 0/1 selection (chunked-gather FMA hazard: no weight may
        touch this body — ops/blockgather.py taps_chunk)."""
        hi_c, delta_c, win_c = args                       # [c,B] [c,6,B] [c,nhi,R]
        jj = jnp.arange(nhi, dtype=jnp.int32)
        oh = (hi_c[..., None] == jj).astype(jnp.float32)  # [c, B, nhi]
        rows = jnp.einsum(
            "cbj,cjr->cbr", oh, win_c,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(hi_c.shape[0], b, 2 * t1, p_all)
        oto = jnp.arange(2 * t1, dtype=jnp.int32)
        outs = []
        for f, (p0, p1) in enumerate(fam_planes):
            d = delta_c[:, f, :, None]                    # [c, B, 1]
            m0 = (oto == d).astype(jnp.float32)           # [c, B, 2t1]
            m1 = (oto == d + 1).astype(jnp.float32)
            seg = rows[..., p0:p1]                        # [c, B, 2t1, Pf]
            # masked sum, not a dot: at most ONE nonzero term per output
            # (exact under any lowering), and the [c*B]-batched tiny dots
            # an einsum would emit never tile the MXU
            outs.append(jnp.sum(seg * m0[..., None], axis=2))
            outs.append(jnp.sum(seg * m1[..., None], axis=2))
        return tuple(outs)

    if n > chunk:
        pad_n = (-n) % chunk
        def padn(x):
            return jnp.pad(x, ((0, pad_n),) + ((0, 0),) * (x.ndim - 1))
        hi_p, delta_p, win_p = map(padn, (hi, delta, win))
        nc = (n + pad_n) // chunk
        outs = jax.lax.map(
            taps_chunk,
            (
                hi_p.reshape(nc, chunk, b),
                delta_p.reshape(nc, chunk, 3, b),
                win_p.reshape(nc, chunk, nhi, 2 * t1 * p_all),
            ),
        )
        outs = [o.reshape(n + pad_n, b, -1)[:n] for o in outs]
    else:
        outs = list(taps_chunk((hi, delta, win)))
    ga_ib, gb_ib, ga_ds, gb_ds, ga_dl, gb_dl = outs

    # us/ul taps = lane shifts of down_s/down_l taps (positions equal by
    # construction, see above); the last ``shift`` lanes have no k+shift
    # source — their positions sit below 0, where only an upper tap at
    # band 0 can be valid (chainfetch tail_fix; the engine itself zeroes
    # these lanes, but the block_gather contract sees them)
    def shifted(ga, gb, pos, sh):
        ga = jnp.moveaxis(_lshift(jnp.moveaxis(ga, 1, -1), sh), -1, 1)
        gb = jnp.moveaxis(_lshift(jnp.moveaxis(gb, 1, -1), sh), -1, 1)
        ptail = pos[:, b - sh:]                           # [N, sh]
        i0 = jnp.floor(ptail).astype(jnp.int32)
        val = jnp.where(
            ((i0 + 1) == 0)[:, :, None], spec_planes[:, :1, :], 0.0)
        gb = jnp.concatenate([gb[:, : b - sh], val], axis=1)
        ga = jnp.concatenate([ga[:, : b - sh], jnp.zeros_like(val)], axis=1)
        return ga, gb

    ga_us, gb_us = shifted(ga_ds, gb_ds, pos5[:, 3 * b: 4 * b], 1)
    ga_ul, gb_ul = shifted(ga_dl, gb_dl, pos5[:, 4 * b:], long_step)
    ga5 = jnp.concatenate(
        [ga_ib[..., :p_spec], ga_ds, ga_dl, ga_us, ga_ul], axis=1)
    gb5 = jnp.concatenate(
        [gb_ib[..., :p_spec], gb_ds, gb_dl, gb_us, gb_ul], axis=1)
    gac, gbc = ga_ib[..., p_spec:], gb_ib[..., p_spec:]   # [N, B, 3C]
    return ga5, gb5, gac, gbc
