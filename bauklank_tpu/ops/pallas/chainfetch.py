"""Pallas kernel: fused five-family + comb gather for the deterministic
time-step regime (timeFactor <= 2, i.e. rate >= 0.5 — the BASELINE
throughput/fidelity matrix).

In this regime the blob's vertical time steps are the SCALAR
clamp(tf, 0.5, 2) (engine.spectral._minstd_steps), so the six chain-input
gather families all read within a 12-band window of input_bin[k]:

    pred      = spec_in  @ input_bin[k]
    down_s    = spec_in  @ input_bin[k] - c          (c in [0.5, 2])
    down_l    = spec_in  @ input_bin[k] - 5c
    us        = spec_in  @ input_bin[k+1] - c        (next band's window)
    ul        = spec_in  @ input_bin[k+5] - 5c
    prev/pe   = prev_rot, energy_c @ input_bin[k]

The generic path (`ops.blockgather`, one one-hot selection PER position)
costs MACs ~ 2*(5B)*B*P_spec + 2*B*B*P_comb and is bound by one-hot
mask work (benchmarks/exp_selection.py).  Here ONE window selection per
output band serves every family: the 10 payload planes (spec re/im x C,
prev re/im x C, energy x C) ride one [2t1*P, nhi] @ [nhi, B] MXU matmul
(5x fewer MACs), the us/ul families reuse the neighbours' windows via
lane shifts, and the tap masks carry the interpolation weights directly
(w0*(o==d0) + w1*(o==d1)), so the 26 output planes come out of one
weighted sublane reduce.

Exactness: the selection matmul is one-hot x f32 at HIGHEST (exact row
copies, house precision); the weighted tap reduce multiplies each tap by
its weight and adds exactly one nonzero pair per output — on the CPU
interpret path (all golden/bit-exact gates) this reproduces
`_get_fractional`'s rounding sequence term for term.  MINSTD regimes
(tf > 2) and odd band grids use the generic path — the caller branches
(`engine.spectral._hop_inputs_hoisted`).

Reference parity: the gathers this fuses are the blob's getFractional
calls in steps 6-7 (/root/reference/app/SignalsmithStretch.mjs:826-954);
semantics pinned by tests/test_spectral.py hoisted-vs-local maxdiff==0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["chainfetch", "chainfetch_t1", "N_FAM"]

# families: pred, down_s, down_l, us, ul (spec planes) + comb (prev+pe)
N_FAM = 6


def chainfetch_t1(bands: int, long_step: int) -> int | None:
    """Block size t1 whose 2*t1 window covers the family span (off < t1
    plus L*c + 1 <= 2L + 1 more bands: needs t1 >= 2L + 3), preferring
    nhi = bands/t1 == 128 (a full MXU contraction tile, no padding);
    None if the grid/config can't host one."""
    if bands < 128:
        return None
    span = 2 * long_step + 3
    if bands % 128 == 0 and bands // 128 >= span:
        return bands // 128
    for t1 in (16, 24, 32, 48, 64):
        if t1 >= span and bands % t1 == 0:
            return t1
    return None


def _kernel(t1: int, p_all: int, fam_planes,
            delta_ref, w_ref, arr_ref, out_ref):
    nhi = arr_ref.shape[-1]
    b = delta_ref.shape[-1]
    # window one-hot: hi-block j on sublanes, band k on lanes
    hi = delta_ref[0, N_FAM, :]                          # [B] window block
    jj = jax.lax.broadcasted_iota(jnp.int32, (nhi, b), 0)
    oh = (jj == hi[None, :]).astype(jnp.float32)
    rows = jnp.dot(arr_ref[0], oh, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # [2t1*P, B]
    rows = rows.reshape(2 * t1, p_all, b)

    # NO lane shifts in here: the us/ul families' masks arrive pre-
    # shifted (right by their band shift, zero-weighted in the pad) and
    # the caller shifts their outputs back — in-kernel lane shifts are
    # Mosaic relayouts and measurably slow.
    oo = jax.lax.broadcasted_iota(jnp.int32, (2 * t1, b), 0)
    out_parts = []
    for f, (p0, p1) in enumerate(fam_planes):
        d = delta_ref[0, f, :]                            # [B] tap offset
        w0 = w_ref[0, 2 * f, :]
        w1 = w_ref[0, 2 * f + 1, :]
        # weighted tap mask: exactly one nonzero pair per lane; products
        # round once each, the reduce adds them once — `_get_fractional`'s
        # sequence on the interpret path
        mw = (oo == d[None, :]).astype(jnp.float32) * w0[None, :] + (
            oo == (d + 1)[None, :]
        ).astype(jnp.float32) * w1[None, :]               # [2t1, B]
        out_parts.append(jnp.sum(rows[:, p0:p1, :] * mw[:, None, :], axis=0))
    out_ref[0] = jnp.concatenate(out_parts, axis=0)       # [26, B]


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _fetch(arr3_t, delta, w, t1, p_all, fam_planes, interpret):
    n, _, nhi = arr3_t.shape
    b = delta.shape[-1]
    n_out = sum(p1 - p0 for p0, p1 in fam_planes)
    # Band-axis grid blocking: the kernel's live temporaries (rows
    # [2t1*P, bb] + the per-family weighted products) scale with the band
    # block, and at bb == b == 3072 they overflow the 16 MB scoped-VMEM
    # kernel stack on the v5e (measured: 22.8 MB at S=64 H=8).  A 512-lane
    # block is ~6x under the limit; per-lane arithmetic is unchanged, so
    # the bit-exactness contract vs `_get_fractional` is unaffected.
    bb = next((c for c in (512, 384, 256, 128) if b % c == 0), b)
    return pl.pallas_call(
        functools.partial(_kernel, t1, p_all, fam_planes),
        out_shape=jax.ShapeDtypeStruct((n, n_out, b), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(n, b // bb),
            in_specs=[
                pl.BlockSpec((1, N_FAM + 1, bb), lambda ni, bi: (ni, 0, bi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * N_FAM, bb), lambda ni, bi: (ni, 0, bi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * t1 * p_all, nhi),
                             lambda ni, bi: (ni, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n_out, bb),
                                   lambda ni, bi: (ni, 0, bi),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(delta, w, arr3_t)


def chainfetch(
    spec_planes: jnp.ndarray,   # [N, B, 2C] f32 — spec_in re/im planes
    prev_planes: jnp.ndarray,   # [N, B, 2C] f32 — rotated prev planes
    energy: jnp.ndarray,        # [N, B, C]  f32 — energy_c planes
    input_bin: jnp.ndarray,     # [N, B] f32
    us_pos: jnp.ndarray,        # [N, B] f32
    ul_pos: jnp.ndarray,        # [N, B] f32
    step: jnp.ndarray,          # [N] f32 — the scalar c = clamp(tf,.5,2)
    long_step: int = 5,         # cfg.long_step (L)
    t1: int = 16,
    interpret: bool | None = None,
):
    """Returns (five [N, 5B, 2C], comb [N, B, 3C]) — identical layouts to
    the two `block_gather` calls in `_hop_inputs_hoisted` (five-family
    table order: pred | down_s | down_l | us | ul)."""
    n, b, p_spec = spec_planes.shape
    c2 = prev_planes.shape[2]
    ce = energy.shape[2]
    p_all = p_spec + c2 + ce
    nhi = b // t1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    payload = jnp.concatenate([spec_planes, prev_planes, energy], axis=2)
    padded = jnp.pad(payload, ((0, 0), (0, t1), (0, 0)))
    a0 = payload.reshape(n, nhi, t1, p_all)
    a1 = padded[:, t1:].reshape(n, nhi, t1, p_all)
    win = jnp.concatenate([a0, a1], axis=2)               # [N, nhi, 2t1, P]
    arr3_t = win.transpose(0, 2, 3, 1).reshape(n, 2 * t1 * p_all, nhi)

    c = step[:, None]                                     # [N, 1]
    lf = float(long_step)
    pos_f = [input_bin, input_bin - c, input_bin - lf * c, us_pos, ul_pos,
             input_bin]
    # window anchor: the lowest tap is floor(input_bin - L*c) (>= every
    # other family's floor by construction; us/ul anchor on k+shift)
    anchor = jnp.clip(
        jnp.floor(input_bin - lf * c).astype(jnp.int32), 0, b - 1)
    hi = anchor // t1                                     # [N, B]
    shifts = (0, 0, 0, 1, long_step, 0)

    def rshift(x, sh):  # lane shift right, zero fill (pre-shifted masks)
        return jnp.concatenate(
            [jnp.zeros_like(x[:, :sh]), x[:, : b - sh]], axis=1)

    # the us/ul families read the k+sh band's window: instead of shifting
    # rows inside the kernel (a Mosaic relayout), their tap index/weight
    # lanes arrive pre-shifted RIGHT by sh (so lane k' carries output
    # k'-sh against window k') and their outputs shift back LEFT below
    deltas, ws = [], []
    for f, pos in enumerate(pos_f):
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = (pos - i0).astype(jnp.float32)
        ok0 = ((i0 >= 0) & (i0 < b)).astype(jnp.float32)
        ok1 = ((i0 + 1 >= 0) & (i0 + 1 < b)).astype(jnp.float32)
        w0, w1 = ok0 * (1.0 - frac), ok1 * frac
        if shifts[f]:
            i0 = rshift(i0, shifts[f])
            w0, w1 = rshift(w0, shifts[f]), rshift(w1, shifts[f])
        deltas.append(i0 - hi * t1)                       # tap offset
        ws.append(w0)
        ws.append(w1)
    delta = jnp.stack(deltas + [hi], axis=1)              # [N, 7, B] int32
    w = jnp.stack(ws, axis=1)                             # [N, 12, B]

    fam_planes = ((0, p_spec), (0, p_spec), (0, p_spec), (0, p_spec),
                  (0, p_spec), (p_spec, p_all))
    out = _fetch(arr3_t, delta, w, t1, p_all, fam_planes, interpret)
    # out rows: 5 x p_spec spec families then c2+ce comb planes; undo the
    # us/ul pre-shift (their lane k' holds output k'-sh)
    fams = out[:, : 5 * p_spec].reshape(n, 5, p_spec, b)

    def lshift(x, sh):
        return jnp.concatenate(
            [x[..., sh:], jnp.zeros_like(x[..., :sh])], axis=-1)

    def tail_fix(y, pos, sh):
        """The last ``sh`` output lanes have no k+sh window; their
        positions sit below 0, where only the upper tap (band 0) can be
        valid — compute it directly with the oracle's rounding."""
        ptail = pos[:, b - sh:]                           # [N, sh]
        i0 = jnp.floor(ptail).astype(jnp.int32)
        frac = (ptail - i0).astype(jnp.float32)
        w1 = ((i0 + 1) == 0).astype(jnp.float32) * frac
        val = spec_planes[:, 0, :][:, :, None] * w1[:, None, :]  # [N,P,sh]
        return jnp.concatenate([y[..., : b - sh], val], axis=-1)

    fams = jnp.stack(
        [fams[:, 0], fams[:, 1], fams[:, 2],
         tail_fix(lshift(fams[:, 3], 1), us_pos, 1),
         tail_fix(lshift(fams[:, 4], long_step), ul_pos, long_step)],
        axis=1)
    five = jnp.moveaxis(fams, 3, 2).reshape(n, 5 * b, p_spec)
    comb = jnp.moveaxis(out[:, 5 * p_spec:], 1, 2)        # [N, B, 3C]
    return five, comb
