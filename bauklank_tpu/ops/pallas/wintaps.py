"""Pallas fused selection+taps kernel for the shared-window gather.

The XLA window gather (``ops/windowgather.py``, the r4 serving default)
is measured as two costs at [N=1024, B=3072] on the v5e: ~11.8 ms of
HIGHEST one-hot selection (MXU passes + the rows HBM round-trip) and
~13.1 ms of tap masked-sums whose [c, B, w] masks fill only w/128 of
each VPU lane tile (benchmarks/exp_winfetch.py stub/ladder).  The XLA
form is pinned to the fine (8, 20) geometry because its tap cost scales
linearly in the strip width w; the selection einsum, however, gets
CHEAPER with a coarser block stride g — MACs scale as (B/g)(g+2L+2),
and g=32 nearly halves them vs g=8.

STATUS (measured on the v5e, 2026-08-19): ISOLATED WIN, FUSED LOSS —
opt-in via ``BAUKLANK_WINFETCH=pallas``, NOT the default.  Isolated at
[N=1024, B=3072] the kernel runs 19.0 ms vs the XLA einsum's 25.0
(geom (24,36), full-band tile; the rig's MAC-count model picked the
optimum exactly).  Fused into the fidelity step it REGRESSES (41.3 vs
~31 ms at S=64 H=8, 14.7 vs ~11.3 at S=16) and OOMs HBM at N>=2048:
the kernel's materialized plane-major outputs force the caller's
weighted combine into a [N, 5B, P<=4]-minor layout whose T(8,128)
tiling pads 32x (15 GB at [2048, 15360, 4] — profile log 2026-08-19),
where the einsum form's tap sums fuse into the combine and never
materialize that buffer.  The chainfetch lesson repeated: fusion
context, not isolated time, decides.

This kernel takes the coarse geometry the XLA form can't afford and
fuses everything after the window build:

- the [ng, bt] one-hot builds IN VMEM (iota vs the hi tile — no HBM
  mask tensor, no lax.map chunking);
- ONE [P*wpad, ng] x [ng, bt] HIGHEST dot selects each band's strip for
  all payload planes (MXU-sweet: K=ng=96 at g=32, M=480, N=512) — the
  rows tensor never touches HBM;
- the tap stage runs band-minor ([wpad, bt] masks: bands on LANES, the
  strip offset on sublanes — full lane tiles instead of w/128), with
  the per-(family, tap) masks built once and shared across planes, and
  the plane reduction as 8-aligned static sublane slices (wpad = 48).

Exactness is the same law as the XLA form (module docstring there): the
one-hot dot copies rows exactly at HIGHEST; tap masks are PURE 0/1 with
the upper tap as the explicit ``t == d+1`` mask (the einsum_m1 form —
d <= w-2 keeps d+1 in-window, and d == -1, a position in (-1, 0), hits
t == 0 exactly); no interpolation weight enters the kernel (the
chunked-gather FMA hazard, ops/blockgather.py) — the weighted combine
stays at the caller's top level.  Where a tap's weight is zero the tap
value is 0 or an unused in-window residue, identical in the combine.

Reference parity: the getFractional calls of the blob's steps 6-7
(/root/reference/app/SignalsmithStretch.mjs:826-954); bit-identity vs
``ops.blockgather.block_gather`` pinned by tests/test_windowgather.py
(fetch="pallas" rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["window_taps_fused"]


def _kernel(p_all, p_spec, wpad, ng, winT_ref, aux_ref, *out_refs):
    bt = aux_ref.shape[2]
    hi = aux_ref[0, 0:1, :]                               # [1, bt] i32
    jj = jax.lax.broadcasted_iota(jnp.int32, (ng, bt), 0)
    oh = (jj == hi).astype(jnp.float32)                   # [ng, bt]
    rows_t = jax.lax.dot_general(
        winT_ref[0],                                      # [P*wpad, ng]
        oh,
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                                     # [P*wpad, bt]
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (wpad, bt), 0)
    for f, pf in enumerate((p_all, p_spec, p_spec)):
        d = aux_ref[0, f + 1: f + 2, :]                   # [1, bt] i32
        m0 = (t_iota == d).astype(jnp.float32)            # [wpad, bt]
        m1 = (t_iota == d + 1).astype(jnp.float32)
        ga_ref, gb_ref = out_refs[2 * f], out_refs[2 * f + 1]
        for p in range(pf):
            seg = rows_t[p * wpad: (p + 1) * wpad, :]     # 8-aligned slice
            ga_ref[0, p, :] = jnp.sum(seg * m0, axis=0)
            gb_ref[0, p, :] = jnp.sum(seg * m1, axis=0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def window_taps_fused(
    winT: jnp.ndarray,          # [N, P*wpad, ng] f32 — r = p*wpad + t
    aux: jnp.ndarray,           # [N, 4, B] i32 — hi | d_ib | d_ds | d_dl
    p_all: int,
    p_spec: int,
    wpad: int,
    bt: int | None = None,
    interpret: bool | None = None,
):
    """Six uncombined tap tensors in plane-major layout:

        (ga_ib, gb_ib) [N, p_all, B], (ga_ds, gb_ds, ga_dl, gb_dl)
        [N, p_spec, B]

    The caller transposes to the [N, B, Pf] layout ``_finish`` expects
    (XLA fuses the transpose into the weighted-combine consumers)."""
    n, r, ng = winT.shape
    b = aux.shape[2]
    assert r == p_all * wpad and wpad % 8 == 0, (r, p_all, wpad)
    assert winT.dtype == jnp.float32 and aux.dtype == jnp.int32
    if bt is None:
        # Largest band tile within a ~10 MB VMEM budget (v5e scoped-VMEM
        # limit is 16 MB; the chainfetch kernel's 22.8 MB overflow is the
        # cautionary tale).  Live per-tile temporaries: the winT block
        # [r, ng], the one-hot [ng, bt], rows_t [r, bt], two tap masks
        # [wpad, bt], and the 6 output tiles.  Measured on the v5e at
        # [N=1024, B=3072, (24,36)]: full-band 18.8-19.0 ms vs 19.9 at
        # bt=512 and 20.8 at bt=256 (benchmarks/exp_winfetch.py).
        per_band = 4 * (ng + r + 2 * wpad + 2 * (p_all + 2 * p_spec))
        budget = 10 * 2**20 - 4 * r * ng
        bt = b
        while bt * per_band > budget and bt % 2 == 0:
            bt //= 2
    assert b % bt == 0, (b, bt)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid = (n, b // bt)
    shapes = [p_all, p_all, p_spec, p_spec, p_spec, p_spec]
    outs = pl.pallas_call(
        functools.partial(_kernel, p_all, p_spec, wpad, ng),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, ng), lambda ni, bi: (ni, 0, 0)),
            pl.BlockSpec((1, 4, bt), lambda ni, bi: (ni, 0, bi)),
        ],
        out_specs=[
            pl.BlockSpec((1, pf, bt), lambda ni, bi: (ni, 0, bi))
            for pf in shapes
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, pf, b), jnp.float32) for pf in shapes
        ],
        interpret=interpret,
    )(winT, aux)
    return tuple(outs)
