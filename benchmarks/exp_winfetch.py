"""Decompose + sweep the shared-window gather (ops/windowgather) on TPU.

The r4 det-regime profile (benchmarks/profile_hoisted.py 128 8 det) puts
the fused window gather at ~36 ms of the 55.7 ms chain-inputs pipeline at
S=128 H=8 — the dominant remaining fidelity-serving stage.  Estimated
composition: ~12 ms of HIGHEST selection MACs (2*B^2*P per example at 6
bf16 passes), mask generation, tap masked-sums, all serialized over
N/chunk lax.map iterations.  This rig times, at the serving shape
[N=1024, B=3072, P=10]:

1. fetch mode x chunk sweep (einsum vs take_along_axis rows; chunk
   8/16/32/64 — bigger chunks batch the einsum across more examples per
   map iteration at the cost of larger HBM transients);
2. selection-precision ladder (HIGHEST/HIGH/DEFAULT) — timing bounds on
   the einsum share, plus an on-device BIT-IDENTITY check of HIGH vs
   HIGHEST for one-hot copies (0/1 rows are exact in bf16; if XLA's
   3-pass split covers onehot_hi * (w1+w2+w3) the copy is exact for
   |x| >= ~2^-100, same caveat as blockgather's bf16x3 mode);
3. stage stubs in the fused call: mask-gen-only / einsum-only /
   taps-only marginals.

Usage: PYTHONPATH=. python benchmarks/exp_winfetch.py [N]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

SR = 44100.0


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/bauklank_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import bauklank_tpu.ops.windowgather as wg

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    b, c_n = 3072, 2
    long_step, t1 = 5, wg.window_t1(3072, 5)
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]} N={n} B={b} t1={t1}", file=sys.stderr)

    spec = jnp.asarray(rng.standard_normal((n, b, 2 * c_n)).astype(np.float32))
    prev = jnp.asarray(rng.standard_normal((n, b, 2 * c_n)).astype(np.float32))
    en = jnp.asarray(
        np.abs(rng.standard_normal((n, b, c_n))).astype(np.float32))
    # monotone fractional positions with segment jumps (peaks-map shaped)
    base = np.sort(rng.uniform(0, b - 1, (n, b))).astype(np.float32)
    ib = jnp.asarray(base)
    c = np.asarray(
        np.exp2(rng.uniform(-1, 1, n)).clip(0.5, 2.0).astype(np.float32))
    cc = c[:, None]
    us = np.concatenate([base[:, 1:], np.zeros((n, 1), np.float32)], 1) - cc
    ul = np.concatenate(
        [base[:, long_step:], np.zeros((n, long_step), np.float32)], 1
    ) - cc * long_step
    pos5 = jnp.asarray(np.concatenate(
        [base, base - cc, base - cc * long_step, us, ul], 1))
    step = jnp.asarray(c)

    reps = 10

    def timeit(name, fn, *args):
        def scalarized(*a):
            out = fn(*a)
            return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(out))
        sfn = jax.jit(scalarized)
        float(sfn(*args))
        t0 = time.perf_counter()
        for _ in range(reps - 1):
            sfn(*args)
        float(sfn(*args))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:46s} {dt:9.2f} ms")
        return dt

    args = (spec, prev, en, ib, pos5, step)

    print("--- geometry (g, w) x chunk sweep (einsum fetch) ---")
    for geom in ((16, 32), (8, 24), (8, 32), (4, 24), (24, 40), (8, 20)):
        for chunk in (8, 16):
            fn = functools.partial(
                wg.window_gather_taps, long_step=long_step, t1=t1,
                chunk=chunk, geom=geom)
            timeit(f"geom={geom} chunk={chunk}", fn, *args)

    print("--- fused Pallas selection+taps (ops/pallas/wintaps) ---")
    # the kernel's tap stage is lane-dense, so the selection-MAC-optimal
    # coarse stride should win: MACs ~ (B/g)(g+2L+2), minimized near
    # g=32 with K=ng=96 (75% MXU K-fill) — vs the XLA form pinned at
    # (8, 20) by its lane-sparse [c, B, w] tap masks
    # (24, 36): ng = 128 = exact MXU contraction depth (no K pad waste),
    # M = 400 sublanes — predicted optimum: eff MACs M*Kpad*N are
    # 26.2M/step vs 31.5M at (32, 44) and 47M at (8, 24)
    for geom in ((24, 36), (32, 44), (16, 32), (12, 24), (8, 24),
                 (48, 60), (64, 76)):
        fn = functools.partial(
            wg.window_gather_taps, long_step=long_step, t1=t1,
            geom=geom, fetch="pallas")
        timeit(f"pallas geom={geom}", fn, *args)

    print("--- explicit-m1 masks (einsum_m1): one fused rows pass? ---")
    for geom in ((8, 20), (8, 24), (16, 32)):
        for chunk in (8, 16):
            fn = functools.partial(
                wg.window_gather_taps, long_step=long_step, t1=t1,
                chunk=chunk, geom=geom, fetch="einsum_m1")
            timeit(f"m1 geom={geom} chunk={chunk}", fn, *args)

    print("--- band-minor layout (einsum_bm) geometry sweep ---")
    # with the tap masked-sums lane-dense the VPU cost stops scaling in w,
    # so larger g (fewer selection MACs, ~ w/g) should now pay
    for geom in ((8, 20), (16, 32), (24, 36), (32, 44), (48, 60), (64, 76),
                 (96, 108)):
        for chunk in (8, 16):
            fn = functools.partial(
                wg.window_gather_taps, long_step=long_step, t1=t1,
                chunk=chunk, geom=geom, fetch="einsum_bm")
            timeit(f"bm geom={geom} chunk={chunk}", fn, *args)

    print("--- two-level strip selection (einsum2) geom2 sweep ---")
    # verify the spread guard lands on the two-level branch for these
    # positions (the measurement is meaningless on the fallback branch)
    anchor = np.clip(
        np.floor(base - long_step * cc).astype(np.int64), 0, b - 1)
    for geom2 in ((32, 16), (16, 16), (64, 24), (32, 12)):
        g2, nstrip = geom2
        anc_b = anchor.reshape(n, b // g2, g2)
        fbrel_max = int((anc_b // 8 - anc_b.min(2, keepdims=True) // 8).max())
        two = fbrel_max <= nstrip - 3
        for chunk in (8, 16):
            fn = functools.partial(
                wg.window_gather_taps, long_step=long_step, t1=t1,
                chunk=chunk, fetch="einsum2", geom2=geom2)
            timeit(
                f"e2 geom2={geom2} chunk={chunk} "
                f"[{'two-level' if two else 'FALLBACK'}]", fn, *args)

    print("--- selection precision ladder (einsum, chunk=8) ---")
    for prec in ("HIGHEST", "HIGH", "DEFAULT"):
        fn = functools.partial(
            wg.window_gather_taps, long_step=long_step, t1=t1, chunk=8,
            precision=getattr(jax.lax.Precision, prec))
        timeit(f"precision={prec}", fn, *args)

    # bit-identity of HIGH vs HIGHEST for the one-hot copy, on device
    sel = jnp.asarray(
        rng.integers(0, 192, (8, 3072)).astype(np.int32))
    win = jnp.asarray(rng.standard_normal((8, 192, 320)).astype(np.float32))

    def rows_at(prec):
        jj = jnp.arange(192, dtype=jnp.int32)
        oh = (sel[..., None] == jj).astype(jnp.float32)
        return jnp.einsum("cbj,cjr->cbr", oh, win, precision=prec)

    hi_rows = jax.jit(lambda: rows_at(jax.lax.Precision.HIGHEST))()
    h_rows = jax.jit(lambda: rows_at(jax.lax.Precision.HIGH))()
    d_rows = jax.jit(lambda: rows_at(jax.lax.Precision.DEFAULT))()
    ref = np.take_along_axis(
        np.asarray(win), np.asarray(sel)[:, :, None] % 192, axis=1)
    print(f"HIGHEST copy exact: {np.array_equal(np.asarray(hi_rows), ref)}")
    print(f"HIGH    copy exact: {np.array_equal(np.asarray(h_rows), ref)}")
    print(f"DEFAULT copy exact: {np.array_equal(np.asarray(d_rows), ref)}")

    print("--- stage stubs (einsum fetch, chunk=8) ---")
    # taps-only: feed precomputed rows through the tap stage by patching
    # the fetch to a static slice (drops mask gen + einsum)
    def taps_only(spec_p, prev_p, en_p, ib_p, pos5_p, step_p):
        return wg.window_gather_taps(
            spec_p, prev_p, en_p, ib_p, pos5_p, step_p,
            long_step=long_step, t1=t1, chunk=8, fetch="stub_rows")
    timeit("rows stubbed (taps+shift only)", taps_only, *args)


if __name__ == "__main__":
    main()
