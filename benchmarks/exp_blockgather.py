"""block_gather variant shootout at the fidelity serving shape (round 4).

The five-family gather is the largest chain-input stage left after the
peaks-map refactor (6.2 ms/hop at S=64 on the v5e, docs/STATUS-r3.md §1).
Its stage-1 one-hot einsum runs f32 HIGHEST (6 bf16 MXU passes) with a
48-deep contraction (t=64 -> nblk=48, padded to 128 on the MXU: 2.7x
waste).  Candidates timed here, all on the real five-family shape
[N=S*H, B, P=4] with K=5B positions:

- t sweep: t=24 gives nblk=128 (a full MXU contraction tile) and a
  48-wide tap stage instead of 128;
- precision: HIGHEST (exact) vs manual bf16x3 split (3 DEFAULT passes;
  exact reconstruction except |x| < ~2^-100, where the 3rd residual
  underflows bf16) vs int8x4 bit-plane split (4 int8 passes selecting the
  raw bit pattern, exact for EVERY value incl. denormals/inf/nan);
- chunk sweep at the winner.

Each variant is checked against the reference output before timing —
mismatching variants are reported and timed anyway (for the record).

Usage: PYTHONPATH=. python benchmarks/exp_blockgather.py [S] [H]
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

    from bauklank_tpu.engine.spectral import SpectralConfig
    from bauklank_tpu.ops import blockgather

    s = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = SpectralConfig(channels=2, block=round(0.12 * SR),
                         interval=round(0.03 * SR))
    b_n = cfg.bands
    n = s * h
    k = 5 * b_n
    p = 4
    print(f"device={jax.devices()[0]} N={n} B={b_n} K={k} P={p}",
          file=sys.stderr)
    fence = jax.jit(lambda o: jnp.sum(jnp.abs(jnp.asarray(o, jnp.float32))))
    reps = 6

    def timeit(name, fn, *args):
        out = fn(*args)
        float(fence(jax.tree.leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(fence(jax.tree.leaves(out)[0]))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:52s} {dt:9.2f} ms  ({dt/h:6.2f} /hop)")
        return out, dt

    rng = np.random.default_rng(0)
    arrs = jnp.asarray(rng.standard_normal((n, b_n, p)).astype(np.float32))
    # kiosk-regime positions: base band plus +-2*tf random vertical steps
    base = np.tile(np.arange(b_n, dtype=np.float32), 5)
    pos = jnp.asarray(
        (base[None] + rng.uniform(-2000, 2000, (n, k))).astype(np.float32))

    ref = None
    for t_blk in (64, 32, 24, 16):
        if b_n % t_blk:
            continue
        fn = jax.jit(functools.partial(blockgather.block_gather, t=t_blk))
        out, _ = timeit(f"HIGHEST t={t_blk} chunk=16", fn, arrs, pos)
        if ref is None:
            ref = np.asarray(out)
        else:
            same = np.array_equal(np.asarray(out), ref)
            print(f"{'':52s}   bit-identical vs t=64: {same}")

    for name, mode in (("bf16x3", "bf16x3"), ("int8x4", "int8x4")):
        for t_blk in (64, 32, 24):
            if b_n % t_blk:
                continue
            fn = jax.jit(functools.partial(
                blockgather.block_gather, t=t_blk, mode=mode))
            out, _ = timeit(f"{name} t={t_blk} chunk=16", fn, arrs, pos)
            same = np.array_equal(np.asarray(out), ref)
            print(f"{'':52s}   bit-identical: {same}")

    # chunk sweep at a promising config
    for ch in (8, 32, 64):
        fn = jax.jit(functools.partial(
            blockgather.block_gather, t=24, mode="int8x4", chunk=ch))
        out, _ = timeit(f"int8x4 t=24 chunk={ch}", fn, arrs, pos)
        same = np.array_equal(np.asarray(out), ref)
        print(f"{'':52s}   bit-identical: {same}")

    # K-minor chunk-body layout (windowgather einsum_bm idea) at the
    # production t=8/chunk=8 point, vs the K-major default
    ref8 = None
    for layout in ("kmaj", "kmin"):
        fn = jax.jit(functools.partial(
            blockgather.block_gather, t=8, chunk=8, layout=layout))
        out, _ = timeit(f"HIGHEST t=8 chunk=8 layout={layout}", fn, arrs, pos)
        if ref8 is None:
            ref8 = np.asarray(out)
        else:
            same = np.array_equal(np.asarray(out), ref8)
            print(f"{'':52s}   bit-identical: {same}")

    # the peaks-map rank-lookup shape: int_pos, K=2B, P=2
    vals = jnp.asarray(rng.standard_normal((n, b_n, 2)).astype(np.float32))
    ranks = jnp.asarray(
        rng.integers(0, b_n, (n, 2 * b_n)).astype(np.float32))
    refp = None
    for layout in ("kmaj", "kmin"):
        fn = jax.jit(functools.partial(
            blockgather.block_gather, t=8, chunk=8, int_pos=True,
            layout=layout))
        out, _ = timeit(f"int_pos t=8 chunk=8 layout={layout}", fn, vals, ranks)
        if refp is None:
            refp = np.asarray(out)
        else:
            same = np.array_equal(np.asarray(out), refp)
            print(f"{'':52s}   bit-identical: {same}")


if __name__ == "__main__":
    main()
