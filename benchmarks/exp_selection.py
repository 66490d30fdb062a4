"""What bounds the one-hot selection matmul? (r4, toward the 500x row)

The five-family gather is 14.4 ms of the 29 ms hoisted pipeline at
S=64 H=8 (benchmarks/profile_hoisted.py).  Two competing explanations:

- mask HBM traffic: the [c, K, nblk] f32 one-hot is ~12 GB/call at
  t=8 (chunked, but every byte still crosses HBM);
- MXU passes: HIGHEST f32 runs 6 bf16 passes over 2*K*B*P MACs/example
  (~386 GFLOP/call single-pass equivalent).

This times the stage-1 einsum shape in isolation across precisions and
mask dtypes; the scaling pattern identifies the binding resource and
bounds what a Pallas kernel with in-VMEM mask generation could win.

Usage: PYTHONPATH=. python benchmarks/exp_selection.py
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/bauklank_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # serving five-family shape at t=8: N=512 examples, K=5*3072,
    # nblk=384, row width 2t*P = 16*4
    n, k, b, t, p, chunk = 512, 5 * 3072, 3072, 8, 4, 8
    nblk, row = b // t, 2 * t * p
    print(f"device={jax.devices()[0]} N={n} K={k} nblk={nblk} row={row}",
          file=sys.stderr)
    reps = 10

    rng = np.random.default_rng(0)
    blk = jnp.asarray(rng.integers(0, nblk, (n, k)).astype(np.int32))
    arr = jnp.asarray(rng.standard_normal((n, nblk, row)).astype(np.float32))

    def timeit(name, fn, *args):
        def scalarized(*a):
            return jnp.sum(jnp.abs(fn(*a)))
        sfn = jax.jit(scalarized)
        float(sfn(*args))
        t0 = time.perf_counter()
        for _ in range(reps - 1):
            sfn(*args)
        float(sfn(*args))
        dt = (time.perf_counter() - t0) / reps * 1e3
        gb = n * k * nblk * 4 / 1e9
        fl = 2 * n * k * nblk * row / 1e12
        print(f"{name:44s} {dt:9.2f} ms   (mask {gb:5.1f} GB -> "
              f"{gb/dt*1e3:6.0f} GB/s | {fl:5.2f} TFLOP 1-pass -> "
              f"{fl/dt*1e3:6.1f} TFLOP/s)")
        return dt

    def sel(blk_v, arr_v, mdt, prec):
        def one(args):
            bc, ao = args
            oh = (bc[..., None] == jnp.arange(nblk)).astype(mdt)
            if mdt == jnp.float32 and prec is not None:
                return jnp.einsum("ckj,cjr->ckr", oh, ao, precision=prec)
            return jnp.einsum("ckj,cjr->ckr", oh, ao,
                              preferred_element_type=jnp.float32)
        sh = (n // chunk, chunk)
        return jax.lax.map(
            one, (blk_v.reshape(sh + (k,)), arr_v.reshape(sh + (nblk, row)))
        ).reshape(n, k, row)

    timeit("f32 mask, HIGHEST (6 passes)", functools.partial(
        sel, mdt=jnp.float32, prec=jax.lax.Precision.HIGHEST), blk, arr)
    timeit("f32 mask, DEFAULT (1 bf16 pass, diag only)", functools.partial(
        sel, mdt=jnp.float32, prec=jax.lax.Precision.DEFAULT), blk, arr)
    timeit("bf16 mask, f32 payload (promotes)", functools.partial(
        sel, mdt=jnp.bfloat16, prec=None), blk, arr)

    def sel_bf16x3(blk_v, arr_v):
        def one(args):
            bc, ao = args
            oh = (bc[..., None] == jnp.arange(nblk)).astype(jnp.bfloat16)
            h1 = ao.astype(jnp.bfloat16)
            r1 = ao - h1.astype(jnp.float32)
            h2 = r1.astype(jnp.bfloat16)
            h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
            parts = [
                jnp.einsum("ckj,cjr->ckr", oh, hh,
                           preferred_element_type=jnp.float32)
                for hh in (h1, h2, h3)
            ]
            return (parts[0] + parts[1]) + parts[2]
        sh = (n // chunk, chunk)
        return jax.lax.map(
            one, (blk_v.reshape(sh + (k,)), arr_v.reshape(sh + (nblk, row)))
        ).reshape(n, k, row)

    timeit("bf16 mask, bf16x3 payload (3 passes)", sel_bf16x3, blk, arr)

    # chunk sweep at HIGHEST — does a bigger chunk amortize better?
    for c in (16, 32):
        def sel_c(blk_v, arr_v, c=c):
            def one(args):
                bc, ao = args
                oh = (bc[..., None] == jnp.arange(nblk)).astype(jnp.float32)
                return jnp.einsum("ckj,cjr->ckr", oh, ao,
                                  precision=jax.lax.Precision.HIGHEST)
            sh = (n // c, c)
            return jax.lax.map(
                one, (blk_v.reshape(sh + (k,)),
                      arr_v.reshape(sh + (nblk, row)))
            ).reshape(n, k, row)
        timeit(f"f32 HIGHEST, chunk={c}", sel_c, blk, arr)


if __name__ == "__main__":
    main()
