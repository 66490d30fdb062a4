"""Fused matmul-MDFT vs the jnp.fft composite (VERDICT-r2 item 4 rig).

Round-2 measured the bare matmul FFT at the bench shape [8192, 2688] as
9.4-10.4 ms vs jnp.fft's 9.07 — the FFT alone is at its floor.  But the
engine never runs the FFT alone: the MDFT composite adds premodulate +
conjugate-symmetric unpack + center-phase passes (forward) and unpack +
postmodulate + synthesis-window passes (inverse), each a full read+write
of the [rows, M] complex64 working set.  ops/mdft.mdft_fused/imdft_fused
fold every one of those diagonals into the Cooley-Tukey stage constants.
This rig times both composites at the headline serving shapes and several
precisions, device-only, fenced (CLAUDE.md: block_until_ready unreliable).

Usage: PYTHONPATH=. python benchmarks/exp_mdft_fusion.py [rows] [block]
"""

from __future__ import annotations

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

    from bauklank_tpu.engine.core import _center_phase
    from bauklank_tpu.ops import mdft as M

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 5376
    m = block // 2
    reps = 30
    print(
        f"device={jax.devices()[0]} rows={rows} block={block} M={m} "
        f"ct={M._ct_factors(m)}", file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((rows, block)).astype(np.float32))
    ws = jnp.asarray(rng.standard_normal(block).astype(np.float32))

    fence = jax.jit(lambda o: jnp.sum(jnp.abs(o)))

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        float(fence(out))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        float(fence(out))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"  {name:42s} {dt:8.2f} ms", file=sys.stderr)
        return dt, out

    print("forward (windowed frames -> centered spectra):", file=sys.stderr)
    _, ref = timeit("jnp.fft mdft * center_phase", lambda a: M.mdft(a) * _center_phase(m), x)
    hp = jax.lax.Precision.HIGHEST
    precs = (
        (hp, "HIGHEST"),
        (jax.lax.Precision.HIGH, "HIGH"),
        (jax.lax.Precision.DEFAULT, "DEFAULT"),
    )
    for prec, tag in precs:
        _, got = timeit(
            f"mdft_fused[{tag}]",
            lambda a, p=prec: M.mdft_fused(a, center_phase=True, precision=p), x)
        num = float(jnp.sum(jnp.abs(got - ref) ** 2))
        den = float(jnp.sum(jnp.abs(ref) ** 2))
        print(f"    vs ref: {10*np.log10(den/max(num,1e-30)):.1f} dB", file=sys.stderr)

    spec = ref
    print("inverse (centered spectra -> windowed frames):", file=sys.stderr)
    _, iref = timeit(
        "imdft(spec*conj(c)) * ws",
        lambda s: M.imdft(s * jnp.conj(_center_phase(m)), block) * ws, spec)
    for prec, tag in precs:
        _, igot = timeit(
            f"imdft_fused[{tag}]",
            lambda s, p=prec: M.imdft_fused(
                s, block, window=ws, center_phase_conj=True, precision=p), spec)
        num = float(jnp.sum(jnp.abs(igot - iref) ** 2))
        den = float(jnp.sum(jnp.abs(iref) ** 2))
        print(f"    vs ref: {10*np.log10(den/max(num,1e-30)):.1f} dB", file=sys.stderr)


if __name__ == "__main__":
    main()
