"""Decompose the fidelity batched-analysis stage on the attached device.

The serving-step profile (benchmarks/profile_fidelity.py) prices the
analyses at ~12-13 ms at N=1024 examples x 2 frame families — the second
largest stage after chain_inputs.  This rig times the full
``_analyse_cur_prev`` and variants with one sub-stage stubbed to locate
the cost: the frame gather (vmapped dynamic_slice), the window+pad, the
MDFT (packed-real jnp.fft), the center-phase rotation, and the final
transposes.

Usage: PYTHONPATH=. python benchmarks/exp_analyses.py [S] [H]
"""

from __future__ import annotations

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

    from bauklank_tpu.engine.fidelity import SpectralConfig, _analyse_cur_prev
    from bauklank_tpu.engine.fidelity import _consts, _unit
    from bauklank_tpu.ops import framing, mdft

    s = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    block = round(0.12 * SR)
    interval = round(0.03 * SR)
    cfg = SpectralConfig(channels=2, block=block, interval=interval)
    print(f"device={jax.devices()[0]} S={s} H={h} block={block} "
          f"fft={cfg.fft}", file=sys.stderr)
    rng = np.random.default_rng(0)
    audios = jnp.asarray(
        (rng.standard_normal((s, 2, int(6 * SR))) * 0.2).astype(np.float32))
    rates = np.linspace(0.5, 2.0, s).astype(np.float32)
    ends = jnp.asarray(
        600 + block
        + (np.arange(h)[None] * interval * rates[:, None]).round().astype(
            np.int32))

    reps = 10

    def timeit(name, fn, *args):
        def scalarized(*a):
            out = fn(*a)
            return sum(
                jnp.sum(jnp.abs(jnp.real(x))) for x in jax.tree.leaves(out))
        sfn = jax.jit(scalarized)
        float(sfn(*args))
        t0 = time.perf_counter()
        for _ in range(reps - 1):
            sfn(*args)
        float(sfn(*args))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:44s} {dt:9.2f} ms")
        return dt

    timeit("full _analyse_cur_prev", lambda au, en: _analyse_cur_prev(
        cfg, au, en), audios, ends)

    w, rot = _consts(cfg.block, cfg.interval, cfg.fft)
    w_j = jnp.asarray(np.asarray(w))

    def staged(au, en, stub_gather=False, stub_fft=False, stub_rot=False,
               stub_tr=False):
        both = jnp.concatenate([en, en - cfg.interval], axis=1)   # [S, 2H]
        starts = both.astype(jnp.int32) - cfg.block

        def one(audio, st):
            if stub_gather:
                frames = jnp.broadcast_to(
                    audio[:, None, : cfg.block], (2, st.shape[0], cfg.block))
            else:
                frames = framing.gather_frames(audio, st, cfg.block)
            windowed = frames * w_j
            padded = jnp.pad(
                windowed, ((0, 0), (0, 0), (0, cfg.fft - cfg.block)))
            if stub_fft:
                spec = (padded[..., : cfg.bands]
                        + 1j * padded[..., cfg.bands: 2 * cfg.bands])
            else:
                spec = mdft.mdft(padded)
            if not stub_rot:
                spec = spec * _unit(rot)
            if stub_tr:
                return spec
            return spec.transpose(1, 0, 2)

        specs = jax.vmap(one)(au, starts)
        if stub_tr:
            return specs
        hh = en.shape[1]
        cur = jnp.moveaxis(specs[:, :hh], 1, 0)
        prev = jnp.moveaxis(specs[:, hh:], 1, 0)
        return cur, prev

    import functools
    full = timeit("staged (re-assembled)", staged, audios, ends)
    for name in ("gather", "fft", "rot", "tr"):
        fn = functools.partial(staged, **{f"stub_{name}": True})
        dt = timeit(f"  - {name} stubbed", fn, audios, ends)
        print(f"{'':44s} -> {name} marginal {full - dt:7.2f} ms",
              file=sys.stderr)


if __name__ == "__main__":
    main()
