"""Peaks-map gather experiments (round 4, after the 520x crossing).

The peaks stage's two blockgather call sites are its dominant cost at the
serving shape (N = S*H = 1024, B = 3072):

1. the RANK lookup — was K=2B int_pos (gather vals[s,2] at i_p and i_q
   separately).  Since i_q == i_p + 1 on every interior band and
   i_q == i_p on every clip edge, ONE K=B general-path gather reading
   both taps of the SAME one-hot replaces it (the window gather's
   shifted-payload trick, bit-identical by construction).  This rig
   times the two forms isolated, in both chunk-body layouts.
2. the BOUNDARY lookup — K=2*slots int_pos over the [N, B, 4]
   compensated cumsum.  Its shape (K ~ B, source B, P=4) was never swept
   separately from the five-family shape; sweep t here.

Also times `_find_peaks_map_batched` end-to-end, old form (HEAD at the
time of the experiment, /tmp/spectral_old.py if present) vs current.

Usage: PYTHONPATH=. python benchmarks/exp_peaksgather.py [S] [H]
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

    from bauklank_tpu.engine import spectral
    from bauklank_tpu.ops.blockgather import block_gather

    s = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = spectral.SpectralConfig(
        channels=2, block=round(0.12 * SR), interval=round(0.03 * SR))
    b_n, fft = cfg.bands, cfg.fft
    t_blk = spectral._peaks_block_t(b_n)
    n = s * h
    slots = -(-((b_n + 1) // 2) // t_blk) * t_blk
    print(f"device={jax.devices()[0]} N={n} B={b_n} slots={slots}",
          file=sys.stderr)
    fence = jax.jit(lambda o: jnp.sum(jnp.abs(jnp.asarray(o, jnp.float32))))
    reps = 8

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

    # realistic monotone rank positions: a step function over bands
    n_pk = rng.integers(40, slots // 2, (n,))
    idx = np.minimum(
        (np.sort(rng.random((n, b_n)), axis=1) * (n_pk[:, None] + 1)).astype(
            np.int32),
        n_pk[:, None])
    cap = np.maximum(n_pk - 1, 0)[:, None]
    i_p = np.clip(idx - 1, 0, cap).astype(np.float32)
    i_q = np.clip(idx, 0, cap).astype(np.float32)
    vals = jnp.asarray(rng.standard_normal((n, slots, 2)).astype(np.float32))
    ranks2 = jnp.asarray(np.concatenate([i_p, i_q], axis=1))
    i_p_j = jnp.asarray(i_p)
    eq = jnp.asarray(i_q == i_p)

    # -- rank lookup: old two-sided vs halved shifted-payload ------------
    old = jax.jit(functools.partial(
        block_gather, t=t_blk, chunk=8, int_pos=True))
    g2, _ = timeit("rank OLD: int_pos K=2B", old, vals, ranks2)
    ref_p = np.asarray(g2[:, :b_n])
    ref_q = np.asarray(g2[:, b_n:])

    def halved(layout):
        @jax.jit
        def f(v, p, e):
            ga, gb, _w0, _w1 = block_gather(
                v, p, t=t_blk, chunk=8, return_taps=True, layout=layout)
            return ga, jnp.where(e[..., None], ga, gb)
        return f

    for layout in ("kmaj", "kmin"):
        (ga, gq), _ = timeit(
            f"rank NEW: K=B both-tap layout={layout}",
            halved(layout), vals, i_p_j, eq)
        same = (np.array_equal(np.asarray(ga), ref_p)
                and np.array_equal(np.asarray(gq), ref_q))
        print(f"{'':56s}   bit-identical: {same}")

    # -- rank lookup: t sweep (t must divide slots) -----------------------
    def halved_t(t, chunk, layout="kmin"):
        @jax.jit
        def f(v, p, e):
            ga, gb, _w0, _w1 = block_gather(
                v, p, t=t, chunk=chunk, return_taps=True, layout=layout)
            return ga, jnp.where(e[..., None], ga, gb)
        return f

    for t in (8, 16, 32):
        for chunk in (8, 16):
            (ga, gq), _ = timeit(
                f"rank NEW: K=B both-tap kmin t={t} chunk={chunk}",
                halved_t(t, chunk), vals, i_p_j, eq)
            same = (np.array_equal(np.asarray(ga), ref_p)
                    and np.array_equal(np.asarray(gq), ref_q))
            print(f"{'':56s}   bit-identical: {same}")

    # -- boundary lookup: t sweep at K=2*slots, P=4, source B ------------
    vals_cs = jnp.asarray(
        np.cumsum(rng.standard_normal((n, b_n, 4)).astype(np.float32), 1))
    posb = jnp.asarray(
        np.sort(rng.integers(0, b_n, (n, 2 * slots))).astype(np.float32))
    refb = None
    for t in (8, 16, 32):
        fn = jax.jit(functools.partial(
            block_gather, t=t, chunk=8, int_pos=True))
        out, _ = timeit(f"boundary: int_pos K=2s P=4 t={t}", fn, vals_cs, posb)
        if refb is None:
            refb = np.asarray(out)
        else:
            print(f"{'':56s}   bit-identical: "
                  f"{np.array_equal(np.asarray(out), refb)}")

    # -- boundary lookup, halved form: K=slots at starts-1 ----------------
    posh = jnp.asarray(
        np.sort(rng.integers(0, b_n, (n, slots))).astype(np.float32))
    refh = None
    for t in (8, 16, 32, 64):
        for chunk in (8, 16):
            fn = jax.jit(functools.partial(
                block_gather, t=t, chunk=chunk, int_pos=True))
            out, _ = timeit(
                f"boundary HALVED: K=s P=4 t={t} chunk={chunk}",
                fn, vals_cs, posh)
            if refh is None:
                refh = np.asarray(out)
            else:
                print(f"{'':56s}   bit-identical: "
                      f"{np.array_equal(np.asarray(out), refh)}")

    # -- remaining components: compensated cumsum + the two MXU counts ----
    w3 = jnp.asarray(rng.standard_normal((n, b_n, 3)).astype(np.float32))
    cs_fn = jax.jit(functools.partial(spectral._comp_cumsum, axis=1))
    timeit("comp cumsum [N, B, 3] pairs", cs_fn, w3)

    c_start = jnp.asarray(
        np.sort(rng.integers(0, slots, (n, b_n))).astype(np.int32))
    t_sl = next((t for t in (64, 32, 16, 8) if slots % t == 0), t_blk)
    cnt1 = jax.jit(functools.partial(
        spectral._count_leq_blocked, out_len=slots, t=t_sl))
    timeit(f"count_leq src=B out=slots t={t_sl}", cnt1, c_start)

    u = jnp.asarray(np.sort(rng.integers(0, b_n, (n, slots))).astype(np.int32))
    t_cnt = next((t for t in (64, 32, 16, 8) if b_n % t == 0), t_blk)
    cnt2 = jax.jit(functools.partial(
        spectral._count_leq_blocked, out_len=b_n, t=t_cnt))
    timeit(f"count_leq src=slots out=B t={t_cnt}", cnt2, u)

    # -- end-to-end peaks map: old module (if saved) vs current ----------
    energy = jnp.asarray(
        np.abs(rng.standard_normal((n, b_n))).astype(np.float32))
    sm = jnp.asarray(
        np.abs(rng.standard_normal((n, b_n))).astype(np.float32) * 0.8)
    mult = jnp.asarray(np.exp2(rng.uniform(-1, 1, n)).astype(np.float32))
    limit = jnp.asarray(
        ((8000.0 / SR) / np.sqrt(np.asarray(mult))).astype(np.float32))

    new_fn = jax.jit(functools.partial(
        spectral._find_peaks_map_batched,
        bands=b_n, fft=fft, t_blk=t_blk))
    o_new, _ = timeit("_find_peaks_map_batched CURRENT", new_fn,
                      energy, sm, mult, limit)
    try:
        import importlib.util
        sp = importlib.util.spec_from_file_location(
            "spectral_old", "/tmp/spectral_old.py")
        old_mod = importlib.util.module_from_spec(sp)
        sp.loader.exec_module(old_mod)
        old_fn = jax.jit(functops := functools.partial(
            old_mod._find_peaks_map_batched,
            bands=b_n, fft=fft, t_blk=t_blk))
        o_old, _ = timeit("_find_peaks_map_batched OLD", old_fn,
                          energy, sm, mult, limit)
        same = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(o_old, o_new))
        print(f"{'':56s}   bit-identical: {same}")
    except FileNotFoundError:
        print("(no /tmp/spectral_old.py — skipping old end-to-end)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
