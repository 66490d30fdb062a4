"""Round-start perf battery: standings + perf-default confirmation.

The TWO-MEASUREMENT RULE (CLAUDE.md, VERDICT r4 weak #6) needs a cheap
way to (re)confirm every standing perf default in one bounded run, so a
default is never flipped — or kept — on a single tunnel session's word.
This battery measures, in ONE process on the real chip:

- standings: the blob-exact serving aggregate over the S x H grid the
  round standings tables track (64/8, 128/8, 128/16, 256/8), BASELINE
  rates 0.5-2.0 (deterministic-step regime);
- regimes: the SAME shapes at rate < 0.5 mixes (tf > 2: MINSTD draws
  active, windowgather fallback cond) and the deployed kiosk operating
  point (blockMs=200, overlap=1.0, rate 0.001 — reference
  app/multi/app.mjs:124-130) — VERDICT r4 weak #1;
- A/Bs at S=128 H=8: BAUKLANK_WINFETCH pallas (default) vs einsum, and
  BAUKLANK_SEQ_COMPSUM 1 (default) vs 0.  Env flips re-trace via a fresh
  jit (all gates are trace-time reads).

Usage:
    PYTHONPATH=.:/root/.axon_site python benchmarks/battery.py [--record]

--record appends one JSON object (all rows + timestamp-free session tag)
to BATTERY_r05.jsonl at the repo root; two appended sessions that agree
satisfy the rule.  Stderr carries the human table; stdout the JSON.
"""

from __future__ import annotations

import functools
import json
import os
import pathlib
import sys
import time

import numpy as np

SR = 44100.0
REPO = pathlib.Path(__file__).resolve().parents[1]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(s, h, block, interval, rates, reps=10, env=None):
    """One blob-exact serving measurement; returns aggregate RTF."""
    import jax
    import jax.numpy as jnp

    from bauklank_tpu.engine.fidelity import (
        SpectralConfig, batched_fidelity_chunk, init_batched_fidelity_state,
    )

    saved = {}
    for k, v in (env or {}).items():
        saved[k] = os.environ.get(k)
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    try:
        cfg = SpectralConfig(channels=2, block=block, interval=interval)
        rng = np.random.default_rng(0)
        audios = jnp.asarray(
            (rng.standard_normal((s, 2, int(6 * SR))) * 0.2).astype(np.float32))
        ends = jnp.asarray(
            600 + block
            + (np.arange(h)[None] * interval * rates[:, None]).round().astype(
                np.int32))
        # blob seek law: tf saturates at `interval` (rate < 1/interval)
        tf = jnp.asarray(
            np.minimum(1.0 / rates, float(interval)).astype(np.float32))
        mult = jnp.asarray(
            np.exp2(np.linspace(-12, 12, s) / 12).astype(np.float32))
        limit = jnp.asarray((8000.0 / SR) / np.sqrt(np.asarray(mult)))
        active = jnp.ones((s,), jnp.float32)
        states = init_batched_fidelity_state(cfg, s)

        # fresh partial -> fresh jit cache entry -> re-trace (env gates
        # are trace-time reads)
        step = jax.jit(functools.partial(batched_fidelity_chunk, cfg))
        fence = jax.jit(lambda o: jnp.sum(jnp.abs(o)))
        t0 = time.time()
        out = step(states, audios, ends, tf, mult, limit, active)
        float(fence(jax.tree.leaves(out)[0]))
        warm = time.time() - t0

        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(states, audios, ends, tf, mult, limit, active)
        float(fence(jax.tree.leaves(out)[0]))
        dt = (time.perf_counter() - t0) / reps
        agg = s * h * interval / SR / dt
        log(f"    warm {warm:.0f}s, {dt * 1e3:.2f} ms/step -> {agg:.1f}x")
        return round(agg, 1)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/bauklank_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    log(f"device={jax.devices()[0]}")

    blk, itv = round(0.12 * SR), round(0.03 * SR)
    kblk = round(0.2 * SR)
    det = lambda s: np.linspace(0.5, 2.0, s).astype(np.float32)
    ext = lambda s: np.geomspace(0.02, 0.45, s).astype(np.float32)

    rows = {}

    log("[standings: rates 0.5-2.0, preset geometry]")
    for s, h in ((64, 8), (128, 8), (128, 16), (256, 8)):
        log(f"  S={s} H={h}")
        rows[f"det_s{s}_h{h}"] = measure(s, h, blk, itv, det(s))

    log("[tf>2 regime: rates 0.02-0.45 (MINSTD active)]")
    for s, h in ((64, 8), (128, 8)):
        log(f"  S={s} H={h}")
        rows[f"tf2_s{s}_h{h}"] = measure(s, h, blk, itv, ext(s))

    log("[kiosk operating point: 200ms/overlap-1, rate 0.001]")
    rows["kiosk_s64_h4"] = measure(
        64, 4, kblk, kblk, np.full(64, 0.001, np.float32), reps=8)

    log("[A/B at S=128 H=8: winfetch default (pallas) vs einsum]")
    rows["ab_winfetch_einsum"] = measure(
        128, 8, blk, itv, det(128), env={"BAUKLANK_WINFETCH": "einsum"})
    log("[A/B at S=128 H=8: compsum default (1) vs 0]")
    rows["ab_compsum_off"] = measure(
        128, 8, blk, itv, det(128), env={"BAUKLANK_SEQ_COMPSUM": "0"})

    base = rows["det_s128_h8"]
    verdicts = {
        "winfetch_pallas_default_ok": base >= rows["ab_winfetch_einsum"],
        "compsum_default_ok": base >= rows["ab_compsum_off"],
    }
    out = {"rows": rows, "verdicts": verdicts,
           "device": str(jax.devices()[0])}
    print(json.dumps(out))
    if "--record" in sys.argv:
        with open(REPO / "BATTERY_r05.jsonl", "a") as f:
            f.write(json.dumps(out) + "\n")
        log("appended BATTERY_r05.jsonl")


if __name__ == "__main__":
    main()
