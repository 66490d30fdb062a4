"""Golden SNR of the SERVING fidelity path on the CURRENT backend.

The CPU suite pins `batched_fidelity_chunk` >= 40 dB vs real blob renders
(tests/test_golden_wasm.py), but on CPU the sequential band chain runs the
vmapped lax.scan and the chain gathers take the XLA block-matmul path.  On
TPU the same step routes through the Mosaic kernels (ops/pallas/bandchain,
windowgather wintaps, compsum) — this script re-runs the golden cases on
whatever backend is active so the real-chip lowerings get the same
>= 40 dB gate.  The r4 lesson makes this mandatory for any accumulation-
order change: associative_scan builds different combination trees on TPU,
so "bit-identical on CPU" does NOT imply in-margin on the chip.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/check_tpu_golden.py
        [case ...] [--all] [--record]

- default: the three-case smoke set; case names on argv select cases
  (e.g. r0001_st0, the 4.8 dB-margin extreme-stretch case);
- --all: the FULL committed matrix — every file case incl. the kiosk
  overlap-1 geometry and splitComputation=false, plus every coupled
  (live-input) case (VERDICT r4 item 5b);
- --record: write the per-case results to GOLDEN_TPU.json at the repo
  root (the committed per-round artifact; bench.py embeds its min margin
  in the headline line).

Prints one line per case; exits non-zero if any case is < 40 dB.
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))
FIXTURES = (
    pathlib.Path(__file__).resolve().parents[1]
    / "tests" / "golden" / "golden_v1.npz"
)
ARTIFACT = pathlib.Path(__file__).resolve().parents[1] / "GOLDEN_TPU.json"


def _run_file_case(golden, name, rate, semitones, channels, extras):
    import jax
    import jax.numpy as jnp

    from golden_wasm import material

    from bauklank_tpu.engine.fidelity import (
        batched_fidelity_chunk, hop_frame_ends,
    )
    from bauklank_tpu.engine.spectral import SpectralConfig, init_spectral_state

    sr = material.SR
    ex = material.renderer_extras(extras)
    kw_geom = material.case_render_kwargs(extras)
    block = round(kw_geom["block_ms"] / 1000 * sr)
    interval = round(kw_geom["interval_ms"] / 1000 * sr)
    split = bool(ex.get("split_computation", True))
    use_formants = bool(
        ex.get("formant_semitones") or ex.get("formant_compensation"))
    cfg = SpectralConfig(channels=channels, block=block,
                         interval=interval, formants=use_formants,
                         split=split)
    n_out = int(material.SECONDS * sr)
    hop_chunk = 8
    n_hops = -(-n_out // interval)
    n_hops = -(-n_hops // hop_chunk) * hop_chunk
    ends = hop_frame_ends(cfg, n_hops, rate, sr, split=split)

    key = name + "__seed"
    seed = int(golden[key]) if key in golden.files else 1
    # state builders must run under jit on the axon backend (complex64
    # cannot cross host->device)
    one = lambda x: jnp.broadcast_to(
        jnp.asarray(x), (1,) + jnp.asarray(x).shape)

    @jax.jit
    def init():
        return jax.tree.map(one, (
            init_spectral_state(cfg, seed=seed),
            jnp.zeros((channels, block + interval), jnp.float32),
        ))

    state = init()
    x = material.case_input(rate, channels)
    audios = jnp.asarray(x)[None]
    mult = float(np.exp2(semitones / 12.0))
    # blob seek law: tf saturates at `interval` (rate < 1/interval)
    tf = jnp.asarray([min(1.0 / rate, float(interval))], jnp.float32)
    mult_a = jnp.asarray([mult], jnp.float32)
    limit = jnp.asarray(
        [(material.TONALITY_HZ / sr) / np.sqrt(mult)], jnp.float32)
    active = jnp.ones((1,), jnp.float32)
    kw = {}
    if use_formants:
        kw = dict(
            formant_factor=jnp.asarray(
                [np.exp2(ex.get("formant_semitones", 0.0) / 12.0)],
                jnp.float32),
            formant_compensation=jnp.asarray(
                [1.0 if ex.get("formant_compensation") else 0.0],
                jnp.float32),
            formant_base=jnp.asarray(
                [ex.get("formant_base_hz", 0.0) / sr], jnp.float32),
        )

    step = jax.jit(functools.partial(batched_fidelity_chunk, cfg))
    emitted = []
    for c in range(n_hops // hop_chunk):
        e = jnp.asarray(ends[c * hop_chunk:(c + 1) * hop_chunk])[None]
        state, emit = step(state, audios, e, tf, mult_a, limit,
                           active, **kw)
        emitted.append(np.asarray(emit[0]))
    got = np.concatenate(emitted, axis=-1)[..., :n_out]

    end = int(extras.get("_compare_sec", material.SECONDS) * sr)
    return material.snr_db(golden[name][..., :end], got[..., :end],
                           material.case_skip(extras))


def _run_live_case(golden, name, semitones, channels, extras):
    import jax
    import jax.numpy as jnp

    from golden_wasm import material

    from bauklank_tpu.engine.fidelity import (
        batched_live_fidelity_chunk, init_batched_live_fidelity_state,
    )
    from bauklank_tpu.engine.spectral import SpectralConfig

    sr = material.SR
    ex = material.renderer_extras(extras)
    kw_geom = material.case_render_kwargs(extras)
    block = round(kw_geom["block_ms"] / 1000 * sr)
    interval = round(kw_geom["interval_ms"] / 1000 * sr)
    use_formants = bool(
        ex.get("formant_semitones") or ex.get("formant_compensation"))
    cfg = SpectralConfig(channels=channels, block=block, interval=interval,
                         formants=use_formants,
                         split=bool(ex.get("split_computation", True)))
    n_out = int(material.SECONDS * sr)
    x = material.case_input(1.0, channels)[:, :n_out]
    hop_chunk = 8
    state = init_batched_live_fidelity_state(cfg, hop_chunk, 1)
    mult = float(np.exp2(semitones / 12.0))
    mult_a = jnp.asarray([mult], jnp.float32)
    limit = jnp.asarray(
        [(material.TONALITY_HZ / sr) / np.sqrt(mult)], jnp.float32)
    active = jnp.ones((1,), jnp.float32)
    kw = {}
    if use_formants:
        kw = dict(
            formant_factor=jnp.asarray(
                [np.exp2(ex.get("formant_semitones", 0.0) / 12.0)],
                jnp.float32),
            formant_compensation=jnp.asarray(
                [1.0 if ex.get("formant_compensation") else 0.0],
                jnp.float32),
            formant_base=jnp.asarray(
                [ex.get("formant_base_hz", 0.0) / sr], jnp.float32),
        )
    step = jax.jit(functools.partial(batched_live_fidelity_chunk, cfg))
    n = hop_chunk * interval
    emitted = []
    for c in range(-(-n_out // n)):
        chunk = np.zeros((1, channels, n), np.float32)
        lo, hi = c * n, min((c + 1) * n, n_out)
        chunk[0, :, : hi - lo] = x[:, lo:hi]
        state, emit = step(state, jnp.asarray(chunk), mult_a, limit,
                           active, **kw)
        emitted.append(np.asarray(emit[0]))
    got = np.concatenate(emitted, axis=-1)[..., :n_out]

    end = int(extras.get("_compare_sec", material.SECONDS) * sr)
    return material.snr_db(golden[name][..., :end], got[..., :end],
                           material.case_skip(extras) + interval)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/bauklank_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from golden_wasm import material

    golden = np.load(FIXTURES)
    device = str(jax.devices()[0])
    print(f"device={device}", file=sys.stderr)

    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    run_all = "--all" in sys.argv
    record = "--record" in sys.argv
    want = set(names) or {"r025_st0", "r05_stp12", "stereo_r07_stp5_f4_comp"}

    results: dict[str, float] = {}
    failed = []

    def run_one(name, fn, *a):
        # CAUTION: a failed TPU call can poison the whole client
        # (CLAUDE.md) — a caught error here means later cases may also
        # fail spuriously; still record everything so the artifact shows
        # exactly where the run broke instead of vanishing.
        try:
            snr = fn(golden, name, *a)
        except Exception as e:  # noqa: BLE001 — record and continue
            results[name] = -999.0  # error sentinel (keeps the JSON strict)
            failed.append(name)
            print(f"{name:32s}   ERROR  {type(e).__name__}: {e}",
                  flush=True)
            return
        results[name] = round(snr, 1)
        status = "ok" if snr > 40.0 else "FAIL"
        print(f"{name:32s} {snr:7.1f} dB  {status}", flush=True)
        if snr <= 40.0:
            failed.append(name)

    for name, rate, semitones, channels, extras in material.CASES:
        if run_all or name in want:
            run_one(name, _run_file_case, rate, semitones, channels, extras)
    for name, semitones, channels, extras in material.LIVE_CASES:
        if run_all or name in want:
            run_one(name, _run_live_case, semitones, channels, extras)

    if record and results:
        ARTIFACT.write_text(json.dumps({
            "device": device,
            "min_db": min(results.values()),
            "n_cases": len(results),
            "cases": results,
            "failed": failed,
        }, indent=1) + "\n")
        print(f"wrote {ARTIFACT}", file=sys.stderr)

    if failed:
        print(f"FAILED: {failed}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
