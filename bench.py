"""Headline benchmark: aggregate real-time factor per chip.

Runs the batched multi-stream serving step (BASELINE config 5 shape: 64
independent stereo 44.1 kHz streams with per-stream rate/pitch state,
preset-default engine config) on the default JAX device and reports

    {"metric": "aggregate_realtime_factor", "value": <RTF>,
     "unit": "x_realtime_per_chip", "vs_baseline": <RTF / 500>}

where RTF = (total output samples/sec across streams) / 44100.  The
reference operates at 1x real time for its deployed single engine on a
Raspberry Pi (BASELINE.md); the driver-set target is >=500x aggregate per
TPU chip, so vs_baseline is reported as the fraction of that 500x target.

Environment notes (tunneled TPU): block_until_ready may return before work
completes until a device->host transfer has occurred, so timing is fenced
with a jitted scalar reduction; first-touch (init + first compile) can take
minutes and is excluded from the timed region.

Logs go to stderr; stdout is exactly one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _probe_devices(timeout_s: float = 600.0):
    """jax.devices() with a watchdog.

    During a tunnel outage jax.devices() hangs indefinitely, which would
    leave the caller with NO output at all; keep the one-JSON-line
    contract with an honest error line instead.  600 s is far above a
    live tunnel's first answer (seconds-to-a-minute measured) — the
    multi-minute costs are first compile/h2d, which happen later.
    """
    import threading

    import jax

    out = {}

    def probe():
        try:
            out["devices"] = jax.devices()
        except Exception as e:  # pragma: no cover - backend specific
            out["error"] = repr(e)

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if "devices" in out:
        return out["devices"]
    err = out.get("error", f"jax.devices() unanswered after {timeout_s:.0f}s "
                           "(tunnel outage?)")
    print(json.dumps({
        "metric": "aggregate_realtime_factor",
        "value": 0.0,
        "unit": "x_realtime_per_chip",
        "vs_baseline": 0.0,
        "error": err,
    }))
    sys.stdout.flush()
    import os
    os._exit(1)  # the probe thread is stuck in native code; don't join it


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: first-touch on the tunneled TPU costs
    # minutes; cache hits cut repeat runs dramatically (no-op if the
    # backend doesn't support it).
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/bauklank_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    devices = _probe_devices()

    from bauklank_tpu.engine.batched import batched_step_jit, init_batched_state
    from bauklank_tpu.engine.config import preset_default
    from bauklank_tpu.engine.offline import frame_ends_for
    from bauklank_tpu.engine.params import StretchParams

    sr = 44100.0
    # 128 concurrent streams is this chip's measured throughput knee
    # (64 -> 1783x, 128 -> 2160x, 256 -> 2113x aggregate); BASELINE config
    # 5 asks for "64+ concurrent independent streams"
    n_streams = 128
    hops = 32
    config = preset_default(channels=2, sample_rate=sr)
    # the serving pool dispatches the formants-off compile of the step when
    # no stream uses formant controls (serve/pool.StreamPool.step; the
    # reference engine gates the same way) — this bench's params are
    # formant-neutral, so measure that path
    from bauklank_tpu.engine.batched import formants_off

    config = formants_off(config)
    log(f"device={devices[0]}  config=block{config.block}/int{config.interval}  streams={n_streams}")

    rng = np.random.default_rng(0)
    t = int(6 * sr)
    audios = jnp.asarray((rng.standard_normal((n_streams, 2, t)) * 0.2).astype(np.float32))
    rates = np.linspace(0.5, 2.0, n_streams)
    params = StretchParams.stack(
        [
            StretchParams.make(rate=r, semitones=s, sample_rate=sr)
            for r, s in zip(rates, np.linspace(-12, 12, n_streams))
        ]
    )
    states = init_batched_state(config, n_streams)
    rms_jit = jax.jit(lambda o: jnp.sqrt(jnp.mean(jnp.square(o))))

    def ends_at(step_idx):
        return jnp.asarray(
            np.stack(
                [frame_ends_for(config, step_idx * hops * config.interval, hops, r) for r in rates]
            ),
            jnp.int32,
        )

    # warmup / compile; scalar materialization fences completion
    t0 = time.perf_counter()
    states, out = batched_step_jit(config, states, audios, ends_at(0), params)
    rms = float(rms_jit(out))
    assert np.isfinite(rms) and rms > 0, rms
    log(f"compiled+warm in {time.perf_counter()-t0:.0f}s, output rms={rms:.4f}")

    n_steps = 8
    ends = [ends_at(i + 1) for i in range(n_steps)]
    t0 = time.perf_counter()
    for i in range(n_steps):
        states, out = batched_step_jit(config, states, audios, ends[i], params)
    float(rms_jit(out))  # fence
    dt = time.perf_counter() - t0

    out_samples = n_steps * n_streams * hops * config.interval
    rtf = out_samples / dt / sr
    log(f"{n_steps} steps in {dt:.3f}s -> {rtf:.1f}x realtime aggregate ({rtf/n_streams:.1f}x per stream)")

    print(
        json.dumps(
            {
                "metric": "aggregate_realtime_factor",
                "value": round(rtf, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtf / 500.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
