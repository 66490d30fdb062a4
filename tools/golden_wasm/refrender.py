"""Full-loop renderer over the hop-exact spectral model (pymodel.py).

Replicates the worklet drive (reference app/SignalsmithStretch.mjs:826-954)
plus the blob's framing/OLA around ``SpectralModel.hop``, entirely in
numpy, for the reference's deployed mode splitComputation=true (the multi
app default, app/multi/app.mjs:124-130).  Measured drive semantics (all
verified float32-exact against the blob):

- hop ``h`` fires at output-counter sample ``o = h*interval``; its analyses
  read the input-ring snapshot taken at hop start, i.e. the ring as primed
  by the ``_seek`` of the 128-frame quantum containing ``o``;
- with split on, ``bufferLength = inputLatency + outputLatency =
  block + interval`` equals the ring size, so every seek overwrites the
  whole ring and ring contents == zero-padded track (with split OFF the
  seek is one interval short and the ring keeps a stale prefix — a blob
  quirk we deliberately do not reproduce; golden renders use split on);
- the synthesized frame lands at emitted samples ``[o + interval,
  o + interval + block)`` — the documented one-extra-interval latency of
  splitComputation (reference README-signalsmith.md:1-31).

This is the *oracle-level* proof that the reverse-engineered algorithm
(docs/WASM-ALGO.md) reproduces the reference renderer end to end; the JAX
fidelity engine is then verified against this model (fast, no gcc needed)
and against blob-rendered golden fixtures.
"""

from __future__ import annotations

import numpy as np

from golden_wasm.pymodel import (
    ModelConfig,
    SpectralModel,
    analyse,
    blob_window,
    fft_size_for,
    synthesise,
)

QUANTUM = 128  # browser render quantum (reference :820-826)


def render_model(
    audio: np.ndarray,
    sample_rate: float,
    n_out: int,
    rate: float = 1.0,
    semitones: float = 0.0,
    tonality_hz: float = 8000.0,
    block_ms: float = 120.0,
    interval_ms: float = 30.0,
    seed: int | None = None,
    formant_semitones: float = 0.0,
    formant_compensation: bool = False,
    formant_base_hz: float = 0.0,
) -> np.ndarray:
    """Render ``n_out`` frames like native.render_reference (split on).

    audio: [C, N] float32.  Returns [C, n_out] float64.
    ``seed``: MINSTD state for the rate < 0.5 random vertical steps (read
    from the live engine via native.render_reference's ``seed_out``).
    """
    audio = np.asarray(audio, np.float64)
    channels = audio.shape[0]
    sr = float(sample_rate)
    block = round(block_ms / 1000 * sr)
    interval = round(interval_ms / 1000 * sr)
    fft = fft_size_for(block)
    cfg = ModelConfig(channels=channels, block=block, interval=interval)
    w = blob_window(block, interval)
    in_lat = block // 2
    out_lat = (block - in_lat) + interval  # split on: block/2 + interval
    out_lat_sec = out_lat / sr

    mult = float(np.exp2(semitones / 12.0))
    limit = (tonality_hz / sr) / np.sqrt(mult)  # measured: tonality/sqrt(mult)

    def frame(c: int, end: int) -> np.ndarray:
        """track[end-block:end] with zero padding outside the track."""
        out = np.zeros(block)
        lo, hi = max(end - block, 0), min(end, audio.shape[1])
        if hi > lo:
            out[lo - (end - block) : hi - (end - block)] = audio[c, lo:hi]
        return out

    model = SpectralModel(cfg)
    model.rng_state = seed
    acc = np.zeros((channels, n_out + 2 * (block + interval)))
    n_hops = (n_out + interval - 1) // interval
    # Pre-compute the per-quantum input frame ends with the exact float path
    # of the worklet restatement (native.py:241-284): current_time is
    # ACCUMULATED += 128/sr per quantum, and round() happens on the product
    # — replicating it bit-for-bit matters because (q*128+out_lat)*rate can
    # land exactly on .5 and round the other way.
    n_q = (n_hops * interval) // QUANTUM + 1
    ie_by_q = []
    current_time = 0.0
    in_lat_sec = in_lat / sr
    for _ in range(n_q):
        output_time = current_time + out_lat_sec
        input_time = 0.0 + (output_time - 0.0) * rate
        input_time += in_lat_sec
        ie_by_q.append(round(input_time * sr))
        current_time += QUANTUM / sr
    for h in range(n_hops):
        o = h * interval
        q = o // QUANTUM
        ie = ie_by_q[q]
        spec_in = np.stack([analyse(frame(c, ie), w, fft) for c in range(channels)])
        spec_prev = np.stack(
            [analyse(frame(c, ie - interval), w, fft) for c in range(channels)]
        )
        out_spec = model.hop(
            spec_in,
            spec_prev,
            # blob seek law: tf saturates at `interval` (rate < 1/interval)
            time_factor=min(1.0 / rate, float(interval)),
            freq_multiplier=mult,
            freq_tonality_limit=limit,
            formant_factor=float(np.exp2(formant_semitones / 12.0))
            if formant_semitones else 1.0,
            formant_compensation=formant_compensation,
            formant_base=formant_base_hz / sr,
        )
        for c in range(channels):
            acc[c, o + interval : o + interval + block] += synthesise(out_spec[c], w, fft)
    return acc[:, :n_out]


def compare_model_vs_blob(
    rate: float,
    semitones: float,
    seconds: float = 1.5,
    block_ms: float = 120.0,
    interval_ms: float = 30.0,
    channels: int = 1,
    seed: int = 0,
) -> float:
    """SNR (dB) of render_model vs the native blob at matched settings."""
    from golden_wasm import native

    sr = 44100.0
    rng = np.random.default_rng(seed)
    n = int(seconds * sr * max(rate, 1.0)) + int(sr)
    t = np.arange(n) / sr
    x = np.stack(
        [
            0.3 * np.sin(2 * np.pi * (440 + 3 * c) * t)
            + 0.1 * rng.standard_normal(n)
            for c in range(channels)
        ]
    ).astype(np.float32)
    n_out = int(seconds * sr)
    ref = native.render_reference(
        x, sr, n_out, rate=rate, semitones=semitones,
        block_ms=block_ms, interval_ms=interval_ms, split_computation=True,
    )
    got = render_model(
        x, sr, n_out, rate=rate, semitones=semitones,
        block_ms=block_ms, interval_ms=interval_ms,
    )
    block = round(block_ms / 1000 * sr)
    a, b = ref[:, block:], got[:, block:]
    return float(10 * np.log10(np.mean(a**2) / max(np.mean((a - b) ** 2), 1e-30)))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=1.0)
    ap.add_argument("--semitones", type=float, default=0.0)
    ap.add_argument("--seconds", type=float, default=1.5)
    ap.add_argument("--block-ms", type=float, default=120.0)
    ap.add_argument("--interval-ms", type=float, default=30.0)
    ap.add_argument("--channels", type=int, default=1)
    args = ap.parse_args()
    snr = compare_model_vs_blob(
        args.rate, args.semitones, args.seconds,
        args.block_ms, args.interval_ms, args.channels,
    )
    print(f"model vs blob SNR: {snr:.1f} dB")
