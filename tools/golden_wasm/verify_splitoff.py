"""Lockstep-verify candidate splitComputation=false laws against the blob.

probe_splitoff.py pinned (trace-read, not guessed): ring = block+interval+1
circular, head -1/quantum, and hop h's CUR analysis == the seek window of
the quantum containing o = h*interval (frame ending at inputEnd).  The
remaining unknowns are the PREV analysis and the output placement.  This
script renders the blob at split-off and compares, quantum by quantum,
against pymodel-driven candidates:

  prev law A: carried — prev spectrum = previous hop's cur spectrum
              (hop 0: analyse of the frame one interval earlier);
  prev law B: re-analysed at inputEnd - interval (the split-on law);
  placement:  frames land at [o, o + block) (README-signalsmith: split
              off has one interval less latency).

At rate 1.0 A == B (inputEnd advances exactly one interval per quantum);
rate 0.7 / 1.3 distinguish them.

Usage: python tools/golden_wasm/verify_splitoff.py [--rate R] [--seconds S]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "tools")

from golden_wasm import native  # noqa: E402
from golden_wasm.pymodel import (  # noqa: E402
    ModelConfig, SpectralModel, analyse, blob_window, fft_size_for, synthesise,
)

QUANTUM = 128
SR = 44100.0


def render_model_splitoff(
    audio: np.ndarray, n_out: int, rate: float,
    block: int, interval: int, prev_law: str,
    semitones: float = 0.0, tonality_hz: float = 8000.0,
    seed: int | None = None,
) -> np.ndarray:
    audio = np.asarray(audio, np.float64)
    channels = audio.shape[0]
    fft = fft_size_for(block)
    cfg = ModelConfig(channels=channels, block=block, interval=interval)
    w = blob_window(block, interval)
    in_lat = block // 2
    out_lat = block - in_lat            # split off: NO +interval
    mult = float(np.exp2(semitones / 12.0))
    limit = (tonality_hz / SR) / np.sqrt(mult)

    def frame(c, end):
        out = np.zeros(block)
        lo, hi = max(end - block, 0), min(end, audio.shape[1])
        if hi > lo:
            out[lo - (end - block): hi - (end - block)] = audio[c, lo:hi]
        return out

    model = SpectralModel(cfg)
    model.rng_state = seed
    acc = np.zeros((channels, n_out + 2 * (block + interval)))
    n_hops = (n_out + interval - 1) // interval
    n_q = (n_hops * interval) // QUANTUM + 1
    ie_by_q = []
    t = 0.0
    for _ in range(n_q):
        ie_by_q.append(round(((t + out_lat / SR) * rate + in_lat / SR) * SR))
        t += QUANTUM / SR
    def sample(c, s):
        return audio[c, s] if 0 <= s < audio.shape[1] else 0.0

    carried = None
    for h in range(n_hops):
        o = h * interval
        q = o // QUANTUM
        ie = ie_by_q[q]
        cur = np.stack([analyse(frame(c, ie), w, fft) for c in range(channels)])
        if prev_law == "C":
            # trace-read law (probe_splitoff + store-fill trace): the ring
            # (block+interval+1, head -1/seek) retains only ONE stale cell
            # per quantum and it sits OUTSIDE the prev analysis window —
            # the prev frame is the window ending at inputEnd - interval
            # with its first `interval` samples ZEROED (they fall in the
            # region the short split-off seek never refreshes).
            # Hop-exact: flat 1e-5..3e-4 vs the live blob across rate
            # 0.25-2.0 x semitones +/-12 incl. MINSTD.
            prev_fr = np.zeros((channels, block))
            for c in range(channels):
                for i in range(interval, block):
                    prev_fr[c, i] = sample(c, ie - (block + interval) + i)
            prev = np.stack(
                [analyse(prev_fr[c], w, fft) for c in range(channels)])
        elif prev_law == "B" or carried is None:
            prev = np.stack(
                [analyse(frame(c, ie - interval), w, fft)
                 for c in range(channels)])
        else:
            prev = carried
        if prev_law == "A":
            carried = cur
        out_spec = model.hop(
            cur, prev, time_factor=1.0 / rate, freq_multiplier=mult,
            freq_tonality_limit=limit,
        )
        for c in range(channels):
            acc[c, o: o + block] += synthesise(out_spec[c], w, fft)
    return acc[:, :n_out]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=1.0)
    ap.add_argument("--seconds", type=float, default=0.6)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--interval", type=int, default=128)
    ap.add_argument("--semitones", type=float, default=0.0)
    args = ap.parse_args()

    block, interval = args.block, args.interval
    n_out = int(args.seconds * SR)
    n_in = int(args.seconds * SR * max(args.rate, 1.0)) + int(SR)
    t = np.arange(n_in) / SR
    x = (0.4 * np.sin(2 * np.pi * 220 * t)
         + 0.2 * np.sin(2 * np.pi * 331 * t)).astype(np.float32)[None]

    seed_out: list = []
    ref = native.render_reference(
        x, SR, n_out, rate=args.rate, semitones=args.semitones,
        block_ms=block / SR * 1000, interval_ms=interval / SR * 1000,
        split_computation=False, seed_out=seed_out,
    )
    # render_reference's configure path rounds ms back to samples; verify
    d_chk = round(block / SR * 1000 / 1000 * SR)
    assert d_chk == block, (d_chk, block)

    for law in ("A", "B", "C"):
        got = render_model_splitoff(
            x, n_out, args.rate, block, interval, law,
            semitones=args.semitones, seed=seed_out[0],
        )
        err = ref[0] - got[0]
        snr = 10 * np.log10(
            np.mean(ref[0][block:] ** 2)
            / max(np.mean(err[block:] ** 2), 1e-30))
        per_q = [
            float(np.abs(err[q * QUANTUM:(q + 1) * QUANTUM]).max())
            for q in range(min(12, n_out // QUANTUM))
        ]
        print(f"law {law}: SNR {snr:7.1f} dB   per-quantum max err "
              + " ".join(f"{e:.1e}" for e in per_q))


if __name__ == "__main__":
    main()
