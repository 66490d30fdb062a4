"""Pin the splitComputation=false analysis-frame law, empirically.

trace_splitoff.py read the ring layout off the store trace (ring =
block + interval + 1 floats, seek writes its window circularly, head
drifts -1/quantum).  This probe closes the loop: at each quantum it

1. snapshots the ring right after ``_seek`` (content = exact ramp
   integers, so every cell is identified),
2. collects every 512-float store run ``_process`` writes (the analysis
   spectra live among them),
3. for EVERY circular start position of the ring snapshot, analyses the
   candidate frame with the pinned pymodel pipeline and reports which
   (run, start) pairs match — reading the placement law instead of
   guessing it.

Usage: python tools/golden_wasm/probe_splitoff.py [--quanta N] [--split]
"""

from __future__ import annotations

import argparse
import struct
import sys

import numpy as np

sys.path.insert(0, "tools")


def f32(bits: int) -> float:
    return struct.unpack("<f", struct.pack("<I", bits & 0xFFFFFFFF))[0]


def runs_of_consecutive(addr_vals: dict[int, int]) -> list[tuple[int, int]]:
    addrs = sorted(addr_vals)
    out = []
    i = 0
    while i < len(addrs):
        j = i
        while j + 1 < len(addrs) and addrs[j + 1] == addrs[j] + 4:
            j += 1
        out.append((addrs[i], j - i + 1))
        i = j + 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", action="store_true")
    ap.add_argument("--quanta", type=int, default=4)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--interval", type=int, default=128)
    ap.add_argument("--rate", type=float, default=1.0)
    ap.add_argument("--ring-base", type=int, default=238960)
    args = ap.parse_args()

    from golden_wasm import native
    from golden_wasm.pymodel import analyse, blob_window

    SR = 44100.0
    block, interval = args.block, args.interval
    fft = 512 if block == 512 else None
    from golden_wasm.pymodel import fft_size_for
    fft = fft_size_for(block)
    ring_n = block + interval + 1
    w = blob_window(block, interval)

    d = native.WorkletDriver(SR, 1)
    d.wasm._configure(1, block, interval, 1 if args.split else 0)
    d.wasm._reset()
    d._update_buffers()
    d.input_latency_sec = d.wasm._inputLatency() / SR
    d.output_latency_sec = d.wasm._outputLatency() / SR
    print(f"split={'on' if args.split else 'off'} ring={ring_n} "
          f"bufferLength={d.buffer_len} fft={fft}")

    n_in = 8192
    ramp = np.arange(1, n_in + 1, dtype=np.float32)
    d.add_buffers([ramp])
    d.schedule({"active": True, "input": 0.0, "output": 0.0, "rate": args.rate})

    sink: list = []
    tag = [None]
    d.wasm.watch_stores(0, 1 << 32, sink, tag)
    QUANTUM = native.QUANTUM

    for q in range(args.quanta):
        output_time = d.current_time + d.output_latency_sec
        seg = d.time_map[0]
        wv = d.wasm
        tag[0] = "ctl"
        wv._setTransposeSemitones(seg["semitones"], seg["tonalityHz"] / SR)
        wv._setFormantSemitones(seg["formantSemitones"], 0)
        wv._setFormantBase(seg["formantBaseHz"] / SR)
        input_time = seg["input"] + (output_time - seg["output"]) * seg["rate"]
        input_time += d.input_latency_sec
        input_end = round(input_time * SR)
        start = input_end - d.buffer_len
        buf = wv.mem_f32(d.buf_in[0], d.buffer_len)
        buf[:] = 0.0
        lo, hi = max(start, 0), min(input_end, n_in)
        if hi > lo:
            buf[lo - start: hi - start] = ramp[lo:hi]
        tag[0] = "seek"
        sink.clear()
        wv._seek(d.buffer_len, seg["rate"])
        ring = np.array(wv.mem_f32(args.ring_base, ring_n), np.float64)
        tag[0] = "proc"
        wv._process(0, QUANTUM)
        d.current_time += QUANTUM / SR

        # ring content as sample ids (-1 = zero/unknown)
        ids = np.where(
            (np.abs(ring - np.round(ring)) < 1e-3) & (ring >= 1),
            np.round(ring) - 1, -1).astype(int)
        print(f"\n-- quantum {q}: inputEnd={input_end} window=[{start},{input_end})")

        # spectra candidates: proc-phase f32 store runs of >= bands floats.
        # Addresses can be written SEVERAL times per hop (e.g. the prev
        # analysis writes the scratch spectrum, then the cur analysis
        # overwrites it) — keep every generation.
        gens: dict[int, list[int]] = {}
        for t, kind, a, sz, bits in sink:
            if t == "proc" and kind == "st" and sz == 4:
                gens.setdefault(a, []).append(bits)
        runs = [r for r in runs_of_consecutive(gens) if r[1] >= fft // 2]

        # all circular frames of the snapshot
        idx = (np.arange(ring_n)[:, None] + np.arange(block)[None]) % ring_n
        frames = ring[idx]                                # [ring_n, block]
        specs = np.stack([analyse(fr, w, fft) for fr in frames])

        for base, count in runs:
            n_gen = max(len(gens[base + 4 * i]) for i in range(count))
            for gen in range(n_gen):
                vals = np.array([
                    f32(gens[base + 4 * i][min(gen, len(gens[base + 4 * i]) - 1)])
                    for i in range(count)])
                for view, name in ((vals[0::2] + 1j * vals[1::2], "inter"),
                                   (vals[:count // 2] + 1j * vals[count // 2:],
                                    "planar")):
                    z = view[: fft // 2]
                    if len(z) < fft // 2 or not np.any(np.abs(z) > 1e-3):
                        continue
                    for conj in (False, True):
                        zz = np.conj(z) if conj else z
                        num = np.abs(specs - zz[None]).sum(axis=1)
                        den = np.abs(zz).sum() + 1e-30
                        rel = num / den
                        hit = np.argmin(rel)
                        if rel[hit] < 3e-3:
                            s0 = ids[hit]
                            print(f"  run@{base} n={count} gen{gen} {name}"
                                  f"{' conj' if conj else ''}: frame start "
                                  f"ring[{hit}] (sample id {s0}), rel "
                                  f"{rel[hit]:.2e}")
    d.wasm.unwatch_stores()


if __name__ == "__main__":
    main()
