"""Render the golden fixture set from the ACTUAL reference WASM engine.

Runs the blob (wasm2c-translated, native.py) over the case matrix in
material.py and writes tests/golden/golden_v1.npz.  Committing the fixtures
lets the >=40 dB BASELINE assertion run on any machine (no gcc/node
needed); tests/test_golden_wasm.py re-verifies one fixture against a live
blob render where gcc exists, so drift is caught.

Usage: PYTHONPATH=tools python tools/golden_wasm/make_fixtures.py
"""

from __future__ import annotations

import pathlib

import numpy as np

from golden_wasm import material, native

OUT = pathlib.Path(__file__).resolve().parents[2] / "tests" / "golden" / "golden_v1.npz"


def main() -> None:
    arrays = {}
    n_out = int(material.SECONDS * material.SR)
    for name, rate, semitones, channels, extras in material.CASES:
        x = material.case_input(rate, channels)
        seeds: list = []
        kw = dict(split_computation=True)
        kw.update(material.renderer_extras(extras))
        ref = native.render_reference(
            x,
            material.SR,
            n_out,
            rate=rate,
            semitones=semitones,
            tonality_hz=material.TONALITY_HZ,
            block_ms=material.BLOCK_MS,
            interval_ms=material.INTERVAL_MS,
            seed_out=seeds,
            **kw,
        )
        arrays[name] = ref.astype(np.float32)
        # MINSTD state at render start: needed to replicate rate < 0.5
        # renders (the engine consumes random vertical-step draws there)
        arrays[name + "__seed"] = np.uint32(seeds[0])
        print(f"{name}: rendered {ref.shape} seed={seeds[0]}")
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT} ({OUT.stat().st_size/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
