"""Render the golden fixture set from the ACTUAL reference WASM engine.

Runs the blob (wasm2c-translated, native.py) over the case matrix in
material.py and writes tests/golden/golden_v1.npz.  Committing the fixtures
lets the >=40 dB BASELINE assertion run on any machine (no gcc/node
needed); tests/test_golden_wasm.py re-verifies one fixture against a live
blob render where gcc exists, so drift is caught.

Usage: PYTHONPATH=tools python tools/golden_wasm/make_fixtures.py [case ...]

With case names on argv only those cases are (re)rendered and MERGED into
the existing npz — committed fixtures for other cases stay bit-stable
(their rate<0.5 draw streams, and hence their measured SNR margins, are
seed-dependent: a gratuitous regeneration would change the recorded
44.7 dB-margin extreme case, for example).  With no argv every case is
rendered fresh.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

from golden_wasm import material, native

OUT = pathlib.Path(__file__).resolve().parents[2] / "tests" / "golden" / "golden_v1.npz"


def main(only: list[str] | None = None) -> None:
    arrays = {}
    if only and OUT.exists():
        arrays.update(np.load(OUT))
    n_out = int(material.SECONDS * material.SR)
    for name, rate, semitones, channels, extras in material.CASES:
        if only and name not in only:
            continue
        x = material.case_input(rate, channels)
        seeds: list = []
        kw = dict(split_computation=True)
        kw.update(material.case_render_kwargs(extras))
        ref = native.render_reference(
            x,
            material.SR,
            n_out,
            rate=rate,
            semitones=semitones,
            tonality_hz=material.TONALITY_HZ,
            seed_out=seeds,
            **kw,
        )
        arrays[name] = ref.astype(np.float32)
        # MINSTD state at render start: needed to replicate rate < 0.5
        # renders (the engine consumes random vertical-step draws there)
        arrays[name + "__seed"] = np.uint32(seeds[0])
        print(f"{name}: rendered {ref.shape} seed={seeds[0]}")
    for name, semitones, channels, extras in material.LIVE_CASES:
        if only and name not in only:
            continue
        x = material.case_input(1.0, channels)[:, :n_out]
        kw = dict(split_computation=True)
        kw.update(material.case_render_kwargs(extras))
        ref = native.render_reference_live(
            x,
            material.SR,
            n_out,
            semitones=semitones,
            tonality_hz=material.TONALITY_HZ,
            **kw,
        )
        # coupled mode never consumes MINSTD draws (tf == 1), so no seed
        arrays[name] = ref.astype(np.float32)
        print(f"{name}: rendered live {ref.shape}")
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT} ({OUT.stat().st_size/1e6:.1f} MB)")


if __name__ == "__main__":
    main(sys.argv[1:] or None)
