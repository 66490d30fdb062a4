"""Golden renders against the actual reference WASM engine.

The blob (reference app/SignalsmithStretch.mjs:265) is executed natively:
AOT-translated to C by tools/golden_wasm/wasm2c.py and driven by a Python
re-statement of the worklet hot loop (tools/golden_wasm/native.py).  Needs
gcc; skips only where neither gcc nor node exists.
"""

import sys

import pytest

sys.path.insert(0, "tools")
from golden_wasm import harness  # noqa: E402

pytestmark = pytest.mark.skipif(
    not harness.available(), reason="no WASM execution path (gcc/node)"
)


@pytest.mark.parametrize("rate,semitones", [(1.0, 0.0), (0.5, 0.0), (2.0, 0.0)])
@pytest.mark.xfail(
    reason="round-2 calibration vs the real blob in progress: the round-1 "
    "engine matched only the self-derived spec (first real measurement: "
    "-3..4 dB)",
    strict=False,
)
def test_snr_vs_reference_wasm(rate, semitones):
    snr = harness.compare(rate, semitones)
    # BASELINE target: >=40 dB across rate 0.5-2.0
    assert snr > 40.0, snr


def test_reference_blob_executes():
    """The vendored wasm2c path must keep executing the blob: presetDefault
    constants are fixed by the library (block=0.12*sr, interval=0.03*sr)."""
    from golden_wasm import native

    d = native.WorkletDriver(44100.0, 1)
    assert d.wasm._blockSamples() == 5292
    assert d.wasm._intervalSamples() == 1323
    assert d.wasm._inputLatency() == 2646
    assert d.wasm._outputLatency() == 2646
