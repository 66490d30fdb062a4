"""Golden renders against the actual reference WASM engine (requires node;
skipped where unavailable — this build image has no WASM runtime)."""

import sys

import pytest

sys.path.insert(0, "tools")
from golden_wasm import harness  # noqa: E402

pytestmark = pytest.mark.skipif(
    not harness.available(), reason="node or reference checkout unavailable"
)


@pytest.mark.parametrize("rate,semitones", [(1.0, 0.0), (0.5, 0.0), (2.0, 0.0)])
def test_snr_vs_reference_wasm(rate, semitones):
    snr = harness.compare(rate, semitones)
    # BASELINE target: >=40 dB across rate 0.5-2.0
    assert snr > 40.0, snr
