#!/bin/bash
# Round-4 TPU measurement battery — the measured half of docs/STATUS-r4.md
# (MDFT-fusion closure, fidelity headline + standings, serving-path golden
# gate on the real chip).  Run from the repo root, ONE process at a time
# (tunnel rule, CLAUDE.md); each step is bounded and logged.
#
#   bash benchmarks/tpu_battery.sh [logdir]    # default /tmp/battery
cd "$(dirname "$0")/.." || exit 1
L=${1:-/tmp/battery}
mkdir -p "$L"
run() {
  name=$1; shift
  echo "=== $name  $(date -u +%H:%M:%S) ===" | tee -a "$L/battery.log"
  timeout 3600 "$@" > "$L/$name.out" 2> "$L/$name.err"
  echo "exit=$? $(date -u +%H:%M:%S)" | tee -a "$L/battery.log"
  tail -5 "$L/$name.err" | tee -a "$L/battery.log"
  cat "$L/$name.out" | tee -a "$L/battery.log"
}

export PYTHONPATH=$PWD:/root/.axon_site

run mdft_fusion_8k   python benchmarks/exp_mdft_fusion.py 8192 5376
run mdft_fusion_16k  python benchmarks/exp_mdft_fusion.py 16384 5376
run bench_fused      python bench.py
run bench_unfused    env BAUKLANK_FUSED_MDFT=0 python bench.py
run profile_fidelity python benchmarks/profile_fidelity.py 6
run profile_chain    python benchmarks/profile_chain_inputs.py 64 8
run profile_hoisted  python benchmarks/profile_hoisted.py 128 8 det
run winfetch         python benchmarks/exp_winfetch.py 1024
run analyses         python benchmarks/exp_analyses.py 128 8
run golden_tpu       python benchmarks/check_tpu_golden.py
run bench_fidelity   python benchmarks/bench_fidelity.py --record
run fidelity_voice   python benchmarks/bench_fidelity_voice.py 200
run run_all          python benchmarks/run_all.py
echo "BATTERY DONE $(date -u +%H:%M:%S)" | tee -a "$L/battery.log"
