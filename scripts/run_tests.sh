#!/bin/bash
# Sharded test runner: one pytest PROCESS per test file.
#
# Why: XLA:CPU segfaults long-lived many-compilation processes (the
# fault class documented in CLAUDE.md round 4 — NOT stack, NOT memory;
# the crash point MOVES as tests are added, so single-test subprocess
# isolation cannot keep up).  A fresh process per file bounds the
# compilation count per process and has always passed.  Startup cost is
# ~2-4 s/file (~30 files); per-file wall times are logged so the slow
# tail stays visible (`--durations` inside each shard).
#
#   bash scripts/run_tests.sh [extra pytest args...]
#
# Exit 0 iff every shard passes.  A one-line-per-file summary lands on
# stdout; full logs in /tmp/testshards/.
set -u
cd "$(dirname "$0")/.." || exit 1
L=/tmp/testshards
mkdir -p "$L"
overall=0
total_s=0
for f in tests/test_*.py; do
  n=$(basename "$f" .py)
  t0=$(date +%s)
  python -m pytest "$f" -q --durations=5 "$@" > "$L/$n.log" 2>&1
  rc=$?
  t1=$(date +%s)
  dt=$((t1 - t0))
  total_s=$((total_s + dt))
  # pytest -q in this repo omits the trailing summary line; tally from
  # the progress dots (".sxF" chars on the [100%] lines)
  tally=$(grep -E '\[ *[0-9]+%\]' "$L/$n.log" | tr -cd '.sxFE' | wc -c)
  if [ $rc -ne 0 ]; then
    overall=1
    echo "FAIL  ${dt}s  $n  ($tally)  [log: $L/$n.log]"
  else
    echo "ok    ${dt}s  $n  ($tally)"
  fi
done
echo "TOTAL ${total_s}s  overall_exit=$overall"
exit $overall
