#!/bin/bash
# Remaining recorded suite runs (ROUND5.md table): parts 2 and 3 of
# tools/run_recorded_suites.sh (part 1, the single-device full suite,
# was recorded at b395e38: 261 passed in 7858s).
set -u
cd /root/repo
REC=/tmp/suite_records.txt
COMMIT=$(git rev-parse --short HEAD)
echo "commit=$COMMIT date=$(date -u +%FT%TZ)" >> "$REC"

run() {
  local name=$1; shift
  local log=/tmp/suite_${name}.log
  local t0=$SECONDS
  "$@" > "$log" 2>&1
  local rc=$?
  local wall=$((SECONDS - t0))
  local tailline
  tailline=$(grep -E "(passed|failed|error)" "$log" | tail -1)
  echo "$name: rc=$rc wall=${wall}s :: $tailline" >> "$REC"
  echo "== $name done: rc=$rc wall=${wall}s :: $tailline"
}

run mesh2_not_examples env DFTK_TPU_MESH=2 \
    python -m pytest tests/ -q -rf -m "not examples"
run examples env -u DFTK_TPU_MESH \
    python -m pytest tests/ -q -rf -m examples
echo "ALL REMAINING SUITE RUNS DONE"
cat "$REC"
