#!/bin/bash
# Recorded suite runs for the round-5 changelog (VERDICT r4 item #3).
# Three sequential solo invocations on this 1-CPU container; each appends
# a summary line to /tmp/suite_records.txt and keeps the full log.
#
#   1. full suite minus examples, single-device   (end-of-round HEAD run)
#   2. full suite minus examples, DFTK_TPU_MESH=2 (mpiexec -n 2 analogue,
#      /root/reference/test/runtests.jl:26-33)
#   3. examples tier (pytest -m examples)         (test/examples.jl analogue)
#
# The examples tier is recorded single-device; parts 1+3 together are the
# complete 285-test suite at HEAD.
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

run full_not_examples env -u DFTK_TPU_MESH \
    python -m pytest tests/ -q -rf -m "not examples" --durations=15
run mesh2_not_examples env DFTK_TPU_MESH=2 \
    python -m pytest tests/ -q -rf -m "not examples"
run examples env -u DFTK_TPU_MESH \
    python -m pytest tests/ -q -rf -m examples
echo "ALL SUITE RUNS DONE"
cat "$REC"
