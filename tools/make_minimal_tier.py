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

HEADER = """\
# The 'minimal' fast tier (reference test/runtests_parser.jl:9-41
# :minimal payload analogue): a <10-min broad smoke of every
# subsystem.  Node IDs marked pytest.mark.minimal by conftest.py.
# Regenerate with tools/make_minimal_tier.py from a --durations=0
# run: tests <= 4s kept, plus the cheapest test (<= 25s) of any
# file otherwise unrepresented, plus all sub-5ms tests.
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
    sel = {k for k, t in call.items() if t <= FAST_S}
    for f, lst in sorted(byfile.items()):
        if not any(k in sel for _, k in lst):
            t, k = min(lst)
            if t <= REP_CAP_S:
                sel.add(k)
    sel |= {t for t in allt if t not in call}
    est = sum(call.get(k, 0.0) for k in sel)
    with open(out, "w") as f:
        f.write(HEADER)
        for k in sorted(sel):
            f.write(k + "\n")
    print(f"{len(sel)} tests -> {out} (estimated call time {est:.0f}s)")


if __name__ == "__main__":
    main(*sys.argv[1:])
