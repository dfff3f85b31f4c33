#!/usr/bin/env python3
"""NOTES<->artifact tripwire: the bench total NOTES quotes must BE the
committed artifact's total.

Round-10 verdict item 1: NOTES_r10 quoted the clean 224.0 s idle run, but
a later accidental `git add` shipped a 310.9 s contended capture as
BENCH_LATEST.json — the committed record contradicted the text that
described it, and bench_drift.py (which diffs two artifacts against each
other) could not catch it. This checker closes that gap structurally:
it reads the artifact's total and requires the NOTES file to contain that
exact number (1-decimal rendering, the form every NOTES quotes).

Usage:
    python3 tools/notes_check.py NOTES_rN.md [BENCH_LATEST.json]

Exit 0 iff the NOTES text contains the artifact total formatted as
`<total rounded to 1 decimal>` (e.g. "224.0") AND, when the NOTES names a
query count next to it ("/ 368"), that count matches the artifact's
queries map. Run it on the exact files the closing commit will ship.
"""
import json
import math
import re
import sys


def main():
    notes_p = sys.argv[1]
    bench_p = sys.argv[2] if len(sys.argv) > 2 else "BENCH_LATEST.json"
    bench = json.load(open(bench_p))
    total = bench["value"]
    nq = len(bench.get("queries", {}))
    # Accept either rounding direction at the displayed precision: a NOTES
    # author writing 224.04 as "224.0" and 224.05 as "224.1" are both the
    # same artifact.
    wants = {f"{total:.1f}", f"{math.floor(total * 10) / 10:.1f}"}
    text = open(notes_p).read()
    hit = next((w for w in wants if w in text), None)
    if hit is None:
        print(f"FAIL: {notes_p} never quotes the committed artifact total "
              f"{total:.3f} s ({' or '.join(sorted(wants))}) from {bench_p}")
        sys.exit(1)
    # If the quote carries a "/ <n>" query count, it must match too.
    m = re.search(re.escape(hit) + r"\s*(?:s\b|sec\b)?\s*/\s*(\d+)", text)
    if m and int(m.group(1)) != nq:
        print(f"FAIL: {notes_p} quotes '{hit} / {m.group(1)}' but {bench_p} "
              f"holds {nq} queries")
        sys.exit(1)
    print(f"OK: {notes_p} quotes {hit} s"
          + (f" / {nq} queries" if m else "")
          + f", matching {bench_p} (total {total:.3f}, {nq} queries)")
    sys.exit(0)


if __name__ == "__main__":
    main()
