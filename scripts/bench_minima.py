#!/usr/bin/env python
"""Merge several bench.py runs into ONE canonical per-query-minima line.

VERDICT r4 task 8: single bench totals swing ±40% with machine noise
(BASELINE.md documents repeated identical-code runs at 34.3 → 43.3 →
50.5 s), so the canonical number a round records in BASELINE.md is the
per-query MINIMUM across that round's runs — the best steady-state each
query demonstrably achieved — and the canonical total is the sum of
those minima. Cross-round comparisons (scripts/bench_diff.py) against
minima rows need no noise-band caveat: a regression that survives the
min over N runs is real.

Usage:
    python bench.py > /tmp/run1.json   # repeat N times
    python scripts/bench_minima.py /tmp/run1.json /tmp/run2.json ...

Prints one JSON line shaped exactly like bench.py's output (so
bench_diff.py consumes it unchanged), with "runs": N added. Queries
missing from some runs (headline grew mid-round) take the min over the
runs that have them.
"""

from __future__ import annotations

import json
import sys


def main(paths: list[str]) -> None:
    runs = []
    for p in paths:
        with open(p) as f:
            # tolerate leading log lines: take the last JSON-parseable line
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        for ln in reversed(lines):
            try:
                runs.append(json.loads(ln))
                break
            except json.JSONDecodeError:
                continue
        else:
            raise SystemExit(f"{p}: no JSON line found")
    if not runs:
        raise SystemExit("usage: bench_minima.py RUN.json [RUN.json ...]")
    sfs = {r.get("sf") for r in runs}
    if len(sfs) > 1:
        raise SystemExit(f"refusing to merge runs at different sf: {sfs}")
    minima: dict[str, float] = {}
    for r in runs:
        for q, sec in r["queries"].items():
            minima[q] = min(minima.get(q, float("inf")), sec)
    out = {
        "metric": "headline_total_wall_min_of_runs",
        "value": round(sum(minima.values()), 3),
        "unit": "sec",
        "queries": {q: round(s, 3) for q, s in minima.items()},
        "sf": runs[0].get("sf"),
        "runs": len(runs),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
