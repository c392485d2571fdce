#!/usr/bin/env python
"""Mechanical bench regression check (VERDICT r3 task 7): diff per-query
minima between two bench JSON lines and flag >1.5x changes.

BASELINE.md documents ~40% total-wall machine-noise swings across rounds;
per-query min-of-3 is the stable signal, so regression checking compares
those minima pairwise and only for queries present in BOTH rounds (headline
membership changes across rounds make totals incomparable).

Usage:
    python scripts/bench_diff.py OLD.json NEW.json   # e.g. BENCH_r03.json
    python scripts/bench_diff.py                     # newest two BENCH_r*.json

Exit status 1 if any common query regressed >1.5x (so a round's wrap-up can
gate on it); the report always prints every common query sorted by ratio.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

THRESHOLD = 1.5


def load(path: Path) -> dict[str, float]:
    """Accept either bench.py's own JSON line or the driver's BENCH_r*.json
    wrapper (which embeds our line inside its captured stdout 'tail')."""
    data = json.loads(path.read_text())
    if "queries" in data:
        return data["queries"]
    for line in reversed(data.get("tail", "").splitlines()):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)["queries"]
    raise ValueError(f"{path}: no bench JSON line found")


def main(argv: list[str]) -> int:
    if len(argv) == 3:
        old_path, new_path = Path(argv[1]), Path(argv[2])
    else:
        benches = sorted(Path(__file__).parent.parent.glob("BENCH_r*.json"))
        if len(benches) < 2:
            print("need two BENCH_r*.json files (or pass OLD NEW)")
            return 0
        old_path, new_path = benches[-2], benches[-1]

    old, new = load(old_path), load(new_path)
    common = sorted(set(old) & set(new))
    print(f"# bench diff {old_path.name} -> {new_path.name}: "
          f"{len(common)} common queries "
          f"(old-only {sorted(set(old) - set(new))}, "
          f"new-only {sorted(set(new) - set(old))})")
    regressions = []
    rows = []
    for name in common:
        ratio = new[name] / old[name] if old[name] > 0 else float("inf")
        rows.append((ratio, name, old[name], new[name]))
        if ratio > THRESHOLD:
            regressions.append(name)
    for ratio, name, o, n in sorted(rows, reverse=True):
        flag = "  <-- REGRESSION" if ratio > THRESHOLD else ""
        print(f"{name:40s} {o:8.3f}s -> {n:8.3f}s  {ratio:5.2f}x{flag}")
    tot_old = sum(old[n] for n in common)
    tot_new = sum(new[n] for n in common)
    print(f"{'TOTAL (common)':40s} {tot_old:8.3f}s -> {tot_new:8.3f}s  "
          f"{tot_new / tot_old:5.2f}x")
    if regressions:
        print(f"REGRESSED >{THRESHOLD}x: {regressions}")
        return 1
    print("no per-query regression above threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
