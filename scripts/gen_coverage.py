"""Regenerate COVERAGE.md from the query registry: `python scripts/gen_coverage.py`."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_ml_features_spark import registry

HEADER = """# COVERAGE — declared query inventory

Auto-generated view of the registry (`pyspark_ml_features_spark/registry.py`);
one row per declared query in `__spark_entry__.queries()`. The SURVEY.md §2
operator IDs appear in the tags column; every `exact DuckDB oracle` row is
hash-verified by the driver at sf0.01 and by `tests/test_oracle_parity.py`.

Regenerate with: `python scripts/gen_coverage.py`.

| query | check | tags (SURVEY §2 ids) | summary |
|---|---|---|---|
"""


def main() -> None:
    rows = []
    for name, q in sorted(registry.all_queries().items()):
        oracle = "exact DuckDB oracle" if q.oracle else "rows-only"
        doc = (q.doc or "").split("\n")[0].strip()
        rows.append(f"| `{name}` | {oracle} | {', '.join(q.tags)} | {doc} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "COVERAGE.md")
    with open(out, "w") as fh:
        fh.write(HEADER + "\n".join(rows) + "\n")
    print(f"wrote {out} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
