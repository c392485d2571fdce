"""Measure executed-plan shuffle/spill/peak-task SQLMetrics for every
bench.py HEADLINE query at sf0.01 — the calibration source for the
checked-in baselines in tests/test_shuffle_budget.py (ADVICE r6: ceilings
are now `measured × MARGIN`, re-derived from this script's output, never
hand-tweaked). Usage: `python scripts/measure_shuffle.py [names...]`.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from pyspark_ml_features_spark import registry  # noqa: E402
from pyspark_ml_features_spark.plans.audit import (  # noqa: E402
    capture_checkpoint_plans,
)
from pyspark_ml_features_spark.plans.metrics import runtime_metrics  # noqa: E402
from pyspark_ml_features_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    spark = get_spark(app_name="measure-shuffle")
    qs = registry.all_queries()
    print("# measured at", SF_DIR)
    print("MEASURED = {  # query: (shuffle_MiB, peak_mem_MiB)")
    stats = {}
    for name in names:
        with capture_checkpoint_plans() as captured:
            df = qs[name].fn(spark, SF_DIR)
            df.collect()
        rows = [runtime_metrics(df).row()] + [
            runtime_metrics(c["df"]).row() for c in captured
            if "df" in c]  # probe_stream_query entries carry no df
        shuffle = round(sum(r["shuffle_MiB"] for r in rows), 2)
        spill = round(sum(r["spill_MiB"] for r in rows), 2)
        peak = round(max(r["peak_task_MiB"] for r in rows), 1)
        stats[name] = (shuffle, spill, peak)
        print(f'    "{name}": ({shuffle:.2f}, {peak}),'
              f"  # spill {spill}")
    print("}")
    spilled = {k: v[1] for k, v in stats.items() if v[1] > 0}
    print(f"# queries with spill: {spilled or 'none'}")


if __name__ == "__main__":
    main()
