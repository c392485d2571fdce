#!/usr/bin/env python
"""Time individual queries with the bench methodology (noop sink,
warmup, min-of-N) without running the whole headline list.

Usage: python scripts/time_query.py q1 [q2 ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), TIME_QUERY_RUNS (default 3).
Prints one JSON line {"queries": {name: best_sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_ml_features_spark import registry  # noqa: E402
from pyspark_ml_features_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("TIME_QUERY_RUNS", "3"))
    names = sys.argv[1:]
    spark = get_spark(app_name="spark-graft-time-query")
    queries = registry.all_queries()
    queries["d11_global_topn"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time_query:{name}")
        best = float("inf")
        for _ in range(runs):
            start = time.perf_counter()
            queries[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
