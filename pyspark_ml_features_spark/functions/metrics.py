"""In-flight data-quality metrics via ``DataFrame.observe`` — counters
computed WHILE a query runs, not as extra jobs.

At 100 TB a separate validation pass re-reads the corpus; ``observe``
piggybacks named aggregates on the action already executing (the metrics
ride the same scan), which is how production pipelines assert row counts,
null rates, and domain bounds without doubling I/O. Streaming queries
surface the same metrics per micro-batch via ``QueryProgress.observedMetrics``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Observation


def observed_quality(df: DataFrame, *cols: str,
                     extra: dict[str, Column] | None = None
                     ) -> tuple[DataFrame, Observation]:
    """Attach an Observation tracking row count and per-column null counts
    (plus any ``extra`` named aggregates). Returns (df, observation);
    ``observation.get`` blocks until the first action on ``df`` completes.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"n_null_{c}"))
    for name, col in (extra or {}).items():
        aggs.append(col.alias(name))
    obs = Observation()
    return df.observe(obs, *aggs), obs


def assert_quality(metrics: dict, *, min_rows: int = 1,
                   max_null_fraction: float = 0.0) -> None:
    """Gate a pipeline on observed metrics: at least ``min_rows`` rows and
    per-column null fraction ≤ ``max_null_fraction``. Raises ValueError with
    every violation listed (don't fail one check at a time at 2 am)."""
    problems = []
    n = metrics.get("n_rows", 0)
    if n < min_rows:
        problems.append(f"n_rows={n} < min_rows={min_rows}")
    for k, v in metrics.items():
        if k.startswith("n_null_") and n and v / n > max_null_fraction:
            problems.append(
                f"{k}={v} ({v / n:.2%} of {n} rows) exceeds "
                f"max_null_fraction={max_null_fraction}")
    if problems:
        raise ValueError("quality gate failed: " + "; ".join(problems))
