"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2 custom-operator path (b): Pandas-UDF-backed state machine).

Demonstrated op: per-user running totals (event count + value sum) — the
shape every custom sessionizer/accumulator follows: group by key, fold Arrow
batches into a small state tuple, emit updates. State is O(1) per key and
partitioned by the group key, so a 1000-executor cluster holds each user's
state exactly once — the scalable pattern for operators Spark's built-in
windows can't express.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from pyspark_ml_features_spark.registry import register

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])
STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def _update_user_totals(key, pdfs: Iterator[pd.DataFrame],
                        state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [round(total, 6)]})


def streaming_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user totals as a stateful stream."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_user_totals,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


@register("s3_streaming_stateful_totals",
          tags=("north-star", "streaming", "stateful"))
def s3_streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator drained with AvailableNow; equality with the
    batch groupBy is asserted in tests/test_streaming.py. Rows-only for the
    driver (stateful streaming isn't SQL-expressible — SURVEY §2 notes the
    weaker check)."""
    from pyspark_ml_features_spark.streaming.events import (
        events_stream,
        run_stream_to_memory,
    )

    stream = streaming_user_totals(events_stream(spark, sf_dir))
    return run_stream_to_memory(stream, mode="update")
