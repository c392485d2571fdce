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
import pyspark.sql.functions as F
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
    # emit the RAW running total — rounding belongs to the consumer
    # (s19 applies F.round, the registry convention; Python's round()
    # is ties-to-even while Spark/DuckDB round half-away, so rounding
    # here would put a divergent rounding rule inside a graded path —
    # r11 review finding)
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [total]})


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


@register(
    "s19_streaming_stateful_totals_exact",
    oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS total_value
FROM events
GROUP BY user_id
""",
    tags=("north-star", "streaming", "stateful", "integration"),
)
def s19_streaming_stateful_totals_exact(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """Oracle-graded CUSTOM STATEFUL operator — s3's shape (per-user
    running totals folded in applyInPandasWithState, update-mode drain)
    hashed bit-exact against the batch groupBy SQL. This completes the
    oracle-graded streaming classes: aggregate (s14), stream-static
    join (s15), dedup relay (s16), bounded-key rollup (s17), incremental
    merge (s18), and now the custom state machine — the path SURVEY §2
    names for operators Spark's built-in windows can't express.

    What makes update mode gradeable (it emits one row per TOUCHED user
    per micro-batch, so the raw drained sink is batching-DEPENDENT):
    the final per-user select takes max(struct(n_events, total_value)).
    n_events strictly increases across a user's emissions (a user is
    only emitted when the batch contained its rows), so the max IS the
    final state — the drained result becomes a pure function of the
    input set regardless of how AvailableNow splits files into batches.
    This closes, by construction, the same fragility class ADVICE r10
    flagged on s16's original union form (exactness resting on a
    single-file/one-micro-batch staging assumption). Counts are exact;
    the per-user double fold is emitted RAW and rounded HERE with
    F.round (the s14 convention — Spark and DuckDB round half-away
    while Python's round() is ties-to-even, so rounding must stay
    engine-side; pandas' pairwise batch sums and DuckDB's sequential
    sum agree far below the 6-dp grain). s3 stays rows-only with its
    pytest batch-equality check.

    100 TB/day: state is 16 bytes/user partitioned by the group key —
    each user's state lives on exactly one executor (stateful.py module
    docstring's scaling argument)."""
    from pyspark_ml_features_spark.streaming.events import (
        events_stream,
        run_stream_to_memory,
    )

    drained = run_stream_to_memory(
        streaming_user_totals(events_stream(spark, sf_dir)),
        mode="update")
    return (drained.groupBy("user_id")
            .agg(F.max(F.struct("n_events", "total_value"))
                 .alias("fin"))
            .select("user_id", "fin.n_events",
                    F.round(F.col("fin.total_value"), 6)
                    .alias("total_value")))


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


def transform_with_state_available() -> bool:
    """transformWithStateInPandas talks to the JVM state server over a
    protobuf protocol; without the google.protobuf package the driver-side
    Python worker crashes at init. Gate on the import (the container this
    engine is validated in ships without protobuf, so the s7 twin registers
    only where the dependency exists — pip install protobuf enables it)."""
    try:
        import google.protobuf  # noqa: F401
        return True
    except ImportError:
        return False


def make_user_totals_processor():
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class UserTotalsProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            # raw total, like _update_user_totals — consumers round
            # engine-side (Python round() is ties-to-even)
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "total_value": [total]})

        def close(self) -> None:
            pass

    return UserTotalsProcessor()


def streaming_user_totals_tws(events: DataFrame) -> DataFrame:
    """s3's running totals on the transformWithState API (Spark 4): typed
    per-key state handles (value/list/map state, timers, TTL) instead of a
    single state tuple — the forward-looking custom-operator surface.
    Requires the RocksDB state store provider."""
    return (events
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=make_user_totals_processor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None"))


def s7_transform_with_state_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals via transformWithStateInPandas — the Spark 4
    arbitrary-state API (typed state handles + timers + TTL; RocksDB state
    store). Same semantics as s3; equality with the batch groupBy is
    asserted in tests/test_streaming.py. Rows-only for the driver."""
    from pyspark_ml_features_spark.streaming.events import (
        events_stream,
        run_stream_to_memory,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        stream = streaming_user_totals_tws(events_stream(spark, sf_dir))
        return run_stream_to_memory(stream, mode="update")
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)
        else:
            # Was unset before — restore that, or RocksDB silently leaks
            # into every later streaming query in this session.
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


if transform_with_state_available():  # pragma: no cover — env-dependent
    register("s7_transform_with_state_totals",
             tags=("north-star", "streaming", "stateful"))(
        s7_transform_with_state_totals)
