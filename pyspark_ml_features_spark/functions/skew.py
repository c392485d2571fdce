"""Skew mitigation: salted joins (the manual fallback when AQE's skew-join
split isn't enough — e.g. one key holding >50% of a 100 TB fact table),
plus :func:`fan_out` for the degenerate skew of an unsplittable input
(all rows in one scan task).

Mechanism: append a salt in [0, n) to the skewed (large) side, replicate the
small side once per salt value, join on (key, salt). The hot key's rows
spread across n tasks; result is identical to the plain join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SALT_COL = "__salt"


def fan_out(df: DataFrame, *key_cols: str,
            min_partitions: int | None = None) -> DataFrame:
    """Spread a CPU-bound stage across all cores when the upstream scan
    cannot split — the 'input skew' fix of the optimization playbook
    (one unsplittable input → one task, so per-row-expensive work
    serializes on a single core while the rest of the machine idles).

    A single-row-group parquet file is unsplittable in exactly the gzip
    sense: Spark assigns each row group to the split holding its
    midpoint, so extra splits read zero rows. The driver tables ship as
    one single-row-group file each, which pins every pre-shuffle map
    stage to ONE task regardless of core count.

    Scale posture: ``min_partitions`` defaults to the scheduler's
    ``defaultParallelism`` — derived from the runtime, never a constant
    — and the exchange is a NO-OP whenever the input already has that
    many partitions, which a 100 TB scan (thousands of splits) always
    does. The repartition is therefore only ever paid on unsplittable
    or tiny inputs feeding expensive compute, where one exchange of the
    (small) input is repaid ~core-count-fold by the parallel stage
    above it.

    Pass ``key_cols`` (a high-cardinality key — ≥20× more distinct
    values than partitions, per the synthetic-key rule) to hash-
    partition instead of round-robin: a deterministic hash key is
    retry-safe without the local sort round-robin pays
    (``spark.sql.execution.sortBeforeRepartition``, SPARK-23207), so
    the exchange adds no sorter page reservation. Results never depend
    on partitioning for the value-determined operators this engine
    registers.

    Call this DIRECTLY on a scan (or a scan + narrow projection), not
    mid-lineage: the ``df.rdd.getNumPartitions()`` gate forces full
    physical planning of the upstream frame on every call and reflects
    plan-time (pre-AQE) partitioning — cheap and correct for a raw
    scan, expensive and potentially misleading after a shuffle
    (ADVICE r13).
    """
    sc = df.sparkSession.sparkContext
    n = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    if key_cols:
        return df.repartition(n, *[F.col(c) for c in key_cols])
    return df.repartition(n)


def salted_join(large: DataFrame, small: DataFrame, on: str,
                n_salts: int = 8, how: str = "inner",
                seed: int = 42) -> DataFrame:
    """Join ``large ⋈ small`` on column ``on`` with salting.

    The salt is random (seeded) — correctness never depends on which salt a
    row gets, only that each (key, salt) pair meets its replicated partner.

    Only ``inner`` and ``left`` are equivalent to the plain join: replicating
    the small side n_salts times would emit each unmatched small-side row
    once per salt under right/full outer semantics, and semi/anti flip
    meaning entirely.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (got {how!r}): the "
            f"replicated small side breaks right/full/semi/anti semantics")
    salted_large = large.withColumn(
        SALT_COL, F.floor(F.rand(seed) * n_salts).cast("int"))
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT_COL)
    replicated_small = small.select("*", salts)
    out = salted_large.join(replicated_small, [on, SALT_COL], how)
    return out.drop(SALT_COL)
