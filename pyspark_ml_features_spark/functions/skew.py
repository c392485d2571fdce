"""Skew mitigation: salted joins (the manual fallback when AQE's skew-join
split isn't enough — e.g. one key holding >50% of a 100 TB fact table).

Mechanism: append a salt in [0, n) to the skewed (large) side, replicate the
small side once per salt value, join on (key, salt). The hot key's rows
spread across n tasks; result is identical to the plain join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SALT_COL = "__salt"


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
