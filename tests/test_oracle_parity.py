"""Differential tests: every oracle-declared query, Spark vs DuckDB,
at the driver's correctness scale (sf0.01 by default).

This is a local emulation of the driver gate: row count + schema +
order-insensitive bit-exact value comparison.
"""

from __future__ import annotations

import pytest

from pyspark_ml_features_spark import registry
from tests.conftest import SF_DIR, assert_frames_match

ALL = registry.all_queries()
ORACLE_NAMES = sorted(n for n, q in ALL.items() if q.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, q in ALL.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(built, ddb, name):
    q = ALL[name]
    spark_pdf = built(name, SF_DIR)[0].toPandas()
    oracle_pdf = ddb.execute(q.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(built, name):
    """Queries without an oracle must at least run and return a schema."""
    df = built(name, SF_DIR)[0]
    assert df.columns, f"{name}: empty schema"
    df.limit(5).collect()  # must execute without error


def test_entry_smoke(spark):
    from pyspark_ml_features_spark import api

    df = api.entry(spark)
    assert df.count() > 0
