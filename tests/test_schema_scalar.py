"""Every declared query must emit only scalar output columns.

The driver canonicalizes query output (oracle-checked AND rows-only alike)
with pandas ``sort_values`` over all columns, which raises
``unhashable type: numpy.ndarray`` on Array/Map/Struct cells — round 1 lost
five CORRECTNESS rows to exactly this (VERDICT.md item 1). Flatten arrays to
(id, dim, value) rows (e11/e15/e5 pattern) or element columns (b1/b5/b8).

Schemas don't depend on scale, so this reads the session build cache at
the parity scale (SF_DIR): the oracle-parity sweep already paid for every
build (eager ML fits included) — this check adds only the schema reads
(r14, the suite-wall fix).
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from pyspark_ml_features_spark import registry
from tests.conftest import SF_DIR

ALL = registry.all_queries()


@pytest.mark.parametrize("name", sorted(ALL))
def test_output_schema_is_scalar_only(built, name):
    df, _ = built(name, SF_DIR)
    offenders = [f.name for f in df.schema.fields
                 if isinstance(f.dataType, (ArrayType, MapType, StructType))]
    assert not offenders, (
        f"{name} emits non-scalar columns {offenders} — the driver's pandas "
        f"canonicalizer crashes on these; flatten to scalars (see module doc)")
