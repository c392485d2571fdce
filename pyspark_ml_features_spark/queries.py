"""Assemble the engine's declared-query registry.

Importing this module imports every operator module for its registration
side effects. ``registry.all_queries()`` triggers this import lazily.
"""

from pyspark_ml_features_spark.operators import (  # noqa: F401
    array_scaling,
    basic,
    dedup,
    features,
    ml,
    multimodal,
    packing,
    python_udfs,
    relational,
    relational2,
    scaling,
    sessionize,
    similarity,
    textops,
)
from pyspark_ml_features_spark.streaming import events, stateful  # noqa: F401
