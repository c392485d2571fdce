"""Assemble the engine's declared-query registry.

Importing this module imports every operator module for its registration
side effects. ``registry.all_queries()`` triggers this import lazily.
"""

from pyspark_ml_features_spark.operators import (  # noqa: F401
    features,
    relational,
    scaling,
)
