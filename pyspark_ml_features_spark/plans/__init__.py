"""Plan introspection and scale auditing."""

from pyspark_ml_features_spark.plans.audit import PlanAudit, assert_scale_safe, audit

__all__ = ["PlanAudit", "audit", "assert_scale_safe"]
