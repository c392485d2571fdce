"""Shuffle-budget ratchet (SURVEY §8f item 4): pinned per-query shuffle
ceilings for the shuffle-bearing headline representatives, measured from
executed-plan SQLMetrics at sf0.01. PLAN_AUDIT.md records these volumes
descriptively; this test makes them a GATE — an edit that doubles a
family's shuffle volume (a dropped broadcast, a lost partial aggregate, a
join that started fanning out) fails here instead of drifting the bench.

Ceilings are measured value × ~1.5 (absorbs partition-count/compression
noise between session configs; a real shape regression is ≥ 2×). Spill
must stay at ZERO everywhere — at sf0.01 any spill means a task holds
data wildly out of proportion to its slice. Re-calibrate a ceiling ONLY
with a plan-level justification in the commit message.
"""

from __future__ import annotations

from pyspark_ml_features_spark.plans.metrics import runtime_metrics
from pyspark_ml_features_spark.registry import all_queries
from tests.conftest import SF_DIR

# query -> TOTAL shuffle_MiB ceiling at sf0.01, including exchanges that
# execute inside a localCheckpoint (invisible on the returned DataFrame's
# plan — probe_checkpoint hands the pre-truncation DataFrame to the
# capture so its executed SQLMetrics are readable; round-6 review: d106's
# dominant range-repartition shuffle was missed by the visible plan).
# Measured 2026-08-15: e1 0.09, e9 0.24, d21 0.92, d48 0.57, e2d 0.09,
# d89 0.41, d91 0.13, d98 0.13, d106 3.22 visible + 2.15 checkpointed,
# e69 0.61, e80 0.59, e51 0.01.
SHUFFLE_CEILINGS_MIB = {
    "e1_exact_dedup": 0.15,
    "e9_sessionize": 0.40,
    "d21_apply_in_pandas_minmax": 1.40,
    "d48_tpch_q21_waiting_supplier": 0.90,
    "e2d_simhash64_banded": 0.15,
    "d89_skew_salted_agg": 0.65,
    "d91_equidepth_histogram": 0.20,
    "d98_asof_backward": 0.20,
    "d106_quantile_normalize": 8.00,
    "e69_dup_span_report": 0.95,
    "e80_boilerplate_ngrams": 0.90,
    "e51_greedy_packing": 0.05,
}

# Per-task peak memory ceiling at sf0.01 — every representative measured
# ≤ 40 MiB (d106's checkpoint); anything approaching the executor slice
# at this scale factor would OOM at sf10.
PEAK_TASK_CEILING_MIB = 80.0


def test_shuffle_volumes_within_pinned_budgets(spark):
    if not SF_DIR.endswith("sf0.01"):
        import pytest

        pytest.skip("budgets are calibrated at sf0.01")
    from pyspark_ml_features_spark.plans.audit import (
        capture_checkpoint_plans,
    )

    qs = all_queries()
    violations = []
    for name, ceiling in SHUFFLE_CEILINGS_MIB.items():
        with capture_checkpoint_plans() as captured:
            df = qs[name].fn(spark, SF_DIR)
            df.collect()
        rows = [runtime_metrics(df).row()] + [
            runtime_metrics(c["df"]).row() for c in captured]
        shuffle = round(sum(r["shuffle_MiB"] for r in rows), 2)
        spill = sum(r["spill_MiB"] for r in rows)
        peak = max(r["peak_task_MiB"] for r in rows)
        if shuffle > ceiling:
            violations.append(
                f"{name}: shuffle {shuffle} MiB (incl. checkpointed "
                f"stages) > budget {ceiling} MiB — a join/agg shape "
                f"regressed")
        if spill > 0:
            violations.append(f"{name}: spilled {spill} MiB at "
                              f"sf0.01 — a task is holding far too much")
        if peak > PEAK_TASK_CEILING_MIB:
            violations.append(
                f"{name}: peak task {peak} MiB > "
                f"{PEAK_TASK_CEILING_MIB} — would not survive a scale-up")
    assert not violations, "\n".join(violations)
