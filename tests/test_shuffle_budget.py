"""Shuffle/memory budget ratchet (SURVEY §8f item 4, extended to the FULL
bench headline in round 7 per VERDICT r6 task 4): pinned per-query shuffle
AND peak-execution-memory baselines for every bench.py HEADLINE query,
measured from executed-plan SQLMetrics at sf0.01. PLAN_AUDIT.md records
these volumes descriptively; this test makes them a GATE — an edit that
doubles a family's shuffle volume (a dropped broadcast, a lost partial
aggregate, a join that started fanning out) or its memory reservation (a
sort/aggregate that started buffering data out of proportion to its
slice) fails here instead of drifting the bench.

Ceiling derivation (ADVICE r6): `max(measured × MARGIN, FLOOR)` from the
checked-in MEASURED baseline — ONE margin constant, not per-query
hand-tweaked ceilings. MARGIN is 2.0 because a real shape regression is
≥2× while partition-count/compression/Spark-version noise stays well
under it. Re-calibrate by re-running `python scripts/measure_shuffle.py`
and pasting its output — never by nudging a single entry (a plan-level
justification goes in the commit message either way).

Peak-memory semantics (round-7 finding): the `peakMemory` SQLMetric SUMS
across tasks, so a 32-task sort stage reporting 16.2 MiB/task reads as
~519 MiB (d106) — the number below is a per-NODE total, not a per-task
peak. Fixed per-task page reservations (sorter/aggregate hash map,
~16 MiB each under this session's memory config) dominate every measured
value; data-dependent growth on top of that is exactly what the ×2
margin catches. Spill must stay ZERO everywhere — at sf0.01 any spill
means a task holds data wildly out of proportion to its slice.
"""

from __future__ import annotations

from pyspark_ml_features_spark.plans.metrics import runtime_metrics
from pyspark_ml_features_spark.registry import all_queries
from tests.conftest import SF_DIR

# Measured (total shuffle_MiB, peak-memory-metric MiB) at sf0.01
# (2026-08-15, round 7, via scripts/measure_shuffle.py), including
# exchanges that execute inside a localCheckpoint (invisible on the
# returned DataFrame's plan — probe_checkpoint hands the pre-truncation
# DataFrame to the capture so its executed SQLMetrics are readable;
# round-6 review: d106's dominant range-repartition shuffle was missed
# by the visible plan).
MEASURED = {  # query: (shuffle_MiB, peak_mem_MiB)
    "d4_pricing_summary": (0.00, 16.2),
    "d1_broadcast_join_revenue": (0.00, 16.2),
    "d2_join_chain_region_sales": (0.00, 16.2),
    "b6_robust_scaling": (0.00, 0.0),
    "d10_topk_orders_per_priority": (0.00, 16.5),
    "d11_global_topn": (0.00, 0.0),
    "e1_exact_dedup": (0.09, 16.2),
    "e4_knn_cosine": (0.23, 514.0),
    "e8_tfidf_topterms": (0.37, 16.5),
    "e9_sessionize": (0.24, 16.5),
    "e10_tumbling_windows": (0.36, 16.5),
    "e11_robust_scale_array": (0.42, 0.0),
    "t4_fingerprint": (0.00, 0.0),
    "t5_simhash": (0.03, 16.2),
    "e14_asof_attribution": (0.08, 16.1),
    "d25_sql_subqueries": (0.00, 0.0),
    "e5_embedding_normalize": (0.00, 0.0),
    "d21_apply_in_pandas_minmax": (0.92, 18.0),
    "d20_pandas_udf_revenue": (0.00, 0.0),
    "d36_tpch_q3_shipping_priority": (0.03, 16.2),
    "d43_tpch_q5_local_supplier_volume": (0.00, 16.2),
    "d45_tpch_q7_volume_shipping": (0.05, 16.2),
    "d47_tpch_q18_large_orders": (0.12, 16.5),
    "d48_tpch_q21_waiting_supplier": (0.57, 17.0),
    "d37_tpch_q10_returned_items": (0.01, 16.2),
    "e2d_simhash64_banded": (0.09, 16.2),  # r14: fan_out reverted — the
    # 32-task page sum is gone; re-pinned DOWN so the ratchet regains
    # sensitivity (ADVICE r13 on the ~1 GiB ceilings)
    "e31_line_dedup": (0.34, 520.0),
    "e25_corpus_curation": (0.00, 0.0),
    "d49_interpolate_gaps": (0.09, 16.2),
    "d30b_moment_stats_decimal": (0.00, 16.2),
    "e33_minhash_banded_exact": (0.09, 520.0),
    "e34_quality_dedup": (0.09, 16.1),
    "e36_fingerprint_dedup": (0.02, 16.2),
    "e4e_int8_knn": (0.23, 514.0),
    "d59_map_in_arrow": (0.00, 16.2),
    "d61_tpch_q13": (0.02, 16.2),
    "d62_tpch_q15": (0.01, 16.2),
    "d63_tpch_q17": (0.03, 16.2),
    "d64_tpch_q9": (0.01, 16.2),
    "d67_session_window_batch": (0.26, 16.5),
    "e38_rollup_merge_upsert": (0.17, 16.2),
    "d79_asof_nearest": (0.00, 16.1),
    "d86_tpch_q12": (0.00, 16.2),
    "d89_skew_salted_agg": (0.41, 16.5),
    "d91_equidepth_histogram": (0.13, 16.2),
    "d95_interval_overlap_join": (0.03, 16.2),
    "d98_asof_backward": (0.13, 16.2),
    "e51_greedy_packing": (0.01, 16.1),
    "e52_bloom_decontaminate": (0.02, 16.2),
    # r14 re-pins (2026-08-18, via scripts/measure_shuffle.py) for the
    # two single-shuffle rewrites: d106's rank-mean window shuffles full
    # rows where the old groupBy(rk) partial-agg + BROADCAST join-back
    # shuffled partials only at THIS scale (at 100 TB the join-back side
    # cannot broadcast and pays a second full exchange — the plan now has
    # 2 exchanges instead of 3 and one lineage instead of two); e69's
    # dup-gram window shuffles (gram, doc_id, pos) rows without the old
    # countDistinct partial-agg compression but drops the join-back
    # exchange AND the 456 MiB 32-task agg page sum (peak 456 -> 17).
    "d106_quantile_normalize": (5.09, 518.9),
    "e69_dup_span_report": (0.70, 17.0),
    "e71_image_resize": (0.00, 0.0),
    "d114_ab_welch_ttest": (0.00, 0.0),
    "d118_count_min_sketch": (0.04, 16.2),
    "e80_boilerplate_ngrams": (0.83, 17.0),
    "d122_blocked_linkage": (0.00, 0.0),
    "t18_char_ngram_langid": (0.55, 520.0),
    "e90_chunk_dedup_stats": (0.10, 16.2),
    "e5b_dimension_minmax_scale": (0.00, 16.2),
    "e95_chunk_stitch_roundtrip": (0.24, 0.0),
    # r13-opt recalibration (2026-08-18, via scripts/measure_shuffle.py):
    # the nine queries above whose unsplittable-scan map stages gained a
    # fan_out exchange (functions/skew.py) re-measured — the added
    # shuffle is the narrow projected input (<= 0.55 MiB at sf0.01) and
    # the peak jump to ~520 MiB is the documented SUMMED fixed ~16 MiB
    # per-task page over 32 tasks (the d106 semantics above), not
    # data-proportional growth; spill stays zero everywhere.
    # r10 headline joiners (2026-08-16, via scripts/measure_shuffle.py)
    # re-measured r10 after pointer jumping (fewer CC rounds outweigh
    # the per-round self-joins: 0.10 -> 0.08 MiB)
    "e103_image_neardup_clusters": (0.15, 16.2),
    "e104_dedup_pack_stitch_roundtrip": (0.57, 16.1),
    "e105_vocab_encode_decode_roundtrip": (0.31, 16.2),
}

#: single headroom constant over the measured baselines (ADVICE r6)
MARGIN = 2.0
#: MiB floor so a measured-zero query tolerates bookkeeping exchanges
SHUFFLE_FLOOR_MIB = 0.05
#: MiB floor so a measured-zero query tolerates one fixed page
#: reservation appearing (one ~16 MiB sorter/agg page under this config)
PEAK_FLOOR_MIB = 48.0


def test_budget_covers_entire_bench_headline():
    """VERDICT r6 task 4's "done" criterion: a query added to bench.py's
    HEADLINE without measured baselines fails here — run
    `python scripts/measure_shuffle.py <name>` and pin it."""
    from bench import HEADLINE

    missing = [n for n in HEADLINE if n not in MEASURED]
    assert not missing, (
        f"headline queries without pinned budget baselines: {missing}")


def test_shuffle_volumes_within_pinned_budgets(spark):
    if not SF_DIR.endswith("sf0.01"):
        import pytest

        pytest.skip("budgets are calibrated at sf0.01")
    from pyspark_ml_features_spark.plans.audit import (
        capture_checkpoint_plans,
    )

    qs = all_queries()
    violations = []
    for name, (m_shuffle, m_peak) in MEASURED.items():
        shuffle_ceiling = max(m_shuffle * MARGIN, SHUFFLE_FLOOR_MIB)
        peak_ceiling = max(m_peak * MARGIN, PEAK_FLOOR_MIB)
        with capture_checkpoint_plans() as captured:
            df = qs[name].fn(spark, SF_DIR)
            df.collect()
        rows = [runtime_metrics(df).row()] + [
            runtime_metrics(c["df"]).row() for c in captured
            if "df" in c]  # probe_stream_query entries carry no df
        shuffle = round(sum(r["shuffle_MiB"] for r in rows), 2)
        spill = sum(r["spill_MiB"] for r in rows)
        peak = max(r["peak_task_MiB"] for r in rows)
        if shuffle > shuffle_ceiling:
            violations.append(
                f"{name}: shuffle {shuffle} MiB (incl. checkpointed "
                f"stages) > budget {shuffle_ceiling} MiB (measured "
                f"{m_shuffle} × {MARGIN}) — a join/agg shape regressed")
        if spill > 0:
            violations.append(f"{name}: spilled {spill} MiB at "
                              f"sf0.01 — a task is holding far too much")
        if peak > peak_ceiling:
            violations.append(
                f"{name}: peak memory metric {peak} MiB > budget "
                f"{peak_ceiling} (measured {m_peak} × {MARGIN}) — an "
                f"operator started buffering out of proportion")
    assert not violations, "\n".join(violations)
