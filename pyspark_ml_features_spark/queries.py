"""Assemble the engine's declared-query registry.

Importing this module imports every operator module for its registration
side effects, then reorders the registry: the driver grades a bounded
prefix (50 entries in round 1) of the declared queries, so the prefix must
carry the queries whose CORRECTNESS rows matter most this round.
"""

from pyspark_ml_features_spark import registry
from pyspark_ml_features_spark.operators import (  # noqa: F401
    advanced_sql,
    array_scaling,
    basic,
    dedup,
    features,
    graph,
    ml,
    multimodal,
    packing,
    python_udfs,
    quality,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    scaling,
    sessionize,
    similarity,
    sketches,
    textops,
)
from pyspark_ml_features_spark.streaming import events, stateful  # noqa: F401

# Round-4 grading window (the driver grades the first 50 registered
# queries). Composition (VERDICT r3 task 1): the 25 locally hash-verified
# oracle queries that landed after the round-3 window filled (the
# DEFERRED_ORACLES backlog — TPC-H Q4/Q6/Q9/Q13/Q14/Q15/Q17/Q19/Q22,
# percentiles/histogram/OLS/try-arithmetic, quality/fingerprint dedup,
# int8 kNN, sink round-trips, SCD2/lateral), the 4 rows-only queries that
# have never run under the driver, then 21 oracle queries NEW this round
# (VERDICT r3 task 3: batch session_window at a second gap, rollup MERGE
# parity, grouped lateral top-k, aggregate/array/interval families, text
# profiling, containment/top-k dedup). With this rotation every declared
# query has a driver CORRECTNESS row across r1-r4. Deferred: the 145
# queries already graded green (or rows-only clean) in r1-r3 —
# re-grading them wastes slots.
DRIVER_WINDOW = [
    # -- oracle queries never graded by the driver (r1-r3 windows full)
    "d51_percentiles_exact",
    "d52_width_bucket_histogram",
    "d53_tpch_q4",
    "d54_tpch_q6",
    "e34_quality_dedup",
    "d31b_regression_exact",
    "d55_tpch_q19",
    "d56_tpch_q22",
    "d57_tpch_q14",
    "e4e_int8_knn",
    "a15_csv_sink_roundtrip",
    "d58_market_share",
    "e35_near_dup_by_source",
    "d59_map_in_arrow",
    "e36_fingerprint_dedup",
    "d60_try_arithmetic",
    "d61_tpch_q13",
    "d62_tpch_q15",
    "d63_tpch_q17",
    "d64_tpch_q9",
    "e37_retention_cohorts",
    "a16_merge_schema",
    "d65_lateral_topk",
    "d66_scd2_history",
    "a17_json_sink_roundtrip",
    # -- rows-only queries that have never run under the driver
    "d30_moment_stats",
    "d46_kmv_setops",
    "e11b_robust_scale_array_approx",
    "s6_streaming_materialized_rollup",
    # -- new oracle queries this round (locally hash-verified)
    "d67_session_window_batch",
    "d68_grouped_topk_lateral",
    "d69_string_agg",
    "d70_bitwise_agg",
    "d71_filtered_agg",
    "d72_posexplode_tokens",
    "d73_sequence_fold",
    "d74_interval_arithmetic",
    "d75_mode_per_group",
    "d76_arg_min_max",
    "d77_robust_mad",
    "d78_inline_lookup_join",
    "d79_asof_nearest",
    "a18_zstd_roundtrip",
    "t11_word_length_profile",
    "t12_charclass_profile",
    "e38_rollup_merge_upsert",
    "e39_overlap_pairs",
    "e40_nearest_doc_topk",
    "e41_bigram_topk_per_lang",
    "e42_dup_cluster_stats",
]
# Round-5 rotation note: if CORRECTNESS_r04 grades this window green, every
# query declared BEFORE this window filled has a driver row. The post-window
# backlog (tests/test_registry.py:DEFERRED_ORACLES, 59 oracle queries
# d80-d110/e43-e61/t13-t16/a19-a23 plus rows-only s8-s11) now EXCEEDS one
# 50-slot window — rotate r5 with the oldest-first 50 and carry the
# remainder (plus any r5-new surface) to r6. All are locally hash-verified
# at sf0.01 AND sf0.1 by drive_contract + the parity sweep.

registry.reorder(DRIVER_WINDOW)
