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
    ml,
    multimodal,
    packing,
    python_udfs,
    relational,
    relational2,
    scaling,
    sessionize,
    similarity,
    sketches,
    textops,
)
from pyspark_ml_features_spark.streaming import events, stateful  # noqa: F401

# Round-3 grading window (the driver grades the first 50 registered queries).
# Composition (VERDICT r2 task 1): every oracle query that is locally
# hash-verified (drive_contract.py) but has never had a green driver
# CORRECTNESS row across rounds 1-2 (34 queries), the two oracles new this
# round (64-bit banded simhash, decimal-exact moment stats), then the 14
# rows-only queries that have never even RUN under the driver (approx
# sketches, seeded sampling, streaming twins). Deferred: all 82 queries
# already driver-green cumulatively, plus rows-only queries that ran clean
# in r1/r2 — re-grading them wastes slots.
DRIVER_WINDOW = [
    # -- oracle queries never graded by the driver (r1 and r2 windows full)
    "d33_unpivot_measures",
    "d34_recursive_installments",
    "d35_profile_orders",
    "d36_tpch_q3_shipping_priority",
    "d37_tpch_q10_returned_items",
    "d39_heavy_hitters",
    "d40_salted_skew_join",
    "d41_corr_single_pass",
    "d42_funnel_stages",
    "d43_tpch_q5_local_supplier_volume",
    "d44_sequence_pattern",
    "d45_tpch_q7_volume_shipping",
    "d47_tpch_q18_large_orders",
    "d48_tpch_q21_waiting_supplier",
    "d49_interpolate_gaps",
    "d7c_grouping_sets",
    "d17b_from_json",
    "d17c_variant_json",
    "a13_python_datasource",
    "e13b_image_header_parse",
    "e22_source_mix",
    "e23_chunk_documents",
    "e24_tokenize_to_ids",
    "e25_corpus_curation",
    "e26_bigram_lm",
    "e27_decontaminate",
    "e28_session_funnel",
    "e29_audio_features",
    "e30_video_frame_sample",
    "e31_line_dedup",
    "e32_incremental_near_dedup",
    "t7_repetition_ratio",
    "t8_pii_redact",
    "t9_lm_quality",
    # -- new oracles this round
    "e2d_simhash64_banded",
    "d30b_moment_stats_decimal",
    "e33_minhash_banded_exact",
    "a14_partitioned_pruning",
    # -- rows-only queries that have never run under the driver
    # (d30_moment_stats and e11b stay deferred: d30's semantics are carried
    # by the exact decimal twin d30b, e11b's by its exact twin e11 (green
    # r1) — an oracle row is a strictly stronger signal than a rows-only
    # run, so the new oracles take those slots)
    "d6_approx_count_distinct",
    "d19_sampling",
    "e4d_ivf_knn",
    "d38_hll_distinct_rollup",
    # d46_kmv deferred: same approx-sketch family as d38/d6 (weak rows-only
    # signal); d50's bucketed-join oracle row is strictly stronger
    "d50_bucketed_join",
    "t10_perplexity",
    "s1_streaming_tumbling_windows",
    "s2_streaming_sessions",
    "s3_streaming_stateful_totals",
    "s4_streaming_dedup",
    "s5_streaming_attribution_join",
    "s7_python_source_stream",
]
# Round-4 rotation note: fill the next window from DEFERRED_ORACLES in
# tests/test_registry.py (24 locally hash-verified oracles: d51-d66,
# d30b/d31b twins' remainders, e34-e37, e4e, a15/a16, d58-d60) — every
# one has passed drive_contract.py and the sf0.1 parity sweep but has
# never had a driver CORRECTNESS row. The registry tests enforce that no
# already-green oracle query wastes a graded slot.

registry.reorder(DRIVER_WINDOW)
