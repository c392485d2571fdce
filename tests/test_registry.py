"""Registry ordering contract: the driver grades a bounded prefix (50 in
round 1) of the declared queries in registration order, so the prefix must
be exactly the curated DRIVER_WINDOW — a silent reordering (e.g. a new
module import shifting registrations) would waste graded slots."""

from __future__ import annotations

from pyspark_ml_features_spark import queries, registry


def test_driver_window_is_registry_prefix():
    names = list(registry.all_queries())
    assert names[:len(queries.DRIVER_WINDOW)] == queries.DRIVER_WINDOW


def test_driver_window_is_50():
    assert len(queries.DRIVER_WINDOW) == 50


# Oracle queries deliberately left outside the graded window, with why.
# Rotate these in next round if slots free up.
DEFERRED_ORACLES = {
    # §2-D17 already carries a graded oracle row via d17_json_functions;
    # the window is full and every other slot covers an unverified operator.
    "d17b_from_json",
    # New this round (added after the round-2 window was frozen at 50);
    # locally hash-verified by drive_contract.py, rotate in next round.
    "e13b_image_header_parse",
    "t7_repetition_ratio",
    "t8_pii_redact",
    "e22_source_mix",
    "e23_chunk_documents",
    "e24_tokenize_to_ids",
    "d33_unpivot_measures",
    "d34_recursive_installments",
    "d35_profile_orders",
    "d7c_grouping_sets",
    "d17c_variant_json",
    "a13_python_datasource",
    "e25_corpus_curation",
    "e26_bigram_lm",
    "d36_tpch_q3_shipping_priority",
    "d37_tpch_q10_returned_items",
    "d39_heavy_hitters",
    "e27_decontaminate",
    "t9_lm_quality",
    "d40_salted_skew_join",
    "d41_corr_single_pass",
    "d42_funnel_stages",
    "d43_tpch_q5_local_supplier_volume",
    "d44_sequence_pattern",
    "d45_tpch_q7_volume_shipping",
    "e28_session_funnel",
    "d47_tpch_q18_large_orders",
    "e29_audio_features",
    "e30_video_frame_sample",
    "d48_tpch_q21_waiting_supplier",
    "e31_line_dedup",
    "e32_incremental_near_dedup",
}


def test_deferred_queries_are_round1_green_or_rows_only():
    """Everything pushed past the window must be already driver-verified in
    round 1, a rows-only query (weak check only), or explicitly deferred."""
    import json
    from pathlib import Path

    r1 = json.loads(
        (Path(__file__).parent.parent / "CORRECTNESS_r01.json").read_text())
    qs = registry.all_queries()
    deferred = list(qs)[len(queries.DRIVER_WINDOW):]
    for name in deferred:
        passed_r1 = name in r1 and r1[name].get("err") in (None, "no_oracle")
        assert (passed_r1 or qs[name].oracle is None
                or name in DEFERRED_ORACLES), (
            f"{name} is outside the graded window but has an unverified "
            f"oracle — promote it into DRIVER_WINDOW")
