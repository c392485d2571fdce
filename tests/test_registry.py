"""Registry ordering contract: the driver grades a bounded prefix (50 in
round 1) of the declared queries in registration order, so the prefix must
be exactly the curated DRIVER_WINDOW — a silent reordering (e.g. a new
module import shifting registrations) would waste graded slots."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark_ml_features_spark import queries, registry


def test_driver_window_is_registry_prefix():
    names = list(registry.all_queries())
    assert names[:len(queries.DRIVER_WINDOW)] == queries.DRIVER_WINDOW


def test_driver_window_is_50():
    assert len(queries.DRIVER_WINDOW) == 50


# Oracle queries deliberately left outside the graded window, with why.
# The round-4 rotation cleared the pre-existing backlog; entries below
# landed AFTER the r4 window filled (locally hash-verified by
# drive_contract.py and the sf0.1 parity sweep; rotate into the r5
# window).
DEFERRED_ORACLES: set[str] = {
    "d80_group_by_all",
    "d81_forward_fill",
    "d82_regexp_extract_all",
    "d83_pandas_udaf",
    "d84_array_set_algebra",
    "t13_zipf_rank_table",
    "e43_tfidf_cosine_pairs",
    "a19_dynamic_partition_overwrite",
    "d85_explode_outer",
    "e44_sha_content_dedup",
    "d86_tpch_q12",
    "d87_null_safe_join",
    "d88_union_by_name",
    "d89_skew_salted_agg",
    "d90_hash_sample_agg",
    "e45_dup_clusters_cc",
    "d91_equidepth_histogram",
    "e46_lsh_quality_report",
    "e47_incremental_cc",
    "d92_cube_grouping_id",
    "d93_cumulative_distinct_users",
    "e48_centroid_outliers",
    "a20_temp_views_sql",
    "d94_multiset_ops",
    "e49_signature_store_pairs",
    "e50_threshold_sweep",
    "d95_interval_overlap_join",
    "d96_pivot_daily_mix",
    "d97_ohlc_bars",
    "d98_asof_backward",
    "e51_greedy_packing",
    "e52_bloom_decontaminate",
    "d99_stratified_quota_sample",
    "d100_changelog_compact",
    "e53_oov_rate",
    "d101_snapshot_diff",
    "e54_dataset_card",
    "a21_orc_sink_roundtrip",
    "e55_ngram_decontaminate",
    "d102_window_distribution",
    "d103_map_hof_pipeline",
    "d104_nested_json_inline",
    "d105_decimal_ledger",
    "d106_quantile_normalize",
    "e56_khop_reach",
    "e57_lang_mix_rebalance",
    "t14_lexical_diversity",
    "d107_rolling_median",
    "d108_collation_distinct",
    "e58_semantic_dup_clusters",
    "t15_readability",
    "a22_python_sink_roundtrip",
    "d109_udtf_table_arg",
    "e59_triangle_count",
    "e60_pagerank",
    "d110_parameterized_sql",
    "a23_csv_malformed_tolerant",
    "t16_gopher_rules",
    "e61_qgram_fuzzy_join",
    "e62_split_leakage_report",
    "e63_sorted_neighborhood",
    "e64_multipass_sorted_neighborhood",
    "a24_ctas_insert_roundtrip",
    "e65_mixture_epoch_expansion",
    "e66_cluster_split_no_leakage",
    "e67_cluster_minhash_signatures",
    "d111_rollup_share_of_parent",
    "e68_cluster_pair_similarity",
    "d112_loo_target_encoding",
    "a25_xml_sink_roundtrip",
    "e69_dup_span_report",
    "d113_sql_udf",
    "e70_token_budget_selection",
    "e71_image_resize",
    "a26_text_source_roundtrip",
    "e72_audio_resample",
    "d114_ab_welch_ttest",
    "d115_ewma_decay",
    "e74_transition_matrix",
    "d116_chi_square_independence",
    "d117_constraint_audit",
    "d118_count_min_sketch",
    "d119_k_anonymity",
    "e75_feature_hashing",
    "a27_multipath_read",
    "d120_rfm_features",
}


def _driver_green() -> set[str]:
    """Queries with a green hash-match row in ANY past driver round."""
    green = set()
    for path in sorted(Path(__file__).parent.parent.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(path.read_text()).items():
            if row.get("err") is None and row.get("hash_match"):
                green.add(name)
    return green


def test_deferred_queries_are_driver_green_or_rows_only():
    """Everything pushed past the graded window must be already
    driver-verified in a past round, a rows-only query (weak check only),
    or explicitly deferred with a reason above."""
    green = _driver_green()
    qs = registry.all_queries()
    deferred = list(qs)[len(queries.DRIVER_WINDOW):]
    for name in deferred:
        assert (name in green or qs[name].oracle is None
                or name in DEFERRED_ORACLES), (
            f"{name} is outside the graded window but has an unverified "
            f"oracle — promote it into DRIVER_WINDOW")


def test_window_has_no_already_green_oracle_queries():
    """Graded slots are scarce: an oracle query that is already green in a
    past round must not occupy a graded slot (rows-only queries are exempt
    — their weak rows-ran check is re-run each round for free). Exception:
    once EVERY oracle query is green (saturation), re-grading is the only
    thing left. _compute_window enforces this automatically the moment new
    CORRECTNESS grades land; this test is the tripwire that it did."""
    green = _driver_green()
    qs = registry.all_queries()
    ungraded_exist = any(q.oracle is not None and n not in green
                         for n, q in qs.items())
    if not ungraded_exist:
        return
    for name in queries.DRIVER_WINDOW:
        if qs[name].oracle is not None:
            assert name not in green, (
                f"{name} already has a green driver row — rotate it out")


def test_auto_rotation_keeps_manual_window_while_ungraded():
    """Before the round-4 grades land, the promised window must be the
    curated one verbatim (mid-round composition stability)."""
    qs = registry.all_queries()
    manual_oracles = {n for n in queries.MANUAL_WINDOW_R4
                      if qs[n].oracle is not None}
    green = _driver_green()
    if not (green & manual_oracles):
        assert queries.DRIVER_WINDOW == queries.MANUAL_WINDOW_R4


def test_auto_rotation_recomposes_once_grades_land():
    """Simulate CORRECTNESS_r04 grading the whole manual window green: the
    next window must be the ungraded oracle backlog (PRIORITY_BACKLOG
    promoted to the head, then registration order), retrying nothing green
    and wasting no slot. `seen` covers every rows-only query so no fresh
    slots are reserved in this simulation.

    Simulation hygiene (VERDICT r4 defect 1): the simulated green set is
    built by UNION with the real driver grades, never by subtracting from
    them, so real grades landing in future rounds cannot flip the
    scenario."""
    qs = registry.all_queries()
    green = _driver_green() | set(queries.MANUAL_WINDOW_R4)
    seen = green | {n for n, q in qs.items() if q.oracle is None}
    window = queries._compute_window(green, seen)
    assert len(window) == 50
    assert all(qs[n].oracle is not None and n not in green for n in window)
    backlog = [n for n, q in qs.items()
               if q.oracle is not None and n not in green]
    priority = [n for n in queries.PRIORITY_BACKLOG if n in backlog]
    expected = (priority + [n for n in backlog if n not in priority])[:50]
    assert window == expected


def test_auto_rotation_retries_driver_failures():
    """A window entry the driver errored on (no hash-green row) must stay
    in the recomposed window — failures are retried, not dropped.

    The simulated failure is drawn from the CURRENT recomposed window and
    removed from a green set built over real-green ∪ that window, so the
    scenario stays valid no matter which real grades land later (the r4
    version subtracted from a frozen manual list and went red the moment
    CORRECTNESS_r04 arrived)."""
    qs = registry.all_queries()
    green, seen = queries._driver_grades()
    window_now = queries._compute_window(green, seen)
    oracle_entries = [n for n in window_now if qs[n].oracle is not None]
    if not oracle_entries:
        return  # saturated registry: nothing left to retry
    failed = oracle_entries[0]
    sim_green = (green | set(window_now)) - {failed}
    sim_seen = seen | set(window_now)
    window_next = queries._compute_window(sim_green, sim_seen)
    assert failed in window_next


def test_auto_rotation_survives_future_grades_file(tmp_path, monkeypatch):
    """Drop a hypothetical CORRECTNESS_r05 (grading the whole current
    window) into a simulated repo root: _driver_grades must pick it up via
    SPARK_GRAFT_REPO_ROOT and the recomposed window must again waste no
    slot — proof the suite stays green when the next round's grades land."""
    import shutil

    repo = Path(__file__).parent.parent
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        shutil.copy(p, tmp_path / p.name)
    qs = registry.all_queries()
    window_now = queries._compute_window(*queries._driver_grades())
    fake = {n: ({"rows_match": True, "schema_match": True,
                 "hash_match": True, "err": None}
                if qs[n].oracle is not None else
                {"rows_match": None, "schema_match": None,
                 "hash_match": None, "err": "no_oracle"})
            for n in window_now}
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps(fake))
    monkeypatch.setenv("SPARK_GRAFT_REPO_ROOT", str(tmp_path))
    green, seen = queries._driver_grades()
    oracle_graded = {n for n in window_now if qs[n].oracle is not None}
    assert oracle_graded <= green
    window_next = queries._compute_window(green, seen)
    assert len(window_next) == 50
    ungraded = [n for n, q in qs.items()
                if q.oracle is not None and n not in green]
    if len(ungraded) >= 50:
        assert all(n in ungraded for n in window_next
                   if qs[n].oracle is not None)
    else:
        assert set(ungraded) <= set(window_next)


def test_auto_rotation_pads_with_rows_only_at_saturation():
    """When every oracle query is green, the window fills with rows-only
    re-runs (free weak checks) and then green oracles — never short."""
    qs = registry.all_queries()
    green = {n for n, q in qs.items() if q.oracle is not None}
    seen = set(qs)
    window = queries._compute_window(green, seen)
    assert len(window) == 50
    rows_only = [n for n in window if qs[n].oracle is None]
    assert rows_only, "saturated window should lead with rows-only re-runs"
