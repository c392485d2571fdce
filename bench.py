#!/usr/bin/env python
"""BENCH harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no driver
transfer). Startup/first-job JIT is amortized with one warmup pass of the
smallest query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_ml_features_spark import registry  # noqa: E402
from pyspark_ml_features_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "d4_pricing_summary",
    "d1_broadcast_join_revenue",
    "d2_join_chain_region_sales",
    "b6_robust_scaling",
    "d10_topk_orders_per_priority",
    "d11_global_topn",
    "e1_exact_dedup",
    "e4_knn_cosine",
    # r4 (VERDICT r3 task 2): e3_jaccard_pairs and e2c_simhash_banded are
    # DEMOTED from the headline — both are correctness baselines whose
    # pair-join shapes are deliberate scale anti-patterns (e3 exact
    # pairwise Jaccard, e2c 16-bit banding → near-all-pairs buckets); the
    # headline now carries only their scale-representative twins
    # (e33 banded MinHash, e2d 64-bit banding). Both stay registered,
    # oracle-checked, and pytest-timed.
    "e8_tfidf_topterms",
    "e9_sessionize",
    "e10_tumbling_windows",
    "e11_robust_scale_array",
    "t4_fingerprint",
    "t5_simhash",
    "e14_asof_attribution",
    "d25_sql_subqueries",
    "e5_embedding_normalize",
    "d21_apply_in_pandas_minmax",
    "d20_pandas_udf_revenue",
    # r3 additions (VERDICT r2 #5): the TPC-H family, the banded near-dup
    # scale paths, and the curation composition — 20 queries no longer
    # represented a 145-query surface, and regressions in these families
    # were invisible to the bench.
    "d36_tpch_q3_shipping_priority",
    "d43_tpch_q5_local_supplier_volume",
    "d45_tpch_q7_volume_shipping",
    "d47_tpch_q18_large_orders",
    "d48_tpch_q21_waiting_supplier",
    "d37_tpch_q10_returned_items",
    "e2d_simhash64_banded",
    "e31_line_dedup",
    "e25_corpus_curation",
    "d49_interpolate_gaps",
    "d30b_moment_stats_decimal",
    "e33_minhash_banded_exact",
    "e34_quality_dedup",
    "e36_fingerprint_dedup",
    "e4e_int8_knn",
    "d59_map_in_arrow",
    # late-r3 additions: the remaining expressible TPC-H shapes
    "d61_tpch_q13",
    "d62_tpch_q15",
    "d63_tpch_q17",
    "d64_tpch_q9",
    # r4 additions: one representative per new round-4 family (native
    # batch session windows, merge-maintained rollups, nearest as-of)
    "d67_session_window_batch",
    "e38_rollup_merge_upsert",
    "d79_asof_nearest",
    # r4 continuation: one representative per new family — the final
    # TPC-H shape, the skew-salting rewrite, the equi-depth histogram.
    # e45 (CC) and e46 (LSH audit) stay out: both ride e3-style exact
    # pair generation (a deliberate correctness baseline, demoted from
    # the headline with e3 itself per VERDICT r3 task 2).
    "d86_tpch_q12",
    "d89_skew_salted_agg",
    "d91_equidepth_histogram",
    # second continuation: one representative per new family — the banded
    # range join, the union-merge backward as-of, the Arrow greedy
    # packer, and the Bloom decontamination pass.
    "d95_interval_overlap_join",
    "d98_asof_backward",
    "e51_greedy_packing",
    "e52_bloom_decontaminate",
    # fifth continuation: the scale-safe global-ranking primitive
    # (repartitionByRange + offset cumsum quantile normalization) — the
    # one genuinely new plan shape of the batch. The rest of the batch
    # (window distribution fns, map HOFs, JSON round-trip, decimal agg,
    # bounded BFS, collation, readability) rides plan shapes the
    # headline already times; e58 stays out for the e45 reason (exact
    # all-pairs edge baseline).
    "d106_quantile_normalize",
    # round-4 session: span-level duplicate-passage report — output is
    # bounded by n_docs (one report row per doc) so it is the dedup-family
    # member whose cost CANNOT explode on a self-similar corpus; measured
    # volume table in DESIGN_SCALE.md "Span-level dedup volumes".
    "e69_dup_span_report",
    # round-4 session closers: the Arrow-media family was previously
    # unrepresented in the headline; e71 (real BMP decode + resize) times
    # the binary-column mapInPandas path end to end.
    "e71_image_resize",
    # round-4 third session: one representative per new family — the
    # experimentation statistics (conditional-power-sum scan shape) and
    # the exact count-min sketch (explode-to-cells + geometry-bounded
    # probe join). d115/e74/d116/d117/d119/e75 ride plan shapes the
    # headline already times (key-window + agg, tiny-cell windows,
    # two-level aggs, explode+agg).
    "d114_ab_welch_ttest",
    "d118_count_min_sketch",
    # round-6: one representative per new plan shape — e80 is the
    # highest-volume shape of the batch (per-doc DISTINCT 4-gram
    # explosion → (source, gram) agg → WindowGroupLimit top-k), d122 the
    # expression-heavy blocked linkage (hash equi-join + per-pair
    # levenshtein). e77/e78/e79/e81/d121/d123 ride shapes the headline
    # already times (e51's fold, d106's primitive, d116's cell table,
    # classic agg, window frames).
    "e80_boilerplate_ngrams",
    "d122_blocked_linkage",
    # round-7: the two new plan shapes of the batch — t18's double
    # broadcast-profile scoring (train-profile build + held-out scoring
    # join + two-level max) and e90's chunk-string distinct aggregate
    # (e80's volume class at chunk granularity). The other nine
    # (e86/e87/e88/e89/e91/d127/d128/d129/a28, plus the late-round e92
    # incremental pack and b13 model persistence) ride shapes the
    # headline already times (percentile+broadcast join-back, left-join
    # agg, broadcast decontaminate, tiny-agg window, single-row cross
    # join, pipe lowering, classic equi-join agg, project-only,
    # text/binary sink-source round-trip, e51's Arrow fold, MLlib fit).
    "t18_char_ngram_langid",
    "e90_chunk_dedup_stats",
    # r8: the batch's two genuinely new plan shapes — e5b's
    # posexplode → dim-bounded aggregate → broadcast join-back onto the
    # exploded cells, and e95's chunk regeneration + per-doc
    # sort-and-flatten reconstruction (collect_list state bounded by doc
    # length). The other eleven r8 queries ride already-timed shapes
    # (pipe lowering, constant-folded variables, classic agg/window/
    # unpivot/TakeOrderedAndProject, distinct self-join, d10's
    # WindowGroupLimit).
    "e5b_dimension_minmax_scale",
    "e95_chunk_stitch_roundtrip",
    # r10 (VERDICT r9 item 3): e103 promoted — round 9's one genuinely
    # new plan shape (Arrow decode → banded Hamming pairs → CC fixpoint
    # over media hashes); left out of the r9 minima because fresh
    # shuffle/peak baselines measured on the drifted machine would have
    # been poor anchors. e104 joins as round 10's new composition shape
    # (checkpointed exact dedup → chunk → window-packed bins → unpack →
    # stitch → survivorship re-expansion).
    "e103_image_neardup_clusters",
    "e104_dedup_pack_stitch_roundtrip",
    # r10 compositions: e105 is the batch's one genuinely new plan shape
    # (vocab checkpointed once → TWO broadcast decode/encode joins with
    # the corpus never shuffling for either → positional reassembly
    # groupBy, the only corpus exchange). e106/d149/d150 ride
    # already-timed shapes (e9's session window + e95's container
    # explode, d98's union-merge as-of, dimension-bounded pivot).
    "e105_vocab_encode_decode_roundtrip",
    # r11: no promotions — e108 rides three already-timed shapes chained
    # (t16 per-row codegen, e86 percentile + broadcast join-back, e34
    # struct-max dedup + survivor join); e109 rides e45's exact-pairwise
    # edge baseline, excluded from the headline since r4 with e3/e45
    # (deliberate correctness baseline, not a scale path); s17/s18 are
    # streaming drains (the headline times batch plans; streaming
    # throughput has its own ladder in scripts/stress_stream_throughput.py).
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or 0.1)
    spark = get_spark(app_name="spark-graft-bench")

    queries = registry.all_queries()
    # warmup: JIT + codegen + parquet footer caches
    queries["d11_global_topn"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        # min of 3 runs: the first pays whole-stage-codegen compilation (a
        # per-query-shape constant, not a data cost) and the min also rides
        # out transient machine noise (cold page cache after other jobs was
        # observed to inflate single runs ~70%)
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            queries[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # Compact separators keep the one-line JSON under 2000 chars (1938 at
    # 63 queries) so a tail-truncating log store keeps the WHOLE line, and
    # flush=True defends against a block-buffered pipe dropping it on exit;
    # a sidecar copy next to this script survives any stdout loss outright
    # (VERDICT r13 item 4: BENCH_r12's stored tail lost the line's head and
    # nulled the round-over-round comparison). Same keys, same values, same
    # methodology — formatting only.
    line = json.dumps({
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }, separators=(",", ":"))
    print(line, flush=True)
    try:
        sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_LAST.json")
        with open(sidecar, "w") as fh:
            fh.write(line + "\n")
    except OSError:
        pass  # read-only checkout: stdout line already carries everything
    spark.stop()


if __name__ == "__main__":
    main()
