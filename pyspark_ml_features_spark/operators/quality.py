"""Pipeline quality measurement: precision/recall of the approximate dedup
path against exact ground truth — the audit every production near-dedup
deployment runs before trusting its banded-LSH geometry (C4/GPT-3-style
pipelines tune bands/rows against exactly this confusion table).

The whole report is exactly SQL-expressible because e33's MinHash is
engine-exact integer arithmetic: candidates AND ground truth AND the
confusion counts all hash-check against DuckDB — the recall number itself
is driver-verified, not a pytest-only invariant (e2's MLlib twin can't do
this; its signatures are engine-specific).

Scale design (100 TB): exact pairwise truth is O(candidates) via the
shingle inverted-index join, affordable on an AUDIT SLICE, not the corpus
— production runs this report on a sampled partition and extrapolates,
while the banded path (e33/e2d) runs the full corpus. The fixture corpus
is small enough to audit whole, which is what makes the oracle exact
end-to-end.

Reference: the reference repo (six ML utilities, spark_ml_features.py:1)
has no dedup surface; SURVEY §2-E north-star scope.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pyspark_ml_features_spark.operators.dedup import (
    _duckdb_minhash_ctes,
    jaccard_pairs,
    minhash_candidate_pairs,
    numeric_shingles,
    token_hash_arrays,
)
from pyspark_ml_features_spark.registry import register
from pyspark_ml_features_spark.sources import table


def _e46_oracle() -> str:
    return f"""
WITH {_duckdb_minhash_ctes()},
sizes AS (
    SELECT doc_id, len(sh) AS n_sh FROM shingled
), inv AS (
    SELECT doc_id, unnest(sh) AS shingle FROM shingled
), shared AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
    FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
), truth AS (
    SELECT d1, d2 FROM shared
    JOIN sizes sa ON d1 = sa.doc_id
    JOIN sizes sb ON d2 = sb.doc_id
    WHERE shared::DOUBLE / (sa.n_sh + sb.n_sh - shared) >= 0.5
), conf AS (
    SELECT t.d1 AS td1, e.d1 AS ed1
    FROM truth t FULL JOIN est e ON t.d1 = e.d1 AND t.d2 = e.d2
)
SELECT CAST(count(td1) AS BIGINT) AS n_true,
       CAST(count(ed1) AS BIGINT) AS n_est,
       CAST(sum(CASE WHEN td1 IS NOT NULL AND ed1 IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
       sum(CASE WHEN td1 IS NOT NULL AND ed1 IS NOT NULL
                THEN 1 ELSE 0 END)::DOUBLE / count(ed1) AS precision_est,
       sum(CASE WHEN td1 IS NOT NULL AND ed1 IS NOT NULL
                THEN 1 ELSE 0 END)::DOUBLE / count(td1) AS recall_est
FROM conf
"""


@register(
    "e46_lsh_quality_report",
    oracle=_e46_oracle(),
    tags=("north-star", "E2", "E3", "dedup", "quality", "audit"),
)
def e46_lsh_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH audit: e33's banded candidates (Ĵ ≥ 0.5, 16 sigs /
    8 bands) scored against EXACT 3-gram-shingle Jaccard ≥ 0.5 over the
    same corpus — one row: true pair count, estimated pair count, true
    positives, precision, recall. FULL OUTER join of the two pair sets so
    both miss directions (LSH false negatives, estimator false positives)
    are counted; ratios are one double division each, mirrored verbatim in
    the oracle."""
    d = table(spark, sf_dir, "documents")
    est = minhash_candidate_pairs(d).select("d1", "d2")
    th_df = token_hash_arrays(d)
    truth = jaccard_pairs(
        th_df.withColumn("__sh", numeric_shingles(F.col("th"))),
        F.col("__sh"), threshold=0.5).select("d1", "d2")
    t, e = truth.alias("t"), est.alias("e")
    conf = t.join(e, (F.col("t.d1") == F.col("e.d1"))
                  & (F.col("t.d2") == F.col("e.d2")), "full")
    tp = F.when(F.col("t.d1").isNotNull() & F.col("e.d1").isNotNull(), 1) \
          .otherwise(0)
    return conf.agg(
        F.count(F.col("t.d1")).alias("n_true"),
        F.count(F.col("e.d1")).alias("n_est"),
        F.sum(tp).alias("n_tp"),
        (F.sum(tp).cast("double") / F.count(F.col("e.d1")))
        .alias("precision_est"),
        (F.sum(tp).cast("double") / F.count(F.col("t.d1")))
        .alias("recall_est"))


def _e50_oracle() -> str:
    return f"""
WITH {_duckdb_minhash_ctes()},
thr AS (SELECT unnest([8, 10, 12, 14, 16]) AS min_match)
SELECT thr.min_match,
       CAST(count(CASE WHEN est.n_sig_match >= thr.min_match
                       THEN 1 END) AS BIGINT) AS n_pairs,
       thr.min_match / 16.0 AS est_jaccard_threshold
FROM thr LEFT JOIN est ON est.n_sig_match >= thr.min_match
GROUP BY thr.min_match
"""


@register(
    "e50_threshold_sweep",
    oracle=_e50_oracle(),
    tags=("north-star", "E2", "dedup", "quality", "tuning"),
)
def e50_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-threshold SWEEP from one candidate pass: pair counts at
    five agreement cutoffs (Ĵ ≥ 0.5 .. 1.0) computed from a single banded
    join — the tuning table an operator reads to pick the dedup threshold
    (too low → over-merging, too high → missed dups), without re-running
    candidate generation per candidate threshold. With e49's signature
    store this sweep re-runs nightly at ~0.1% of corpus cost.

    100 TB: one banded join (the e33 plan), then a 5-row broadcast of
    thresholds over the pair relation — count aggregates map-side."""
    d = table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(d).select("n_sig_match")
    th = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in (8, 10, 12, 14, 16)]))
        .alias("min_match"))
    return (th.crossJoin(F.broadcast(pairs))
            .groupBy("min_match")
            .agg(F.count(F.when(F.col("n_sig_match") >= F.col("min_match"),
                                1)).alias("n_pairs"),
                 F.first(F.col("min_match") / 16.0)
                 .alias("est_jaccard_threshold")))


# Bloom-filter geometry for e52: m bits, k affine transforms of one
# engine-exact rolling hash. (P_i, Q_i) are arbitrary fixed primes; what
# matters for parity is determinism, not statistical independence.
BLOOM_M = 4096
BLOOM_FNS = ((389, 1543), (761, 2711), (997, 3833))


def _e52_oracle() -> str:
    from pyspark_ml_features_spark.functions.text import duckdb_rolling_hash

    h = duckdb_rolling_hash("text")
    pos_rows = "\n    UNION ALL\n".join(
        f"    SELECT doc_id, (h * {p} + {q}) % {BLOOM_M} AS pos FROM hashed"
        for p, q in BLOOM_FNS)
    return f"""
WITH hashed AS (
    SELECT doc_id, text, {h} AS h FROM documents
), pos AS (
{pos_rows}
), bloom AS (
    SELECT DISTINCT pos FROM pos WHERE doc_id % 5 = 0
), corpus_pos AS (
    SELECT DISTINCT doc_id, pos FROM pos WHERE doc_id % 5 <> 0
), hits AS (
    SELECT c.doc_id,
           count(*) AS n_pos,
           count(b.pos) AS n_hit
    FROM corpus_pos c LEFT JOIN bloom b ON c.pos = b.pos
    GROUP BY c.doc_id
), exact AS (
    SELECT DISTINCT c.doc_id
    FROM documents c JOIN documents b ON c.text = b.text
    WHERE c.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
)
SELECT h.doc_id,
       h.n_hit = h.n_pos AS bloom_hit,
       e.doc_id IS NOT NULL AS exact_hit
FROM hits h LEFT JOIN exact e ON h.doc_id = e.doc_id
"""


@register(
    "e52_bloom_decontaminate",
    oracle=_e52_oracle(),
    tags=("north-star", "E1", "dedup", "bloom", "decontamination"),
)
def e52_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark decontamination — the constant-memory scale
    path for e27's broadcast semi-join: the benchmark set (doc_id % 5 = 0,
    the e27 convention) is compressed into an m=4096-bit Bloom filter
    (k=3 affine transforms of the engine-exact rolling hash), and every
    corpus document is flagged when ALL its k bit positions are set. The
    output carries ``bloom_hit`` next to the ground-truth ``exact_hit``
    (text-equality semi-join), so the driver hash-checks the filter's
    exact false-positive behavior — no false NEGATIVES by construction
    (every exact hit shares all bit positions), while false positives
    appear as ``bloom_hit AND NOT exact_hit`` rows and grow with bit
    saturation (7% of bits set at sf0.01; 53% at sf0.1 — the fixture
    demonstrates both regimes).

    The whole filter is declarative: bit positions are rows, the filter is
    a DISTINCT aggregate (≤ m rows regardless of corpus size), membership
    is a broadcast join + count match — no driver-side bitset, no UDF.

    100 TB: the REAL deployment replaces the position-rows join with a
    broadcast m-bit bitmap (Spark's ``df.stat.bloomFilter`` or a runtime
    bloom pushed into the scan); semantics are what this query pins. The
    benchmark side is small by definition (eval sets, not corpora), so m
    stays KBs-to-MBs; the corpus side is one scan + map-side membership
    test — zero shuffles of corpus text, versus e27's shuffle-free but
    memory-heavier broadcast of the raw benchmark texts."""
    from pyspark_ml_features_spark.functions.text import rolling_hash

    d = table(spark, sf_dir, "documents")
    hashed = d.select("doc_id", "text", rolling_hash("text").alias("h"))
    pos = hashed.select(
        "doc_id",
        F.explode(F.array(*[
            ((F.col("h") * p + q) % BLOOM_M).alias(f"p{i}")
            for i, (p, q) in enumerate(BLOOM_FNS)])).alias("pos"))
    bloom = (pos.filter(F.col("doc_id") % 5 == 0)
             .select("pos").distinct())
    corpus_pos = (pos.filter(F.col("doc_id") % 5 != 0)
                  .select("doc_id", "pos").distinct())
    hits = (corpus_pos.join(F.broadcast(bloom.withColumn("hit", F.lit(1))),
                            "pos", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_pos"),
                 F.count("hit").alias("n_hit")))
    bench_texts = (d.filter(F.col("doc_id") % 5 == 0)
                   .select("text").distinct())
    exact = (d.filter(F.col("doc_id") % 5 != 0)
             .join(F.broadcast(bench_texts), "text", "leftsemi")
             .select("doc_id").distinct()
             .withColumn("ex", F.lit(1)))
    return (hits.join(exact, "doc_id", "left")
            .select("doc_id",
                    (F.col("n_hit") == F.col("n_pos")).alias("bloom_hit"),
                    F.col("ex").isNotNull().alias("exact_hit")))


@register(
    "e54_dataset_card",
    oracle="""
WITH stats AS (
    SELECT doc_id, text, lang, source,
           len(str_split(text, ' '))::BIGINT AS n_tokens
    FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       sum(n_tokens)::DOUBLE / count(*) AS mean_tokens,
       quantile_cont(n_tokens, 0.5) AS p50_tokens,
       quantile_cont(n_tokens, 0.9) AS p90_tokens,
       CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_exact_dup,
       (count(*) - count(DISTINCT text))::DOUBLE / count(*) AS dup_rate
FROM stats
""",
    tags=("north-star", "quality", "reporting"),
)
def e54_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATASET CARD summary — the one-row corpus report a training run
    records next to its data snapshot: document/language/source counts,
    token volume, mean and p50/p90 document length, and the exact-duplicate
    rate (docs minus distinct texts). Every number is engine-exact: counts
    and sums are integer, the two divisions are single exact-int divides,
    and exact percentile over BIGINT token counts bit-matches
    quantile_cont (probed, d51).

    100 TB: one pass — count-distinct on the two low-cardinality columns
    is cheap; count(DISTINCT text) is the expensive honest number (shuffle
    of text-sized keys) and the production swap-in is e36's 8-byte
    fingerprint or d38's HLL when approximation is acceptable; exact
    percentile buffers values (b6's caveat) with approx_percentile as the
    documented scale default. The card is the AUDIT artifact, so the
    exact forms are the point."""
    d = table(spark, sf_dir, "documents")
    from pyspark_ml_features_spark.functions.text import tokens

    stats = d.select("lang", "source", "text",
                     F.size(tokens("text")).cast("bigint").alias("n_tokens"))
    return stats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1)))
        .alias("mean_tokens"),
        F.expr("percentile(n_tokens, 0.5)").alias("p50_tokens"),
        F.expr("percentile(n_tokens, 0.9)").alias("p90_tokens"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("n_exact_dup"),
        ((F.count(F.lit(1)) - F.countDistinct("text")).cast("double")
         / F.count(F.lit(1))).alias("dup_rate"))


@register(
    "e55_ngram_decontaminate",
    oracle="""
WITH sub AS (
    SELECT doc_id, str_split(text, ' ') AS t FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
    FROM sub
), bench AS (
    SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE doc_id % 5 = 0
), corpus AS (
    SELECT doc_id, unnest(sh) AS shingle FROM sh WHERE doc_id % 5 <> 0
), hits AS (
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(b.shingle) AS BIGINT) AS n_shared
    FROM corpus c LEFT JOIN bench b ON c.shingle = b.shingle
    GROUP BY c.doc_id
)
SELECT doc_id, n_shingles, n_shared,
       n_shared::DOUBLE / n_shingles AS contamination
FROM hits WHERE n_shared > 0
""",
    tags=("north-star", "E2", "dedup", "decontamination", "ngram"),
)
def e55_ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-GRAM-overlap benchmark decontamination — the GPT-3/PaLM-style
    rule (those reports used 8-13-gram collisions; 3-grams here match the
    fixture's short documents): a corpus document is contaminated when it
    SHARES ANY word n-gram with the benchmark set (doc_id % 5 = 0, the
    e27/e52 convention), catching partial-overlap leaks that e27's
    exact-text and e52's whole-doc Bloom check both miss. Output: every
    flagged doc with its distinct-shingle count, shared-shingle count, and
    contamination fraction — the evidence a removal decision audits.

    100 TB: the benchmark shingle set is eval-set-sized and broadcasts;
    the corpus explodes its distinct shingles ONCE, joins map-side, and
    re-aggregates per doc — same single-shuffle shape as e53's OOV join.
    For benchmark sets too big to broadcast, the shingle join falls back
    to the inverted-index equi-join (e3's plan) — still candidate-bounded,
    never pairwise."""
    from pyspark_ml_features_spark.functions.text import tokens, word_ngrams

    # Token array materialized before the gram lambda (word_ngrams'
    # quadratic-re-evaluation rule; the n<3 guard lives in word_ngrams).
    d = (table(spark, sf_dir, "documents")
         .select("doc_id", tokens("text").alias("__toks")))
    sh = d.select("doc_id",
                  F.array_distinct(word_ngrams("__toks", 3)).alias("sh"))
    bench = (sh.filter(F.col("doc_id") % 5 == 0)
             .select(F.explode("sh").alias("shingle")).distinct()
             .withColumn("hit", F.lit(1)))
    corpus = (sh.filter(F.col("doc_id") % 5 != 0)
              .select("doc_id", F.explode("sh").alias("shingle")))
    return (corpus.join(F.broadcast(bench), "shingle", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.count("hit").alias("n_shared"))
            .filter(F.col("n_shared") > 0)
            .select("doc_id", "n_shingles", "n_shared",
                    (F.col("n_shared").cast("double") / F.col("n_shingles"))
                    .alias("contamination")))


@register(
    "e70_token_budget_selection",
    oracle="""
WITH tok AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents
), scored AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_tokens,
         CAST((10000 * len(list_filter(t,
               w -> w IN ('the', 'a', 'of', 'and', 'is')))) // len(t)
              AS BIGINT) AS quality_bp
  FROM tok
), ranked AS (
  SELECT doc_id, n_tokens, quality_bp,
         CAST(row_number() OVER (ORDER BY quality_bp DESC, doc_id)
              AS BIGINT) AS rk,
         CAST(sum(n_tokens) OVER (ORDER BY quality_bp DESC, doc_id)
              AS BIGINT) AS cum_tokens
  FROM ranked_src
)
SELECT doc_id, n_tokens, quality_bp, rk, cum_tokens
FROM ranked WHERE cum_tokens <= 10000
""".replace("ranked_src", "scored"),
    tags=("north-star", "llm-pipeline", "curation", "scale", "scan"),
)
def e70_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-BUDGET corpus selection — the data-constrained-training step:
    rank every document by a quality score and keep the best until a fixed
    token budget (10,000 here) is exhausted. The score is Gopher-style
    stopword density in basis points (documents containing function words
    are natural language; symbol soup is not — t16 carries the full rule
    bundle), ties broken by doc_id so the cut is deterministic.

    The engine piece is the GLOBAL RUNNING TOTAL under a total order —
    computed by ``distributed_prefix_sum`` (d106's ranking primitive
    extended to carry a measure): range-repartition on (score desc via
    negation, doc_id), per-partition (count, token-sum) collected as P
    metadata rows, driver prefix-sums them into offsets, and each row's
    global rank/cumulative is offset + its bounded local window value.
    The oracle IS the single-partition window this replaces; every task
    holds ~n/P rows, so the selection runs at any corpus size — a full
    sort into one partition (ntile/global window) would not.

    100 TB: one range shuffle + one metadata collect; the budget cut is
    then a partition-local filter. The same scan primitive serves
    quota-by-quality curricula and size-capped shard assembly."""
    from pyspark_ml_features_spark.operators.relational6 import (
        distributed_prefix_sum,
    )

    scored = _stopword_scored(table(spark, sf_dir, "documents"))
    ranked = distributed_prefix_sum(
        scored, ["neg_bp", "doc_id"], "n_tokens", 16)
    return (ranked.filter(F.col("gcum") <= 10000)
            .select("doc_id", "n_tokens", "quality_bp",
                    F.col("grk").alias("rk"),
                    F.col("gcum").alias("cum_tokens")))


def _stopword_scored(d: DataFrame) -> DataFrame:
    """Gopher-style stopword-density score in basis points, shared by the
    budget cut (e70) and the curriculum partition (e79): per doc,
    (n_tokens, quality_bp = 10000·stopword_hits DIV n_tokens, neg_bp for
    descending range partitioning). The 10000·hits product is forced to
    BIGINT — hits is an int32 F.size, and an int32-first product wraps
    (ANSI off) or throws (ANSI on) past ~214k hits per document, while
    the DuckDB oracle computes len() in BIGINT (the d116 overflow class,
    caught in the round-6 review)."""
    from pyspark_ml_features_spark.functions.text import STOPWORDS, tokens

    t = tokens("text")
    return (d.select(
        "doc_id",
        F.size(t).cast("bigint").alias("n_tokens"),
        F.size(F.filter(t, lambda w: w.isin(*STOPWORDS))).alias("hits"))
        .select("doc_id", "n_tokens",
                F.expr("(10000L * hits) DIV n_tokens").alias("quality_bp"))
        .withColumn("neg_bp", -F.col("quality_bp")))


@register(
    "d117_constraint_audit",
    oracle="""
SELECT 'orphan_lineitem' AS check_name,
       CAST(count(*) AS BIGINT) AS n_violations
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'dup_lineitem_key',
       CAST(coalesce(sum(n - 1), 0) AS BIGINT)
FROM (SELECT count(*) AS n FROM lineitem
      GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
UNION ALL
SELECT 'discount_out_of_range',
       CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
            AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'null_custkey',
       CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
FROM orders
UNION ALL
SELECT 'nonpositive_totalprice',
       CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orderdate_after_shipdate_horizon',
       CAST(count(*) FILTER (
            WHERE o_orderdate > TIMESTAMP '2026-01-01') AS BIGINT)
FROM orders
""",
    tags=("engine", "data-quality"),
)
def d117_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table constraint audit — the contract check a 100 TB
    ingestion runs before publishing a snapshot: referential integrity
    (lineitems whose order is missing — LEFT ANTI join, one key
    shuffle), primary-key uniqueness (duplicate (l_orderkey,
    l_linenumber) rows counted as sum(n-1) over violating groups; the
    testdata genuinely contains such duplicates, so this check is
    exercised non-trivially), and domain/range rules (discount ∈ [0,1],
    non-positive prices, null keys, future dates) as conditional
    aggregates folded into ONE pass per table. Output is the fixed
    (check_name, n_violations) report shape monitoring systems ingest.

    Complements d35 (per-column null/distinct profile) and e54 (corpus
    dataset card): those describe the data, this one enforces contracts
    across tables. 100 TB: the domain checks ride a single scan per
    table (conditional sums, map-side combinable); the uniqueness check
    shuffles only the key columns; the anti join shuffles keys once —
    nothing is row-wise Python and no check materializes violations,
    only counts."""
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")

    orphan = (li.select("l_orderkey")
              .join(od.select("o_orderkey"),
                    li["l_orderkey"] == od["o_orderkey"], "left_anti")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
              .select(F.lit("orphan_lineitem").alias("check_name"),
                      "n_violations"))
    dup = (li.groupBy("l_orderkey", "l_linenumber")
           .agg(F.count(F.lit(1)).alias("n"))
           .filter(F.col("n") > 1)
           .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
                .cast("bigint").alias("n_violations"))
           .select(F.lit("dup_lineitem_key").alias("check_name"),
                   "n_violations"))
    li_domain = (li.agg(
        F.count(F.when((F.col("l_discount") < 0)
                       | (F.col("l_discount") > 1), F.lit(1)))
        .cast("bigint").alias("n_violations"))
        .select(F.lit("discount_out_of_range").alias("check_name"),
                "n_violations"))
    od_domain = (od.agg(
        F.count(F.when(F.col("o_custkey").isNull(), F.lit(1)))
        .cast("bigint").alias("null_custkey"),
        F.count(F.when(F.col("o_totalprice") <= 0, F.lit(1)))
        .cast("bigint").alias("nonpositive_totalprice"),
        F.count(F.when(F.col("o_orderdate")
                       > F.lit("2026-01-01").cast("timestamp"), F.lit(1)))
        .cast("bigint").alias("orderdate_after_shipdate_horizon"))
        .selectExpr(
            "stack(3, 'null_custkey', null_custkey, "
            "'nonpositive_totalprice', nonpositive_totalprice, "
            "'orderdate_after_shipdate_horizon', "
            "orderdate_after_shipdate_horizon) "
            "AS (check_name, n_violations)"))
    return orphan.unionAll(dup).unionAll(li_domain).unionAll(od_domain)


@register(
    "d119_k_anonymity",
    oracle="""
WITH qi AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
           count(*) AS sz
    FROM customer
    GROUP BY c_nationkey, c_mktsegment, bal_band
)
SELECT CAST(sz AS BIGINT) AS group_size,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sz * count(*) AS BIGINT) AS n_rows,
       CAST(sz < 5 AS BIGINT) AS risky
FROM qi GROUP BY sz
""",
    tags=("engine", "data-quality", "privacy"),
)
def d119_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination
    (nationality × market segment × account-balance band): the
    re-identification risk report a privacy review runs before a
    dataset ships. Two stacked map-side-combinable aggregates: QI
    groups with their sizes, then the size histogram — each row says
    how many equivalence classes have exactly `group_size` members and
    flags classes below the k=5 threshold (the dataset's k-anonymity is
    the smallest group_size present). All counts integer-exact; the
    balance band uses floor(x/1000) — a single correctly-rounded IEEE
    division, identical on both engines.

    100 TB: output is |distinct sizes| rows, the first aggregate
    shuffles only QI-cardinality groups, and generalization ladders
    (coarser bands) just re-run the same two-aggregate shape."""
    c = table(spark, sf_dir, "customer")
    qi = (c.groupBy(
        "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"))
        .agg(F.count(F.lit(1)).alias("sz")))
    return (qi.groupBy("sz")
            .agg(F.count(F.lit(1)).alias("n_groups"))
            .select(F.col("sz").cast("bigint").alias("group_size"),
                    F.col("n_groups").cast("bigint").alias("n_groups"),
                    (F.col("sz") * F.col("n_groups")).cast("bigint")
                    .alias("n_rows"),
                    (F.col("sz") < 5).cast("bigint").alias("risky")))


CURRICULUM_PHASES = 4


@register(
    "e79_curriculum_phases",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents
), scored AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_tokens,
         CAST((10000 * len(list_filter(t,
               w -> w IN ('the', 'a', 'of', 'and', 'is')))) // len(t)
              AS BIGINT) AS quality_bp
  FROM tok
), ranked AS (
  SELECT doc_id, n_tokens, quality_bp,
         CAST(sum(n_tokens) OVER (ORDER BY quality_bp DESC, doc_id)
              AS BIGINT) AS cum_tokens
  FROM scored
), tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM scored)
SELECT doc_id, n_tokens, quality_bp, cum_tokens,
       CAST(least({CURRICULUM_PHASES} - 1,
                  (cum_tokens - 1) * {CURRICULUM_PHASES} // total)
            AS BIGINT) AS phase
FROM ranked, tot
""",
    tags=("north-star", "llm-pipeline", "curation", "scale"),
)
def e79_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRICULUM SCHEDULE assignment: walk the corpus from highest to
    lowest quality (e70's stopword-density score, doc_id tie-break) and
    cut the token stream into CURRICULUM_PHASES equal-token phases —
    phase 0 is the cleanest quarter of the training tokens, phase 3 the
    noisiest. Data-curriculum training (clean→noisy or the reverse) and
    multi-epoch quality annealing both consume exactly this assignment
    table.

    Same engine primitive as e70 (``distributed_prefix_sum`` under a
    total order — and literally e70's ``_stopword_scored`` helper), but
    the budget cut generalizes to a PARTITION of the whole corpus:
    phase = (cum_tokens-1) * K DIV total — pure integer arithmetic, so
    the phase boundary is exact on any engine (no float share in
    sight). The corpus total is read as max(gcum) FROM THE RANKED
    CHECKPOINT the primitive just materialized — one scan of the
    memory/disk-resident checkpoint, not a second tokenization pass
    over the corpus (round-6 review finding).

    100 TB: one range shuffle + the primitive's metadata collect + one
    checkpoint-resident max; every task holds ~n/P rows. The oracle is
    the single-partition running-sum window this construction
    replaces.

    EAGER-EXECUTION / STALE-LITERAL CONTRACT (shared with the whole
    ``distributed_row_number`` family, ADVICE r6): building this
    DataFrame runs two Spark jobs up front — the prefix-sum checkpoint
    and the ``max(gcum)`` collect — and bakes the collected corpus
    total into the returned plan as a literal. The result is a SNAPSHOT:
    re-executing the returned DataFrame after the source parquet
    changes replays the checkpoint/total from construction time rather
    than re-deriving them. Rebuild (call the function again) to pick up
    new data."""
    from pyspark_ml_features_spark.operators.relational6 import (
        distributed_prefix_sum,
    )

    scored = _stopword_scored(table(spark, sf_dir, "documents"))
    ranked = distributed_prefix_sum(
        scored, ["neg_bp", "doc_id"], "n_tokens", 16)
    total = ranked.agg(F.max("gcum")).collect()[0][0] or 1
    k = CURRICULUM_PHASES
    return (ranked.select(
        "doc_id", "n_tokens", "quality_bp",
        F.col("gcum").alias("cum_tokens"))
        .withColumn(
            "phase",
            F.least(F.lit(k - 1),
                    F.expr(f"(cum_tokens - 1) * {k} DIV {total}"))
            .cast("bigint")))


DRIFT_TOP_K = 50


@register(
    "e81_token_drift",
    oracle=f"""
WITH tok AS (
    SELECT doc_id % 2 AS slice, unnest(str_split(text, ' ')) AS token
    FROM documents
), top AS (
    SELECT token FROM tok GROUP BY token
    ORDER BY count(*) DESC, token LIMIT {DRIFT_TOP_K}
), cells AS (
    SELECT token, slice, CAST(count(*) AS BIGINT) AS obs
    FROM tok JOIN top USING (token) GROUP BY 1, 2
), tot AS (
    SELECT token, slice, obs,
           CAST(sum(obs) OVER (PARTITION BY token) AS BIGINT) AS row_tot,
           CAST(sum(obs) OVER (PARTITION BY slice) AS BIGINT) AS col_tot,
           CAST(sum(obs) OVER () AS BIGINT) AS grand
    FROM cells
)
SELECT token, CAST(slice AS BIGINT) AS slice, obs,
       CAST(row_tot::HUGEINT * col_tot * 1000000 // grand AS BIGINT)
           AS expected_micro,
       CAST(((obs::HUGEINT * grand - row_tot::HUGEINT * col_tot)
             * (obs::HUGEINT * grand - row_tot::HUGEINT * col_tot)
             * 1000000000)
            // (row_tot::HUGEINT * col_tot * grand) AS BIGINT)
           AS contrib_nano
FROM tot
""",
    tags=("north-star", "llm-pipeline", "quality", "stats"),
)
def e81_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-DISTRIBUTION DRIFT between two corpus slices (here the
    doc_id parity halves — in production, yesterday's crawl vs today's):
    a chi-square independence table over the top-K corpus tokens. A
    training-data pipeline runs exactly this monitor before admitting a
    new snapshot — topic or template drift shows up as a few tokens with
    huge contributions; Σ contrib_nano / 10^9 is the test statistic.

    Arithmetic is d116's exact integer pattern (experiments.py): every
    multi-term product casts to DECIMAL(38,0) / HUGEINT BEFORE
    multiplying, expected counts in micro-units, contributions in
    nano-units — engine-exact, no float χ² in sight. The contingency
    table is K×2 (bounded), so the window sums and arithmetic run on
    ~100 rows regardless of corpus size.

    100 TB: the token-occurrence stream is exploded and shuffled
    EXACTLY ONCE — one hash aggregate onto vocabulary-sized
    (token, slice) counts; the top-K cut and the per-token row totals
    are then derived from that small table (round-6 review: the first
    draft exploded the stream twice, once for the vocabulary and once
    for the cells). Unlike d116's ~15-row contingency, grand here is
    TOKEN OCCURRENCES — ~1e6 at sf0.1 but ~1e12 at corpus scale, where
    num² · 10^9 blows the DECIMAL(38,0) ceiling and Spark's decimal
    multiply NULLs silently — so both of d116's raise_error guards are
    carried verbatim (loud error, then pre-scale counts by a common
    factor; χ² contributions are invariant under uniform rescale up to
    the rescale factor)."""
    from pyspark_ml_features_spark.functions.text import tokens

    from pyspark_ml_features_spark.plans.audit import probe_checkpoint

    d = table(spark, sf_dir, "documents")
    # Materialized ONCE (vocabulary x 2 rows): both the top-K cut and the
    # contingency join read the checkpoint — without it each branch would
    # re-run the corpus explode (AQE does not reuse the exchange here).
    all_cells = probe_checkpoint(
        d.select((F.col("doc_id") % 2).alias("slice"),
                 F.explode(tokens("text")).alias("token"))
        .groupBy("token", "slice")
        .agg(F.count(F.lit(1)).cast("bigint").alias("obs")),
        "e81_token_drift.cells")
    top = (all_cells.groupBy("token").agg(F.sum("obs").alias("n"))
           .orderBy(F.col("n").desc(), "token").limit(DRIFT_TOP_K)
           .select("token"))
    cells = all_cells.join(F.broadcast(top), "token")
    tot = (cells
           .withColumn("row_tot", F.sum("obs").over(
               Window.partitionBy("token")).cast("bigint"))
           .withColumn("col_tot", F.sum("obs").over(
               Window.partitionBy("slice")).cast("bigint"))
           .withColumn("grand", F.sum("obs").over(
               Window.partitionBy()).cast("bigint")))
    return tot.withColumn(
        "num", F.expr("CAST(obs AS DECIMAL(38,0)) * grand"
                      " - CAST(row_tot AS DECIMAL(38,0)) * col_tot")
    ).select(
        "token", F.col("slice").cast("bigint").alias("slice"), "obs",
        F.expr("CAST(CAST(row_tot AS DECIMAL(38,0)) * col_tot * 1000000"
               " DIV grand AS BIGINT)").alias("expected_micro"),
        # d116's exactness guards, verbatim: past either DECIMAL(38,0)
        # ceiling the multiply NULLs silently — raise instead (the
        # guards run on the bounded K x 2 cell table, so they are free).
        F.expr("CASE WHEN abs(num) > 316227766016837L THEN"
               " raise_error('e81: |obs*grand - row_tot*col_tot| exceeds"
               " the DECIMAL(38,0) exact bound (~3.16e14); pre-scale"
               " token counts — see docstring')"
               " WHEN grand > 4641588833612L THEN"
               " raise_error('e81: grand exceeds the DECIMAL(38,0)"
               " denominator bound (~4.64e12 occurrences, grand^3"
               " ceiling); pre-scale token counts — see docstring')"
               " ELSE CAST((num * num * 1000000000L)"
               " DIV (CAST(row_tot AS DECIMAL(38,0)) * col_tot * grand)"
               " AS BIGINT) END").alias("contrib_nano"))
