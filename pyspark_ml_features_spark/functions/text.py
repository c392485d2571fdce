"""Text-analysis column helpers: tokenization, stopwords, language markers,
rolling-hash fingerprints. All pure SQL expressions (no Python UDFs) so they
stay inside whole-stage codegen and have exact DuckDB twins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Fixed marker/stopword sets — part of the operator contract (deterministic).
STOPWORDS = ("the", "a", "of", "and", "is")
LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "is", "and", "of"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de", "shi", "le", "he", "zai"),
}
HASH_MOD = 2147483647  # 2^31 - 1; rolling-hash modulus
HASH_BASE = 31


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def word_ngrams(tok_col: Column | str, n: int) -> Column:
    """Guarded word-n-gram strings over a MATERIALIZED token-array COLUMN:
    ``concat_ws(' ', slice(toks, i, n))`` per position, empty array when
    the doc has fewer than n tokens (Spark's ``sequence(1, 0)`` is
    DESCENDING — the t7 guard).

    ``tok_col`` must be a real column (``F.col("toks")``), never the
    ``split(text)`` EXPRESSION: a transform() lambda re-evaluates any
    enclosing expression its body references on EVERY element reference,
    which turned per-doc gram extraction O(tokens²) — re-splitting the
    document once per element_at — and cost e80 10× (5.6 → 0.5 s at
    sf0.1, round-7 finding). One slice per gram also replaces n separate
    element_at calls."""
    tk = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    return F.when(
        F.size(tk) >= n,
        F.transform(F.sequence(F.lit(1), F.size(tk) - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(tk, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def rolling_hash(text: Column | str, base: int = HASH_BASE) -> Column:
    """Deterministic polynomial rolling hash of a string:
    ``h = fold(chars, 0, (acc, c) -> (acc*base + ascii(c)) % (2^31-1))``.
    Document fingerprinting primitive — integer arithmetic, exact on any
    engine. acc stays < 2^31 so acc*base+c < 2^37 for base ≤ 43, no 64-bit
    overflow. Independent bases give (near-)independent hash families —
    the 64-bit simhash concatenates four of them."""
    c = F.col(text) if isinstance(text, str) else text
    # split('') yields one array element per character — O(n), unlike a
    # substr(i,1) fold which re-seeks the UTF8 string per index (O(n²))
    chars = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("bigint"))
    return F.aggregate(
        chars, F.lit(0).cast("bigint"),
        lambda acc, ch: F.pmod(acc * base + ch, F.lit(HASH_MOD)))


def duckdb_rolling_hash(text_expr: str, base: int = HASH_BASE) -> str:
    """DuckDB twin of :func:`rolling_hash` (same fold, same modulus)."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(range(1, length({text_expr}) + 1), "
        f"i -> ascii(substr({text_expr}, i, 1))::BIGINT)), "
        f"(acc, c) -> (acc * {base} + c) % {HASH_MOD})"
    )
