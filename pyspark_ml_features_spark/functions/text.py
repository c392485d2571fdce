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
