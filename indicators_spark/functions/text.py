"""Text-analysis operators over a document table — all pure DataFrame
expressions (JVM-side, whole-stage codegen; zero Python in the hot path).

Designed for the LLM-pipeline use case at 100 TB: every operator is a
row-local projection (no shuffle at all), so it scales embarrassingly —
the parquet scan is the only cost, and column pruning reaches it.

Cross-engine portability (for the DuckDB oracle): word hashing is
md5-based (``portable_word_hash``) — identical int64 on Spark and DuckDB —
never engine-specific hashes like xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Marker stopwords per language for the n-gram/stopword-hit language-ID
#: heuristic.  Deterministic tie-break: first language in this order wins.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "y", "es"),
    "zh": ("de", "shi", "le", "zai", "he"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

#: 2^31 - 1 (Mersenne prime) — the portable 31-bit hash space.
H31 = 2147483647


def words(text: Column) -> Column:
    """Whitespace tokenization (documents use single-space separators)."""
    return F.split(text, " ")


def portable_word_hash(w: Column) -> Column:
    """md5-derived 60-bit int, identical on Spark and DuckDB:
    Spark ``conv(substr(md5(w),1,15),16,10)`` ==
    DuckDB ``CAST('0x'||substr(md5(w),1,15) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")


def word_hash31(w: Column) -> Column:
    """Portable hash reduced into the 31-bit Mersenne space (safe to
    multiply by 31-bit constants without int64 overflow)."""
    return portable_word_hash(w) % H31


def _count_in(ws: Column, vocab: tuple[str, ...]) -> Column:
    """Token hits (with multiplicity) against a small vocabulary."""

    def pred(x: Column) -> Column:
        c = F.lit(False)
        for v in vocab:
            c = c | (x == v)
        return c

    return F.size(F.filter(ws, pred))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append token_count / distinct_tokens / avg_token_len / punct_count."""
    t = F.col(text_col)
    ws = words(t)
    return df.withColumns(
        {
            "token_count": F.size(ws),
            "distinct_tokens": F.size(F.array_distinct(ws)),
            "avg_token_len": (F.length(t) - (F.size(ws) - 1)) / F.size(ws),
            "punct_count": F.length(t)
            - F.length(F.regexp_replace(t, r"[^a-zA-Z0-9 ]", "")),
        }
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristic in [0,1]: length saturation,
    type/token ratio, punctuation penalty, stopword-rate band."""
    df = with_token_stats(df, text_col)
    t = F.col(text_col)
    ws = words(t)
    n = F.col("token_count").cast("double")
    stop_ratio = _count_in(ws, STOPWORDS).cast("double") / n
    score = (
        F.least(n / 50, F.lit(1.0)) * 0.3
        + (F.col("distinct_tokens") / n) * 0.3
        + (1 - F.col("punct_count") / F.length(t)) * 0.2
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.2
    )
    return df.withColumn("quality_score", score)


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: argmax of per-language marker counts,
    deterministic tie-break by LANG_MARKERS order; no hits → 'und'."""
    ws = words(F.col(text_col))
    hits = {lang: _count_in(ws, vocab) for lang, vocab in LANG_MARKERS.items()}
    best = F.lit("und")
    best_n = F.lit(0)
    # iterate in reverse so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        best = F.when(hits[lang] >= best_n, F.lit(lang)).otherwise(best)
        best_n = F.when(hits[lang] >= best_n, hits[lang]).otherwise(best_n)
    return df.withColumn("lang_id", F.when(best_n > 0, best).otherwise(F.lit("und")))


def with_normalized(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text normalization for dedup/training: lowercase, strip
    non-alphanumerics to spaces, collapse runs of whitespace, trim.
    Pure codegen'd regexp work — row-local, zero shuffle."""
    t = F.lower(F.col(text_col))
    t = F.regexp_replace(t, "[^a-z0-9 ]", " ")
    t = F.regexp_replace(t, " +", " ")
    return df.withColumn("norm_text", F.trim(t))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints:
    * ``fp_md5`` — md5 of the lower-cased text (exact-dup key)
    * ``fp_roll`` — polynomial rolling hash over word hashes
      (``acc = (acc*31 + h(w)) mod 1e9+7``), order-sensitive."""
    t = F.col(text_col)
    ws = words(F.lower(t))
    roll = F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + word_hash31(w)) % F.lit(1000000007).cast("long"),
    )
    return df.withColumns(
        {"fp_md5": F.md5(F.lower(t)), "fp_roll": roll}
    )
