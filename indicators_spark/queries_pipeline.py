"""Training-data pipeline queries: deterministic sampling, dataset
mixture, sequence packing, and text normalization over ``documents``.

Everything here is reproducible-by-construction (content-hash decisions,
see functions/sampling.py) so the DuckDB oracle can replay each operator
bit-exactly.  These extend the north-star scope (SURVEY.md §7 / the
100 TB corpus-construction use case); the reference library has no
sampling/packing surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import sampling, text
from .queries import Query, _register
from .sources.prices import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --------------------------------------------------------------------- #
# Uniform deterministic sample
# --------------------------------------------------------------------- #

_register(
    "sample_hash_10pct",
    Query(
        spark=lambda s, d: sampling.hash_sample(
            _docs(s, d), "doc_id", 0.10
        ).select("doc_id", "source", "n_chars"),
        sql=f"""
SELECT doc_id, source, n_chars
FROM documents
WHERE {sampling.bucket_sql('doc_id', 's42')} < 1000""",
    ),
)


# --------------------------------------------------------------------- #
# Stratified (per-source) sample = mixture weights
# --------------------------------------------------------------------- #

_RATES = {"src0": 0.5, "src1": 0.5, "src2": 0.25, "src3": 0.25}
_DEFAULT_RATE = 0.05

_register(
    "sample_stratified_sources",
    Query(
        spark=lambda s, d: sampling.stratified_sample(
            _docs(s, d), "doc_id", "source", _RATES, _DEFAULT_RATE
        ).select("doc_id", "source", "lang"),
        sql=f"""
SELECT doc_id, source, lang
FROM documents
WHERE {sampling.bucket_sql('doc_id', 's42')} <
  CASE WHEN source IN ('src0', 'src1') THEN 5000
       WHEN source IN ('src2', 'src3') THEN 2500
       ELSE 500 END""",
    ),
)


# --------------------------------------------------------------------- #
# Weighted two-way mixture (sample + tag + union + summarize)
# --------------------------------------------------------------------- #


def _mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compose a corpus as 50% of English docs + 10% of everything else,
    then summarize the blend.  The union of two hash-sampled branches of
    the same scan stays a single-pass plan (no shuffle until the final
    1-row agg)."""
    docs = _docs(spark, sf_dir)
    toks = F.size(F.split(F.col("text"), " "))
    hi = sampling.hash_sample(
        docs.filter(F.col("lang") == "en"), "doc_id", 0.5, seed="mix"
    ).withColumn("bucket", F.lit("en_half"))
    lo = sampling.hash_sample(
        docs.filter(F.col("lang") != "en"), "doc_id", 0.1, seed="mix"
    ).withColumn("bucket", F.lit("rest_tenth"))
    return (
        hi.unionByName(lo)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("total_tokens"),
        )
    )


_register(
    "mixture_weighted",
    Query(
        spark=_mixture,
        sql=f"""
WITH tagged AS (
  SELECT CASE WHEN lang = 'en' THEN 'en_half' ELSE 'rest_tenth' END AS bucket,
         len(string_split(text, ' ')) AS toks
  FROM documents
  WHERE ({sampling.bucket_sql('doc_id', 'mix')} <
         CASE WHEN lang = 'en' THEN 5000 ELSE 1000 END)
)
SELECT bucket, count(*) AS n_docs, sum(toks) AS total_tokens
FROM tagged GROUP BY 1""",
    ),
)


# --------------------------------------------------------------------- #
# Sequence packing into fixed token budgets
# --------------------------------------------------------------------- #


def _pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn(
        "tokens", F.size(F.split(F.col("text"), " "))
    )
    packed = sampling.pack_sequences(
        docs, shard="lang", order="doc_id", tokens="tokens", capacity=512
    )
    return packed.select("doc_id", "lang", "tokens", "pack_id")


_register(
    "pack_sequences_512",
    Query(
        spark=_pack,
        sql="""
WITH t AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS tokens FROM documents
)
SELECT doc_id, lang, tokens,
  CAST(floor(coalesce(sum(tokens) OVER (
    PARTITION BY lang ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0) AS BIGINT)
  AS pack_id
FROM t""",
    ),
)


# --------------------------------------------------------------------- #
# Text normalization
# --------------------------------------------------------------------- #

_register(
    "text_normalize",
    Query(
        spark=lambda s, d: text.with_normalized(_docs(s, d)).select(
            "doc_id", "norm_text"
        ),
        sql="""
SELECT doc_id,
  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
       ' +', ' ', 'g')) AS norm_text
FROM documents""",
    ),
)
