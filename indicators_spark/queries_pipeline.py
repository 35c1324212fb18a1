"""Training-data pipeline queries: deterministic sampling, dataset
mixture, sequence packing, and text normalization over ``documents``.

Everything here is reproducible-by-construction (content-hash decisions,
see functions/sampling.py) so the DuckDB oracle can replay each operator
bit-exactly.  These extend the north-star scope (SURVEY.md §7 / the
100 TB corpus-construction use case); the reference library has no
sampling/packing surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import sampling, similarity, text
from .queries import Query, _r, _register, round4
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
SELECT bucket, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS total_tokens
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

# --------------------------------------------------------------------- #
# End-to-end corpus-construction pipeline
# --------------------------------------------------------------------- #


def _doc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data flow as ONE declarative plan: normalize →
    quality filter → exact dedup (on normalized text) → deterministic 50%
    sample → join embeddings → per-language corpus stats.

    Scale shape: everything up to the dedup window is a row-local
    projection fused into the scan; the dedup shuffles once on the text
    hash, the embedding equi-join shuffles both sides on the id (neither
    side is broadcastable at 100 TB), and the final agg is partial-agg
    friendly.  Catalyst prunes ``documents`` to (doc_id, lang, text) and
    ``embeddings`` to (vec_id, embedding)."""
    docs = text.with_normalized(load_table(spark, sf_dir, "documents"))
    docs = docs.withColumn("toks", F.size(F.split(F.col("norm_text"), " ")))
    docs = docs.filter(F.col("toks") >= 5)
    w = Window.partitionBy(F.md5(F.col("norm_text"))).orderBy("doc_id")
    deduped = (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    sampled = sampling.hash_sample(deduped, "doc_id", 0.5, seed="pipe")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", similarity.norm(F.col("embedding")).alias("emb_norm")
    )
    joined = sampled.join(emb, sampled.doc_id == emb.vec_id)
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("total_tokens"),
            F.avg("emb_norm").alias("avg_emb_norm"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            round4(F.col("avg_emb_norm")).alias("avg_emb_norm"),
        )
    )


def _doc_pipeline_sql() -> str:
    from .queries_ext import _norm_sql

    return f"""
WITH n AS (
  SELECT doc_id, lang,
    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
         ' +', ' ', 'g')) AS norm_text
  FROM documents
),
t AS (
  SELECT *, len(string_split(norm_text, ' ')) AS toks FROM n
  WHERE len(string_split(norm_text, ' ')) >= 5
),
d AS (
  SELECT *, row_number() OVER (
    PARTITION BY md5(norm_text) ORDER BY doc_id) AS rn
  FROM t
),
s AS (
  SELECT * FROM d
  WHERE rn = 1 AND {sampling.bucket_sql('doc_id', 'pipe')} < 5000
),
j AS (
  SELECT s.lang, s.toks, {_norm_sql('e.embedding')} AS emb_norm
  FROM s JOIN embeddings e ON s.doc_id = e.vec_id
)
SELECT lang, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS total_tokens,
  {_r('avg(emb_norm)', 'avg_emb_norm')}
FROM j GROUP BY 1"""


_register(
    "doc_pipeline_corpus",
    Query(spark=_doc_pipeline, sql=_doc_pipeline_sql()),
)


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


# --------------------------------------------------------------------- #
# Trained IVF coarse quantizer: distributed k-means with exact oracle
# --------------------------------------------------------------------- #

_KM_K = 8
_KM_ITERS = 2
_KM_DIM = 64
_KM_Q = "1000000.0"


def _km_qv(expr: str) -> str:
    return (
        f"list_transform({expr}, x -> "
        f"floor(CAST(x AS DOUBLE) * {_KM_Q} + 0.500000001) / {_KM_Q})"
    )


def _km_sqd(a: str, b: str) -> str:
    terms = " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) - {b}[{i}])"
        f" * (CAST({a}[{i}] AS DOUBLE) - {b}[{i}])"
        for i in range(1, _KM_DIM + 1)
    )
    return f"0.0 + {terms}"


def _km_round(prev_cent: str, idx: int) -> str:
    """One Lloyd round: assign to nearest centroid of ``prev_cent``, then
    per-dimension means → quantized centroids ``c{idx}``."""
    return f"""
s{idx} AS (
  SELECT e.vec_id, e.embedding, c.cid,
    {_km_sqd('e.embedding', 'c.cvec')} AS d
  FROM embeddings e CROSS JOIN {prev_cent} c
),
a{idx} AS (
  SELECT vec_id, embedding, cid AS cluster FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM s{idx}
  ) WHERE rn = 1
),
m{idx} AS (
  SELECT cluster, r.pos, avg(CAST(embedding[r.pos] AS DOUBLE)) AS v
  FROM a{idx} CROSS JOIN (SELECT unnest(range(1, {_KM_DIM + 1})) AS pos) r
  GROUP BY 1, 2
),
c{idx} AS (
  SELECT cluster AS cid,
    list(floor(v * {_KM_Q} + 0.500000001) / {_KM_Q} ORDER BY pos) AS cvec
  FROM m{idx} GROUP BY 1
)"""


def _km_sql() -> str:
    rounds = ",".join(
        _km_round(f"c{i - 1}" if i > 1 else "c0", i)
        for i in range(1, _KM_ITERS + 1)
    )
    fin = _KM_ITERS + 1
    return f"""
WITH c0 AS (
  SELECT CAST(vec_id AS INT) AS cid, {_km_qv('embedding')} AS cvec
  FROM embeddings WHERE vec_id < {_KM_K}
),{rounds},
s{fin} AS (
  SELECT e.vec_id, c.cid, {_km_sqd('e.embedding', 'c.cvec')} AS d
  FROM embeddings e CROSS JOIN c{_KM_ITERS} c
)
SELECT vec_id, cluster FROM (
  SELECT vec_id, cid AS cluster,
    row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
  FROM s{fin}
) WHERE rn = 1"""


_register(
    "kmeans_train_assign",
    Query(
        spark=lambda s, d: similarity.kmeans_lloyd(
            load_table(s, d, "embeddings"), k=_KM_K, iters=_KM_ITERS
        ),
        sql=_km_sql(),
    ),
)
