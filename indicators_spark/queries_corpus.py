"""Corpus-curation queries: near-dup *clustering* (pairs → connected
components → canonical doc), BM25 relevance search, and bigram-LM
perplexity filtering (the CCNet-style quality gate).

These complete the training-data-pipeline story: `queries_ext.py` finds
near-dup PAIRS; real dedup keeps one doc per connected CLUSTER.  The
oracle replays the component computation with a recursive CTE
(label-reachability to fixpoint), which matches the Spark side exactly
because min-label propagation is also run to fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import dedup, similarity, text
from .kernels import safe_div
from .queries import Query, _r, _register, round4
from .queries_ext import _minhash_ctes
from .sources.prices import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --------------------------------------------------------------------- #
# Near-dup clusters: LSH pairs -> connected components -> canonical doc
# --------------------------------------------------------------------- #

_CC_SQL = f"""
WITH RECURSIVE {_minhash_ctes()},
pairs AS (
  SELECT ia, ib FROM cand GROUP BY ia, ib
),
edges AS (
  SELECT ia AS a, ib AS b FROM pairs
  UNION ALL
  SELECT ib AS a, ia AS b FROM pairs
),
reach AS (
  SELECT a AS id, a AS lab FROM edges
  UNION
  SELECT e.b AS id, r.lab FROM reach r JOIN edges e ON e.a = r.id
),
comp AS (
  SELECT id, min(lab) AS component FROM reach GROUP BY id
),
alldocs AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
),
sizes AS (
  SELECT component, count(*) AS cluster_size FROM alldocs GROUP BY component
)
SELECT f.doc_id, f.component, s.cluster_size,
  f.doc_id = f.component AS is_canonical
FROM alldocs f JOIN sizes s USING (component)"""

_register(
    "dedup_cc_clusters",
    Query(
        spark=lambda s, d: dedup.lsh_dedup_clusters(_docs(s, d)),
        sql=_CC_SQL,
    ),
)


# --------------------------------------------------------------------- #
# BM25 relevance search (fixed query, deterministic top-k)
# --------------------------------------------------------------------- #

#: The search query (terms from the corpus vocabulary) and BM25 constants.
BM25_TERMS: tuple[str, ...] = ("hash", "join", "vector")
BM25_K1, BM25_B, BM25_TOPK = 1.2, 0.75, 20


def bm25_topk(
    df: DataFrame,
    terms: tuple[str, ...] = BM25_TERMS,
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi-BM25 document ranking for a fixed term set, fully
    distributed and cross-engine bit-exact:

    * per-doc term frequencies come from ONE pass over the token explode
      (conditional sums — no per-term scans);
    * corpus stats (N, avgdl, per-term df) are a 1-row / k-row aggregate
      joined back by broadcast — the only "global" data;
    * the score is a FIXED-ORDER sum of per-term contributions (literal
      expression, not an aggregate), so both engines produce identical
      doubles and the rank tie-break (score desc, doc_id) agrees.

    Scale shape: token explode + one groupBy(doc) — same cost class as
    the text stats; no join ever carries document text.
    """
    ws = text.words(F.col(text_col))
    base = df.select(
        F.col(id_col), F.size(ws).alias("dl"), F.explode(ws).alias("tok")
    )
    tf_aggs = [
        F.sum(F.when(F.col("tok") == t, 1).otherwise(0)).alias(f"tf{i}")
        for i, t in enumerate(terms)
    ]
    per_doc = base.groupBy(id_col).agg(F.first("dl").alias("dl"), *tf_aggs)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    contribs = []
    for i in range(len(terms)):
        tf = F.col(f"tf{i}").cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
            + 1.0
        )
        denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        contribs.append(idf * safe_div(tf * (k1 + 1.0), denom))
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    # Global top-k WITHOUT an unpartitioned row_number window (which would
    # serialize the whole corpus through one task).  orderBy().limit(k)
    # plans as TakeOrderedAndProject: per-partition size-k heaps + a tiny
    # driver-side merge — the only scale-safe global top-k shape
    # (tests/test_plans.py pins it).  The rank window then runs over just
    # the k surviving rows.
    top = (
        scored.select(F.col(id_col), F.col("dl"), score.alias("_s"))
        .orderBy(F.col("_s").desc(), F.col(id_col))
        .limit(topk)
    )
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("_s").desc(), F.col(id_col))),
    ).select(id_col, "dl", "rank", round4(F.col("_s")).alias("bm25"))


def _bm25_sql() -> str:
    terms = BM25_TERMS
    k1, b = BM25_K1, BM25_B
    tf_aggs = ", ".join(
        f"sum(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_aggs = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    contribs = " + ".join(
        f"(ln((n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1.0)"
        f" * CASE WHEN (CAST(tf{i} AS DOUBLE) + {k1} * (1.0 - {b} + {b} *"
        f" dl / avgdl)) = 0 THEN NULL ELSE CAST(tf{i} AS DOUBLE) * ({k1} + 1.0)"
        f" / (CAST(tf{i} AS DOUBLE) + {k1} * (1.0 - {b} + {b} * dl / avgdl))"
        f" END)"
        for i in range(len(terms))
    )
    return f"""
WITH base AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
),
per_doc AS (
  SELECT doc_id, first(dl) AS dl, {tf_aggs} FROM base GROUP BY doc_id
),
stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl, {df_aggs} FROM per_doc
),
ranked AS (
  SELECT doc_id, dl, ({contribs}) AS _s,
    row_number() OVER (ORDER BY ({contribs}) DESC, doc_id) AS rank
  FROM per_doc, stats
)
SELECT doc_id, dl, rank, {_r("_s", "bm25")}
FROM ranked WHERE rank <= {BM25_TOPK}"""


_register(
    "bm25_search",
    Query(spark=lambda s, d: bm25_topk(_docs(s, d)), sql=_bm25_sql()),
)


# --------------------------------------------------------------------- #
# Bigram-LM perplexity scoring (CCNet-style corpus quality gate)
# --------------------------------------------------------------------- #


def lm_perplexity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Score each document's cross-entropy under an add-one-smoothed
    bigram LM trained on the corpus itself — the classic
    perplexity-based quality filter for LLM training data (docs the
    corpus LM finds surprising are outliers/noise).

    Distributed shape: the LM is two tiny count tables — bigram counts
    (vocab² rows) and unigram counts (vocab rows) — built with one
    groupBy each; scoring joins them back by BROADCAST, so the corpus
    rows never shuffle.  At 100 TB with a real vocab you'd hash the LM
    into buckets, but the structure (train = skinny agg, score =
    broadcast join) is exactly how it scales.
    """
    ws = text.words(F.col(text_col))
    # <2-token docs have no bigrams and drop out (sequence(1, 0) would
    # DESCEND and index past the array under ANSI — same guard as
    # text.word_ngrams).  Tokens materialize as a column first (no CSE
    # inside lambdas — an inline split() re-tokenizes per element_at).
    doc_bg = (
        df.select(F.col(id_col), ws.alias("_ws"))
        .select(
            F.col(id_col),
            F.explode(text.word_bigram_structs(F.col("_ws"))).alias("bg"),
        )
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    c12 = doc_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = doc_bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        df.select(F.explode(ws).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    neg_logp = -F.log(
        (F.col("c12") + 1.0) / (F.col("c1") + F.col("v").cast("double"))
    )
    return (
        doc_bg.join(F.broadcast(c12), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            round4(F.avg(neg_logp)).alias("cross_entropy"),
        )
    )


_LM_SQL = """
WITH doc_bg AS (
  SELECT doc_id,
    string_split(text, ' ')[i] AS w1,
    string_split(text, ' ')[i + 1] AS w2
  FROM documents,
    LATERAL (SELECT unnest(range(1, len(string_split(text, ' ')))) AS i) s
),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM doc_bg GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM doc_bg GROUP BY w1),
vocab AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
)
SELECT d.doc_id, count(*) AS n_bigrams,
  {avg_ce}
FROM doc_bg d JOIN c12 USING (w1, w2) JOIN c1 USING (w1), vocab
GROUP BY d.doc_id""".format(
    avg_ce=_r(
        "avg(-ln((c12 + 1.0) / (c1 + CAST(v AS DOUBLE))))", "cross_entropy"
    )
)

_register(
    "lm_perplexity",
    Query(spark=lambda s, d: lm_perplexity(_docs(s, d)), sql=_LM_SQL),
)


# --------------------------------------------------------------------- #
# Repetition signals + benchmark decontamination (Gopher/PaLM-style)
# --------------------------------------------------------------------- #

_register(
    "text_repetition",
    Query(
        spark=lambda s, d: text.repetition_signals(_docs(s, d)).select(
            "doc_id",
            round4(F.col("dup_word_frac")).alias("dup_word_frac"),
            round4(F.col("top_bigram_frac")).alias("top_bigram_frac"),
        ),
        sql=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
rowstats AS (
  SELECT doc_id,
    1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS dup_word_frac
  FROM w
),
bg AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS g
  FROM w WHERE len(ws) >= 2
),
bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
ba AS (SELECT doc_id, max(c) AS top_bg, sum(c) AS tot_bg FROM bc GROUP BY doc_id)
SELECT r.doc_id, {_r('r.dup_word_frac', 'dup_word_frac')},
  {_r('CAST(a.top_bg AS DOUBLE) / a.tot_bg', 'top_bigram_frac')}
FROM rowstats r JOIN ba a USING (doc_id)""",
    ),
)


#: Decontamination fixture: docs 0..9 stand in for the benchmark/eval set,
#: the rest are "training" docs screened against their 5-gram shingles.
DECON_N, DECON_BENCH_MAX_ID = 5, 10


def _decontaminate_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") < DECON_BENCH_MAX_ID)
    train = docs.filter(F.col("doc_id") >= DECON_BENCH_MAX_ID)
    return text.decontaminate_flags(train, bench, n=DECON_N)


_register(
    "decontaminate_ngram",
    Query(
        spark=_decontaminate_spark,
        sql=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
ng AS (
  SELECT doc_id,
    unnest(list_distinct(list_transform(
      range(1, len(ws) - {DECON_N - 2}),
      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]
    ))) AS g
  FROM w WHERE len(ws) >= {DECON_N}
),
bench AS (
  SELECT DISTINCT g FROM ng WHERE doc_id < {DECON_BENCH_MAX_ID}
),
hits AS (
  SELECT DISTINCT n.doc_id FROM ng n JOIN bench b USING (g)
  WHERE n.doc_id >= {DECON_BENCH_MAX_ID}
)
SELECT d.doc_id, h.doc_id IS NOT NULL AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id >= {DECON_BENCH_MAX_ID}""",
    ),
)


#: Passage-level duplication n-gram size (docs are ~100 words).
PASSAGE_N = 10

_register(
    "text_dup_passages",
    Query(
        spark=lambda s, d: text.duplicate_passage_fraction(
            _docs(s, d), n=PASSAGE_N
        ).select("doc_id", "n_grams", "dup_grams", round4(F.col("dup_frac")).alias("dup_frac")),
        sql=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
ng AS (
  SELECT doc_id,
    unnest(list_distinct(list_transform(
      range(1, len(ws) - {PASSAGE_N - 2}),
      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
           ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7] || ' ' ||
           ws[i+8] || ' ' || ws[i+9]
    ))) AS g
  FROM w WHERE len(ws) >= {PASSAGE_N}
),
gdf AS (
  SELECT g, count(*) AS gdf FROM ng GROUP BY g
),
per_doc AS (
  SELECT n.doc_id,
    CAST(count(*) AS BIGINT) AS n_grams,
    CAST(sum(CASE WHEN f.gdf > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams
  FROM ng n JOIN gdf f USING (g)
  GROUP BY n.doc_id
)
SELECT doc_id, n_grams, dup_grams,
  {_r('CAST(dup_grams AS DOUBLE) / n_grams', 'dup_frac')}
FROM per_doc""",
    ),
)


# --------------------------------------------------------------------- #
# Document chunking + quantile quality filter
# --------------------------------------------------------------------- #

CHUNK, CHUNK_OVERLAP = 64, 16
_CHUNK_STEP = CHUNK - CHUNK_OVERLAP

_register(
    "chunk_documents",
    Query(
        spark=lambda s, d: text.chunk_documents(
            _docs(s, d), chunk=CHUNK, overlap=CHUNK_OVERLAP
        ),
        sql=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
c AS (
  SELECT doc_id, ws,
    CASE WHEN len(ws) <= {CHUNK} THEN 1
         ELSE CAST(floor((len(ws) - {CHUNK} + {_CHUNK_STEP - 1}) / {_CHUNK_STEP}) AS BIGINT) + 1
    END AS nch
  FROM w
),
e AS (
  SELECT doc_id, ws, unnest(range(0, nch)) AS chunk_id FROM c
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
  array_to_string(ws[chunk_id * {_CHUNK_STEP} + 1 : chunk_id * {_CHUNK_STEP} + {CHUNK}], ' ') AS chunk_text,
  CAST(len(ws[chunk_id * {_CHUNK_STEP} + 1 : chunk_id * {_CHUNK_STEP} + {CHUNK}]) AS BIGINT) AS n_tokens
FROM e""",
    ),
)


#: Same 4dp quantization as queries.round4, applied to score AND cutoff so
#: the >= boundary agrees cross-engine.
_QQ = 0.2
_QSCORE_SQL = """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
),
m AS (
  SELECT doc_id, text, ws,
    CAST(len(ws) AS DOUBLE) AS n,
    len(list_distinct(ws)) AS dt,
    length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct,
    len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is','it'))) AS stop
  FROM t
),
scored AS (
  SELECT doc_id,
    floor((least(n / 50, 1.0) * 0.3 + (dt / n) * 0.3
           + (1 - punct / length(text)) * 0.2
           + least(stop / n * 4, 1.0) * 0.2) * 1e4 + 0.500000001) / 1e4
      AS quality_score
  FROM m
),
cut AS (
  SELECT floor(quantile_cont(quality_score, {q}) * 1e4 + 0.500000001) / 1e4 AS c
  FROM scored
)
SELECT s.doc_id, s.quality_score
FROM scored s, cut WHERE s.quality_score >= cut.c"""

_register(
    "filter_quality_quantile",
    Query(
        spark=lambda s, d: text.filter_by_quality_quantile(
            _docs(s, d), q=_QQ
        ).select("doc_id", "quality_score"),
        sql=_QSCORE_SQL.format(q=_QQ),
    ),
)


#: Sketch-path twin of `filter_quality_quantile`: min_rows=0 forces the
#: at-scale branch and estimator="kmv" picks the deterministic bottom-k
#: sample cutoff (md5(doc_id) order), so the DISPATCHED path itself runs
#: under the full value-hash oracle — percentile_approx couldn't (DuckDB
#: has no replay of Spark's t-digest), the KMV sample replays exactly.
_KMV_Q_K = 128
_QSCORE_SKETCH_SQL = """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
),
m AS (
  SELECT doc_id, text, ws,
    CAST(len(ws) AS DOUBLE) AS n,
    len(list_distinct(ws)) AS dt,
    length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct,
    len(list_filter(ws, x -> x IN ('the','a','of','and','to','in','is','it'))) AS stop
  FROM t
),
scored AS (
  SELECT doc_id,
    floor((least(n / 50, 1.0) * 0.3 + (dt / n) * 0.3
           + (1 - punct / length(text)) * 0.2
           + least(stop / n * 4, 1.0) * 0.2) * 1e4 + 0.500000001) / 1e4
      AS quality_score
  FROM m
),
sk AS (
  SELECT quality_score AS v,
    row_number() OVER (
      ORDER BY md5(CAST(doc_id AS VARCHAR)), quality_score) AS rn
  FROM scored
),
cut AS (
  SELECT floor(quantile_cont(v, {q}) * 1e4 + 0.500000001) / 1e4 AS c
  FROM sk WHERE rn <= {k}
)
SELECT s.doc_id, s.quality_score
FROM scored s, cut WHERE s.quality_score >= cut.c"""

_register(
    "filter_quality_quantile_sketch",
    Query(
        spark=lambda s, d: text.filter_by_quality_quantile(
            _docs(s, d), q=_QQ, min_rows=0, estimator="kmv", k=_KMV_Q_K
        ).select("doc_id", "quality_score"),
        sql=_QSCORE_SKETCH_SQL.format(q=_QQ, k=_KMV_Q_K),
    ),
)


_register(
    "text_bpe_tokens",
    Query(
        spark=lambda s, d: text.with_bpe_token_count(_docs(s, d)).select(
            "doc_id", F.col("bpe_token_count").cast("long").alias("bpe_token_count")
        ),
        sql=f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{text.BPE_TOKEN_RE}')) AS BIGINT)
    AS bpe_token_count
FROM documents""",
    ),
)


def _quant_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.similarity import quantize_embeddings_int8

    return quantize_embeddings_int8(load_table(spark, sf_dir, "embeddings"))


_register(
    "embedding_quantize_int8",
    Query(
        spark=_quant_spark,
        sql="""
WITH m AS (
  SELECT vec_id, embedding,
    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
  FROM embeddings
),
e AS (
  SELECT vec_id, mx,
    unnest(range(0, len(embedding))) AS pos,
    unnest(embedding) AS val
  FROM m
)
SELECT vec_id, CAST(pos AS BIGINT) AS pos,
  CAST(CASE WHEN mx = 0 THEN 0
            ELSE floor(CAST(val AS DOUBLE) * 127.0 / mx + 0.5) END AS BIGINT)
    AS qval
FROM e""",
    ),
)


_TFIDF_T = 0.9


def _tfidf_sql(max_df_frac: float | None = None) -> str:
    """One generator for both TF-IDF oracles: ``max_df_frac`` adds the
    vocabulary prune predicate (the only difference between the plain and
    pruned variants — keeping a single source of truth for the weighting
    pipeline)."""
    prune = f"df <= n * {max_df_frac} AND " if max_df_frac is not None else ""
    return f"""
WITH tf AS (
  SELECT doc_id AS id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
wtd AS (
  SELECT id, t.tok, tf * ln(CAST(n AS DOUBLE) / df) AS w
  FROM tf t JOIN dfreq f ON f.tok = t.tok, nd
  WHERE {prune}tf * ln(CAST(n AS DOUBLE) / df) > 0
),
norms AS (SELECT id, sqrt(sum(w * w)) AS nn FROM wtd GROUP BY id),
wn AS (SELECT w.id, w.tok, w.w / nm.nn AS wn FROM wtd w JOIN norms nm ON nm.id = w.id),
p AS (
  SELECT a.id AS ia, b.id AS ib, sum(a.wn * b.wn) AS cos
  FROM wn a JOIN wn b ON a.tok = b.tok AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT ia, ib, {_r('cos', 'cos')} FROM p WHERE cos >= {_TFIDF_T}"""


_register(
    "tfidf_cosine_pairs",
    Query(
        spark=lambda s, d: similarity.tfidf_cosine_pairs(
            _docs(s, d), threshold=_TFIDF_T
        ).select("ia", "ib", round4(F.col("cos")).alias("cos")),
        sql=_tfidf_sql(),
    ),
)


# --------------------------------------------------------------------- #
# Incremental-ingest dedup: new batch vs historical fingerprint table
# --------------------------------------------------------------------- #

#: Docs below this id play the "historical corpus"; the rest are the batch.
INCR_SPLIT_ID = 250


def _dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    hist = docs.filter(F.col("doc_id") < INCR_SPLIT_ID).select(
        F.md5("text").alias("fp")
    )
    batch = docs.filter(F.col("doc_id") >= INCR_SPLIT_ID)
    return dedup.dedup_against_corpus(batch, hist).select("doc_id")


_register(
    "dedup_incremental",
    Query(
        spark=_dedup_incremental,
        sql=f"""
WITH hist AS (
  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id < {INCR_SPLIT_ID}
),
batch AS (
  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id >= {INCR_SPLIT_ID}
),
fresh AS (
  SELECT b.doc_id, b.fp FROM batch b
  WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = b.fp)
)
SELECT doc_id FROM fresh f
WHERE doc_id = (SELECT min(doc_id) FROM fresh g WHERE g.fp = f.fp)""",
    ),
)


# Compressibility signal: no zlib in DuckDB SQL, so this is the catalog's
# one deliberate rows-only entry (sql=None → the driver records the weaker
# check); determinism is pinned by tests/test_functions.py instead.
_register(
    "text_compression_ratio",
    Query(
        spark=lambda s, d: text.with_compression_ratio(_docs(s, d)).select(
            "doc_id", round4(F.col("compression_ratio")).alias("compression_ratio")
        ),
        sql=None,
    ),
)


# --------------------------------------------------------------------- #
# RAG-style retrieval pipeline: dedup -> chunk -> embed-join -> top-k
# --------------------------------------------------------------------- #

RAG_TOPK, RAG_NQ = 3, 5


def _rag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end retrieval composition over library primitives: exact
    dedup keeps one doc per text, survivors are chunked (64/16), chunks
    inherit their document embedding, and each of the first RAG_NQ query
    vectors retrieves its RAG_TOPK nearest chunks by cosine.

    Scale shape: the query side (RAG_NQ rows) broadcasts, so scoring is a
    map over the chunk stream; ranking partitions by query id (parallel
    across queries — at real scale replace the per-query window with a
    per-query TakeOrdered/limit).  Dedup/chunk shapes as in their
    standalone operators."""
    from .functions.similarity import dot, norm
    from pyspark.sql import Window as W

    docs = _docs(spark, sf_dir)
    kept = dedup.exact_dedup(docs)
    chunks = text.chunk_documents(kept, chunk=64, overlap=16).select(
        "doc_id", "chunk_id"
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    base = chunks.join(emb, "doc_id")
    q = emb.filter(F.col("doc_id") < RAG_NQ).select(
        F.col("doc_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    joined = base.crossJoin(F.broadcast(q)).filter(F.col("doc_id") != F.col("qid"))
    cos = dot(F.col("qvec"), F.col("embedding")) / F.nullif(
        norm(F.col("qvec")) * norm(F.col("embedding")), F.lit(0.0)
    )
    w = W.partitionBy("qid").orderBy(F.col("_cos").desc(), "doc_id", "chunk_id")
    return (
        joined.withColumn("_cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= RAG_TOPK)
        .select("qid", "doc_id", "chunk_id", "rank", round4(F.col("_cos")).alias("cos"))
    )


def _rag_sql() -> str:
    from .queries_ext import _dot_sql, _norm_sql

    step, chunk = 48, 64
    return f"""
WITH kept AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
w AS (
  SELECT d.doc_id, string_split(d.text, ' ') AS ws
  FROM documents d JOIN kept k ON k.doc_id = d.doc_id
),
c AS (
  SELECT doc_id,
    CASE WHEN len(ws) <= {chunk} THEN 1
         ELSE CAST(floor((len(ws) - {chunk} + {step - 1}) / {step}) AS BIGINT) + 1
    END AS nch
  FROM w
),
ch AS (
  SELECT doc_id, CAST(t.f AS BIGINT) AS chunk_id
  FROM c, unnest(range(0, nch)) AS t(f)
),
base AS (
  SELECT c2.doc_id, c2.chunk_id, e.embedding,
         {_norm_sql('e.embedding')} AS nn
  FROM ch c2 JOIN embeddings e ON e.vec_id = c2.doc_id
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec, {_norm_sql('embedding')} AS qn
  FROM embeddings WHERE vec_id < {RAG_NQ}
),
s AS (
  SELECT q.qid, b.doc_id, b.chunk_id,
    ({_dot_sql('q.qvec', 'b.embedding')}) / (q.qn * b.nn) AS cos
  FROM base b, q WHERE b.doc_id != q.qid
),
r AS (
  SELECT qid, doc_id, chunk_id, cos,
    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, doc_id, chunk_id) AS rank
  FROM s
)
SELECT qid, doc_id, chunk_id, CAST(rank AS INT) AS rank, {_r('cos', 'cos')}
FROM r WHERE rank <= {RAG_TOPK}"""


_register(
    "rag_pipeline",
    Query(spark=_rag_pipeline, sql=_rag_sql()),
)


def _semdedup_sql(max_cell_size: int | None = None) -> str:
    from .queries_ext import _dot_sql, _norm_sql

    if max_cell_size is None:
        pair_src = "cells"
        cap_cte = ""
    else:
        pair_src = "capped"
        cap_cte = f""",
capped AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY cell ORDER BY vec_id
    ) AS crn FROM cells
  ) WHERE crn <= {max_cell_size}
)"""
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cv, {_norm_sql('embedding')} AS cn
  FROM embeddings WHERE vec_id < 16
),
scored AS (
  SELECT e.vec_id, e.embedding, c.cid,
    ({_dot_sql('e.embedding', 'c.cv')}) / ({_norm_sql('e.embedding')} * c.cn) AS cos
  FROM embeddings e, cent c
),
cells AS (
  SELECT vec_id, embedding, cid AS cell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cos DESC, cid
    ) AS rn FROM scored
  ) WHERE rn = 1
){cap_cte},
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM {pair_src} a JOIN {pair_src} b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE ({_dot_sql('a.embedding', 'b.embedding')})
        / ({_norm_sql('a.embedding')} * {_norm_sql('b.embedding')}) >= 0.4
)
SELECT e.vec_id FROM embeddings e
WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.vec_id = e.vec_id)"""


_register(
    "semantic_dedup",
    Query(
        spark=lambda s, d: similarity.semantic_dedup(
            load_table(s, d, "embeddings"), threshold=0.4
        ),
        sql=_semdedup_sql(),
    ),
)


def _lang_margin_sql() -> str:
    hit_exprs = ", ".join(
        f"len(list_filter(ws, x -> x IN ({', '.join(repr(w) for w in vocab)})))"
        for vocab in text.LANG_MARKERS.values()
    )
    k = len(text.LANG_MARKERS)
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
h AS (
  SELECT doc_id, list_sort([{hit_exprs}]) AS srt FROM t
)
SELECT doc_id, CAST(srt[{k}] - srt[{k - 1}] AS BIGINT) AS lang_margin FROM h"""


_register(
    "text_lang_margin",
    Query(
        spark=lambda s, d: text.with_lang_margin(_docs(s, d)).select(
            "doc_id", "lang_margin"
        ),
        sql=_lang_margin_sql(),
    ),
)


# --------------------------------------------------------------------- #
# Round-3 adversarial-bound variants: the capped paths, oracle-verified
# (the caps are deterministic lowest-id samples, so DuckDB row_number
# replicates them exactly).
# --------------------------------------------------------------------- #

#: Cell cap small enough to bind on the sf0.01 embeddings (500 vectors /
#: 16 cells ≈ 31 per cell).
_SEMDEDUP_CELL_CAP = 20

_register(
    "semantic_dedup_capped",
    Query(
        spark=lambda s, d: similarity.semantic_dedup(
            load_table(s, d, "embeddings"),
            threshold=0.4,
            max_cell_size=_SEMDEDUP_CELL_CAP,
        ),
        sql=_semdedup_sql(_SEMDEDUP_CELL_CAP),
    ),
)


_register(
    "tfidf_cosine_pairs_pruned",
    Query(
        spark=lambda s, d: similarity.tfidf_cosine_pairs(
            _docs(s, d), threshold=_TFIDF_T, max_df_frac=0.5
        ).select("ia", "ib", round4(F.col("cos")).alias("cos")),
        sql=_tfidf_sql(max_df_frac=0.5),
    ),
)


def _pii_sql() -> str:
    """Sequential redaction replayed relationally: pattern i counts/
    replaces on the text already redacted by patterns 1..i-1, exactly
    like the Spark chain."""
    t = "text"
    counts = []
    for name, pat, token in text.PII_PATTERNS:
        p = pat.replace("'", "''")
        counts.append(
            f"CAST(len(regexp_extract_all({t}, '{p}')) AS BIGINT)"
            f" AS pii_{name}_count"
        )
        t = f"regexp_replace({t}, '{p}', '{token}', 'g')"
    total = " + ".join(f"pii_{n}_count" for n, _, _ in text.PII_PATTERNS)
    cols = ", ".join(counts)
    return f"""
WITH r AS (
  SELECT doc_id, {cols}, {t} AS redacted FROM documents
)
SELECT doc_id, pii_email_count, pii_ssn_count, pii_ipv4_count,
  pii_phone_count, CAST({total} AS BIGINT) AS pii_total_count, redacted
FROM r"""


_register(
    "text_redact_pii",
    Query(
        spark=lambda s, d: text.redact_pii(_docs(s, d)).select(
            "doc_id",
            "pii_email_count",
            "pii_ssn_count",
            "pii_ipv4_count",
            "pii_phone_count",
            "pii_total_count",
            "redacted",
        ),
        sql=_pii_sql(),
    ),
)


_register(
    "chunk_dedup_stats",
    Query(
        spark=lambda s, d: text.chunk_dedup_exact(
            _docs(s, d), chunk=CHUNK, overlap=CHUNK_OVERLAP
        ).select(
            "doc_id",
            "n_chunks",
            "kept_chunks",
            round4(F.col("kept_frac")).alias("kept_frac"),
        ),
        sql=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
c AS (
  SELECT doc_id, ws,
    CASE WHEN len(ws) <= {CHUNK} THEN 1
         ELSE CAST(floor((len(ws) - {CHUNK} + {_CHUNK_STEP - 1}) / {_CHUNK_STEP}) AS BIGINT) + 1
    END AS nch
  FROM w
),
e AS (
  SELECT doc_id, ws, unnest(range(0, nch)) AS chunk_id FROM c
),
ch AS (
  SELECT doc_id, chunk_id,
    array_to_string(ws[chunk_id * {_CHUNK_STEP} + 1 : chunk_id * {_CHUNK_STEP} + {CHUNK}], ' ') AS chunk_text
  FROM e
),
k AS (
  SELECT doc_id, chunk_id,
    row_number() OVER (PARTITION BY chunk_text ORDER BY doc_id, chunk_id) AS rn
  FROM ch
),
per_doc AS (
  SELECT doc_id,
    CAST(count(*) AS BIGINT) AS n_chunks,
    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks
  FROM k GROUP BY doc_id
)
SELECT doc_id, n_chunks, kept_chunks,
  {_r("CAST(kept_chunks AS DOUBLE) / n_chunks", "kept_frac")} FROM per_doc""",
    ),
)


# --------------------------------------------------------------------- #
# Corpus vocabulary + cross-source overlap (round 3)
# --------------------------------------------------------------------- #

_VOCAB_TOP_K = 100

_register(
    "corpus_vocab_stats",
    Query(
        spark=lambda s, d: text.vocab_stats(_docs(s, d), top_k=_VOCAB_TOP_K).select(
            "rank", "tok", "cnt", "docs", round4(F.col("share")).alias("share")
        ),
        sql=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
stats AS (
  SELECT tok, count(*) AS cnt, count(DISTINCT doc_id) AS docs
  FROM toks GROUP BY tok
),
tot AS (SELECT count(*) AS n FROM toks),
ranked AS (
  SELECT tok, cnt, docs,
    row_number() OVER (ORDER BY cnt DESC, tok) AS rank
  FROM stats
)
SELECT rank, tok, cnt, docs, {_r('CAST(cnt AS DOUBLE) / n', 'share')}
FROM ranked CROSS JOIN tot WHERE rank <= {_VOCAB_TOP_K}""",
    ),
)

#: Cross-source overlap n-gram size.
_OVERLAP_N = 5


def _overlap_gram_sql() -> str:
    concat = " || ' ' || ".join(f"ws[i+{j}]" for j in range(_OVERLAP_N))
    return (
        f"list_transform(range(1, len(ws) - {_OVERLAP_N - 2}), i -> {concat})"
    )


_register(
    "source_overlap_matrix",
    Query(
        spark=lambda s, d: text.source_ngram_overlap(
            _docs(s, d), n=_OVERLAP_N
        ).select(
            "sa", "sb", "n_shared", "na", "nb",
            round4(F.col("jaccard")).alias("jaccard"),
        ),
        sql=f"""
WITH w AS (
  SELECT source, string_split(text, ' ') AS ws FROM documents
),
g AS (
  SELECT DISTINCT source AS src, unnest({_overlap_gram_sql()}) AS g
  FROM w WHERE len(ws) >= {_OVERLAP_N}
),
sizes AS (SELECT src, count(*) AS sz FROM g GROUP BY src),
shared AS (
  SELECT a.src AS sa, b.src AS sb, count(*) AS n_shared
  FROM g a JOIN g b ON a.g = b.g AND a.src < b.src
  GROUP BY 1, 2
)
SELECT s.sa, s.sb, s.n_shared, za.sz AS na, zb.sz AS nb,
  {_r('CAST(s.n_shared AS DOUBLE) / (za.sz + zb.sz - s.n_shared)', 'jaccard')}
FROM shared s
JOIN sizes za ON za.src = s.sa
JOIN sizes zb ON zb.src = s.sb""",
    ),
)


# --------------------------------------------------------------------- #
# Mergeable HLL distinct sketches (rows-only: engine-specific sketch
# family; exactness bounds pinned in tests/test_functions.py)
# --------------------------------------------------------------------- #

from .functions import sketches as _sketches  # noqa: E402


def _hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return _sketches.hll_distinct_rollup(ev).orderBy("day")


_register(
    "stats_hll_rollup",
    Query(spark=_hll_rollup, sql=None),
)


# --------------------------------------------------------------------- #
# Information-theoretic corpus signals + weighted sampling (round 3)
# --------------------------------------------------------------------- #

from .functions import sampling as _sampling  # noqa: E402

_register(
    "text_entropy",
    Query(
        spark=lambda s, d: text.doc_token_entropy(_docs(s, d)).select(
            "doc_id", "n_tokens", round4(F.col("entropy")).alias("entropy")
        ),
        sql=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
pd AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
    sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS s
  FROM tc GROUP BY 1
)
SELECT doc_id, n_tokens,
  {_r('ln(CAST(n_tokens AS DOUBLE)) - s / n_tokens', 'entropy')}
FROM pd""",
    ),
)

_register(
    "source_kl_divergence",
    Query(
        spark=lambda s, d: text.source_kl_divergence(_docs(s, d)).select(
            "source", "n_tokens", round4(F.col("kl")).alias("kl")
        ),
        sql=f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
),
sc AS (SELECT source AS src, tok, count(*) AS cs FROM toks GROUP BY 1, 2),
cc AS (SELECT tok, count(*) AS cq FROM toks GROUP BY 1),
totals AS (SELECT src, CAST(sum(cs) AS BIGINT) AS ts FROM sc GROUP BY 1),
tq AS (SELECT count(*) AS tq FROM toks),
terms AS (
  SELECT sc.src, totals.ts,
    (CAST(sc.cs AS DOUBLE) / totals.ts)
      * ln((CAST(sc.cs AS DOUBLE) / totals.ts)
           / (CAST(cc.cq AS DOUBLE) / tq.tq)) AS term
  FROM sc JOIN cc USING (tok) JOIN totals USING (src) CROSS JOIN tq
)
SELECT src AS source, CAST(max(ts) AS BIGINT) AS n_tokens,
  {_r('sum(term)', 'kl')}
FROM terms GROUP BY src""",
    ),
)

_register(
    "sample_weighted_aes",
    Query(
        spark=lambda s, d: _sampling.weighted_sample(
            _docs(s, d), key="doc_id", weight_col="n_chars", k=50
        ).select(
            "doc_id", "n_chars", round4(F.col("aes_score")).alias("aes_score")
        ),
        sql=f"""
WITH s AS (
  SELECT doc_id, n_chars,
    ln({_sampling.unit_sql('doc_id', 'w42')})
      / CAST(n_chars AS DOUBLE) AS aes_score
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_chars, {_r('aes_score', 'aes_score')}
FROM (
  -- order/limit on the RAW score in a subquery: in the outer SELECT the
  -- name aes_score resolves to the ROUNDED output alias, which would
  -- reorder ties differently from Spark's raw-score top-k
  SELECT * FROM s ORDER BY aes_score DESC, doc_id LIMIT 50
)""",
    ),
)
