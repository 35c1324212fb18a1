"""Round-5 catalog additions: exact substring (repeated-span) dedup —
the Lee et al. 2021 ExactSubstr family (cross-document repeated-passage
removal, the span-level complement to whole-doc fingerprint dedup).

Registered AFTER every prior module so the never-green-first budget
ordering keeps the round-4 spillover queries at the head of the driver's
verification list (VERDICT r4 #1/#4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import dedup, sampling
from .queries import Query, _r, _register, round4
from .sources.prices import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


#: Minimum duplicated-span length in words.  The paper uses 50 BPE
#: tokens on real corpora; the synthetic docs are ~55 words, so 10 keeps
#: the operator exercised (≈2k duplicated positions at sf0.01).
SUBSTR_N = 10


def _gram_expr(n: int) -> str:
    """DuckDB n-gram string for position ``i`` (1-based list index)."""
    parts = ["ws[i]"] + [f"ws[i+{j}]" for j in range(1, n)]
    return " || ' ' || ".join(parts)


#: Duplicated-seed CTEs: audit policy (every occurrence of a repeated
#: gram) vs removal policy (all but the globally-first copy survive).
_DUP_ALL = """
occ AS (
  SELECT g, count(*) AS occ FROM ng GROUP BY g
),
dup AS (
  SELECT n2.doc_id, n2.pos FROM ng n2 JOIN occ o USING (g) WHERE o.occ > 1
)"""

_DUP_KEEP_FIRST = """
ranked AS (
  SELECT doc_id, pos,
    row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
  FROM ng
),
dup AS (
  SELECT doc_id, pos FROM ranked WHERE rn > 1
)"""

#: Shared gram + interval-merge skeleton (parameterized on the seed CTEs).
_NG_CTES = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
ng AS (
  SELECT doc_id,
    unnest(range(1, len(ws) - {SUBSTR_N - 2})) AS pos,
    unnest(list_transform(range(1, len(ws) - {SUBSTR_N - 2}),
      i -> {_gram_expr(SUBSTR_N)})) AS g
  FROM w WHERE len(ws) >= {SUBSTR_N}
),"""

_MERGE_CTES = f"""
lagged AS (
  SELECT doc_id, pos,
    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_pos
  FROM dup
),
runs AS (
  SELECT doc_id, pos,
    sum(CASE WHEN pos - prev_pos > {SUBSTR_N} THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS rid
  FROM lagged
),
spans AS (
  SELECT doc_id,
    CAST(min(pos) AS BIGINT) AS span_start,
    CAST(max(pos) + {SUBSTR_N - 1} AS BIGINT) AS span_end
  FROM runs GROUP BY doc_id, rid
)"""

_SPANS_SELECT = """
SELECT doc_id, span_start, span_end,
  CAST(span_end - span_start + 1 AS BIGINT) AS span_words
FROM spans"""


_register(
    "dedup_substring_spans",
    Query(
        spark=lambda s, d: dedup.substring_dup_spans(_docs(s, d), n=SUBSTR_N),
        sql=_NG_CTES + _DUP_ALL + "," + _MERGE_CTES + _SPANS_SELECT,
    ),
)

_register(
    "dedup_substring_keep_first",
    Query(
        spark=lambda s, d: dedup.substring_dup_spans(
            _docs(s, d), n=SUBSTR_N, keep_first=True
        ),
        sql=_NG_CTES + _DUP_KEEP_FIRST + "," + _MERGE_CTES + _SPANS_SELECT,
    ),
)


#: Boilerplate-gram guard variant: grams in > max_df_frac of the corpus'
#: documents are pruned BEFORE occurrence analysis (the ExactSubstr
#: skew kill — no posting list hotter than that fraction ever becomes
#: window state).  0.004 of 500 sf0.01 docs = ban df ≥ 3 grams, so the
#: prune demonstrably fires (max synthetic gram df is 3) while df=2
#: passages still produce spans.  Oracle mirrors the prune on raw grams.
SUBSTR_MAX_DF = 0.004

_PRUNED_SQL = (
    _NG_CTES
    + f"""
banned AS (
  SELECT g FROM ng GROUP BY g
  HAVING count(DISTINCT doc_id) >
    (SELECT count(DISTINCT doc_id) FROM documents) * {SUBSTR_MAX_DF}
),
ngp AS (
  SELECT n0.doc_id, n0.pos, n0.g FROM ng n0
  WHERE NOT EXISTS (SELECT 1 FROM banned b WHERE b.g = n0.g)
),
occ AS (
  SELECT g, count(*) AS occ FROM ngp GROUP BY g
),
dup AS (
  SELECT n2.doc_id, n2.pos FROM ngp n2 JOIN occ o USING (g) WHERE o.occ > 1
),"""
    + _MERGE_CTES.lstrip()
    + _SPANS_SELECT
)

_register(
    "dedup_substring_spans_pruned",
    Query(
        spark=lambda s, d: dedup.substring_dup_spans(
            _docs(s, d), n=SUBSTR_N, max_df_frac=SUBSTR_MAX_DF
        ),
        sql=_PRUNED_SQL,
    ),
)


_STATS_SQL = (
    _NG_CTES
    + _DUP_ALL
    + ","
    + _MERGE_CTES
    + f""",
per_doc AS (
  SELECT doc_id, sum(span_end - span_start + 1) AS dw FROM spans GROUP BY doc_id
)
SELECT w.doc_id,
  CAST(len(w.ws) AS BIGINT) AS n_words,
  CAST(coalesce(p.dw, 0) AS BIGINT) AS dup_words,
  {_r('CAST(coalesce(p.dw, 0) AS DOUBLE) / len(w.ws)', 'dup_frac')}
FROM w LEFT JOIN per_doc p USING (doc_id)
WHERE len(w.ws) >= {SUBSTR_N}"""
)

#: Docs below this id play the "historical corpus"; the rest are the
#: batch (same split convention as `dedup_incremental`).
SUBSTR_SPLIT_ID = 250

_INCR_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
ng AS (
  SELECT doc_id,
    unnest(range(1, len(ws) - {SUBSTR_N - 2})) AS pos,
    unnest(list_transform(range(1, len(ws) - {SUBSTR_N - 2}),
      i -> {_gram_expr(SUBSTR_N)})) AS g
  FROM w WHERE len(ws) >= {SUBSTR_N}
),
hist AS (
  SELECT DISTINCT g FROM ng WHERE doc_id < {SUBSTR_SPLIT_ID}
),
dup AS (
  SELECT n2.doc_id, n2.pos FROM ng n2
  WHERE n2.doc_id >= {SUBSTR_SPLIT_ID}
    AND EXISTS (SELECT 1 FROM hist h WHERE h.g = n2.g)
),{_MERGE_CTES.lstrip()}{_SPANS_SELECT}"""


def _substr_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    hist = docs.filter(F.col("doc_id") < SUBSTR_SPLIT_ID)
    batch = docs.filter(F.col("doc_id") >= SUBSTR_SPLIT_ID)
    return dedup.substring_dedup_against_corpus(batch, hist, n=SUBSTR_N)


_register(
    "dedup_substring_incremental",
    Query(spark=_substr_incremental, sql=_INCR_SQL),
)


#: Cleaned-corpus transform: cut the keep-first spans out of every doc.
#: Token-level replay in the oracle (zipped unnest + span anti join);
#: spans are disjoint so the LEFT JOIN matches each token at most once.
_CLEAN_SQL = (
    _NG_CTES
    + _DUP_KEEP_FIRST
    + ","
    + _MERGE_CTES
    + """,
alltok AS (
  SELECT doc_id,
    unnest(range(1, len(ws) + 1)) AS i,
    unnest(ws) AS wd
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
),
kept AS (
  SELECT t.doc_id, t.i, t.wd
  FROM alltok t
  LEFT JOIN spans s
    ON s.doc_id = t.doc_id AND t.i BETWEEN s.span_start AND s.span_end
  WHERE s.doc_id IS NULL
),
agg AS (
  SELECT doc_id,
    string_agg(wd, ' ' ORDER BY i) AS ct,
    count(*) AS kept_n
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
  CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(a.ct, '') END
    AS clean_text,
  CAST(coalesce(len(string_split(d.text, ' ')) - coalesce(a.kept_n, 0), 0)
    AS BIGINT) AS n_removed
FROM documents d LEFT JOIN agg a USING (doc_id)"""
)

_register(
    "dedup_substring_clean",
    Query(
        spark=lambda s, d: dedup.substring_dedup_clean(_docs(s, d), n=SUBSTR_N),
        sql=_CLEAN_SQL,
    ),
)


_register(
    "dedup_substring_stats",
    Query(
        spark=lambda s, d: dedup.substring_dup_stats(
            _docs(s, d), n=SUBSTR_N
        ).select(
            "doc_id",
            "n_words",
            "dup_words",
            round4(F.col("dup_frac")).alias("dup_frac"),
        ),
        sql=_STATS_SQL,
    ),
)


# --------------------------------------------------------------------- #
# Per-source document cap (C4/GPT-style per-domain clip)
# --------------------------------------------------------------------- #

CAP_K, CAP_SEED = 40, "cap42"

_register(
    "sample_cap_per_source",
    Query(
        spark=lambda s, d: sampling.cap_per_key(
            _docs(s, d), group="source", key="doc_id", k=CAP_K, seed=CAP_SEED
        ).select("doc_id", "source"),
        sql=f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
    row_number() OVER (
      PARTITION BY source
      ORDER BY {sampling.unit_sql('doc_id', CAP_SEED)},
               COALESCE(CAST(doc_id AS VARCHAR), '{sampling.NULL_KEY}')
    ) AS rn
  FROM documents
) WHERE rn <= {CAP_K}""",
    ),
)


# --------------------------------------------------------------------- #
# Join-key skew profile (the pre-shuffle salting/AQE diagnostic)
# --------------------------------------------------------------------- #

SKEW_TOPK = 20

def _skew_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .scale import profile_key_skew

    orders = load_table(spark, sf_dir, "orders")
    p = profile_key_skew(orders, key="o_custkey", top_k=SKEW_TOPK)
    return p.select(
        "key_value",
        "n_rows",
        round4(F.col("share")).alias("share"),
        round4(F.col("skew_factor")).alias("skew_factor"),
        "rank",
    )


_register(
    "profile_key_skew_orders",
    Query(
        spark=_skew_spark,
        sql=f"""
WITH per_key AS (
  SELECT CAST(o_custkey AS VARCHAR) AS key_value,
    CAST(count(*) AS BIGINT) AS n_rows
  FROM orders GROUP BY 1
),
tot AS (
  SELECT sum(n_rows) AS total, count(*) AS nkeys FROM per_key
),
top AS (
  SELECT key_value, n_rows,
    row_number() OVER (ORDER BY n_rows DESC, key_value) AS rank
  FROM per_key ORDER BY n_rows DESC, key_value LIMIT {SKEW_TOPK}
)
SELECT t.key_value, t.n_rows,
  {_r('CAST(t.n_rows AS DOUBLE) / tot.total', 'share')},
  {_r('CAST(t.n_rows AS DOUBLE) * tot.nkeys / tot.total', 'skew_factor')},
  CAST(t.rank AS BIGINT) AS rank
FROM top t, tot""",
    ),
)


# --------------------------------------------------------------------- #
# Binary (sign-bit) embedding quantization + Hamming ANN
# --------------------------------------------------------------------- #

from .functions import joins, similarity  # noqa: E402
from .queries import _r  # noqa: E402

EMB_DIM, WORD_BITS = 64, 32
_N_WORDS = EMB_DIM // WORD_BITS


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _bincode_sql(vec: str, w: int) -> str:
    """One packed sign-bit word (SQL mirror of ``binary_code_words``)."""
    terms = " + ".join(
        f"CASE WHEN CAST({vec}[{w * WORD_BITS + j + 1}] AS DOUBLE) >= 0"
        f" THEN {1 << j} ELSE 0 END"
        for j in range(WORD_BITS)
    )
    return f"CASE WHEN {vec} IS NOT NULL THEN CAST({terms} AS BIGINT) END"


_register(
    "embedding_binary_quantize",
    Query(
        spark=lambda s, d: similarity.binary_quantize(
            _emb(s, d), dim=EMB_DIM, word_bits=WORD_BITS
        ),
        sql="SELECT vec_id, "
        + ", ".join(
            f"{_bincode_sql('embedding', w)} AS code_{w}"
            for w in range(_N_WORDS)
        )
        + " FROM embeddings",
    ),
)

_register(
    "similarity_knn_hamming",
    Query(
        spark=lambda s, d: similarity.knn_hamming(
            _emb(s, d),
            _emb(s, d).filter(F.col("vec_id") < 10),
            k=5,
            dim=EMB_DIM,
            word_bits=WORD_BITS,
        ),
        sql=f"""
WITH craw AS (
  SELECT vec_id,
    {', '.join(f"{_bincode_sql('embedding', w)} AS c{w}" for w in range(_N_WORDS))}
  FROM embeddings
),
c AS (
  -- NULL-embedding rows have no code and are dropped from both sides
  -- (mirrors knn_hamming's NULL contract; Spark would sort NULLs first)
  SELECT * FROM craw WHERE c0 IS NOT NULL
),
q AS (
  SELECT vec_id AS qid,
    {', '.join(f'c{w} AS q{w}' for w in range(_N_WORDS))}
  FROM c WHERE vec_id < 10
),
scored AS (
  SELECT q.qid, c.vec_id AS nid,
    {' + '.join(f'bit_count(xor(c.c{w}, q.q{w}))' for w in range(_N_WORDS))}
      AS hamming
  FROM c CROSS JOIN q
  WHERE c.vec_id != q.qid
),
ranked AS (
  SELECT qid, nid, hamming,
    row_number() OVER (PARTITION BY qid ORDER BY hamming, nid) AS rank
  FROM scored
)
SELECT qid, nid, rank, CAST(hamming AS BIGINT) AS hamming
FROM ranked WHERE rank <= 5""",
    ),
)


# --------------------------------------------------------------------- #
# Matryoshka prefix-truncation distortion profile
# --------------------------------------------------------------------- #

MRL_DIMS = (8, 16, 32)


def _dot_m(a: str, b: str, m: int) -> str:
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, m + 1)
    )


def _norm_m(a: str, m: int) -> str:
    return (
        "sqrt("
        + " + ".join(
            f"CAST({a}[{i}] AS DOUBLE) * CAST({a}[{i}] AS DOUBLE)"
            for i in range(1, m + 1)
        )
        + ")"
    )


def _mrl_cos(m: int) -> str:
    return (
        f"({_dot_m('a.embedding', 'b.embedding', m)})"
        f" / nullif(({_norm_m('a.embedding', m)})"
        f" * ({_norm_m('b.embedding', m)}), 0)"
    )


_MRL_SQL = f"""
WITH pairs AS (
  SELECT {_mrl_cos(EMB_DIM)} AS full_cos,
    {', '.join(f'{_mrl_cos(m)} AS c{m}' for m in MRL_DIMS)}
  FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
),
ok AS (
  SELECT * FROM pairs
  WHERE full_cos IS NOT NULL
    AND {' AND '.join(f'c{m} IS NOT NULL' for m in MRL_DIMS)}
),
errs AS (
  {' UNION ALL '.join(
      f"SELECT CAST({m} AS INT) AS prefix_dim, c{m} - full_cos AS err FROM ok"
      for m in MRL_DIMS
  )}
)
SELECT prefix_dim, CAST(count(*) AS BIGINT) AS n_pairs,
  {_r('avg(abs(err))', 'mae')},
  {_r('sqrt(avg(err * err))', 'rmse')}
FROM errs GROUP BY prefix_dim"""

_register(
    "embedding_matryoshka_distortion",
    Query(
        spark=lambda s, d: similarity.matryoshka_distortion(
            _emb(s, d), dims=MRL_DIMS, full_dim=EMB_DIM
        ).select(
            "prefix_dim",
            "n_pairs",
            round4(F.col("mae")).alias("mae"),
            round4(F.col("rmse")).alias("rmse"),
        ),
        sql=_MRL_SQL,
    ),
)


# --------------------------------------------------------------------- #
# Token-set containment (doc-in-doc / quote duplication)
# --------------------------------------------------------------------- #

CONT_T, CONT_MAXDF = 0.6, 0.5

_register(
    "dedup_containment_pairs",
    Query(
        spark=lambda s, d: dedup.containment_pairs(
            _docs(s, d), threshold=CONT_T, max_df_frac=CONT_MAXDF
        ).select(
            "ia",
            "ib",
            round4(F.col("cont_a")).alias("cont_a"),
            round4(F.col("cont_b")).alias("cont_b"),
        ),
        sql=f"""
WITH toks0 AS (
  SELECT doc_id AS id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
),
dfreq AS (
  SELECT tok, count(*) AS df FROM toks0 GROUP BY tok
),
ndocs AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM documents
),
toks AS (
  SELECT t.id, t.tok
  FROM toks0 t JOIN dfreq f ON f.tok = t.tok, ndocs
  WHERE f.df <= n_docs * {CONT_MAXDF}
),
sizes AS (
  SELECT id, count(*) AS sz FROM toks GROUP BY id
),
shared AS (
  SELECT a.id AS ia, b.id AS ib, count(*) AS shared
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
  GROUP BY a.id, b.id
),
cont AS (
  SELECT s.ia, s.ib,
    CAST(s.shared AS DOUBLE) / za.sz AS cont_a,
    CAST(s.shared AS DOUBLE) / zb.sz AS cont_b
  FROM shared s
  JOIN sizes za ON za.id = s.ia
  JOIN sizes zb ON zb.id = s.ib
)
SELECT ia, ib, {_r('cont_a', 'cont_a')}, {_r('cont_b', 'cont_b')}
FROM cont WHERE greatest(cont_a, cont_b) >= {CONT_T}""",
    ),
)


# --------------------------------------------------------------------- #
# Bloom-prefiltered semi join
# --------------------------------------------------------------------- #

BLOOM_M, BLOOM_K = 1 << 16, 4


def _bloom_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    j = joins.bloom_semi_join(
        li, urgent, "l_orderkey", m_bits=BLOOM_M, n_hashes=BLOOM_K
    )
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        round4(F.sum("l_quantity")).alias("sum_qty"),
    )


_register(
    "join_bloom_prefilter",
    Query(
        spark=_bloom_spark,
        sql=f"""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  {_r('sum(l_quantity)', 'sum_qty')}
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
GROUP BY l_returnflag""",
    ),
)


# --------------------------------------------------------------------- #
# Z-order (Morton) layout clustering
# --------------------------------------------------------------------- #

Z_BITS, Z_CELL_SHIFT = 8, 10  # 16-bit z-key → 64 cells


def _zorder_sql_key(x: str, y: str) -> str:
    terms = []
    for j in range(Z_BITS):
        terms.append(f"((({x} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({y} >> {j}) & 1) << {2 * j + 1})")
    return " + ".join(terms)


def _zorder_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .scale import zorder_key

    o = load_table(spark, sf_dir, "orders")
    xb = F.pmod(F.col("o_custkey"), F.lit(256)).cast("long")
    yb = F.pmod(
        F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1, F.lit(256)
    ).cast("long")
    zk = zorder_key([xb, yb], bits=Z_BITS)
    cells = o.select(
        xb.alias("xb"), yb.alias("yb"), F.shiftright(zk, Z_CELL_SHIFT).alias("zcell")
    )
    return cells.groupBy("zcell").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("xb").alias("x_min"),
        F.max("xb").alias("x_max"),
        F.min("yb").alias("y_min"),
        F.max("yb").alias("y_max"),
    )


_register(
    "layout_zorder_orders",
    Query(
        spark=_zorder_spark,
        sql=f"""
WITH b AS (
  SELECT CAST(o_custkey % 256 AS BIGINT) AS xb,
    CAST((year(o_orderdate) * 12 + month(o_orderdate) - 1) % 256 AS BIGINT)
      AS yb
  FROM orders
),
z AS (
  SELECT xb, yb,
    CAST(({_zorder_sql_key('xb', 'yb')}) AS BIGINT) >> {Z_CELL_SHIFT} AS zcell
  FROM b
)
SELECT zcell, CAST(count(*) AS BIGINT) AS n_rows,
  min(xb) AS x_min, max(xb) AS x_max,
  min(yb) AS y_min, max(yb) AS y_max
FROM z GROUP BY zcell""",
    ),
)


# --------------------------------------------------------------------- #
# Distributed exact weighted quantiles (two-pass, no global sort)
# --------------------------------------------------------------------- #

WQ_QS = (0.25, 0.5, 0.75)


def _wq_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .scale import weighted_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    wq = weighted_quantiles(
        li,
        group="l_returnflag",
        value="l_extendedprice",
        weight="l_quantity",
        qs=WQ_QS,
    )
    return wq.select(
        "l_returnflag",
        *[round4(F.col(f"wq{int(q * 100)}")).alias(f"wq{int(q * 100)}") for q in WQ_QS],
    )


_register(
    "analytic_weighted_quantiles",
    Query(
        spark=_wq_spark,
        sql=f"""
WITH cum AS (
  SELECT l_returnflag, l_extendedprice,
    sum(l_quantity) OVER (
      PARTITION BY l_returnflag ORDER BY l_extendedprice
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS cw,
    sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag,
  {', '.join(
    _r(f'min(CASE WHEN cw >= {q} * tw THEN l_extendedprice END)', f'wq{int(q * 100)}')
    for q in WQ_QS
  )}
FROM cum GROUP BY l_returnflag""",
    ),
)
