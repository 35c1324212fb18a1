"""Round-7 catalog additions: DSIR importance resampling and the
deterministic epoch shuffle — the two data-selection primitives the r5/r6
briefs carried (plus the sketch-path quality filter registered in
queries_corpus).  Registered last so the never-green-first ordering puts
them at the head of the driver's verification list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import sampling
from .queries import Query, _r, _register
from .sources.prices import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --------------------------------------------------------------------- #
# DSIR importance resampling (Xie et al. 2023)
# --------------------------------------------------------------------- #

DSIR_K, DSIR_B, DSIR_ALPHA = 120, 1024, 1.0
DSIR_SEED, DSIR_USEED = "dsir", "dsir-u"
#: target distribution: the English slice (the "high-quality reference"
#: role); raw = the whole corpus.
DSIR_TARGET_LANG = "en"


def _dsir_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("lang") == DSIR_TARGET_LANG)
    out = sampling.dsir_sample(
        docs,
        target,
        k=DSIR_K,
        buckets=DSIR_B,
        seed=DSIR_SEED,
        alpha=DSIR_ALPHA,
        u_seed=DSIR_USEED,
    )
    return out.select(
        "doc_id",
        "n_tokens",
        (F.floor(F.col("dsir_logw") * 1e4 + F.lit(0.500000001)) / 1e4).alias(
            "dsir_logw"
        ),
        "dsir_score",
    )


_BKT = sampling.bucket_sql("tok", DSIR_SEED, DSIR_B)
_U = sampling.unit_sql("doc_id", DSIR_USEED)

_DSIR_SQL = f"""
WITH rawf AS (
  SELECT doc_id, {_BKT} AS bkt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE text IS NOT NULL)
),
tgtf AS (
  SELECT doc_id, {_BKT} AS bkt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE text IS NOT NULL AND lang = '{DSIR_TARGET_LANG}')
),
tc AS (SELECT bkt, count(*) AS tc FROM tgtf GROUP BY 1),
rc AS (SELECT bkt, count(*) AS rc FROM rawf GROUP BY 1),
tt AS (SELECT count(*) AS tt FROM tgtf),
rt AS (SELECT count(*) AS rt FROM rawf),
ratio AS (
  SELECT r.bkt,
    ln((COALESCE(t.tc, 0) + {DSIR_ALPHA}) / (tt.tt + {DSIR_ALPHA} * {DSIR_B}))
    - ln((r.rc + {DSIR_ALPHA}) / (rt.rt + {DSIR_ALPHA} * {DSIR_B})) AS lr
  FROM rc r LEFT JOIN tc t USING (bkt), tt, rt
),
lw AS (
  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
    sum(r.lr) AS dsir_logw
  FROM rawf f JOIN ratio r USING (bkt) GROUP BY 1
),
scored AS (
  SELECT doc_id, n_tokens, dsir_logw,
    floor((ln(-ln({_U})) - dsir_logw) * 1e4 + 0.500000001) / 1e4 AS s
  FROM lw
)
SELECT doc_id, n_tokens, {_r('dsir_logw', 'dsir_logw')},
  s AS dsir_score
FROM scored ORDER BY s, doc_id LIMIT {DSIR_K}"""


_register("sample_dsir", Query(spark=_dsir_spark, sql=_DSIR_SQL))


# --------------------------------------------------------------------- #
# Deterministic epoch shuffle (hash permutation, no global sort)
# --------------------------------------------------------------------- #

EPOCH = 3
EPOCH_SEED = "ep"


def _epoch_shuffle_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    out = sampling.epoch_shuffle(
        docs, key="doc_id", epoch=EPOCH, seed=EPOCH_SEED
    )
    return out.select("doc_id", "epoch_pos")


# --------------------------------------------------------------------- #
# Gopher hard quality rules (Rae et al. 2021 §A1.1)
# --------------------------------------------------------------------- #

_GFLAGS = (
    "ok_word_count",
    "ok_avg_word_len",
    "ok_symbol_ratio",
    "ok_bullet_lines",
    "ok_ellipsis_lines",
    "ok_alpha_words",
    "ok_stopwords",
    "keep",
)


def _gopher_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import gopher_rules

    out = gopher_rules(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        "n_words",
        *[F.col(f).cast("long").alias(f) for f in _GFLAGS],
    )


def _gopher_sql() -> str:
    from .functions import text as T

    stop = ", ".join(f"'{s}'" for s in T.STOPWORDS)
    n = "CAST(len(ws) AS DOUBLE)"
    nl = "CAST(len(ls) AS DOUBLE)"
    flags = {
        "ok_word_count": f"({n} >= {T.GOPHER_MIN_WORDS} AND {n} <= {T.GOPHER_MAX_WORDS})",
        "ok_avg_word_len": (
            f"((length(text) - ({n} - 1)) / {n} >= {T.GOPHER_MIN_AVG_LEN}"
            f" AND (length(text) - ({n} - 1)) / {n} <= {T.GOPHER_MAX_AVG_LEN})"
        ),
        "ok_symbol_ratio": (
            "((length(text) - length(replace(text, '#', ''))"
            " + (length(text) - length(replace(text, '...', ''))) / 3)"
            f" / {n} <= {T.GOPHER_MAX_SYMBOL_RATIO})"
        ),
        "ok_bullet_lines": (
            "(CAST(len(list_filter(ls, x -> starts_with(x, '-')"
            " OR starts_with(x, '*') OR starts_with(x, '•'))) AS DOUBLE)"
            f" / {nl} <= {T.GOPHER_MAX_BULLET_FRAC})"
        ),
        "ok_ellipsis_lines": (
            "(CAST(len(list_filter(ls, x -> ends_with(x, '...'))) AS DOUBLE)"
            f" / {nl} <= {T.GOPHER_MAX_ELLIPSIS_FRAC})"
        ),
        "ok_alpha_words": (
            "(CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]')))"
            f" AS DOUBLE) / {n} >= {T.GOPHER_MIN_ALPHA_WORD_FRAC})"
        ),
        "ok_stopwords": (
            f"(len(list_filter(ws, x -> x IN ({stop})))"
            f" >= {T.GOPHER_MIN_STOPWORD_HITS})"
        ),
    }
    cols = [
        f"CAST(COALESCE({expr}, false) AS BIGINT) AS {name}"
        for name, expr in flags.items()
    ]
    keep = " AND ".join(f"COALESCE({expr}, false)" for expr in flags.values())
    return f"""
WITH t AS (
  SELECT doc_id, text,
    string_split(text, ' ') AS ws,
    string_split(text, chr(10)) AS ls
  FROM documents
)
SELECT doc_id,
  CAST(len(ws) AS BIGINT) AS n_words,
  {", ".join(cols)},
  CAST(({keep}) AS BIGINT) AS keep
FROM t"""


_register("filter_gopher_rules", Query(spark=_gopher_spark, sql=_gopher_sql()))


# --------------------------------------------------------------------- #
# DSIR full-corpus weights (the audit view of sample_dsir)
# --------------------------------------------------------------------- #


def _dsir_weights_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("lang") == DSIR_TARGET_LANG)
    lw = sampling.dsir_log_weights(
        docs, target, buckets=DSIR_B, seed=DSIR_SEED, alpha=DSIR_ALPHA
    )
    return lw.select(
        "doc_id",
        "n_tokens",
        (F.floor(F.col("dsir_logw") * 1e4 + F.lit(0.500000001)) / 1e4).alias(
            "dsir_logw"
        ),
    )


#: Same CTE chain as _DSIR_SQL, stopping at the per-doc weights (every
#: raw doc, not the resampled top-k) — broader value-hash evidence for
#: the feature/ratio arithmetic itself.
_DSIR_W_SQL = (
    _DSIR_SQL.split(",\nscored AS")[0]
    + f"""
SELECT doc_id, n_tokens, {_r('dsir_logw', 'dsir_logw')}
FROM lw"""
)

_register(
    "sample_dsir_weights", Query(spark=_dsir_weights_spark, sql=_DSIR_W_SQL)
)


_register(
    "sample_epoch_shuffle",
    Query(
        spark=_epoch_shuffle_spark,
        sql=f"""
SELECT doc_id,
  CAST(row_number() OVER (
    ORDER BY md5(concat('{EPOCH_SEED}{EPOCH}|',
      COALESCE(CAST(doc_id AS VARCHAR), '{sampling.NULL_KEY}'))), doc_id
  ) AS BIGINT) AS epoch_pos
FROM documents""",
    ),
)
