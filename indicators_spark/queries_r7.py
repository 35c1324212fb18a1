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
perdoc AS (SELECT doc_id, bkt, count(*) AS c FROM rawf GROUP BY 1, 2),
lw AS (
  SELECT p.doc_id, CAST(sum(p.c) AS BIGINT) AS n_tokens,
    sum(p.c * r.lr) AS dsir_logw
  FROM perdoc p JOIN ratio r USING (bkt) GROUP BY 1
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
