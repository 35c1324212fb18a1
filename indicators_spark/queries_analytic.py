"""Analytic-function coverage: ranking windows, exact percentiles,
bivariate statistics, histogram binning, and a Python UDTF.

The reference has no ranking/percentile/statistical aggregates (SURVEY.md
§2b "Not present in the reference") — these are north-star extensions
chosen because a training-data pipeline leans on them constantly
(quantile cut-offs for quality filtering, rank-based sampling, score
distributions).

Determinism notes (cross-engine hash discipline):

* ``rank``/``percent_rank``/``cume_dist`` depend only on the ORDER KEY
  VALUES, so ties are safe.  ``ntile`` attaches to physical row order —
  safe here only because rows that tie on the full order key are
  bit-identical (see sources/prices.py on the synthetic lineitem dups),
  making the output multiset unique even when the assignment isn't.
* ``percentile`` (Spark) and ``quantile_cont`` (DuckDB) implement the
  same linear interpolation; outputs are quantized like every float.
* The histogram's bucket expression is the same double arithmetic on both
  sides (floor of an identical IEEE expression), never engine-native
  ``width_bucket`` variants with differing edge rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import Query, _r, _register, round4
from .sources.prices import load_table

def _seq():
    # built lazily — Column arithmetic needs an active SparkContext, which
    # doesn't exist at import time (queries register at import)
    return (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("seq")


_SEQ_SQL = "l_orderkey * 10 + l_linenumber"


# --------------------------------------------------------------------- #
# Ranking window functions
# --------------------------------------------------------------------- #


def _ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    wv = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wt = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber", "l_quantity"
    )
    return li.select(
        "l_returnflag",
        _seq(),
        F.rank().over(wv).alias("rnk"),
        F.dense_rank().over(wv).alias("drnk"),
        round4(F.percent_rank().over(wv)).alias("prnk"),
        round4(F.cume_dist().over(wv)).alias("cdist"),
        F.ntile(8).over(wt).alias("octile"),
    )


_register(
    "analytic_ranks",
    Query(
        spark=_ranks,
        sql=f"""
SELECT l_returnflag, {_SEQ_SQL} AS seq,
  CAST(rank() OVER w AS INT) AS rnk,
  CAST(dense_rank() OVER w AS INT) AS drnk,
  {_r('percent_rank() OVER w', 'prnk')},
  {_r('cume_dist() OVER w', 'cdist')},
  CAST(ntile(8) OVER wt AS INT) AS octile
FROM lineitem
WHERE l_quantity >= 48
WINDOW
  w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice),
  wt AS (PARTITION BY l_returnflag
         ORDER BY l_extendedprice, l_orderkey, l_linenumber, l_quantity)""",
    ),
)


# --------------------------------------------------------------------- #
# Exact percentiles (interpolated), per group
# --------------------------------------------------------------------- #


def _percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            round4(F.percentile("l_extendedprice", F.lit(0.25))).alias("q25"),
            round4(F.percentile("l_extendedprice", F.lit(0.5))).alias("q50"),
            round4(F.percentile("l_extendedprice", F.lit(0.75))).alias("q75"),
            round4(F.percentile("l_extendedprice", F.lit(0.9))).alias("q90"),
        )
    )


_register(
    "analytic_percentiles",
    Query(
        spark=_percentiles,
        sql=f"""
SELECT l_returnflag,
  {_r('quantile_cont(l_extendedprice, 0.25)', 'q25')},
  {_r('quantile_cont(l_extendedprice, 0.50)', 'q50')},
  {_r('quantile_cont(l_extendedprice, 0.75)', 'q75')},
  {_r('quantile_cont(l_extendedprice, 0.90)', 'q90')}
FROM lineitem GROUP BY 1""",
    ),
)


# --------------------------------------------------------------------- #
# Bivariate statistics per group
# --------------------------------------------------------------------- #


def _bistats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round4(F.corr("l_quantity", "l_extendedprice")).alias("corr_qp"),
        round4(F.covar_samp("l_quantity", "l_extendedprice")).alias("covar_qp"),
        round4(F.stddev_samp("l_extendedprice")).alias("std_price"),
        round4(F.skewness("l_extendedprice")).alias("skew_price"),
    )


_register(
    "analytic_bistats",
    Query(
        spark=_bistats,
        sql=f"""
SELECT l_returnflag,
  {_r('corr(l_quantity, l_extendedprice)', 'corr_qp')},
  {_r('covar_samp(l_quantity, l_extendedprice)', 'covar_qp')},
  {_r('stddev_samp(l_extendedprice)', 'std_price')},
  {_r('skewness(l_extendedprice)', 'skew_price')}
FROM lineitem GROUP BY 1""",
    ),
)


# --------------------------------------------------------------------- #
# Histogram binning (16 equal-width buckets over the observed range)
# --------------------------------------------------------------------- #

_NBINS = 16


def _histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution histogram with data-driven bounds: one min/max pass
    (a one-row broadcast), then a map-side bucket expression + one groupBy.
    The bucket arithmetic is plain IEEE floor — identical on both engines —
    with the max value clamped into the top bucket."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    bounds = li.agg(
        F.min("l_extendedprice").alias("_lo"), F.max("l_extendedprice").alias("_hi")
    )
    b = F.least(
        F.lit(_NBINS - 1),
        F.floor(
            (F.col("l_extendedprice") - F.col("_lo"))
            / (F.col("_hi") - F.col("_lo"))
            * _NBINS
        ),
    ).cast("int")
    return (
        li.crossJoin(F.broadcast(bounds))
        .groupBy(b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            round4(F.avg("l_extendedprice")).alias("avg_price"),
        )
    )


_register(
    "analytic_histogram",
    Query(
        spark=_histogram,
        sql=f"""
WITH bounds AS (
  SELECT min(l_extendedprice) AS _lo, max(l_extendedprice) AS _hi
  FROM lineitem
)
SELECT
  CAST(least({_NBINS - 1},
    floor((l_extendedprice - _lo) / (_hi - _lo) * {_NBINS})) AS INT) AS bucket,
  count(*) AS n, {_r('avg(l_extendedprice)', 'avg_price')}
FROM lineitem, bounds
GROUP BY 1""",
    ),
)


# --------------------------------------------------------------------- #
# Python UDTF (table function): text → (pos, word) rows
# --------------------------------------------------------------------- #


def _udtf_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-less row UDTF splitting documents into positioned words, then
    a relational reduction on top (longest word per position bucket).

    UDTFs are the 1:N row-generator API (SURVEY §2b lists UDTF
    registration among the Spark features the reference lacks).  This is
    deliberately the *slow path* demo — the production equivalent of this
    particular job is the pure-builtin ``posexplode(split(...))`` used by
    the dedup/shingle operators; a UDTF earns its cost only when the
    generator is genuinely imperative (parsers, tokenizers with state)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, word string")
    class SplitWords:
        def eval(self, doc_id, text):  # noqa: ANN001
            for i, w in enumerate(str(text).split(" ")):
                if w:
                    yield int(doc_id), i, w

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "text")
    )
    spark.udtf.register("split_words", SplitWords)
    docs.createOrReplaceTempView("_udtf_docs")
    words = spark.sql(
        "SELECT sw.doc_id, sw.pos, sw.word "
        "FROM _udtf_docs, LATERAL split_words(doc_id, text) sw"
    )
    return (
        words.groupBy("pos")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.max(F.length("word")).alias("max_len"),
            F.min("word").alias("first_word"),
        )
    )


_register(
    "udtf_split_words",
    Query(
        spark=_udtf_words,
        sql="""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS parts
  FROM documents WHERE doc_id < 300
),
words AS (
  SELECT doc_id, CAST(g AS INT) - 1 AS pos, parts[g] AS word
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(parts))) AS g) t
  WHERE parts[g] <> ''
)
SELECT pos, count(*) AS n_words,
  CAST(max(length(word)) AS INT) AS max_len,
  min(word) AS first_word
FROM words GROUP BY 1""",
    ),
)
