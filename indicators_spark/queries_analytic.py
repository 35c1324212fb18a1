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
        # Spark skewness = biased population g1; the oracle multiplies
        # DuckDB's bias-corrected G1 by (n-2)/sqrt(n(n-1)) to match
        # EXACTLY (at sf0.001 the raw estimators differ past the 4dp
        # quantizer — this was a latent hash mismatch).
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
  {_r('skewness(l_extendedprice) * (count(*) - 2) / sqrt(count(*) * (count(*) - 1.0))', 'skew_price')}
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
            if text is None:
                return  # SQL NULL emits no rows (string_split(NULL) parity)
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


# --------------------------------------------------------------------- #
# Navigation window functions (first/last/nth, ignore-nulls carry)
# --------------------------------------------------------------------- #


def _navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over deterministic frames, and
    the last-non-null carry (Spark ``F.last(ignorenulls=True)`` ≡ SQL
    ``last_value(x IGNORE NULLS)``) that powers forward-fill."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    order = [F.col(c) for c in ("l_shipdate", "l_orderkey", "l_linenumber")]
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = (
        Window.partitionBy("l_returnflag")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wprev = (
        Window.partitionBy("l_returnflag")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sparse = F.when(F.col("l_quantity") >= 49.5, F.col("l_extendedprice"))
    return li.select(
        "l_returnflag",
        _seq(),
        round4(F.first("l_extendedprice").over(wcum)).alias("first_price"),
        round4(F.last("l_extendedprice").over(wall)).alias("last_price"),
        round4(F.nth_value("l_extendedprice", 3).over(wcum)).alias("third_price"),
        round4(F.last(sparse, ignorenulls=True).over(wprev)).alias("prev_big_price"),
    )


_register(
    "analytic_navigation",
    Query(
        spark=_navigation,
        sql=f"""
SELECT l_returnflag, {_SEQ_SQL} AS seq,
  {_r('first_value(l_extendedprice) OVER wcum', 'first_price')},
  {_r('last_value(l_extendedprice) OVER wall', 'last_price')},
  {_r('nth_value(l_extendedprice, 3) OVER wcum', 'third_price')},
  {_r(
      "last_value(CASE WHEN l_quantity >= 49.5 THEN l_extendedprice END "
      "IGNORE NULLS) OVER wprev",
      'prev_big_price',
  )}
FROM lineitem
WHERE l_quantity >= 48
WINDOW
  wcum AS (PARTITION BY l_returnflag
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  wall AS (PARTITION BY l_returnflag
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
  wprev AS (PARTITION BY l_returnflag
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""",
    ),
)


# --------------------------------------------------------------------- #
# Time-series gap filling (hourly grid + LOCF forward-fill)
# --------------------------------------------------------------------- #


def _gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap fill: per event type, a dense hourly grid over
    the observed range with last-observation-carried-forward values.

    Scale shape: the grid is ``#types × #hours`` — generated from a
    one-row broadcast of the bounds, NEVER by resampling the fact table;
    the fill itself is one per-type window over the (small) grid after a
    left join that streams the hourly aggregate into it."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("h"),
        "value",
    )
    hourly = ev.groupBy("event_type", "h").agg(
        F.avg("value").alias("_v"), F.count(F.lit(1)).alias("_n")
    )
    bounds = hourly.agg(F.min("h").alias("_lo"), F.max("h").alias("_hi"))
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), F.lit(3600))).alias("h"),
    )
    j = grid.join(hourly, ["event_type", "h"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        F.col("h").alias("hour_epoch"),
        F.col("_n").isNotNull().alias("observed"),
        round4(F.last("_v", ignorenulls=True).over(w)).alias("v_filled"),
    )


_register(
    "gap_fill_hourly",
    Query(
        spark=_gap_fill,
        sql=f"""
WITH hourly AS (
  SELECT event_type,
    CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS h,
    avg(value) AS _v, count(*) AS _n
  FROM events GROUP BY 1, 2
),
b AS (SELECT min(h) AS _lo, max(h) AS _hi FROM hourly),
grid AS (
  SELECT t.event_type, CAST(g AS BIGINT) AS h
  FROM (SELECT DISTINCT event_type FROM events) t, b,
       LATERAL (SELECT unnest(generate_series(_lo, _hi, 3600)) AS g) s
)
SELECT grid.event_type, grid.h AS hour_epoch,
  hourly._n IS NOT NULL AS observed,
  {_r(
      "last_value(hourly._v IGNORE NULLS) OVER "
      "(PARTITION BY grid.event_type ORDER BY grid.h)",
      'v_filled',
  )}
FROM grid LEFT JOIN hourly
  ON grid.event_type = hourly.event_type AND grid.h = hourly.h""",
    ),
)


# --------------------------------------------------------------------- #
# Scale-safe global row numbering (bucketed enumeration, scale.py)
# --------------------------------------------------------------------- #


def _global_rownum_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous row_number over (ts, event_id) with NO single-task
    window: arithmetic time-bucketing + per-bucket ranks + broadcast
    prefix-sum offsets (scale.global_row_number).  event_id is unique, so
    the total order — and therefore the numbering — is deterministic."""
    from .scale import global_row_number

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", F.unix_timestamp("ts").alias("_bkey")
    )
    out = global_row_number(
        ev, order_cols=("ts", "event_id"), buckets=32, bucket_by="_bkey"
    )
    return out.select("event_id", "rn")


_register(
    "analytic_global_rownum",
    Query(
        spark=_global_rownum_spark,
        sql="""
SELECT event_id,
  CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS rn
FROM events""",
    ),
)


# --------------------------------------------------------------------- #
# Per-group winsorization (quantile clipping — outlier taming)
# --------------------------------------------------------------------- #


def _winsorize_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip n_chars to each language's [p05, p95] band — the standard
    outlier-taming transform before statistics/training.

    Runs :func:`~indicators_spark.approx.winsorize_auto` with defaults,
    which under the no-free-count dispatch contract (r8) pins the EXACT
    per-group percentile bands the oracle replays — nothing is scanned
    just to pick a branch.  At 100 TB a caller passes ``n_rows`` from
    catalog stats (or ``min_rows=0``) to get t-digest bands instead; that
    sketch branch is pinned against this exact one in
    tests/test_approx.py::test_winsorize_auto_paths_agree.  Either way
    one tiny per-group agg broadcast-joins back; the data side never
    shuffles."""
    from .approx import winsorize_auto

    docs = load_table(spark, sf_dir, "documents")
    out = winsorize_auto(docs, value="n_chars", group="lang")
    return out.select(
        "doc_id", "lang", round4(F.col("n_chars_winsor")).alias("n_chars_winsor")
    )


_register(
    "analytic_winsorize",
    Query(
        spark=_winsorize_spark,
        sql=f"""
WITH bands AS (
  SELECT lang, quantile_cont(n_chars, 0.05) AS lo, quantile_cont(n_chars, 0.95) AS hi
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang,
  {_r('greatest(least(CAST(d.n_chars AS DOUBLE), b.hi), b.lo)', 'n_chars_winsor')}
FROM documents d JOIN bands b ON b.lang = d.lang""",
    ),
)


# --------------------------------------------------------------------- #
# Seasonal decomposition (trend / seasonal / residual) over hourly counts
# --------------------------------------------------------------------- #


def _seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the hourly event-count series
    per event_type: trend = centered 24-row moving average (gated to full
    windows), seasonal = mean detrended value per hour-of-day, residual =
    what's left — the anomaly-detection / forecasting baseline every
    metrics pipeline needs.

    All hour arithmetic is integer epoch math (``floor(epoch/3600)``) —
    no locale calendar, identical on both engines.  The trend window is
    ROW-based over the aggregated series (documented choice: with gap
    hours a range window would differ); the aggregated series is
    #hours × #types rows, so the three window passes cost nothing next to
    the one fact-table aggregation."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour_id"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    wt = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-11, 12)
    )
    trended = hourly.withColumn(
        "trend",
        F.when(F.count(F.lit(1)).over(wt) == 24, F.avg("y").over(wt)),
    ).withColumn("hod", F.col("hour_id") % 24)
    ws = Window.partitionBy("event_type", "hod")
    out = trended.withColumn(
        "seasonal", F.avg(F.col("y") - F.col("trend")).over(ws)
    ).withColumn(
        "resid", F.col("y") - F.col("trend") - F.col("seasonal")
    )
    return out.select(
        "event_type",
        "hour_id",
        "y",
        round4(F.col("trend")).alias("trend"),
        round4(F.col("seasonal")).alias("seasonal"),
        round4(F.col("resid")).alias("resid"),
    )


_register(
    "analytic_seasonal_decompose",
    Query(
        spark=_seasonal_decompose,
        sql=f"""
WITH hourly AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id, event_type,
    count(*) AS y
  FROM events GROUP BY 1, 2
),
t AS (
  SELECT *,
    CASE WHEN count(*) OVER w24 = 24 THEN avg(y) OVER w24 END AS trend,
    hour_id % 24 AS hod
  FROM hourly
  WINDOW w24 AS (PARTITION BY event_type ORDER BY hour_id
                 ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)
),
s AS (
  SELECT *,
    avg(y - trend) OVER (PARTITION BY event_type, hod) AS seasonal
  FROM t
)
SELECT event_type, hour_id, y,
  {_r('trend', 'trend')},
  {_r('seasonal', 'seasonal')},
  {_r('y - trend - seasonal', 'resid')}
FROM s""",
    ),
)


# --------------------------------------------------------------------- #
# Equi-depth histogram (exact quartile breakpoints) + chi-square test
# --------------------------------------------------------------------- #


def _histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram: buckets hold ~equal row counts, with
    quartile breakpoints (the optimizer-statistics dual of the
    equal-width `analytic_histogram`).  Runs
    :func:`~indicators_spark.approx.histogram_equidepth_auto` with
    defaults, which under the no-free-count dispatch contract (r8) pins
    the EXACT interpolated breakpoints the oracle replays; at 100 TB a
    caller passes ``n_rows`` from catalog stats (or ``min_rows=0``) for
    t-digest breakpoints — that branch is pinned against this one in
    tests/test_approx.py::test_histogram_equidepth_auto_paths.  3 scalars
    broadcast back either way; bucket assignment is a codegen'd
    comparison sum, so the fact table is scanned twice but never
    shuffled wide."""
    from .approx import histogram_equidepth_auto

    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    out = histogram_equidepth_auto(li, "l_extendedprice")
    return out.select("bucket", "n", round4(F.col("avg_v")).alias("avg_price"))


_register(
    "analytic_histogram_equidepth",
    Query(
        spark=_histogram_equidepth,
        sql=f"""
WITH q AS (
  SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
         quantile_cont(l_extendedprice, 0.5) AS q2,
         quantile_cont(l_extendedprice, 0.75) AS q3
  FROM lineitem
)
SELECT
  (CAST(l_extendedprice > q1 AS INT) + CAST(l_extendedprice > q2 AS INT)
   + CAST(l_extendedprice > q3 AS INT)) AS bucket,
  count(*) AS n, {_r('avg(l_extendedprice)', 'avg_price')}
FROM lineitem, q GROUP BY 1""",
    ),
)


def _chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test on the lang × source
    contingency table — "is language mix independent of ingest feed?", the
    one-number screen before per-source corpus debugging.  Observed and
    marginal counts are three skinny groupBys on an already-aggregated
    table; the cell-term sum is |langs|·|sources| rows — nothing at scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rl = obs.groupBy("lang").agg(F.sum("o").alias("rl"))
    cs = obs.groupBy("source").agg(F.sum("o").alias("cs"))
    n = obs.agg(F.sum("o").alias("n"))
    j = (
        obs.join(F.broadcast(rl), "lang")
        .join(F.broadcast(cs), "source")
        .crossJoin(F.broadcast(n))
    )
    e = F.col("rl").cast("double") * F.col("cs") / F.col("n")
    term = (F.col("o") - e) * (F.col("o") - e) / e
    return j.agg(
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.count_distinct("lang") - 1) * (F.count_distinct("source") - 1)
        ).alias("dof"),
        round4(F.sum(term)).alias("chi2"),
    )


_register(
    "analytic_chi_square",
    Query(
        spark=_chi_square,
        sql=f"""
WITH obs AS (
  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2
),
rl AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rl FROM obs GROUP BY 1),
cs AS (SELECT source, CAST(sum(o) AS BIGINT) AS cs FROM obs GROUP BY 1),
n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
j AS (
  SELECT obs.o, rl.rl, cs.cs, n.n
  FROM obs JOIN rl USING (lang) JOIN cs USING (source) CROSS JOIN n
),
t AS (
  SELECT o,
    (o - CAST(rl AS DOUBLE) * cs / n) * (o - CAST(rl AS DOUBLE) * cs / n)
      / (CAST(rl AS DOUBLE) * cs / n) AS term
  FROM j
)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
  CAST((SELECT count(DISTINCT lang) FROM documents) - 1 AS BIGINT)
    * CAST((SELECT count(DISTINCT source) FROM documents) - 1 AS BIGINT) AS dof,
  {_r('sum(term)', 'chi2')}
FROM t""",
    ),
)
