"""Trainable quality classifier — the DCLM / FineWeb-Edu selection
pattern, model-light: a fastText-style LINEAR classifier over hashed
bag-of-words features, trained with a fixed number of full-batch
logistic-regression steps, then used to score every document.

The reference library (/root/reference/indicators.py) has no
classifier surface; this extends the corpus-selection family (SURVEY
§2 extension set) beside DSIR (distribution matching without a model)
and SSL-prototypes (geometry without labels): here a cheap supervised
signal (any labeled subset or pseudo-label) ranks the whole corpus.

Everything is deterministic and DuckDB-replayable — the same recipe
that makes :func:`similarity.kmeans_lloyd` oracle-checkable:

* features hash through the engine-portable md5 bucket
  (:func:`sampling.hash_bucket`), values are exact integer ratios
  (count / n_tokens — one IEEE divide, bit-identical anywhere);
* every cross-row sum (per-doc margin, per-bucket gradient) is
  re-QUANTIZED before it feeds the next step, so double-summation
  reassociation noise (~1e-13 relative) and the engines' 1-ulp ``exp``
  disagreement can never compound across iterations;
* weights live on the driver between steps (O(buckets) floats — the
  same driver-state budget as k-means centroids) and re-enter the plan
  as a literal array, so the scoring pass is a row-local
  ``element_at`` + one doc-keyed aggregation, never a weights join.

Scale shape per step: one exchange keyed by doc id (margin agg — the
residual join reuses that partitioning) and one tiny exchange keyed by
bucket (≤ buckets+1 rows out).  The feature table is built once and
persisted across the ``2·iters + 1`` passes.  At 100 TB: identical
plan — the only growing state is the feature table itself; raise
``buckets`` freely (driver holds one float per bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text as _text
from .sampling import bucket_sql, hash_bucket

#: weight/margin quantum — coarse enough to absorb cross-engine sum
#: reassociation + exp ulp noise, fine enough for 3-step updates.
WQ = 1_000_000.0


def _qw(c: Column) -> Column:
    return F.floor(c.cast("double") * WQ + 0.500000001) / WQ


def _q4(c: Column) -> Column:
    return F.floor(c.cast("double") * 1e4 + 0.500000001) / 1e4


def logreg_features(
    df: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
    seed: str = "qlr",
) -> tuple[DataFrame, DataFrame]:
    """(features, labels): hashed unigram buckets with x = count/n_tokens
    plus a constant bias feature at bucket index ``buckets``.  The label
    rides along on every feature row so the per-step margin aggregation
    recovers it with ``any_value`` — no per-iteration label join."""
    ws = _text.words(F.col(text_col))
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        label.cast("double").alias("y"),
        ws.alias("_ws"),
    )
    lab = base.select("_id", "y")
    tok = base.select(
        "_id", "y", F.size("_ws").alias("_n"), F.explode("_ws").alias("_tok")
    )
    feat = (
        tok.groupBy("_id", hash_bucket(F.col("_tok"), seed, buckets).alias("bkt"))
        .agg(
            (F.count(F.lit(1)).cast("double") / F.any_value("_n")).alias("x"),
            F.any_value("y").alias("y"),
        )
    )
    bias = lab.select(
        "_id",
        F.lit(buckets).cast("bigint").alias("bkt"),
        F.lit(1.0).alias("x"),
        "y",
    )
    return feat.unionAll(bias), lab


def _margins(feat: DataFrame, w: list[float]) -> DataFrame:
    """Per-doc quantized margin m = Σ x·w[bkt] under literal weights;
    carries y so the residual needs no join back to the labels."""
    from .similarity import _lit_vec

    # one parsed array literal (not 257 py4j element lits) per step —
    # the elementwise form measured ~1 s/iteration of pure driver-side
    # expression construction (r13); values are bit-identical
    warr = _lit_vec(w)
    return (
        feat.withColumn("_w", F.element_at(warr, (F.col("bkt") + 1).cast("int")))
        .groupBy("_id")
        .agg(
            _qw(F.sum(F.col("x") * F.col("_w"))).alias("m"),
            F.any_value("y").alias("y"),
        )
    )


def logreg_quality(
    df: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
    iters: int = 3,
    lr: float = 50.0,
    seed: str = "qlr",
) -> DataFrame:
    """Train the hashed-feature logistic classifier on ``label`` (full
    batch, ``iters`` quantized GD steps from w=0) and score every
    document.  Returns (id, y, ``logit`` / ``prob`` 4dp-quantized,
    ``pred``) — rank by ``prob`` or threshold ``pred`` to select data.
    """
    feat, lab = logreg_features(df, label, id_col, text_col, buckets, seed)
    feat = feat.persist()
    # n = |lab| folds into the FIRST gradient aggregation instead of a
    # dedicated count job: the bias feature contributes exactly one
    # bkt==buckets row per labeled document (and resid covers every
    # feat document), so that bucket's row count IS the label count.
    # The first update reads n from the same collect that feeds it.
    n: int | None = None
    w = [0.0] * (buckets + 1)
    for _ in range(iters):
        m = _margins(feat, w)
        sig = 1.0 / (1.0 + F.exp(-F.col("m")))
        resid = m.select("_id", (sig - F.col("y")).alias("r"))
        g = (
            feat.join(resid, "_id")
            .groupBy("bkt")
            .agg(
                F.sum(F.col("x") * F.col("r")).alias("g"),
                F.count(F.lit(1)).alias("c"),
            )
            .collect()
        )
        grad = {int(r["bkt"]): float(r["g"]) for r in g}
        if n is None:
            n = next(
                (int(r["c"]) for r in g if int(r["bkt"]) == buckets), 0
            )
        # identical op order to the oracle SQL: w - lr*g/n, then quantize
        w = [
            _pyq(w[j] - lr * grad.get(j, 0.0) / n)
            for j in range(buckets + 1)
        ]
    out = _margins(feat, w)
    feat.unpersist(blocking=False)
    prob = 1.0 / (1.0 + F.exp(-F.col("m")))
    return out.select(
        F.col("_id").alias(id_col),
        F.col("y").cast("long").alias("y"),
        _q4(F.col("m")).alias("logit"),
        _q4(prob).alias("prob"),
        (prob >= 0.5).cast("long").alias("pred"),
    )


def _pyq(v: float) -> float:
    """Driver-side copy of :func:`_qw` (same IEEE op sequence)."""
    import math

    return math.floor(v * WQ + 0.500000001) / WQ


def logreg_sql(
    label_sql: str,
    buckets: int = 256,
    iters: int = 3,
    lr: float = 50.0,
    seed: str = "qlr",
) -> str:
    """DuckDB replay of :func:`logreg_quality` on the ``documents``
    view: unrolled iteration CTEs, the same quantization points."""

    def qw(e: str) -> str:
        return f"floor(({e}) * {WQ!r} + 0.500000001) / {WQ!r}"

    def q4(e: str) -> str:
        return f"floor(({e}) * 1e4 + 0.500000001) / 1e4"

    bkt = bucket_sql("tok", seed, buckets)
    parts = [
        f"""
lab AS (
  SELECT doc_id AS _id, CAST({label_sql} AS DOUBLE) AS y
  FROM documents WHERE text IS NOT NULL
),
feat AS (
  SELECT _id, bkt, CAST(count(*) AS DOUBLE) / any_value(n) AS x
  FROM (
    SELECT doc_id AS _id, len(string_split(text, ' ')) AS n,
      unnest(string_split(text, ' ')) AS tok
    FROM documents WHERE text IS NOT NULL
  ), LATERAL (SELECT {bkt} AS bkt) b
  GROUP BY _id, bkt
  UNION ALL
  SELECT _id, {buckets}, 1.0 FROM lab
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM lab),
w0 AS (
  SELECT unnest(generate_series(0, {buckets})) AS bkt, 0.0 AS w
)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
m{t} AS (
  SELECT f._id, {qw('sum(f.x * w.w)')} AS m
  FROM feat f JOIN w{t - 1} w USING (bkt) GROUP BY f._id
),
g{t} AS (
  SELECT f.bkt, sum(f.x * (1.0 / (1.0 + exp(-m.m)) - l.y)) AS g
  FROM feat f JOIN m{t} m USING (_id) JOIN lab l USING (_id)
  GROUP BY f.bkt
),
w{t} AS (
  SELECT w.bkt,
    {qw(f'w.w - {lr!r} * COALESCE(g.g, 0.0) / nn.c')} AS w
  FROM w{t - 1} w LEFT JOIN g{t} g USING (bkt), nn
)"""
        )
    parts.append(
        f""",
mf AS (
  SELECT f._id, {qw('sum(f.x * w.w)')} AS m
  FROM feat f JOIN w{iters} w USING (bkt) GROUP BY f._id
)
SELECT m._id AS doc_id, CAST(l.y AS BIGINT) AS y,
  {q4('m.m')} AS logit,
  {q4('1.0 / (1.0 + exp(-m.m))')} AS prob,
  CAST(1.0 / (1.0 + exp(-m.m)) >= 0.5 AS BIGINT) AS pred
FROM mf m JOIN lab l USING (_id)"""
    )
    # parts after the first already lead with their own comma
    return "WITH " + parts[0].lstrip("\n") + "".join(parts[1:])
