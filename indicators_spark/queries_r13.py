"""Round-13 catalog registrations (VERDICT r12 #1/#6/#7).

1. ``similarity_knn_ivf_trained`` — IVF search whose coarse quantizer
   is TRAINED Lloyd k-means centers (``similarity.kmeans_centers``, the
   green ``kmeans_train_assign`` machinery) instead of the lowest-id
   stand-in: the composition a production 100 TB index runs.  The
   oracle replays Lloyd → cosine cell assign → probe → exact re-rank in
   one statement.
2. ``similarity_ivf_recall_trained`` — the recall@k audit
   (``similarity_ivf_recall``'s shape) measured AT THE TRAINED CELLS,
   so the ANN family's quality evidence matches the quantizer a
   production index would use.
3. ``similarity_knn_ivf_epochs`` — the maintained-index LIFECYCLE
   surfaced to the driver: the index is built from two overlapping
   ``ivf_assign_cells`` batches reduced earlier-wins (min-epoch, the
   ``IvfIndexIngestSink`` ledger rule pinned in
   tests/test_ivf_ingest.py), compacted, then searched through
   ``knn_ivf_from_index``; the oracle encodes the same min-epoch
   reduction relationally.
4. ``analytic_group_weighted_tail`` — the ``ks``-map form of
   ``scale.kth_element_by_group_weighted`` at TWO tail ranks
   (quantity-weighted p90 + p99 of l_extendedprice per l_returnflag) —
   the per-source token-weighted gate curation pipelines actually run;
   oracle is the cumulative-weight order statistic at both integer
   ranks.

Cross-module references are DEFERRED to call time (the queries_r11/r12
precedent): this module runs from queries.py's registration tail while
sibling modules may still be mid-import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .queries import Query, _register

#: trained-IVF config: quantizer = the green kmeans_train_assign
#: training (k=8, 2 Lloyd rounds); 3-cell probe, top-5.
IVF_TR_K, IVF_TR_NPROBE = 5, 3

#: epoch-lifecycle batch split: batch 1 = vec_id < 300 (epoch 1),
#: batch 2 = vec_id >= 200 (epoch 2) — ids 200–299 land in BOTH
#: epochs, so the earlier-wins reduction is genuinely exercised, and
#: the union covers every id at any SF ≥ the smallest test fixture.
EPOCH_B1_HI, EPOCH_B2_LO = 300, 200


def _trained_cents_ctes() -> str:
    """CTE chain ``c0, …, c{iters}`` producing the trained quantizer —
    the exact Lloyd replay the green ``kmeans_train_assign`` oracle
    runs (same quantization, same lowest-id init, same per-dimension
    means), reused verbatim from queries_pipeline."""
    from .queries_pipeline import _KM_ITERS, _KM_K, _km_qv, _km_round

    rounds = ",".join(
        _km_round(f"c{i - 1}" if i > 1 else "c0", i)
        for i in range(1, _KM_ITERS + 1)
    )
    return f"""c0 AS (
  SELECT CAST(vec_id AS INT) AS cid, {_km_qv('embedding')} AS cvec
  FROM embeddings WHERE vec_id < {_KM_K}
),{rounds}"""


def _ivf_trained_search_sql(select_clause: str) -> str:
    """Shared oracle skeleton: trained centers → cosine cell assign →
    probe → exact re-rank (the ``similarity_knn_ivf`` replay with the
    trained-centroid CTEs in place of the lowest-id stand-in)."""
    from .queries_ext import _dot_sql, _norm_sql
    from .queries_pipeline import _KM_ITERS

    return f"""
WITH {_trained_cents_ctes()},
cc AS (
  SELECT cid, cvec, {_norm_sql('cvec')} AS cn FROM c{_KM_ITERS}
),
n AS (
  SELECT vec_id, embedding, {_norm_sql('embedding')} AS nn FROM embeddings
),
assign AS (
  SELECT n.vec_id AS nid, n.embedding AS nv, n.nn, cc.cid,
    row_number() OVER (
      PARTITION BY n.vec_id
      ORDER BY ({_dot_sql('n.embedding', 'cc.cvec')}) / (n.nn * cc.cn)
        DESC, cc.cid
    ) AS rk
  FROM n CROSS JOIN cc
),
a AS (SELECT nid, nv, nn, cid FROM assign WHERE rk = 1),
q AS (SELECT vec_id AS qid, embedding AS qv, nn AS qn FROM n
      WHERE vec_id < 10),
probe AS (
  SELECT q.qid, q.qv, q.qn, cc.cid,
    row_number() OVER (
      PARTITION BY q.qid
      ORDER BY ({_dot_sql('q.qv', 'cc.cvec')}) / (q.qn * cc.cn)
        DESC, cc.cid
    ) AS rk
  FROM q CROSS JOIN cc
),
p AS (SELECT qid, qv, qn, cid FROM probe WHERE rk <= {IVF_TR_NPROBE}),
scored AS (
  SELECT p.qid, a.nid,
    ({_dot_sql('p.qv', 'a.nv')}) / (p.qn * a.nn) AS cos
  FROM a JOIN p USING (cid)
  WHERE a.nid != p.qid
),
ranked AS (
  SELECT qid, nid, cos,
    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
  FROM scored
)
{select_clause}"""


def _knn_ivf_trained_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .functions import similarity
    from .queries import round4
    from .queries_ext import _emb
    from .queries_pipeline import _KM_ITERS, _KM_K

    emb = _emb(spark, sf_dir)
    return similarity.knn_ivf_trained(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=IVF_TR_K,
        n_centroids=_KM_K,
        iters=_KM_ITERS,
        nprobe=IVF_TR_NPROBE,
    ).select("qid", "nid", "rank", round4(F.col("cos")).alias("cos"))


def _knn_ivf_trained_sql() -> str:
    from .queries import _r

    return _ivf_trained_search_sql(
        f"SELECT qid, nid, rank, {_r('cos', 'cos')} FROM ranked "
        f"WHERE rank <= {IVF_TR_K}"
    )


_register(
    "similarity_knn_ivf_trained",
    Query(spark=_knn_ivf_trained_spark, sql=_knn_ivf_trained_sql),
)


def _ivf_recall_trained_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k of the TRAINED-quantizer IVF against brute
    force — the audit `similarity_ivf_recall` runs for the stand-in
    cells, now at the cells a production index would use."""
    from pyspark.sql import functions as F

    from .functions import similarity
    from .queries_ext import _emb
    from .queries_pipeline import _KM_ITERS, _KM_K

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 10)
    exact = similarity.knn_bruteforce(emb, q, k=IVF_TR_K).select("qid", "nid")
    ivf = similarity.knn_ivf_trained(
        emb, q, k=IVF_TR_K, n_centroids=_KM_K, iters=_KM_ITERS,
        nprobe=IVF_TR_NPROBE,
    ).select("qid", "nid")
    hits = (
        exact.join(ivf, ["qid", "nid"], "left_semi")
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    base = exact.groupBy("qid").agg(F.count(F.lit(1)).alias("k"))
    return base.join(hits, "qid", "left").select(
        "qid",
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        (
            F.floor(
                F.coalesce(F.col("n_hit"), F.lit(0))
                / F.col("k").cast("double")
                * 1e4
                + F.lit(0.500000001)
            )
            / 1e4
        ).alias("recall"),
    )


def _ivf_recall_trained_sql() -> str:
    from .queries_ext import _dot_sql, _norm_sql

    ivf_part = _ivf_trained_search_sql(
        f"SELECT qid, nid FROM ranked WHERE rank <= {IVF_TR_K}"
    )
    return f"""
WITH ir AS (SELECT * FROM ({ivf_part}) ivf_t),
n2 AS (
  SELECT vec_id, embedding, {_norm_sql('embedding')} AS nn FROM embeddings
),
q2 AS (SELECT vec_id AS qid, embedding AS qv, nn AS qn FROM n2
       WHERE vec_id < 10),
es AS (
  SELECT q2.qid, n2.vec_id AS nid,
    ({_dot_sql('q2.qv', 'n2.embedding')}) / (q2.qn * n2.nn) AS cos
  FROM n2 CROSS JOIN q2 WHERE n2.vec_id != q2.qid
),
er AS (
  SELECT qid, nid FROM (
    SELECT qid, nid,
      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
    FROM es
  ) WHERE rank <= {IVF_TR_K}
),
kk AS (SELECT qid, count(*) AS k FROM er GROUP BY qid),
hits AS (
  SELECT er.qid, count(*) AS n_hit
  FROM er JOIN ir ON er.qid = ir.qid AND er.nid = ir.nid
  GROUP BY er.qid
)
SELECT kk.qid, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
  floor(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / kk.k * 1e4 + 0.500000001)
    / 1e4 AS recall
FROM kk LEFT JOIN hits h USING (qid)"""


_register(
    "similarity_ivf_recall_trained",
    Query(spark=_ivf_recall_trained_spark, sql=_ivf_recall_trained_sql),
)


def _knn_ivf_epochs_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index lifecycle batch-side: two overlapping assignment epochs →
    earlier-wins compaction → search through the compacted index.  The
    reduction is the sink ledger rule (duplicate ids keep their FIRST
    epoch's row); with a frozen quantizer the surviving rows are
    bit-identical to a single-epoch assignment, so the search output is
    DEFINED equal to ``similarity_knn_ivf`` — the lifecycle is what is
    under test.  Scale shape: the ledger is the skinny (id, cid, norm,
    epoch) map; compaction is one groupBy(id) min_by — never vectors."""
    from pyspark.sql import functions as F

    from .functions import similarity
    from .queries import round4
    from .queries_ext import _emb

    emb = _emb(spark, sf_dir)
    cents = similarity.ivf_centroids(emb, 16)
    b1 = similarity.ivf_assign_cells(
        emb.filter(F.col("vec_id") < EPOCH_B1_HI), cents
    ).withColumn("epoch", F.lit(1))
    b2 = similarity.ivf_assign_cells(
        emb.filter(F.col("vec_id") >= EPOCH_B2_LO), cents
    ).withColumn("epoch", F.lit(2))
    ledger = b1.unionByName(b2).select("nid", "cid", "nn", "epoch")
    compacted = ledger.groupBy("nid").agg(
        F.min_by(F.struct("cid", "nn"), "epoch").alias("_w")
    )
    index = compacted.select(
        F.col("nid").alias("vec_id"),
        F.col("_w.cid").alias("cid"),
        F.col("_w.nn").alias("norm"),
    )
    return similarity.knn_ivf_from_index(
        emb,
        index,
        emb.filter(F.col("vec_id") < 10),
        cents,
        k=5,
        nprobe=4,
    ).select("qid", "nid", "rank", round4(F.col("cos")).alias("cos"))


def _knn_ivf_epochs_sql() -> str:
    """The ``similarity_knn_ivf`` replay with the assignment routed
    through the two-epoch union + min-epoch reduction — the oracle
    encodes the LIFECYCLE, not just the final search."""
    from .queries import _r
    from .queries_ext import _dot_sql, _norm_sql

    return f"""
WITH n AS (
  SELECT vec_id, embedding, {_norm_sql('embedding')} AS nn FROM embeddings
),
c AS (
  SELECT vec_id AS cid, embedding AS cv, nn AS cn FROM n WHERE vec_id < 16
),
assign AS (
  SELECT n.vec_id AS nid, n.embedding AS nv, n.nn, c.cid,
    row_number() OVER (
      PARTITION BY n.vec_id
      ORDER BY ({_dot_sql('n.embedding', 'c.cv')}) / (n.nn * c.cn)
        DESC, c.cid
    ) AS rk
  FROM n CROSS JOIN c
),
a0 AS (SELECT nid, nv, nn, cid FROM assign WHERE rk = 1),
led AS (
  SELECT nid, cid, nn, 1 AS epoch FROM a0 WHERE nid < {EPOCH_B1_HI}
  UNION ALL
  SELECT nid, cid, nn, 2 AS epoch FROM a0 WHERE nid >= {EPOCH_B2_LO}
),
comp AS (
  SELECT nid, cid, nn FROM (
    SELECT *, row_number() OVER (PARTITION BY nid ORDER BY epoch) AS ern
    FROM led
  ) WHERE ern = 1
),
a AS (
  SELECT comp.nid, n.embedding AS nv, comp.nn, comp.cid
  FROM comp JOIN n ON comp.nid = n.vec_id
),
q AS (SELECT vec_id AS qid, embedding AS qv, nn AS qn FROM n
      WHERE vec_id < 10),
probe AS (
  SELECT q.qid, q.qv, q.qn, c.cid,
    row_number() OVER (
      PARTITION BY q.qid
      ORDER BY ({_dot_sql('q.qv', 'c.cv')}) / (q.qn * c.cn) DESC, c.cid
    ) AS rk
  FROM q CROSS JOIN c
),
p AS (SELECT qid, qv, qn, cid FROM probe WHERE rk <= 4),
scored AS (
  SELECT p.qid, a.nid,
    ({_dot_sql('p.qv', 'a.nv')}) / (p.qn * a.nn) AS cos
  FROM a JOIN p USING (cid)
  WHERE a.nid != p.qid
),
ranked AS (
  SELECT qid, nid, cos,
    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
  FROM scored
)
SELECT qid, nid, rank, {_r('cos', 'cos')} FROM ranked WHERE rank <= 5"""


_register(
    "similarity_knn_ivf_epochs",
    Query(spark=_knn_ivf_epochs_spark, sql=_knn_ivf_epochs_sql),
)


def _group_weighted_tail_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantity-weighted p90 AND p99 of l_extendedprice via
    the ``ks``-map form: the per-group ranks are computed from one
    skinny per-group weight aggregate (broadcast-sized — one row per
    source), then both tail ranks refine ALL groups in shared
    histogram passes.  This is the gate shape curation pipelines run
    per source ("drop a source's docs above its token-weighted p99
    length")."""
    from pyspark.sql import functions as F

    from .queries import round4
    from .scale import kth_element_by_group_weighted
    from .sources.prices import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull()
        & F.col("l_returnflag").isNotNull()
    )
    totals = {
        r["g"]: int(r["tw"])
        for r in li.groupBy(F.col("l_returnflag").alias("g"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("tw"))
        .collect()
    }
    wks90 = {g: (9 * tw + 9) // 10 for g, tw in totals.items()}
    wks99 = {g: (99 * tw + 99) // 100 for g, tw in totals.items()}
    p90 = kth_element_by_group_weighted(
        li, "l_extendedprice", "l_quantity", "l_returnflag",
        wks=wks90, final_rows=4096,
    ).select(
        "l_returnflag",
        "total_w",
        F.col("wk").alias("wk90"),
        F.col("value").alias("_p90"),
    )
    p99 = kth_element_by_group_weighted(
        li, "l_extendedprice", "l_quantity", "l_returnflag",
        wks=wks99, final_rows=4096,
    ).select(
        "l_returnflag",
        F.col("wk").alias("wk99"),
        F.col("value").alias("_p99"),
    )
    return p90.join(p99, "l_returnflag").select(
        "l_returnflag",
        "total_w",
        "wk90",
        round4(F.col("_p90")).alias("wp90"),
        "wk99",
        round4(F.col("_p99")).alias("wp99"),
    )


def _group_weighted_tail_sql() -> str:
    from .queries import _r

    return f"""
WITH v AS (
  SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS x,
    CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    AND l_returnflag IS NOT NULL
),
t AS (SELECT g, sum(w) AS tw FROM v GROUP BY g),
r AS (SELECT g, x, sum(w) OVER (PARTITION BY g ORDER BY x) AS cw FROM v)
SELECT t.g AS l_returnflag, CAST(t.tw AS BIGINT) AS total_w,
  CAST((9 * t.tw + 9) // 10 AS BIGINT) AS wk90,
  {_r(
      "(SELECT min(x) FROM r WHERE r.g = t.g "
      "AND cw >= (9 * t.tw + 9) // 10)",
      "wp90",
  )},
  CAST((99 * t.tw + 99) // 100 AS BIGINT) AS wk99,
  {_r(
      "(SELECT min(x) FROM r WHERE r.g = t.g "
      "AND cw >= (99 * t.tw + 99) // 100)",
      "wp99",
  )}
FROM t"""


_register(
    "analytic_group_weighted_tail",
    Query(spark=_group_weighted_tail_spark, sql=_group_weighted_tail_sql),
)
