"""Iterative graph analytics over DataFrame edge lists.

``pagerank`` runs weighted PageRank for a FIXED number of iterations as a
deterministic DataFrame loop — the Pregel-style pattern expressed
relationally so Catalyst plans every superstep:

* state is a skinny ``(node, rank)`` table (one row per vertex — at
  billions of vertices this is still tiny next to the edge list);
* each iteration joins ranks to edges on ``src`` (broadcast when the rank
  side is small, hash otherwise), scales by ``w/outw``, and reduces with
  ONE ``dst``-keyed groupBy (map-side combined — the shuffle carries at
  most |V| rows per partition);
* edge normalization (``outw``) is computed once before the loop, not per
  superstep.

Fixed iteration count keeps the computation a finite, replayable plan
(and lets the DuckDB oracle replay the exact same supersteps as nested
CTEs).  For convergence-driven runs, wrap the loop with a delta check on
the (tiny) rank table and localCheckpoint every ~10 supersteps to cut
lineage growth.

The reference engine has no graph surface; this supplies the
link-analysis building block (domain/source authority scoring is a
standard web-corpus curation signal — see the PageRank citation in
Common-Crawl-style pipeline literature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Weighted PageRank after ``iters`` supersteps from a uniform start.

    ``r_{t+1}(v) = (1-d)/N + d · Σ_{u→v} r_t(u) · w(u,v) / outw(u)``

    Nodes are the union of sources and destinations; sink nodes (no
    out-edges) keep their teleport share and simply leak the rest — the
    standard simplification when the oracle must replay the arithmetic
    bit-for-bit.  ``broadcast_ranks=True`` broadcasts the rank table into
    the per-iteration join (right for |V| ≪ |E|); pass False to hash-join
    when the vertex table itself is huge."""
    w_col = (
        F.col(weight).cast("double") if weight else F.lit(1.0)
    )
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w_col.alias("w")
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    e = e.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("outw")).alias("frac")
    )
    # The normalized edge list is read once per superstep; its lineage may
    # be a fact-scale join (e.g. a trade graph derived from
    # lineitem⋈orders), so persist it — otherwise every iteration replays
    # the whole derivation.  nodes.count() below materializes the cache.
    # The returned plan references the cache, so it stays pinned for the
    # plan's lifetime (LRU-evictable; callers looping many graphs can
    # df.unpersist() after consuming the result).
    e = e.persist()
    # nodes is referenced once per superstep (the rank re-attach join)
    # plus the r0 seed — persist it too (|V| rows; r13), so each
    # superstep reads the tiny cached vertex table instead of replaying
    # union+distinct over the edge cache.  The count below materializes
    # both caches in one pass.
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    teleport = (1.0 - damping) / n_nodes
    for _ in range(iters):
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            e.join(r, e["src"] == r["node"])
            .select("dst", (F.col("rank") * F.col("frac")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # contrib is ≤|V| rows; under broadcast_ranks (the |V|≪|E| regime)
        # it broadcasts for the same reason the rank table does, removing
        # the nodes-side shuffle from every superstep
        if broadcast_ranks:
            contrib = F.broadcast(contrib)
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    directed: bool = False,
    broadcast_labels: bool = True,
) -> DataFrame:
    """Synchronous label propagation (community detection) for a fixed
    number of supersteps: every node starts in its own community (label =
    its own id), then each superstep adopts the label with the highest
    total incident edge weight among neighbors, ties to the SMALLEST
    label — the deterministic synchronous variant (async LPA is
    order-dependent and unreproducible by design; this one replays
    identically anywhere, including in the SQL oracle).

    Integer-valued weights (counts — the common case) keep every vote
    EXACT (sums below 2⁵³ are exact in doubles), so ties break purely on
    the label order.  Fractional weights are accepted too; their vote
    sums are then subject to ordinary float summation, so only
    near-exact ties (≪1e-12 relative) could flip — document your weights
    if you need bit-reproducibility.

    Scale shape mirrors :func:`pagerank`: state is one (node, label) row
    per vertex; a superstep is edges⋈labels (broadcast the label side
    when |V| ≪ |E| — ``broadcast_labels=False`` hash-joins instead when
    the vertex table itself is too big to broadcast, the same escape
    hatch as pagerank's ``broadcast_ranks``) → one (node, label)-keyed
    weight sum → one per-node argmax via ``max_by``-style struct ordering
    — all map-side combined.  Undirected graphs union the reversed edge
    list once, up front."""
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), w_col.alias("w")
    )
    if not directed:
        e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
    # same per-superstep reuse as pagerank: don't replay the edge
    # derivation every iteration
    e = e.persist()
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(iters):
        lab = F.broadcast(labels) if broadcast_labels else labels
        votes = (
            e.join(lab, e["u"] == lab["node"])
            .groupBy(F.col("v").alias("n"), "label")
            .agg(F.sum("w").alias("wsum"))
        )
        # argmax by (wsum desc, label asc): max of struct(wsum, neg-ish)
        # — label ordering must invert, so use min over (-wsum, label).
        best = (
            votes.groupBy("n")
            .agg(F.min(F.struct((-F.col("wsum")).alias("nw"), "label")).alias("b"))
            .select(F.col("n"), F.col("b.label").alias("new_label"))
        )
        labels = nodes.join(
            best, nodes["node"] == best["n"], "left"
        ).select(
            "node", F.coalesce(F.col("new_label"), F.col("node")).alias("label")
        )
    return labels
