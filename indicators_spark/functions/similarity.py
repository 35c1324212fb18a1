"""Similarity search over an embedding column (``array<float>``).

* ``knn_bruteforce`` — exact top-k cosine neighbors.  The dot product is an
  explicit 64-term left-associated expression (``expand_dot``): pure
  whole-stage-codegen arithmetic, bit-identical across engines (the DuckDB
  oracle generates the same expression), and ~10× faster than a Python UDF.
* ``cosine_pairs`` — all pairs above a cosine threshold (embedding-based
  near-dup dedup).
* ``knn_lsh`` — the scale path: random-hyperplane LSH bucketing
  (deterministic hyperplanes derived from the portable hash), candidate
  join inside buckets only, exact re-rank.  At 100 TB the brute-force
  cross join is O(n·q); LSH makes the candidate set ~bucket-local.

Scale notes: the brute-force form broadcasts the (small) query side, so
the big side streams through one scan with no shuffle; top-k uses a
per-query window over the candidate set (partial top-k per partition via
AQE).  For billion-row corpora, swap in the LSH variant or an IVF layout
(bucket by coarse centroid id, prune buckets by query-centroid distance).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def expand_dot(a: str, b: str, dim: int) -> Column:
    """Explicit Σ a[i]·b[i] with per-element double casts — deterministic
    left-associated IEEE order, identical to the oracle's generated SQL."""
    acc = None
    for i in range(1, dim + 1):
        term = F.element_at(F.col(a), i).cast("double") * F.element_at(
            F.col(b), i
        ).cast("double")
        acc = term if acc is None else acc + term
    return acc


def with_norm(df: DataFrame, vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    acc = None
    for i in range(1, dim + 1):
        x = F.element_at(F.col(vec_col), i).cast("double")
        term = x * x
        acc = term if acc is None else acc + term
    return df.withColumn("_norm", F.sqrt(acc))


def knn_bruteforce(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Broadcast the query side (small by construction); candidates stream.
    Ties broken by neighbor id for full determinism."""
    base = with_norm(df, vec_col, dim).select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"), F.col("_norm").alias("nn")
    )
    q = with_norm(queries, vec_col, dim).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"), F.col("_norm").alias("qn")
    )
    joined = base.crossJoin(F.broadcast(q)).filter(F.col("nid") != F.col("qid"))
    cos = expand_dot("qvec", "nvec", dim) / (F.col("qn") * F.col("nn"))
    scored = joined.withColumn("cos", cos)
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cos")
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """All (ia < ib) pairs with cosine ≥ threshold — embedding near-dup."""
    base = with_norm(df, vec_col, dim)
    a = base.select(
        F.col(id_col).alias("ia"), F.col(vec_col).alias("va"), F.col("_norm").alias("na")
    )
    b = base.select(
        F.col(id_col).alias("ib"), F.col(vec_col).alias("vb"), F.col("_norm").alias("nb")
    )
    joined = a.join(b, F.col("ia") < F.col("ib"))
    cos = expand_dot("va", "vb", dim) / (F.col("na") * F.col("nb"))
    return joined.withColumn("cos", cos).filter(F.col("cos") >= threshold).select(
        "ia", "ib", "cos"
    )


def knn_lsh(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Hyperplane m's component i is a deterministic ±1 derived from the
    portable hash of "m:i" — reproducible everywhere, no RNG state.  Rows
    hash to an n_planes-bit signature; candidates are joined within the
    same bucket, then exactly re-ranked.  Recall < 1 by construction — this
    is the scale path, not the oracle path."""
    from .text import portable_word_hash

    def signature(vec: str) -> Column:
        sig = F.lit(0)
        for m in range(n_planes):
            acc = None
            for i in range(1, dim + 1):
                s = portable_word_hash(F.lit(f"{m}:{i}")) % 2 * 2 - 1
                term = F.element_at(F.col(vec), i).cast("double") * s.cast("double")
                acc = term if acc is None else acc + term
            sig = sig + F.when(acc > 0, F.lit(1 << m)).otherwise(F.lit(0))
        return sig

    base = with_norm(df, vec_col, dim).select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nvec"),
        F.col("_norm").alias("nn"),
        signature(vec_col).alias("bucket"),
    )
    q = with_norm(queries, vec_col, dim).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        F.col("_norm").alias("qn"),
        signature(vec_col).alias("bucket"),
    )
    joined = base.join(F.broadcast(q), "bucket").filter(F.col("nid") != F.col("qid"))
    cos = expand_dot("qvec", "nvec", dim) / (F.col("qn") * F.col("nn"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        joined.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cos")
    )
