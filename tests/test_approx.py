"""Threshold-equivalence tests for the size-dispatched approx/sketch
module: forcing the at-scale branch (min_rows=0 / tiny max_exact_frame)
must produce results equal — or sketch-accurate-close — to the exact
branch on the same input, with the same output schema."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from indicators_spark import approx


@pytest.fixture(scope="module")
def numbers(spark):
    rng = random.Random(21)
    rows = [
        ("g1" if i % 3 else "g2", float(i % 97), rng.uniform(0, 1000.0), i)
        for i in range(2000)
    ]
    return spark.createDataFrame(
        rows, "grp string, small double, val double, rid long"
    )


def test_percentile_auto_dispatch_paths(numbers):
    exact = numbers.agg(
        approx.percentile_auto("val", 0.5, n_rows=10, min_rows=100).alias("m")
    ).first()["m"]
    sketch = numbers.agg(
        approx.percentile_auto(
            "val", 0.5, n_rows=10**9, min_rows=100
        ).alias("m")
    ).first()["m"]
    # accuracy=10k on 2k rows -> the digest is lossless up to rank 1,
    # and both results must sit inside the data's central mass
    assert abs(sketch - exact) <= (exact * 0.01 + 1.0)


def test_count_distinct_auto_paths(numbers):
    ex = numbers.agg(
        approx.count_distinct_auto("small", n_rows=10, min_rows=100).alias("d")
    ).first()["d"]
    hll = numbers.agg(
        approx.count_distinct_auto(
            "small", n_rows=10**9, min_rows=100
        ).alias("d")
    ).first()["d"]
    assert ex == 97
    assert abs(hll - ex) <= max(2, int(ex * 0.05))


def test_winsorize_auto_paths_agree(numbers):
    cols = ("grp", "rid", "val_winsor")
    ex = {
        r["rid"]: r["val_winsor"]
        for r in approx.winsorize_auto(
            numbers, "val", "grp", min_rows=10**9
        ).select(*cols).collect()
    }
    ap = {
        r["rid"]: r["val_winsor"]
        for r in approx.winsorize_auto(
            numbers, "val", "grp", min_rows=0
        ).select(*cols).collect()
    }
    assert set(ex) == set(ap)
    # t-digest bands may differ by a hair; clipped values stay within a
    # tight relative band and the bulk (interior points) is identical
    diffs = [abs(ex[k] - ap[k]) for k in ex]
    assert sum(d > 0 for d in diffs) < len(diffs) * 0.15
    assert max(diffs) <= 25.0  # < 2.5% of the value range


def test_histogram_equidepth_auto_paths(numbers):
    ex = {
        r["bucket"]: r["n"]
        for r in approx.histogram_equidepth_auto(
            numbers, "val", min_rows=10**9
        ).collect()
    }
    ap = {
        r["bucket"]: r["n"]
        for r in approx.histogram_equidepth_auto(
            numbers, "val", min_rows=0
        ).collect()
    }
    assert set(ex) == set(ap) == {0, 1, 2, 3}
    assert sum(ex.values()) == sum(ap.values()) == 2000
    for b in ex:  # equi-depth within sketch tolerance on both paths
        assert abs(ex[b] - ap[b]) <= 50


def test_rolling_median_auto_paths_agree(ohlcv):
    kw = dict(
        order_cols=("timestamp", "seq"), partition_cols=("symbol",)
    )
    ex = approx.rolling_median_auto(
        ohlcv, "close", 5, max_exact_frame=100, **kw
    )
    ap = approx.rolling_median_auto(
        ohlcv, "close", 5, max_exact_frame=1, **kw
    )
    key = ["symbol", "seq"]
    a = {tuple(r[k] for k in key): r["close_median_5"] for r in ex.collect()}
    b = {tuple(r[k] for k in key): r["close_median_5"] for r in ap.collect()}
    assert set(a) == set(b)
    for k in a:
        if a[k] is None:
            assert b[k] is None
        else:
            # frames are <= 5 rows: the digest stores them losslessly, but
            # returns a data point where exact interpolates between two
            assert abs(a[k] - b[k]) <= 2.0


def test_profile_numeric_auto_paths(numbers):
    cols = ("small", "val")
    ex = {
        r["column"]: r
        for r in approx.profile_numeric_auto(
            numbers, cols, min_rows=10**9
        ).collect()
    }
    ap = {
        r["column"]: r
        for r in approx.profile_numeric_auto(
            numbers, cols, min_rows=0
        ).collect()
    }
    assert set(ex) == set(ap) == set(cols)
    for c in cols:
        assert ex[c]["n_rows"] == ap[c]["n_rows"] == 2000
        assert ex[c]["n_null"] == ap[c]["n_null"] == 0
        assert ex[c]["min_v"] == ap[c]["min_v"]
        assert ex[c]["max_v"] == ap[c]["max_v"]
        assert ex[c]["avg_v"] == ap[c]["avg_v"]
        d_ex, d_ap = ex[c]["n_distinct"], ap[c]["n_distinct"]
        assert abs(d_ap - d_ex) <= max(2, int(d_ex * 0.05))


def test_kmv_cutoff_deterministic_across_partitionings(numbers):
    one = approx.kmv_percentile_cutoff(
        numbers.repartition(1), "val", "rid", q=0.2, k=64
    ).first()
    many = approx.kmv_percentile_cutoff(
        numbers.orderBy(F.desc("val")).repartition(13), "val", "rid", q=0.2, k=64
    ).first()
    assert one["_n_sample"] == many["_n_sample"] == 64
    assert one["_cut"] == many["_cut"]


def test_quality_quantile_kmv_path_subset_of_exact_schema(spark):
    from indicators_spark.functions import text

    docs = spark.createDataFrame(
        [(i, f"doc {i} " + " ".join(f"w{j}" for j in range(i % 30 + 5)))
         for i in range(200)],
        "doc_id long, text string",
    )
    exact = text.filter_by_quality_quantile(docs, q=0.3)
    sketch = text.filter_by_quality_quantile(
        docs, q=0.3, min_rows=0, estimator="kmv", k=64
    )
    assert exact.columns == sketch.columns
    n_ex, n_sk = exact.count(), sketch.count()
    # a 64-of-200 uniform sample cutoff keeps roughly the same survivor
    # share as the exact cutoff
    assert abs(n_sk - n_ex) <= 0.25 * 200
