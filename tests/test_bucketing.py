"""Bucketed-table co-located join: bucketBy + saveAsTable lets a later join
on the bucket key skip the shuffle entirely — the 100 TB co-location story,
pinned at plan level."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from indicators_spark.plans import exchange_count, plan_string
from indicators_spark.sources.prices import load_table

from conftest import SF_SMOKE


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    # warehouse dir is a static conf; the default ./spark-warehouse is
    # gitignored and tables are dropped below.
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_b")
    )
    (
        orders.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("ord_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
    agg = joined.groupBy("l_returnflag").agg(F.sum("o_totalprice").alias("s"))
    plan = plan_string(joined)
    # co-located join: zero shuffle exchanges before the join itself
    assert exchange_count(plan) == 0, plan
    # and the result is correct
    n = joined.count()
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    expected = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).count()
    assert n == expected
    assert agg.count() > 0
