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


def test_q21_bucketed_no_fact_exchange(spark):
    """The bucketed q21 variant must plan ZERO shuffle exchanges on the
    fact side — the only shuffle is the final s_name aggregate.  Broadcast
    is disabled so co-location (not broadcast) is what's proven; the fact
    joins at 100 TB couldn't broadcast anyway."""
    from indicators_spark.queries import QUERIES

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        df = QUERIES["tpch_q21_bucketed"].spark(spark, SF_SMOKE)
        plan = plan_string(df)
        shuffles = [
            ln
            for ln in plan.splitlines()
            if "Exchange" in ln
            and "BroadcastExchange" not in ln
            and "ReusedExchange" not in ln
        ]
        # no exchange may partition on any orderkey-derived column
        assert not any("orderkey" in ln or "_ok" in ln for ln in shuffles), plan
        # and overall: at most the s_name agg shuffle survives
        assert len(shuffles) <= 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q21_bucketed_matches_plain(spark):
    from indicators_spark.queries import QUERIES

    a = QUERIES["tpch_q21_bucketed"].spark(spark, SF_SMOKE).toPandas()
    b = QUERIES["tpch_q21_lone_late"].spark(spark, SF_SMOKE).toPandas()
    a = a.sort_values("s_name").reset_index(drop=True)
    b = b.sort_values("s_name").reset_index(drop=True)
    assert a.equals(b)
