"""Plan checks for the round-8 sketch audits: no cartesian products,
the HLL audit keeps ONE grouped aggregate over one exchange (the sketch
rides the exact distinct's plan, it doesn't add a scan), and the
t-digest audit is a single-pass global aggregate (all 4·|qs| aggregates
in one 1-row merge — no per-quantile scans)."""

from __future__ import annotations

import pytest

from indicators_spark.plans import plan_string
from indicators_spark.queries import QUERIES

SF_SMOKE = "/root/testdata/sf0.001"

R8 = ["stats_hll_audit", "stats_tdigest_audit"]


@pytest.mark.parametrize("name", R8)
def test_r8_no_cartesian_product(spark, name):
    plan = plan_string(QUERIES[name].spark(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, (name, plan)


def test_hll_audit_single_scan(spark):
    plan = plan_string(QUERIES["stats_hll_audit"].spark(spark, SF_SMOKE))
    # one parquet scan: the exact distinct's expand and the HLL share it
    assert plan.count("Scan parquet") == 1, plan


def test_tdigest_audit_single_scan(spark):
    plan = plan_string(QUERIES["stats_tdigest_audit"].spark(spark, SF_SMOKE))
    assert plan.count("Scan parquet") == 1, plan


@pytest.mark.parametrize("name", R8)
def test_audit_invariant_under_partitioning(spark, name):
    """The audits' hash-compared columns (exact values at 4dp, band
    verdicts) must not depend on partial-agg merge order or AQE: the
    sketches themselves may vary by an ulp across partitionings, but the
    generous bands absorb that by construction — pin it."""

    def snap():
        return sorted(
            tuple(r) for r in QUERIES[name].spark(spark, SF_SMOKE).collect()
        )

    base = snap()
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        assert snap() == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
