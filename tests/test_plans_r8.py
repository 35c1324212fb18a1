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
