"""Partition-invariance pins for the round-7b queries whose results
flow through driver-state loops, quantized sums, or grouped Arrow
kernels: the driver verifies with ITS OWN session config, so any
dependence on spark.sql.shuffle.partitions / AQE would surface as a
hash mismatch only in production.  (All 10 r7b risk queries were
checked invariant in-session; this pins the 5 most state-dependent.)"""

from __future__ import annotations

import pytest

from indicators_spark.queries import QUERIES

SF_SMOKE = "/root/testdata/sf0.001"

NAMES = [
    "mixture_doremi_weights",      # driver multiplicative-weights loop
    "classifier_quality_logreg",   # driver GD loop over collected grads
    "mixture_token_budget",        # first-failure scalar over window sums
    "similarity_mmr_topk",         # grouped applyInPandas greedy
    "filter_ssl_prototypes",       # collected centroids + quantile cutoffs
]


@pytest.mark.parametrize("name", NAMES)
def test_result_invariant_under_partitioning(spark, name):
    def snap():
        return sorted(tuple(r) for r in QUERIES[name].spark(spark, SF_SMOKE).collect())

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
