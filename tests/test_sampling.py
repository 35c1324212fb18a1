"""Hand-fixture tests for deterministic sampling / mixture / packing
(functions/sampling.py) and text normalization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from indicators_spark.functions import sampling, text


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "k")


def test_hash_sample_rate_and_determinism(spark, keyed):
    a = sampling.hash_sample(keyed, "k", 0.2)
    b = sampling.hash_sample(keyed.repartition(7), "k", 0.2)
    ids_a = {r["k"] for r in a.collect()}
    ids_b = {r["k"] for r in b.collect()}
    assert ids_a == ids_b  # partitioning-independent
    assert 0.15 < len(ids_a) / 2000 < 0.25  # ~rate
    # nested rates: a 10% sample is a subset of the 20% sample (same seed)
    ids_c = {r["k"] for r in sampling.hash_sample(keyed, "k", 0.1).collect()}
    assert ids_c <= ids_a


def test_hash_sample_seed_changes_set(spark, keyed):
    a = {r["k"] for r in sampling.hash_sample(keyed, "k", 0.2).collect()}
    b = {
        r["k"]
        for r in sampling.hash_sample(keyed, "k", 0.2, seed="other").collect()
    }
    assert a != b


def test_stratified_rates(spark):
    rows = [(i, "hi" if i % 2 == 0 else "lo") for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, s string")
    out = sampling.stratified_sample(
        df, "k", "s", {"hi": 0.5, "lo": 0.05}
    ).groupBy("s").count()
    counts = {r["s"]: r["count"] for r in out.collect()}
    assert 0.4 < counts["hi"] / 1000 < 0.6
    assert counts["lo"] / 1000 < 0.12
    # stratum absent from rates with default_rate=0 is dropped entirely
    out2 = sampling.stratified_sample(df, "k", "s", {"hi": 0.5})
    assert out2.filter(F.col("s") == "lo").count() == 0
    assert "_thresh" not in out2.columns


def test_pack_sequences_greedy_bins(spark):
    rows = [
        ("a", 1, 300),
        ("a", 2, 300),  # cum_before=300 → bin 0 (overflows budget)
        ("a", 3, 100),  # cum_before=600 → bin 1
        ("a", 4, 600),  # cum_before=700 → bin 1 (oversize doc, not split)
        ("a", 5, 10),   # cum_before=1300 → bin 2
        ("b", 1, 10),   # independent shard → bin 0
    ]
    df = spark.createDataFrame(rows, "shard string, seq long, tokens int")
    packed = sampling.pack_sequences(
        df, shard="shard", order="seq", tokens="tokens", capacity=512
    )
    got = {
        (r["shard"], r["seq"]): r["pack_id"] for r in packed.collect()
    }
    assert got == {
        ("a", 1): 0,
        ("a", 2): 0,
        ("a", 3): 1,
        ("a", 4): 1,
        ("a", 5): 2,
        ("b", 1): 0,
    }


def test_normalize(spark):
    df = spark.createDataFrame(
        [(1, "  Hello,   WORLD!! (42)  ")], "doc_id long, text string"
    )
    out = text.with_normalized(df).collect()[0]["norm_text"]
    assert out == "hello world 42"


def test_kmeans_deterministic_and_sane(spark):
    from indicators_spark.functions.similarity import kmeans_lloyd

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = kmeans_lloyd(emb, k=4, iters=2)
    got = {r["vec_id"]: r["cluster"] for r in a.collect()}
    assert set(got.values()) <= set(range(4))
    assert len(got) == emb.count()
    # partitioning-independent
    b = kmeans_lloyd(emb.repartition(13), k=4, iters=2)
    got_b = {r["vec_id"]: r["cluster"] for r in b.collect()}
    assert got == got_b
    # iterating changes assignments vs the 0-iteration (init-only) split
    z = kmeans_lloyd(emb, k=4, iters=0)
    got_z = {r["vec_id"]: r["cluster"] for r in z.collect()}
    assert got != got_z


def test_null_keys_consistent_across_samplers(spark):
    """NULL sampling keys hash through one sentinel everywhere: rate=1.0
    keeps them, and the same row lands in exactly one split — previously
    hash_sample dropped the row while train_val_test_split kept it."""
    from indicators_spark.functions.sampling import (
        hash_sample,
        train_val_test_split,
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(None, 1.0), ("a", 2.0), ("b", 3.0)], "k string, w double"
    )
    assert hash_sample(df, "k", rate=1.0).count() == 3
    splits = {r["k"]: r["split"] for r in train_val_test_split(df, "k").collect()}
    assert set(splits) == {None, "a", "b"}
    assert weighted_sample(df, "k", "w", k=3).count() == 3


def test_weighted_sample_u_resolution(spark):
    """A-ES scores must not collapse into 10k tie groups: with equal
    weights the scores should be (essentially) all-distinct."""
    from indicators_spark.functions.sampling import weighted_sample

    df = spark.range(2000).select(
        F.col("id").cast("string").alias("k"), F.lit(1.0).alias("w")
    )
    out = weighted_sample(df, "k", "w", k=2000)
    scores = [r["aes_score"] for r in out.collect()]
    assert len(set(scores)) == len(scores)


def test_cap_per_key_bounds_and_determinism(spark):
    """cap_per_key keeps at most k rows per group, keeps small groups
    whole, and survives repartitioning bit-for-bit (content-hash
    selection, no partition luck)."""
    from pyspark.sql import functions as F

    from indicators_spark.functions.sampling import cap_per_key

    rows = [(i, "big" if i < 95 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_key(df, group="source", key="doc_id", k=10)
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert counts == {"big": 10, "small": 5}  # small group under cap: intact

    a = {tuple(r) for r in out.collect()}
    b = {
        tuple(r)
        for r in cap_per_key(
            df.repartition(13), group="source", key="doc_id", k=10
        ).collect()
    }
    assert a == b


# --------------------------------------------------------------------- #
# DSIR importance resampling
# --------------------------------------------------------------------- #


def _dsir_corpus(spark):
    """Two-vocabulary corpus: 'good' docs draw tokens the target uses,
    'junk' docs draw from a disjoint vocabulary."""
    rows = []
    for i in range(40):
        rows.append((i, " ".join(f"t{j % 17}" for j in range(i % 7, i % 7 + 20)), "good"))
    for i in range(40, 80):
        rows.append((i, " ".join(f"z{j % 23}" for j in range(i % 5, i % 5 + 20)), "junk"))
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_dsir_log_weights_separate_target_like_docs(spark):
    docs = _dsir_corpus(spark)
    target = docs.filter(F.col("kind") == "good").limit(20)
    lw = sampling.dsir_log_weights(docs, target, buckets=256)
    got = {r["doc_id"]: r["dsir_logw"] for r in lw.collect()}
    good = [got[i] for i in range(40)]
    junk = [got[i] for i in range(40, 80)]
    # every target-vocabulary doc outweighs every junk doc
    assert min(good) > max(junk)


def test_dsir_sample_prefers_target_and_is_stable(spark):
    docs = _dsir_corpus(spark)
    target = docs.filter(F.col("kind") == "good").limit(20)
    pick = sampling.dsir_sample(docs, target, k=30, buckets=256)
    ids = {r["doc_id"] for r in pick.collect()}
    assert len(ids) == 30
    # weights dominate the Gumbel noise for this corpus: mostly good docs
    assert sum(1 for i in ids if i < 40) >= 25
    ids2 = {
        r["doc_id"]
        for r in sampling.dsir_sample(
            docs.repartition(11), target.repartition(3), k=30, buckets=256
        ).collect()
    }
    assert ids == ids2  # partitioning-independent selection


def test_dsir_null_text_docs_drop_out(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, None)], "doc_id long, text string"
    )
    target = docs.filter(F.col("doc_id") == 1)
    got = {r["doc_id"] for r in sampling.dsir_log_weights(docs, target).collect()}
    assert got == {1}


# --------------------------------------------------------------------- #
# Deterministic epoch shuffle
# --------------------------------------------------------------------- #


def test_epoch_shuffle_is_permutation_and_deterministic(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(300)], "doc_id long"
    )
    out = sampling.epoch_shuffle(df, key="doc_id", epoch=1)
    pos = {r["doc_id"]: r["epoch_pos"] for r in out.collect()}
    assert sorted(pos.values()) == list(range(1, 301))  # contiguous permutation
    pos2 = {
        r["doc_id"]: r["epoch_pos"]
        for r in sampling.epoch_shuffle(
            df.repartition(17), key="doc_id", epoch=1
        ).collect()
    }
    assert pos == pos2  # partitioning-independent


def test_epoch_shuffle_order_key_replays_in_python(spark):
    """Bit-equality pin for the r9 `_order_key` consolidation: the epoch
    position must equal the rank of ``hashlib.md5(f'ep{e}|{id}')`` — the
    exact contract the pre-r9 inline expression implemented and every
    SQL oracle replays.  A helper refactor that changed the seed-tag
    framing or prefix width would flip this before it flipped the
    driver row."""
    import hashlib

    df = spark.createDataFrame([(i,) for i in range(64)], "doc_id long")
    got = {
        r["doc_id"]: r["epoch_pos"]
        for r in sampling.epoch_shuffle(df, "doc_id", 3).collect()
    }
    order = sorted(
        range(64), key=lambda i: hashlib.md5(f"ep3|{i}".encode()).hexdigest()
    )
    want = {i: pos + 1 for pos, i in enumerate(order)}
    assert got == want


def test_epoch_shuffle_epochs_differ_and_look_shuffled(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    p1 = {r["doc_id"]: r["epoch_pos"] for r in sampling.epoch_shuffle(df, "doc_id", 1).collect()}
    p2 = {r["doc_id"]: r["epoch_pos"] for r in sampling.epoch_shuffle(df, "doc_id", 2).collect()}
    moved = sum(1 for i in p1 if p1[i] != p2[i])
    assert moved > 270  # epochs are (near-)disjoint permutations
    # not the identity / sorted order either
    same_as_id = sum(1 for i in p1 if p1[i] == i + 1)
    assert same_as_id < 30


def test_match_distribution_sample_shapes_to_reference(spark):
    """df: 90% short / 10% long values; ref: 50/50.  The matched sample
    must keep ALL long rows (the scarce bucket pins rate 1) and thin
    the short bucket to parity, and the whole selection must be
    deterministic and partitioning-independent."""
    rows = [(i, 10.0 if i % 10 else 1000.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, x double")
    ref = spark.createDataFrame(
        [(10_000 + i, 10.0 if i % 2 else 1000.0) for i in range(200)],
        "doc_id long, x double",
    )
    kept = sampling.match_distribution_sample(
        df, ref, value_col="x", key_col="doc_id", k=2
    )
    got = {(r["doc_id"], r["bucket"]) for r in kept.collect()}
    longs = {d for d, v in rows if v == 1000.0}
    kept_long = {d for d, b in got if d in longs}
    kept_short = {d for d, b in got if d not in longs}
    assert kept_long == longs                       # scarce bucket: rate 1
    # short bucket thinned to ~ref parity: expect ~len(longs) keeps
    assert abs(len(kept_short) - len(longs)) / len(longs) < 0.25
    got2 = {
        (r["doc_id"], r["bucket"])
        for r in sampling.match_distribution_sample(
            df.repartition(13), ref, value_col="x", key_col="doc_id", k=2
        ).collect()
    }
    assert got == got2


def test_match_distribution_sample_edge_buckets(spark):
    """ref mass where df has none stays unmatched (no crash, other
    buckets still fill); df mass where ref has none gets rate 0; k < 2
    raises; NULL values drop out."""
    import pytest

    df = spark.createDataFrame(
        [(i, 5.0) for i in range(100)] + [(200, None)],
        "doc_id long, x double",
    )
    ref = spark.createDataFrame(
        [(0, 5.0), (1, 5.0), (2, 999.0), (3, 999.0)], "doc_id long, x double"
    )
    kept = sampling.match_distribution_sample(
        df, ref, "x", "doc_id", k=2
    ).collect()
    assert len(kept) == 100  # the one populated bucket keeps all
    # ref mass entirely at 5.0 → the >edge bucket has ZERO ref mass, so
    # df's 999s get rate 0 while the ref-covered bucket keeps everything
    ref2 = spark.createDataFrame(
        [(i, 5.0) for i in range(4)], "doc_id long, x double"
    )
    df2 = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 1, 1, 999, 999])],
        "doc_id long, x double",
    )
    kept2 = sampling.match_distribution_sample(df2, ref2, "x", "doc_id", k=2)
    assert {r["x"] for r in kept2.collect()} == {1.0}  # ref-empty: rate 0
    with pytest.raises(ValueError, match="k must be"):
        sampling.match_distribution_sample(df, ref, "x", "doc_id", k=1)


# --------------------------------------------------------------------- #
# Gopher hard rules
# --------------------------------------------------------------------- #


def test_gopher_rules_flags_and_null_text(spark):
    good = " ".join(
        ("the quick brown fox jumps over a lazy dog and runs to it in style "
         * 5).split()
    )
    rows = [
        (1, good),                                   # passes everything
        (2, "short text"),                           # fails word count
        (3, None),                                   # NULL -> all false
        (4, "### " * 30 + good),                     # fails symbol ratio
        (5, "\n".join("- bullet line here" for _ in range(5))),  # bullets
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in text.gopher_rules(df).collect()}
    assert got[1]["keep"] is True
    assert got[2]["ok_word_count"] is False and got[2]["keep"] is False
    assert got[3]["keep"] is False and got[3]["ok_stopwords"] is False
    assert got[4]["ok_symbol_ratio"] is False
    assert got[5]["ok_bullet_lines"] is False


def test_gopher_rules_zero_shuffle_plan(spark):
    from indicators_spark.plans import exchange_count, plan_string

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = plan_string(text.gopher_rules(df))
    assert exchange_count(plan) == 0, plan


def test_robust_scale_nan_and_inf_rows_match_kernel_counts(spark):
    """The shared bounds pass must count exactly the rows the selection
    kernel's keep filter sees (ADVICE r13): a NaN value row used to
    inflate the prior n and shift the rank target ([1,2,3,4,NaN] read
    median 3.0 instead of 2.0); ±inf bounds used to poison the derived
    MAD interval.  Both now match a kernel-only (prior-free) replay."""
    import math

    rows = [
        ("a", 0, 1.0),
        ("a", 1, 2.0),
        ("a", 2, 3.0),
        ("a", 3, 4.0),
        ("a", 4, float("nan")),
        ("b", 10, 1.0),
        ("b", 11, 2.0),
        ("b", 12, float("inf")),
    ]
    df = spark.createDataFrame(rows, "g string, k long, x double")
    got = {
        r["k"]: (r["_med"], r["_mad"], r["_rz"])
        for r in sampling.robust_scale_by_group(df, "x", "g", "k").collect()
    }
    # group a: kernel sees [1,2,3,4] -> lower median 2.0; |x-2| over the
    # same rows -> [1,0,1,2] -> lower MAD 1.0
    assert got[0][0] == 2.0 and got[0][1] == 1.0, got[0]
    assert math.isclose(got[0][2], (1.0 - 2.0) / (sampling.MAD_SIGMA * 1.0))
    assert math.isnan(got[4][2])  # the NaN row scores NaN, others exact
    # group b: inf is a real value (kept by the kernel): med=2.0,
    # ads=[1,0,inf] -> lower MAD 1.0; the inf row's score is +inf
    assert got[10][0] == 2.0 and got[10][1] == 1.0, got[10]
    assert got[12][2] == float("inf")
