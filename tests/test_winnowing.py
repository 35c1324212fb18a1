"""Tests for winnowing fingerprints (Schleimer et al. 2003)."""

from __future__ import annotations

from indicators_spark.functions.dedup import winnow_fingerprints, winnow_pairs


def _winnow_reference(tokens: list[str], k: int, w: int) -> set[tuple[int, int]]:
    """Literal reference implementation: hash k-grams, slide w-windows,
    select the rightmost minimum per window."""
    import hashlib

    def h31(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 2147483647

    grams = [
        (i + 1, h31(" ".join(tokens[i : i + k])))
        for i in range(len(tokens) - k + 1)
    ]
    if not grams:
        return set()
    sel = set()
    if len(grams) < w:
        windows = [grams]
    else:
        windows = [grams[i : i + w] for i in range(len(grams) - w + 1)]
    for win in windows:
        m = min(g for _, g in win)
        pos = max(p for p, g in win if g == m)  # rightmost tie rule
        sel.add((pos, m))
    return sel


def test_winnow_matches_reference_implementation(spark):
    texts = [
        "a b c d e f g h i j k l m n",
        "z y x w v u t s r q p o",
        "a b c d",          # exactly one gram (G=1 < w): its min selected
        "a b c",            # shorter than k: no grams, no fingerprints
        None,               # NULL text: excluded
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, k=4, w=5).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.gh))
    for i, t in enumerate(texts):
        want = _winnow_reference(t.split(" "), 4, 5) if t else set()
        assert got.get(i, set()) == want, (i, got.get(i), want)


def test_winnow_guarantee_shared_run_detected(spark):
    # the winnowing guarantee: any shared run of >= w + k - 1 words
    # contributes at least one shared fingerprint
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"  # 8 >= 5 + 4 - 1
    df = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma delta"),
            (2, shared + " epsilon zeta eta theta"),
            (3, "totally different words here now ok fine yes"),
        ],
        "doc_id long, text string",
    )
    # max_df_frac off: with 3 docs the 0.5 default would prune the very
    # fingerprint the two sharers have in common (df=2 > 1.5)
    pairs = {
        (r.ia, r.ib): r.n_shared
        for r in winnow_pairs(
            df, k=4, w=5, min_shared=1, max_df_frac=1.1
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert not any(3 in p for p in pairs)


def test_winnow_pairs_max_df_prunes_boilerplate(spark):
    # a fingerprint present in EVERY doc is pruned before the self-join
    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    rows = [(i, boiler) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert (
        winnow_pairs(df, k=4, w=5, min_shared=1, max_df_frac=0.5).count()
        == 0
    )
    # without the prune the same corpus is all-pairs
    assert (
        winnow_pairs(df, k=4, w=5, min_shared=1, max_df_frac=1.1).count()
        == 15
    )


# --------------------------------------------------------------------- #
# incremental MinHash dedup
# --------------------------------------------------------------------- #


def test_minhash_incremental_contract(spark):
    from indicators_spark.functions.dedup import (
        batch_band_keys,
        minhash_dedup_against_corpus,
    )

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    store_docs = spark.createDataFrame(
        [(1, base)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, base),                 # near-identical to history → dropped
            (11, "x1 x2 x3 x4 x5 x6"),  # fresh → kept
            (12, "x1 x2 x3 x4 x5 x6"),  # batch-internal copy of 11 → dropped
            (13, "solo"),               # <2 words: no shingles → kept
        ],
        "doc_id long, text string",
    )
    store = batch_band_keys(store_docs)
    got = {
        r.doc_id: (r.n_store_bands, r.dup_in_batch, r.keep)
        for r in minhash_dedup_against_corpus(batch, store).collect()
    }
    assert got[10][0] >= 1 and got[10][2] is False
    assert got[11] == (0, False, True)
    assert got[12][1] is True and got[12][2] is False
    assert got[13] == (0, False, True)
    # no store: only the batch-internal rule applies
    got2 = {
        r.doc_id: r.keep
        for r in minhash_dedup_against_corpus(batch, None).collect()
    }
    assert got2[10] is True and got2[12] is False


# --------------------------------------------------------------------- #
# content-defined chunking
# --------------------------------------------------------------------- #


def test_cdc_shift_robustness(spark):
    """The CDC property fixed-size chunking lacks: prepending one word
    leaves every chunk after the first boundary identical."""
    from indicators_spark.functions.dedup import cdc_chunks

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    df = spark.createDataFrame(
        [(1, base.strip()), (2, ("prefixword " + base).strip())],
        "doc_id long, text string",
    )
    chunks = {1: set(), 2: set()}
    for r in cdc_chunks(df).collect():
        chunks[r.doc_id].add(r.chunk_text)
    shared = chunks[1] & chunks[2]
    # everything beyond the perturbed head chunk re-aligns
    assert len(shared) >= max(len(chunks[1]), len(chunks[2])) - 2, chunks


def test_cdc_dedup_stats_contract(spark):
    from indicators_spark.functions.dedup import cdc_dedup_stats

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z q w")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in cdc_dedup_stats(df).collect()}
    # docs 1/2 identical → every chunk duplicated; doc 3 unique
    assert got[1].n_dup_chunks == got[1].n_chunks
    assert got[1].dup_words == got[1].total_words == 5
    assert got[3].n_dup_chunks == 0 and got[3].dup_words == 0
    # word mass is conserved into chunks
    assert got[3].total_words == 5


def test_lsh_keep_best_prefers_quality_over_min_id(spark):
    from pyspark.sql import functions as F

    from indicators_spark.functions.dedup import lsh_dedup_keep_best

    # docs 1 and 2 are near-identical; doc 2 has higher quality, so it
    # (not the min id) is canonical.  doc 3 is a singleton.
    t = "a b c d e f g h i j k l"
    docs = spark.createDataFrame(
        [(1, t), (2, t + " m"), (3, "totally different words entirely here")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, 0.4), (2, 0.9), (3, 0.5)], "doc_id long, quality double"
    )
    got = {r.doc_id: r for r in lsh_dedup_keep_best(docs, q).collect()}
    assert got[1].component == got[2].component
    assert got[2].is_canonical is True and got[1].is_canonical is False
    assert got[3].is_canonical is True and got[3].cluster_size == 1
    # quality tie → lowest id wins
    q2 = spark.createDataFrame(
        [(1, 0.7), (2, 0.7), (3, 0.5)], "doc_id long, quality double"
    )
    got2 = {r.doc_id: r for r in lsh_dedup_keep_best(docs, q2).collect()}
    assert got2[1].is_canonical is True and got2[2].is_canonical is False


def test_curriculum_tiers(spark):
    from indicators_spark.queries import QUERIES

    rows = QUERIES["sample_quality_curriculum"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    tiers = {}
    for r in rows:
        tiers.setdefault(r.tier, []).append(r)
        assert 0.0 < r.order_key < 1.0
    assert set(tiers) == {1, 2, 3}
    # tier 1 holds the highest scores
    assert min(r.qsc for r in tiers[1]) >= max(
        r.qsc for r in tiers[2] if r.qsc is not None
    )


def test_leakage_safe_split_keeps_clusters_together(spark):
    from indicators_spark.queries import QUERIES

    rows = QUERIES["split_leakage_safe"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, set()).add(r.split)
    # the invariant the per-doc hash split cannot give: one split per
    # near-dup cluster
    assert all(len(s) == 1 for s in by_comp.values())
    splits = {r.split for r in rows}
    assert "train" in splits and len(splits) >= 2


def test_winnow_decode_truncates_on_both_engines():
    """Regression pin for the decode-rounding bug: DuckDB CAST(x/y AS
    BIGINT) ROUNDS, so the oracle must use integer division; Spark's
    floor() truncates.  A packed key whose position part is in the upper
    half (pos <= 2^19) must decode to the SAME gh on both engines."""
    import duckdb

    from indicators_spark.functions.dedup import WINNOW_POS_SPACE as PS

    gh, pos = 5, 3  # position part PS - 3 is in the rounding-up half
    m = gh * PS + (PS - pos)
    assert int(duckdb.sql(f"SELECT {m} // {PS}").fetchone()[0]) == gh
    # the buggy form rounds up — keep this assertion as documentation
    assert int(duckdb.sql(f"SELECT CAST({m} / {PS} AS BIGINT)").fetchone()[0]) == gh + 1
    assert m // PS == gh  # python/Spark floor semantics
