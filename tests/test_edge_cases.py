"""Edge cases: empty frames, single rows, all-null columns, Column
selectors as the `columns` argument (the reference accepts pl.Expr)."""

from __future__ import annotations

from pyspark.sql import functions as F

from indicators_spark import Indicators


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, timestamp timestamp, seq long, high double, "
        "low double, close double, volume double"
    )


def test_empty_frame(spark):
    df = _frame(spark, [])
    out = (
        Indicators(df, order_by=("timestamp", "seq"))
        .sma(["close"], 5)
        .rsi(["close"], 5)
        .atr(5)
        .collect()
    )
    assert out.count() == 0
    assert "close_sma_5" in out.columns


def test_single_row(spark):
    import datetime as dt

    df = _frame(spark, [("A", dt.datetime(2024, 1, 1), 0, 10.2, 9.8, 10.0, 5.0)])
    out = (
        Indicators(df, order_by=("timestamp", "seq"))
        .sma(["close"], 5)
        .vwap()
        .force_index()
        .collect()
        .collect()
    )
    assert len(out) == 1
    r = out[0]
    assert r["close_sma_5"] is None  # warm-up
    assert r["vwap"] == (10.2 + 9.8 + 10.0) / 3  # cumsum of one row
    assert r["force_index"] is None  # no predecessor


def test_all_null_column(spark):
    import datetime as dt

    rows = [
        ("A", dt.datetime(2024, 1, 1, 0, i), i, None, None, None, 1.0)
        for i in range(5)
    ]
    df = _frame(spark, rows)
    out = Indicators(df, order_by=("timestamp", "seq")).sma(["close"], 2).collect()
    assert all(r["close_sma_2"] is None for r in out.collect())


def test_column_selector_input(spark, ohlcv):
    """The reference accepts pl.Expr selectors; we accept Column lists."""
    out = Indicators(ohlcv).sma([F.col("close")], 3).collect()
    assert "close_sma_3" in out.columns
    out2 = Indicators(ohlcv).sma("close", 3).collect()  # bare string too
    assert "close_sma_3" in out2.columns


def test_ewm_empty_and_single_group(spark):
    import datetime as dt

    df = _frame(spark, [("A", dt.datetime(2024, 1, 1), 0, 10.2, 9.8, 10.0, 5.0)])
    out = Indicators(df, order_by=("timestamp", "seq")).ema(["close"], 5).collect()
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["close_ema_5"] == 10.0
    empty = _frame(spark, [])
    out2 = Indicators(empty, order_by=("timestamp", "seq")).ema(["close"], 5).collect()
    assert out2.count() == 0


def test_corpus_ops_survive_degenerate_docs(spark):
    """Every corpus operator must handle empty/1-word/duplicate/unicode
    docs without raising, with sane row semantics."""
    from indicators_spark.functions import dedup, similarity, text

    docs = spark.createDataFrame(
        [
            (0, ""),
            (1, "one"),
            (2, "dup dup dup dup"),
            (3, "dup dup dup dup"),
            (4, "ünïcode tøkens here ünïcode tøkens here"),
        ],
        "doc_id long, text string",
    )
    assert text.with_token_stats(docs).count() == 5
    assert text.with_quality_score(docs).count() == 5
    assert text.with_lang_id(docs).count() == 5
    assert text.with_fingerprint(docs).count() == 5
    assert text.with_bpe_token_count(docs).count() == 5
    assert text.with_compression_ratio(docs).count() == 5
    # chunking: every doc yields >= 1 chunk (empty text -> one '' chunk)
    assert text.chunk_documents(docs, chunk=4, overlap=1).count() >= 5
    # repetition drops docs with < 2 words (0 and 1)
    rep = {r["doc_id"] for r in text.repetition_signals(docs).collect()}
    assert rep == {2, 3, 4}
    # exact dedup keeps min id of the duplicate pair
    kept = {r["doc_id"] for r in dedup.exact_dedup(docs).collect()}
    assert 2 in kept and 3 not in kept and kept >= {0, 1, 4}
    # jaccard with prune enabled on a 5-doc corpus does not raise
    assert dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_df_frac=0.9).count() >= 1
    # passage dup with n larger than every doc -> empty, not an error
    assert text.duplicate_passage_fraction(docs, n=50).count() == 0
    # decontamination flags nothing when bench shares no 3-gram
    bench = spark.createDataFrame([(99, "zz yy xx ww")], "doc_id long, text string")
    flags = dict(
        (r["doc_id"], r["contaminated"])
        for r in text.decontaminate_flags(docs, bench, n=3).collect()
    )
    assert set(flags) == {0, 1, 2, 3, 4} and not any(flags.values())


def test_pagerank_empty_edges(spark):
    from indicators_spark.functions.graph import pagerank

    edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(edges, iters=2).count() == 0


def test_covariance_empty_input(spark):
    from indicators_spark.functions.similarity import covariance_matrix

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert covariance_matrix(df, dim=4).count() == 0


def test_temperature_mixture_empty(spark):
    from indicators_spark.functions.sampling import temperature_mixture

    df = spark.createDataFrame([], "doc_id long, source string")
    assert temperature_mixture(df).count() == 0


def test_bpe_pair_counts_single_char_words_only(spark):
    from indicators_spark.functions.text import bpe_pair_counts

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    assert bpe_pair_counts(df).count() == 0


def test_minhash_pipeline_tolerates_short_docs(spark):
    """Docs with <2 words have no shingles and must DROP OUT (the
    documented semantics), not crash the ANSI element_at."""
    from indicators_spark.functions.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "a b c a b"), (4, "a b c a b")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id for r in minhash_signatures(df).collect()}
    assert sigs == {3, 4}
    pairs = minhash_lsh_candidates(df).collect()
    assert {(r.ia, r.ib) for r in pairs} == {(3, 4)}


def test_cosine_ops_tolerate_zero_norm_vectors(spark):
    """All-zero embeddings get NULL cosine (dropped by filters/rank),
    never an ANSI DIVIDE_BY_ZERO."""
    from pyspark.sql import functions as F

    from indicators_spark.functions.similarity import (
        cosine_pairs,
        knn_bruteforce,
    )

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.ia, r.ib) for r in cosine_pairs(df, 0.5).collect()}
    assert got == {(0, 1)}
    knn = knn_bruteforce(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    assert [r.nid for r in sorted(knn, key=lambda r: r.rank)][0] == 1


def test_lsh_bands_must_divide_signature(spark):
    import pytest as _pytest

    from indicators_spark.functions.dedup import minhash_lsh_candidates

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="divide"):
        minhash_lsh_candidates(df, bands=3)


def test_simhash_pairs_rejects_unsound_radius(spark):
    import pytest as _pytest

    from indicators_spark.functions.dedup import simhash_pairs

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(df, max_hamming=4)


def test_knn_ivf_requires_dense_centroid_ids(spark):
    import pytest as _pytest

    from indicators_spark.functions.similarity import knn_ivf

    df = spark.createDataFrame(
        [(1000, [1.0, 0.0]), (1001, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="centroid"):
        knn_ivf(df, df, n_centroids=4)


def test_tfidf_dense_degenerate_corpora(spark):
    """The dense-GEMM dispatch must survive the empty-matrix corners: a
    corpus whose every token has idf=0 (weight stream is empty) and a
    single-document corpus (no pairs)."""
    from indicators_spark.functions.similarity import tfidf_cosine_pairs

    same = spark.createDataFrame(
        [(i, "same") for i in range(4)], "doc_id long, text string"
    )
    assert tfidf_cosine_pairs(same, 0.1).collect() == []
    one = spark.createDataFrame([(0, "alpha beta")], "doc_id long, text string")
    assert tfidf_cosine_pairs(one, 0.1).collect() == []


def test_semantic_dedup_zero_norm_vector_kept(spark):
    """A zero vector's cosine is 0/0 → NaN, which never clears the
    threshold — it must be KEPT (the join form's nullif→NULL filter drop,
    replicated by the Arrow kernel), while genuine near-dups still drop."""
    from indicators_spark.functions.similarity import semantic_dedup
    from pyspark.sql import functions as F

    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup(vecs, threshold=0.9, n_centroids=1).collect()
    )
    assert kept == [0, 1]


def test_semantic_dedup_null_and_ragged_vectors_kept(spark):
    """NULL or wrong-length embedding vectors must pass through unchanged
    (NULL cosines never clear the threshold — the former JVM join form's
    contract) instead of crashing np.vstack in the Arrow kernels
    (ADVICE r4), and must not disturb dedup among well-formed rows."""
    from indicators_spark.functions.similarity import semantic_dedup

    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, None),
            (2, [1.0, 0.0]),  # dup of 0 → dropped
            (3, [1.0, 0.0, 5.0]),  # ragged: off-dim vs centroid → kept
            (4, None),
        ],
        "vec_id long, embedding array<double>",
    )
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup(vecs, threshold=0.9, n_centroids=1).collect()
    )
    assert kept == [0, 1, 3, 4]


def test_semantic_dedup_null_centroid_row_skipped(spark):
    """A NULL vector among the centroid-id rows must not crash centroid
    collection or poison assignment — it is skipped as a centroid (and
    kept as a row)."""
    from indicators_spark.functions.similarity import semantic_dedup

    vecs = spark.createDataFrame(
        [(0, None), (1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup(vecs, threshold=0.9, n_centroids=2).collect()
    )
    assert kept == [0, 1, 3]


def test_tfidf_string_ids_take_sparse_path(spark):
    """Non-integral doc ids can't ride the dense kernel's int64 id array —
    the dispatch must fall back to the sparse posting join and still
    produce correct pairs."""
    from indicators_spark.functions.similarity import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z"), ("c", "p q r")],
        "doc_id string, text string",
    )
    pairs = {
        (r["ia"], r["ib"]): r["cos"]
        for r in tfidf_cosine_pairs(docs, 0.5).collect()
    }
    assert set(pairs) == {("a", "b")}
    assert abs(pairs[("a", "b")] - 1.0) < 1e-12


def test_semantic_dedup_zero_norm_centroid_never_wins(spark):
    """A zero-norm CENTROID produces a NaN cosine column; the assignment
    must mask it to -inf so no vector routes to the degenerate cell
    (np.argmax would otherwise send EVERY vector there)."""
    from indicators_spark.functions.similarity import semantic_dedup

    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),   # centroid 0
            (1, [0.0, 0.0]),   # centroid 1: zero norm
            (2, [1.0, 0.001]), # near-dup of 0 -> must drop (same cell as 0)
            (3, [0.9, 0.0]),   # near-dup of 0 -> must drop
        ],
        "vec_id long, embedding array<double>",
    )
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup(vecs, threshold=0.99, n_centroids=2).collect()
    )
    # if the NaN column won, 2 and 3 would land in cell 1 away from 0 and
    # could never pair with it
    assert kept == [0, 1]


def test_tfidf_dense_threshold_zero_matches_sparse(spark):
    """At threshold <= 0 the dense grid contains structural zeros for
    disjoint-vocabulary pairs; those must NOT surface (the sparse posting
    join and the SQL oracle only ever emit shared-token pairs)."""
    from indicators_spark.functions.similarity import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [(0, "aa bb"), (1, "aa cc"), (2, "dd ee")],
        "doc_id long, text string",
    )
    dense = {
        (r["ia"], r["ib"]) for r in tfidf_cosine_pairs(docs, 0.0).collect()
    }
    sparse = {
        (r["ia"], r["ib"])
        for r in tfidf_cosine_pairs(docs, 0.0, dense_max_vocab=0).collect()
    }
    assert dense == sparse == {(0, 1)}  # doc 2 shares no token with anyone


def test_merge_upsert_null_keys_pass_through(spark):
    """MERGE ON t.key=u.key never matches NULL keys: NULL-key rows from
    BOTH sides must survive unchanged, not collapse to one survivor."""
    from indicators_spark.functions.merge import merge_upsert

    t = spark.createDataFrame([(None, 1, "t"), (1, 1, "t1")], "k int, v int, s string")
    u = spark.createDataFrame([(None, 2, "u"), (1, 2, "u1")], "k int, v int, s string")
    got = {(r["k"], r["v"], r["s"]) for r in merge_upsert(t, u, "k", "v").collect()}
    assert got == {(None, 1, "t"), (None, 2, "u"), (1, 2, "u1")}


def test_scd2_duplicate_order_rows_deterministic(spark):
    """Duplicate (key, order_col) log rows must version deterministically
    (windows tie-break on the tracked columns)."""
    from indicators_spark.functions.merge import scd2

    rows = [(1, 5, "b"), (1, 5, "a"), (1, 7, "c")]
    outs = []
    for _ in range(2):
        df = spark.createDataFrame(rows, "k int, ord int, val string").repartition(4)
        out = scd2(df, "k", "ord", ["val"])
        outs.append(sorted((r["ord"], r["val"], r["version"]) for r in out.collect()))
    assert outs[0] == outs[1]
    assert [v for _, v, _ in outs[0]] == ["a", "b", "c"]


def test_kmv_excludes_null_keys_and_plans_topk(spark):
    """NULL keys must not fill the sketch (md5(NULL) sorts first), and the
    ungrouped sketch must plan as TakeOrderedAndProject, not a
    single-partition window."""
    from indicators_spark.functions.sketches import kmv_bottom_k
    from indicators_spark.plans import plan_string

    df = spark.createDataFrame(
        [(None, 0.0)] * 10 + [(i, float(i)) for i in range(1, 6)],
        "k int, v double",
    )
    sk = kmv_bottom_k(df, key_col="k", value_col="v", k=4)
    rows = sk.collect()
    assert len(rows) == 4 and all(r["h"] is not None for r in rows)
    assert "TakeOrderedAndProject" in plan_string(sk)


def test_range_join_rejects_zero_bucket_width(spark):
    import pytest as _pytest

    from indicators_spark.functions.joins import range_join

    pts = spark.createDataFrame([(1, 5)], "id int, x int")
    iv = spark.createDataFrame([(0, 10)], "lo int, hi int")
    with _pytest.raises(ValueError, match="bucket_width"):
        range_join(pts, iv, "x", "lo", "hi", bucket_width=0)


def test_multimodal_null_payloads_survive(spark):
    """A NULL payload (undecodable asset) must not kill any kernel: meta
    ops emit NULL columns, exploding ops emit no rows for that asset."""
    from indicators_spark.functions import multimodal as M

    df = spark.createDataFrame(
        [(1, b"x" * 100), (2, None)], "doc_id long, payload binary"
    )
    meta = {r["doc_id"]: r["width"] for r in M.decode_image_meta(df).collect()}
    assert meta[1] is not None and meta[2] is None
    rs = {r["doc_id"]: r["out_bytes"] for r in M.resize_image(df).collect()}
    assert rs[1] is not None and rs[2] is None
    assert {r["doc_id"] for r in M.audio_frame_features(df).collect()} == {1}
    assert {r["doc_id"] for r in M.video_frame_sample(df).collect()} == {1}
    assert {r["doc_id"] for r in M.phash64(df).collect()} == {1}


def test_decode_image_meta_rejects_reapplication(spark):
    import pytest as _pytest

    from indicators_spark.functions import multimodal as M

    df = spark.createDataFrame([(1, b"x" * 70)], "doc_id long, payload binary")
    once = M.decode_image_meta(df)
    with _pytest.raises(ValueError, match="already present"):
        M.decode_image_meta(once)


def test_exact_dedup_null_text_passthrough(spark):
    """Null-text rows (failed extraction) are not proven-equal content —
    both exact dedup forms must pass them through, never collapse them."""
    from indicators_spark.functions.dedup import dedup_against_corpus, exact_dedup

    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "same"), (4, "same")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in exact_dedup(docs).collect())
    assert kept == [1, 2, 3]
    corpus = spark.createDataFrame([("zz",)], "fp string")
    kept2 = sorted(
        r["doc_id"] for r in dedup_against_corpus(docs, corpus).collect()
    )
    assert kept2 == [1, 2, 3]


def test_jaccard_prune_keeps_threshold_boundary(spark):
    """jaccard == threshold exactly (4 shared of sizes 5/4 at t=0.8) must
    survive the size-ratio prune — float rounding of the 0.8 literal
    would otherwise prune what the final filter keeps."""
    from indicators_spark.functions.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d")], "doc_id long, text string"
    )
    got = {(r["ia"], r["ib"]): r["jaccard"] for r in
           ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    assert (0, 1) in got and abs(got[(0, 1)] - 0.8) < 1e-15


def test_chunk_documents_rejects_negative_overlap(spark):
    import pytest as _pytest

    from indicators_spark.functions.text import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk=64, overlap=-16)


def test_knn_ivfpq_zero_norm_centroid(spark):
    """A zero-norm coarse centroid must not capture the corpus (NaN mask,
    as in SemDeDup) and nprobe > n_centroids must clamp, not crash."""
    from indicators_spark.functions.similarity import knn_ivfpq

    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0] * 4)] + [
        (i, [1.0, float(i) / 100, 0.0, 0.0]) for i in range(2, 20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 5)
    out = knn_ivfpq(
        df, q, k=3, n_centroids=2, n_sub=2, n_codes=4, nprobe=8
    ).collect()
    assert len(out) == 3  # neighbors found, not silently empty


def test_cosine_pairs_threshold_one_stays_banded(spark):
    """threshold=1.0 (exact duplicates) must keep the banded equi-join
    plan — the theta=0 case previously fell through to the O(n^2)
    nested-loop join."""
    from indicators_spark.functions.similarity import cosine_pairs
    from indicators_spark.plans import plan_string

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [2.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    pairs = cosine_pairs(df, threshold=1.0)
    assert "BroadcastNestedLoopJoin" not in plan_string(pairs)
    got = {(r["ia"], r["ib"]) for r in pairs.collect()}
    assert got == {(0, 1)}  # colinear pair only


def test_cosine_pairs_threshold_one_near_duplicate_floats(spark):
    """Pairs whose true angle is below float64 resolution (cos computes
    exactly 1.0) must survive the banded plan at threshold=1.0 even when
    their reference angles theta(.,e1) differ by far more than the pair
    angle — the regime a 1e-12 band width provably missed (ADVICE r4:
    a 5e-10 theta diff landed the pair ~500 buckets apart)."""
    from indicators_spark.functions.similarity import cosine_pairs

    rows = [
        # near 45 deg: cos(a,b) computes exactly 1.0 in float64 yet
        # theta(a,e1) and theta(b,e1) differ by ~1e-9 (1000 buckets at
        # the old 1e-12 width)
        (0, [1.0, 1.0]),
        (1, [1.0, 1.0 + 2e-9]),
        # a second slope: theta diff ~1.2e-9, cos == 1.0 exactly
        (2, [3.0, 4.0]),
        (3, [3.0, 4.0 + 1e-8]),
        # a genuinely distinct vector that must NOT pair with anything
        (4, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["ia"], r["ib"]) for r in cosine_pairs(df, threshold=1.0).collect()}
    want = {
        (r["ia"], r["ib"])
        for r in cosine_pairs(df, threshold=1.0, band_prune=False).collect()
    }
    assert (0, 1) in want and (2, 3) in want  # the cases are live
    assert got == want  # banded output identical to the all-pairs form


def test_knn_lsh_rejects_dim_mismatch(spark):
    """The dim guard rides the signature expression (per-row, lazy): the
    call itself stays cheap, and the mismatch surfaces at execution."""
    import pytest as _pytest

    from indicators_spark.functions.similarity import knn_lsh

    df = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [2.0] * 8)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(Exception, match="knn_lsh: dim=64"):
        knn_lsh(df, df, dim=64).collect()


def test_knn_lsh_rejects_mixed_length_vectors(spark):
    """A single off-length vector hidden behind well-formed rows must
    raise, not silently zero its signature bits and collapse buckets —
    the failure the old single-row `.first()` probe could not see
    (ADVICE r4)."""
    import pytest as _pytest

    from indicators_spark.functions.similarity import knn_lsh

    df = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [2.0] * 8), (2, [3.0] * 5)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(Exception, match="knn_lsh: dim=8"):
        knn_lsh(df, df, dim=8).collect()


def test_centroid_classify_string_labels(spark):
    from indicators_spark.functions.similarity import centroid_classify

    rows = [
        (0, [1.0, 0.0], "news"),
        (1, [0.9, 0.1], "news"),
        (2, [0.0, 1.0], "spam"),
        (3, [0.1, 0.9], "spam"),
        (4, [0.95, 0.05], "spam"),  # mislabeled: lands in 'news' centroid
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    got = {r["vec_id"]: r["assigned"] for r in centroid_classify(df).collect()}
    assert got[0] == "news" and got[2] == "spam" and got[4] == "news"


def test_kmeans_requires_init_ids(spark):
    import pytest as _pytest

    from indicators_spark.functions.similarity import kmeans_lloyd

    df = spark.createDataFrame(
        [(1000, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="init"):
        kmeans_lloyd(df, k=8)


def test_events_has_nanos_probes_directories(tmp_path):
    """A Spark-written (directory-shaped) events.parquet storing
    TIMESTAMP(NANOS) must be detected so the legacy nanosAsLong conf is
    set before the read — pq.ParquetFile cannot open a directory, so the
    probe must list the first data file (ADVICE r4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from indicators_spark.sources.prices import _events_has_nanos

    ns_tbl = pa.table(
        {"event_id": pa.array([1], pa.int64()),
         "ts": pa.array([1_700_000_000_000_000_000], pa.timestamp("ns"))}
    )
    us_tbl = pa.table(
        {"event_id": pa.array([1], pa.int64()),
         "ts": pa.array([1_700_000_000_000_000], pa.timestamp("us"))}
    )

    # single files (the original shape) still work
    pq.write_table(ns_tbl, str(tmp_path / "ns.parquet"))
    pq.write_table(us_tbl, str(tmp_path / "us.parquet"))
    assert _events_has_nanos(str(tmp_path / "ns.parquet")) is True
    assert _events_has_nanos(str(tmp_path / "us.parquet")) is False

    # directory shapes: data files under the dir, _SUCCESS markers ignored
    for name, tbl in [("dir_ns.parquet", ns_tbl), ("dir_us.parquet", us_tbl)]:
        d = tmp_path / name
        d.mkdir()
        pq.write_table(tbl, str(d / "part-00000.parquet"))
        (d / "_SUCCESS").write_text("")
    assert _events_has_nanos(str(tmp_path / "dir_ns.parquet")) is True
    assert _events_has_nanos(str(tmp_path / "dir_us.parquet")) is False

    # genuine absence -> False, never an exception
    assert _events_has_nanos(str(tmp_path / "missing.parquet")) is False
    empty = tmp_path / "empty.parquet"
    empty.mkdir()
    assert _events_has_nanos(str(empty)) is False
    # a table without ts at all -> False
    no_ts = pa.table({"x": pa.array([1], pa.int64())})
    pq.write_table(no_ts, str(tmp_path / "nots.parquet"))
    assert _events_has_nanos(str(tmp_path / "nots.parquet")) is False


def test_load_table_reads_directory_shaped_nanos_events(spark, tmp_path):
    """End-to-end: load_table on a directory-shaped nanos events table
    takes the legacy bigint path and lands on the canonical timestamp."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from indicators_spark.sources.prices import load_table

    d = tmp_path / "events.parquet"
    d.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [1_700_000_000_000_000_000, 1_700_000_001_000_000_000],
                pa.timestamp("ns"),
            ),
            "value": pa.array([1.5, 2.5], pa.float64()),
        }
    )
    pq.write_table(tbl, str(d / "part-00000.parquet"))
    ev = load_table(spark, str(tmp_path), "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    got = sorted(r["ts"].timestamp() for r in ev.collect())
    assert got == [1_700_000_000.0, 1_700_000_001.0]


def test_knn_lsh_null_vector_dropped_not_fatal(spark):
    """A NULL embedding can't be searched but must not kill the job (the
    dim guard raises only on WRONG-length vectors): NULL rows get a NULL
    bucket and fall out of the equi join."""
    from pyspark.sql import functions as F

    from indicators_spark.functions.similarity import knn_lsh

    df = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [2.0] * 8), (2, None)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") == 0)
    out = knn_lsh(df, q, k=2, dim=8).collect()
    assert {r["nid"] for r in out} == {1}  # NULL row absent, job alive
