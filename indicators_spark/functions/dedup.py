"""Deduplication operators over a document table — exact, MinHash+LSH,
SimHash, and n-gram Jaccard — plus embedding-cosine near-dup in
``similarity.py``.

Scale design (the whole point of these at 100 TB):

* **exact**: one hash-groupBy on a fingerprint — single shuffle, map-side
  partial aggregation; the fingerprint (md5) is computed scan-side so the
  shuffle carries 16 bytes + id per row, not the document text.
* **n-gram Jaccard**: explode distinct tokens → self-join on token →
  pair-count groupBy.  A ``max_df`` prune drops ubiquitous tokens before
  the join (posting-list blowup is THE failure mode; at scale you'd also
  length-bucket).  Shuffles: explode-groupBy + one join.
* **MinHash LSH**: k portable hash permutations → min-agg per doc (one
  groupBy), band the signature, self-join per band bucket → candidates.
  Join keys are (band, h₁, h₂) ints — tiny rows.  This is the textbook
  shingle→minhash→band→bucket-join pipeline, all JVM-side.
* **SimHash**: per-token hash bits weighted ±1, summed per doc (one
  groupBy with 32 conditional sums), sign-assembled into a 32-bit value.
  Hamming-close pairs via band join on byte quarters.

All hashes are md5-derived (portable to the DuckDB oracle) — see
``text.portable_word_hash``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import H31, word_hash31, word_ngrams, words

#: Deterministic MinHash permutation constants (a*h + b mod 2^31-1).
MINHASH_COEFFS: tuple[tuple[int, int], ...] = (
    (1103515245, 12345),
    (69069, 362437),
    (1013904223, 1664525),
    (22695477, 77557187),
    (134775813, 1),
    (214013, 2531011),
    (16807, 0),
    (48271, 11),
)


def exact_duplicate_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group exact duplicates by md5 fingerprint: returns one row per
    distinct text with the kept (min) id and the group size."""
    fp = F.md5(F.col(text_col))
    return (
        df.select(F.col(id_col), fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep exactly one row (min id) per distinct text.

    NULL text never dedupes: ``md5(NULL)`` is NULL and groupBy would pool
    every null-text row (failed extraction, not proven-equal content) into
    one group and silently delete all but one — those rows pass through
    unchanged instead."""
    keep = exact_duplicate_groups(
        df.filter(F.col(text_col).isNotNull()), id_col, text_col
    ).select(F.col("keep_id").alias(id_col))
    nulls = df.filter(F.col(text_col).isNull())
    return df.join(keep, id_col, "left_semi").unionByName(nulls)


def _spread(df: DataFrame) -> DataFrame:
    """Ensure the doc scan uses the cluster's width before the per-token
    explode.  A small corpus arrives as one file split, so the whole
    shingle→hash pipeline would run in a single task; round-robin to
    ``defaultParallelism`` first.  At scale inputs already have ≥ that many
    splits and this is a no-op (no exchange added).

    Width probe uses ``inputFiles()`` (a listing, no job) rather than
    ``df.rdd.getNumPartitions()`` — the RDD conversion forces plan
    analysis through the deprecated path on every call.

    Known under-approximation (perf-only, results unaffected): one large
    file can already split into many tasks (the repartition is then a
    needless extra shuffle), and an upstream-repartitioned or in-memory
    frame reports 0 files so is never spread.  A
    ``spark.sql.files.maxPartitionBytes``-aware size probe would be
    exact; not worth a listing of file sizes for a heuristic."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file source (e.g. in-memory test frame)
        n_files = 0
    if 0 < n_files < target:
        return df.repartition(target)
    return df


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) pairs, distinct tokens per doc."""
    return _spread(df).select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(words(F.col(text_col)))).alias("tok"),
    )


def _doc_shingles(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, shingle) pairs — distinct word *bigrams* per doc.  Shingles,
    not unigrams: on small vocabularies unigram sets are near-identical
    across documents and LSH degenerates to all-pairs; bigrams restore
    selectivity (vocab² space)."""
    # Guard the <2-word case: sequence(1, 0) DESCENDS in Spark and the
    # element_at then indexes past the array (ANSI error).  Such docs
    # have no shingles and drop out — the semantics the oracle's
    # range(1, len(ws)) (empty for len<2) already has.
    # The token array materializes as a column first: no CSE inside
    # lambdas, so an inline split() would re-tokenize once per element_at.
    ws = F.col("_ws")
    shingles = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(ws, i), F.element_at(ws, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        _spread(df)
        .select(
            F.col(id_col).alias("_id"), words(F.col(text_col)).alias("_ws")
        )
        .select("_id", F.explode(F.array_distinct(shingles)).alias("tok"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    max_df: int | None = None,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Near-dup pairs by Jaccard similarity of distinct-token sets.

    ``max_df`` (absolute) / ``max_df_frac`` (fraction of the corpus —
    scale-invariant, preferred) prune tokens appearing in more than that
    many documents before the self-join: at 100 TB the ubiquitous-token
    posting lists are quadratic (a token in f·N docs contributes ~(f·N)²/2
    candidate pairs), pruning them first is mandatory, and they carry
    almost no Jaccard signal.  The pruned-token Jaccard is computed over
    the SURVIVING token sets on both engines (the oracle mirrors the
    filter), so results stay exact."""
    toks = _doc_tokens(df, id_col, text_col)
    if max_df is not None or max_df_frac is not None:
        dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        if max_df_frac is not None:
            n_docs = df.select(
                F.count_distinct(F.col(id_col)).alias("n_docs")
            )
            dfreq = dfreq.crossJoin(F.broadcast(n_docs))
            cap = F.col("n_docs") * F.lit(max_df_frac)
        else:
            cap = F.lit(max_df)
        # anti-join against the UBIQUITOUS set (df > cap): tiny by
        # construction, so the broadcast is bounded — broadcasting the
        # surviving vocabulary (nearly all tokens) would OOM at corpus
        # scale
        toks = toks.join(
            F.broadcast(dfreq.filter(F.col("df") > cap).select("tok")),
            "tok",
            "left_anti",
        )
    # the (pruned) token stream feeds the self-join twice plus three
    # size/df aggregates — materialize it once instead of replaying
    # scan→tokenize→distinct(→anti-join) per reference (r13; same
    # treatment as _prefix_jaccard).  Lazy (r14): the first consuming
    # action computes the blocks; no dedicated job at plan-build.
    from .materialize import shared_lazy as _mat

    toks = _mat(toks)
    sizes = toks.groupBy("_id").agg(F.count(F.lit(1)).alias("sz"))
    # Size-ratio prefix prune (exact): jaccard(A,B) ≥ t forces
    # t·|A| ≤ |B| and t·|B| ≤ |A| (|A∩B| ≤ min, |A∪B| ≥ max), so pairs
    # outside the ratio band can be skipped BEFORE counting shared tokens.
    # Removes only pairs the final jaccard ≥ t filter would drop anyway —
    # results identical, oracle unchanged — but at scale it cuts the
    # posting-list join output for heterogeneous-length corpora.
    # The 1e-9 slack keeps the prune strictly conservative at the
    # jaccard == threshold boundary: the threshold double may round UP
    # (0.8 → 0.8000…0444), and sz·t would then prune a pair whose final
    # exact-integer-ratio jaccard equals the same double and passes the
    # final filter on both engines.
    toks_sz = toks.join(sizes, "_id")  # AQE picks broadcast when small
    a = toks_sz.alias("a")
    b = toks_sz.alias("b")
    ratio_ok = (F.col("b.sz") >= F.col("a.sz") * threshold - 1e-9) & (
        F.col("a.sz") >= F.col("b.sz") * threshold - 1e-9
    )
    shared = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a._id") < F.col("b._id"))
            & ratio_ok,
        )
        .groupBy(F.col("a._id").alias("ia"), F.col("b._id").alias("ib"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("_id").alias("ia"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("_id").alias("ib"), F.col("sz").alias("szb"))
    out = (
        # per-doc size tables are O(#docs) — no broadcast hint; AQE picks
        shared.join(sa, "ia")
        .join(sb, "ib")
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("sza") + F.col("szb") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("ia", "ib", "jaccard")


def jaccard_prefix_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    max_df: int | None = None,
    max_df_frac: float | None = None,
) -> DataFrame:
    """:func:`ngram_jaccard_pairs` with PREFIX FILTERING (the AllPairs /
    PPJoin candidate rule, Bayardo et al. WWW'07 / Xiao et al. WWW'08):
    candidate pairs come only from a self-join of each document's
    ``p = |d| − ⌈τ·|d|⌉ + 1`` globally-RAREST tokens, then exact Jaccard
    verification over the full token sets.  Output is IDENTICAL to the
    plain operator at the same settings (pinned in tests): if
    ``J(A,B) ≥ τ``, the minimum-rank common token must sit inside both
    prefixes — were it outside A's, all common tokens would lie in A's
    suffix of size ``⌈τ|A|⌉ − 1 < ⌈τ|A|⌉ ≤ |A∩B|``.

    Why this is the 100 TB form: the plain operator's posting-list
    self-join is quadratic in every token's document frequency, so after
    the ubiquitous-token prune the moderately-common tokens still
    dominate (Σ df² over ALL tokens).  Here only PREFIX occurrences join
    — tokens are ordered ascending by global df, so high-df tokens land
    at the end of each document and rarely enter any prefix; candidate
    volume collapses to Σ df_prefix², the published AllPairs effect.
    Measured (bench_scale, clusters-of-5 corpus with a 500-token common
    vocabulary): 82.8 s plain vs 6.3 s prefix at 30k docs — 13×, and
    widening quadratically.  Caveat from the same probe: on a corpus
    with NO moderately-common tokens (tiny df everywhere) the filter's
    extra rank/position passes cost more than the join they save
    (5.1 s vs 1.8 s at 3.3k all-rare docs) — prefer the plain operator
    when the post-prune vocabulary is already rare-only.  Verification
    cost is bounded by candidates × avg doc size.

    Token order is (df, token) ascending — fully deterministic, so the
    prefix sets and therefore the candidate set replay exactly in the
    oracle.  The rank window runs over the VOCABULARY table (bounded by
    distinct tokens, not corpus rows — the same bound every posting-list
    operator here leans on).  ``⌈τ·|d|⌉`` carries the standard −1e-9
    slack so a product that IEEE-rounds upward across an integer can
    only LENGTHEN the prefix (more candidates, never a missed pair).

    ``max_df`` / ``max_df_frac`` prune ubiquitous tokens exactly as in
    :func:`ngram_jaccard_pairs` (Jaccard is then over surviving sets on
    both engines).  The prune block is intentionally local to this
    family until the sibling's next rotation consolidates it — the
    sibling is a registered code path this round must not touch.
    """
    toks = _doc_tokens(df, id_col, text_col)
    ndocs = df.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
    return _prefix_jaccard(
        toks, toks, ndocs, threshold, max_df, max_df_frac, same=True
    )


def jaccard_join_prefix(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    max_df: int | None = None,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Two-table (R–S) set-similarity JOIN with the same AllPairs prefix
    filter as :func:`jaccard_prefix_pairs`: all cross-table pairs with
    token-set Jaccard ≥ ``threshold``, as ``(ia, ib, jaccard)`` with
    ``ia`` from ``left`` and ``ib`` from ``right``.

    This is the fuzzy-matching / fuzzy-decontamination primitive: "find
    every crawl document that near-duplicates a benchmark or curated
    document" (`decontaminate_ngram` is the exact-8-gram version; this
    catches lightly-edited overlaps it misses) or entity-matching a
    dirty table against a canonical one.  Same theorem, same prefix
    rule — the token order and document frequencies come from the
    UNION of both sides, so one consistent global order covers every
    pair, and ``max_df_frac`` is a fraction of the combined distinct
    doc count.  No ``ia < ib`` constraint (the sides are different
    tables); if an id appears on both sides it may pair with itself.

    At 100 TB the asymmetry is the point: the benchmark side is tiny,
    so its prefix posting lists are tiny, and the candidate join output
    is bounded by (benchmark prefix tokens) × (their df in the crawl) —
    never crawl × crawl.
    """
    toksL = _doc_tokens(left, id_col, text_col)
    toksR = _doc_tokens(right, id_col, text_col)
    ndocs = (
        left.select(F.col(id_col))
        .unionByName(right.select(F.col(id_col)))
        .select(F.count_distinct(F.col(id_col)).alias("n_docs"))
    )
    return _prefix_jaccard(
        toksL, toksR, ndocs, threshold, max_df, max_df_frac, same=False
    )


def _prefix_jaccard(
    toksL: DataFrame,
    toksR: DataFrame,
    ndocs: DataFrame,
    threshold: float,
    max_df: int | None,
    max_df_frac: float | None,
    same: bool,
) -> DataFrame:
    """Shared prefix-filter engine for the self-join and R–S forms.

    ``toksL``/``toksR``: distinct (``_id``, ``tok``) streams (identical
    object when ``same``); ``ndocs``: 1-row frame with the combined
    distinct-doc count for the ``max_df_frac`` cap."""
    toks_all = toksL if same else toksL.unionByName(toksR)
    dfreq = toks_all.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
    if max_df is not None or max_df_frac is not None:
        if max_df_frac is not None:
            dfreq_c = dfreq.crossJoin(F.broadcast(ndocs))
            cap = F.col("n_docs") * F.lit(max_df_frac)
        else:
            dfreq_c = dfreq
            cap = F.lit(max_df)
        ubiq = dfreq_c.filter(F.col("_df") > cap).select("tok")
        toksL = toksL.join(F.broadcast(ubiq), "tok", "left_anti")
        toksR = (
            toksL
            if same
            else toksR.join(F.broadcast(ubiq), "tok", "left_anti")
        )
    # Materialize the (pruned) token streams ONCE (r13).  Each stream is
    # referenced 4–6× downstream (df join, prefix ranking, verification
    # join, size aggregates); without truncation every reference replays
    # scan→tokenize→distinct→anti-join — the before-plan was 405 nodes /
    # 186 Exchanges recomputing the corpus ~6×.  localCheckpoint (the
    # same persist-form the r8 queries adopted) computes each stream once
    # and cuts the plan to the post-token DAG.  The document frequencies
    # are then re-aggregated FROM the materialized streams — equivalent
    # by construction: pruning removes only ubiquitous tokens' rows, so a
    # surviving token keeps every occurrence and its df is unchanged.
    # Lazy (r14): the first consuming action materializes — plan-build
    # spends no dedicated job.
    from .materialize import shared_lazy as _mat

    toksL = _mat(toksL)
    toksR = toksL if same else _mat(toksR)
    dfreq = (
        (toksL if same else toksL.unionByName(toksR))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    # Per-doc token order = (global df, token) ascending, rarest
    # first.  The prefix rule needs only each document's RELATIVE token
    # order under one fixed global order — never a materialized global
    # rank — so docs order their own tokens by the (df, tok) tuple
    # directly: no vocabulary-wide row_number window (which would plan a
    # SinglePartition sort over the whole vocab), just the df join every
    # posting-list operator already pays.

    def _prefix(toks: DataFrame) -> DataFrame:
        tokr = toks.join(dfreq, "tok")
        sz_w = Window.partitionBy("_id")
        pos_w = Window.partitionBy("_id").orderBy("_df", "tok")
        per_doc = tokr.withColumn(
            "_sz", F.count(F.lit(1)).over(sz_w)
        ).withColumn("_q", F.row_number().over(pos_w))
        # p = sz − ⌈τ·sz − 1e-9⌉ + 1 (slack keeps the prune conservative)
        plen = F.col("_sz") - F.ceil(
            F.col("_sz") * F.lit(threshold) - F.lit(1e-9)
        ) + 1
        return per_doc.filter(F.col("_q") <= plen).select(
            "_id", "tok", "_sz"
        )

    prefL = _prefix(toksL)
    prefR = prefL if same else _prefix(toksR)
    a = prefL.alias("a")
    b = prefR.alias("b")
    ratio_ok = (F.col("b._sz") >= F.col("a._sz") * threshold - 1e-9) & (
        F.col("a._sz") >= F.col("b._sz") * threshold - 1e-9
    )
    pair_cond = (F.col("a.tok") == F.col("b.tok")) & ratio_ok
    if same:
        pair_cond = pair_cond & (F.col("a._id") < F.col("b._id"))
    cand = (
        a.join(b, pair_cond)
        .select(F.col("a._id").alias("ia"), F.col("b._id").alias("ib"))
        .distinct()
    )
    # exact verification over full token sets, candidates only (an
    # array_intersect form over doc-level token arrays was tried in r13
    # and measured 2.4× SLOWER at bench SF — the pair-keyed joins then
    # carry a full token array per candidate row and the intersect is
    # interpreted per pair; the posting join's partial aggregation beats
    # it despite the larger row stream)
    ta = toksL.select(F.col("_id").alias("ia"), "tok")
    tb = toksR.select(F.col("_id").alias("ib"), "tok")
    shared = (
        cand.join(ta, "ia")
        .join(tb, ["ib", "tok"])
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = (
        toksL.groupBy("_id")
        .agg(F.count(F.lit(1)).alias("sza"))
        .withColumnRenamed("_id", "ia")
    )
    sb = (
        toksR.groupBy("_id")
        .agg(F.count(F.lit(1)).alias("szb"))
        .withColumnRenamed("_id", "ib")
    )
    return (
        shared.join(sa, "ia")
        .join(sb, "ib")
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("sza") + F.col("szb") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("ia", "ib", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """k=8 MinHash values per document (columns h1..h8) over word-bigram
    shingles, one groupBy.  Docs with <2 words have no shingles and drop
    out (mirrored by the oracle)."""
    toks = _doc_shingles(df, id_col, text_col).withColumn(
        "wh", word_hash31(F.col("tok"))
    )
    aggs = [
        F.min((F.lit(a) * F.col("wh") + F.lit(b)) % F.lit(H31)).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS, start=1)
    ]
    return toks.groupBy(F.col("_id").alias(id_col)).agg(*aggs)


def _banded_signatures(
    df: DataFrame, id_col: str, text_col: str, bands: int
) -> DataFrame:
    """(_id, band, key) rows: the k=8 MinHash signature split into
    ``bands`` band-key structs via one ``posexplode``."""
    sig = minhash_signatures(df, id_col, text_col)
    if len(MINHASH_COEFFS) % bands:
        raise ValueError(
            f"bands={bands} must divide the signature length "
            f"{len(MINHASH_COEFFS)} (otherwise trailing hashes are "
            "silently dropped and the (b, r) analysis is wrong)"
        )
    rows_per_band = len(MINHASH_COEFFS) // bands
    band_structs = [
        F.struct(
            *[
                F.col(f"h{bi * rows_per_band + j + 1}").alias(f"k{j + 1}")
                for j in range(rows_per_band)
            ]
        )
        for bi in range(bands)
    ]
    return sig.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.array(*band_structs)).alias("band", "key"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: band the k=8 signature into ``bands``
    bands of 2 rows, bucket-join per band, count collisions per pair.

    Returns (ia, ib, n_bands) — how many bands collided (monotone in
    estimated Jaccard).

    ``max_bucket_size`` bounds the adversarial failure mode (SCALING.md):
    a near-identical corpus lands everything in one band bucket and the
    self-join goes quadratic.  With a cap, each (band, key) bucket keeps
    only its ``max_bucket_size`` lowest-id members (deterministic sample;
    candidate pairs per bucket ≤ cap·(cap−1)/2) — an approximation, so it
    is opt-in and the exact default keeps the oracle row.  Overflow is
    observable via :func:`lsh_bucket_overflow`; docs dropped from an
    overflowing bucket can still pair in their other bands.  The cap's
    row_number window partitions by the join key itself, so it adds no
    exchange — the join reuses the window's partitioning.

    Plan shape: the signature aggregate runs ONCE; ``posexplode`` turns
    each doc into ``bands`` (band, key-struct) rows and a single
    self-equi-join on (band, key) replaces a per-band union of joins —
    one shuffle of small int rows instead of ``bands`` joins each
    recomputing the signatures (a naive union-of-band-joins plan costs
    2·bands signature aggregations; this one costs one, and the aliased
    self-join lets Catalyst reuse the exchange across both sides)."""
    banded = _banded_signatures(df, id_col, text_col, bands)
    if max_bucket_size is not None:
        wb = Window.partitionBy("band", "key").orderBy("_id")
        banded = (
            banded.withColumn("_bn", F.row_number().over(wb))
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    # shuffle_hash (not the default broadcast): with both sides shuffled on
    # (band, key) the two exchange subtrees canonicalize identically, so
    # Catalyst's ReuseExchange computes the signature aggregate ONCE and
    # replays it for the other side — the whole shingle→minhash pipeline
    # runs a single time however large the corpus.
    a, b = banded.alias("a").hint("shuffle_hash"), banded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a._id") < F.col("b._id")),
    ).select(F.col("a._id").alias("ia"), F.col("b._id").alias("ib"))
    return pairs.groupBy("ia", "ib").agg(F.count(F.lit(1)).alias("n_bands"))


def lsh_bucket_overflow(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """(band, key, size, dropped) for every LSH band bucket larger than
    ``max_bucket_size`` — run alongside a capped
    :func:`minhash_lsh_candidates` to quantify the approximation (how many
    docs the deterministic per-bucket sample excluded and where).  One
    groupBy on the same skinny (band, key) rows; empty result ⇒ the cap
    changed nothing."""
    banded = _banded_signatures(df, id_col, text_col, bands)
    return (
        banded.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("size"))
        .filter(F.col("size") > max_bucket_size)
        .withColumn("dropped", F.col("size") - max_bucket_size)
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash per document from token hashes (with multiplicity):
    bit j of the result is 1 iff Σ_tokens (2·bit_j(h) − 1) > 0.

    Effective width is 31 bits: ``word_hash31`` values live below 2³¹, so
    bit 31's vote sum is always −count and the top bit is constant 0 —
    the bits-24..31 band therefore has 128 reachable values (≈2× that
    band's bucket collision rate vs a full byte).  Kept as-is for oracle
    stability; widen ``word_hash31`` if band 3's selectivity ever
    matters."""
    toks = df.select(
        F.col(id_col),
        F.explode(words(F.col(text_col))).alias("tok"),
    ).withColumn("wh", word_hash31(F.col("tok")))
    aggs = [
        F.sum(
            F.shiftright(F.col("wh"), j).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"s{j}")
        for j in range(32)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    val = F.lit(0).cast("long")
    for j in range(32):
        val = val + F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sums.select(F.col(id_col), val.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs by SimHash Hamming distance ≤ max_hamming.

    Scale shape: band the 32-bit signature into 4 bytes; by pigeonhole any
    pair within Hamming distance 3 agrees on ≥1 byte, so the join runs per
    byte bucket (small int keys), then exact popcount(xor) verifies.  No
    all-pairs comparison ever materializes.

    ``max_hamming`` is capped at 3: with 4 byte-bands the pigeonhole
    guarantee breaks at distance 4 (one flipped bit per byte), and a
    larger bound would silently lose recall."""
    if max_hamming > 3:
        raise ValueError(
            "max_hamming > 3 breaks the 4-byte-band pigeonhole guarantee "
            "(a distance-4 pair can differ in every byte); use more bands "
            "or exact verification for larger radii"
        )
    from .materialize import shared_lazy as _mat

    # The signature frame (explode + 32-bit-vote aggregation) is by far the
    # expensive part; materialize it ONCE instead of letting each band join
    # side replay scan→tokenize→aggregate (8 replays for 4 bands).  The four
    # per-band self-joins then collapse into ONE self-join on a combined
    # (band, byte) key — identical candidate set (union over bands of
    # per-band equi-joins ≡ one equi-join on the composite key), 1 exchange
    # per side instead of 8.  LAZY checkpoint (VERDICT r13 #3): the first
    # consuming action — the broadcast build of the join's small side —
    # materializes the blocks; an eager cut here spent a dedicated job at
    # call time, which on a 5k-doc bench input cost more than it saved.
    sig = _mat(simhash(df, id_col, text_col).select(F.col(id_col), "simhash"))
    band_keys = F.array(
        *[
            (
                F.shiftright(F.col("simhash"), b * 8).bitwiseAND(F.lit(255))
                + F.lit(b * 256)
            ).cast("int")
            for b in range(4)
        ]
    )
    bd = sig.select(F.col(id_col), F.col("simhash"), F.explode(band_keys).alias("bk"))
    left = bd.select(F.col(id_col).alias("ia"), F.col("simhash").alias("sa"), "bk")
    right = bd.select(F.col(id_col).alias("ib"), F.col("simhash").alias("sb"), "bk")
    cand = (
        left.join(right, "bk")
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib", "sa", "sb")
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("ia", "ib", "hamming")
    )


def connected_components(
    edges: DataFrame,
    src: str = "ia",
    dst: str = "ib",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected edge list → ``(v,
    component)`` with ``component`` = min vertex id in the component.

    This is the step that turns near-dup *pairs* (LSH / SimHash / Jaccard
    candidates) into dedup *clusters* so one canonical document per
    cluster can be kept — pairs alone under-delete because near-dup is
    not transitive-closed.

    Algorithm: iterative min-label propagation with pointer doubling —
    each round (1) every vertex takes the min label among itself and its
    neighbors (one skinny join + groupBy on int ids), then (2) jumps to
    its label's label (one self-join), which collapses chains
    logarithmically (the large-star/small-star trick from the MapReduce
    CC literature).  Rounds ≈ O(log diameter); near-dup graphs are
    band-clique-dominated, so 2-4 rounds in practice.

    Scale notes:
    * every per-round shuffle carries 2-3 ints per row — never document
      payloads;
    * ``localCheckpoint`` truncates the plan each round (an iterated
      unmaterialized join plan grows exponentially and re-executes the
      whole history every action — THE classic iterative-Spark trap);
    * convergence is detected with one count on the already-materialized
      checkpoint, so each round costs exactly one pass.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # materialize the edge list too: it is scanned once per round, and its
    # lineage is typically the full LSH candidate pipeline
    # (lsh_dedup_clusters) — without this every round re-runs the
    # shingle → signature → band-join derivation
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("v")).distinct().withColumn("lab", F.col("v"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr = (
            sym.join(labels.select(F.col("v").alias("b"), "lab"), "b")
            .groupBy("a")
            .agg(F.min("lab").alias("nlab"))
        )
        stepped = (
            labels.join(nbr.select(F.col("a").alias("v"), "nlab"), "v", "left")
            .select("v", F.least("lab", F.coalesce("nlab", "lab")).alias("m"), "lab")
        )
        jumped = (
            stepped.join(
                labels.select(F.col("v").alias("_lv"), F.col("lab").alias("_ll")),
                stepped["m"] == F.col("_lv"),
                "left",
            )
            .select("v", F.least("m", F.coalesce("_ll", "m")).alias("new"), "lab")
            .localCheckpoint(eager=True)
        )
        changed = jumped.filter(F.col("new") < F.col("lab")).count()
        labels = jumped.select("v", F.col("new").alias("lab"))
        if changed == 0:
            break
    return labels.select("v", F.col("lab").alias("component"))


def lsh_dedup_clusters(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Full near-dup dedup decision: MinHash-LSH candidate pairs →
    connected components → one canonical (min-id) doc per cluster.

    Returns every document with its ``component`` (cluster
    representative), ``cluster_size``, and ``is_canonical`` (the keep
    flag).  Docs with no near-dup are their own singleton component."""
    pairs = minhash_lsh_candidates(df, id_col, text_col)
    comp = connected_components(pairs)
    full = (
        df.select(F.col(id_col))
        .join(comp.withColumnRenamed("v", id_col), id_col, "left")
        .select(
            id_col, F.coalesce("component", F.col(id_col)).alias("component")
        )
    )
    sizes = full.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        full.join(sizes, "component")  # O(#components) — let AQE choose
        .select(
            id_col,
            "component",
            "cluster_size",
            (F.col(id_col) == F.col("component")).alias("is_canonical"),
        )
    )


def dedup_against_corpus(
    new_batch: DataFrame,
    corpus_fps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_col: str = "fp",
) -> DataFrame:
    """Incremental-ingest dedup: drop new documents whose exact
    fingerprint already exists in the historical corpus, then dedup the
    batch against itself (keep min id).  The realistic production shape —
    full-corpus re-dedup on every ingest does not survive 100 TB; this
    touches only (batch × fingerprint-table) keys.

    Scale shape: one anti join on 16-byte md5 keys (the fingerprint table
    side carries NO text) + one batch-local groupBy.  With the fingerprint
    table bucketed on fp, the anti join is exchange-free on the historical
    side; AQE broadcasts small batches.
    """
    fps = corpus_fps.select(F.col(fp_col).alias("_fp"))
    # NULL text (failed extraction) has no fingerprint: it can neither
    # match history nor equal another null-text row, so those rows pass
    # through unchanged (a NULL groupBy key would pool them and silently
    # delete all but one)
    nulls = new_batch.filter(F.col(text_col).isNull())
    batch = new_batch.filter(F.col(text_col).isNotNull()).withColumn(
        "_fp", F.md5(F.col(text_col))
    )
    fresh = batch.join(fps, "_fp", "left_anti")
    keep = fresh.groupBy("_fp").agg(F.min(F.col(id_col)).alias(id_col)).select(id_col)
    return (
        fresh.join(keep, id_col, "left_semi").drop("_fp").unionByName(nulls)
    )


def minhash_estimate_vs_true(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Estimator-quality audit for the MinHash pipeline: for every LSH
    candidate pair, the signature-agreement Jaccard ESTIMATE
    (matching positions / k) next to the TRUE shingle-set Jaccard — the
    table you look at before trusting a banding config on a new corpus
    (band/row choices trade recall for candidate volume; this measures
    what the 8-position signature actually resolves).

    Scale shape: candidates come from the banded LSH join (bounded, never
    all-pairs); signatures attach by two id equi-joins; the true-Jaccard
    intersection is a posting-list join on shingle hashes that is
    SEMI-JOINED TO THE CANDIDATE SET FIRST (broadcast — candidates are
    few by construction), so the exact computation is paid only for pairs
    the sketch already surfaced."""
    cand = minhash_lsh_candidates(df, id_col, text_col)
    sig = minhash_signatures(df, id_col, text_col)
    k = len(MINHASH_COEFFS)
    sa = sig.select(
        F.col(id_col).alias("ia"),
        *[F.col(f"h{i}").alias(f"_a{i}") for i in range(1, k + 1)],
    )
    sb = sig.select(
        F.col(id_col).alias("ib"),
        *[F.col(f"h{i}").alias(f"_b{i}") for i in range(1, k + 1)],
    )
    matches = sum(
        F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
        for i in range(1, k + 1)
    )
    est = (
        cand.join(sa, "ia")
        .join(sb, "ib")
        .select("ia", "ib", "n_bands", (matches / float(k)).alias("est_jaccard"))
    )
    sh = (
        _doc_shingles(df, id_col, text_col)
        .select("_id", word_hash31(F.col("tok")).alias("wh"))
        .distinct()
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    pair_keys = cand.select("ia", "ib")
    # Restrict the posting lists to CANDIDATE DOCS before the wh
    # self-join: the pair semi-join alone cannot push down (its keys
    # derive from both join sides), so without this the self-join
    # materializes every token-sharing doc pair in the corpus — the
    # ubiquitous-shingle quadratic blowup — before filtering to the few
    # candidate pairs.  Candidate ids are few by construction (broadcast).
    cand_ids = (
        pair_keys.select(F.col("ia").alias("_id"))
        .unionByName(pair_keys.select(F.col("ib").alias("_id")))
        .distinct()
    )
    sh_c = sh.join(F.broadcast(cand_ids), "_id", "left_semi")
    inter = (
        sh_c.select(F.col("_id").alias("ia"), "wh")
        .join(sh_c.select(F.col("_id").alias("ib"), "wh"), "wh")
        .filter(F.col("ia") < F.col("ib"))
        .join(F.broadcast(pair_keys), ["ia", "ib"], "left_semi")
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        est.join(inter, ["ia", "ib"], "left")
        .join(sizes.select(F.col("_id").alias("ia"), F.col("n").alias("na")), "ia")
        .join(sizes.select(F.col("_id").alias("ib"), F.col("n").alias("nb")), "ib")
        .select(
            "ia",
            "ib",
            "n_bands",
            "est_jaccard",
            (
                F.coalesce(F.col("inter"), F.lit(0)).cast("double")
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("inter"), F.lit(0)))
            ).alias("true_jaccard"),
        )
    )


def _prune_hot_grams(
    pos_g: DataFrame,
    max_df_frac: float,
    n_docs_df: DataFrame,
) -> DataFrame:
    """Drop positioned grams whose DOCUMENT frequency exceeds
    ``max_df_frac`` of the corpus — the boilerplate-gram guard of the
    ExactSubstr family (same role as ``containment_pairs``' ubiquitous-
    token kill).  A gram in ``f·N`` documents makes one posting-list hot
    key carrying ~``f·N`` rows through the occurrence window; grams in a
    large corpus fraction are license headers / navigation chrome whose
    spans a curation pipeline caps separately, not passages worth a
    skew-stalled stage.  The banned set is tiny by construction (few
    grams clear a corpus-fraction bar) — broadcast anti-join; the df
    count itself is a map-side-combinable distinct aggregate, never a
    per-key posting-list window.  ``n_docs_df`` is a 1-row (n_docs)
    frame so callers control WHICH population defines the fraction."""
    dfreq = pos_g.groupBy("gh").agg(F.count_distinct("_id").alias("_df"))
    banned = (
        dfreq.crossJoin(F.broadcast(n_docs_df))
        .filter(F.col("_df") > F.col("n_docs") * F.lit(max_df_frac))
        .select("gh")
    )
    return pos_g.join(F.broadcast(banned), "gh", "left_anti")


def substring_dup_spans(
    df: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_first: bool = False,
    max_df_frac: float | None = None,
    materialize_grams: bool | None = None,
) -> DataFrame:
    """Exact substring (repeated-span) deduplication — the ExactSubstr
    operator family of Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better": per document, every MAXIMAL span of
    ≥ ``n`` consecutive words that occurs verbatim somewhere else in the
    corpus (another document, or another position of the same document).
    This is the cross-document repeated-passage complement to the
    whole-doc fingerprint families above — a doc with no near-duplicate
    partner can still carry a 300-word boilerplate block shared by
    thousands of docs, which only span-level dedup removes.

    Returns ``(id, span_start, span_end, span_words)`` with 1-based word
    positions.  Spans are maximal: duplicated ``n``-gram windows whose
    word coverage overlaps or touches are merged (same-length intervals
    sorted by start merge while ``next_start ≤ prev_start + n``), so the
    output spans per doc are pairwise disjoint and non-adjacent.

    ``keep_first=True`` switches to the paper's REMOVAL policy: the
    globally first occurrence of each gram (min ``(doc_id, pos)``) is the
    canonical copy and is NOT marked — only later occurrences seed spans,
    so the returned spans are exactly the text ExactSubstr would cut
    while one copy of every passage survives somewhere in the corpus.
    The default (``False``) marks EVERY occurrence — the audit view
    ("which text is duplicated at all"), which ``substring_dup_stats``
    aggregates.

    Scale shape (suffix-array-free, shuffle-bounded):

    1. positioned ``n``-grams via one ``posexplode``; the gram is hashed
       to an 8-byte key scan-side, so document text NEVER shuffles.
    2. ONE map-side-combined groupBy on the gram hash counts total
       occurrences — a gram with ``occ ≥ 2`` is a duplicated seed.
       (The paper's suffix array finds the same seed set; at 100 TB the
       hash-shuffle form parallelizes per gram key with no global sort.)
    3. seeds join back on the gram hash (plain hash join, int keys);
       only ``(id, pos)`` int pairs survive.
    4. per-doc interval merge: lag + running-sum windows and a groupBy
       on the doc key — one doc-keyed exchange, state bounded by
       positions within one document.

    No stage is quadratic in corpus size: a passage shared by ``d`` docs
    costs ``O(d)`` occurrence rows (its posting list), never ``O(d²)``
    pairs.  The gram hash is engine-internal (the oracle groups raw gram
    strings) — xxhash64 collisions ~2⁻⁶⁴, same accepted trade as
    ``text.duplicate_passage_fraction``.
    """
    pos_g = _pos_grams(df, n, id_col, text_col)
    # Occurrence analysis as a window over the gram key, not groupBy+join:
    # ONE hash exchange on gh and pos_g evaluated once, vs two exchanges
    # plus a full re-evaluation of the gram construction on the join's
    # probe side (measured ~2× at sf0.1).  Per-key window state is the
    # gram's posting list — O(occurrences), the same rows the join's
    # shuffle would carry; a corpus-wide boilerplate passage makes a hot
    # key either way, which is what max_df_frac kills: grams whose
    # DOCUMENT frequency exceeds that corpus fraction are pruned before
    # the window (broadcast anti-join against the tiny banned set), so no
    # posting list longer than max_df_frac·N docs' occurrences ever
    # becomes window state.  Spans then cover only sub-ubiquitous
    # passages (mirror the prune in any oracle); default None keeps the
    # exact corpus-wide semantics.
    if max_df_frac is not None:
        # The guard makes pos_g dual-consumed (df aggregate + main path);
        # without materialization the tokenize+hash scan runs twice —
        # measured 2.2× end-to-end at sf0.1.  localCheckpoint blocks are
        # reclaimed when the frame is GC'd (same idiom as ewm_chunked).
        # At true corpus scale prefer materialize_grams=False plus an
        # explicitly persisted gram table (the incremental store layout):
        # checkpointing tokens×16 bytes to executor storage is the
        # space/time trade a 100 TB run makes deliberately, not by default.
        if materialize_grams is None:
            materialize_grams = True
        if materialize_grams:
            pos_g = pos_g.localCheckpoint(eager=True)
        n_docs = df.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
        pos_g = _prune_hot_grams(pos_g, max_df_frac, n_docs)
    if keep_first:
        # removal policy: rank occurrences globally per gram; rank 1 is
        # the surviving canonical copy, every later one seeds a cut span
        wg = Window.partitionBy("gh").orderBy("_id", "pos")
        dup = (
            pos_g.withColumn("_rn", F.row_number().over(wg))
            .filter(F.col("_rn") > 1)
            .select("_id", "pos")
        )
    else:
        wg = Window.partitionBy("gh")
        dup = (
            pos_g.withColumn("occ", F.count(F.lit(1)).over(wg))
            .filter(F.col("occ") > 1)
            .select("_id", "pos")
        )
    return _merge_spans(dup, n, id_col)


def _pos_grams(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """``(_id, pos, gh)`` positioned word-``n``-gram hashes, 1-based.

    The token array materializes as a COLUMN before gram construction:
    word_ngrams references its input once per element_at, and Spark does
    not common-subexpression-eliminate inside lambda functions, so an
    inlined split(text) expression would re-tokenize the document ~10n
    times per row (measured 6× slower end-to-end at sf0.1)."""
    from .text import word_ngrams

    return (
        df.select(
            F.col(id_col).alias("_id"), words(F.col(text_col)).alias("_ws")
        )
        .select(
            "_id",
            F.posexplode(word_ngrams(F.col("_ws"), n)).alias("_p0", "_g"),
        )
        .select(
            "_id",
            (F.col("_p0") + 1).alias("pos"),
            F.xxhash64(F.col("_g")).alias("gh"),
        )
    )


def _merge_spans(dup: DataFrame, n: int, id_col: str) -> DataFrame:
    """Maximal-span interval merge of duplicated seed positions
    ``(_id, pos)``: same-length intervals sorted by start merge while
    ``next_start ≤ prev_start + n`` (overlap-or-touch), yielding pairwise
    disjoint, non-adjacent ``(id, span_start, span_end, span_words)``."""
    wo = Window.partitionBy("_id").orderBy("pos")
    flagged = dup.withColumn(
        "_new",
        F.when(F.col("pos") - F.lag("pos").over(wo) > n, 1).otherwise(0),
    ).withColumn(
        "_rid",
        F.sum("_new").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy("_id", "_rid")
        .agg(
            F.min("pos").alias("_s"),
            (F.max("pos") + F.lit(n - 1)).alias("_e"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_s").cast("long").alias("span_start"),
            F.col("_e").cast("long").alias("span_end"),
            (F.col("_e") - F.col("_s") + 1).cast("long").alias("span_words"),
        )
    )


def substring_dedup_against_corpus(
    batch: DataFrame,
    corpus: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float | None = None,
) -> DataFrame:
    """Incremental ExactSubstr: spans of a NEW batch whose ≥ ``n``-word
    passages already exist anywhere in the historical corpus — the
    substring-granular sibling of :func:`dedup_against_corpus`, and the
    shape incremental ingest actually runs at 100 TB (re-running
    corpus-wide span dedup on every ingest does not survive; this touches
    batch grams × the historical gram set only).

    Returns ``(id, span_start, span_end, span_words)`` over batch docs —
    the text a cleaner would cut because the corpus already contains it.
    Batch-internal repeats are NOT flagged here (run
    :func:`substring_dup_spans` ``keep_first=True`` on the batch for
    that); the two compose into the full incremental policy.

    Scale shape: batch positioned grams LEFT SEMI join the corpus's
    distinct gram hashes on the 8-byte key — with the historical gram
    store materialized and bucketed on ``gh`` (the production layout, as
    for the fingerprint table), the history side is exchange-free and the
    per-ingest cost is O(batch positions).  Merge is per-batch-doc, state
    bounded by one document's positions.
    """
    batch_g = _pos_grams(batch, n, id_col, text_col)
    corpus_pos = _pos_grams(corpus, n, id_col, text_col)
    if max_df_frac is not None:
        # the fraction is measured against the HISTORICAL corpus (the big
        # side whose posting lists the guard protects); banned grams stop
        # seeding batch spans.  Materialized for the same dual-consumption
        # reason as substring_dup_spans (df aggregate + distinct).
        corpus_pos = corpus_pos.localCheckpoint(eager=True)
        n_docs = corpus.select(
            F.count_distinct(F.col(id_col)).alias("n_docs")
        )
        corpus_pos = _prune_hot_grams(corpus_pos, max_df_frac, n_docs)
    corpus_g = corpus_pos.select("gh").distinct()
    seeds = batch_g.join(corpus_g, "gh", "left_semi").select("_id", "pos")
    return _merge_spans(seeds, n, id_col)


def substring_dup_stats(
    df: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float | None = None,
) -> DataFrame:
    """Per-document repeated-span mass from :func:`substring_dup_spans`:
    ``(id, n_words, dup_words, dup_frac)`` — the "how much would
    ExactSubstr remove" accounting (cleaned corpus size =
    Σ n_words − dup_words).  ``dup_words`` sums the merged maximal spans,
    which are disjoint by construction, so ``dup_words ≤ n_words``
    always.  Docs with ≥ ``n`` words and no duplicated span report 0;
    shorter docs have no ``n``-grams and drop out (mirrors
    ``duplicate_passage_fraction``)."""
    spans = substring_dup_spans(df, n, id_col, text_col, max_df_frac=max_df_frac)
    base = df.select(
        F.col(id_col),
        F.size(words(F.col(text_col))).alias("n_words"),
    ).filter(F.col("n_words") >= n)
    per = spans.groupBy(id_col).agg(F.sum("span_words").alias("_dw"))
    return base.join(per, id_col, "left").select(
        F.col(id_col),
        F.col("n_words").cast("long").alias("n_words"),
        F.coalesce(F.col("_dw"), F.lit(0)).cast("long").alias("dup_words"),
        (
            F.coalesce(F.col("_dw"), F.lit(0)).cast("double")
            / F.col("n_words")
        ).alias("dup_frac"),
    )


def substring_dedup_clean(
    df: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float | None = None,
) -> DataFrame:
    """The ExactSubstr TRANSFORM: rewrite every document with its
    non-canonical duplicated spans (``substring_dup_spans`` with
    ``keep_first=True``) cut out — the actual cleaned-corpus output of
    Lee et al. 2021, where exactly one copy of every repeated ≥ ``n``-word
    passage survives corpus-wide.

    Returns ``(id, clean_text, n_removed)`` for EVERY input document
    (docs without spans pass through verbatim, ``n_removed = 0``).

    Scale shape: spans aggregate to one tiny per-doc array (few entries —
    spans are maximal and disjoint), joined back on the doc key; the cut
    itself is row-local JVM array work (position filter + exists over the
    span list), so no token-level explode of the corpus and no extra
    shuffle beyond the span pipeline + one doc-keyed join.
    """
    spans = substring_dup_spans(
        df, n, id_col, text_col, keep_first=True, max_df_frac=max_df_frac
    )
    return cut_spans(df, spans, id_col, text_col)


def cut_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rewrite documents with the given ``(id, span_start, span_end)``
    word spans cut out — the shared transform behind
    :func:`substring_dedup_clean` and the streaming ingest sink (which
    computes spans under the incremental policy first).  Spans must be
    pairwise disjoint per doc (what ``_merge_spans`` guarantees).
    Returns ``(id, clean_text, n_removed)`` for every input document."""
    sp = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_sp")
    )
    base = (
        df.select(F.col(id_col), words(F.col(text_col)).alias("_ws"))
        .join(sp, id_col, "left")
    )
    idx = F.transform(
        F.sequence(F.lit(1), F.size(F.col("_ws"))),
        lambda i: F.struct(
            i.alias("i"), F.element_at(F.col("_ws"), i).alias("w")
        ),
    )
    covered = lambda x: F.exists(  # noqa: E731
        F.col("_sp"),
        lambda s: (x["i"] >= s["span_start"]) & (x["i"] <= s["span_end"]),
    )
    kept = F.when(F.col("_sp").isNull(), F.col("_ws")).otherwise(
        F.transform(F.filter(idx, lambda x: ~covered(x)), lambda x: x["w"])
    )
    # NULL text (failed extraction) passes through as NULL, not "" —
    # concat_ws would silently coerce the NULL token array to an empty
    # string and erase the extraction-failure signal downstream filters
    # key on (same contract as exact_dedup's NULL passthrough)
    return base.select(
        F.col(id_col),
        F.when(F.col("_ws").isNull(), F.lit(None).cast("string"))
        .otherwise(F.concat_ws(" ", kept))
        .alias("clean_text"),
        F.when(F.col("_ws").isNull(), F.lit(0))
        .otherwise(F.size(F.col("_ws")) - F.size(kept))
        .cast("long")
        .alias("n_removed"),
    )


def substring_dedup_incremental_policy(
    batch: DataFrame,
    corpus_grams: DataFrame | None,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The FULL incremental ExactSubstr policy for one ingest batch:
    merged spans over the union of

    * grams already present in the historical corpus gram store
      (``corpus_grams``: a ``gh`` column of positioned-gram hashes, as
      produced by :func:`batch_gram_hashes`), and
    * non-canonical batch-internal repeats (keep-first within the batch).

    One copy of every passage survives corpus-wide ACROSS ingests:
    history always wins (its copy already exists), and within the batch
    the globally-first occurrence wins.  ``corpus_grams=None`` (first
    ingest) degrades to pure keep-first.  Single union of two seed
    streams off ONE evaluation pipeline; merge once.
    """
    bg = _pos_grams(batch, n, id_col, text_col)
    wg = Window.partitionBy("gh").orderBy("_id", "pos")
    internal = (
        bg.withColumn("_rn", F.row_number().over(wg))
        .filter(F.col("_rn") > 1)
        .select("_id", "pos")
    )
    if corpus_grams is None:
        seeds = internal
    else:
        in_store = bg.join(
            corpus_grams.select("gh").distinct(), "gh", "left_semi"
        ).select("_id", "pos")
        # a position can be seeded by BOTH rules — dedup before the merge
        seeds = in_store.unionByName(internal).distinct()
    return _merge_spans(seeds, n, id_col)


def batch_gram_hashes(
    df: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct positioned-gram hashes (``gh``) of a batch — the rows an
    incremental ingest appends to its historical gram store after
    processing the batch (the substring-granular fingerprint table)."""
    return _pos_grams(df, n, id_col, text_col).select("gh").distinct()


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    max_df_frac: float | None = 0.5,
) -> DataFrame:
    """Directed near-dup by token-set CONTAINMENT: pairs where either
    doc's distinct-token set is ≥ ``threshold`` inside the other's
    (|A∩B|/|A| — Broder's containment).  This is the asymmetric sibling
    of :func:`ngram_jaccard_pairs`: a 50-word boilerplate block quoted
    inside a 5 000-word page has tiny Jaccard (union is huge) but
    containment ≈ 1, so quote/subset duplication is ONLY visible here.

    Returns ``(ia < ib, cont_a, cont_b)`` where ``cont_a`` = fraction of
    a's tokens inside b, filtered on ``greatest(cont_a, cont_b) ≥ t``.

    No size-ratio prune exists for containment BY DESIGN — the size gap
    is the signal (jaccard's t·|A| ≤ |B| ≤ |A|/t band would drop exactly
    the subset pairs this op hunts).  The quadratic guard is therefore
    the ``max_df_frac`` ubiquitous-token kill alone (anti-join against
    the tiny df > cap set, as ngram_jaccard_pairs): a token in f·N docs
    drives ~(f·N)²/2 candidate pairs at corpus scale, and tokens in half
    the corpus carry no containment signal.  Containment is computed
    over the SURVIVING token sets on both engines (oracle mirrors the
    prune), so results stay exact.
    """
    toks = _doc_tokens(df, id_col, text_col)
    if max_df_frac is not None:
        dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        n_docs = df.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
        dfreq = dfreq.crossJoin(F.broadcast(n_docs))
        toks = toks.join(
            F.broadcast(
                dfreq.filter(
                    F.col("df") > F.col("n_docs") * F.lit(max_df_frac)
                ).select("tok")
            ),
            "tok",
            "left_anti",
        )
    sizes = toks.groupBy("_id").agg(F.count(F.lit(1)).alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("ia"), F.col("b._id").alias("ib"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("_id").alias("ia"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("_id").alias("ib"), F.col("sz").alias("szb"))
    return (
        shared.join(sa, "ia")
        .join(sb, "ib")
        .withColumn("cont_a", F.col("shared").cast("double") / F.col("sza"))
        .withColumn("cont_b", F.col("shared").cast("double") / F.col("szb"))
        .filter(F.greatest(F.col("cont_a"), F.col("cont_b")) >= threshold)
        .select("ia", "ib", "cont_a", "cont_b")
    )


def line_dedup_global(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
) -> DataFrame:
    """Corpus-wide exact LINE dedup (the CCNet/RefinedWeb boilerplate
    pass): every line whose exact content occurs at least ``min_df``
    times across the whole corpus is removed from EVERY document —
    navigation chrome, cookie banners and footer boilerplate repeat
    verbatim across pages, so removing all copies of any repeated line
    is the standard first transform before document-level dedup.
    Reference parity: the reference engine exposes no line-granular
    dedup; this extends its dedup family (SURVEY §2 extension set)
    with the line-granular sibling of :func:`exact_dedup`.

    Returns ``(id, clean_text, n_lines, n_removed)`` for every input
    document.  NULL text passes through as ``(NULL, 0, 0)`` (same
    extraction-failure contract as :func:`cut_spans`); a document whose
    every line is boilerplate rebuilds as ``''``.

    Scale shape: lines are hashed SCAN-SIDE (md5, portable to the
    oracle) and the line text is pruned immediately — the exploded
    stream that shuffles is ``(id, pos, 16-byte hash)`` regardless of
    line length.  One hash-keyed groupBy (map-side partials) finds the
    duplicated hashes; that output is filtered to ``count >= min_df``
    BEFORE the semi-join back, so the build side is only the
    boilerplate set (small — AQE broadcasts it).  Removed positions
    collapse to one tiny per-doc array, and the rebuild is a row-local
    indexed ``F.filter`` over the split array — full document text
    never shuffles unless the per-doc position join falls back from
    broadcast to sort-merge.
    """
    ex = _line_hashes(df, id_col, text_col)
    dup = (
        ex.groupBy("lh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_df)
        .select("lh")
    )
    return _rebuild_without_lines(df, ex, dup, id_col, text_col)


def line_dedup_within_doc(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """INTRA-document exact line dedup, keep-first (the RefinedWeb-style
    self-repetition rewrite): every repeat of a line's exact content
    WITHIN the same document is removed, first occurrence kept — the
    complement of :func:`line_dedup_global`, whose corpus-wide ``min_df``
    policy removes ALL copies of cross-document boilerplate but leaves a
    document that repeats its own paragraph untouched (below ``min_df``)
    or gutted (at it).  The two compose: global pass first, keep-first
    self-dedup second.  Repeated EMPTY lines collapse too (blank-run
    normalization rides along); pre-filter them upstream to preserve
    spacing.

    Same output contract as the global pass: ``(id, clean_text,
    n_lines, n_removed)``, NULL text → ``(NULL, 0, 0)``.

    Scale shape: the exploded stream is the skinny ``(id, pos, 16-byte
    hash)`` of :func:`_line_hashes`, repeat positions come from one
    ``row_number`` window over that skinny stream (keyed by the doc —
    no corpus-wide state at all, so unlike the global pass there is no
    shared build side and the whole job is embarrassingly
    per-document), removed positions collapse to one tiny per-doc
    array, and the rebuild is a row-local indexed filter — full
    document text never shuffles (pinned in tests/test_plans_r9.py).

    The rebuild tail mirrors :func:`_rebuild_without_lines` minus its
    hash-set semi-join rather than calling it: the positions are
    already per-document here, and routing them through the helper's
    ``dup`` join would both recompute the explode subtree and add a
    corpus-wide join keyed on the line hash alone — whose hottest key
    is the empty-line hash (review r9).  Consolidating the two tails
    behind a positions-based core means editing the helper every
    registered line-dedup query runs through, which costs verification
    slots — deferred to that family's next natural rotation."""
    ex = _line_hashes(df, id_col, text_col)
    w = Window.partitionBy("_id", "lh").orderBy("pos")
    removed = (
        ex.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .groupBy("_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("_dp"))
        .withColumnRenamed("_id", id_col)
    )
    lines = F.split(F.col(text_col), "\n")
    base = df.select(F.col(id_col), lines.alias("_ls")).join(
        removed, id_col, "left"
    )
    kept = F.when(F.col("_dp").isNull(), F.col("_ls")).otherwise(
        F.filter(
            F.col("_ls"), lambda x, i: ~F.array_contains(F.col("_dp"), i)
        )
    )
    return base.select(
        F.col(id_col),
        F.when(F.col("_ls").isNull(), F.lit(None).cast("string"))
        .otherwise(F.concat_ws("\n", kept))
        .alias("clean_text"),
        F.coalesce(F.size(F.col("_ls")), F.lit(0))
        .cast("long")
        .alias("n_lines"),
        F.when(F.col("_ls").isNull(), F.lit(0))
        .otherwise(F.size(F.col("_ls")) - F.size(kept))
        .cast("long")
        .alias("n_removed"),
    )


def _line_hashes(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, 16-byte line hash) — the text column is pruned before
    anything shuffles."""
    lines = F.split(F.col(text_col), "\n")
    return df.select(
        F.col(id_col).alias("_id"), F.posexplode(lines).alias("pos", "line")
    ).select("_id", "pos", F.md5(F.col("line")).alias("lh"))


def batch_line_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-line-hash occurrence counts of a batch — the mergeable unit
    the streaming ingest store accumulates (counts add cell-wise, so a
    historical store is just the union of epoch count files re-summed)."""
    return (
        _line_hashes(df, id_col, text_col)
        .groupBy("lh")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def line_dedup_incremental(
    batch: DataFrame,
    store: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
) -> DataFrame:
    """Incremental line dedup for append-only ingest: a line is
    boilerplate when its occurrence count across HISTORY (``store``:
    (lh, c) from :func:`batch_line_counts`) plus this batch reaches
    ``min_df``; every occurrence in the BATCH is removed.  History is
    never rewritten — the same append-only contract as
    :func:`substring_dedup_incremental` (a line that only later turns
    out to repeat keeps its already-landed copies).

    Same scale shape as :func:`line_dedup_global`; the store side is
    pre-aggregated counts, so merging history costs one count-keyed
    groupBy over (history cells + batch cells), never history rows."""
    ex = _line_hashes(batch, id_col, text_col)
    bc = ex.groupBy("lh").agg(F.count(F.lit(1)).alias("c"))
    total = (
        bc
        if store is None
        else bc.unionByName(store).groupBy("lh").agg(F.sum("c").alias("c"))
    )
    dup = total.filter(F.col("c") >= min_df).select("lh")
    return _rebuild_without_lines(batch, ex, dup, id_col, text_col)


def _rebuild_without_lines(
    df: DataFrame,
    ex: DataFrame,
    dup: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Rebuild every document without its positions whose line hash is
    in ``dup``: removed positions collapse to one tiny per-doc array
    (broadcast-joinable), the rebuild is a row-local indexed filter."""
    lines = F.split(F.col(text_col), "\n")
    dup_pos = (
        ex.join(dup, "lh", "left_semi")
        .groupBy("_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("_dp"))
        .withColumnRenamed("_id", id_col)
    )
    base = df.select(F.col(id_col), lines.alias("_ls")).join(
        dup_pos, id_col, "left"
    )
    kept = F.when(F.col("_dp").isNull(), F.col("_ls")).otherwise(
        F.filter(
            F.col("_ls"), lambda x, i: ~F.array_contains(F.col("_dp"), i)
        )
    )
    return base.select(
        F.col(id_col),
        F.when(F.col("_ls").isNull(), F.lit(None).cast("string"))
        .otherwise(F.concat_ws("\n", kept))
        .alias("clean_text"),
        F.coalesce(F.size(F.col("_ls")), F.lit(0))
        .cast("long")
        .alias("n_lines"),
        F.when(F.col("_ls").isNull(), F.lit(0))
        .otherwise(F.size(F.col("_ls")) - F.size(kept))
        .cast("long")
        .alias("n_removed"),
    )


# --------------------------------------------------------------------- #
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — MOSS)
# --------------------------------------------------------------------- #

#: position field width inside the packed winnowing key: gh (31-bit)
#: * 2^20 + (2^20 - pos) stays < 2^51, exact in BIGINT and DOUBLE on
#: both engines.  Caps documents at ~1M k-grams per doc.
WINNOW_POS_SPACE = 1 << 20


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003 — the MOSS
    local fingerprinting scheme): hash every word ``k``-gram, slide a
    window of ``w`` consecutive gram positions, and select each window's
    minimum hash with the RIGHTMOST-position tie rule.  Guarantees every
    shared run of ≥ ``w + k − 1`` words contributes at least one shared
    fingerprint, at ~2/(w+1) sampling density — position-robust local
    dedup where MinHash is global and ExactSubstr is exact-span.
    Complements the dedup family (the reference has no fingerprinting;
    SURVEY §2 extension set).

    Returns distinct ``(id, pos, gh)`` selected fingerprints.  The
    argmin-with-tie is ONE portable integer: ``key = gh·2^20 +
    (2^20 − pos)`` makes ``min(key)`` over the window pick the smallest
    hash and, among equals, the largest position — no struct ordering,
    no arg_min semantics to align across engines.

    Scale shape: gram hashing is row-local (text pruned before anything
    moves); the sliding min is one bounded-frame window per document
    (the per-doc exchange — never global); docs shorter than ``w``
    grams winnow to their single overall minimum (the pos=1 truncated
    window), matching the reference algorithm.

    The ~1M-grams-per-doc packing cap is ENFORCED, not just documented:
    a position at or beyond ``WINNOW_POS_SPACE`` would make the
    ``2^20 − pos`` term non-positive and silently corrupt both the
    window argmin and the decoded ``(pos, gh)`` (ADVICE r7), so such a
    row raises with the offending doc id instead."""
    ws = words(F.col(text_col))
    grams = word_ngrams(F.col("_ws"), k)
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("_id"), ws.alias("_ws"))
        .select("_id", F.posexplode(grams).alias("pos0", "g"))
        .select(
            "_id",
            (F.col("pos0") + 1).alias("pos"),
            word_hash31(F.col("g")).alias("gh"),
        )
    )
    checked_pos = F.when(
        F.col("pos") >= WINNOW_POS_SPACE,
        F.raise_error(
            F.concat(
                F.lit(
                    "winnow_fingerprints: document exceeds the "
                    f"{WINNOW_POS_SPACE - 1}-gram packing cap "
                    "(WINNOW_POS_SPACE) — chunk it first; doc id "
                ),
                F.col("_id").cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.col("pos"))
    key = F.col("gh") * WINNOW_POS_SPACE + (WINNOW_POS_SPACE - checked_pos)
    win = (
        Window.partitionBy("_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    cnt = Window.partitionBy("_id")
    sel = (
        base.withColumn("_k", key)
        .withColumn("_m", F.min("_k").over(win))
        .withColumn("_g", F.count(F.lit(1)).over(cnt))
        # full windows only, except the single truncated window of a
        # short doc (G < w) at pos 1
        .filter(
            (F.col("pos") <= F.col("_g") - (w - 1))
            | ((F.col("_g") < w) & (F.col("pos") == 1))
        )
        .select("_id", "_m")
        .distinct()
    )
    return sel.select(
        F.col("_id").alias(id_col),
        (WINNOW_POS_SPACE - F.col("_m") % WINNOW_POS_SPACE)
        .cast("long")
        .alias("pos"),
        F.floor(F.col("_m") / WINNOW_POS_SPACE).cast("long").alias("gh"),
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs by shared winnowing fingerprints: join
    the fingerprint posting lists on the hash, count distinct shared
    fingerprints per pair, keep pairs sharing ≥ ``min_shared``.

    ``max_df_frac`` prunes fingerprint hashes present in more than that
    fraction of documents before the self-join (the same quadratic
    posting-list guard as :func:`ngram_jaccard_pairs` — a boilerplate
    fingerprint in f·N docs contributes ~(f·N)²/2 pairs and carries no
    signal).  Returns (ia, ib, n_shared), ia < ib."""
    # the fingerprint set feeds the df-frequency branch AND both sides
    # of the self-join — materialize it once (16-byte hashes + id) so
    # the window pipeline under it runs once, not once per branch
    # (materialize.shared_lazy: checkpoint blocks free with the result,
    # no session-lifetime cache entry — ADVICE r7; lazy since r14, the
    # df-frequency branch's first action materializes)
    from .materialize import shared_lazy

    fps = shared_lazy(
        winnow_fingerprints(df, id_col, text_col, k, w)
        .select(F.col(id_col).alias("_fid"), "gh")
        .distinct()
    )
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
    dfreq = fps.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
    ubiquitous = (
        dfreq.crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") > F.col("n_docs") * F.lit(max_df_frac))
        .select("gh")
    )
    pruned = fps.join(F.broadcast(ubiquitous), "gh", "left_anti")
    a = pruned.select(F.col("_fid").alias("ia"), "gh")
    b = pruned.select(F.col("_fid").alias("ib"), "gh")
    return (
        a.join(b, "gh")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# --------------------------------------------------------------------- #
# Incremental MinHash dedup against a historical signature store
# --------------------------------------------------------------------- #


def batch_band_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
) -> DataFrame:
    """(id, band, key) LSH band rows of a batch — the mergeable unit an
    ingest store accumulates for NEAR-dup incremental dedup (the MinHash
    sibling of :func:`batch_line_counts` / the gram store).  Band keys
    are 2-hash structs; the store never holds text or full signatures."""
    return _banded_signatures(df, id_col, text_col, bands).select(
        F.col("_id").alias(id_col), "band", "key"
    )


def minhash_dedup_against_corpus(
    batch: DataFrame,
    store_bands: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
    min_bands: int = 1,
    batch_bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental NEAR-dup dedup for append-only ingest: a batch
    document is flagged when ≥ ``min_bands`` of its LSH bands collide
    with the historical store (:func:`batch_band_keys` rows of every
    earlier epoch), or with a LOWER-id batch sibling (earlier-wins, no
    chaining — the same deterministic contract as the exact/substring
    incrementals; near-dup is not transitive, so chained keep-first
    would be partition-order dependent).

    Returns every batch row with ``n_store_bands`` (distinct colliding
    bands vs history), ``dup_in_batch``, and ``keep``.  Docs with <2
    words have no shingles → no bands → always kept (same dropout as
    :func:`minhash_signatures`, mirrored by the oracle).

    Scale shape: the store side is pre-banded skinny int rows (one
    (band, key-struct) row per doc per band, distinct'd before the
    probe join); the batch joins it on (band, key) — bucket the store
    on the key to make the history side exchange-free.  No stage ever
    touches text after the one scan-side shingle pass.

    ``batch_bands`` optionally supplies the batch's own
    :func:`batch_band_keys` rows (id/band/key schema, id under
    ``id_col``) so a caller that ALREADY materialized them — the ingest
    sink writes them to its store before flagging — doesn't pay the
    shingle+minhash pass twice; when omitted they're derived from the
    text here, byte-identically."""
    if batch_bands is not None:
        bb = batch_bands.select(
            F.col(id_col).alias("_id"), "band", "key"
        )
    else:
        bb = _banded_signatures(batch, id_col, text_col, bands)
    if store_bands is not None:
        skeys = store_bands.select("band", "key").distinct()
        store_hits = (
            bb.join(skeys, ["band", "key"], "left_semi")
            .groupBy("_id")
            .agg(F.count_distinct("band").alias("n_store_bands"))
        )
    else:
        store_hits = bb.select(
            "_id", F.lit(0).cast("bigint").alias("n_store_bands")
        ).limit(0)
    a, b = bb.alias("a").hint("shuffle_hash"), bb.alias("b")
    ip = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("ia"), F.col("b._id").alias("ib"))
        .agg(F.count(F.lit(1)).alias("nb"))
        .filter(F.col("nb") >= min_bands)
        .select(F.col("ib").alias(id_col))
        .distinct()
        .withColumn("_dup_in_batch", F.lit(True))
    )
    out = (
        batch.join(
            store_hits.withColumnRenamed("_id", id_col), id_col, "left"
        )
        .join(ip, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_store_bands"), F.lit(0))
            .cast("long")
            .alias("n_store_bands"),
            F.coalesce(F.col("_dup_in_batch"), F.lit(False)).alias(
                "dup_in_batch"
            ),
        )
    )
    return out.withColumn(
        "keep",
        (F.col("n_store_bands") < min_bands) & ~F.col("dup_in_batch"),
    )


# --------------------------------------------------------------------- #
# Content-defined chunking (CDC) dedup
# --------------------------------------------------------------------- #

#: boundary rule: a word ENDS a chunk when hash(word) % CDC_MOD == 0 —
#: expected chunk length = CDC_MOD words, boundaries move with content.
CDC_MOD = 8


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mod: int = CDC_MOD,
) -> DataFrame:
    """Content-defined chunking at word granularity: chunk boundaries
    fall where the word's content hash satisfies ``h % mod == 0``, so an
    insertion or deletion only perturbs chunks up to the next boundary —
    the property that makes CDC the storage/backup dedup standard
    (fixed-size chunks shift EVERY downstream chunk; compare
    :func:`text.chunk_documents`).

    Returns (id, chunk_id, chunk_text, n_words).  Scale shape: one
    posexplode, one per-doc bounded window (the running boundary count),
    one (doc, chunk) groupBy whose rows are words — the text that
    shuffles is word-level, already the explode's granularity."""
    ws = words(F.col(text_col))
    ex = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.posexplode(ws).alias("pos", "w"))
        .withColumn("_b", (word_hash31(F.col("w")) % mod == 0).cast("int"))
    )
    # chunk id = boundaries strictly BEFORE this word (the boundary word
    # closes its own chunk): running sum of _b over preceding rows
    win = (
        Window.partitionBy("_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ex = ex.withColumn(
        "chunk_id", F.coalesce(F.sum("_b").over(win), F.lit(0)).cast("long")
    )
    return (
        ex.groupBy("_id", "chunk_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
            ).alias("chunk_text"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
        )
        .withColumnRenamed("_id", id_col)
    )


def cdc_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mod: int = CDC_MOD,
) -> DataFrame:
    """Per-document CDC dedup accounting: how many of the document's
    content-defined chunks also occur elsewhere in the corpus (by exact
    chunk-text hash), and the duplicated word mass.  Returns
    (id, n_chunks, n_dup_chunks, dup_words, total_words).

    Scale shape: chunk hashes are 16 bytes scan-side; the corpus-wide
    occurrence count is one hash-keyed groupBy (counts, never posting
    lists — a boilerplate chunk is one cell); the dup set is
    count-filtered BEFORE the broadcast semi-join back."""
    from .materialize import shared_lazy as _mat

    # The chunk stream is referenced THREE times below (occurrence
    # counts, the flagged semi-join's probe side, per-doc totals); an
    # unmaterialized plan replays the posexplode → running-boundary
    # window → (doc, chunk) groupBy pipeline once per branch.
    # Materialize the skinny (id, 16-byte hash, n_words) rows once —
    # LAZILY (ADVICE r13): building the plan must not execute the
    # chunking job; the first consuming action (the `dup` broadcast
    # build) materializes the blocks and the other branches reuse them.
    ch = _mat(
        cdc_chunks(df, id_col, text_col, mod).select(
            id_col, F.md5(F.col("chunk_text")).alias("ch"), "n_words"
        )
    )
    dup = (
        ch.groupBy("ch")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("ch")
    )
    flagged = ch.join(F.broadcast(dup), "ch", "left_semi").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_chunks"),
        F.sum("n_words").alias("dup_words"),
    )
    base = ch.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_words").alias("total_words"),
    )
    return base.join(flagged, id_col, "left").select(
        id_col,
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.coalesce(F.col("n_dup_chunks"), F.lit(0))
        .cast("long")
        .alias("n_dup_chunks"),
        F.coalesce(F.col("dup_words"), F.lit(0)).cast("long").alias("dup_words"),
        F.col("total_words").cast("long").alias("total_words"),
    )


def lsh_dedup_keep_best(
    df: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_col: str = "quality",
) -> DataFrame:
    """Quality-aware canonical selection for near-dup clusters: instead
    of :func:`lsh_dedup_clusters`' min-id rule, keep each connected
    component's HIGHEST-``quality`` member (ties → lowest id) — the
    production refinement (e.g. keep the most-starred file, the
    longest extraction, the highest classifier score) that min-id
    cannot express.  ``quality`` is any (id, quality) table.

    Returns (id, component, cluster_size, quality, is_canonical).
    Scale shape adds exactly one component-keyed argmax (a max_by
    aggregate with map-side partials) to the cluster pipeline — no
    window, no per-cluster sort.

    ``id_col`` must be NUMERIC: the ties-to-lowest-id rule rides
    ``max(struct(q, -id))``, whose negation has no string analogue —
    the same integral-id constraint as the applyInPandas fast paths
    (hash string ids to a long upstream, as
    :func:`~.sampling.cap_per_key` does).  Checked eagerly: Spark's
    implicit string→double cast would otherwise turn ``-id`` into
    silent NULLs (ADVICE r7), so a non-numeric id raises here
    instead."""
    from pyspark.sql.types import NumericType

    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, NumericType):
        raise TypeError(
            f"lsh_dedup_keep_best: id_col {id_col!r} must be numeric for "
            f"the max(struct(q, -id)) tie-break, got {id_type.simpleString()};"
            " hash string ids to a long upstream (e.g. xxhash64)"
        )
    pairs = minhash_lsh_candidates(df, id_col, text_col)
    comp = connected_components(pairs)
    full = (
        df.select(F.col(id_col))
        .join(comp.withColumnRenamed("v", id_col), id_col, "left")
        .select(
            id_col, F.coalesce("component", F.col(id_col)).alias("component")
        )
        .join(quality.select(id_col, quality_col), id_col, "left")
    )
    # argmax via an orderable struct: max quality, ties to LOWEST id
    # (negate the id inside the max, recover after).  NULL quality
    # (e.g. unscoreable NULL-text doc) sorts below every real score via
    # an explicit floor — engine-portable, unlike native NULL ordering.
    q = F.coalesce(F.col(quality_col).cast("double"), F.lit(-1e9))
    best = full.groupBy("component").agg(
        F.max(F.struct(q.alias("q"), (-F.col(id_col)).alias("ni")))[
            "ni"
        ].alias("_nbest"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    return full.join(best, "component").select(
        id_col,
        "component",
        "cluster_size",
        quality_col,
        (F.col(id_col) == -F.col("_nbest")).alias("is_canonical"),
    )
