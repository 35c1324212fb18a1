"""Property-based tests (hypothesis) for the round-7 corpus operators:
line dedup vs a brute-force Python model, water-filling invariants, and
count-min sketch guarantees on random inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from indicators_spark.functions import sketches
from indicators_spark.functions.dedup import line_dedup_global
from indicators_spark.functions.sampling import token_budget_waterfill

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small alphabet so duplicate lines actually occur
LINE = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=3
).map(" ".join)
DOC = st.lists(LINE, min_size=1, max_size=6).map("\n".join)


@given(docs=st.lists(DOC, min_size=1, max_size=8), min_df=st.integers(2, 3))
@_settings
def test_line_dedup_matches_python_model(spark, docs, min_df):
    from collections import Counter

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.clean_text, r.n_lines, r.n_removed)
        for r in line_dedup_global(df, min_df=min_df).collect()
    }
    counts = Counter(ln for d in docs for ln in d.split("\n"))
    for i, d in enumerate(docs):
        lines = d.split("\n")
        kept = [ln for ln in lines if counts[ln] < min_df]
        want = ("\n".join(kept), len(lines), len(lines) - len(kept))
        assert got[i] == want, (i, got[i], want)


@given(
    supplies=st.lists(
        st.floats(min_value=1.0, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    weights=st.data(),
    frac=st.floats(min_value=0.05, max_value=2.0),
)
@_settings
def test_waterfill_invariants(spark, supplies, weights, frac):
    ws = weights.draw(
        st.lists(
            st.floats(min_value=0.1, max_value=10.0, allow_nan=False),
            min_size=len(supplies),
            max_size=len(supplies),
        )
    )
    budget = frac * sum(supplies)
    df = spark.createDataFrame(
        [(f"s{i}", t, w) for i, (t, w) in enumerate(zip(supplies, ws))],
        "source string, supply double, w double",
    )
    out = token_budget_waterfill(df, budget=budget).collect()
    # never allocate more than a source has
    assert all(r.alloc <= r.supply + 1e-6 for r in out)
    # allocations sum to min(budget, total supply) within quantization
    total = sum(r.alloc for r in out)
    want = min(budget, sum(supplies))
    assert abs(total - want) <= 1e-3 * max(want, 1.0) + 1e-3 * len(out), (
        total,
        want,
        out,
    )
    # capped sources take everything; uncapped ones stay under cap
    for r in out:
        if r.capped:
            assert abs(r.alloc - r.supply) < 1e-6
            assert r.sample_rate == 1.0
        else:
            assert r.alloc < r.supply + 1e-6
            assert 0.0 <= r.sample_rate <= 1.0001


@given(
    words=st.lists(
        st.sampled_from([f"w{i}" for i in range(30)]),
        min_size=1,
        max_size=120,
    )
)
@_settings
def test_cms_never_undercounts_random_streams(spark, words):
    from collections import Counter

    df = spark.createDataFrame([(w,) for w in words], "v string")
    out = sketches.cms_topk(df, "v", k=50).collect()
    true = Counter(words)
    assert {r.token for r in out} <= set(true)
    for r in out:
        assert r.true_cnt == true[r.token]
        assert r.est >= r.true_cnt


VEC = st.lists(
    st.floats(min_value=-4.0, max_value=4.0, allow_nan=False, width=64),
    min_size=3,
    max_size=3,
)


@given(vecs=st.lists(VEC, min_size=4, max_size=9), lam=st.sampled_from([0.3, 0.7]))
@_settings
def test_mmr_matches_python_greedy(spark, vecs, lam):
    """The whole greedy trajectory matches a literal Python MMR with the
    same left-to-right IEEE arithmetic and the same (score desc, id)
    tie-break."""
    import math

    from hypothesis import assume

    from indicators_spark.functions.similarity import mmr_rerank

    # non-degenerate norms so cosine is defined
    assume(all(any(abs(x) > 1e-6 for x in v) for v in vecs))
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    k, c = 3, 6

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    def cos(a, b):
        return dot(a, b) / (norm(a) * norm(b))

    q = vecs[0]
    rel = sorted(
        ((cos(q, v), i) for i, v in enumerate(vecs) if i != 0),
        key=lambda t: (-t[0], t[1]),
    )[:c]
    relmap = dict((i, r) for r, i in rel)
    sel = [min(relmap, key=lambda i: (-relmap[i], i))]
    want = {(0, 1): sel[0]}
    for t in range(2, k + 1):
        best = None
        for i in relmap:
            if i in sel:
                continue
            ms = max(cos(vecs[i], vecs[j]) for j in sel)
            sc = lam * relmap[i] - (1.0 - lam) * ms
            key = (-sc, i)
            if best is None or key < best[0]:
                best = (key, i)
        sel.append(best[1])
        want[(0, t)] = best[1]

    got = {
        (r.qid, r.mmr_rank): r.nid
        for r in mmr_rerank(
            df,
            df.filter("vec_id = 0"),
            k=k,
            n_candidates=c,
            lam=lam,
        ).collect()
    }
    assert got == want, (got, want)


@given(docs=st.lists(
    st.lists(st.sampled_from([f"t{i}" for i in range(12)]),
             min_size=1, max_size=25).map(" ".join),
    min_size=1, max_size=6,
))
@_settings
def test_cdc_matches_python_model(spark, docs):
    """Chunk boundaries and per-doc dedup accounting match a literal
    Python model of the hash-boundary rule."""
    import hashlib
    from collections import Counter

    from indicators_spark.functions.dedup import CDC_MOD, cdc_dedup_stats

    def h31(w: str) -> int:
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % 2147483647

    def chunks(words: list[str]) -> list[str]:
        out, cur = [], []
        for w in words:
            cur.append(w)
            if h31(w) % CDC_MOD == 0:
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        return out

    per_doc = [chunks(d.split(" ")) for d in docs]
    counts = Counter(c for cs in per_doc for c in cs)
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in cdc_dedup_stats(df).collect()}
    for i, cs in enumerate(per_doc):
        dup = [c for c in cs if counts[c] >= 2]
        r = got[i]
        assert r.n_chunks == len(cs), (i, cs)
        assert r.n_dup_chunks == len(dup)
        assert r.dup_words == sum(len(c.split(" ")) for c in dup)
        assert r.total_words == len(docs[i].split(" "))
