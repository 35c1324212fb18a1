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
