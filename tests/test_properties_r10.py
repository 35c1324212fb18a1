"""Property-based tests (hypothesis) for the round-10 operators: the
prefix-filtered Jaccard family, distributed selection, the grouped rank
kernel, and quantile normalization — each against a brute-force Python
model on random inputs (the fixed-fixture tests pin one trajectory;
these sweep the input space)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from indicators_spark.functions.dedup import (
    jaccard_join_prefix,
    jaccard_prefix_pairs,
)
from indicators_spark.scale import kth_element

_settings = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small word pool → heavy overlap → the candidate machinery is exercised
WORD = st.sampled_from([f"w{i}" for i in range(12)])
DOC = st.lists(WORD, min_size=1, max_size=8).map(lambda ws: " ".join(ws))


def _brute_pairs(docs, threshold, same):
    out = []
    left = docs if same else docs[0]
    right = docs if same else docs[1]
    for i, ta in left:
        sa = set(ta.split())
        for j, tb in right:
            if same and not i < j:
                continue
            sb = set(tb.split())
            jac = len(sa & sb) / len(sa | sb)
            if jac >= threshold:
                out.append((i, j, round(jac, 9)))
    return sorted(out)


@given(
    texts=st.lists(DOC, min_size=2, max_size=10),
    threshold=st.sampled_from([0.34, 0.5, 0.75, 1.0]),
)
@_settings
def test_jaccard_prefix_equals_bruteforce(spark, texts, threshold):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["ia"], r["ib"], round(r["jaccard"], 9))
        for r in jaccard_prefix_pairs(df, threshold=threshold).collect()
    )
    assert got == _brute_pairs(docs, threshold, same=True)


@given(
    lt=st.lists(DOC, min_size=1, max_size=6),
    rt=st.lists(DOC, min_size=1, max_size=6),
    threshold=st.sampled_from([0.34, 0.6, 1.0]),
)
@_settings
def test_jaccard_join_prefix_equals_bruteforce(spark, lt, rt, threshold):
    L = list(enumerate(lt))
    R = [(100 + i, t) for i, t in enumerate(rt)]
    dl = spark.createDataFrame(L, "doc_id long, text string")
    dr = spark.createDataFrame(R, "doc_id long, text string")
    got = sorted(
        (r["ia"], r["ib"], round(r["jaccard"], 9))
        for r in jaccard_join_prefix(dl, dr, threshold=threshold).collect()
    )
    assert got == _brute_pairs((L, R), threshold, same=False)


# Real doubles, not a fixed "nice" pool: arbitrary finite floats land on
# inexact bucket boundaries, which is exactly where the histogram /
# interval-membership desync class of bug lives (r10 ADVICE).  The
# lattice strategy (base + m*step with an inexact step) concentrates
# values AT arithmetic boundaries within a few examples.
FINITE = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9
)


@st.composite
def _value_lists(draw):
    if draw(st.booleans()):
        base = draw(st.floats(min_value=-10.0, max_value=10.0))
        step = draw(st.floats(min_value=0.05, max_value=0.4))
        n = draw(st.integers(1, 25))
        return [base + m * step for m in range(n)]
    return draw(st.lists(FINITE, min_size=1, max_size=25))


@given(vals=_value_lists(), data=st.data())
@_settings
def test_kth_element_equals_sorted(spark, vals, data):
    k = data.draw(st.integers(1, len(vals)))
    buckets = data.draw(st.sampled_from([2, 4]))
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = kth_element(df, "x", k, buckets=buckets, final_rows=2)
    assert got == sorted(vals)[k - 1]


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.sampled_from([1.0, 2.0, 2.0, 3.0, 9.0]),
        ),
        min_size=1,
        max_size=20,
    )
)
@_settings
def test_grouped_row_number_equals_model(spark, rows):
    from indicators_spark.scale import grouped_row_number

    keyed = [(g, i, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(keyed, "g string, k long, v double")
    got = {
        r["k"]: r["rn"]
        for r in grouped_row_number(
            df, ["g"], ["v", "k"], buckets=3, bucket_by="v"
        ).collect()
    }
    want = {}
    for g in {g for g, _, _ in keyed}:
        members = sorted((v, k) for gg, k, v in keyed if gg == g)
        for rank, (_, k) in enumerate(members, start=1):
            want[k] = rank
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), FINITE),
        min_size=1,
        max_size=18,
    ),
    frac=st.sampled_from([0.1, 0.5, 0.9, 1.0]),
    buckets=st.sampled_from([2, 4]),
)
@_settings
def test_kth_by_group_equals_sorted(spark, rows, frac, buckets):
    import math

    from indicators_spark.scale import kth_element_by_group

    df = spark.createDataFrame(rows, "g string, x double")
    got = {
        r["g"]: (r["n"], r["k"], r["value"])
        for r in kth_element_by_group(
            df, "x", "g", frac=frac, buckets=buckets, final_rows=2
        ).collect()
    }
    want = {}
    for g in {g for g, _ in rows}:
        sv = sorted(v for gg, v in rows if gg == g)
        k = max(1, math.ceil(frac * len(sv) - 1e-9))
        want[g] = (len(sv), k, sv[k - 1])
    assert got == want
