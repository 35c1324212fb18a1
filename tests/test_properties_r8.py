"""Property-based tests (hypothesis) for the round-8 operators: the
concat-and-chunk packing layout and the k-center greedy trajectory each
against a brute-force Python model on random inputs — the single-fixture
parity tests pin one trajectory; these sweep the input space."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from indicators_spark.functions.sampling import pack_token_stream
from indicators_spark.functions.similarity import kcenter_select

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---- pack_token_stream vs the concat-and-chunk model ------------------ #

# duplicate-ish word pool; doc token counts 1..12
DOC_TOKENS = st.integers(1, 12)


@given(
    n_tokens=st.lists(DOC_TOKENS, min_size=1, max_size=12),
    seq_len=st.integers(1, 9),
)
@_settings
def test_pack_layout_matches_model(spark, n_tokens, seq_len):
    rows = [Row(doc_id=i, n_tok=n) for i, n in enumerate(n_tokens)]
    df = spark.createDataFrame(rows)
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["start_tok"], r["first_seq"],
            r["last_seq"], r["offset_in_first"],
        )
        for r in pack_token_stream(df, seq_len, token_col="n_tok").collect()
    }
    order = sorted(
        range(len(n_tokens)),
        key=lambda i: (hashlib.md5(f"pack|{i}".encode()).hexdigest(), i),
    )
    want, pos = {}, 0
    for i in order:
        n = n_tokens[i]
        want[i] = (n, pos, pos // seq_len, (pos + n - 1) // seq_len,
                   pos % seq_len)
        pos += n
    assert got == want
    # global invariants: contiguous stream, conservation
    assert sum(n for n, *_ in got.values()) == pos
    starts = sorted(s for _, s, *_ in got.values())
    ends = sorted(s + n for n, s, *_ in got.values())
    assert starts[0] == 0 and ends[-1] == pos


# ---- kcenter_select vs brute-force Gonzalez --------------------------- #

VEC = st.lists(
    st.sampled_from([-1.0, -0.5, 0.0, 0.5, 1.0]), min_size=3, max_size=3
)


@given(vecs=st.lists(VEC, min_size=2, max_size=9), k=st.integers(2, 5))
@_settings
def test_kcenter_matches_model(spark, vecs, k):
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in enumerate(vecs)]
    )
    got = [
        (r["rank"], r["vec_id"], r["radius"])
        for r in kcenter_select(df, k=k).collect()
    ]

    def q4(x):
        return math.floor(x * 1e4 + 0.500000001) / 1e4

    def sqd(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    pool = dict(enumerate(vecs))
    centers = [0]
    want = [(1, 0, None)]
    for t in range(2, k + 1):
        cands = [i for i in pool if i not in centers]
        if not cands:
            break
        best = min(
            ((-(q4(min(sqd(pool[i], pool[c]) for c in centers))), i)
             for i in cands)
        )
        centers.append(best[1])
        want.append((t, best[1], -best[0]))
    assert got == want
    # duplicate vectors must still yield distinct ids, never repeats
    ids = [i for _, i, _ in got]
    assert len(ids) == len(set(ids))
