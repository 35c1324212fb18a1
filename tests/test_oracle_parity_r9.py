"""r10-PREPARED queries: full driver-style compare pinned locally one
round before registration (the kcenter/pack_token_stream recipe from r8
— tests/test_kcenter.py / test_packing.py — that made both green
first-try in r9)."""

from __future__ import annotations

import pandas as pd

from indicators_spark.queries_r9 import (
    _COMPRESS_AUDIT_SQL,
    _compress_audit_spark,
)
from indicators_spark.testing import compare_frames, duck_connect

from conftest import SF_SMOKE


def test_compress_audit_matches_oracle(spark):
    """The compression audit's one-row verdict hash-matches the DuckDB
    expectation at sf0.001 AND the verdicts are all True (the bands sit
    ≥5× from the measured ratios, so a flip means the UDF broke)."""
    got = _compress_audit_spark(spark, SF_SMOKE)
    row = got.collect()[0]
    assert row["repeat_ok"] and row["hex_ok"] and row["doubled_lt_hex"]
    assert row["n_docs"] > 0

    con = duck_connect(SF_SMOKE)
    want: pd.DataFrame = con.execute(_COMPRESS_AUDIT_SQL).fetchdf()
    res = compare_frames("audit_compression_ratio", got.toPandas(), want)
    con.close()
    assert res.ok, str(res)
