"""Driver-adapter contract tests (no SparkSession needed).

The driver verifies ``queries()`` in dict order under a ~50-query/round
budget and has no rows-only mode, so the adapter must (a) expose only
oracle-bearing queries, (b) order never-green queries first in
registration order, and (c) keep ``queries()`` / ``oracle_sql()`` keys
identical.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _adapter():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_adapter", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("spark_entry_adapter", mod)
    spec.loader.exec_module(mod)
    return mod


def test_no_oracle_less_entries_exposed():
    mod = _adapter()
    from indicators_spark.queries import QUERIES

    names = mod._ordered_names()
    assert names, "empty driver catalog"
    for n in names:
        assert QUERIES[n].sql is not None, f"{n} would err no_oracle"
    # the sql=None operators stay registered locally (parity test covers
    # them rows-only) but never reach the driver
    local_only = {n for n in QUERIES if QUERIES[n].sql is None}
    assert local_only == {"text_compression_ratio", "stats_hll_rollup"}
    assert not local_only & set(names)


def test_queries_and_oracle_sql_keys_identical():
    mod = _adapter()
    q = mod.queries()
    o = mod.oracle_sql()
    assert list(q) == list(o)
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_ordering_never_green_first_registration_order():
    mod = _adapter()
    from indicators_spark.queries import QUERIES

    eligible = [n for n in QUERIES if QUERIES[n].sql is not None]
    # fake green set: every other eligible query
    fake_green = set(eligible[::2])
    names = mod._ordered_names(green=fake_green)
    assert set(names) == set(eligible)
    n_never = len(eligible) - len(fake_green)
    never, green = names[:n_never], names[n_never:]
    assert all(n not in fake_green for n in never)
    assert all(n in fake_green for n in green)
    idx = {n: i for i, n in enumerate(QUERIES)}
    assert [idx[n] for n in never] == sorted(idx[n] for n in never)
    assert [idx[n] for n in green] == sorted(idx[n] for n in green)


def test_real_ordering_prioritizes_backlog():
    """With the real CORRECTNESS history, the never-green backlog (round-3
    additions) must occupy the head of the catalog."""
    mod = _adapter()
    green = mod._evidenced()
    names = mod._ordered_names()
    k = sum(1 for n in names if n not in green)
    assert all(n not in green for n in names[:k])
    assert all(n in green for n in names[k:])
