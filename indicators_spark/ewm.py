"""Exponentially-weighted moving averages — the one reference primitive with
no native Spark window equivalent.

The reference uses two distinct flavors (SURVEY.md §2c.2):

* ``ewm_mean(alpha=2/(span+1), adjust=False)`` — the ``ema()`` family
  (reference indicators.py:175-179): the recurrence
  ``y_t = (1-a)*y_{t-1} + a*x_t`` with ``y_0 = x_0``.
* ``ewm_mean(span=s)`` with Polars defaults (``adjust=True``) — used by
  ``mass_index`` / ``keltner_channel`` / ``true_strength_index`` / ``stc``
  (e.g. indicators.py:885): ``y_t = num_t / den_t`` with
  ``num_t = x_t + (1-a)*num_{t-1}``, ``den_t = 1 + (1-a)*den_{t-1}``.

Both are linear first-order recurrences — an inherently sequential scan per
partition key.  Physical strategy: one Arrow-batched ``applyInPandas`` pass
per operator, keyed on the partition columns, executing a short *program* of
steps (EWM scans + vectorized arithmetic) inside a single shuffle.  Chained
EWMs (macd signal line, trix's triple EMA, tsi's double smoothing) therefore
cost exactly one exchange, not one per smoothing stage.

Scale notes:
* Per-symbol EWMs parallelize across symbols (the common case at 100 TB —
  millions of keys, each small).
* The reference's *global* EWMs (mass_index/keltner/tsi have no ``.over``)
  are a single sequential scan by definition.  For huge single series the
  chunk-scan formulation applies: EWM is a linear recurrence, composable
  across chunks by carrying ``(prod(1-a), partial)`` pairs — see
  ``scale.py`` for the two-pass variant.  Correctness path here keeps the
  single-group scan (matches the reference's own semantics).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: A step is either an EWM scan or a vectorized pandas expression.
#: ``EwmStep`` may read columns produced by earlier steps.


@dataclass(frozen=True)
class EwmStep:
    """One EWM scan: ``out = ewm(src)`` with either alpha or span."""

    src: str
    out: str
    alpha: float | None = None
    span: float | None = None
    adjust: bool = False


@dataclass(frozen=True)
class ExprStep:
    """One vectorized arithmetic step: ``out = fn(pdf)`` (a pandas Series)."""

    out: str
    fn: Callable[[pd.DataFrame], pd.Series]


Step = EwmStep | ExprStep

_GROUP_KEY = "__ewm_grp"


def apply_ewm_program(
    df: DataFrame,
    steps: Sequence[Step],
    partition_cols: Sequence[str] = ("symbol",),
    order_cols: Sequence[str] = ("timestamp",),
    keep: Sequence[str] | None = None,
) -> DataFrame:
    """Run a program of EWM/arithmetic steps per partition group.

    Returns ``df`` plus one DoubleType column per step (minus any step
    outputs not listed in ``keep`` when ``keep`` is given).  One shuffle
    total, regardless of how many EWM stages the program chains.
    """
    steps = list(steps)
    out_names = [s.out for s in steps]
    kept = list(out_names if keep is None else keep)

    # A KEPT output name colliding with an existing column REPLACES it
    # (the with_columns semantics every window-based operator has) —
    # without this, re-running an op produced duplicate column names and
    # every later reference failed with AMBIGUOUS_REFERENCE.
    in_fields = [f for f in df.schema.fields if f.name not in set(kept)]
    out_schema = T.StructType(
        in_fields + [T.StructField(n, T.DoubleType(), True) for n in kept]
    )
    order = list(order_cols)
    in_cols = [f.name for f in in_fields]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # nulls FIRST: matches the Spark window path (orderBy default) and
        # the Polars reference, so an EWM stage and a window stage of the
        # same chain see the same row order (pandas defaults to nulls last)
        pdf = pdf.sort_values(order, kind="mergesort", na_position="first")
        # Steps write into a shallow working copy: a DROPPED intermediate
        # whose name collides with an input column must not leak EWM
        # doubles into that column — the output takes input columns from
        # the untouched frame and only the kept outputs from the work copy.
        work = pdf.copy(deep=False)
        for s in steps:
            if isinstance(s, EwmStep):
                src = work[s.src].astype("float64")
                if s.alpha is not None:
                    ew = src.ewm(alpha=s.alpha, adjust=s.adjust)
                else:
                    ew = src.ewm(span=s.span, adjust=s.adjust)
                work[s.out] = ew.mean()
            else:
                work[s.out] = s.fn(work)
        out = pdf[in_cols].copy(deep=False)
        for n in kept:
            out[n] = work[n]
        return out

    if partition_cols:
        grouped = df.groupBy(*partition_cols)
        result = grouped.applyInPandas(run, out_schema)
    else:
        # Global (un-partitioned) EWM — the reference's no-`.over` ops.
        # Single group: sequential by definition; see module docstring.
        # The injected key never clobbers a user column of the same name.
        gk = _GROUP_KEY
        while gk in df.columns:
            gk += "_"
        tmp = df.withColumn(gk, F.lit(1))

        def run_drop(pdf: pd.DataFrame) -> pd.DataFrame:
            return run(pdf.drop(columns=[gk]))

        result = tmp.groupBy(gk).applyInPandas(run_drop, out_schema)

    return result


def ema_alpha(src: str, out: str, span: float) -> EwmStep:
    """The ``ema()`` flavor: alpha = 2/(span+1), adjust=False (indicators.py:175)."""
    return EwmStep(src=src, out=out, alpha=2.0 / (span + 1.0), adjust=False)


def ewm_span(src: str, out: str, span: float) -> EwmStep:
    """The Polars-default flavor: span-weighted, adjust=True (indicators.py:885)."""
    return EwmStep(src=src, out=out, span=span, adjust=True)
