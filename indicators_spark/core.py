"""The ``Indicators`` fluent API — PySpark-native re-expression of the
reference engine (GandhiParth/Indicators, ``indicators.py:8-63``).

The reference wraps a Polars LazyFrame; here the same surface wraps a
``pyspark.sql.DataFrame`` (also lazy — Catalyst plays the role of the
Polars optimizer).  Every operator appends window/aggregate *expressions*
to the logical plan; nothing executes until the caller takes an action.

Design decisions vs the reference (SURVEY.md §1/§3):

* ``symbol`` injection: if absent, a literal ``"x"`` is added (reference
  indicators.py:25-27) and dropped again by :meth:`collect` — but, unlike
  the reference, :meth:`collect` here does NOT mutate the wrapped frame
  (SURVEY.md §2c.6 notes the reference's second-collect quirk).
* No global sort at construction (reference indicators.py:28): ordering is
  carried by every window spec's ``orderBy`` instead, so Spark never pays a
  full-shuffle sort for a property the windows already guarantee.  An
  optional ``order_by`` lets callers add tie-breaker columns for
  deterministic results on duplicate timestamps.
* ``partition_mode``:
    - ``"faithful"`` (default) replicates the reference's irregular mix of
      per-symbol and global (un-partitioned) computations exactly
      (SURVEY.md §2c.3).
    - ``"per_symbol"`` computes *every* operator per symbol — the scalable
      mode: all windows hash-partition on ``symbol`` and parallelize.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, WindowSpec
from pyspark.sql import functions as F

from . import kernels as K
from .ewm import Step, apply_ewm_program
from .operators.momentum import MomentumOps
from .operators.nulls import NullOps
from .operators.returns import ReturnsOps
from .operators.trend import TrendExtOps, TrendOps
from .operators.volatility import VolatilityExtOps, VolatilityOps
from .operators.volume import VolumeOps
from .utils import validate_columns


class Indicators(
    TrendOps,
    TrendExtOps,
    MomentumOps,
    VolatilityOps,
    VolatilityExtOps,
    VolumeOps,
    ReturnsOps,
    NullOps,
):
    """Fluent indicator engine over a Spark DataFrame.

    >>> ind = Indicators(df).sma(["close"], 20).rsi(["close"], 14)
    >>> result = ind.collect()          # a DataFrame — caller picks the action
    """

    def __init__(
        self,
        df: DataFrame,
        order_by: Sequence[str] = ("timestamp",),
        partition_mode: str = "faithful",
    ) -> None:
        if partition_mode not in ("faithful", "per_symbol"):
            raise ValueError(f"unknown partition_mode: {partition_mode!r}")
        self._symbol_flag = False
        if "symbol" not in df.columns:
            self._symbol_flag = True
            df = df.withColumn("symbol", F.lit("x"))
        self._df = df
        self._order: tuple[str, ...] = tuple(order_by)
        self._mode = partition_mode
        validate_columns(list(self._order), df.columns)

    # ------------------------------------------------------------------ #
    # lifecycle (reference indicators.py:30-76)
    # ------------------------------------------------------------------ #

    def collect(self) -> DataFrame:
        """Return the result DataFrame (injected ``symbol`` dropped).

        Unlike the reference (indicators.py:37-38) this does not mutate the
        wrapped frame, so repeated collects behave identically.  The caller
        decides the terminal action (``.collect()``/``.toPandas()``/write).
        """
        return self._df.drop("symbol") if self._symbol_flag else self._df

    def show_graph(self, optimized: bool = True) -> None:
        """Render the logical/physical plan (reference ``show_graph``)."""
        df = self.collect()
        df.explain(mode="formatted" if optimized else "extended")

    def get_dataframe(self) -> DataFrame:
        """Escape hatch to the raw wrapped DataFrame (incl. injected symbol)."""
        return self._df

    # Polars-named alias for drop-in familiarity.
    get_lazyframe = get_dataframe

    # ------------------------------------------------------------------ #
    # internals shared by the operator mixins
    # ------------------------------------------------------------------ #

    def _partition(self, global_op: bool) -> tuple[str, ...]:
        """Partition keys for an operator: global ops lose the symbol key in
        faithful mode; per_symbol mode partitions everything."""
        if global_op and self._mode == "faithful":
            return ()
        return ("symbol",)

    def _w(self, n: int, global_op: bool) -> WindowSpec:
        return K.w_rows(n, self._partition(global_op), self._order)

    def _wcum(self, global_op: bool) -> WindowSpec:
        return K.w_cum(self._partition(global_op), self._order)

    def _word(self, global_op: bool) -> WindowSpec:
        return K.w_ord(self._partition(global_op), self._order)

    def _with(self, cols: dict) -> None:
        self._df = self._df.withColumns(cols)

    def _drop(self, *names: str) -> None:
        self._df = self._df.drop(*names)

    def _ewm(
        self, steps: Sequence[Step], global_op: bool, keep: Sequence[str] | None = None
    ) -> None:
        self._df = apply_ewm_program(
            self._df,
            steps,
            partition_cols=self._partition(global_op),
            order_cols=self._order,
            keep=keep,
        )

    def _resolve_and_validate(self, columns) -> list[str]:
        """Resolve a list of names / Column expressions to concrete names
        (reference ``_get_column_names``, indicators.py:65-76) and validate
        they exist (utils.py:4-8)."""
        if isinstance(columns, str):
            cols = [columns]
        elif isinstance(columns, (list, tuple)):
            if columns and not isinstance(columns[0], str):
                cols = self._df.select(*columns).columns  # schema-only, no job
            else:
                cols = list(columns)
        else:  # a single Column expression / selector
            cols = self._df.select(columns).columns
        validate_columns(cols, self._df.columns)
        return cols

    def _validate(self, required: list[str]) -> None:
        validate_columns(required, self._df.columns)
