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
        # case-insensitive probe: Spark resolves withColumn("symbol", ...)
        # against an existing "Symbol" column under the default
        # caseSensitive=false, which would CLOBBER the user's data with
        # the injected literal
        if not any(c.lower() == "symbol" for c in df.columns):
            self._symbol_flag = True
            df = df.withColumn("symbol", F.lit("x"))
        # Pending (unflushed) EWM program: consecutive EWM-based operators
        # fuse into ONE applyInPandas pass / one exchange (see _ewm).
        self._pending: list[Step] = []
        self._pending_keep: list[str] = []
        self._pending_part: tuple[str, ...] | None = None
        self._df = df
        # a bare string satisfies Sequence[str] but tuple() would explode
        # it into characters ("timestamp" -> ('t','i','m',...))
        self._order: tuple[str, ...] = (
            (order_by,) if isinstance(order_by, str) else tuple(order_by)
        )
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

    @property
    def _df(self) -> DataFrame:
        """The wrapped frame, with any pending EWM program applied first.

        Every read path (window ops via ``_with``, validation of Column
        expressions, ``collect``) goes through this getter, so a fused EWM
        program is flushed exactly when — and only when — a non-EWM
        operation actually needs its outputs.
        """
        self._flush_ewm()
        return self.__df

    @_df.setter
    def _df(self, value: DataFrame) -> None:
        # All assignments are of the form `self._df = f(self._df)`, so the
        # getter has already flushed; a non-empty pending program here would
        # mean its steps reference a frame that no longer exists.
        assert not self._pending, "EWM program pending across _df reassignment"
        self.__df = value

    def _flush_ewm(self) -> None:
        if not self._pending:
            return
        steps, keep, part = self._pending, self._pending_keep, self._pending_part
        self._pending, self._pending_keep, self._pending_part = [], [], None
        self.__df = apply_ewm_program(
            self.__df, steps, partition_cols=part, order_cols=self._order, keep=keep
        )

    @property
    def _columns(self) -> list[str]:
        """Visible columns WITHOUT flushing: raw frame + pending EWM outputs.

        Lets a chained operator validate against a predecessor's (still
        pending) outputs without forcing the fused program to split."""
        return self.__df.columns + self._pending_keep

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
        """Queue an EWM program; consecutive calls FUSE into one pass.

        ``ema().macd().trix()`` costs one applyInPandas exchange, not three
        — the programs concatenate (each is self-contained: it reads only
        frame columns and its own earlier outputs, in order).  A flush is
        forced when the partitioning changes (per-symbol vs global) or a
        step's output name collides with one already pending (an overwrite
        would corrupt the earlier op's kept column)."""
        part = self._partition(global_op)
        # Duplicate outputs WITHIN one call (e.g. sma-style duplicate
        # column lists: ema(["close", "close"], 12)) dedupe to the last
        # step, exactly as the window path's dict comprehension does —
        # otherwise the output schema would carry two identical fields and
        # later references fail with AMBIGUOUS_REFERENCE.
        by_out: dict[str, Step] = {}
        for s in steps:
            by_out[s.out] = s
        steps = list(by_out.values())
        pending_outs = {s.out for s in self._pending}
        if self._pending and (
            part != self._pending_part
            or any(s.out in pending_outs for s in steps)
        ):
            self._flush_ewm()
        self._pending_part = part
        self._pending.extend(steps)
        out_names = [s.out for s in steps]
        keep_names = out_names if keep is None else list(dict.fromkeys(keep))
        self._pending_keep.extend(keep_names)

    def _resolve_and_validate(self, columns) -> list[str]:
        """Resolve a list of names / Column expressions to concrete names
        (reference ``_get_column_names``, indicators.py:65-76) and validate
        they exist (utils.py:4-8)."""
        if isinstance(columns, str):
            cols = [columns]
        elif isinstance(columns, (list, tuple)):
            if columns and not isinstance(columns[0], str):
                cols = self._probe_df().select(*columns).columns  # schema-only
            else:
                cols = list(columns)
        else:  # a single Column expression / selector
            cols = self._probe_df().select(columns).columns
        validate_columns(cols, self._columns)
        return cols

    def _probe_df(self) -> DataFrame:
        """Name-resolution frame that does NOT flush the pending EWM
        program: the raw frame plus a null stand-in for each pending
        output, so a Column expression referencing a predecessor's
        (still-fused) output resolves without splitting the fusion into an
        extra applyInPandas pass."""
        probe = self.__df
        missing = [n for n in self._pending_keep if n not in probe.columns]
        if missing:
            probe = probe.withColumns(
                {n: F.lit(None).cast("double") for n in missing}
            )
        return probe

    def _validate(self, required: list[str]) -> None:
        validate_columns(required, self._columns)
