"""Custom connector via Spark 4's Python DataSource V2 API — the shape a
bespoke feed (internal tick service, proprietary archive, queue snapshot)
plugs into this engine without JVM code.

``TicksDataSource`` is a deterministic synthetic tick generator:

* **partition-parallel**: the row range splits into ``partitions`` input
  partitions; each executor materializes only its slice (``read`` is a
  generator — nothing buffers), so generation scales linearly with
  cores exactly like a parquet scan scales with splits;
* **pure integer arithmetic** (Knuth multiplicative hashing, no RNG
  state, no transcendentals) — every engine reproduces the identical
  rows, which is what lets the catalog query over this source carry a
  full DuckDB value-hash oracle (the oracle replays the formula over
  ``range()``);
* **filter pushdown**: ``pushFilters`` accepts ``symbol = 'Sk'``
  equality predicates and drops non-matching rows inside the generator —
  at the source, before anything reaches Spark (the V2 contract a real
  connector uses to turn a WHERE clause into an API parameter).

A production connector swaps the formula for I/O and keeps EVERYTHING
else: the partitioning contract, the lazy generator, the pushdown hook.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)

KNUTH = 2654435761  # 2^32 · golden-ratio conjugate (Knuth multiplicative hash)


def tick_row(seq: int, n_symbols: int) -> tuple[str, int, float, int]:
    """The shared row formula (integer-exact; replayed by the SQL oracle)."""
    return (
        f"S{seq % n_symbols}",
        seq,
        ((seq * KNUTH) % 100000) / 100.0,
        (seq * 40503) % 1000 + 1,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class TicksReader(DataSourceReader):
    def __init__(self, options):
        self.rows = max(0, int(options.get("rows", 10000)))
        self.n_symbols = int(options.get("symbols", 8))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        #: Accepted symbol-equality predicates.  The pushed filter list is
        #: a CONJUNCTION (PySpark: "the list of filters should be
        #: interpreted as the AND of the elements"), so multiple EqualTo
        #: values must ALL hold — two different ones ⇒ no row qualifies.
        self.eq_symbols: list[str] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("symbol",):
                self.eq_symbols.append(str(f.value))
            else:
                yield f  # not handled here — Spark keeps this predicate

    def partitions(self) -> Sequence[InputPartition]:
        if self.rows == 0:
            return [_RangePartition(0, 0)]
        step = -(-self.rows // self.n_parts)
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition):
        for seq in range(partition.start, partition.end):
            row = tick_row(seq, self.n_symbols)
            if self.eq_symbols and any(row[0] != v for v in self.eq_symbols):
                continue
            yield row


class TicksDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks"

    def schema(self) -> str:
        return "symbol string, seq bigint, close double, volume bigint"

    def reader(self, schema) -> TicksReader:
        return TicksReader(self.options)

    def simpleStreamReader(self, schema):
        return TicksStreamReader(self.options)


def register_ticks_source(spark) -> None:
    """Idempotent registration (re-registering overwrites, which is fine).
    Python-source filter pushdown is conf-gated (off by default in 4.1);
    implementing ``pushFilters`` without the conf is an analysis error,
    so registration enables it."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TicksDataSource)


class TicksStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same tick formula: offsets are row
    sequence numbers, each poll emits the next ``batch_rows`` ticks —
    the replayable-offset contract (``readBetweenOffsets`` re-derives any
    committed range bit-for-bit, so exactly-once sinks can replay a lost
    epoch).  ``SimpleDataSourceStreamReader`` trades partition-parallel
    reads for a driver-side generator — right for prototype feeds; a
    production queue source implements the partitioned
    ``DataSourceStreamReader`` with per-partition offsets instead, and
    everything downstream (watermarks, sinks, parity tests) is
    unchanged."""

    def __init__(self, options):
        self.n_symbols = int(options.get("symbols", 8))
        # same clamps as the batch TicksReader: batchRows <= 0 would make
        # read() return an empty batch with an UNCHANGED offset forever (a
        # silently stalled stream), and a negative value would move the
        # checkpointed offset BACKWARD — both violate offset monotonicity
        self.batch_rows = max(1, int(options.get("batchRows", 1000)))
        self.max_rows = max(0, int(options.get("maxRows", 10000)))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict):
        lo = start["seq"]
        hi = min(lo + self.batch_rows, self.max_rows)
        return (
            iter([tick_row(s, self.n_symbols) for s in range(lo, hi)]),
            {"seq": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [tick_row(s, self.n_symbols) for s in range(start["seq"], end["seq"])]
        )


