"""Structured Streaming surface: event-time windowed aggregation with
watermarks, sessionization, stateful custom operators, and exactly-once
``foreachBatch`` sinks."""

from .sinks import (
    ExactlyOnceParquetSink,
    LineDedupIngestSink,
    MinHashDedupIngestSink,
    MixturePlanSink,
    SubstringDedupIngestSink,
    UpsertParquetSink,
)
from .windows import (
    dedup_stream_against_corpus,
    enrich_stream,
    interval_join_stream,
    sessionized_counts_stream,
    stateful_running_indicators,
    stateful_running_indicators_tws,
    tumbling_counts_stream,
)

__all__ = [
    "tumbling_counts_stream",
    "dedup_stream_against_corpus",
    "enrich_stream",
    "sessionized_counts_stream",
    "interval_join_stream",
    "stateful_running_indicators",
    "stateful_running_indicators_tws",
    "ExactlyOnceParquetSink",
    "LineDedupIngestSink",
    "MinHashDedupIngestSink",
    "MixturePlanSink",
    "SubstringDedupIngestSink",
    "UpsertParquetSink",
]
