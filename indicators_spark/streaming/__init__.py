"""Structured Streaming surface: event-time windowed aggregation with
watermarks, sessionization, and stateful custom operators."""

from .windows import (
    sessionized_counts_stream,
    stateful_running_indicators,
    tumbling_counts_stream,
)

__all__ = [
    "tumbling_counts_stream",
    "sessionized_counts_stream",
    "stateful_running_indicators",
]
