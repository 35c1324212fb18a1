"""Table loaders for the driver-generated test data (TESTDATA.md)."""

from .prices import (
    PRICES_SQL_EVENTS,
    PRICES_SQL_LINEITEM,
    load_table,
    prices_from_events,
    prices_from_lineitem,
)

__all__ = [
    "PRICES_SQL_EVENTS",
    "PRICES_SQL_LINEITEM",
    "load_table",
    "prices_from_events",
    "prices_from_lineitem",
]
