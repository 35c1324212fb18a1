"""Small pure-Python helpers (reference ``utils.py``)."""

from __future__ import annotations


def validate_columns(required_columns: list[str], available_columns: list[str]) -> None:
    """Raise ``ValueError`` listing any missing columns (reference utils.py:4-8)."""
    missing = [c for c in required_columns if c not in available_columns]
    if missing:
        raise ValueError(f"Missing required columns: {missing}")
