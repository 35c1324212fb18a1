"""indicators_spark — a PySpark-native analytics engine with the query surface
of GandhiParth/Indicators (technical indicators over long-format time series)
plus large-scale data-pipeline operators (dedup, similarity search, text
analysis, streaming windows).

Everything is DataFrame-API first: operators build Catalyst expressions
(window aggregates, lags, cumulative frames); the only Python-side compute
is the EWM family, which runs as Arrow-batched ``applyInPandas`` scans.
"""

from .core import Indicators
from .session import get_spark
from .utils import validate_columns

__all__ = ["Indicators", "get_spark", "validate_columns"]
