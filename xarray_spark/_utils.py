"""Shared expression helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TEMPORAL = (T.TimestampType, T.DateType)
try:  # Spark ≥3.4
    _TEMPORAL = _TEMPORAL + (T.TimestampNTZType,)
except AttributeError:  # pragma: no cover
    pass


def to_double(col: Column, dtype: T.DataType) -> Column:
    """Numeric view of a column for distance/interpolation arithmetic.

    Timestamps (incl. TIMESTAMP_NTZ, which Spark 4 refuses to cast to
    double directly) go through a cast to session-TZ timestamp first →
    epoch seconds with fractional part.
    """
    if isinstance(dtype, _TEMPORAL):
        return col.cast("timestamp").cast("double")
    return col.cast("double")


def is_temporal(dtype: T.DataType) -> bool:
    return isinstance(dtype, _TEMPORAL)
