"""Timestamp-type-agnostic helpers.

The driver's parquet has shipped ``ts`` as TIMESTAMP(NANOS) (read via
``nanosAsLong`` as bigint), TIMESTAMP_LTZ, and — since the round-4 data
regeneration — TIMESTAMP_NTZ (``timestamp[us]`` with no timezone, which
Spark 4 infers as NTZ by default). A bare ``.cast("double")`` on a
timestamp column works for LTZ but is an AnalysisException for NTZ, so
every operator that does epoch arithmetic goes through this helper.

Scale note: both branches are pure codegen'd casts — no UDF, no shuffle,
and Catalyst still pushes filters over them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Fractional seconds since the epoch for TIMESTAMP or TIMESTAMP_NTZ.

    NTZ values are interpreted in the session timezone (the engine pins
    UTC — session.py/get_spark and catalog._events both set it), so naive
    timestamps read as UTC wall-clock, matching the DuckDB oracle's naive
    semantics. LTZ values pass through the first cast unchanged.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ltz").cast("double")
