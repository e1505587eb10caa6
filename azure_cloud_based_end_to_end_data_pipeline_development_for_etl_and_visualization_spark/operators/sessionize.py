"""Batch sessionization: assign gap-based session ids to an event stream.

Complements ``streaming/windows.session_agg`` (the ``F.session_window``
aggregate): that one returns per-session rollups; this one labels every
EVENT with its session, which training pipelines need for sequence
construction (group events into model-input episodes).

Formulation: per key, a session starts where the gap since the previous
event exceeds ``gap_seconds``; the session sequence number is the running
sum of session-start flags. Two window passes over the SAME partitioning
and ordering — Spark plans them into a single sort + single shuffle.
At 100 TB: one hash exchange on the key, sort-spill bounded per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_seconds


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
    gap_seconds: float = 1800.0,
    out_col: str = "session_seq",
) -> DataFrame:
    """Add ``out_col``: 1-based session sequence number per ``key_col``.

    ``order_tiebreak`` (e.g. an event id) makes ordering total when
    timestamps can collide — required for deterministic output."""
    order = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    is_start = F.when(
        prev_ts.isNull()
        | (epoch_seconds(F.col(ts_col)) - epoch_seconds(prev_ts) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(is_start).over(running))
