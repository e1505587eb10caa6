"""Stream-stream interval join with watermark-bounded state.

The batch twin is ``operators/range_join`` (bucketized); in streaming,
Spark's native stream-stream join already IS the scale path: both sides
are hash-partitioned on the equality key, and the watermark + time-range
condition lets the state store evict rows once they can no longer match —
state is bounded by (watermark horizon x arrival rate), not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay_seconds: int,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Join streaming ``left`` and ``right`` on ``key`` where
    ``left.ts <= right.ts <= left.ts + max_delay_seconds``. Both sides
    must be streaming DataFrames; output is append-mode joinable."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"interval {max_delay_seconds} seconds"))
    )
    return l.join(r, cond, "inner")
