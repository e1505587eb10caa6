"""Event-time windowed aggregation: tumbling / sliding / session windows,
usable identically over batch DataFrames and streaming DataFrames.

The reference has zero streaming code — its "incremental loading" is batch
re-runs with a flag (SURVEY.md 2.8, 3.3). These operators are the
north-star streaming surface: the same ``F.window`` / ``F.session_window``
expressions work on a batch frame (driver oracle checks) and on a
``readStream`` frame with ``withWatermark`` (late-data handling, tested via
``trigger(availableNow=True)`` micro-batches in tests/test_streaming.py).

Scale: windowed aggregation shuffles on (window, keys) — partial
aggregation runs map-side; watermarks bound state for unbounded streams.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _fmt(col: Column, alias: str) -> Column:
    """Window bounds as formatted UTC strings so results are comparable
    across engines (and across pandas timestamp unit variations)."""
    return F.date_format(col, TS_FMT).alias(alias)


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Tumbling (fixed, non-overlapping) event-time windows."""
    w = F.window(F.col(ts_col), duration)
    return (
        df.groupBy(w.alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.date_format(F.col("w.start"), TS_FMT))
        .drop("w")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Sliding (overlapping) windows: each event lands in
    duration/slide windows."""
    w = F.window(F.col(ts_col), duration, slide)
    return (
        df.groupBy(w.alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.date_format(F.col("w.start"), TS_FMT))
        .drop("w")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge; the
    window ends ``gap`` after the last event (Spark semantics:
    start = min(ts), end = max(ts) + gap)."""
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(w.alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("session_start", F.date_format(F.col("w.start"), TS_FMT))
        .withColumn("session_end", F.date_format(F.col("w.end"), TS_FMT))
        .drop("w")
    )


def streaming_session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    watermark: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Watermarked session windows for unbounded streams: sessions merge
    within ``gap``; the watermark bounds state — a session is finalized
    (and in update/append mode emitted for the last time) once the
    watermark passes its end, and events arriving later than the
    watermark are dropped rather than resurrecting a closed session.
    ``session_agg`` (no watermark, complete mode) is the finite-replay
    twin whose output must equal the batch gaps-and-islands SQL."""
    w = F.session_window(F.col(ts_col), gap)
    return (
        _watermarkable(df, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("session_start", F.date_format(F.col("w.start"), TS_FMT))
        .withColumn("session_end", F.date_format(F.col("w.end"), TS_FMT))
        .drop("w")
    )


def _watermarkable(stream: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (LTZ); driver testdata can arrive as
    TIMESTAMP_NTZ (parquet ``timestamp[us]`` without a zone). With the
    session pinned to UTC the NTZ->LTZ cast is value-exact, so late-data
    semantics are unchanged."""
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        return stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


def streaming_tumbling_agg(
    stream: DataFrame,
    ts_col: str,
    duration: str,
    watermark: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Streaming variant: watermark bounds state and drops data later than
    ``watermark`` behind the max observed event time."""
    w = F.window(F.col(ts_col), duration)
    return (
        _watermarkable(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.date_format(F.col("w.start"), TS_FMT))
        .drop("w")
    )


def streaming_dedup(
    stream: DataFrame, keys: Sequence[str], ts_col: str, watermark: str
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps one row per key within the
    watermark horizon (SURVEY.md 2.8)."""
    return _watermarkable(stream, ts_col).withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(list(keys))
