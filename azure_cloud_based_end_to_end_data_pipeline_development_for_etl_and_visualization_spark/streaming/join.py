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
    how: str = "inner",
) -> DataFrame:
    """Join streaming ``left`` and ``right`` on ``key`` where
    ``left.ts <= right.ts <= left.ts + max_delay_seconds``. Both sides
    must be streaming DataFrames; output is append-mode joinable.

    ``how='left_outer'`` adds the null-extended unmatched left rows.
    Their emission is WATERMARK-DRIVEN: a left row can only be declared
    unmatched once the watermark passes ``left.ts + max_delay`` (no
    matching right row can arrive anymore), and the watermark used by
    micro-batch N is computed from data seen through batch N-1 — so
    unmatched rows surface one batch AFTER the event time that seals
    them, and a finite replay needs trailing batches that advance event
    time past the horizon (see q_streaming_left_interval's staged
    sentinel batches). ``how='full_outer'`` additionally null-extends
    unmatched RIGHT rows under the same watermark discipline (a right
    row seals once no future left row could reach back to it),
    completing the streaming join family; state bounds are unchanged —
    outer forms only add the per-row matched bit."""
    from .windows import _watermarkable

    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(
            "interval_join_streams supports "
            f"how='inner'|'left_outer'|'full_outer', got {how!r}"
        )
    l = _watermarkable(left, left_ts).withWatermark(left_ts, watermark)
    r = _watermarkable(right, right_ts).withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"interval {max_delay_seconds} seconds"))
    )
    return l.join(r, cond, how)


def enrich_stream(
    stream: DataFrame, dim: DataFrame, keys: list[str], how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    STATIC dimension snapshot — no state store involved (unlike
    stream-stream joins), and Catalyst broadcasts the dim side when it
    fits, so the stream never shuffles. The canonical fact-stream ->
    dimension-lookup pattern; at 100 TB/day the stream side stays
    partition-local while only the (small) dim ships to executors.

    Only 'inner' and 'left' make sense here ('right'/'full' would need
    the unmatched static rows, which streaming can't emit incrementally);
    anything else raises rather than silently mis-joining."""
    if how not in ("inner", "left"):
        raise ValueError(f"enrich_stream supports how='inner'|'left', got {how!r}")
    return stream.join(dim, keys, how)
