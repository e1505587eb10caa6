"""Bucketized temporal range join.

Spark has no range-join physical strategy (Databricks' range-join hint is
proprietary); a naive ``l.ts <= r.ts < l.ts + delta`` predicate compiles
to BroadcastNestedLoopJoin — quadratic, a non-starter at 100 TB. This is
the standard bucketization rewrite as a composition of built-in ops:

1. Right rows get ONE bucket key: ``floor(ts / width)``.
2. Left rows EXPLODE over every bucket their ``[ts+lower, ts+upper]``
   interval touches (``ceil((upper-lower)/width)+1`` buckets — keep the
   interval-to-width ratio small; width defaults to the interval length,
   giving <= 2 candidate buckets per left row).
3. Equi-join on the bucket key (hash join, shuffles on compact
   ``(bucket)`` longs), then apply the exact range predicate.

Each (left, right) candidate pair meets in exactly one bucket (the right
row's), so no post-join dedup is needed.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_seconds


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    extra_on: Column | None = None,
    how: str = "inner",
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Join rows where ``left.ts + lower <= right.ts < left.ts + upper``.
    Columns from both sides survive (disambiguate beforehand). ``extra_on``
    adds an equality conjunct (evaluated inside the same hash join).

    Only ``how='inner'`` is supported: the left side is exploded over its
    candidate buckets, so any outer variant would emit one null-extended
    row per *bucket* a left row misses in — duplicating unmatched rows —
    rather than one per left row. Express left-outer semantics as
    ``inner result ∪ (left anti-join matched)`` at the call site."""
    if how != "inner":
        raise ValueError(
            f"range_join supports only how='inner' (got {how!r}); the "
            "bucket-exploded left side would duplicate unmatched rows "
            "under outer semantics"
        )
    if upper_seconds <= lower_seconds:
        raise ValueError("upper_seconds must exceed lower_seconds")
    width = float(bucket_seconds or (upper_seconds - lower_seconds))
    n_buckets = math.ceil((upper_seconds - lower_seconds) / width) + 1

    r = right.withColumn(
        "__rbucket", F.floor(epoch_seconds(right_ts) / width)
    )
    first_bucket = F.floor(
        (epoch_seconds(left_ts) + lower_seconds) / width
    )
    l = left.withColumn(
        "__lbucket",
        F.explode(
            F.sequence(first_bucket, first_bucket + F.lit(n_buckets - 1))
        ),
    )

    cond = (F.col("__lbucket") == F.col("__rbucket"))
    exact = (
        epoch_seconds(right_ts) >= epoch_seconds(left_ts) + lower_seconds
    ) & (
        epoch_seconds(right_ts) < epoch_seconds(left_ts) + upper_seconds
    )
    cond = cond & exact
    if extra_on is not None:
        cond = cond & extra_on
    return l.join(r, cond, how).drop("__lbucket", "__rbucket")
