"""Count-min sketch: sublinear-memory frequency estimation over a keyed
stream/corpus (heavy-hitter accounting without a full exact count table).

Why it matters at 100 TB: an exact term-count table is vocabulary-sized and
must be shuffled; a count-min sketch is a fixed ``depth x width`` integer
grid (kilobytes) that merges by cell-wise addition — the same mergeable-state
idea as ``plans/incremental``, taken to constant memory. Estimates
overcount only (never undercount), with error ~ N/width at confidence
1 - (1/2)^depth.

Cross-engine determinism: row hashes are md5-based (``functions/text.hash32``
over a per-depth salted key), so the DuckDB oracle rebuilds the identical
sketch and the estimates hash-match — the sketch is *verifiable*, not just
statistically plausible.

Build is ONE aggregation: tokens explode to (depth, bucket) pairs map-side
(the per-depth hash expressions are plan literals, no UDF), and the shuffle
carries at most ``depth x width`` partial counts per map task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


def _bucket(col, depth_idx: int, width: int):
    """Bucket of ``col`` under the depth-``depth_idx`` hash: md5 of the
    salted value, first 32 bits, mod width. Pure JVM expression."""
    return TX.hash32(F.concat(F.lit(f"cms{depth_idx}:"), col)) % F.lit(width)


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: one row per non-empty cell,
    ``(depth_idx, bucket, cnt)``. At most depth*width rows regardless of
    input size; merge two sketches by unioning and summing ``cnt``."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("depth_idx"),
                        _bucket(F.col(key_col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy("c.depth_idx", "c.bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over depths of its bucket
    count (0 when a bucket row is absent). The sketch is tiny, so the join
    broadcasts; the keys side never shuffles."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("depth_idx"),
                        _bucket(F.col(key_col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, "p.depth_idx", "p.bucket")
    return (
        probes.join(F.broadcast(sketch), ["depth_idx", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )
