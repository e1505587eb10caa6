"""Count-min sketch: sublinear-memory frequency estimation over a keyed
stream/corpus (heavy-hitter accounting without a full exact count table).

Why it matters at 100 TB: an exact term-count table is vocabulary-sized and
must be shuffled; a count-min sketch is a fixed ``depth x width`` integer
grid (kilobytes) that merges by cell-wise addition — the same mergeable-state
idea as ``plans/incremental``, taken to constant memory. Estimates
overcount only (never undercount), with error ~ N/width at confidence
1 - (1/2)^depth.

Cross-engine determinism: row hashes are md5-based, so the DuckDB oracle
rebuilds the identical sketch and the estimates hash-match — the sketch is
*verifiable*, not just statistically plausible.

Build is ONE aggregation: tokens explode to (depth, bucket) pairs map-side
(the hash expressions are plan literals, no UDF), and the shuffle carries
at most ``depth x width`` partial counts per map task. For depth <= 4 the
row is hashed ONCE (md5 = 128 bits) and each depth takes a disjoint 32-bit
slice — one hash instead of depth salted hashes per row, the dominant
map-side cost at corpus scale; deeper sketches fall back to per-depth
salted md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


def _bucket(col, depth_idx: int, width: int):
    """Bucket of ``col`` under the depth-``depth_idx`` hash: md5 of the
    salted value, first 32 bits, mod width. Pure JVM expression (the
    depth > 4 fallback; the fast path slices one shared md5)."""
    return TX.hash32(F.concat(F.lit(f"cms{depth_idx}:"), col)) % F.lit(width)


def _bucket_sliced(h_col, depth_idx: int, width: int):
    """Bucket from the depth-``depth_idx`` 32-bit slice of one shared md5
    hex digest (computed once per row)."""
    return (
        F.conv(F.substring(h_col, 1 + 8 * depth_idx, 8), 16, 10).cast("long")
        % F.lit(width)
    )


def _cells(df: DataFrame, key_col: str, depth: int, width: int, alias: str):
    """(depth_idx, bucket) pairs per row under the shared scheme."""
    if depth <= 4:
        hashed = df.select(
            "*", F.md5(F.concat(F.lit("cms:"), F.col(key_col))).alias("__h")
        )
        pairs = [
            F.struct(
                F.lit(i).alias("depth_idx"),
                _bucket_sliced(F.col("__h"), i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
        return hashed.select(
            *df.columns, F.explode(F.array(*pairs)).alias(alias)
        )
    pairs = [
        F.struct(
            F.lit(i).alias("depth_idx"),
            _bucket(F.col(key_col), i, width).alias("bucket"),
        )
        for i in range(depth)
    ]
    return df.select(*df.columns, F.explode(F.array(*pairs)).alias(alias))


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: one row per non-empty cell,
    ``(depth_idx, bucket, cnt)``. At most depth*width rows regardless of
    input size; merge two sketches by unioning and summing ``cnt``."""
    cells = _cells(df, key_col, depth, width, "c")
    return cells.groupBy("c.depth_idx", "c.bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise merge of two sketches built with the same (depth, width):
    union + per-cell sum. Addition commutes and associates, so ANY merge
    order — batch order, tree reduction, streaming accumulation —
    produces the identical sketch; this is what makes the sketch an
    incrementally-maintainable artifact (and why a streaming build can
    hash-match the batch oracle exactly)."""
    return (
        a.unionByName(b)
        .groupBy("depth_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
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
    probes = _cells(keys, key_col, depth, width, "p").select(
        key_col, "p.depth_idx", "p.bucket"
    )
    return (
        probes.join(F.broadcast(sketch), ["depth_idx", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )


def hll_partials(
    df: DataFrame,
    group_cols,
    value_col: str,
    sketch_col: str = "hll_sketch",
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HyperLogLog sketch STATES (Datasketches HLL via Spark's
    built-in ``hll_sketch_agg`` — binary column, JVM-side, no UDF).

    This is the materializable half of incremental distinct counting: at
    100 TB you compute daily/partition-level sketches ONCE, persist the
    kilobyte-sized binaries, and answer any coarser-grained distinct
    question (weekly, monthly, all-time, rolling) by UNIONING sketches —
    never rescanning the raw data. A merged estimate agrees with a
    direct pass at the coarser grain to within the sketch envelope, but
    is NOT guaranteed bit-identical: Datasketches HLL promotes
    sparse->dense representations at points that depend on how the
    input was split into partials, so different partition layouts (or
    partial-aggregation boundaries) can move an estimate by a count or
    two (measured: the same 400-distinct set estimated 397-401 across
    repartition(1..32) layouts — r14, which demoted the old
    "bit-identical merge" claim this docstring carried and the
    layout-sensitive assertion in tests/test_sketch.py that rode on
    it). Relative error is ~1.04/sqrt(2^lg_k) (~1.6% at the default
    lg_k=12, ~4 KB per group); estimates are deterministic for a FIXED
    layout, which is why the rows-only HLL catalog entries replay
    stably on one host."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_k)).alias(
            sketch_col
        )
    )


def hll_rollup(
    partials: DataFrame,
    group_cols,
    sketch_col: str = "hll_sketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Merge persisted HLL partials to a coarser grouping and read the
    estimates out: cell-wise ``hll_union_agg`` (mergeable-state, same
    shape as cms cell addition) + ``hll_sketch_estimate``. The shuffle
    carries one ~4 KB binary per input group — data volume never appears
    in this job."""
    return partials.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(False))
        ).alias(out_col)
    )


# ---------------------------------------------------------------------------
# Bloom filter (md5-sliced, bit-reproducible)
# ---------------------------------------------------------------------------


def bloom_build(
    df: DataFrame, key_col: str, width: int = 1024, k: int = 4
) -> DataFrame:
    """Build a Bloom filter as the SET of bit positions hit: one row per
    set bit, at most ``width`` rows regardless of input size — the
    mergeable membership sketch completing the CMS (frequency) / HLL
    (cardinality) family. Merge two filters with the same (width, k) by
    unioning the bit sets. ``k`` slices of one md5 per key (the CMS
    fast-path trick) keep it pure JVM AND bit-reproducible cross-engine
    — the DuckDB oracle rebuilds the identical filter, so membership
    answers (and the false-positive count itself) are hash-verified,
    not just plausible. Requires ``k <= 4`` (md5 yields four 32-bit
    slices)."""
    if k > 4:
        raise ValueError(f"bloom_build: k={k} > 4 slices of one md5")
    hashed = df.select(
        F.md5(
            F.concat(F.lit("bloom:"), F.col(key_col).cast("string"))
        ).alias("__h")
    )
    pos = [_bucket_sliced(F.col("__h"), i, width) for i in range(k)]
    return (
        hashed.select(F.explode(F.array(*pos)).alias("bit"))
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    k: int = 4,
) -> DataFrame:
    """Probe: a key is a MAYBE-member iff every one of its (distinct)
    bit positions is set. The filter is at most ``width`` rows —
    broadcast into the position join; per-key verdicts are a counts
    comparison (n_hit == n_positions), never a per-row loop."""
    hashed = keys.select(
        F.col(key_col),
        F.md5(
            F.concat(F.lit("bloom:"), F.col(key_col).cast("string"))
        ).alias("__h"),
    )
    pos = [_bucket_sliced(F.col("__h"), i, width) for i in range(k)]
    kp = (
        hashed.select(F.col(key_col), F.explode(F.array(*pos)).alias("bit"))
        .distinct()
    )
    n_pos = kp.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n_pos"))
    n_hit = (
        kp.join(F.broadcast(bits), "bit")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__n_hit"))
    )
    return (
        n_pos.join(n_hit, key_col, "left")
        .select(
            F.col(key_col),
            (F.coalesce(F.col("__n_hit"), F.lit(0)) == F.col("__n_pos")).alias(
                "maybe_member"
            ),
        )
    )
