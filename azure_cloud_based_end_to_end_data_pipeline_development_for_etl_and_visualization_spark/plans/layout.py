"""Z-order (Morton-curve) layout for multi-column data skipping.

Partitioning prunes on ONE hierarchy and plain sorting clusters ONE
column; a table queried by several independent predicates (e.g. events by
user AND by time, parts by size AND by price band) wants row groups that
are compact in ALL of them. Interleaving the bits of the key columns
(Morton/Z-order) gives a 1-D sort key whose contiguous ranges are
multi-dimensional tiles — after writing in that order, parquet row-group
min/max stats prune on every participating column, not just the first.

This is the portable core of Delta Lake's ``OPTIMIZE ... ZORDER BY``:
pure bit-arithmetic JVM expressions (no UDF), a range repartition, a
within-partition sort, and a plain parquet write.

Inputs must be non-negative ints of bounded width (``bits``); real
pipelines first bucketize raw columns (ntile ranks, epoch-day, price
bands) — which is also what bounds the expression size: ``bits x n_cols``
shift-and-or terms, all inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ZKEY = "__zorder_key"


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton code: interleave the low ``bits`` bits of each expression.

    Bit ``i`` of column ``j`` lands at output position ``i * n_cols + j``.
    Total output width is ``bits * n_cols`` (keep <= 63)."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits*n_cols = {bits * n} exceeds a long's 63 bits")
    key: Column = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(1)
            key = key + F.shiftleft(bit, i * n + j)
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Write ``df`` to parquet in Z-order over ``cols``: contiguous files
    cover multi-dimensional tiles, so row-group min/max stats prune on
    every ``cols`` member. One range shuffle + local sort, no UDF."""
    keyed = df.withColumn(_ZKEY, zorder_key([F.col(c) for c in cols], bits))
    (
        keyed.repartitionByRange(n_files, _ZKEY)
        .sortWithinPartitions(_ZKEY)
        .drop(_ZKEY)
        .write.mode("overwrite")
        .parquet(path)
    )
