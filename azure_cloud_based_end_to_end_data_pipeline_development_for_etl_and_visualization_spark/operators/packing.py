"""Sequence packing: assign documents to fixed-token-budget training
sequences (the concat-and-chunk scheme LLM pre-training uses — documents
concatenated in a deterministic order, the token stream split into
``budget``-sized windows, each document labeled with the window containing
its first token).

Scale design: the obvious formulation is one global running sum ordered by
doc id — a single-reducer sort over the whole corpus. This module instead
computes the running sum in two phases, mirroring
``operators/relational.with_surrogate_key_fact``:

1. ``repartitionByRange(id)`` — a distributed range shuffle; the range
   partitioner assigns ascending id ranges to ascending partition ids.
2. Per-partition token totals (map-side-combined; the shuffle carries one
   ``(pid, total)`` pair per partition). A cumulative window over those
   n_partitions rows yields each partition's global starting token offset —
   single-reducer, but over partition-count-sized data, not the corpus.
3. Broadcast the offsets back; a ``sum() over (partition by pid order by
   id)`` window finishes the running sum with per-range sorts that spread
   across all reducers — no global sort anywhere.

Unlike the zipWithIndex-style key assignment, the result here IS stable
across layouts: the ordering key is the data's own id column, not the
partition id, so two runs with different parallelism produce identical
packings (which is why it can be oracle-checked against a plain SQL
window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame, id_col: str, token_col: str, budget: int
) -> DataFrame:
    """Label each row with ``seq_id`` (which fixed-``budget`` training
    sequence its first token lands in) and ``seq_offset`` (position within
    that sequence), packing in ascending ``id_col`` order.

    Returns ``id_col`` + ``token_col`` + ``seq_id`` + ``seq_offset``.
    ``id_col`` must be unique; ``token_col`` non-negative."""
    pid = "__pk_pid"
    ranged = df.select(id_col, token_col).repartitionByRange(F.col(id_col))
    tagged = ranged.withColumn(pid, F.spark_partition_id())
    totals = tagged.groupBy(pid).agg(F.sum(token_col).alias("__pk_n"))
    w_ofs = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        pid,
        F.coalesce(F.sum("__pk_n").over(w_ofs), F.lit(0)).alias("__pk_offset"),
    )
    w_local = (
        Window.partitionBy(pid)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (
        F.col("__pk_offset")
        + F.coalesce(F.sum(token_col).over(w_local), F.lit(0))
    ).cast("long")
    return (
        tagged.join(F.broadcast(offsets), pid)
        .withColumn("__pk_start", start)
        .select(
            F.col(id_col),
            F.col(token_col),
            F.expr(f"__pk_start div {int(budget)}").alias("seq_id"),
            F.pmod(F.col("__pk_start"), F.lit(int(budget))).cast("long").alias(
                "seq_offset"
            ),
        )
    )
