"""Small-file compaction for parquet table directories.

Incremental pipelines accrete files: every merge/append writes at least
one file per task, and a 100 TB table fed by thousands of micro-batches
degrades into millions of KB-sized files — scan planning, footer reads,
and shuffle fan-in all scale with file COUNT, not bytes. Compaction
rewrites a directory to approximately ``target_mb``-sized files.

Implementation: size the directory, compute ``ceil(bytes / target)``,
rewrite through ``repartition(n)`` (or ``repartitionByRange(n, sort_cols)``
to also restore clustering for min/max row-group skipping), and swap via
the same side-directory protocol as ``plans.scd.merge_scd1_path`` — or
commit as a new snapshot on a ``plans.versioned`` table, which makes
compaction a zero-risk background job: readers keep the old version until
the atomic pointer flip.

Scale: one full read + one full shuffle + one full write of the table —
run it per-partition (pass the partition subdirectory) on hive-layout
tables so routine compaction touches only fresh partitions.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import SparkSession


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def data_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_cols: Sequence[str] | None = None,
) -> int:
    """Rewrite the parquet directory at ``path`` into ~``target_mb`` files.

    ``sort_cols`` switches to a range repartition + within-partition sort,
    restoring value clustering so parquet row-group min/max stats prune
    effectively after compaction. Returns the new file count."""
    n_files = max(1, math.ceil(dir_bytes(path) / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    tmp = f"{path}.__compact_{uuid.uuid4().hex}"
    out.write.mode("overwrite").parquet(tmp)
    old = f"{path}.__old_{uuid.uuid4().hex}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return data_file_count(path)
