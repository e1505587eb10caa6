"""Incremental ingestion — the engine equivalent of the reference's ADF
copy activity (SURVEY.md 3.1: GitHub CSV -> ADF -> bronze parquet, copying
only the new file per run).

Two implementations of the same contract:

- :func:`ingest_batch_hwm` — batch high-water-mark ingest: append only rows
  whose monotonically increasing key exceeds the sink's current maximum.
  This is exactly the reference's "incremental data loading" semantic
  (README.md:10) without re-copying history.
- :class:`StreamingFileIngest` (streaming/ingest.py) — Structured
  Streaming file source with checkpointed exactly-once discovery.

Scale: the high-water-mark probe is a single scalar aggregate (same class
of driver round-trip the reference performs, gold_dim_branch.ipynb cell 24);
the append itself is a pushdown-filtered scan, so re-runs read only new data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ingest_batch_hwm(
    spark: SparkSession,
    source: DataFrame,
    sink_path: str,
    hwm_col: str,
) -> int:
    """Append rows with ``hwm_col`` greater than the sink's max. Returns the
    number of rows appended. Idempotent: a re-run with no new data is a
    no-op."""
    if os.path.exists(sink_path):
        row = spark.read.parquet(sink_path).agg(F.max(hwm_col)).first()
        hwm = row[0] if row else None
    else:
        hwm = None
    fresh = source if hwm is None else source.filter(F.col(hwm_col) > F.lit(hwm))
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(sink_path)
    return n


def drop_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Ingest-time column drop — mirrors the reference pipeline dropping
    ``Product_Name`` before bronze (SURVEY.md 1.3)."""
    return df.drop(*cols)
