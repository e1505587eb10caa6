"""Structured-Streaming file ingestion: the checkpointed, exactly-once
version of the reference's incremental ADF copy (SURVEY.md 2.8, 3.1).

``readStream`` on a directory discovers new files per micro-batch;
``trigger(availableNow=True)`` drains everything currently available and
stops — which both (a) matches the reference's run-to-completion batch
semantics and (b) makes streaming testable/oracle-able. The checkpoint dir
carries file-discovery state, so a re-run ingests only files that arrived
since the last run — no high-water-mark bookkeeping in user code.

At scale this is the standard lakehouse landing pattern: many small files
land continuously; maxFilesPerTrigger bounds micro-batch size; the sink is
partitioned parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def stream_ingest_files(
    spark: SparkSession,
    source_dir: str,
    sink_path: str,
    checkpoint: str,
    schema: StructType,
    fmt: str = "csv",
    transform=None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain all currently-available files from ``source_dir`` into parquet
    at ``sink_path`` (exactly-once via ``checkpoint``), applying
    ``transform(df) -> df`` per micro-batch if given. Blocks until drained."""
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(source_dir)
    if transform is not None:
        stream = transform(stream)
    (
        stream.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Run a streaming DataFrame to completion into an in-memory table
    (test/debug sink), using availableNow semantics."""
    (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
