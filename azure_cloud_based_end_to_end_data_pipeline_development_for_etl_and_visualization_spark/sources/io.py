"""Sources and sinks: parquet / CSV / SQL-over-path, testdata loaders.

Reference parity (SURVEY.md section 2.1):

- parquet scan with inferred schema  -> ``read_parquet``
  (ref: ``TESTING NOTEBOOK.ipynb:21-23 (cell 0)``; for parquet the schema
  comes from the file footer, so ``inferSchema`` is a no-op we drop)
- ``select * from parquet.`abfss://...``` SQL-over-path -> ``sql_over_path``
  (ref: ``gold_dim_branch.ipynb:35568 (cell 7)``) — open-source Spark has
  the identical table-valued syntax for local/HDFS/S3 paths.
- CSV source with header + inferSchema -> ``read_csv``
  (ref: ``SalesData.csv`` ingested by ADF; ``IncrementalSales.csv:1``)
- overwrite-mode managed write + registration -> ``write_table``
  (ref: ``gold_dim_branch.ipynb:88171-88175 (cell 35)``; Delta there,
  portable parquet + catalog registration here)

Scale notes: all readers return lazy DataFrames; predicate pushdown and
column pruning reach the parquet scan (verified via ``.explain`` in
tests/test_plans_explain.py). Writers accept ``partition_by`` so big facts
can be laid out for partition pruning at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: canonical testdata table names (TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan; schema from footers (ref TESTING NOTEBOOK.ipynb:21-23)."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    infer_schema: bool = True,
    schema=None,
) -> DataFrame:
    """CSV scan mirroring the reference's ADF ingest of SalesData.csv.

    Quoted fields with embedded commas (e.g. ``"Fisker, Karma Motors"``)
    are handled by Spark's default quote char — FIXTURES.md section 1.
    An explicit ``schema`` skips the inference pass (one fewer full read —
    at 100 TB inference over CSV is a real cost; always pass a schema there).
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def sql_over_path(spark: SparkSession, path: str, projection: str = "*") -> DataFrame:
    """``SELECT <projection> FROM parquet.`<path>``` — the reference's
    path-addressed SQL scan (gold_dim_branch.ipynb:35568)."""
    return spark.sql(f"select {projection} from parquet.`{path}`")


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_table(
    df: DataFrame,
    name: str,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write parquet at ``path`` and register ``name`` over it — the portable
    equivalent of the reference's external-path ``saveAsTable`` with Delta
    (gold_dim_branch.ipynb:88171-88175)."""
    spark = df.sparkSession
    write_parquet(df, path, mode=mode, partition_by=partition_by)
    spark.sql(f"drop table if exists {name}")
    spark.sql(f"create table {name} using parquet location '{path}'")


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver testdata table from ``sf_dir`` as lazy DataFrames."""
    return {
        t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        for t in TESTDATA_TABLES
    }


def register_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load testdata and register each table as a temp view."""
    dfs = load_testdata(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
