"""End-to-end medallion pipeline: bronze -> silver -> gold star schema with
SCD1 merges and incremental loads — the reference's whole architecture
(README.md:8-14) as a plain importable library, generalized beyond
car-sales.

Reference stage mapping (SURVEY.md section 3):

- ingest:  ADF copy CSV -> bronze parquet, dropping ``Product_Name``
           (3.1; the drop happens at ingest, not silver — 1.3)
- silver:  derived columns ``model_category = split(Model_ID,'-')[0]`` and
           ``RevPerUnit = Revenue/Units_Sold`` (1.3 [inferred])
- gold:    four dims + fact, each built then SCD1-merged on the surrogate
           key (3.2/3.3); ``incremental`` parameter replaces the
           ``dbutils.widgets`` incremental_flag (2.6 op 27)

The pipeline is configuration-driven (``StarSchemaConfig``) so the same
code runs the car-sales shape of the reference and any other star schema.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import read_csv, write_parquet
from .scd import merge_scd1_path
from .star import build_dim
from .versioned import (
    _version_name,
    _versions_dir,
    current_version,
    merge_scd1_versioned,
    read_version,
)


@dataclass
class DimSpec:
    name: str  # gold table name, e.g. "dim_branch"
    business_keys: list[str]
    attrs: list[str]
    key_col: str = ""

    def __post_init__(self) -> None:
        if not self.key_col:
            self.key_col = f"{self.name}_key"


@dataclass
class StarSchemaConfig:
    fact_name: str
    measures: list[str]
    dims: list[DimSpec] = field(default_factory=list)
    #: silver columns carried into the fact as hive partition keys — the
    #: 100-TB layout knob (prune "last month" scans to one partition)
    fact_partition_cols: list[str] = field(default_factory=list)


CARSALES = StarSchemaConfig(
    fact_name="factsales",
    measures=["Revenue", "Units_Sold", "RevPerUnit"],
    dims=[
        DimSpec("dim_branch", ["Branch_ID"], ["BranchName"]),
        DimSpec("dim_dealer", ["Dealer_ID"], ["DealerName"]),
        DimSpec("dim_model", ["Model_ID"], ["model_category"]),
        DimSpec("dim_date", ["Date_ID"], []),
    ],
    # Year-partitioned fact by default: a per-year report on a 100 TB fact
    # then scans ~one partition instead of the table (pruning is asserted
    # end-to-end in tests/test_medallion.py). The reference writes its gold
    # fact unpartitioned — fine at notebook scale, not at ours.
    fact_partition_cols=["Year"],
)


def ingest_to_bronze(
    spark: SparkSession, csv_path: str, lake_root: str, drop_cols: list[str]
) -> DataFrame:
    """CSV -> bronze parquet, dropping ingest-time columns (Product_Name)."""
    df = read_csv(spark, csv_path).drop(*drop_cols)
    write_parquet(df, os.path.join(lake_root, "bronze", "rawdata"))
    return df


def bronze_to_silver(spark: SparkSession, lake_root: str) -> DataFrame:
    """Bronze -> silver with the reference's derived columns."""
    bronze = spark.read.parquet(os.path.join(lake_root, "bronze", "rawdata"))
    silver = bronze.withColumn(
        "model_category", F.split(F.col("Model_ID"), "-").getItem(0)
    ).withColumn("RevPerUnit", F.col("Revenue") / F.col("Units_Sold"))
    write_parquet(silver, os.path.join(lake_root, "silver", "carsales"))
    return silver


def _gold_path(lake_root: str, table: str) -> str:
    return os.path.join(lake_root, "gold", table)


def _gold_exists(path: str, publish: str) -> bool:
    if publish == "versioned":
        return current_version(path) is not None
    return os.path.exists(path)


def _merge_gold(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    keys: list[str],
    publish: str,
    check_duplicate_source_keys: bool = True,
    partition_by: list[str] | None = None,
) -> None:
    if publish == "versioned":
        merge_scd1_versioned(
            spark, path, df, keys,
            check_duplicate_source_keys=check_duplicate_source_keys,
            partition_by=partition_by,
        )
    else:
        merge_scd1_path(
            spark, path, df, keys,
            check_duplicate_source_keys=check_duplicate_source_keys,
            partition_by=partition_by,
        )


def gold_table(
    spark: SparkSession, lake_root: str, table: str, publish: str = "versioned"
) -> DataFrame:
    """Read a gold table under either publish protocol."""
    path = _gold_path(lake_root, table)
    if publish == "versioned":
        return read_version(spark, path)
    return spark.read.parquet(path)


def gold_data_dir(lake_root: str, table: str, publish: str = "versioned") -> str:
    """Physical directory of the current snapshot (for layout inspection —
    hive partition dirs live here under both protocols)."""
    path = _gold_path(lake_root, table)
    if publish == "versioned":
        v = current_version(path)
        if v is None:
            raise FileNotFoundError(f"no committed version at {path}")
        return os.path.join(_versions_dir(path), _version_name(v))
    return path


def build_gold(
    spark: SparkSession,
    lake_root: str,
    config: StarSchemaConfig,
    silver: DataFrame | None = None,
    publish: str = "versioned",
) -> None:
    """Build/merge every dim then the fact from the silver layer.

    Initial run: surrogate keys 1..N, table created. Incremental run:
    existing keys preserved, new business keys get max+1.., changed
    attributes updated in place (SCD1), fact rows merged on the full
    surrogate-key combination — reference semantics including the merge
    keyed on surrogate keys (gold_fact_sales.ipynb:72819 cell 12).

    ``publish`` picks the commit protocol. The default ``"versioned"``
    publishes each merge as an atomic pointer flip (plans/versioned):
    readers always see a complete snapshot — there is NO window in which
    the table is absent — and every run is time-travelable, the portable
    equivalent of the reference's Delta gold layer. ``"swap"`` is the
    plain directory-rename publisher (plans/scd.merge_scd1_path): no
    retained history, a two-rename window, but gold tables stay directly
    parquet-addressable for external readers."""
    if silver is None:
        silver = spark.read.parquet(os.path.join(lake_root, "silver", "carsales"))

    dim_frames: dict[str, DataFrame] = {}
    for spec in config.dims:
        path = _gold_path(lake_root, spec.name)
        existing = (
            gold_table(spark, lake_root, spec.name, publish)
            if _gold_exists(path, publish)
            else None
        )
        nxt = build_dim(
            silver, spec.business_keys, spec.attrs, spec.key_col, existing=existing
        )
        _merge_gold(spark, path, nxt, [spec.key_col], publish)
        dim_frames[spec.name] = gold_table(spark, lake_root, spec.name, publish)

    fact_src = silver.alias("s")
    select_cols: list[Column] = [F.col(f"s.{m}").alias(m) for m in config.measures]
    select_cols += [
        F.col(f"s.{c}").alias(c)
        for c in config.fact_partition_cols
        if c not in config.measures
    ]
    for spec in config.dims:
        d = dim_frames[spec.name].alias(spec.name)
        cond = None
        for k in spec.business_keys:
            c = F.col(f"s.{k}") == F.col(f"{spec.name}.{k}")
            cond = c if cond is None else (cond & c)
        # config-driven dims can be anything from a 5-row calendar to a
        # customer-scaled entity — unhinted, AQE broadcasts the small ones
        fact_src = fact_src.join(d, cond, "left")
        select_cols.append(F.col(f"{spec.name}.{spec.key_col}").alias(spec.key_col))
    fact = fact_src.select(*select_cols)

    key_cols = [spec.key_col for spec in config.dims]
    _merge_gold(
        spark,
        _gold_path(lake_root, config.fact_name),
        fact,
        key_cols,
        publish,
        # the reference's fact grain allows duplicate key combos on initial
        # load (one row per silver row) — SURVEY.md 3.3 documents the
        # collision; we bypass the duplicate check to match its semantics
        check_duplicate_source_keys=False,
        partition_by=config.fact_partition_cols or None,
    )


def register_gold(
    spark: SparkSession,
    lake_root: str,
    config: StarSchemaConfig = CARSALES,
    database: str = "gold",
    publish: str = "versioned",
) -> list[str]:
    """Register every gold table in the session catalog as
    ``<database>.<name>`` — the 2-level session-catalog equivalent of the
    reference's ``cars_catalog.gold.*`` Unity namespace
    (gold_dim_branch.ipynb:88171-88175: ``saveAsTable`` into the gold
    schema). External-location tables over the CURRENT snapshot: with the
    versioned publisher each call re-points the catalog entries at the
    newest committed snapshot, so run-then-register mirrors the
    reference's per-run ``saveAsTable``. Returns the qualified names."""
    spark.sql(f"create database if not exists {database}")
    out = []
    for t in [spec.name for spec in config.dims] + [config.fact_name]:
        path = gold_data_dir(lake_root, t, publish)
        qualified = f"{database}.{t}"
        spark.sql(f"drop table if exists {qualified}")
        spark.sql(f"create table {qualified} using parquet location '{path}'")
        # hive-partitioned tables (the Year-partitioned fact) expose zero
        # rows until their partitions are registered in the metastore
        if any("=" in d for d in os.listdir(path)):
            spark.sql(f"msck repair table {qualified}")
        out.append(qualified)
    return out


def run_pipeline(
    spark: SparkSession,
    csv_path: str,
    lake_root: str,
    config: StarSchemaConfig = CARSALES,
    drop_cols: list[str] | None = None,
    publish: str = "versioned",
) -> dict[str, int]:
    """Full pipeline run (initial or incremental is decided per-table by
    existence, like the reference's tableExists probe — op 9). Returns
    per-table row counts for assertion/monitoring."""
    ingest_to_bronze(
        spark, csv_path, lake_root,
        drop_cols if drop_cols is not None else ["Product_Name"],
    )
    silver = bronze_to_silver(spark, lake_root)
    build_gold(spark, lake_root, config, silver=silver, publish=publish)
    counts = {}
    for spec in config.dims:
        counts[spec.name] = gold_table(spark, lake_root, spec.name, publish).count()
    counts[config.fact_name] = gold_table(
        spark, lake_root, config.fact_name, publish
    ).count()
    return counts
