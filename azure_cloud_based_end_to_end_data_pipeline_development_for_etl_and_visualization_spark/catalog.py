"""Query catalog: every implemented operator as a (spark, sf_dir) -> DataFrame
callable plus its DuckDB oracle SQL twin.

This is the driver contract surface (``__spark_entry__.py`` re-exports it).
Keys mirror SURVEY.md section 2's ``queries()`` name column.

Determinism rules (so the driver's order-insensitive value hash matches):

- Aggregates over doubles are summed as ``decimal(18,6)`` then cast back to
  double. Per-row double arithmetic is bit-identical across engines (IEEE),
  but *sum order* is not; decimal sums are exact, hence order-independent.
  The testdata's doubles carry <= 4 decimal digits, so the decimal cast is
  lossless in both engines.
- Averages are ``cast(decimal_sum as double) / count`` — identical double
  division in both engines.
- Window starts and other derived timestamps are formatted to strings
  explicitly on both sides.
- Every computed column is aliased identically in Spark and SQL (the driver
  sorts columns by name before hashing).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events loader. The driver's events.parquet stores TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects; read nanos as long and convert
    with exact integer division (``div`` — double division would lose
    microseconds at epoch-nano magnitudes). DuckDB truncates ns->us the
    same way, so oracle comparisons line up."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def dec_sum(col: Column) -> Column:
    """Order-independent sum of a double expression (see module docstring)."""
    return F.sum(col.cast("decimal(18,6)")).cast("double")


def dec_avg(col: Column) -> Column:
    return F.sum(col.cast("decimal(18,6)")).cast("double") / F.count(col)


# ---------------------------------------------------------------------------
# 2.1 scans / sources / sinks
# ---------------------------------------------------------------------------


def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan (ref TESTING NOTEBOOK.ipynb:21-23 cell 0)."""
    return _t(spark, sf_dir, "region")


def q_sql_over_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL over a file path (ref gold_dim_branch.ipynb:35568 cell 7)."""
    path = os.path.join(sf_dir, "nation.parquet")
    return spark.sql(
        f"select n_nationkey, n_name, n_regionkey from parquet.`{path}`"
    )


def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source round-trip (ref SalesData.csv ADF ingest; rows-only).

    Materializes region as CSV (header, inferSchema) then reads it back —
    exercises the reference's CSV ingestion path on driver testdata."""
    out = os.path.join(tempfile.gettempdir(), "engine_csv_roundtrip")
    _t(spark, sf_dir, "region").coalesce(1).write.mode("overwrite").option(
        "header", "true"
    ).csv(out)
    return (
        spark.read.option("header", "true")
        .option("inferSchema", "true")
        .csv(out)
        .orderBy("r_regionkey")
    )


def q_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overwrite-mode table write + catalog registration + re-read
    (ref gold_dim_branch.ipynb:88171-88175 cell 35; rows-only)."""
    from .sources.io import write_table

    out = os.path.join(tempfile.gettempdir(), "engine_write_roundtrip")
    dim = (
        _t(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
    )
    write_table(dim, "nation_gold", out)
    return spark.table("nation_gold").orderBy("n_nationkey")


def q_scd1_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-batch SCD1 dimension scenario on driver testdata (rows-only;
    golden-path parity with gold_dim_dealer.ipynb + FIXTURES.md section 3).

    batch0: customers with c_custkey % 10 != 0 -> initial dim build.
    batch1: remaining customers -> whenNotMatchedInsertAll path.
    batch2: batch1 customers with names suffixed ' up' -> whenMatchedUpdateAll.
    Verified invariants live in tests/test_scd_pipeline.py; here we return
    the final dim so the driver sees stable rows/schema."""
    from .plans.scd import merge_scd1_df
    from .plans.star import build_dim

    cust = _t(spark, sf_dir, "customer")
    b0 = cust.filter(F.col("c_custkey") % 10 != 0)
    b1 = cust.filter(F.col("c_custkey") % 10 == 0)
    b2 = b1.withColumn("c_name", F.concat(F.col("c_name"), F.lit(" up")))

    dim = build_dim(b0, ["c_custkey"], ["c_name", "c_mktsegment"], "dim_customer_key")
    for batch in (b1, b2):
        nxt = build_dim(
            batch, ["c_custkey"], ["c_name", "c_mktsegment"], "dim_customer_key",
            existing=dim,
        )
        dim = merge_scd1_df(dim, nxt, ["dim_customer_key"])
    return dim.orderBy("dim_customer_key")


# ---------------------------------------------------------------------------
# 2.2 projections / filters / derivations
# ---------------------------------------------------------------------------


def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named projection (ref gold_dim_branch.ipynb:78681 cell 29)."""
    return _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


def q_join_project_disambiguate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute-qualified post-join projection
    (ref gold_dim_branch.ipynb:43211 cell 14)."""
    cust = _t(spark, sf_dir, "customer").alias("c")
    nat = _t(spark, sf_dir, "nation").alias("n")
    j = cust.join(nat, F.col("c.c_nationkey") == F.col("n.n_nationkey"), "left")
    return j.select(F.col("c.c_custkey").alias("c_custkey"),
                    F.col("c.c_name").alias("c_name"),
                    F.col("n.n_name").alias("n_name"))


def q_filter_isnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + IS NULL = hand-rolled anti join: customers with no orders
    (ref gold_dim_branch.ipynb:52656 cell 20)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    return j.filter(F.col("o_orderkey").isNull()).select("c_custkey", "c_name")


def q_filter_isnotnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + IS NOT NULL = hand-rolled semi join
    (ref gold_dim_branch.ipynb:52524 cell 17)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    return j.filter(F.col("o_orderkey").isNotNull()).select(
        "c_custkey", "o_orderkey", "o_orderstatus"
    )


def q_empty_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``where 1=0`` schema stub — folds to an empty LocalRelation
    (ref gold_dim_branch.ipynb:43071-43077 cell 11)."""
    path = os.path.join(sf_dir, "lineitem.parquet")
    return spark.sql(
        f"select 1 as sk, l_orderkey, l_quantity from parquet.`{path}` where 1=0"
    )


def q_split_getitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String split + element access — silver's model_category derivation
    (SURVEY.md 1.3 [inferred])."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.split(F.col("p_name"), " ").getItem(0).alias("name_head"),
        F.split(F.col("p_brand"), "#").getItem(1).alias("brand_num"),
    )


def q_arith_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic derived column — silver's RevPerUnit (SURVEY.md 1.3)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("price_per_unit"),
    )


# ---------------------------------------------------------------------------
# 2.3 joins
# ---------------------------------------------------------------------------


def q_left_join_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer key lookup (ref gold_dim_branch.ipynb:43210 cell 14)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    return orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left").select(
        "o_orderkey", "o_custkey", "c_name", "c_nationkey"
    )


def q_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idiomatic left-semi (SURVEY.md 2.3 note)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def q_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idiomatic left-anti (SURVEY.md 2.3 note)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: 4-way star join + grouped rollup — revenue by region/year
    (generalizes gold_fact_sales.ipynb:55996-56000 cell 8 + the Power BI
    reporting surface the gold layer exists to serve, SURVEY.md 2.4).

    Plan shape at scale: lineitem (the 100 TB side) never shuffles before
    aggregation — orders joins shuffle-free under AQE when small, and
    customer/nation/region are broadcast. Partial aggregation runs map-side."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = _t(spark, sf_dir, "region")

    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey, "left")
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey, "left")
    )
    return (
        joined.groupBy(
            F.col("r_name"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "order_year")
    )


# ---------------------------------------------------------------------------
# 2.4 / 2.5 aggregates, distinct, union, order/limit
# ---------------------------------------------------------------------------


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT dim source (ref gold_dim_branch.ipynb:35568 cell 7)."""
    return _t(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


def q_max_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global MAX high-water mark (ref gold_dim_branch.ipynb:60158 cell 24)."""
    return _t(spark, sf_dir, "orders").agg(F.max("o_totalprice").alias("max_value"))


def q_cast_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX over cast (ref gold_dim_date.ipynb:43850-43853 cell 23)."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.max(F.col("l_quantity").cast("int")).alias("max_value")
    )


def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of disjoint splits (ref gold_dim_branch.ipynb:78820 cell 31)."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    f = orders.filter(F.col("o_orderstatus") == "F")
    o = orders.filter(F.col("o_orderstatus") == "O")
    return f.unionByName(o)


def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation (TPC-H Q1 shape) — the reporting surface gold
    exists to serve (SURVEY.md 2.4)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum(F.col("l_quantity")).alias("sum_qty"),
            dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            dec_avg(F.col("l_quantity")).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by aggregate (SURVEY.md 2.4: q_orderby_limit). Spark plans
    orderBy+limit as TakeOrderedAndProject — no global sort materialized."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(dec_sum(F.col("o_totalprice")).alias("total_spent"),
             F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("total_spent").desc(), F.col("o_custkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# 2.6 surrogate keys
# ---------------------------------------------------------------------------


def q_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dense surrogate keys via row_number — replaces the
    reference's monotonically_increasing_id (SURVEY.md 2.6 op 25)."""
    from .operators.relational import with_surrogate_key

    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return with_surrogate_key(nat, ["n_nationkey"], "nation_sk").select(
        "nation_sk", "n_nationkey", "n_name"
    )


# ---------------------------------------------------------------------------
# analytic windows (SURVEY.md 2.8)
# ---------------------------------------------------------------------------


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number over partitioned window: top-5 customers by balance per
    market segment."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("c_mktsegment", "rk", "c_custkey", "c_acctbal")
    )


def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over event time per user (events table)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_scan_parquet": q_scan_parquet,
    "q_sql_over_path": q_sql_over_path,
    "q_scan_csv": q_scan_csv,
    "q_write_roundtrip": q_write_roundtrip,
    "q_scd1_merge": q_scd1_merge,
    "q_project": q_project,
    "q_join_project_disambiguate": q_join_project_disambiguate,
    "q_filter_isnull": q_filter_isnull,
    "q_filter_isnotnull": q_filter_isnotnull,
    "q_empty_relation": q_empty_relation,
    "q_split_getitem": q_split_getitem,
    "q_arith_derive": q_arith_derive,
    "q_left_join_lookup": q_left_join_lookup,
    "q_left_semi": q_left_semi,
    "q_left_anti": q_left_anti,
    "q_star_join": q_star_join,
    "q_distinct": q_distinct,
    "q_max_global": q_max_global,
    "q_cast_agg": q_cast_agg,
    "q_union_all": q_union_all,
    "q_groupby_agg": q_groupby_agg,
    "q_orderby_limit": q_orderby_limit,
    "q_surrogate_key": q_surrogate_key,
    "q_window_rank": q_window_rank,
    "q_lag_lead": q_lag_lead,
}

#: DuckDB oracle twins. Omitted keys => driver records rows-only checks.
ORACLES: dict[str, str] = {
    "q_scan_parquet": "select r_regionkey, r_name from region",
    "q_sql_over_path": "select n_nationkey, n_name, n_regionkey from nation",
    "q_project": "select c_custkey, c_name, c_mktsegment from customer",
    "q_join_project_disambiguate": """
        select c.c_custkey, c.c_name, n.n_name
        from customer c left join nation n on c.c_nationkey = n.n_nationkey
    """,
    "q_filter_isnull": """
        select c.c_custkey, c.c_name
        from customer c left join orders o on c.c_custkey = o.o_custkey
        where o.o_orderkey is null
    """,
    "q_filter_isnotnull": """
        select c.c_custkey, o.o_orderkey, o.o_orderstatus
        from customer c left join orders o on c.c_custkey = o.o_custkey
        where o.o_orderkey is not null
    """,
    "q_empty_relation": "select 1 as sk, l_orderkey, l_quantity from lineitem where 1=0",
    "q_split_getitem": """
        select p_partkey,
               split_part(p_name, ' ', 1) as name_head,
               split_part(p_brand, '#', 2) as brand_num
        from part
    """,
    "q_arith_derive": """
        select l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) as net_price,
               l_extendedprice / l_quantity as price_per_unit
        from lineitem
    """,
    "q_left_join_lookup": """
        select o.o_orderkey, o.o_custkey, c.c_name, c.c_nationkey
        from orders o left join customer c on o.o_custkey = c.c_custkey
    """,
    "q_left_semi": """
        select c_custkey, c_name from customer
        where c_custkey in (select o_custkey from orders)
    """,
    "q_left_anti": """
        select c_custkey, c_name from customer
        where c_custkey not in (select o_custkey from orders where o_custkey is not null)
    """,
    "q_star_join": """
        select r.r_name, year(o.o_orderdate) as order_year,
               cast(sum(cast(l.l_extendedprice * (1 - l.l_discount) as decimal(18,6))) as double) as revenue,
               count(*) as n_items
        from lineitem l
        left join orders o   on l.l_orderkey = o.o_orderkey
        left join customer c on o.o_custkey = c.c_custkey
        left join nation n   on c.c_nationkey = n.n_nationkey
        left join region r   on n.n_regionkey = r.r_regionkey
        group by 1, 2 order by 1, 2
    """,
    "q_distinct": "select distinct c_nationkey, c_mktsegment from customer",
    "q_max_global": "select max(o_totalprice) as max_value from orders",
    "q_cast_agg": "select max(cast(l_quantity as int)) as max_value from lineitem",
    "q_union_all": """
        select o_orderkey, o_orderstatus from orders where o_orderstatus = 'F'
        union all
        select o_orderkey, o_orderstatus from orders where o_orderstatus = 'O'
    """,
    "q_groupby_agg": """
        select l_returnflag, l_linestatus,
               cast(sum(cast(l_quantity as decimal(18,6))) as double) as sum_qty,
               cast(sum(cast(l_extendedprice as decimal(18,6))) as double) as sum_base_price,
               cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double) as sum_disc_price,
               cast(sum(cast(l_quantity as decimal(18,6))) as double) / count(l_quantity) as avg_qty,
               count(*) as count_order
        from lineitem
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus
    """,
    "q_orderby_limit": """
        select o_custkey,
               cast(sum(cast(o_totalprice as decimal(18,6))) as double) as total_spent,
               count(*) as n_orders
        from orders
        group by o_custkey
        order by total_spent desc, o_custkey
        limit 10
    """,
    "q_surrogate_key": """
        select row_number() over (order by n_nationkey) as nation_sk,
               n_nationkey, n_name
        from nation
    """,
    "q_window_rank": """
        select c_mktsegment, rk, c_custkey, c_acctbal from (
            select c_mktsegment, c_custkey, c_acctbal,
                   row_number() over (
                       partition by c_mktsegment
                       order by c_acctbal desc, c_custkey
                   ) as rk
            from customer
        ) where rk <= 5
    """,
    "q_lag_lead": """
        select user_id, event_id,
               lag(value)  over (partition by user_id order by ts, event_id) as prev_value,
               lead(value) over (partition by user_id order by ts, event_id) as next_value
        from events
    """,
}
