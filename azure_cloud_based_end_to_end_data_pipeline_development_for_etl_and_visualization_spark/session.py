"""SparkSession factory.

The reference relies on a preconfigured Databricks cluster
(``gold_dim_branch.ipynb`` notebook metadata: ``computePreferences: null``);
here we own the session. Defaults are tuned for correctness-at-any-scale:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
UTC session timezone (so timestamp semantics match the DuckDB oracle),
Arrow enabled for the Pandas-UDF slow path.

At 100 TB on a real cluster the same builder applies — only ``master``,
``spark.sql.shuffle.partitions`` (set ~2-3x total cores) and executor
memory/core counts change; nothing in the engine assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pipeline_engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Env overrides: ``SPARK_GRAFT_CPUS`` sets local parallelism,
    ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` the shuffle width.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get(
                "SPARK_GRAFT_SHUFFLE_PARTITIONS",
                str(os.cpu_count() or 32),
            )
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Silence WindowExec's blanket "No Partition Defined" warning (r11
    # VERDICT item 8): every intentional unpartitioned window in this
    # codebase runs over a structurally BOUNDED input (LIMIT heads,
    # day/bin/decile domains, partition-count-sized offset tables), a
    # property tools/hint_audit.audit_windows proves per optimized plan
    # and pytest enforces — so the per-run log line is pure noise that
    # each new reader otherwise re-litigates. Logger-level only: plans
    # are unchanged, and a NEW unpartitioned window over fact-scaling
    # input still fails the mechanized sweep loudly.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # non-log4j2 deployments keep the warning; purely cosmetic
    return spark
