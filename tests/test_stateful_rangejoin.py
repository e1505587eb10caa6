"""Stateful streaming (applyInPandasWithState) and bucketized range join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.functions.timeutil import (
    epoch_seconds,
)


def test_running_totals_match_batch_sums(spark, sf_dir, tmp_path):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.streaming.stateful import (
        running_totals,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_dir)
    )
    q = (
        running_totals(stream, "user_id", "value")
        .writeStream.format("memory")
        .queryName("t_running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["key"]: (r["n_events"], r["total"])
        for r in spark.table("t_running_totals")
        .orderBy("n_events")  # later snapshots overwrite earlier ones
        .collect()
    }
    batch = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    expected = {
        r["user_id"]: (r["n"], r["s"])
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(expected)
    for k, (n, total) in expected.items():
        assert got[k][0] == n
        assert abs(got[k][1] - total) < 1e-6


def test_range_join_avoids_nested_loop(spark, sf_dir):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.catalog import (
        q_range_join,
    )

    df = q_range_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_range_join_matches_naive(spark, sf_dir):
    """Bucketized rewrite == the naive non-equi join on a small slice."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.catalog import (
        _events,
    )
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.range_join import (
        range_join,
    )

    ev = _events(spark, sf_dir).filter(F.col("event_id") < 2000)
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("err_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    fast = {
        (r["error_id"], r["click_id"])
        for r in range_join(errors, clicks, "err_ts", "click_ts", 0.0, 120.0)
        .select("error_id", "click_id")
        .collect()
    }
    naive = {
        (r["error_id"], r["click_id"])
        for r in errors.join(
            clicks,
            (epoch_seconds("click_ts") >= epoch_seconds("err_ts"))
            & (epoch_seconds("click_ts") < epoch_seconds("err_ts") + 120.0),
        )
        .select("error_id", "click_id")
        .collect()
    }
    assert fast == naive and len(fast) > 0


def test_ewma_anomaly_matches_reference_recursion(spark, sf_dir, tmp_path):
    """Two micro-batches through the EWMA detector must land on exactly
    the state a scalar reference recursion produces (same batch split,
    same event_id order), with batch-snapshot alert semantics."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.streaming.stateful import (
        ewma_anomaly,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    cutoff = events.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "src")
    events.filter(F.col("event_id") < cutoff).coalesce(1).write.parquet(
        src + "/batch=a"
    )
    events.filter(F.col("event_id") >= cutoff).coalesce(1).write.parquet(
        src + "/batch=b"
    )

    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch=*")
    )
    alpha, threshold = 0.2, 2.0
    q = (
        ewma_anomaly(
            stream, "user_id", "value", "event_id",
            alpha=alpha, threshold=threshold,
        )
        .writeStream.format("memory")
        .queryName("t_ewma")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["key"]: r
        for r in spark.table("t_ewma").orderBy("n_events").collect()
    }

    pdf = events.select("user_id", "event_id", "value").toPandas()
    pdf = pdf.sort_values(["user_id", "event_id"])
    one_minus, thr2 = 1.0 - alpha, threshold * threshold
    expected = {}
    for uid, grp in pdf.groupby("user_id"):
        batches = [
            list(grp[grp.event_id < cutoff].value.fillna(0.0)),
            list(grp[grp.event_id >= cutoff].value.fillna(0.0)),
        ]
        n, m, v, alerts = 0, 0.0, 0.0, 0
        for batch in batches:
            if not batch:
                continue
            if n > 0:
                if v > 0.0:
                    alerts += sum((xi - m) ** 2 > thr2 * v for xi in batch)
                xs = batch
            else:
                m, v = batch[0], 0.0
                xs = batch[1:]
            for xi in xs:
                d = xi - m
                m = m + alpha * d
                v = one_minus * (v + alpha * d * d)
            n += len(batch)
        expected[uid] = (n, m, v, alerts)

    assert set(got) == set(expected)
    assert sum(e[3] for e in expected.values()) > 0  # alerts actually fire
    for uid, (n, m, v, alerts) in expected.items():
        r = got[uid]
        assert r["n_events"] == n
        assert abs(r["ew_mean"] - m) < 1e-9 * max(1.0, abs(m))
        assert abs(r["ew_var"] - v) < 1e-9 * max(1.0, abs(v))
        assert r["n_alerts"] == alerts, uid
