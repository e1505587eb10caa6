"""Stream-stream interval join (streaming/join.py)."""

from __future__ import annotations

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("user", StringType()),
        StructField("ts", TimestampType()),
        StructField("id", LongType()),
    ]
)


def _write(path, rows):
    path.write_text(
        "user,ts,id\n" + "\n".join(f"{u},{t},{i}" for u, t, i in rows) + "\n"
    )


def test_interval_join_matches_within_window(spark, tmp_path):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.streaming.join import (
        interval_join_streams,
    )

    ldir = tmp_path / "l"
    rdir = tmp_path / "r"
    ldir.mkdir()
    rdir.mkdir()
    _write(ldir / "a.csv", [
        ("u1", "2024-01-01 10:00:00", 1),
        ("u2", "2024-01-01 10:00:00", 2),
    ])
    _write(rdir / "b.csv", [
        ("u1", "2024-01-01 10:00:30", 101),  # within 60s -> match
        ("u1", "2024-01-01 10:05:00", 102),  # too late -> no match
        ("u2", "2024-01-01 09:59:59", 103),  # before left -> no match
    ])

    def read(d):
        return (
            spark.readStream.schema(SCHEMA)
            .option("header", "true")
            .csv(str(d))
        )

    l = read(ldir).withColumnRenamed("id", "l_id")
    r = read(rdir).withColumnRenamed("id", "r_id").withColumnRenamed(
        "ts", "r_ts"
    ).withColumnRenamed("user", "r_user")
    # align key names: interval_join_streams joins on a shared key column name
    joined = interval_join_streams(
        l,
        r.withColumnRenamed("r_user", "user"),
        key="user",
        left_ts="ts",
        right_ts="r_ts",
        max_delay_seconds=60,
    )
    q = (
        joined.select("l_id", "r_id")
        .writeStream.format("memory")
        .queryName("t_interval_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["l_id"], r["r_id"]) for r in spark.table("t_interval_join").collect()}
    assert got == {(1, 101)}


def test_left_outer_null_extension_is_watermark_driven(spark, tmp_path):
    """The defining left-outer behavior: unmatched left rows emit ONLY
    once the watermark passes their match horizon — and the watermark a
    micro-batch uses comes from the PREVIOUS batch's data. One file =
    one batch (maxFilesPerTrigger=1): batch 2's sentinel drags event
    time forward, batch 3 runs under that watermark and flushes the
    unmatched row. Without the trailing batches the unmatched row stays
    in state (checked first)."""
    import time as _time

    from pyspark.sql import functions as F

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.streaming.join import (
        interval_join_streams,
    )

    def run(ldir, name):
        l = (
            spark.readStream.schema(SCHEMA)
            .option("header", "true")
            .option("maxFilesPerTrigger", 1)
            .csv(str(ldir))
            .withColumnRenamed("id", "l_id")
        )
        r = (
            spark.readStream.schema(SCHEMA)
            .option("header", "true")
            .option("maxFilesPerTrigger", 1)
            .csv(str(ldir))
            .withColumnRenamed("id", "r_id")
            .withColumnRenamed("ts", "r_ts")
        )
        joined = interval_join_streams(
            l.filter(F.col("l_id") < 100),
            r.filter(F.col("r_id") >= 100),
            key="user",
            left_ts="ts",
            right_ts="r_ts",
            max_delay_seconds=60,
            watermark="1 seconds",
            how="left_outer",
        )
        q = (
            joined.select("l_id", "r_id")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (row["l_id"], row["r_id"])
            for row in spark.table(name).collect()
            if row["l_id"] < 90  # sentinels excluded
        }

    d1 = tmp_path / "one"
    d1.mkdir()
    _write(d1 / "b0.csv", [
        ("u1", "2024-01-01 10:00:00", 1),     # will match
        ("u1", "2024-01-01 10:00:30", 101),
        ("u2", "2024-01-01 10:00:00", 2),     # never matches
    ])
    # no trailing batches: the unmatched row must NOT be emitted
    assert run(d1, "t_lsj_held") == {(1, 101)}

    d2 = tmp_path / "two"
    d2.mkdir()
    now = _time.time()
    _write(d2 / "b0.csv", [
        ("u1", "2024-01-01 10:00:00", 1),
        ("u1", "2024-01-01 10:00:30", 101),
        ("u2", "2024-01-01 10:00:00", 2),
    ])
    # sentinels must advance BOTH sides' watermarks (the global watermark
    # is their min): one left-filtered id and one right-filtered id per
    # batch, on users that never match anything
    _write(d2 / "b1.csv", [
        ("u8", "2024-01-02 10:00:00", 90),
        ("u9", "2024-01-02 10:00:00", 190),
    ])
    _write(d2 / "b2.csv", [
        ("u8", "2024-01-03 10:00:00", 91),
        ("u9", "2024-01-03 10:00:00", 191),
    ])
    import os as _os

    for i, f in enumerate(["b0.csv", "b1.csv", "b2.csv"]):
        _os.utime(d2 / f, (now - 60 + 20 * i, now - 60 + 20 * i))
    # with the watermark advanced past u2's horizon, the null-extended
    # row flushes in batch 3
    assert run(d2, "t_lsj_flush") == {(1, 101), (2, None)}


def test_full_outer_null_extends_both_sides(spark, tmp_path):
    """full_outer completes the family: unmatched LEFT and RIGHT rows
    both null-extend once the watermark passes their horizons, and the
    matched pair emits exactly once."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.streaming.join import (
        interval_join_streams,
    )

    d = tmp_path / "fo"
    d.mkdir()
    now = _time.time()
    _write(d / "b0.csv", [
        ("u1", "2024-01-01 10:00:00", 1),     # matches 101
        ("u1", "2024-01-01 10:00:30", 101),
        ("u2", "2024-01-01 10:00:00", 2),     # left, never matches
        ("u3", "2024-01-01 10:00:00", 102),   # right, never matches
    ])
    _write(d / "b1.csv", [
        ("u8", "2024-01-02 10:00:00", 90),
        ("u9", "2024-01-02 10:00:00", 190),
    ])
    _write(d / "b2.csv", [
        ("u8", "2024-01-03 10:00:00", 91),
        ("u9", "2024-01-03 10:00:00", 191),
    ])
    for i, f in enumerate(["b0.csv", "b1.csv", "b2.csv"]):
        _os.utime(d / f, (now - 60 + 20 * i, now - 60 + 20 * i))

    l = (
        spark.readStream.schema(SCHEMA)
        .option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .csv(str(d))
        .withColumnRenamed("id", "l_id")
    )
    r = (
        spark.readStream.schema(SCHEMA)
        .option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .csv(str(d))
        .withColumnRenamed("id", "r_id")
        .withColumnRenamed("ts", "r_ts")
    )
    joined = interval_join_streams(
        l.filter(F.col("l_id") < 100),
        r.filter(F.col("r_id") >= 100),
        key="user",
        left_ts="ts",
        right_ts="r_ts",
        max_delay_seconds=60,
        watermark="1 seconds",
        how="full_outer",
    )
    q = (
        joined.select("l_id", "r_id")
        .writeStream.format("memory")
        .queryName("t_fsj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_fsj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (row["l_id"], row["r_id"])
        for row in spark.table("t_fsj").collect()
        if (row["l_id"] is None or row["l_id"] < 90)
        and (row["r_id"] is None or row["r_id"] < 190)
    }
    assert got == {(1, 101), (2, None), (None, 102)}


def test_interval_join_rejects_unknown_how(spark):
    import pytest as _pytest

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.streaming.join import (
        interval_join_streams,
    )

    with _pytest.raises(ValueError):
        interval_join_streams(None, None, "k", "a", "b", 1, how="right_outer")
