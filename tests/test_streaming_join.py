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
