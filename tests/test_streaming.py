"""Structured Streaming tests: checkpointed file ingest, windowed aggs with
watermark, streaming dedup — all driven with trigger(availableNow=True)
micro-batches so runs are finite and assertable (SURVEY.md section 5 plan).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.streaming.ingest import (
    stream_ingest_files,
    stream_to_memory,
)
from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.streaming.windows import (
    streaming_dedup,
    streaming_tumbling_agg,
    tumbling_agg,
)

CSV_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
    ]
)

EV_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("value", LongType()),
    ]
)


def test_stream_ingest_discovers_only_new_files(spark, tmp_path):
    src = tmp_path / "landing"
    src.mkdir()
    sink = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")

    (src / "a.csv").write_text("id,name\n1,x\n2,y\n")
    stream_ingest_files(spark, str(src), sink, ckpt, CSV_SCHEMA)
    assert spark.read.parquet(sink).count() == 2

    # second run: only the new file is ingested (checkpointed discovery)
    (src / "b.csv").write_text("id,name\n3,z\n")
    stream_ingest_files(spark, str(src), sink, ckpt, CSV_SCHEMA)
    out = spark.read.parquet(sink)
    assert out.count() == 3
    assert {r["id"] for r in out.collect()} == {1, 2, 3}

    # third run with nothing new: no-op
    stream_ingest_files(spark, str(src), sink, ckpt, CSV_SCHEMA)
    assert spark.read.parquet(sink).count() == 3


def test_stream_ingest_with_transform(spark, tmp_path):
    src = tmp_path / "landing"
    src.mkdir()
    (src / "a.csv").write_text("id,name\n1,x\n")
    sink = str(tmp_path / "bronze")
    stream_ingest_files(
        spark, str(src), sink, str(tmp_path / "ck"), CSV_SCHEMA,
        transform=lambda df: df.withColumn("name_upper", F.upper("name")),
    )
    row = spark.read.parquet(sink).collect()[0]
    assert row["name_upper"] == "X"


def _write_events(path, rows):
    import pandas as pd

    pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"]).astype(
        {"ts": "datetime64[us]"}
    ).to_parquet(path)


def test_streaming_window_agg_matches_batch(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        (1, "2024-01-01 00:05:00", 1, 10),
        (2, "2024-01-01 00:55:00", 1, 20),
        (3, "2024-01-01 01:10:00", 2, 30),
        (4, "2024-01-01 02:20:00", 2, 40),
    ]
    _write_events(src / "p1.parquet", rows)

    stream = spark.readStream.schema(EV_SCHEMA).parquet(str(src))
    agg = streaming_tumbling_agg(
        stream, "ts", "1 hour", "10 minutes", [],
        [F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")],
    )
    stream_to_memory(agg, "win_out", output_mode="complete")
    got = {
        r["window_start"]: (r["n"], r["sv"])
        for r in spark.table("win_out").collect()
    }

    batch = tumbling_agg(
        spark.read.schema(EV_SCHEMA).parquet(str(src)), "ts", "1 hour", [],
        [F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")],
    )
    expected = {
        r["window_start"]: (r["n"], r["sv"]) for r in batch.collect()
    }
    assert got == expected
    assert got["2024-01-01 00:00:00"] == (2, 30)


def test_streaming_watermark_drops_too_late_events(spark, tmp_path):
    """Watermark semantics are one-sided: within a single availableNow run
    late input may be admitted; on a NEW run the watermark is restored from
    the checkpoint and input older than it is dropped. This test models the
    realistic case: a late file arriving between two checkpointed runs."""
    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    collected: list[tuple[int, dict]] = []

    def sink(df, batch_id):
        collected.append(
            (batch_id, {r["window_start"]: r["n"] for r in df.collect()})
        )

    def run_once():
        stream = spark.readStream.schema(EV_SCHEMA).parquet(str(src))
        agg = streaming_tumbling_agg(
            stream, "ts", "1 hour", "1 hour", [],
            [F.count(F.lit(1)).alias("n")],
        )
        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    # run 1 advances the checkpointed watermark to 09:00 (max 10:00 - 1h)
    _write_events(src / "p1.parquet", [(1, "2024-01-01 09:00:00", 1, 1),
                                       (2, "2024-01-01 10:00:00", 1, 1)])
    run_once()
    # run 2: one event 8h late (beyond watermark) + one on time
    _write_events(src / "p2.parquet", [(3, "2024-01-01 01:00:00", 1, 1),
                                       (4, "2024-01-01 10:30:00", 1, 1)])
    q2 = run_once()

    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q2.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1  # the 01:00 event was discarded
    run2_windows = {w for _, out in collected[2:] for w in out}
    assert "2024-01-01 01:00:00" not in run2_windows
    assert any(out.get("2024-01-01 10:00:00") == 2 for _, out in collected[2:])


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    _write_events(src / "p1.parquet", [
        (1, "2024-01-01 00:00:00", 1, 1),
        (1, "2024-01-01 00:00:30", 1, 1),  # dup key within watermark
        (2, "2024-01-01 00:01:00", 1, 1),
    ])
    stream = spark.readStream.schema(EV_SCHEMA).parquet(str(src))
    dd = streaming_dedup(stream, ["event_id"], "ts", "10 minutes")
    stream_to_memory(dd, "dedup_out")
    assert spark.table("dedup_out").count() == 2


def test_incremental_ingest_idempotent(spark, tmp_path, sf_dir):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.sources.ingest import (
        ingest_batch_hwm,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    sink = str(tmp_path / "sink")
    ev.filter(F.col("o_orderkey") < 500).write.parquet(sink)
    n0 = spark.read.parquet(sink).count()
    appended = ingest_batch_hwm(spark, ev, sink, "o_orderkey")
    assert appended == ev.count() - n0
    assert ingest_batch_hwm(spark, ev, sink, "o_orderkey") == 0  # no-op re-run
    assert spark.read.parquet(sink).count() == ev.count()


def test_enrich_stream_static_left_join(spark, tmp_path):
    import pytest as _pytest

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.streaming.join import (
        enrich_stream,
    )

    src = tmp_path / "events"
    src.mkdir()
    _write_events(src / "p1.parquet", [
        (1, "2024-01-01 00:00:00", 10, 1),
        (2, "2024-01-01 00:01:00", 20, 1),
        (3, "2024-01-01 00:02:00", 99, 1),  # no dim match -> null segment
    ])
    stream = spark.readStream.schema(EV_SCHEMA).parquet(str(src))
    dim = spark.createDataFrame(
        [(10, "RETAIL"), (20, "WHOLESALE")], ["user_id", "segment"]
    )
    out = enrich_stream(stream, dim, ["user_id"], how="left")
    stream_to_memory(out, "enrich_out")
    rows = {r["event_id"]: r["segment"] for r in spark.table("enrich_out").collect()}
    assert rows == {1: "RETAIL", 2: "WHOLESALE", 3: None}

    with _pytest.raises(ValueError):
        enrich_stream(stream, dim, ["user_id"], how="full")


def test_streaming_session_late_events_beyond_watermark_are_dropped(spark, tmp_path):
    """Append-mode session windows under late data (update mode is
    unsupported for session aggregations): a session is emitted exactly
    once — when the checkpointed watermark passes its end — and events
    older than the watermark are dropped rather than resurrecting a
    finalized session. The emitted/withheld split must equal the batch
    session aggregation over the ADMITTED events, restricted to the
    watermark horizon (sessions ending after the final watermark stay
    withheld)."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.streaming.windows import (
        session_agg,
        streaming_session_agg,
    )

    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    emitted: dict[str, int] = {}

    def sink(df, batch_id):
        for r in df.collect():
            assert r["session_start"] not in emitted  # append = exactly once
            emitted[r["session_start"]] = r["n"]

    def run_once():
        stream = spark.readStream.schema(EV_SCHEMA).parquet(str(src))
        agg = streaming_session_agg(
            stream, "ts", "30 minutes", "1 hour", ["user_id"],
            [F.count(F.lit(1)).alias("n")],
        )
        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    # run 1: a session (09:00,09:10) closed by the gap, then 12:00 —
    # watermark reaches 11:00, past the first session's 09:40 end, so it
    # is finalized and emitted; the 12:00 session stays open/withheld
    _write_events(src / "p1.parquet", [(1, "2024-01-01 09:00:00", 1, 1),
                                       (2, "2024-01-01 09:10:00", 1, 1),
                                       (3, "2024-01-01 12:00:00", 1, 1)])
    run_once()
    assert emitted == {"2024-01-01 09:00:00": 2}

    # run 2: 09:20 would have extended the finalized session but is older
    # than the watermark -> dropped; 12:10 merges into the open session
    _write_events(src / "p2.parquet", [(4, "2024-01-01 09:20:00", 1, 1),
                                       (6, "2024-01-01 12:10:00", 1, 1)])
    q2 = run_once()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q2.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1  # the 09:20 event was discarded
    assert emitted == {"2024-01-01 09:00:00": 2}  # nothing resurrected

    # run 3: 14:00 pushes the watermark to 13:00, past the merged
    # (12:00,12:10) session's 12:40 end -> it is emitted with BOTH events;
    # the 14:00 session itself stays withheld
    _write_events(src / "p3.parquet", [(7, "2024-01-01 14:00:00", 1, 1)])
    run_once()
    assert emitted == {"2024-01-01 09:00:00": 2, "2024-01-01 12:00:00": 2}

    # emitted == batch oracle over admitted events, restricted to the
    # final watermark horizon (13:00); the 14:00 session is beyond it
    admitted = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 1, 1), (2, "2024-01-01 09:10:00", 1, 1),
         (3, "2024-01-01 12:00:00", 1, 1), (6, "2024-01-01 12:10:00", 1, 1),
         (7, "2024-01-01 14:00:00", 1, 1)],
        "event_id long, ts string, user_id long, value long",
    ).withColumn("ts", F.to_timestamp("ts"))
    batch = {
        r["session_start"]: r["n"]
        for r in session_agg(
            admitted, "ts", "30 minutes", ["user_id"],
            [F.count(F.lit(1)).alias("n")],
        ).collect()
        if r["session_end"] <= "2024-01-01 13:00:00"
    }
    assert emitted == batch
