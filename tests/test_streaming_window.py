"""Watermarked tumbling-window streaming aggregation: late data beyond the
watermark is dropped (SURVEY §2.7 'Streaming watermark / late data' row —
the reference bounds by offsets instead; event-time windows are an
extension this engine provides)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

EVENTS_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _rows(*specs):
    return [
        {
            "event_id": i,
            "ts": dt.datetime(2024, 1, 1, h, m),
            "user_id": 1,
            "event_type": et,
            "value": 1.0,
        }
        for i, (h, m, et) in enumerate(specs)
    ]


def test_late_data_dropped_by_watermark(spark, tmp_path):
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(EVENTS_DDL).parquet(str(src))
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "event_type", "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: events across 10:00-13:00 -> watermark advances to ~12:50
    spark.createDataFrame(
        _rows((10, 5, "click"), (10, 20, "click"), (11, 30, "view"), (13, 0, "click")),
        EVENTS_DDL,
    ).write.mode("append").parquet(str(src))
    run()
    # batch 2: one event far below the watermark (09:00 — late) and one new
    spark.createDataFrame(
        [
            {**r, "event_id": 100 + i}
            for i, r in enumerate(_rows((9, 0, "click"), (14, 0, "view")))
        ],
        EVENTS_DDL,
    ).write.mode("append").parquet(str(src))
    run()
    # close remaining windows so every on-time window is emitted
    spark.createDataFrame(_rows((16, 0, "click")), EVENTS_DDL).withColumn(
        "event_id", F.col("event_id") + 200
    ).write.mode("append").parquet(str(src))
    run()

    got = {
        (r.ws.hour, r.event_type): r.n for r in spark.read.parquet(out).collect()
    }
    # on-time windows present
    assert got[(10, "click")] == 2
    assert got[(11, "view")] == 1
    assert got[(13, "click")] == 1
    assert got[(14, "view")] == 1
    # the 09:00 late event was dropped: its window never appears
    assert (9, "click") not in got


def test_dedup_state_survives_checkpointed_restart(spark, tmp_path):
    """dropDuplicatesWithinWatermark state must persist across a query
    restart: an event redelivered AFTER the stream stopped and resumed
    from its checkpoint is still recognized as a duplicate — exactly-once
    across restarts, not just within one run."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_batch(rows):
        # file sink (memory sink cannot recover from a checkpoint); the
        # output dir accumulates across restarts, so assertions are on the
        # cumulative emitted set
        # list-of-dicts maps columns BY NAME (a pandas detour would map by
        # position and silently scramble on dict-order changes)
        spark.createDataFrame(rows, schema=EVENTS_DDL).write.mode(
            "append"
        ).parquet(src)
        q = (
            spark.readStream.schema(EVENTS_DDL)
            .parquet(src)
            .withWatermark("ts", "2 hours")
            .dropDuplicatesWithinWatermark(["event_id"])
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r.event_id, r.event_type)
            for r in spark.read.parquet(out).select("event_id", "event_type").collect()
        }

    first = _rows((10, 0, "view"), (10, 5, "click"))
    got1 = run_batch(first)
    assert got1 == {(0, "view"), (1, "click")}

    # restart: redeliver event 1 (same id, within the watermark) plus one
    # genuinely new event — only the new one may pass the restored state
    redelivery = [dict(first[1])] + _rows((10, 20, "purchase"))
    redelivery[-1]["event_id"] = 2
    got2 = run_batch(redelivery)
    assert got2 == {(0, "view"), (1, "click"), (2, "purchase")}, got2
