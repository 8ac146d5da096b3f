"""Late-data semantics under Structured Streaming: a watermarked
windowed aggregation finalizes windows once the watermark passes, and
events arriving after that are DROPPED (the crawl-feed posture: late
re-fetches of an hour already emitted don't mutate it).

Two availableNow drains over a growing directory make this
deterministic: batch 1 advances the watermark; batch 2 delivers one
in-time and one too-late event."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, value double")
    df.coalesce(1).write.mode("append").parquet(path)


def test_windowed_agg_drops_late_events(spark, tmp_path):
    in_dir = str(tmp_path / "ev_in")
    out_dir = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def h(hours, minutes=0):
        return t0 + dt.timedelta(hours=hours, minutes=minutes)

    # batch 1: two events in hour 0, max event time = hour 6 → with a
    # 1-hour watermark the hour-0 window closes
    _write_events(spark, in_dir, [("u", h(0, 10), 1.0),
                                  ("u", h(0, 20), 1.0),
                                  ("u", h(6), 1.0)])

    schema = spark.read.parquet(in_dir).schema

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 hour")
        )
        agg = (
            stream.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("hour"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    first = {(r["hour"], r["n"])
             for r in spark.read.parquet(out_dir).collect()}
    # hour-0 window finalized with exactly the 2 on-time events
    assert (t0, 2) in first, first

    # batch 2: one LATE event for hour 0 (watermark at ~hour 5) and
    # one on-time event at hour 7 (closes the hour-6 window)
    _write_events(spark, in_dir, [("u", h(0, 30), 1.0),
                                  ("u", h(7), 1.0)])
    drain()
    final = {(r["hour"], r["n"])
             for r in spark.read.parquet(out_dir).collect()}
    # the late event did NOT reopen or duplicate the hour-0 window
    assert (t0, 2) in final and (t0, 3) not in final, final
    hour0_rows = [x for x in final if x[0] == t0]
    assert hour0_rows == [(t0, 2)], final
    # batch 3: an hour-10 event pushes the watermark past the END of
    # the hour-6 and hour-7 windows → both finalize
    _write_events(spark, in_dir, [("u", h(10), 1.0)])
    drain()
    final3 = {(r["hour"], r["n"])
              for r in spark.read.parquet(out_dir).collect()}
    assert (t0 + dt.timedelta(hours=6), 1) in final3, final3
    assert (t0 + dt.timedelta(hours=7), 1) in final3, final3
