"""Streaming dedup (dropDuplicatesWithinWatermark): re-deliveries within
the watermark horizon are dropped across micro-batches; first arrival
wins; content-identity variant keys on normalized text."""

import os
import time

from pyspark.sql import functions as F

from honeywell_search_engine_spark.streaming.dedup import (
    dedup_stream,
    dedup_stream_exact_text,
)

SCHEMA = "event_id long, ts timestamp, text string"


def _write_feed(spark, events_dir, batches):
    os.makedirs(events_dir, exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, SCHEMA)
        path = f"{events_dir}/slice_{i}.parquet"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        t = time.time() + i  # strictly increasing mtimes -> arrival order
        for root, _, files in os.walk(path):
            for fn in files:
                os.utime(os.path.join(root, fn), (t, t))


def _drain(spark, events_dir, out_dir, dedup_fn):
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(events_dir)
    )
    q = (
        dedup_fn(stream)
        .writeStream.format("parquet")
        .option("path", f"{out_dir}/rows")
        .option("checkpointLocation", f"{out_dir}/_cp")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{out_dir}/rows")


def test_key_dedup_across_microbatches(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, sec, txt):
        return (i, t0 + dt.timedelta(seconds=sec), txt)

    batches = [
        [ev(1, 0, "a"), ev(2, 10, "b")],
        [ev(1, 20, "a-redelivery"), ev(3, 30, "c")],  # dup key 1 (in horizon)
        [ev(2, 40, "b-redelivery"), ev(4, 50, "d")],  # dup key 2
    ]
    events_dir = str(tmp_path / "feed1")
    _write_feed(spark, events_dir, batches)
    out = _drain(
        spark,
        f"{events_dir}/slice_*.parquet",
        str(tmp_path / "out1"),
        lambda st: dedup_stream(st, ["event_id"], "ts", "10 minutes"),
    )
    rows = {r["event_id"]: r["text"] for r in out.collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    assert rows[1] == "a" and rows[2] == "b"  # FIRST arrival wins


def test_content_dedup_ignores_formatting(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    batches = [
        [(1, t0, "Same Text here!")],
        [(2, t0 + dt.timedelta(seconds=5), "same text  HERE")],  # normalizes same
        [(3, t0 + dt.timedelta(seconds=9), "different entirely")],
    ]
    events_dir = str(tmp_path / "feed2")
    _write_feed(spark, events_dir, batches)
    out = _drain(
        spark,
        f"{events_dir}/slice_*.parquet",
        str(tmp_path / "out2"),
        lambda st: dedup_stream_exact_text(st, "text", "ts", "10 minutes"),
    )
    got = sorted(r["event_id"] for r in out.collect())
    assert got == [1, 3]  # the reformatted repost was dropped in-stream


def test_state_bounded_by_watermark(spark, tmp_path):
    """A duplicate arriving AFTER the watermark passed its key is NOT
    dropped — state was evicted (the bounded-memory contract; the batch
    passes own cross-horizon dedup)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    batches = [
        [(1, t0, "x")],
        # event time far ahead -> watermark advances past key 1's state
        [(9, t0 + dt.timedelta(hours=2), "advance")],
        # spacer: eviction by the advanced watermark lands at the END of
        # the batch AFTER the advance (watermark propagation is one batch
        # behind the data that moved it)
        [(8, t0 + dt.timedelta(hours=2, seconds=2), "spacer")],
        [(1, t0 + dt.timedelta(hours=2, seconds=3), "x-again")],
    ]
    events_dir = str(tmp_path / "feed3")
    _write_feed(spark, events_dir, batches)
    out = _drain(
        spark,
        f"{events_dir}/slice_*.parquet",
        str(tmp_path / "out3"),
        lambda st: dedup_stream(st, ["event_id"], "ts", "10 minutes"),
    )
    texts = sorted(r["text"] for r in out.collect())
    assert texts == ["advance", "spacer", "x", "x-again"]
