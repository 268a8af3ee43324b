"""Watermarked windowed aggregation over the event stream.

The reference has no stream-analytics surface (its asynchrony is Celery
task chaining); this is the Spark-native capability the engine's event
tables call for: event-time tumbling windows with a watermark bounding
late-data state. Deterministic and batch-replayable: the same query over
the same files yields the same windows whether run as a stream
(Trigger.AvailableNow) or as a batch DataFrame — tested both ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(window_start, window_end, event_type, n, total_value) per tumbling
    event-time window. On a streaming DataFrame the watermark bounds state:
    windows older than max(event time) - watermark are finalized and their
    state dropped — the knob that keeps a 100 TB/day stream's aggregation
    memory constant. On a batch DataFrame the same plan runs windowed
    group-by (watermark is a no-op), which is what makes it oracle-testable.
    """
    df = events
    if df.isStreaming:
        # watermarks require TIMESTAMP; event tables often carry
        # TIMESTAMP_NTZ — cast for the streaming path (the batch/oracle
        # path windows the NTZ column directly; the stream-equals-batch
        # test applies the same cast on both sides)
        if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(type_col))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(type_col),
            "n",
            "total_value",
        )
    )


def run_windowed_counts_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Drain the available event files through the watermarked windowed
    aggregation (Trigger.AvailableNow) into parquet; complete-mode output
    via foreachBatch overwrite (the aggregate is small: windows x types)."""
    checkpoint_dir = checkpoint_dir or f"{out_dir}/_checkpoint"
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_event_counts(stream, window, watermark)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/windows")

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
