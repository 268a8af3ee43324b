"""Streaming deduplication: drop re-deliveries / re-crawls in-flight.

The crawl-side counterpart of operators/crawl.latest_capture_per_url and
operators/dedup.exact_duplicates: a continuous ingest sees the same page
(or the same event, on at-least-once buses) more than once; dropping the
repeats BEFORE they reach the index/ingest sink is cheaper than compacting
them out later.

Two built-in strategies, both pure Structured Streaming (state managed by
the engine, no custom processor needed):

- ``dedup_stream``: exact key dedup with ``dropDuplicatesWithinWatermark``
  — state for a key is held only until the watermark passes it, so state
  is bounded by (arrival rate x watermark delay), not by corpus size.
  This is the 10^12-row-safe configuration; plain ``dropDuplicates`` on a
  stream would grow state forever.
- ``dedup_stream_exact_text``: same, keyed by md5 of normalized text
  (content identity, not URL identity) — catches mirrors/reposts within
  the watermark horizon.

Cross-horizon duplicates (the same page recrawled a month later) are out
of streaming state by design; they are the batch passes' job
(latest_capture_per_url / exact_duplicates / MinHash-LSH).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon: the FIRST
    arrival of each key passes, later arrivals are dropped until the
    watermark moves past the key's event time (then its state is evicted
    — bounded memory at any input scale)."""
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_stream_exact_text(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Content-identity streaming dedup: key = md5 of the normalized text
    (same normalization contract as operators/dedup.exact_duplicates)."""
    from honeywell_search_engine_spark.operators.dedup import _norm_text

    with_h = stream.withColumn("_h", F.md5(_norm_text(text_col)))
    return (
        with_h.withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )
