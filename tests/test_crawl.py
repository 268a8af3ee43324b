"""URL canonicalization + latest-capture dedup (operators/crawl.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from honeywell_search_engine_spark.operators.crawl import (
    canonical_url_col,
    latest_capture_per_url,
)


def test_canonical_url_rules(spark):
    cases = [
        # (raw, canonical)
        ("HTTP://Example.COM/Path", "http://example.com/Path"),
        ("https://example.com:443/a", "https://example.com/a"),
        ("http://example.com:80/a?b=1", "http://example.com/a?b=1"),
        ("http://example.com/a#frag", "http://example.com/a"),
        ("http://example.com/a/", "http://example.com/a"),
        ("http://example.com/", "http://example.com/"),
        ("http://example.com/a?utm_source=x&b=1&utm_medium=y", "http://example.com/a?b=1"),
        ("http://example.com/a?z=2&a=1", "http://example.com/a?a=1&z=2"),
        ("http://example.com/a?gclid=123", "http://example.com/a"),
        ("http://example.com/a?fbclid=9&ref=t&keep=v", "http://example.com/a?keep=v"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [
        r["c"] for r in df.select(canonical_url_col(F.col("url")).alias("c")).collect()
    ]
    for (raw, exp), g in zip(cases, got):
        assert g == exp, (raw, g, exp)


def test_latest_capture_per_url(spark):
    rows = [
        ("http://a.com/x?utm_source=1", datetime(2024, 1, 1), "old"),
        ("HTTP://A.com/x", datetime(2024, 2, 1), "new"),      # same canonical
        ("http://a.com/x#frag", datetime(2024, 1, 15), "mid"),
        ("http://b.com/y", datetime(2024, 1, 1), "only"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    out = {r["canonical_url"]: r["text"] for r in latest_capture_per_url(df).collect()}
    assert out == {"http://a.com/x": "new", "http://b.com/y": "only"}
    # exactly one row per canonical url
    assert latest_capture_per_url(df).count() == 2
