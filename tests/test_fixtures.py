"""Corpus generator invariants: determinism, order independence, schema."""

import numpy as np

from honeywell_search_engine_spark.functions.analyzer import extract_text
from honeywell_search_engine_spark.sources import pages as P


def test_order_independent_generation(pages_pdf):
    ids = np.array([3, 77, 1500])
    vocab = np.array(P.vocabulary())
    probs = P._zipf_probs()
    sl = P._gen_rows(ids, vocab, probs, P.SEED)
    for j, i in enumerate(ids):
        assert sl.iloc[j].html == pages_pdf.iloc[i].html
        assert sl.iloc[j].text == pages_pdf.iloc[i].text


def test_text_is_extract_of_html(pages_pdf):
    sample = pages_pdf.head(300)
    for _, row in sample.iterrows():
        assert extract_text(row.html) == row.text


def test_urls_unique(pages_pdf):
    assert pages_pdf.url.is_unique


def test_zipf_head_skew(pages_pdf):
    """Head term must hit >30% of docs (drives the salting path)."""
    head = P.vocabulary()[0]
    frac = pages_pdf.text.str.lower().str.contains(head).mean()
    assert frac > 0.30


def test_lang_split(pages_pdf):
    assert (pages_pdf.lang == "en").mean() == 0.95


def test_spark_generation_matches_driver(spark, pages_pdf, tmp_path):
    """Distributed mapInPandas generation == driver-side generation."""
    out = str(tmp_path / "pages_spark.parquet")
    P.write_pages_table_spark(spark, out, 200, partitions=8)
    got = (
        spark.read.parquet(out)
        .select("url", "text", "lang")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    exp = (
        pages_pdf.head(200)[["url", "text", "lang"]]
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert got.equals(exp)
