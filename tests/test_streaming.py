"""Structured-Streaming ingest: AvailableNow drains exactly the new files,
delta postings match the batch-computed postings, manifests are written."""

import json
import os
import shutil

from honeywell_search_engine_spark.index.corpus import (
    docs_from_pages,
    term_frequencies,
    tokenized_docs,
)
from honeywell_search_engine_spark.sources.pages import (
    PAGES_SCHEMA,
    generate_pages_pdf,
)
from honeywell_search_engine_spark.streaming.ingest import (
    delta_postings,
    stream_postings_delta,
)


def _write_slice(spark, pdf, lo, hi, path):
    os.makedirs(path, exist_ok=True)
    sl = spark.createDataFrame(pdf.iloc[lo:hi], schema=PAGES_SCHEMA)
    sl.coalesce(1).write.mode("append").parquet(path)


def test_incremental_ingest(spark, tmp_path):
    pdf = generate_pages_pdf(300)
    pages_dir = str(tmp_path / "pages_stream")
    out_dir = str(tmp_path / "delta_out")

    # first drop of files -> first drain
    _write_slice(spark, pdf, 0, 200, pages_dir)
    stream_postings_delta(spark, pages_dir, out_dir, n_buckets=8, n_shards=4)
    first_rows = delta_postings(spark, out_dir).count()
    assert first_rows > 0
    manifests = sorted(os.listdir(f"{out_dir}/manifests"))
    assert manifests
    m0 = json.load(open(f"{out_dir}/manifests/{manifests[0]}"))
    assert m0["status"] == "complete" and m0["rows"] > 0

    # second drop -> only the new files are processed (checkpointed offsets)
    _write_slice(spark, pdf, 200, 300, pages_dir)
    stream_postings_delta(spark, pages_dir, out_dir, n_buckets=8, n_shards=4)
    total_rows = delta_postings(spark, out_dir).count()
    assert total_rows > first_rows

    # delta postings (all batches unioned) == batch-computed postings over
    # the full corpus: identical (term, docid, tf) multiset
    pages = spark.read.schema(PAGES_SCHEMA).parquet(pages_dir)
    exp = term_frequencies(tokenized_docs(docs_from_pages(pages)))
    got = delta_postings(spark, out_dir)
    sym_diff = (
        got.select("term", "docid", "tf")
        .exceptAll(exp.select("term", "docid", "tf"))
        .union(
            exp.select("term", "docid", "tf").exceptAll(
                got.select("term", "docid", "tf")
            )
        )
        .count()
    )
    assert sym_diff == 0

    # idempotent re-run with nothing new: no new rows
    stream_postings_delta(spark, pages_dir, out_dir, n_buckets=8, n_shards=4)
    assert delta_postings(spark, out_dir).count() == total_rows
