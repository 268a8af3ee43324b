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


def test_merge_deltas_exact(spark, tmp_path):
    """Streamed deltas merged into a base index == a from-scratch build of
    the full corpus: bit-exact query results vs a full-corpus oracle."""
    from honeywell_search_engine_spark.index.corpus import docid_py
    from honeywell_search_engine_spark.index.maintenance import merge_deltas
    from honeywell_search_engine_spark.index.segments import SegmentIndex, build_segments
    from honeywell_search_engine_spark.oracle import OracleIndex
    from honeywell_search_engine_spark.query.wand import bm25_topk_wand
    from honeywell_search_engine_spark.sources.pages import marker_term

    pdf = generate_pages_pdf(400)
    base_dir = str(tmp_path / "pages_base")
    idx_dir = str(tmp_path / "idx")
    _write_slice(spark, pdf, 0, 250, base_dir)
    base = spark.read.schema(PAGES_SCHEMA).parquet(base_dir)
    build_segments(
        tokenized_docs(docs_from_pages(base)), idx_dir, base_dir,
        n_buckets=8, n_shards=4, buckets_per_job=8,
    )

    # stream the remaining 150 docs as a delta, then merge
    stream_dir = str(tmp_path / "pages_stream2")
    delta_dir = str(tmp_path / "delta2")
    _write_slice(spark, pdf, 250, 400, stream_dir)
    stream_postings_delta(spark, stream_dir, delta_dir, n_buckets=8, n_shards=4)
    summary = merge_deltas(spark, idx_dir, delta_dir)
    assert summary["docs_added"] > 0

    idx = SegmentIndex(spark, idx_dir)
    en = pdf[pdf.lang == "en"]
    oracle = OracleIndex.build([(docid_py(u), t) for u, t in zip(en.url, en.text)])
    assert idx.stats.n_docs == oracle.n_docs
    assert abs(idx.stats.avgdl - oracle.avgdl) < 1e-9
    for q in ("data", "data search", marker_term(0), marker_term(2)):
        exp = oracle.search(q, k=10)
        got = [
            (r["docid"], r["score"]) for r in bm25_topk_wand(idx, q, k=10).collect()
        ]
        assert got == exp, q
