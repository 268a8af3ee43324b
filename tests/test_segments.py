"""Segment index: WAND engine rank/bit identity, resume, invariance."""

import json
import os
import shutil

import pytest

from honeywell_search_engine_spark.index.corpus import docs_from_pages, tokenized_docs
from honeywell_search_engine_spark.index.segments import (
    SegmentIndex,
    build_segments,
    bucket_checksum,
)
from honeywell_search_engine_spark.query.wand import bm25_topk_wand
from honeywell_search_engine_spark.sources.pages import read_pages, reference_queries

QUERIES = reference_queries()


def _build(spark, pages_path, out, **kw):
    pages = read_pages(spark, pages_path)
    tok = tokenized_docs(docs_from_pages(pages))
    build_segments(tok, out, pages_path, **kw)
    return SegmentIndex(spark, out)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_wand_bit_identical_to_oracle(seg_index, oracle, name):
    q = QUERIES[name]
    exp = oracle.search(q, k=10)
    got = [
        (r["docid"], r["score"]) for r in bm25_topk_wand(seg_index, q, k=10).collect()
    ]
    assert got == exp, name  # bit-exact scores AND identical ranks


def test_wand_equals_naive(seg_index, naive_index):
    """WAND pruning is lossless vs the exhaustive Catalyst engine."""
    from honeywell_search_engine_spark.query.naive import bm25_topk_naive

    for name in ("q01", "q06", "q10", "q12", "q14"):
        q = QUERIES[name]
        a = [(r["docid"], r["score"]) for r in bm25_topk_naive(naive_index, q, 10).collect()]
        b = [(r["docid"], r["score"]) for r in bm25_topk_wand(seg_index, q, 10).collect()]
        assert a == b, name


def test_or_mode_superset(seg_index, oracle):
    """OR top-k contains every AND hit's docid score >= its AND score; with
    a single term OR == AND bit-exactly."""
    got_or = [
        (r["docid"], r["score"])
        for r in bm25_topk_wand(seg_index, QUERIES["q06"], k=10, mode="or").collect()
    ]
    got_and = [
        (r["docid"], r["score"])
        for r in bm25_topk_wand(seg_index, QUERIES["q06"], k=10).collect()
    ]
    assert got_or == got_and


def test_resume_rebuilds_identically(spark, pages_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resume") / "idx")
    _build(spark, pages_path, out, n_buckets=8, n_shards=4, buckets_per_job=4)
    before = {
        b: json.load(open(f"{out}/manifests/bucket_{b}.json")) for b in range(8)
    }
    # simulate a crash: two buckets lose their manifests and segment files
    for b in (2, 5):
        os.remove(f"{out}/manifests/bucket_{b}.json")
        shutil.rmtree(f"{out}/segments/bucket={b}", ignore_errors=True)
    phase1_before = open(f"{out}/manifests/phase1.json").read()
    _build(spark, pages_path, out, n_buckets=8, n_shards=4, buckets_per_job=4)
    # phase 1 untouched, killed buckets rebuilt byte-identically (content
    # checksum), others untouched
    assert open(f"{out}/manifests/phase1.json").read() == phase1_before
    for b in range(8):
        after = json.load(open(f"{out}/manifests/bucket_{b}.json"))
        assert after["checksum"] == before[b]["checksum"], b
        assert after["rows"] == before[b]["rows"], b
        assert after["postings"] == before[b]["postings"], b


def test_resume_refuses_changed_input(spark, pages_path, tmp_path_factory, tmp_path):
    from honeywell_search_engine_spark.sources.pages import write_pages_table

    out = str(tmp_path_factory.mktemp("fpr") / "idx")
    _build(spark, pages_path, out, n_buckets=4, n_shards=2)
    other = str(tmp_path / "other_pages.parquet")
    write_pages_table(other, 50)
    pages = read_pages(spark, other)
    tok = tokenized_docs(docs_from_pages(pages))
    os.remove(f"{out}/manifests/bucket_1.json")
    with pytest.raises(ValueError, match="different input"):
        build_segments(tok, out, other, n_buckets=4, n_shards=2)


def test_partition_count_invariance(spark, pages_path, tmp_path_factory, seg_index):
    """Same corpus built under a different shuffle-partition count yields
    identical per-bucket content checksums (SURVEY.md §5.5)."""
    out2 = str(tmp_path_factory.mktemp("inv") / "idx")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        _build(spark, pages_path, out2, n_buckets=16, n_shards=4, buckets_per_job=16)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    for b in range(16):
        m1 = json.load(open(f"{seg_index.path}/manifests/bucket_{b}.json"))
        m2 = json.load(open(f"{out2}/manifests/bucket_{b}.json"))
        assert m1["checksum"] == m2["checksum"], b
        assert m1["postings"] == m2["postings"], b


def test_batch_wand_equals_per_query(seg_index):
    """The one-job batch path returns exactly the per-query results."""
    from honeywell_search_engine_spark.query.wand import (
        bm25_topk_wand,
        bm25_topk_wand_batch,
    )

    batch = bm25_topk_wand_batch(seg_index, QUERIES, k=10)
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], []).append((r["docid"], r["score"]))
    for name, q in QUERIES.items():
        exp = [
            (r["docid"], r["score"])
            for r in bm25_topk_wand(seg_index, q, k=10).collect()
        ]
        assert got.get(name, []) == exp, name
