"""Physical-plan quality assertions: the optimizations we rely on at scale
must be visible in the plan, not assumed.

- segment scans are partition-pruned by bucket and push the term filter;
- pages scans prune columns (html not read unless extraction requested);
- the naive BM25 plan ends in TakeOrderedAndProject (per-partition heaps),
  never a global Sort;
- the phase-2 encode plan contains NO Exchange (single-shuffle build).
"""

from pyspark.sql import functions as F

from honeywell_search_engine_spark.plans import optimized_plan, physical_plan

_plan = physical_plan
_optimized = optimized_plan


def test_segment_scan_partition_pruned(seg_index):
    df = seg_index.segments_for(["data", "search"])
    plan = _plan(df)
    assert "PartitionFilters" in plan
    # bucket dir pruning present (bucket IN (...)) and term pushdown reaches
    # the parquet source
    assert "bucket" in plan.split("PartitionFilters")[1][:200]
    assert "PushedFilters" in plan and "term" in plan.split("PushedFilters")[1][:200]


def test_pages_scan_prunes_html(spark, pages_path):
    from honeywell_search_engine_spark.index.corpus import docs_from_pages
    from honeywell_search_engine_spark.sources.pages import read_pages

    docs = docs_from_pages(read_pages(spark, pages_path))
    plan = _plan(docs)
    schema_part = plan.split("ReadSchema")[1][:300] if "ReadSchema" in plan else plan
    assert "html" not in schema_part, "html must be pruned from the scan"
    assert "lang" in plan  # pushed filter on lang


def test_naive_topk_uses_takeordered(naive_index):
    from honeywell_search_engine_spark.query.naive import bm25_topk_naive

    df = bm25_topk_naive(naive_index, "data search", k=10)
    assert "TakeOrderedAndProject" in _plan(df)


def test_phase2_encode_plan_has_no_exchange(spark, seg_index):
    """The encode read path (postings scan -> mapInPandas) must not
    shuffle: groups are file-contiguous by construction."""
    from honeywell_search_engine_spark.index.segments import make_segment_encoder, SEGMENT_SCHEMA

    rows = (
        spark.read.parquet(f"{seg_index.path}/postings")
        .filter(F.col("bucket").isin([0, 1]))
        .select("term", "shard", "lid", "doclen")
    )
    enc = rows.mapInPandas(make_segment_encoder(100.0, 16), schema=SEGMENT_SCHEMA)
    assert "Exchange" not in _plan(enc)


def test_docmap_assignment_is_tokenizer_free(spark, pages_path):
    """Local-id assignment needs only the docid set: the plan must prune
    away text/tokens entirely (no Arrow UDF, no tokenize)."""
    from honeywell_search_engine_spark.index.corpus import docs_from_pages, tokenized_docs
    from honeywell_search_engine_spark.index.docmap import assign_local_ids
    from honeywell_search_engine_spark.sources.pages import read_pages

    tok = tokenized_docs(docs_from_pages(read_pages(spark, pages_path)))
    dm = assign_local_ids(tok.select("docid"), 4)
    plan = _plan(dm)
    assert "ArrowEvalPython" not in plan
    schema_part = plan.split("ReadSchema")[1][:200] if "ReadSchema" in plan else plan
    assert "text" not in schema_part


def test_query_rehydrate_broadcasts_kernel_output(seg_index):
    """The docmap rehydration join must broadcast the tiny kernel-output
    side (never shuffle the docmap), and the final cut must stay a
    TakeOrderedAndProject."""
    from honeywell_search_engine_spark.query.wand import bm25_topk_wand

    plan = _plan(bm25_topk_wand(seg_index, "data search", k=10))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    # no sort-merge join anywhere in the per-query path
    assert "SortMergeJoin" not in plan


def test_phrase_scan_pruned_and_projected(seg_index):
    """Phrase queries scan only the phrase terms' buckets and read the
    position stream from the segment files (pushdown + pruning intact)."""
    from honeywell_search_engine_spark.query.wand import bm25_topk_phrase

    plan = _plan(bm25_topk_phrase(seg_index, "data search", k=10))
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:200]
    assert "positions" in plan  # positional stream projected to the kernel


def test_rerank_plan_shape(spark):
    """rerank_topk: candidate semi-join broadcasts, final top-k via a
    single window over 50 rows (no Exchange storm), features stay as
    column expressions (no Python eval in the plan)."""
    from honeywell_search_engine_spark.operators.serving import rerank_topk
    from honeywell_search_engine_spark.plans import (
        has_broadcast_join,
        physical_plan,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = rerank_topk(docs, "data table query", k_in=50, k_out=10)
    plan = physical_plan(df)
    assert has_broadcast_join(df)  # candidate ids ride a broadcast
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert bad not in plan  # features are pure column expressions


def test_docmap_assignment_single_job_no_collect(spark, pages_path):
    """assign_local_ids is ONE lazy plan: building it triggers no Spark
    job (the round-4 version ran an eager count+collect before returning);
    the cell-offset table rides a broadcast join."""
    from honeywell_search_engine_spark.index.corpus import docs_from_pages
    from honeywell_search_engine_spark.index.docmap import assign_local_ids
    from honeywell_search_engine_spark.plans import has_broadcast_join
    from honeywell_search_engine_spark.sources.pages import read_pages

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    docs = docs_from_pages(read_pages(spark, pages_path)).select("docid")
    dm = assign_local_ids(docs, 4)  # must not run anything yet
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "lid assignment must be lazy (no eager job)"
    assert has_broadcast_join(dm)
    assert dm.count() > 0  # and it still computes
