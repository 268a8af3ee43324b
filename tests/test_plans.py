"""Physical-plan quality assertions: the optimizations we rely on at scale
must be visible in the plan, not assumed.

- segment scans are partition-pruned by bucket and push the term filter;
- pages scans prune columns (html not read unless extraction requested);
- the naive BM25 plan ends in TakeOrderedAndProject (per-partition heaps),
  never a global Sort;
- the phase-2 encode plan contains NO Exchange (single-shuffle build).
"""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


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
