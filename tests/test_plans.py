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


def test_match_filter_stays_above_spread_exchange(spark):
    """_stage_pin (r7 late): the expensive match predicate must NOT be
    pushed below a repartition — on the sandbox's single-file corpora the
    pushed form runs the whole tokenize+match on the scan's 1-2 input
    splits and duplicates the tokenizer into every conjunct (match_and at
    the 10x corpus: 2.19 s pushed vs 0.67 s pinned, identical rows)."""
    from honeywell_search_engine_spark.operators.search import match_all_terms

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = match_all_terms(docs.repartition(4), "spark merge vector")
    plan = physical_plan(df)
    # the pinned Filter must sit ABOVE the spread exchange (the text
    # below the RoundRobin node is just the scan); its condition may
    # still show per-conjunct copies of the tokenizer — those are CSE'd
    # at runtime within the one Filter operator
    below_spread = plan.split("Exchange RoundRobinPartitioning", 1)[1]
    assert "- Filter" not in below_spread, (
        "match predicate was pushed below the spread exchange"
    )


def test_bm25_candidate_filter_stays_above_spread_exchange(spark):
    """Same contract for bm25_inflight's candidate (presence) filter."""
    from honeywell_search_engine_spark.operators.search import bm25_inflight

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = bm25_inflight(docs.repartition(4), "merge spark", k=10)
    plan = physical_plan(df)
    # the candidate filter must not sink below either subtree's spread
    for seg in plan.split("Exchange RoundRobinPartitioning")[1:]:
        scan_part = seg.split("FileScan", 1)[0]
        assert "- Filter" not in scan_part, (
            "bm25 candidate filter was pushed below the spread exchange"
        )


def test_term_stats_hash_feed_single_group_exchange(spark):
    """A docid-partitioned feed must satisfy the (docid, term) tf
    aggregate's ClusteredDistribution (subset rule): the whole
    term_stats plan then holds exactly TWO shuffles — the feed
    repartition and the per-term aggregate — and the token multiset
    never crosses the wire (r7 late: exchanges 3 -> 2, -62% at 10x)."""
    from pyspark.sql import functions as F

    from honeywell_search_engine_spark.operators.search import term_stats_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = term_stats_table(docs.repartition(4, F.col("doc_id")))
    plan = physical_plan(df)
    assert plan.count("Exchange") == 2, plan


def test_session_excludes_infer_filters_from_generate(spark):
    """get_spark sessions must exclude InferFiltersFromGenerate: the
    inferred size(gen)>0 filter re-evaluates the full generator
    expression per row (for chunk_stats that expression is the Arrow
    chunking UDF — the old plan ran ArrowEvalPython twice)."""
    assert "InferFiltersFromGenerate" in spark.conf.get(
        "spark.sql.optimizer.excludedRules", ""
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
    df = docs.select(F.explode(toks).alias("t"))
    plan = physical_plan(df)
    assert plan.count("regexp_extract_all") == 1, plan


def test_segment_index_point_query_session(spark, seg_index):
    """SegmentIndex (r7 late) runs its queries on an isolated session
    clone with AQE off — point queries' single-digit-row exchanges gain
    nothing from adaptive stage materialization (~40 ms/query fixed
    cost measured). Builder-level conf must be inherited; the caller's
    session must keep AQE; isolate_session=False opts out."""
    from honeywell_search_engine_spark.index.segments import SegmentIndex

    q = seg_index.spark
    assert q is not spark
    assert q.sparkContext is spark.sparkContext
    assert q.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert q.conf.get("spark.sql.shuffle.partitions") == spark.conf.get(
        "spark.sql.shuffle.partitions"
    )
    raw = SegmentIndex(spark, seg_index.path, isolate_session=False)
    assert raw.spark is spark


def test_wand_sql_tail_plan_shape(seg_index):
    """The SQL-built wand query must keep the plan the DataFrame chain
    produced: partition-pruned segment scan with the term filter pushed,
    broadcast idf join, and a TakeOrderedAndProject tail (never a global
    Sort) — the py4j trim is a construction change, not a plan change."""
    from honeywell_search_engine_spark.query.wand import bm25_topk_wand

    df = bm25_topk_wand(seg_index, "data search", k=10)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Sort ") == 0 or "Sort [" not in plan.split(
        "TakeOrderedAndProject"
    )[0]
    scan_part = plan.split("PushedFilters", 1)[1][:200] if "PushedFilters" in plan else ""
    assert "term" in scan_part
