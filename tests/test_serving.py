"""Serving-layer composition: guardrail semantics, fallback branch, intent
expansion — synthetic inputs that exercise BOTH branches (the driver gate at
sf0.01 only sees whichever branch the data happens to take)."""

from pyspark.sql import functions as F

from honeywell_search_engine_spark.operators.serving import (
    best_snippet,
    expand_query_intent,
    guardrail_filter,
    search_history_upsert,
    search_with_fallback,
)


def test_expand_query_intent():
    # reference embedder.py:36-43 — cue tables and the always-appended '.'
    assert (
        expand_query_intent("what are the drawbacks of X")
        == "what are the drawbacks of X. limitations drawbacks shortcomings disadvantages"
    )
    assert (
        expand_query_intent("study of effect")
        == "study of effect. investigation study analysis effect"
    )
    # limitation cues win over study cues (elif order)
    assert expand_query_intent("study the limitations").endswith("disadvantages")
    assert expand_query_intent("plain query") == "plain query."


def _fused(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, sem_score double, lex_score double, tri_score double"
    )


def test_guardrail_drops_weak_multi_sentence(spark):
    fused = _fused(
        spark,
        [
            (1, 0.39, 0.49, None),  # weak everywhere, no OIE -> dropped
            (2, 0.39, 0.49, 0.5),  # OIE rescues (search.py:153 'can rescue')
            (3, 0.8, 0.1, None),  # strong sem -> kept
            (4, 0.1, 0.9, None),  # strong lex -> kept
        ],
    )
    kept = sorted(
        r["user_id"] for r in guardrail_filter(fused, multi_sentence=True).collect()
    )
    assert kept == [2, 3, 4]
    # single-sentence queries: no guardrail at all
    assert guardrail_filter(fused, multi_sentence=False).count() == 4


def test_fallback_branch_fires_when_guarded_empty(spark):
    fused = _fused(spark, [(1, 0.2, 0.1, None), (2, 0.3, 0.2, None)])
    out = search_with_fallback(fused, multi_sentence=True).collect()
    assert {r["channel"] for r in out} == {"fallback"}
    # fallback confidence = floor(min(1, sem)*100) — semantic only
    conf = {r["user_id"]: r["confidence"] for r in out}
    assert conf == {1: 20, 2: 30}


def test_primary_branch_suppresses_fallback(spark):
    fused = _fused(spark, [(1, 0.9, 0.9, 1.0), (2, 0.1, 0.1, None)])
    out = search_with_fallback(fused, multi_sentence=True).collect()
    assert {r["channel"] for r in out} == {"primary"}
    assert sorted(r["user_id"] for r in out) == [1]  # 2 guarded away, not rescued


def test_search_history_upsert_refreshes_ts(spark):
    hist = spark.createDataFrame(
        [(1, "spark", 100), (1, "duck", 200)], "user_id long, query string, ts long"
    )
    add = spark.createDataFrame(
        [(1, "spark", 300), (2, "spark", 50)], "user_id long, query string, ts long"
    )
    out = {
        (r["user_id"], r["query"]): r["ts"]
        for r in search_history_upsert(hist, add).collect()
    }
    # same (user, query) -> newest ts wins; new keys insert
    assert out == {(1, "spark"): 300, (1, "duck"): 200, (2, "spark"): 50}


def test_best_snippet_picks_max_overlap_sentence(spark):
    docs = spark.createDataFrame(
        [
            (1, "Nothing relevant here at all, truly. Spark merges data tables quickly. Short."),
            (2, "Tiny."),  # no sentence > 20 chars -> ('', 0.0)
        ],
        "doc_id long, text string",
    )
    rows = {r["docid"]: r for r in best_snippet(docs, "data table merge").collect()}
    assert rows[1]["snippet"] == "Spark merges data tables quickly"
    assert rows[1]["overlap_r"] > 0.3
    assert rows[2]["snippet"] == "" and rows[2]["overlap_r"] == 0.0


def test_search_response_indexed_equals_inflight(spark, seg_index, pages_path):
    """The segment-served response row (search_response_indexed: WAND
    top-k + shared composition) must equal the in-flight gate row for
    every reference query — the round-2 verdict's missing composition."""
    from honeywell_search_engine_spark.index.corpus import docs_from_pages
    from honeywell_search_engine_spark.operators.serving import (
        search_response,
        search_response_indexed,
    )
    from honeywell_search_engine_spark.sources.pages import read_pages, reference_queries

    docs = docs_from_pages(read_pages(spark, pages_path)).select("docid", "text")
    checked = 0
    for qid, q in list(reference_queries().items())[::3]:  # every 3rd: runtime
        exp = [
            tuple(r)
            for r in search_response(docs, q, k=5, id_col="docid").collect()
        ]
        got = [
            tuple(r)
            for r in search_response_indexed(
                seg_index, docs, q, k=5, id_col="docid"
            ).collect()
        ]
        assert got == exp, (qid, q)
        checked += bool(exp)
    assert checked >= 4  # the sampled queries actually returned rows
