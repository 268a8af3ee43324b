"""FULL websearch_to_tsquery surface: the 'or' keyword + negated phrases.

Postgres semantics reproduced (reference uses websearch_to_tsquery,
backend/app/services/search/fusion.py:42): the bare word 'or' becomes the
| operator with AND binding tighter, so a query is a disjunction of
conjunctive groups; '-"a b"' is !(a <-> b). Round-3 advice items: the
'or' keyword was previously swallowed as a stopword (silent AND), and
negated quoted phrases raised ValueError at serving entry points.

Parity contract tested here: oracle == Spark segment path == serving node
== batch path, bit-exact; the in-flight match operator agrees with an
independent brute-force set evaluation of the same parsed groups.
"""

import numpy as np
import pytest

from honeywell_search_engine_spark.functions.analyzer import (
    analyze,
    parse_websearch_query,
    split_or_groups,
    tokenize,
)
from honeywell_search_engine_spark.sources.pages import reference_queries, vocabulary

QUERIES = reference_queries()
V = vocabulary()


# ---------------------------------------------------------------- parser


def test_split_or_groups_quote_aware():
    assert split_or_groups("sad cat or fat rat") == ["sad cat", "fat rat"]
    assert split_or_groups('a "x or y" b') == ['a "x or y" b']
    assert split_or_groups("a OR b or c") == ["a", "b", "c"]
    assert split_or_groups("or a or") == ["", "a", ""]


def test_parse_websearch_query_groups():
    gs = parse_websearch_query("sad cat or fat rat")
    assert [g[0] for g in gs] == [["cat", "sad"], ["fat", "rat"]]
    # negated phrase
    gs = parse_websearch_query('spark -"data table"')
    assert gs == [(["spark"], [], [], [["data", "table"]])]
    # negated single-word quote folds to plain negation (Postgres !word)
    gs = parse_websearch_query('spark -"vector"')
    assert gs == [(["spark"], ["vector"], [], [])]
    # contradictory group dropped, other group survives
    gs = parse_websearch_query("spark -spark or merge")
    assert gs == [(["merge"], [], [], [])]
    # phrase both required and negated: group can never match
    assert parse_websearch_query('"a b c" -"a b c"') == []
    # never raises on arbitrary input
    assert parse_websearch_query('-"sad cat"') == []
    assert parse_websearch_query("") == []
    assert parse_websearch_query("the of and") == []


# ------------------------------------------------- oracle vs brute force


def _brute_match(pdf_en, query):
    """Independent set-based evaluation of the parsed groups over the raw
    corpus (per-doc token streams, no inverted index)."""
    from honeywell_search_engine_spark.index.corpus import docid_py

    groups = parse_websearch_query(query)
    out = set()
    for url, text in zip(pdf_en.url, pdf_en.text):
        toks = analyze(text)
        tset = set(toks)

        def has_phrase(ph):
            m = len(ph)
            return any(
                toks[i : i + m] == ph for i in range(len(toks) - m + 1)
            )

        for all_pos, neg, phrases, neg_phrases in groups:
            if not set(all_pos) <= tset:
                continue
            if set(neg) & tset:
                continue
            if any(not has_phrase(ph) for ph in phrases):
                continue
            if any(has_phrase(ph) for ph in neg_phrases):
                continue
            out.add(docid_py(url))
            break
    return out


def _case_queries(pages_pdf):
    en = pages_pdf[pages_pdf.lang == "en"]
    a0, a1 = analyze(en.text.iloc[3])[:2]  # real adjacent pair
    b0, b1 = analyze(en.text.iloc[11])[:2]
    return [
        f"{V[0]} or {V[1]}",                       # OR of single terms
        f"{V[0]} {V[1]} or {V[5]} {V[6]}",         # OR of conjunctions
        f'"{a0} {a1}" or {V[2]}',                  # phrase group OR term
        f'{V[0]} -"{a0} {a1}"',                    # negated phrase
        f'"{b0} {b1}" -"{a0} {a1}" or {V[3]} -{V[4]}',  # everything mixed
        f"{V[0]} -{V[0]} or {V[1]}",               # contradiction drops grp 1
        f"{V[0]} or qqqqnohitterm",                # unknown-term group
        f'-"{a0} {a1}"',                           # nothing positive: empty
        f"{V[7]} or {V[7]}",                       # same group twice
    ]


def test_oracle_websearch_or_matches_brute_force(oracle, pages_pdf):
    en = pages_pdf[pages_pdf.lang == "en"]
    n_nonempty = 0
    for q in _case_queries(pages_pdf):
        exp = _brute_match(en, q)
        got = {d for d, _ in oracle.search_websearch(q, k=10**9)}
        assert got == exp, q
        n_nonempty += bool(exp)
    assert n_nonempty >= 6


def test_oracle_single_group_scoring_unchanged(oracle):
    """Union-presence scoring degrades to all-present scoring for a
    single conjunctive group: search_websearch == search, bit-exact."""
    for q in [QUERIES["q01"], QUERIES["q10"], QUERIES["q12"]]:
        assert oracle.search_websearch(q, k=10) == oracle.search(q, k=10)


def test_oracle_or_scores_union_presence(oracle):
    """A doc matched via one group still scores contributions from the
    other group's terms it happens to contain."""
    q = f"{V[0]} or {V[1]}"
    res = dict(oracle.search_websearch(q, k=10**9))
    both = [d for d, _ in oracle.search(f"{V[0]} {V[1]}", k=10**9)]
    only0 = set(oracle.postings[V[0]]) - set(oracle.postings[V[1]])
    assert both and only0
    d_both, d_only = both[0], next(iter(only0))
    # the doc containing both terms scores idf0*u0 + idf1*u1 (== AND score)
    and_scores = dict(oracle.search(f"{V[0]} {V[1]}", k=10**9))
    assert res[d_both] == and_scores[d_both]
    # the doc containing only V[0] scores exactly its single-term score
    single = dict(oracle.search(V[0], k=10**9))
    assert res[d_only] == single[d_only]


# --------------------------------------- engine parity (all three paths)


def test_websearch_or_segment_serving_batch_match_oracle(
    spark, seg_index, oracle, pages_pdf
):
    from honeywell_search_engine_spark.query.local import ServingIndex
    from honeywell_search_engine_spark.query.wand import (
        bm25_topk_websearch,
        bm25_topk_websearch_batch,
    )

    sv = ServingIndex(seg_index.path)
    cases = _case_queries(pages_pdf)
    per_query = {}
    n_nonempty = 0
    for q in cases:
        exp = oracle.search_websearch(q, k=10)
        got = [
            (r["docid"], r["score"])
            for r in bm25_topk_websearch(seg_index, q, k=10).collect()
        ]
        assert got == exp, q
        assert sv.search_websearch(q, k=10) == exp, q
        per_query[q] = exp
        n_nonempty += bool(exp)
    assert n_nonempty >= 6
    # one-job batch == per-query, including the OR/neg-phrase queries
    qids = {f"q{i:02d}": q for i, q in enumerate(cases)}
    rows = bm25_topk_websearch_batch(seg_index, qids, k=10).collect()
    got_batch: dict[str, list] = {qid: [] for qid in qids}
    for r in rows:
        got_batch[r["qid"]].append((r["docid"], r["score"]))
    for qid, q in qids.items():
        assert got_batch[qid] == per_query[q], q


def test_negated_quote_never_raises_at_entry_points(spark, seg_index):
    """Round-3 advice: a user-typed '-\"quoted phrase\"' query must not
    crash any serving surface."""
    from honeywell_search_engine_spark.query.cache import CachedSearcher
    from honeywell_search_engine_spark.query.local import ServingIndex
    from honeywell_search_engine_spark.query.wand import bm25_topk_websearch

    q = '-"sad cat"'
    assert bm25_topk_websearch(seg_index, q, k=10).collect() == []
    assert ServingIndex(seg_index.path).search_websearch(q, k=10) == []
    cs = CachedSearcher(seg_index)
    assert cs.search_websearch(q, k=10) == []


# ----------------------------------------------------- in-flight operator


def test_match_websearch_or_inflight(spark, pages_path, pages_pdf):
    from honeywell_search_engine_spark.index.corpus import docs_from_pages
    from honeywell_search_engine_spark.operators.search import match_websearch_or
    from honeywell_search_engine_spark.sources.pages import read_pages

    docs = docs_from_pages(read_pages(spark, pages_path))
    en = pages_pdf[pages_pdf.lang == "en"]
    a0, a1 = analyze(en.text.iloc[3])[:2]
    cases = [
        f"{V[0]} or {V[1]}",
        f'{V[0]} -"{a0} {a1}" or "{a0} {a1}" -{V[2]}',
        f"{V[0]} -{V[0]} or {V[3]}",
        "the of and",
    ]
    for q in cases:
        exp = sorted(_brute_match(en, q))
        got = [
            r["docid"]
            for r in match_websearch_or(docs, q, id_col="docid").collect()
        ]
        assert got == exp, q
