"""Porter stemmer: algorithm pins, vectorized parity, stemmed-index
engine==oracle identity (reference T8/T9: Postgres to_tsvector('english')
stems via Snowball — backend/migrations/003_add_lexical_and_triples.sql:32;
this engine implements the published Porter 1980 ancestor, opt-in)."""

import pytest

from honeywell_search_engine_spark.functions.stemmer import stem, stem_tokens
from honeywell_search_engine_spark.index.corpus import (
    docid_py,
    docs_from_pages,
    tokenized_docs,
)
from honeywell_search_engine_spark.index.segments import SegmentIndex, build_segments
from honeywell_search_engine_spark.oracle import OracleIndex
from honeywell_search_engine_spark.query.wand import bm25_topk_wand
from honeywell_search_engine_spark.sources.pages import read_pages, reference_queries

QUERIES = reference_queries()


# --- algorithm pins: the worked examples from Porter 1980 -------------------

# (word, after-full-stem) — step examples from the paper that survive the
# later steps unchanged, plus the paper's own multi-step showcase words.
PAPER_PAIRS = [
    # step 1a
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "ti"),
    ("caress", "caress"),
    ("cats", "cat"),
    # step 1b (+ cleanup rules)
    ("feed", "feed"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),  # 1b -> conflate, step5a drops e (m=2)
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    # step 1c
    ("happy", "happi"),
    ("sky", "sky"),
    # the paper's full-pipeline showcases
    ("generalizations", "gener"),
    ("oscillators", "oscil"),
    # everyday surface forms collapsing onto one stem
    ("running", "run"),
    ("runs", "run"),
    ("connected", "connect"),
    ("connecting", "connect"),
    ("connection", "connect"),
    ("connections", "connect"),
    ("relational", "relat"),
    ("searching", "search"),
    ("searches", "search"),
    ("indexed", "index"),
    ("indexing", "index"),
]


@pytest.mark.parametrize("word,expected", PAPER_PAIRS)
def test_porter_paper_pairs(word, expected):
    assert stem(word) == expected


def test_short_words_unchanged():
    for w in ("a", "is", "as", "by"):
        assert stem(w) == w


def test_memoized_batch_equals_scalar():
    words = [w for w, _ in PAPER_PAIRS] * 3
    assert stem_tokens(words) == [stem(w) for w in words]


# --- vectorized (Arrow) parity ---------------------------------------------


def test_stem_udf_matches_pure_kernel(spark, pages_path):
    """stem_tokens_udf over the corpus == pure-Python stem_tokens per row."""
    from honeywell_search_engine_spark.index.corpus import stem_tokens_udf

    docs = docs_from_pages(read_pages(spark, pages_path)).limit(200)
    tok = tokenized_docs(docs)
    got = {
        r["docid"]: r["stemmed"]
        for r in tok.select(
            "docid", stem_tokens_udf("tokens").alias("stemmed")
        ).collect()
    }
    ref = {
        r["docid"]: stem_tokens(list(r["tokens"]))
        for r in tok.select("docid", "tokens").collect()
    }
    assert got == ref


# --- stemmed index: engine == oracle ---------------------------------------


@pytest.fixture(scope="module")
def stemmed_pair(spark, pages_path, pages_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stemidx") / "idx")
    pages = read_pages(spark, pages_path)
    tok = tokenized_docs(docs_from_pages(pages), stem=True)
    build_segments(
        tok, out, pages_path, n_buckets=16, n_shards=4, buckets_per_job=8,
        stemmed=True,
    )
    en = pages_pdf[pages_pdf.lang == "en"]
    oracle = OracleIndex.build(
        [(docid_py(u), t) for u, t in zip(en.url, en.text)], stem=True
    )
    return SegmentIndex(spark, out), oracle


@pytest.mark.parametrize("name", sorted(QUERIES)[:8])
def test_stemmed_wand_bit_identical_to_stemmed_oracle(stemmed_pair, name):
    idx, oracle = stemmed_pair
    q = QUERIES[name]
    exp = oracle.search(q, k=10)
    got = [(r["docid"], r["score"]) for r in bm25_topk_wand(idx, q, k=10).collect()]
    assert got == exp, name


def test_stemmed_index_flag_persisted(stemmed_pair):
    idx, _ = stemmed_pair
    assert idx.stemmed is True


def test_surface_forms_collapse(stemmed_pair, seg_index):
    """'indexing' on a stemmed index matches every doc whose surface form
    is 'index'/'indexed'/'indexes' — strictly more hits than unstemmed."""
    idx, oracle = stemmed_pair
    stemmed_hits = oracle.search("indexing", k=10**9)
    plain_terms = {"indexing"}
    # every docid the UNSTEMMED engine finds for any surface form is found
    # by the stemmed engine for the single query 'indexing'
    got = {d for d, _ in stemmed_hits}
    for surface in ("indexing", "indexed", "indexes"):
        rows = bm25_topk_wand(seg_index, surface, k=10**9).collect()
        for r in rows:
            assert r["docid"] in got, (surface, r["docid"])
    assert plain_terms  # silence lint


def test_stemmed_websearch_matches_oracle(stemmed_pair):
    from honeywell_search_engine_spark.query.wand import bm25_topk_websearch

    idx, oracle = stemmed_pair
    for q in ('"data processing" -legacy', "running or indexing", "systems -running"):
        exp = oracle.search_websearch(q, k=10)
        got = [
            (r["docid"], r["score"])
            for r in bm25_topk_websearch(idx, q, k=10).collect()
        ]
        assert got == exp, q


def test_stemmed_phrase_matches_oracle(stemmed_pair):
    from honeywell_search_engine_spark.query.wand import bm25_topk_phrase

    idx, oracle = stemmed_pair
    exp = oracle.search_phrase("data processing", k=10)
    got = [
        (r["docid"], r["score"])
        for r in bm25_topk_phrase(idx, "data processing", k=10).collect()
    ]
    assert got == exp


def test_serving_stemmed_matches_spark(stemmed_pair):
    from honeywell_search_engine_spark.query.local import ServingIndex

    idx, oracle = stemmed_pair
    srv = ServingIndex(idx.path)
    assert srv.stemmed is True
    for name in sorted(QUERIES)[:5]:
        q = QUERIES[name]
        assert srv.search(q, k=10) == oracle.search(q, k=10), name


def test_resume_refuses_stemmed_flag_mismatch(spark, pages_path, stemmed_pair):
    idx, _ = stemmed_pair
    pages = read_pages(spark, pages_path)
    tok = tokenized_docs(docs_from_pages(pages))
    with pytest.raises(ValueError, match="stemmed"):
        build_segments(
            tok, idx.path, pages_path, n_buckets=16, n_shards=4,
            stemmed=False,
        )


def test_inflight_stemmed_matches_pure_python(spark):
    """bm25_inflight(stem=True) == pure-Python stemmed BM25 on a tiny DF."""
    from honeywell_search_engine_spark.operators import search

    rows = [
        (1, "running the indexing jobs connects systems"),
        (2, "run index job connect system"),
        (3, "ran the marathon"),
        (4, "connection connections connected running runs"),
        (5, "completely unrelated words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    oracle = OracleIndex.build(rows, stem=True)
    for q in ("running index", "connections", "run"):
        exp = [(d, round(s, 6)) for d, s in oracle.search(q, k=10)]
        got = [
            (r["docid"], r["score_r"])
            for r in search.bm25_inflight(docs, q, k=10, stem=True).collect()
        ]
        assert got == exp, q


def test_stem_groups_contradiction_post_stem():
    """'running -runs' only becomes contradictory AFTER stemming."""
    from honeywell_search_engine_spark.functions.analyzer import (
        parse_websearch_query,
        stem_groups,
    )

    groups = parse_websearch_query("running -runs")
    assert groups  # unstemmed: distinct terms, valid group
    assert stem_groups(groups) == []  # stemmed: run & !run -> dropped


# --- property tests (hypothesis) -------------------------------------------


def test_stem_properties():
    """stem() never errors, never lengthens a word by more than the one
    'e' restoration, never empties a non-empty word, and is a pure
    function of its input (memo-consistent)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from honeywell_search_engine_spark.functions.stemmer import stem, stem_word

    @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", max_size=40))
    @settings(max_examples=500, deadline=None)
    def check(w):
        s = stem(w)
        assert isinstance(s, str)
        assert len(s) <= len(w) + 1  # 1b's 'e' restore is the only growth
        if w:
            assert s
        assert stem_word(w) == s  # memoized path identical

    check()


def test_index_report_surface(spark, seg_index):
    """index_report: every bucket present, checksums verify, counts sum to
    the segment totals."""
    from pyspark.sql import functions as F

    from honeywell_search_engine_spark.index.segments import index_report

    rep = index_report(spark, seg_index.path)
    rows = rep.collect()
    assert len(rows) == seg_index.n_buckets
    assert all(r["status"] == "complete" for r in rows)
    assert all(r["checksum_ok"] for r in rows)
    total = seg_index.segments.agg(F.sum("n")).collect()[0][0]
    assert sum(r["n_postings"] for r in rows) == total


# --- non-fixed-point stems: websearch delegation must NOT re-stem -----------
# Porter is not idempotent: stem('university')='univers' but
# stem('univers')='univ'; stem('doing')='do' which the MIN_TOKEN_LEN
# filter then drops on re-analysis. The plain-AND websearch path delegates
# already-stemmed group terms into bm25_topk_wand / ServingIndex.search —
# those must take them pre-analyzed (round-4 advice, wand.py:1090 /
# local.py:234).


@pytest.fixture(scope="module")
def nonfp_stemmed_pair(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nonfpidx") / "idx")
    rows = [
        (1, "the university was doing research on distributed systems"),
        (2, "universities keep doing fundamental research programs"),
        (3, "a university library holds many studies and archives"),
        (4, "the research group published new distributed algorithms"),
        (5, "completely unrelated cooking recipes and garden notes"),
    ]
    docs = spark.createDataFrame(rows, "docid long, text string")
    tok = tokenized_docs(docs, pre_cleaned=True, stem=True)
    build_segments(tok, out, "inline", n_buckets=4, n_shards=2, stemmed=True)
    oracle = OracleIndex.build(rows, stem=True)
    return SegmentIndex(spark, out), oracle


def test_websearch_no_double_stem_spark(nonfp_stemmed_pair):
    from honeywell_search_engine_spark.query.wand import bm25_topk_websearch

    idx, oracle = nonfp_stemmed_pair
    for q in ("university doing", "university research", "doing -cooking"):
        exp = oracle.search_websearch(q, k=10)
        got = [
            (r["docid"], r["score"])
            for r in bm25_topk_websearch(idx, q, k=10).collect()
        ]
        assert exp, q  # the query must actually match on this corpus
        assert got == exp, q


def test_websearch_no_double_stem_serving(nonfp_stemmed_pair):
    from honeywell_search_engine_spark.query.local import ServingIndex

    idx, oracle = nonfp_stemmed_pair
    srv = ServingIndex(idx.path)
    for q in ("university doing", "university research", "doing -cooking"):
        exp = oracle.search_websearch(q, k=10)
        assert exp, q
        assert srv.search_websearch(q, k=10) == exp, q


def test_stem_groups_phrase_terms_survive_cap():
    """>MAX_QUERY_TERMS loose stems + a quoted phrase: the phrase terms
    must stay in all_pos (the cap hits only the loose stems), or
    adjacency verification KeyErrors (round-4 advice, analyzer.py:282)."""
    from honeywell_search_engine_spark.functions.analyzer import (
        MAX_QUERY_TERMS,
        parse_websearch_query,
        stem_groups,
    )

    # 14 distinct loose words whose stems stay distinct, plus a phrase
    # whose stems sort AFTER every loose stem ('zebra zoom')
    loose = (
        "apple banana cherry dragon elder falcon grape hazel iris "
        "jackal kiwi lemon mango nectar"
    )
    q = f'{loose} "zebra zoom"'
    groups = stem_groups(parse_websearch_query(q))
    assert len(groups) == 1
    all_pos, _neg, phrases, _nph = groups[0]
    assert phrases and len(phrases[0]) == 2
    for t in phrases[0]:
        assert t in all_pos, (t, all_pos)
    # loose portion still capped
    assert len(all_pos) <= MAX_QUERY_TERMS + len(phrases[0])


def test_batch_paths_stem_like_per_query(nonfp_stemmed_pair):
    """The BATCH query paths must switch analyzers with the index exactly
    like the per-query paths (found in round 5: wand/phrase batch used the
    unstemmed analyzers unconditionally, so stemmed-index batches diverged
    from per-query results)."""
    from honeywell_search_engine_spark.query.wand import (
        bm25_topk_phrase,
        bm25_topk_phrase_batch,
        bm25_topk_wand,
        bm25_topk_wand_batch,
    )

    idx, oracle = nonfp_stemmed_pair
    queries = {
        "u": "university research",      # stems: univers, research
        "d": "universities doing",        # surface forms collapse
        "s": "studies archives",
    }
    batch = bm25_topk_wand_batch(idx, queries, k=10).collect()
    got = {}
    for r in batch:
        got.setdefault(r["qid"], []).append((r["docid"], r["score"]))
    any_hits = False
    for qid, q in queries.items():
        exp = [
            (r["docid"], r["score"])
            for r in bm25_topk_wand(idx, q, k=10).collect()
        ]
        assert got.get(qid, []) == exp, qid
        assert exp == oracle.search(q, k=10), qid
        any_hits |= bool(exp)
    assert any_hits  # batch actually matched on the stemmed corpus

    ph = {"p": "university library"}
    pbatch = bm25_topk_phrase_batch(idx, ph, k=10).collect()
    pgot = [(r["docid"], r["score"]) for r in pbatch]
    pexp = [
        (r["docid"], r["score"])
        for r in bm25_topk_phrase(idx, "university library", k=10).collect()
    ]
    assert pgot == pexp and pexp == oracle.search_phrase("university library", k=10)
    assert pexp  # the stemmed phrase really matches doc 3
