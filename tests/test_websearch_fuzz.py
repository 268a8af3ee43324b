"""Property fuzz over the FULL websearch grammar: randomized query strings
(loose terms, quoted phrases, '-' negation, negated phrases, the OR
keyword, unknown words, stopwords, repeats) against a fixed corpus —
ServingIndex (the production serving path, same kernels as the Spark
plans, which are separately pinned bit-identical) must equal the
pure-Python OracleIndex on every query, on BOTH an unstemmed and a
Porter-stemmed index (the stemmed path exercises non-fixed-point stems
through the delegation fix)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from honeywell_search_engine_spark.index.corpus import tokenized_docs
from honeywell_search_engine_spark.index.segments import build_segments
from honeywell_search_engine_spark.oracle import OracleIndex
from honeywell_search_engine_spark.query.local import ServingIndex

VOCAB = [
    "alpha", "beta", "gamma", "delta", "universe", "university", "doing",
    "search", "data", "table", "running", "runs", "connected", "studies",
]
EXTRA = ["zzznope", "qqq", "or", "the", "and"]  # unknown + keyword + stopwords

DOCS = [
    (1, "alpha beta gamma delta search data"),
    (2, "university doing research data table alpha"),
    (3, "running runs connected studies beta beta"),
    (4, "data table data table university search"),
    (5, "gamma delta universe running alpha data"),
    (6, "search engine table studies doing universe"),
    (7, "beta gamma university running data search table"),
    (8, "alpha alpha alpha beta"),
]


@pytest.fixture(scope="module", params=[False, True], ids=["plain", "stemmed"])
def pair(request, spark, tmp_path_factory):
    stem = request.param
    out = str(tmp_path_factory.mktemp(f"fuzzidx_{stem}") / "idx")
    docs = spark.createDataFrame(DOCS, "docid long, text string")
    tok = tokenized_docs(docs, pre_cleaned=True, stem=stem)
    build_segments(tok, out, "inline", n_buckets=4, n_shards=2, stemmed=stem)
    return ServingIndex(out), OracleIndex.build(DOCS, stem=stem)


def _queries():
    word = st.sampled_from(VOCAB + EXTRA)
    loose = word
    neg = word.map(lambda w: f"-{w}")
    phrase = st.lists(word, min_size=1, max_size=3).map(
        lambda ws: '"' + " ".join(ws) + '"'
    )
    negphrase = phrase.map(lambda p: "-" + p)
    token = st.one_of(loose, neg, phrase, negphrase, st.just("or"))
    return st.lists(token, min_size=1, max_size=6).map(" ".join)


def test_websearch_grammar_fuzz(pair):
    srv, oracle = pair

    @given(_queries())
    @settings(max_examples=200, deadline=None)
    def check(q):
        assert srv.search_websearch(q, k=20) == oracle.search_websearch(q, k=20), q

    check()


def test_and_or_fuzz(pair):
    srv, oracle = pair
    word = st.sampled_from(VOCAB + ["zzznope"])

    @given(st.lists(word, min_size=1, max_size=4).map(" ".join),
           st.sampled_from(["and", "or"]))
    @settings(max_examples=150, deadline=None)
    def check(q, mode):
        exp = oracle.search(q, k=20) if mode == "and" else oracle.search_or(q, k=20)
        assert srv.search(q, k=20, mode=mode) == exp, (q, mode)

    check()


def test_positional_fuzz(pair):
    """Phrase / ordered-NEAR / unordered-NEAR: serving == oracle across
    randomized term pairs+slop/dist on both index variants."""
    srv, oracle = pair
    word = st.sampled_from(VOCAB + ["zzznope"])

    @given(word, word, st.integers(min_value=0, max_value=4))
    @settings(max_examples=150, deadline=None)
    def check(a, b, slop):
        ph = f"{a} {b}"
        assert srv.search_phrase(ph, k=20, slop=slop) == oracle.search_phrase(
            ph, k=20, slop=slop
        ), (ph, slop)
        # unordered needs two distinct analyzed terms
        from honeywell_search_engine_spark.functions.analyzer import tokenize
        toks = tokenize(ph)
        if srv.stemmed:
            from honeywell_search_engine_spark.functions.stemmer import stem_tokens
            toks = stem_tokens(toks)
        if len(toks) == 2 and toks[0] != toks[1] and slop >= 1:
            assert srv.search_near_unordered(
                ph, k=20, dist=slop
            ) == oracle.search_near_unordered(ph, k=20, dist=slop), (ph, slop)

    check()
