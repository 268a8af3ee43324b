"""Oracle BM25 engine: hand-computed scores on a micro corpus."""

import math

from honeywell_search_engine_spark import B, K1
from honeywell_search_engine_spark.oracle import OracleIndex

DOCS = [
    (1, "spark index engine index"),
    (2, "spark query engine"),
    (3, "unrelated words entirely different"),
    (4, "index index index spark spark query"),
]


def _bm25(tf, dl, avgdl, n, df):
    idf = math.log1p((n - df + 0.5) / (df + 0.5))
    # idf * (u): the shared association-order contract (see oracle.py)
    return idf * (tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl)))


def test_stats():
    oi = OracleIndex.build(DOCS)
    assert oi.n_docs == 4
    assert oi.avgdl == (4 + 3 + 4 + 6) / 4
    assert oi.doclen[1] == 4
    assert oi.postings["index"] == {1: 2, 4: 3}


def test_single_term_scores():
    oi = OracleIndex.build(DOCS)
    res = oi.search("index", k=10)
    exp = sorted(
        [
            (d, _bm25(tf, oi.doclen[d], oi.avgdl, 4, 2))
            for d, tf in oi.postings["index"].items()
        ],
        key=lambda x: (-x[1], x[0]),
    )
    assert res == exp


def test_conjunction_and_semantics():
    oi = OracleIndex.build(DOCS)
    res = oi.search("spark query", k=10)
    assert {d for d, _ in res} == {2, 4}
    # per-doc score = sum of term scores in lexicographic term order
    for d, s in res:
        exp = _bm25(oi.postings["query"][d], oi.doclen[d], oi.avgdl, 4, 2) + _bm25(
            oi.postings["spark"][d], oi.doclen[d], oi.avgdl, 4, 3
        )
        assert s == exp


def test_unknown_term_empty():
    oi = OracleIndex.build(DOCS)
    assert oi.search("spark zzzmissing") == []
    assert oi.search("the of and") == []


def test_tiebreak_by_docid():
    oi = OracleIndex.build([(7, "aaa bbb"), (3, "aaa bbb"), (5, "aaa bbb")])
    res = oi.search("aaa", k=10)
    assert [d for d, _ in res] == [3, 5, 7]
