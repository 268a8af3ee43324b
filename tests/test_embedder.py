"""Hashed TF-IDF embedder (operators/embedder.py): determinism, semantic
behavior, and the end-to-end hybrid path (R3/N3 analog — reference embeds
via sentence-transformers, backend/app/services/embeddings/embedder.py)."""

import pytest
from pyspark.sql import functions as F

from honeywell_search_engine_spark.operators import embedder

ROWS = [
    (1, "spark merge vector table data spark merge"),
    (2, "merge spark table vector spark data merge"),  # permutation of 1
    (3, "spark merge vector table data extra words appended here"),
    (4, "orthogonal unrelated vocabulary banana piano"),
    (5, "the and of is"),  # stopwords only -> no tokens
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_embedding_shape_and_rounding(docs):
    out = embedder.text_embeddings(docs).collect()
    # doc 5 has no corpus-known tokens -> no embedding row
    assert sorted(r["docid"] for r in out) == [1, 2, 3, 4]
    for r in out:
        assert len(r["embedding"]) == embedder.DIM
        for v in r["embedding"]:
            assert v == round(v, 6)


def test_token_multiset_determines_embedding(docs):
    out = {r["docid"]: list(r["embedding"]) for r in embedder.text_embeddings(docs).collect()}
    assert out[1] == out[2]  # same token multiset, different order
    assert out[1] != out[3]
    assert out[1] != out[4]


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    return dot / (na * nb)


def test_cosine_orders_by_topical_overlap(docs):
    out = {r["docid"]: list(r["embedding"]) for r in embedder.text_embeddings(docs).collect()}
    sim_close = _cos(out[1], out[3])  # shares 5 terms (high-df -> low idf,
    # so the absolute cosine is modest: doc 3's rare terms dominate its norm)
    sim_far = _cos(out[1], out[4])  # shares none
    assert sim_close > 0.2
    assert sim_close > sim_far + 0.2


def test_semantic_topk_ranks_overlap_first(docs):
    got = [
        (r["rnk"], r["docid"])
        for r in embedder.semantic_topk(docs, "spark merge data", k=10).collect()
    ]
    # docs 1/2 tie on identical embeddings (docid ascending), then 3
    assert [d for _, d in got[:3]] == [1, 2, 3]


def test_semantic_topk_empty_query(docs):
    assert embedder.semantic_topk(docs, "the of and", k=10).count() == 0


def test_semantic_topk_stemmed_collapses_forms(spark):
    rows = [
        (1, "running indexes connects"),
        (2, "run index connect"),
        (3, "banana piano violin"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        r["docid"]
        for r in embedder.semantic_topk(docs, "runs indexing", k=3, stem=True).collect()
    ]
    # stemmed: docs 1 and 2 both match the stemmed query terms
    assert set(got[:2]) == {1, 2}


def test_embeddings_feed_similarity_operators(docs):
    """text_embeddings output plugs straight into the similarity suite."""
    from honeywell_search_engine_spark.operators import similarity

    emb = embedder.text_embeddings(docs).select(
        F.col("docid").alias("vec_id"), "embedding"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in similarity.pairwise_cosine_dupes(emb, threshold=0.999).collect()
    }
    assert (1, 2) in pairs  # permuted docs are exact dupes in cosine space


def test_plan_has_no_rowwise_python(docs):
    from honeywell_search_engine_spark.plans import (
        assert_no_rowwise_python,
        physical_plan,
    )

    df = embedder.text_embeddings(docs)
    assert_no_rowwise_python(df)
    # embedder is pure column expressions: no Python eval operator at all
    assert "ArrowEvalPython" not in physical_plan(df)
