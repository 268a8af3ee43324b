"""Analyzer kernel tests: pure semantics + Arrow/pandas + JVM parity.

The per-row invariant (input_hint): extracted text is byte-identical per
url between the pure oracle kernel and every vectorized engine path.
"""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from honeywell_search_engine_spark.functions.analyzer import (
    analyze_query,
    clean_series,
    clean_text,
    extract_series,
    extract_text,
    normalize_series,
    normalize_text,
    tokenize,
    tokens_col,
)


def test_normalize_semantics():
    # reference: backend/app/worker/tasks.py:64-71
    assert normalize_text("  Hello, WORLD!!  a_b-c ") == "hello world abc"
    assert normalize_text("") == ""
    assert normalize_text("...") == ""


def test_clean_semantics():
    # reference: backend/app/worker/tasks.py:120-133
    raw = "page 3\nReal text here\nCONFIDENTIAL\n2 / 10\nhyph- enated"
    assert clean_text(raw) == "Real text here hyphenated"
    assert clean_text("a\x01\x02b") == "a b"
    assert clean_text("café  ok") == "café ok"  #  -￿ kept


def test_tokenize_semantics():
    # reference: backend/app/routers/search.py:33-44
    assert tokenize("The data-driven, SEARCH of spark!! ab") == [
        "data", "driven", "search", "spark",
    ]
    assert tokenize("the of and") == []
    assert tokenize("a1b2 x") == ["a1b2"]


def test_analyze_query_cap_and_sort():
    terms = analyze_query("zz yy xx " + " ".join(f"t{i:02d}w" for i in range(15)))
    assert len(terms) == 12
    assert terms == sorted(terms)
    assert analyze_query("the of and") == []


def test_extract_text_html():
    html = (
        b"<html><head><title>T</title><style>b {c}</style>"
        b"<script>var x=1;</script></head>"
        b"<body><p>Hello &amp; world</p></body></html>"
    )
    assert extract_text(html) == "T Hello & world"


TEXT_ST = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
    max_size=400,
)


@given(st.lists(TEXT_ST, min_size=1, max_size=30))
@settings(max_examples=60, deadline=None)
def test_series_matches_pure(texts):
    s = pd.Series(texts, dtype="object")
    assert list(normalize_series(s)) == [normalize_text(t) for t in texts]
    assert list(clean_series(s)) == [clean_text(t) for t in texts]
    html = pd.Series([t.encode("utf-8", "replace") for t in texts], dtype="object")
    assert list(extract_series(html)) == [
        extract_text(t.encode("utf-8", "replace")) for t in texts
    ]


def test_jvm_tokens_parity(spark, pages_pdf):
    """JVM regexp tokenization == pure-Python tokenize() on real corpus text."""
    from pyspark.sql import functions as F

    sample = pages_pdf.head(200)[["url", "text"]]
    df = spark.createDataFrame(sample)
    got = {
        r["url"]: list(r["toks"])
        for r in df.select("url", tokens_col("text").alias("toks")).collect()
    }
    for _, row in sample.iterrows():
        assert got[row.url] == tokenize(row.text)


def test_extract_udf_byte_identity(spark, pages_path):
    """input_hint invariant: Arrow-UDF extraction reproduces `text`
    byte-identically for every row."""
    from pyspark.sql import functions as F

    from honeywell_search_engine_spark.index.corpus import extract_text_udf
    from honeywell_search_engine_spark.sources.pages import read_pages

    pages = read_pages(spark, pages_path)
    mism = pages.filter(extract_text_udf(F.col("html")) != F.col("text")).count()
    assert mism == 0
