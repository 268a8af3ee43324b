"""Corpus preparation: pages -> analyzable docs -> token stream.

Scale notes (the whole point):
- docid assignment is a *pure column expression* over the unique `url` —
  no global sort, no window, no shuffle, order- and partition-independent.
  (`row_number` over a global sort, the obvious alternative, serializes on
  one partition; `monotonically_increasing_id` is partition-dependent —
  both rejected, SURVEY.md §7 "hard parts".)
- text extraction is one Arrow-batched pandas UDF (the only Python in the
  build path); tokenization is pure JVM (regexp_extract_all + filter),
  fully inside whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from honeywell_search_engine_spark.functions.analyzer import (
    clean_series,
    extract_series,
    tokens_col,
)

# 15 hex chars of sha256 = 60 bits: deterministic, order-independent,
# computable identically driver-side (oracle) and JVM-side. At 10^12 docs a
# production deployment adds a collision-audit job (groupBy(docid).count>1);
# the probability of any collision at 2^60 with 10^12 keys is ~0.03%.
def docid_col(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.conv(F.substring(F.sha2(c, 256), 1, 15), 16, 10).cast("long")


def docid_py(url: str) -> int:
    import hashlib

    return int(hashlib.sha256(url.encode()).hexdigest()[:15], 16)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_series(html)


@F.pandas_udf(T.StringType())
def clean_text_udf(text: pd.Series) -> pd.Series:
    return clean_series(text)


@F.pandas_udf(T.ArrayType(T.StringType()))
def stem_tokens_udf(tokens: pd.Series) -> pd.Series:
    """Porter-stem a token-array column (Arrow-batched; the per-word work
    amortizes to a memo-dict lookup since a corpus has far fewer distinct
    words than occurrences — functions/stemmer.py)."""
    from honeywell_search_engine_spark.functions.stemmer import stem_tokens

    return tokens.map(
        lambda ts: stem_tokens(list(ts)) if ts is not None else None
    )


def docs_from_pages(pages: DataFrame, lang: str = "en") -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> docs(docid, url, text).

    Scope filter (reference F1 semantics: only COMPLETED/owned docs are
    searchable — here: only `lang='en'` pages are indexed, FIXTURES.md §1)
    is pushed down to the parquet/Iceberg scan by Catalyst. `html` is
    pruned away unless extraction is requested via `extract=`.
    """
    return (
        pages.filter(F.col("lang") == lang)
        .select(docid_col("url").alias("docid"), "url", "text")
    )


def extracted_docs_from_pages(pages: DataFrame, lang: str = "en") -> DataFrame:
    """Same, but re-extracts text from `html` via the Arrow UDF (the
    byte-identity path). Used by tests and by ingestion when the Iceberg
    table carries raw HTML only."""
    return (
        pages.filter(F.col("lang") == lang)
        .select(
            docid_col("url").alias("docid"),
            "url",
            extract_text_udf(F.col("html")).alias("text"),
        )
    )


def tokenized_docs(docs: DataFrame, text_col: str = "text",
                   pre_cleaned: bool = False, stem: bool = False) -> DataFrame:
    """docs(docid, <text>) -> (docid, tokens array<string>, doclen int).

    `pre_cleaned=True` skips the clean_text pandas UDF (e.g. the synthetic
    pages table's `text` column is already the cleaned ground truth, and
    the testdata `documents.text` is treated as clean input).
    `stem=True` Porter-stems the token stream (reference T8/T9 stems via
    to_tsvector('english', ...)); pass the same flag to build_segments so
    the index records it and query analysis matches automatically.
    """
    txt = F.col(text_col) if pre_cleaned else clean_text_udf(F.col(text_col))
    toks = tokens_col(txt)
    if stem:
        toks = stem_tokens_udf(toks)
    return (
        docs.withColumn("tokens", toks)
        .withColumn("doclen", F.size("tokens"))
        .drop(text_col)
    )


def token_occurrences(tok_docs: DataFrame) -> DataFrame:
    """(docid, doclen, term) one row per token OCCURRENCE (no aggregation).

    The segment build shuffles these raw occurrences exactly once —
    repartition(term, shard) + sortWithinPartitions — and the encoder
    derives tf by run-length counting the sorted duplicates. Compared to
    aggregate-then-repartition this removes two full posting-set exchanges
    (the groupBy(term, docid) shuffle and phase 2's re-shuffle), which at
    100 TB is the difference between moving the token stream once and
    three times.
    """
    return tok_docs.select("docid", "doclen", F.explode("tokens").alias("term"))


def term_frequencies(tok_docs: DataFrame) -> DataFrame:
    """(docid, tokens, doclen) -> postings rows (term, docid, tf, doclen).

    explode + hash aggregate on (term, docid): Spark's partial aggregation
    (map-side combine) collapses duplicate occurrences before the exchange,
    so the shuffle carries one row per (term, docid), not one per token
    occurrence — at 100 TB this is the difference between shuffling the
    corpus and shuffling the (much smaller) distinct posting set.
    """
    return (
        tok_docs.select("docid", "doclen", F.explode("tokens").alias("term"))
        .groupBy("term", "docid")
        .agg(F.count("*").alias("tf"), F.first("doclen").alias("doclen"))
    )
