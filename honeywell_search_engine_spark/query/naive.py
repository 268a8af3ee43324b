"""BM25 conjunctive top-k over the naive postings table — pure Catalyst.

Physical plan (verified via .explain in tests/bench):
  partition-pruned parquet scan (bucket dirs + term pushdown)
  -> whole-stage-codegen'd per-posting score expression (idf folded in as a
     literal map over the ≤12 query terms — no join at all)
  -> hash aggregate on docid (partial + final; the only shuffle)
  -> TakeOrderedAndProject(k, (-score, docid))  [per-partition top-k heaps,
     then a k-row merge on the driver — never a global sort]

Determinism contract with the oracle (SURVEY.md §7 "rank identity"): the
per-doc score is the float64 sum of per-term contributions in lexicographic
term order — enforced by sort_array(collect_list(struct(term, part))) +
aggregate — so Spark and the pure-Python oracle produce bit-identical
doubles, and ties break on docid identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from honeywell_search_engine_spark.functions.analyzer import analyze_query
from honeywell_search_engine_spark.index.naive import NaiveIndex
from honeywell_search_engine_spark.index.stats import bm25_part_col

RESULT_SCHEMA = "docid long, score double"


def _empty(spark) -> DataFrame:
    return spark.createDataFrame([], RESULT_SCHEMA)


def bm25_topk_naive(index: NaiveIndex, query: str, k: int = 10) -> DataFrame:
    """Conjunctive (AND) BM25 top-k: DataFrame(docid, score) ordered by
    (-score, docid), ≤ k rows. Empty on no terms / unknown term (reference
    F4 semantics: websearch_to_tsquery AND, fusion.py:42)."""
    spark = index.spark
    terms = analyze_query(query)
    if not terms:
        return _empty(spark)
    idf = index.idf_map(terms)
    if len(idf) < len(terms):  # some term absent from the corpus => AND fails
        return _empty(spark)

    n_terms = len(terms)
    idf_entries = []
    for t in terms:
        idf_entries += [F.lit(t), F.lit(idf[t])]
    idf_map = F.create_map(*idf_entries)

    p = index.postings_for(terms)
    part = bm25_part_col(
        F.col("tf"), F.col("doclen"), idf_map[F.col("term")], index.stats.avgdl
    )
    scored = (
        p.select("docid", F.struct(F.col("term"), part.alias("part")).alias("tp"))
        .groupBy("docid")
        .agg(
            F.count("*").alias("nt"),
            F.sort_array(F.collect_list("tp")).alias("parts"),
        )
        .filter(F.col("nt") == n_terms)
        .select(
            "docid",
            F.aggregate(
                "parts", F.lit(0.0), lambda acc, x: acc + x["part"]
            ).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("docid")).limit(k)
