"""Naive inverted index: a term-bucketed postings *table* (term, docid, tf,
doclen) in plain columnar Parquet, plus term_stats and corpus scalars.

This is the step-4 "minimum end-to-end slice" of SURVEY.md §7 — entirely
built-in Catalyst machinery, no codecs. It stays in the tree as (a) the
baseline the segment/WAND engine must be rank-identical to, and (b) a
perfectly respectable scale path on its own: the postings table is
hash-bucketed on `term` into `bucket=pmod(crc32(term), n_buckets)`
partitions, so a query's ≤12 terms prune to ≤12 of n_buckets partition
directories at scan time (Catalyst partition pruning — the Spark analog of
the reference's GIN index lookup, migrations/003_add_lexical_and_triples.sql:2-7).
"""

from __future__ import annotations

import json
import os
import zlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from honeywell_search_engine_spark.index.corpus import term_frequencies
from honeywell_search_engine_spark.index.stats import CorpusStats, corpus_stats, term_stats

N_BUCKETS = 64


def bucket_of(term: str, n_buckets: int = N_BUCKETS) -> int:
    """Python-side bucket id; must agree with the JVM crc32 expression."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def bucket_col(term_col, n_buckets: int = N_BUCKETS):
    return F.pmod(F.crc32(term_col.cast("string").cast("binary")), F.lit(n_buckets)).cast("int")


def build_naive_index(
    tok_docs: DataFrame, out_dir: str, n_buckets: int = N_BUCKETS
) -> None:
    """tok_docs(docid, tokens, doclen) -> {out_dir}/postings (partitioned by
    bucket), {out_dir}/term_stats, {out_dir}/stats.json.

    Shuffle budget: one exchange for the (term, docid) tf aggregate, one for
    term_stats; the partitioned write reuses the tf output. doclen rides
    along with each posting row (denormalized) so scoring never joins docs.
    """
    os.makedirs(out_dir, exist_ok=True)
    postings = term_frequencies(tok_docs)
    postings = postings.withColumn("bucket", bucket_col(F.col("term"), n_buckets))
    (
        postings.repartition("bucket")
        .sortWithinPartitions("term", "docid")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{out_dir}/postings")
    )

    spark = tok_docs.sparkSession
    postings_r = spark.read.parquet(f"{out_dir}/postings")
    cs = corpus_stats(tok_docs)
    ts = term_stats(postings_r.select("term", "docid", "tf"), cs.n_docs)
    ts.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/term_stats")
    with open(f"{out_dir}/stats.json", "w") as f:
        json.dump(
            {"n_docs": cs.n_docs, "avgdl": cs.avgdl, "n_buckets": n_buckets}, f
        )


class NaiveIndex:
    """Reader handle over a built naive index directory."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(f"{path}/stats.json") as f:
            meta = json.load(f)
        self.stats = CorpusStats(meta["n_docs"], meta["avgdl"])
        self.n_buckets = meta["n_buckets"]
        self.postings = spark.read.parquet(f"{path}/postings")
        self.term_stats = spark.read.parquet(f"{path}/term_stats")

    def idf_map(self, terms: list[str]) -> dict[str, float]:
        """idf for the given terms (absent term => absent key). A filtered
        collect of ≤12 rows — partition-pruned, never a full dictionary
        scan."""
        rows = (
            self.term_stats.filter(F.col("term").isin(terms))
            .select("term", "idf")
            .collect()
        )
        return {r["term"]: float(r["idf"]) for r in rows}

    def postings_for(self, terms: list[str]) -> DataFrame:
        """Partition-pruned postings scan for the query's terms: the bucket
        predicate hits the `bucket=` directory layout, the term predicate
        is pushed to parquet row-group stats (data sorted by term)."""
        buckets = sorted({bucket_of(t, self.n_buckets) for t in terms})
        return self.postings.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
