"""Spark wrapper for the chunking kernel: documents -> chunk rows.

Reference dataflow: per-page Python loop inserting rows one at a time
(backend/app/worker/tasks.py:224-271). Here: one Arrow-batched pandas UDF
produces each doc's chunk array in-row, then a single explode fans it out —
no per-row Python at the Spark level, no shuffle at all (chunking is
embarrassingly parallel per document)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from honeywell_search_engine_spark.functions import chunking as K

CHUNK_ELEMENT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("parent_idx", T.IntegerType()),
        T.StructField("child_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("tokens", T.IntegerType()),
    ]
)


@F.pandas_udf(T.ArrayType(CHUNK_ELEMENT))
def _chunk_udf(texts):
    return pd.Series(
        [
            [
                {
                    "kind": kind,
                    "parent_idx": p,
                    "child_idx": c,
                    "text": t,
                    "tokens": n,
                }
                for kind, p, c, t, n in K.chunk_rows(txt or "")
            ]
            for txt in texts
        ]
    )


def chunk_documents(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(docid, kind, parent_idx, child_idx, chunk_text, tokens, chars) —
    one row per parent/child chunk (reference pdf_chunks table shape,
    backend/app/models/pdf_chunks.py:9-60)."""
    return (
        docs.select(
            F.col(id_col).alias("docid"), _chunk_udf(F.col(text_col)).alias("chunks")
        )
        .select("docid", F.explode("chunks").alias("c"))
        .select(
            "docid",
            F.col("c.kind").alias("kind"),
            F.col("c.parent_idx").alias("parent_idx"),
            F.col("c.child_idx").alias("child_idx"),
            F.col("c.text").alias("chunk_text"),
            F.col("c.tokens").alias("tokens"),
            F.length("c.text").alias("chars"),
        )
    )


def parent_chunks(chunked: DataFrame) -> DataFrame:
    return chunked.filter(F.col("kind") == "PARENT").drop("kind", "child_idx")


def child_chunks(chunked: DataFrame) -> DataFrame:
    """Child rows joined to their parent's text via COALESCE composite —
    the J1 child->parent self-join (reference tasks_embedding.py:32-40)."""
    return chunked.filter(F.col("kind") == "CHILD").drop("kind")
