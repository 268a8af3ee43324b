"""spark-submit entry point: the deterministic rerank stage (R7 analog) —
disjunctive BM25 top-N candidates re-scored by the fixed-weight LTR
feature combination (serving.rerank_topk), optionally composed into the
full search-response row.

    spark-submit --py-files hse.zip jobs/rerank_corpus.py \\
        --pages s3://bucket/pages/ --query "spark inverted index" --k 10

    # local: full response rows (snippet/highlights/confidence) instead
    python jobs/rerank_corpus.py --pages /tmp/pages.parquet \\
        --query "data table query" --response --cores 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet/Iceberg path")
    ap.add_argument("--query", action="append", default=[], required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--k-in", type=int, default=50,
                    help="candidate window (disjunctive BM25 top-N)")
    ap.add_argument("--response", action="store_true",
                    help="emit full search-response rows riding the rerank")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    if args.cores:
        from honeywell_search_engine_spark.session import get_spark

        spark = get_spark(app_name="hse-rerank", cores=args.cores)
    else:
        spark = SparkSession.builder.appName("hse-rerank").getOrCreate()

    from honeywell_search_engine_spark.index.corpus import docs_from_pages
    from honeywell_search_engine_spark.operators.serving import (
        rerank_topk,
        search_response,
    )
    from honeywell_search_engine_spark.sources.pages import read_pages

    docs = docs_from_pages(read_pages(spark, args.pages)).withColumnRenamed(
        "docid", "doc_id"
    )
    out = {}
    for q in args.query:
        t0 = time.time()
        if args.response:
            rows = search_response(docs, q, k=args.k, rerank_from=args.k_in).collect()
            out[q] = {
                "sec": round(time.time() - t0, 3),
                "rows": [r.asDict() for r in rows],
            }
        else:
            rows = rerank_topk(docs, q, k_in=args.k_in, k_out=args.k).collect()
            out[q] = {
                "sec": round(time.time() - t0, 3),
                "hits": [
                    (r["docid"], r["rerank_r"], r["score_r"]) for r in rows
                ],
            }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
