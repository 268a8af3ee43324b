"""spark-submit entry point: build the segmented inverted index.

Cluster usage (the north_rule's multi-executor deployment path):

    zip -r hse.zip honeywell_search_engine_spark
    spark-submit --py-files hse.zip \\
        --num-executors $N --executor-cores 4 --executor-memory 8g \\
        jobs/build_index.py \\
        --input  s3://bucket/pages_iceberg_or_parquet \\
        --index  s3://bucket/index_v1 \\
        --n-buckets 1024 --n-shards 4096

Local sandbox usage (what bench/scaling runs):

    python jobs/build_index.py --input /tmp/pages.parquet --index /tmp/idx \\
        --cores 32 --n-buckets 32 --n-shards 16

Re-invoking after a crash resumes from the per-bucket manifests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# local runs: make the repo root importable (spark-submit ships the
# package via --py-files instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages table path (parquet/Iceberg)")
    ap.add_argument("--index", required=True, help="output index directory")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--n-shards", type=int, default=16)
    ap.add_argument("--buckets-per-job", type=int, default=16)
    ap.add_argument("--cores", type=int, default=None,
                    help="local-mode cores; omit under spark-submit on a cluster")
    ap.add_argument("--from-html", action="store_true",
                    help="re-extract text from the html column (Arrow UDF)")
    ap.add_argument("--codec", choices=("vb", "pfor"), default="pfor",
                    help="posting-stream codec: pfor (PForDelta, smaller "
                         "payload, the default) or vb (varbyte, faster "
                         "cold decode)")
    ap.add_argument("--stemmed", action="store_true",
                    help="Porter-stem the token stream (reference T8/T9: "
                         "to_tsvector('english', ...)); queries against "
                         "this index stem automatically (stats.json flag)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    if args.cores:
        from honeywell_search_engine_spark.session import get_spark

        spark = get_spark(app_name="hse-build-index", cores=args.cores)
    else:
        spark = SparkSession.builder.appName("hse-build-index").getOrCreate()

    from honeywell_search_engine_spark.index.corpus import (
        docs_from_pages,
        extracted_docs_from_pages,
        tokenized_docs,
    )
    from honeywell_search_engine_spark.index.segments import build_segments
    from honeywell_search_engine_spark.sources.pages import read_pages

    t0 = time.time()
    pages = read_pages(spark, args.input)
    docs = (
        extracted_docs_from_pages(pages, args.lang)
        if args.from_html
        else docs_from_pages(pages, args.lang)
    )
    tok = tokenized_docs(docs, stem=args.stemmed)
    build_segments(
        tok,
        args.index,
        args.input,
        n_buckets=args.n_buckets,
        n_shards=args.n_shards,
        buckets_per_job=args.buckets_per_job,
        progress=True,
        stemmed=args.stemmed,
        codec_fmt=args.codec,
    )
    elapsed = time.time() - t0
    with open(f"{args.index}/stats.json") as f:
        meta = json.load(f)
    print(
        json.dumps(
            {
                "elapsed_sec": round(elapsed, 2),
                "n_docs": meta["n_docs"],
                "docs_per_sec": round(meta["n_docs"] / elapsed, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
