"""spark-submit entry point: run BM25 top-k queries against a built index.

    spark-submit --py-files hse.zip jobs/run_queries.py \\
        --index s3://bucket/index_v1 --k 10 --query "spark inverted index"

    # or the fixed 20-query reference set with timings:
    python jobs/run_queries.py --index /tmp/idx --cores 32 --reference-set
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
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", default=[])
    ap.add_argument("--reference-set", action="store_true")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode",
                choices=["and", "or", "phrase", "near-unordered",
                         "websearch", "serve"],
                default="and",
                help="websearch = full websearch_to_tsquery syntax (quotes, "
                     "-neg, or); near-unordered = ranked A NEAR/k B "
                     "(--dist); serve = Spark-free ServingIndex path "
                     "(jobs/rerank_corpus.py runs the LTR rerank stage)")
    ap.add_argument("--dist", type=int, default=3,
                    help="near-unordered max distance")
    ap.add_argument("--nodes", type=int, default=1,
                    help="serve mode only: fan out over N shard-subset "
                         "serving nodes via ShardRouter (each node loads "
                         "only its shards; results identical to 1 node)")
    ap.add_argument("--delta-index", action="append", default=[],
                    help="serve mode only: additional index generation(s) "
                         "(oldest to newest) served with --index as ONE "
                         "logical index via GenerationSet — bit-exact "
                         "with an eagerly merged index")
    ap.add_argument("--batch", action="store_true",
                    help="evaluate all queries in one Spark job")
    ap.add_argument("--docs", default=None,
                    help="serve mode only: docs parquet (docid, text) to "
                         "attach — hits become the reference's FULL "
                         "response row (rnk, docid, score_r, snippet, "
                         "highlights, lex_score, has_oie, confidence)")
    ap.add_argument("--rerank-from", type=int, default=None,
                    help="serve mode + --docs: route through the "
                         "deterministic LTR rerank stage over the "
                         "disjunctive top-N")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    if args.cores:
        from honeywell_search_engine_spark.session import get_spark

        spark = get_spark(app_name="hse-run-queries", cores=args.cores)
    else:
        spark = SparkSession.builder.appName("hse-run-queries").getOrCreate()

    from honeywell_search_engine_spark.index.segments import SegmentIndex
    from honeywell_search_engine_spark.query.wand import bm25_topk_wand
    from honeywell_search_engine_spark.sources.pages import reference_queries

    idx = SegmentIndex(spark, args.index)
    queries = {str(i): q for i, q in enumerate(args.query)}
    if args.reference_set:
        queries = reference_queries()
    out = {}
    if args.batch:
        from honeywell_search_engine_spark.query.wand import (
            bm25_topk_phrase_batch,
            bm25_topk_wand_batch,
        )

        t0 = time.time()
        if args.mode == "phrase":
            rows = bm25_topk_phrase_batch(idx, queries, k=args.k).collect()
        else:
            rows = bm25_topk_wand_batch(idx, queries, k=args.k, mode=args.mode).collect()
        for r in rows:
            out.setdefault(r["qid"], {"hits": []})["hits"].append(
                (r["docid"], r["score"])
            )
        out["_batch_sec"] = round(time.time() - t0, 3)
    elif args.mode == "serve":
        from honeywell_search_engine_spark.query.local import (
            ServingIndex,
            ShardRouter,
        )

        if args.delta_index:
            if args.nodes > 1:
                raise SystemExit("--delta-index and --nodes are exclusive")
            from honeywell_search_engine_spark.query.generations import (
                GenerationSet,
            )

            sv = GenerationSet([args.index] + args.delta_index)
        elif args.nodes > 1:
            sv = ShardRouter(args.index, n_nodes=args.nodes)
        else:
            sv = ServingIndex(args.index)
        if args.docs:
            sv.attach_docs(args.docs)
        for name, q in queries.items():
            t0 = time.time()
            if args.docs:
                hits = sv.search_response(
                    q, k=args.k, rerank_from=args.rerank_from
                )
            else:
                hits = sv.search(q, k=args.k)
            out[str(name)] = {"sec": round(time.time() - t0, 4), "hits": hits}
    else:
        from honeywell_search_engine_spark.query.wand import (
            bm25_topk_phrase,
            bm25_topk_websearch,
        )

        from honeywell_search_engine_spark.query.wand import (
            bm25_topk_near_unordered,
        )

        for name, q in queries.items():
            t0 = time.time()
            if args.mode == "phrase":
                rows = bm25_topk_phrase(idx, q, k=args.k).collect()
            elif args.mode == "near-unordered":
                rows = bm25_topk_near_unordered(
                    idx, q, k=args.k, dist=args.dist
                ).collect()
            elif args.mode == "websearch":
                rows = bm25_topk_websearch(idx, q, k=args.k).collect()
            else:
                rows = bm25_topk_wand(idx, q, k=args.k, mode=args.mode).collect()
            out[str(name)] = {
                "sec": round(time.time() - t0, 3),
                "hits": [(r["docid"], r["score"]) for r in rows],
            }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
