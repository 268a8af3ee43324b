"""spark-submit entry point: index maintenance — merge streamed deltas,
promote a generation index (segment splice), compact tombstones, or
evaluate the LSM promotion policy.

Cluster usage:

    zip -r hse.zip honeywell_search_engine_spark
    spark-submit --py-files hse.zip jobs/maintain_index.py \\
        promote --index s3://bucket/index_v1 --generation s3://bucket/gen_07

Subcommands:

    merge    --index IDX --delta DELTA_DIR
             fold streamed posting deltas (streaming/ingest.py) into the
             index — exact upsert (newest batch wins per docid), the path
             for RE-INGESTED documents.
    promote  --index IDX --generation GEN_IDX
             fold a delta GENERATION INDEX (a small index built over just
             the new docs, jobs/build_index.py) into the base by segment
             splice (index/promote.py) — append-only docids, O(delta +
             seams) encode work; base blocks pass through byte-identical.
    compact  --index IDX
             physically remove tombstoned documents and rewrite stats.
    generation --index BASE --out GEN_IDX (--pages PAGES | --delta DELTA_DIR)
             build a generation index with the base's layout, from a pages
             table or directly from streamed delta batches (no page
             re-read) — serve it with run_queries --delta-index, fold it
             in later with `promote`.
    policy   --index IDX --generation GEN_IDX [GEN_IDX ...]
             print whether should_promote() fires for the given
             generations (exit code 0 = promote now, 3 = keep serving
             via GenerationSet / run_queries --delta-index).

Local sandbox: add --cores N to run on local[N].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark(cores, name):
    from pyspark.sql import SparkSession

    if cores:
        from honeywell_search_engine_spark.session import get_spark

        return get_spark(app_name=name, cores=cores)
    return SparkSession.builder.appName(name).getOrCreate()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    mp = sub.add_parser("merge")
    mp.add_argument("--index", required=True)
    mp.add_argument("--delta", required=True)

    pp = sub.add_parser("promote")
    pp.add_argument("--index", required=True)
    # repeatable, oldest first: K generations fold in ONE base pass
    # (bit-identical to K sequential promotions at 1/K the fixed jobs)
    pp.add_argument("--generation", required=True, action="append")

    cp = sub.add_parser("compact")
    cp.add_argument("--index", required=True)

    gp = sub.add_parser("generation")
    gp.add_argument("--index", required=True,
                    help="base index (layout template + stats)")
    gp.add_argument("--out", required=True, help="generation index output dir")
    g_src = gp.add_mutually_exclusive_group(required=True)
    g_src.add_argument("--pages", help="build from a pages table")
    g_src.add_argument("--delta",
                       help="build from streamed delta batches "
                            "(streaming/ingest.py output; no page re-read)")

    yp = sub.add_parser("policy")
    yp.add_argument("--index", required=True)
    yp.add_argument("--generation", nargs="+", required=True)
    yp.add_argument("--max-generations", type=int, default=3)
    yp.add_argument("--max-delta-ratio", type=float, default=0.2)

    for p in (mp, pp, cp, yp, gp):
        p.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    if args.cmd == "policy":
        from honeywell_search_engine_spark.index.promote import should_promote

        fire = should_promote(
            args.index,
            args.generation,
            max_generations=args.max_generations,
            max_delta_ratio=args.max_delta_ratio,
        )
        print(json.dumps({"should_promote": fire}))
        return 0 if fire else 3

    spark = _spark(args.cores, f"hse-maintain-{args.cmd}")
    t0 = time.time()
    if args.cmd == "merge":
        from honeywell_search_engine_spark.index.maintenance import merge_deltas

        out = merge_deltas(spark, args.index, args.delta)
    elif args.cmd == "promote":
        from honeywell_search_engine_spark.index.promote import (
            promote_generation,
        )

        out = promote_generation(spark, args.index, args.generation)
    elif args.cmd == "generation":
        from honeywell_search_engine_spark.index.promote import (
            build_generation,
            build_generation_from_delta,
        )

        out = (
            build_generation_from_delta(spark, args.delta, args.out, args.index)
            if args.delta
            else build_generation(spark, args.pages, args.out, args.index)
        )
    else:
        from honeywell_search_engine_spark.index.maintenance import compact

        out = compact(spark, args.index)
    out["elapsed_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
