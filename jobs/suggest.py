"""spark-submit entry point: autocomplete and did-you-mean over a built
index's term dictionary.

    # build the SymSpell deletes table once per index version:
    python jobs/suggest.py --index /tmp/idx --build-spell /tmp/idx_spell

    # autocomplete:
    python jobs/suggest.py --index /tmp/idx --prefix sea --k 8

    # spell-correct a query (uses the prebuilt deletes table):
    python jobs/suggest.py --index /tmp/idx --spell /tmp/idx_spell \\
        --correct "invertd indx serch"
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--build-spell", metavar="OUT_DIR")
    ap.add_argument("--spell", metavar="DIR")
    ap.add_argument("--prefix")
    ap.add_argument("--correct", metavar="QUERY")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--max-edit", type=int, default=2, choices=[1, 2])
    ap.add_argument("--min-df", type=int, default=2)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args(argv)

    from honeywell_search_engine_spark.index.segments import SegmentIndex
    from honeywell_search_engine_spark.query.suggest import (
        build_spell_table,
        did_you_mean,
        suggest_terms,
    )
    from honeywell_search_engine_spark.session import get_spark

    spark = get_spark(cores=args.cores)
    idx = SegmentIndex(spark, args.index)
    if args.build_spell:
        tbl = build_spell_table(
            idx.term_stats, args.max_edit, args.min_df, args.build_spell
        )
        print(f"spell table: {tbl.count()} delete keys -> {args.build_spell}")
    if args.prefix:
        for r in suggest_terms(idx.term_stats, args.prefix, args.k).collect():
            print(f"{r['term']}\t{r['df']}")
    if args.correct:
        if not args.spell:
            ap.error("--correct requires --spell DIR (see --build-spell)")
        spell = spark.read.parquet(args.spell)
        fixed, changed = did_you_mean(idx, spell, args.correct, args.max_edit)
        print(f"corrected: {fixed}" if changed else f"unchanged: {fixed}")
    spark.stop()


if __name__ == "__main__":
    main()
