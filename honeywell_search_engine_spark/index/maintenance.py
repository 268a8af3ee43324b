"""Index maintenance: document deletion (tombstones) + segment compaction.

Reference retraction path (SURVEY.md §3.3): DELETE /api/documents/{id}
cascades Qdrant delete + MinIO remove + Postgres FK cascade
(reference upload_router.py:258-293). Segments here are immutable, so
deletion is two-phase, lake-style:

1. ``delete_docs`` — O(1): append a tombstone manifest; every reader
   filters tombstoned docids at query time (the WAND kernels take the
   broadcast tombstone set).
2. ``compact`` — periodic: rewrite segments dropping dead postings
   (decode -> mask -> re-encode inside mapInPandas), recompute term_stats
   from the surviving segment metadata (df = Σn, ctf = Σctf — no raw
   posting scan needed), refresh N/avgdl from the doclen table, clear
   tombstones. Per-bucket manifests are refreshed with a new generation
   number so resume semantics survive compaction.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from honeywell_search_engine_spark.index import codec
from honeywell_search_engine_spark.index.segments import (
    SEGMENT_SCHEMA,
    SegmentIndex,
    _read_manifest,
    _write_manifest,
    bucket_checksums,
    load_tombstones,
)


def delete_docs(index_dir: str, docids: list[int], reason: str = "") -> str:
    """Tombstone the given docids. Returns the tombstone file path."""
    tdir = os.path.join(index_dir, "tombstones")
    os.makedirs(tdir, exist_ok=True)
    name = f"ts_{int(time.time() * 1000)}_{len(os.listdir(tdir))}.json"
    path = os.path.join(tdir, name)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"docids": sorted(int(d) for d in docids), "reason": reason}, f)
    os.replace(tmp, path)
    return path


def _rewrite_kernel(dead: frozenset[int], avgdl: float):
    dead_arr = np.fromiter(dead, dtype=np.int64) if dead else np.zeros(0, np.int64)

    def rewrite(batches):
        from honeywell_search_engine_spark.index.segments import _encode_group

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                enc = codec.EncodedList(
                    n=int(row["n"]),
                    bmax_docid=np.asarray(row["bmax_docid"], np.int64),
                    bmax_u=np.asarray(row["bmax_u"], np.float64),
                    d_off=np.asarray(row["d_off"], np.int64),
                    t_off=np.asarray(row["t_off"], np.int64),
                    l_off=np.asarray(row["l_off"], np.int64),
                    deltas=bytes(row["deltas"]),
                    tfs=bytes(row["tfs"]),
                    doclens=bytes(row["doclens"]),
                )
                pl = codec.decode_postings(enc)
                keep = ~np.isin(pl.docids.astype(np.int64), dead_arr)
                if not keep.any():
                    continue
                out.append(
                    _encode_group(
                        row["term"], int(row["shard"]), int(row["bucket"]),
                        pl.docids[keep], pl.tfs[keep], pl.doclens[keep], avgdl,
                    )
                )
            if out:
                yield pd.DataFrame(out)

    return rewrite


def compact(spark: SparkSession, index_dir: str) -> dict:
    """Fold tombstones into the segments. Returns a summary dict."""
    dead = load_tombstones(index_dir)
    if not dead:
        return {"compacted": 0}

    with open(f"{index_dir}/stats.json") as f:
        meta = json.load(f)

    # refresh corpus stats from the doclen table minus the dead docs
    doclens = spark.read.parquet(f"{index_dir}/doclens")
    alive = doclens.filter(~F.col("docid").isin([int(d) for d in dead]))
    alive.write.mode("overwrite").parquet(f"{index_dir}/doclens_new")
    row = spark.read.parquet(f"{index_dir}/doclens_new").agg(
        F.sum("doclen").alias("s")
    ).collect()[0]
    # every tombstoned id is assumed to be a real doc (zero-token docs are
    # absent from the doclen table but still count in N, contributing 0)
    new_n = meta["n_docs"] - len(dead)
    new_avgdl = float(row["s"] or 0) / new_n if new_n else 0.0

    # rewrite segments (decode -> mask -> re-encode), regenerate stats
    rewritten = (
        spark.read.parquet(f"{index_dir}/segments")
        .mapInPandas(_rewrite_kernel(dead, new_avgdl), schema=SEGMENT_SCHEMA)
    )
    rewritten.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{index_dir}/segments_new"
    )

    seg_new = spark.read.parquet(f"{index_dir}/segments_new")
    ts = (
        seg_new.groupBy("term")
        .agg(F.sum("n").alias("df"), F.sum("ctf").alias("ctf"))
        .withColumn(
            "idf",
            F.log1p(
                (F.lit(float(new_n)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
    )
    ts.coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/term_stats_new")

    # atomic-ish swap: rename new dirs over old, refresh manifests, clear
    # tombstones last (a crash mid-swap leaves tombstones in place, so
    # readers stay correct)
    for name in ("segments", "term_stats", "doclens"):
        shutil.rmtree(f"{index_dir}/{name}", ignore_errors=True)
        os.replace(f"{index_dir}/{name}_new", f"{index_dir}/{name}")
    meta.update({"n_docs": new_n, "avgdl": new_avgdl})
    with open(f"{index_dir}/stats.json", "w") as f:
        json.dump(meta, f)
    buckets = list(range(meta["n_buckets"]))
    chks = bucket_checksums(spark, f"{index_dir}/segments", buckets)
    gen = int(time.time())
    for b in buckets:
        prev = _read_manifest(index_dir, f"bucket_{b}.json") or {}
        _write_manifest(
            index_dir,
            f"bucket_{b}.json",
            {**prev, **chks[b], "status": "complete", "generation": gen},
        )
    shutil.rmtree(f"{index_dir}/tombstones", ignore_errors=True)
    return {"compacted": len(dead), "n_docs": new_n, "avgdl": new_avgdl}


def merge_deltas(spark: SparkSession, index_dir: str, delta_dir: str) -> dict:
    """Fold streaming posting deltas (streaming/ingest.py) into the main
    index, exactly.

    New documents shift N/avgdl and per-term df — scores of EVERY document
    legitimately change. Segments stay cheap to update because:
    - block score bounds are stats-independent (codec.bm25_u_bound), so
      untouched buckets stay validly prunable under the new stats;
    - exact scores are always computed from stored (tf, doclen) with the
      CURRENT broadcast stats, so only buckets whose posting lists gained
      rows need re-encoding;
    - term_stats/idf are re-derived from segment metadata at finalize.

    Steps: delta tf rows -> occurrence rows -> union with the affected
    buckets' base occurrences -> the same salted repartition+sort ->
    dynamic-overwrite those bucket dirs -> refresh doclens/N/avgdl ->
    invalidate affected bucket manifests -> re-encode + finalize.
    Assumes delta docids are NEW documents (re-ingest of an existing docid
    should go through delete_docs + compact first)."""
    from honeywell_search_engine_spark.index.segments import (
        encode_pending_buckets,
        input_fingerprint,
    )
    from honeywell_search_engine_spark.streaming.ingest import delta_postings

    delta = delta_postings(spark, delta_dir)
    affected = sorted(
        r["bucket"] for r in delta.select("bucket").distinct().collect()
    )
    if not affected:
        return {"merged_batches": 0, "affected_buckets": 0}

    with open(f"{index_dir}/stats.json") as f:
        meta = json.load(f)

    # delta tf rows -> occurrence rows (tf duplicates), matching the base
    # postings layout
    occ_delta = (
        delta.withColumn("_i", F.explode(F.sequence(F.lit(1), F.col("tf"))))
        .select("docid", "doclen", "term", "shard", "bucket")
    )
    base = (
        spark.read.parquet(f"{index_dir}/postings")
        .filter(F.col("bucket").isin(affected))
        .select("docid", "doclen", "term", "shard", "bucket")
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        base.unionByName(occ_delta)
        .repartition(F.col("term"), F.col("shard"))
        .sortWithinPartitions("bucket", "term", "shard", "docid")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{index_dir}/postings")
    )

    # refresh forward index + corpus stats
    new_docs = delta.groupBy("docid").agg(F.first("doclen").alias("doclen"))
    doclens = spark.read.parquet(f"{index_dir}/doclens").unionByName(new_docs)
    doclens.write.mode("overwrite").parquet(f"{index_dir}/doclens_new")
    row = spark.read.parquet(f"{index_dir}/doclens_new").agg(
        F.sum("doclen").alias("s")
    ).collect()[0]
    n_added = delta.select("docid").distinct().count()
    new_n = meta["n_docs"] + n_added
    new_avgdl = float(row["s"] or 0) / new_n if new_n else 0.0
    shutil.rmtree(f"{index_dir}/doclens", ignore_errors=True)
    os.replace(f"{index_dir}/doclens_new", f"{index_dir}/doclens")
    meta.update({"n_docs": new_n, "avgdl": new_avgdl})
    with open(f"{index_dir}/stats.json", "w") as f:
        json.dump(meta, f)

    # invalidate affected buckets + finalize marker, then re-encode
    for b in affected:
        p = os.path.join(index_dir, "manifests", f"bucket_{b}.json")
        if os.path.exists(p):
            os.remove(p)
    fin = os.path.join(index_dir, "manifests", "finalize.json")
    if os.path.exists(fin):
        os.remove(fin)
    fp = input_fingerprint(spark, delta_dir)
    encode_pending_buckets(spark, index_dir, fp)
    _write_manifest(
        index_dir,
        f"merge_{int(time.time() * 1000)}.json",
        {
            "status": "complete",
            "delta_dir": delta_dir,
            "delta_fingerprint": fp,
            "docs_added": n_added,
            "affected_buckets": len(affected),
            "n_docs": new_n,
            "avgdl": new_avgdl,
        },
    )
    return {"docs_added": n_added, "affected_buckets": len(affected), "n_docs": new_n}
