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


def _rewrite_kernel(dead_bc, avgdl: float):
    """dead_bc: Spark broadcast of {shard: sorted int64 tombstoned-lid
    array} — one copy per executor, not a per-task closure set."""
    _EMPTY = np.zeros(0, dtype=np.int64)

    def rewrite(batches):
        dead_map = dead_bc.value
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
                    positions=bytes(row["positions"]) if row["positions"] is not None else b"",
                    p_off=np.asarray(row["p_off"], np.int64) if row["p_off"] is not None else None,
                    fmt=codec.FMT_FROM_TAG[int(row["fmt"])]
                    if "fmt" in row and row["fmt"] is not None
                    else codec.FMT_VB,
                )
                pl = codec.decode_postings(enc, with_positions=True)
                dead_arr = dead_map.get(int(row["shard"]), _EMPTY)
                keep = ~np.isin(pl.docids.astype(np.int64), dead_arr)
                if not keep.any():
                    continue
                pos = None
                if pl.positions is not None:
                    kept = [p for p, k in zip(pl.positions, keep) if k]
                    pos = (
                        np.concatenate(kept).astype(np.uint64)
                        if kept
                        else np.zeros(0, np.uint64)
                    )
                out.append(
                    _encode_group(
                        row["term"], int(row["shard"]), int(row["bucket"]),
                        pl.docids[keep], pl.tfs[keep], pl.doclens[keep], avgdl,
                        positions=pos, fmt=enc.fmt,
                    )
                )
            if out:
                yield pd.DataFrame(out)

    return rewrite


_COMPACT_DIRS = ("segments", "term_stats", "docmap", "postings")


def _carry_sum_doclen(meta: dict, src: dict) -> None:
    """Carry the journaled exact Σdoclen into stats.json metadata, or DROP
    a stale value when the journal predates the field (r7) — GenerationSet
    trusts `sum_doclen` as exact, so a stats writer must never leave an
    out-of-date one behind."""
    if "sum_doclen" in src:
        meta["sum_doclen"] = src["sum_doclen"]
    else:
        meta.pop("sum_doclen", None)


def _repair_dir_swaps(index_dir: str) -> None:
    """Restore any artifact dir a crashed swap left missing: rename-with-
    backup (_swap_bucket_dir) can only strand a dir between its two renames,
    in which case the .bak holds the previous state."""
    for name in _COMPACT_DIRS:
        dst = f"{index_dir}/{name}"
        bak = dst + ".bak"
        if not os.path.isdir(dst) and os.path.isdir(bak):
            os.rename(bak, dst)


def compact(spark: SparkSession, index_dir: str, _fail_at: str | None = None) -> dict:
    """Fold tombstones into the segments. Returns a summary dict.

    Crash-safe: all artifacts are staged to *_new first (the live index is
    untouched and still readable with query-time tombstone filtering), then
    swapped via rename-with-backup; tombstones are cleared LAST, so a
    re-invocation after a crash at ANY point recomputes from whatever state
    survived and converges — masking already-removed docs is a no-op
    everywhere (kill-point tests in tests/test_maintenance.py).
    `_fail_at` ("staged" | "mid_swap") is the test-only injection hook."""
    _repair_dir_swaps(index_dir)
    st = _read_manifest(index_dir, "compact_state.json")
    if st and st.get("status") == "staged":
        # a prior compaction crashed after staging: finish its commit
        with open(f"{index_dir}/stats.json") as f:
            meta = json.load(f)
        return _finish_compact(spark, index_dir, meta, st)
    # snapshot the tombstone FILES first, then read exactly those: the
    # staged computation covers precisely this set, and _finish_compact
    # removes ONLY these files — a delete_docs racing (or landing between
    # a crash at 'staged' and the resume) keeps its tombstone for the
    # next compaction instead of being silently wiped (round-2 advice)
    tdir = os.path.join(index_dir, "tombstones")
    ts_files = (
        sorted(f for f in os.listdir(tdir) if f.endswith(".json"))
        if os.path.isdir(tdir)
        else []
    )
    dead: set[int] = set()
    for fn in ts_files:
        with open(os.path.join(tdir, fn)) as f:
            dead.update(json.load(f)["docids"])
    if not dead:
        return {"compacted": 0}

    with open(f"{index_dir}/stats.json") as f:
        meta = json.load(f)

    # refresh corpus stats from the docmap minus the dead docs.
    # left-anti join against a tombstone DataFrame — NOT ~isin([literals]):
    # a million tombstones must not become a million-node Catalyst
    # expression. The dead side is broadcast (small relative to the corpus).
    from honeywell_search_engine_spark.index.docmap import dead_lids_by_shard

    dead_sorted = np.array(sorted(dead), dtype=np.int64)
    dead_df = spark.createDataFrame(
        [(int(d),) for d in dead_sorted], "docid long"
    )
    docmap = spark.read.parquet(f"{index_dir}/docmap")
    alive = docmap.join(F.broadcast(dead_df), "docid", "left_anti")
    alive.write.mode("overwrite").parquet(f"{index_dir}/docmap_new")
    row = spark.read.parquet(f"{index_dir}/docmap_new").agg(
        F.sum("doclen").alias("s")
    ).collect()[0]
    # N drops only by tombstones that actually exist (semi-join count) —
    # bulk tombstone sets may contain already-deleted or never-ingested
    # ids. Surviving docs keep their lids (the local-id space may gain
    # holes; posting deltas stay valid).
    n_removed = docmap.join(F.broadcast(dead_df), "docid", "left_semi").count()
    new_n = meta["n_docs"] - n_removed
    new_avgdl = float(row["s"] or 0) / new_n if new_n else 0.0

    # rewrite segments (decode -> mask dead lids -> re-encode)
    dead_map = dead_lids_by_shard(docmap, dead)
    dead_bc = spark.sparkContext.broadcast(dead_map)
    rewritten = (
        spark.read.parquet(f"{index_dir}/segments")
        .mapInPandas(_rewrite_kernel(dead_bc, new_avgdl), schema=SEGMENT_SCHEMA)
    )
    rewritten.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{index_dir}/segments_new"
    )

    # the phase-1 postings table is the durable re-encode source (merges
    # re-encode affected buckets FROM it) — it must shed the dead rows too,
    # or a later merge would resurrect deleted docs. Anti-join on the dead
    # (shard, lid) pairs, then the same salted repartition + sort so the
    # (term, shard)-contiguity invariant future encodes rely on holds.
    dead_pairs = spark.createDataFrame(
        [(int(s), int(l)) for s, ls in dead_map.items() for l in ls] or [],
        "shard int, lid long",
    )
    (
        spark.read.parquet(f"{index_dir}/postings")
        .join(F.broadcast(dead_pairs), ["shard", "lid"], "left_anti")
        .repartition(F.col("term"), F.col("shard"))
        .sortWithinPartitions("bucket", "term", "shard", "lid", "pos")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{index_dir}/postings_new")
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

    # journal the post-compaction stats BEFORE mutating anything: once the
    # swap starts, the dead docs leave the docmap and a rerun could no
    # longer recompute n_removed — the journal carries the answer across
    # any crash (tests kill between every step)
    st = {
        "status": "staged",
        "n_docs": new_n,
        "avgdl": new_avgdl,
        "sum_doclen": int(row["s"] or 0),
        "n_removed": n_removed,
        "tombstone_files": ts_files,
    }
    _write_manifest(index_dir, "compact_state.json", st)
    if _fail_at == "staged":
        raise RuntimeError("injected failure at staged")
    return _finish_compact(spark, index_dir, meta, st, _fail_at)


def _finish_compact(
    spark: SparkSession, index_dir: str, meta: dict, st: dict,
    _fail_at: str | None = None,
) -> dict:
    """Commit a staged compaction: swap each artifact dir (rename-with-
    backup — every crash point repaired by _repair_dir_swaps + rerun),
    rewrite stats from the journal, refresh manifests, clear tombstones,
    mark the journal complete. Idempotent."""
    for i, name in enumerate(_COMPACT_DIRS):
        _swap_bucket_dir(f"{index_dir}/{name}", f"{index_dir}/{name}_new")
        if i == 0 and _fail_at == "mid_swap":
            raise RuntimeError("injected failure at mid_swap")
    meta.update({"n_docs": st["n_docs"], "avgdl": st["avgdl"]})
    _carry_sum_doclen(meta, st)
    # the postings rewrite above re-sorted every bucket into single
    # contiguous files, so promotion's multi-file markers are all cleared
    meta.pop("occ_multifile_buckets", None)
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
    # remove ONLY the tombstone files this compaction folded in (recorded
    # at staging) — tombstones issued afterwards, including during a
    # crash/resume gap, stay for the next compaction instead of being
    # resurrected-by-deletion (round-2 advice)
    tdir = f"{index_dir}/tombstones"
    folded = st.get("tombstone_files")
    if folded is None:
        shutil.rmtree(tdir, ignore_errors=True)  # pre-journal-format state
    else:
        for fn in folded:
            try:
                os.remove(os.path.join(tdir, fn))
            except FileNotFoundError:
                pass  # idempotent re-run
    _write_manifest(index_dir, "compact_state.json", {"status": "complete"})
    return {
        "compacted": st["n_removed"],
        "n_docs": st["n_docs"],
        "avgdl": st["avgdl"],
    }


def _read_merge_state(index_dir: str) -> dict:
    st = _read_manifest(index_dir, "merge_state.json")
    return st or {"merged_batches": {}, "inflight": None}


def _write_merge_state(index_dir: str, state: dict) -> None:
    # ONE atomic file carries both the merged-batch registry and the
    # inflight journal — no cross-file ordering hazards
    _write_manifest(index_dir, "merge_state.json", state)


def _delta_batch_registry(delta_dir: str) -> dict[str, dict]:
    """batch_key -> manifest for every complete delta batch. The key binds
    batch id AND content checksum, so a batch is never merged twice and a
    changed batch (shouldn't happen — deltas are immutable) reads as new."""
    mdir = os.path.join(delta_dir, "manifests")
    out: dict[str, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for fn in sorted(os.listdir(mdir)):
        if fn.startswith("batch_") and fn.endswith(".json"):
            with open(os.path.join(mdir, fn)) as f:
                m = json.load(f)
            if m.get("status") == "complete":
                out[f"{m['batch_id']}:{m['checksum']}"] = m
    return out


def _swap_bucket_dir(dst: str, src: str) -> None:
    """Crash-tolerant directory swap: every intermediate state is repaired
    by simply calling this again (decidable from which dirs exist)."""
    bak = dst + ".bak"
    if os.path.isdir(src):
        if os.path.isdir(dst):
            if os.path.isdir(bak):
                shutil.rmtree(bak)
            os.rename(dst, bak)
        os.rename(src, dst)
    if os.path.isdir(bak) and os.path.isdir(dst):
        shutil.rmtree(bak)


def merge_deltas(
    spark: SparkSession,
    index_dir: str,
    delta_dir: str,
    _fail_at: str | None = None,
) -> dict:
    """Fold streaming posting deltas (streaming/ingest.py) into the main
    index, exactly, idempotently, and crash-safely.

    Upsert semantics: a NEW docid gets an appended lid; a RE-INGESTED
    docid (a re-crawled url) keeps its lid but its old occurrence rows are
    replaced wholesale and its doclen refreshed — never unioned on top
    (that would double tf). If a docid appears in several pending batches,
    the newest batch wins.

    New documents shift N/avgdl and per-term df — scores of EVERY document
    legitimately change. Segments stay cheap to update because:
    - block score bounds are stats-independent (codec.bm25_u_bound), so
      untouched buckets stay validly prunable under the new stats;
    - exact scores are always computed from stored (tf, doclen) with the
      CURRENT broadcast stats, so only buckets whose posting lists gained
      rows need re-encoding;
    - term_stats/idf are re-derived from segment metadata at finalize.

    Durability protocol (manifests/merge_state.json is ONE atomic json that
    holds both the merged-batch registry and the inflight journal):

    1. pending = complete delta batches (id:checksum) not in the registry;
       no pending -> no-op. Re-running with an already-merged delta_dir is
       a no-op — tf can never double.
    2. STAGE (journal "staging" -> "staged"): merged bucket data is written
       to postings_merged/ and the forward index to docmap_staged/ (new
       docs get lids APPENDED after each shard's max — existing posting
       lists never shift); the live index is NOT touched. A crash here
       restages from scratch.
    3. COMMIT (journal "staged" -> "swapped"): invalidate affected bucket
       manifests + finalize marker FIRST (readers now refuse the index
       instead of trusting stale manifests), then swap each bucket dir and
       the docmap dir via rename-with-backup (_swap_bucket_dir — every
       crash point is repaired by re-running), then rewrite stats.json from
       journal-recorded values.
    4. ENCODE (journal "swapped" -> registry updated, inflight cleared):
       encode_pending_buckets re-encodes exactly the invalidated buckets
       and refinalizes term_stats (already idempotent).

    Re-invoking merge_deltas after a crash at ANY point resumes from the
    journal and converges to the same bytes as an uninterrupted run
    (tests/test_maintenance.py kill-between-steps tests).

    shard/bucket are RECOMPUTED here from the target index's stats.json —
    a delta streamed with a different modulus can't corrupt the layout.
    `_fail_at` is a test-only fault-injection point ("staged",
    "invalidated", "mid_swap", "swapped")."""
    from honeywell_search_engine_spark.index.naive import bucket_col
    from honeywell_search_engine_spark.index.segments import (
        encode_pending_buckets,
        input_fingerprint,
    )
    from honeywell_search_engine_spark.streaming.ingest import delta_postings

    def _boom(point: str) -> None:
        if _fail_at == point:
            raise RuntimeError(f"injected failure at {point}")

    with open(f"{index_dir}/stats.json") as f:
        meta = json.load(f)
    n_shards, n_buckets = meta["n_shards"], meta["n_buckets"]

    state = _read_merge_state(index_dir)
    registry = _delta_batch_registry(delta_dir)
    pending_keys = sorted(k for k in registry if k not in state["merged_batches"])
    inflight = state.get("inflight")
    if inflight and inflight.get("delta_dir") != delta_dir:
        raise ValueError(
            f"merge of {inflight['delta_dir']} is in flight; re-run it first"
        )
    if not pending_keys and not inflight:
        return {"docs_added": 0, "affected_buckets": 0, "n_docs": meta["n_docs"]}

    staged_dir = f"{index_dir}/postings_merged"
    docmap_staged = f"{index_dir}/docmap_staged"

    # ---- STAGE ------------------------------------------------------------
    if inflight is None or inflight["status"] == "staging":
        batch_ids = [int(k.split(":", 1)[0]) for k in pending_keys]
        state["inflight"] = inflight = {
            "status": "staging",
            "delta_dir": delta_dir,
            "batch_keys": pending_keys,
            "batch_ids": batch_ids,
        }
        _write_merge_state(index_dir, state)

        # delta layout columns are untrusted: recompute shard/bucket from
        # THIS index's moduli. Latest-batch-wins per docid: a docid
        # re-ingested across pending batches keeps only its NEWEST
        # occurrence rows (one window over the small delta slice).
        from pyspark.sql import Window

        w_doc = Window.partitionBy("docid")
        delta = (
            delta_postings(spark, delta_dir)
            .filter(F.col("delta_batch").isin(batch_ids))
            .select("docid", "doclen", "term", "pos", "delta_batch")
            .withColumn("_mx", F.max("delta_batch").over(w_doc))
            .filter(F.col("delta_batch") == F.col("_mx"))
            .drop("_mx", "delta_batch")
            .withColumn("bucket", bucket_col(F.col("term"), n_buckets))
        )
        affected = sorted(
            r["bucket"] for r in delta.select("bucket").distinct().collect()
        )
        # ---- docmap: new docs get lids APPENDED after each shard's max —
        # existing posting lists never shift (docmap.append_local_ids).
        # A RE-INGESTED docid (already in the docmap) keeps its lid but
        # REPLACES its document: its base occurrence rows are dropped
        # (every bucket they touch joins the affected set) and its doclen
        # is refreshed — tf never double-counts (round-2 advice). The
        # re-ingested set is delta-sized, i.e. small relative to the
        # corpus, so it rides broadcast joins like tombstones do.
        from honeywell_search_engine_spark.index.docmap import append_local_ids

        base_dm = spark.read.parquet(f"{index_dir}/docmap")
        delta_docs = delta.groupBy("docid").agg(F.first("doclen").alias("doclen"))
        new_docs = delta_docs.join(base_dm.select("docid"), "docid", "left_anti")
        reingested = delta_docs.join(base_dm.select("docid"), "docid", "left_semi")
        n_reingested = reingested.count()
        new_rows = append_local_ids(base_dm, new_docs, n_shards)
        n_added = new_rows.count()
        re_pairs = None
        if n_reingested:
            dm_out = (
                base_dm.join(
                    F.broadcast(
                        reingested.select("docid", F.col("doclen").alias("_new_dl"))
                    ),
                    "docid",
                    "left",
                )
                .withColumn(
                    "doclen",
                    F.coalesce(F.col("_new_dl").cast("long"), F.col("doclen")),
                )
                .drop("_new_dl")
            )
            re_pairs = (
                base_dm.join(
                    F.broadcast(reingested.select("docid")), "docid", "left_semi"
                ).select("shard", F.col("local_id").alias("lid"))
            )
            extra = [
                r["bucket"]
                for r in spark.read.parquet(f"{index_dir}/postings")
                .join(F.broadcast(re_pairs), ["shard", "lid"], "left_semi")
                .select("bucket")
                .distinct()
                .collect()
            ]
            affected = sorted(set(affected) | set(extra))
        else:
            dm_out = base_dm
        dm_out.unionByName(new_rows).write.mode("overwrite").parquet(docmap_staged)
        staged_dm = spark.read.parquet(docmap_staged)

        # delta occurrence rows -> lid space, matching base layout (a
        # re-ingested docid joins to its EXISTING lid; its stale base
        # rows were anti-joined away above)
        occ_delta = delta.join(
            staged_dm.select("docid", "shard", F.col("local_id").alias("lid")),
            "docid",
        ).select("lid", "doclen", "term", "shard", "bucket", "pos")
        base = (
            spark.read.parquet(f"{index_dir}/postings")
            .filter(F.col("bucket").isin(affected))
            .select("lid", "doclen", "term", "shard", "bucket", "pos")
        )
        if re_pairs is not None:
            base = base.join(F.broadcast(re_pairs), ["shard", "lid"], "left_anti")
        (
            base.unionByName(occ_delta)
            .repartition(F.col("term"), F.col("shard"))
            .sortWithinPartitions("bucket", "term", "shard", "lid", "pos")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(staged_dir)
        )
        srow = staged_dm.agg(F.sum("doclen").alias("s")).collect()[0]
        new_n = meta["n_docs"] + n_added
        new_avgdl = float(srow["s"] or 0) / new_n if new_n else 0.0
        inflight.update(
            {
                "status": "staged",
                "affected_buckets": affected,
                "docs_added": n_added,
                "n_docs": new_n,
                "avgdl": new_avgdl,
                "sum_doclen": int(srow["s"] or 0),
            }
        )
        _write_merge_state(index_dir, state)
    _boom("staged")

    # ---- COMMIT -----------------------------------------------------------
    if inflight["status"] == "staged":
        affected = inflight["affected_buckets"]
        # invalidate BEFORE mutating: a crash mid-swap leaves an index that
        # refuses to open rather than one whose manifests lie
        for b in affected:
            p = os.path.join(index_dir, "manifests", f"bucket_{b}.json")
            if os.path.exists(p):
                os.remove(p)
        fin = os.path.join(index_dir, "manifests", "finalize.json")
        if os.path.exists(fin):
            os.remove(fin)
        _boom("invalidated")
        for i, b in enumerate(affected):
            _swap_bucket_dir(
                f"{index_dir}/postings/bucket={b}", f"{staged_dir}/bucket={b}"
            )
            if i == 0:
                _boom("mid_swap")
        shutil.rmtree(staged_dir, ignore_errors=True)
        if os.path.isdir(docmap_staged):
            _swap_bucket_dir(f"{index_dir}/docmap", docmap_staged)
        meta.update({"n_docs": inflight["n_docs"], "avgdl": inflight["avgdl"]})
        _carry_sum_doclen(meta, inflight)
        if "occ_multifile_buckets" in meta:
            # STAGE re-sorted the affected buckets into contiguous files,
            # clearing any promotion-appended multi-file markers on them
            meta["occ_multifile_buckets"] = [
                b for b in meta["occ_multifile_buckets"] if b not in set(affected)
            ]
        with open(f"{index_dir}/stats.json", "w") as f:
            json.dump(meta, f)
        inflight["status"] = "swapped"
        _write_merge_state(index_dir, state)
    _boom("swapped")

    # ---- ENCODE + register --------------------------------------------------
    fp = input_fingerprint(spark, delta_dir)
    encode_pending_buckets(spark, index_dir, fp)
    for k in inflight["batch_keys"]:
        state["merged_batches"][k] = {"delta_dir": delta_dir}
    result = {
        "docs_added": inflight["docs_added"],
        "affected_buckets": len(inflight["affected_buckets"]),
        "n_docs": inflight["n_docs"],
    }
    state["inflight"] = None
    _write_merge_state(index_dir, state)
    return result
