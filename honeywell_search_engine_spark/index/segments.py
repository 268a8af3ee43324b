"""Segmented inverted index: build, manifests, checkpointed resume.

Layout on disk (all immutable once a manifest marks its unit complete):

    {index}/docmap/                      forward index / docvalues:
                                         (shard, local_id, docid, doclen)
    {index}/postings/bucket=<b>/...      phase-1 occurrence rows (term,
                                         lid, doclen, shard), parquet
    {index}/segments/bucket=<b>/...      phase-2 encoded posting lists
                                         (values are shard-local lids)
    {index}/term_stats/                  (term, df, ctf, idf) parquet
    {index}/stats.json                   N, avgdl, layout params
    {index}/manifests/phase1.json        input lineage for phase 1
    {index}/manifests/bucket_<b>.json    per-partition lineage for phase 2

Design (north_rule / SURVEY.md §3.2 rebuild lifecycle):

- **Document-partitioned shards + term-bucketed files.** Every posting row
  gets ``shard = pmod(docid, n_shards)`` and ``bucket = crc32(term) %
  n_buckets``. The shard key IS the salt: a Zipf head term's posting list
  is split into n_shards bounded groups instead of one giant skewed one
  (the reference has no analog — Postgres GIN absorbs this; at 10^12 docs
  it is the difference between a build that finishes and one straggler
  task that never does). Because shard is a pure function of docid, every
  doc's postings for *all* terms live in one shard, so conjunctive
  scoring never crosses shards and per-shard top-k + global k-merge is
  exact.
- **ONE shuffle for the whole build.** Phase 1 explodes raw token
  occurrences and does the salted ``repartition(term, shard)`` +
  ``sortWithinPartitions(bucket, term, shard, docid)`` ONCE, writing the
  grouped, sorted occurrence rows partitioned by bucket. tf is never
  aggregated relationally: phase 2 derives it by run-length counting the
  sorted duplicates inside the encoder. This removes two full exchanges
  of the posting set (the groupBy(term, docid) shuffle and a phase-2
  re-shuffle) — measured locally the build went from 3 data movements to
  1; at 10^12 docs that is the build's dominant cost. The sort leads with
  ``bucket`` so the partitioned write's required ordering is already
  satisfied and Spark's writer adds no (unstable!) re-sort of its own.
- **Phase 2 is shuffle-free**: each (term, shard) group lives entirely in
  one parquet file (written by the one task that owned its hash), so the
  encoder mapInPandas runs directly on the pruned file scan. The kernel
  is *streaming*: it carries the open run across Arrow batches and never
  materializes a partition, only the current (term, shard) run.
- **Checkpointed resume**: phase 1 commits once (Spark's all-or-nothing
  parquet job commit) and writes a manifest with the input fingerprint;
  phase 2 proceeds bucket-chunk by bucket-chunk, writing one manifest per
  bucket (row counts + content checksum); a finalize step derives
  term_stats (df = Σn, ctf = Σctf) from segment metadata — no posting
  scan. ``build_segments`` re-invoked after a crash verifies fingerprints
  and encodes only buckets whose manifest is missing — segments are
  byte-identical to an uninterrupted build (tested).
"""

from __future__ import annotations

import json
import os
import time
import zlib
from collections import OrderedDict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from honeywell_search_engine_spark.index import codec
from honeywell_search_engine_spark.index.docmap import assign_local_ids
from honeywell_search_engine_spark.index.naive import bucket_col, bucket_of
from honeywell_search_engine_spark.index.stats import CorpusStats

N_BUCKETS = 64
N_SHARDS = 8

SEGMENT_SCHEMA = (
    "term string, shard int, n long, ctf long, "
    "bmax_docid array<long>, bmax_u array<double>, "
    "d_off array<long>, t_off array<long>, l_off array<long>, "
    "deltas binary, tfs binary, doclens binary, "
    "positions binary, p_off array<long>, fmt int, bucket int"
)


def _pa_segment_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("term", pa.string()),
            ("shard", pa.int32()),
            ("n", pa.int64()),
            ("ctf", pa.int64()),
            ("bmax_docid", pa.list_(pa.int64())),
            ("bmax_u", pa.list_(pa.float64())),
            ("d_off", pa.list_(pa.int64())),
            ("t_off", pa.list_(pa.int64())),
            ("l_off", pa.list_(pa.int64())),
            ("deltas", pa.binary()),
            ("tfs", pa.binary()),
            ("doclens", pa.binary()),
            ("positions", pa.binary()),
            ("p_off", pa.list_(pa.int64())),
            ("fmt", pa.int32()),
            ("bucket", pa.int32()),
        ]
    )


PA_SEGMENT_SCHEMA = _pa_segment_schema()


# --------------------------------------------------------------------------
# streaming group encoder (phase 2 kernel)
# --------------------------------------------------------------------------


def _encode_group(term: str, shard: int, bucket: int,
                  docids, tfs, doclens, avgdl: float,
                  positions=None, fmt: str = codec.FMT_VB) -> dict:
    """Encode one (term, shard) posting list from docid-sorted, unique
    (docid, tf, doclen) arrays. `positions`, if given, is the flat
    (docid, position)-ordered position stream (length = sum(tfs)); callers
    passing positions MUST pass docids already sorted (the stable argsort
    below cannot reorder the flat stream)."""
    docids = np.asarray(docids)
    order = np.argsort(docids, kind="stable")
    if positions is not None and not np.array_equal(order, np.arange(docids.size)):
        raise ValueError("positional encode requires pre-sorted docids")
    enc = codec.encode_postings(
        docids[order], np.asarray(tfs)[order],
        np.asarray(doclens)[order], avgdl,
        positions=positions, fmt=fmt,
    )
    return {
        "term": term,
        "shard": int(shard),
        "n": enc.n,
        "ctf": int(np.asarray(tfs, dtype=np.int64).sum()),
        "bmax_docid": enc.bmax_docid.tolist(),
        "bmax_u": enc.bmax_u.tolist(),
        "d_off": enc.d_off.tolist(),
        "t_off": enc.t_off.tolist(),
        "l_off": enc.l_off.tolist(),
        "deltas": enc.deltas,
        "tfs": enc.tfs,
        "doclens": enc.doclens,
        "positions": enc.positions,
        "p_off": enc.p_off.tolist() if enc.p_off is not None else None,
        "fmt": codec.FMT_TAGS[fmt],
        "bucket": int(bucket),
    }


def make_segment_encoder(avgdl: float, n_buckets: int, fmt: str = codec.FMT_VB):
    """mapInArrow kernel: consumes (term, shard, lid, doclen, pos)
    OCCURRENCE batches sorted by (term, shard, lid, pos) within the
    partition — duplicate lids are occurrences; tf = run length. Emits one
    encoded row per (term, shard) run.

    MEGA-BATCHED: every complete run in an Arrow batch is encoded by ONE
    varbyte call per stream (block=1 gives per-value byte offsets, so each
    run's bytes/block-offsets are slices of the shared buffer). Varbyte is
    value-wise independent, so the output is BYTE-IDENTICAL to per-run
    encode_postings (asserted by tests/test_codec.py::
    test_mega_batch_encoder_byte_identical and the build-checksum
    invariance tests); the per-run Python cost drops to metadata assembly.

    mapInArrow, not mapInPandas: the dominant per-row payload is the TERM
    STRING repeated on every occurrence — pandas conversion materializes
    one Python str per row (measured as the majority of the encode job's
    wall time). Arrow batches dictionary-encode the column instead: run
    boundaries come from the int32 indices and the string is looked up
    once per RUN. The open trailing run is carried across batch
    boundaries as plain arrays — memory stays O(batch + largest run).
    Posting values are shard-local dense ordinals (index/docmap.py); the
    docmap rehydrates global docids at query time."""

    def _emit(t_idx, t_vals, s, l, dl, po) -> list[dict]:
        """Encode every run in the given sorted occurrence arrays.
        `t_idx` are per-row dictionary indices into `t_vals`."""
        n = t_idx.size
        if n == 0:
            return []
        t = t_idx
        run_new = np.concatenate(([True], (t[1:] != t[:-1]) | (s[1:] != s[:-1])))
        post_new = run_new | np.concatenate(([True], l[1:] != l[:-1]))
        p_idx = np.flatnonzero(post_new)  # occurrence index of posting starts
        docid = l[p_idx].astype(np.uint64)
        tf = np.diff(np.append(p_idx, n)).astype(np.uint64)
        dlp = dl[p_idx].astype(np.uint64)
        run_of_post = np.cumsum(run_new)[p_idx] - 1
        r_starts = np.flatnonzero(
            np.concatenate(([True], run_of_post[1:] != run_of_post[:-1]))
        )
        r_ends = np.append(r_starts[1:], docid.size)
        # docid deltas, chain reset at each run start
        deltas = np.empty(docid.size, dtype=np.uint64)
        deltas[0] = docid[0]
        np.subtract(docid[1:], docid[:-1], out=deltas[1:])
        deltas[r_starts] = docid[r_starts]
        # position deltas, chain reset at each posting start
        pou = po.astype(np.uint64)
        posd = np.empty(n, dtype=np.uint64)
        posd[0] = pou[0]
        np.subtract(pou[1:], pou[:-1], out=posd[1:])
        posd[p_idx] = pou[p_idx]
        if fmt == codec.FMT_VB:
            d_b, d_voff = codec.varbyte_encode(deltas, block=1)
            t_b, t_voff = codec.varbyte_encode(tf - np.uint64(1), block=1)
            l_b, l_voff = codec.varbyte_encode(dlp, block=1)
            d_voff = np.append(d_voff, len(d_b))
            t_voff = np.append(t_voff, len(t_b))
            l_voff = np.append(l_voff, len(l_b))
        else:
            # PFor mega-batch: encode EVERY run's three streams in one
            # vectorized pass each (codec.pfor_encode_runs); per-run bytes
            # and block offsets are slices of the shared buffers,
            # byte-identical to per-run pfor_encode (tested).
            d_pf = codec.pfor_encode_runs(deltas, r_starts, r_ends)
            t_pf = codec.pfor_encode_runs(tf - np.uint64(1), r_starts, r_ends)
            l_pf = codec.pfor_encode_runs(dlp, r_starts, r_ends)
            # first GLOBAL block index per run (shared by all three streams:
            # block structure depends only on run length)
            pf_base = np.concatenate(([0], np.cumsum(d_pf[2])))
        p_b, p_voff = codec.varbyte_encode(posd, block=1)
        p_voff = np.append(p_voff, len(p_b))
        u = codec.bm25_u_bound(tf)
        occ_start = np.append(p_idx, n)  # occurrence start per posting (+end)
        run_rows = np.flatnonzero(run_new)
        B_ = codec.BLOCK
        rows: list[dict] = []
        for r in range(r_starts.size):
            ps, pe = int(r_starts[r]), int(r_ends[r])
            cnt = pe - ps
            nblocks = (cnt + B_ - 1) // B_
            blk = ps + np.arange(nblocks, dtype=np.int64) * B_
            dd, uu = docid[ps:pe], u[ps:pe]
            pad = nblocks * B_ - cnt
            if pad:
                dd = np.concatenate([dd, np.zeros(pad, dtype=dd.dtype)])
                uu = np.concatenate([uu, np.full(pad, -np.inf)])
            term = t_vals[int(t[run_rows[r]])]
            p0 = int(p_voff[occ_start[ps]])
            if fmt == codec.FMT_PFOR:
                # slice run r out of the three shared pfor buffers
                # (positions stay varbyte — per-value offsets are the
                # phrase path's random-access handle)
                f0, f1 = int(pf_base[r]), int(pf_base[r + 1])
                streams = {}
                for key_o, key_b, (pbuf, poff, _) in (
                    ("d_off", "deltas", d_pf),
                    ("t_off", "tfs", t_pf),
                    ("l_off", "doclens", l_pf),
                ):
                    o0 = int(poff[f0])
                    streams[key_o] = (poff[f0:f1] - o0).tolist()
                    streams[key_b] = pbuf[o0 : int(poff[f1])]
            else:
                d0, t0_, l0 = int(d_voff[ps]), int(t_voff[ps]), int(l_voff[ps])
                streams = {
                    "d_off": (d_voff[blk] - d0).tolist(),
                    "t_off": (t_voff[blk] - t0_).tolist(),
                    "l_off": (l_voff[blk] - l0).tolist(),
                    "deltas": d_b[d0 : int(d_voff[pe])],
                    "tfs": t_b[t0_ : int(t_voff[pe])],
                    "doclens": l_b[l0 : int(l_voff[pe])],
                }
            rows.append(
                {
                    "term": term,
                    "shard": int(s[run_rows[r]]),
                    "n": cnt,
                    "ctf": int(tf[ps:pe].sum()),
                    "bmax_docid": dd.reshape(nblocks, B_).max(axis=1)
                    .astype(np.int64).tolist(),
                    "bmax_u": uu.reshape(nblocks, B_).max(axis=1)
                    .astype(np.float64).tolist(),
                    **streams,
                    "positions": p_b[p0 : int(p_voff[occ_start[pe]])],
                    "p_off": (p_voff[occ_start[blk]] - p0).tolist(),
                    "fmt": codec.FMT_TAGS[fmt],
                    "bucket": int(bucket_of(term, n_buckets)),
                }
            )
        return rows

    def _rows_batch(rows: list[dict]):
        import pyarrow as pa

        return pa.RecordBatch.from_pylist(rows, schema=PA_SEGMENT_SCHEMA)

    def encode_stream(batches):
        import pyarrow.compute as pc

        # carry: (term_str, shard, lid, doclen, pos arrays) of the open
        # trailing run — a run has ONE term, so the string carries whole
        carry = None

        for batch in batches:
            if batch.num_rows == 0:
                continue
            td = pc.dictionary_encode(batch.column("term"))
            t_idx = np.asarray(td.indices).astype(np.int64)
            t_vals = td.dictionary.to_pylist()
            s = np.asarray(batch.column("shard")).astype(np.int64)
            l = np.asarray(batch.column("lid")).astype(np.int64)
            dl = np.asarray(batch.column("doclen")).astype(np.int64)
            po = np.asarray(batch.column("pos")).astype(np.int64)
            rows: list[dict] = []
            if carry is not None:
                cterm, cs, cl, cdl, cpo = carry
                if cterm == t_vals[int(t_idx[0])] and cs == int(s[0]):
                    nc = cl.size  # run continues: prepend the carry
                    t_idx = np.concatenate(
                        [np.full(nc, t_idx[0], dtype=np.int64), t_idx]
                    )
                    s = np.concatenate([np.full(nc, cs, dtype=np.int64), s])
                    l = np.concatenate([cl, l])
                    dl = np.concatenate([cdl, dl])
                    po = np.concatenate([cpo, po])
                else:  # carry was a complete run
                    rows.extend(
                        _emit(
                            np.zeros(cl.size, dtype=np.int64), [cterm],
                            np.full(cl.size, cs, dtype=np.int64), cl, cdl, cpo,
                        )
                    )
                carry = None
            # hold back the (possibly still open) final run
            last_start = int(
                np.flatnonzero(
                    np.concatenate(
                        (
                            [True],
                            (t_idx[1:] != t_idx[:-1]) | (s[1:] != s[:-1]),
                        )
                    )
                )[-1]
            )
            carry = (
                t_vals[int(t_idx[last_start])],
                int(s[last_start]),
                l[last_start:].copy(),
                dl[last_start:].copy(),
                po[last_start:].copy(),
            )
            rows.extend(
                _emit(
                    t_idx[:last_start], t_vals, s[:last_start],
                    l[:last_start], dl[:last_start], po[:last_start],
                )
            )
            if rows:
                yield _rows_batch(rows)
        if carry is not None and carry[2].size:
            cterm, cs, cl, cdl, cpo = carry
            yield _rows_batch(
                _emit(
                    np.zeros(cl.size, dtype=np.int64), [cterm],
                    np.full(cl.size, cs, dtype=np.int64), cl, cdl, cpo,
                )
            )

    return encode_stream


# --------------------------------------------------------------------------
# manifests
# --------------------------------------------------------------------------


def _manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "manifests")


def _write_manifest(index_dir: str, name: str, payload: dict) -> None:
    os.makedirs(_manifest_dir(index_dir), exist_ok=True)
    path = os.path.join(_manifest_dir(index_dir), name)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic commit


def _read_manifest(index_dir: str, name: str) -> dict | None:
    try:
        with open(os.path.join(_manifest_dir(index_dir), name)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def input_fingerprint(spark: SparkSession, input_path: str) -> str:
    """Cheap lineage identity of the input table. For an Iceberg input
    (``iceberg:<table>``, sources/pages.read_pages) this is the table's
    CURRENT SNAPSHOT ID — the exact immutable data version the build read,
    resumable/auditable across engines. For filesystem parquet it falls
    back to a file-name+size listing checksum."""
    if input_path.startswith("iceberg:"):
        tbl = input_path[len("iceberg:"):]
        # The CURRENT snapshot pointer (the `main` branch ref), NOT
        # MAX(committed_at) over the snapshots log: after a rollback the
        # newest-ever snapshot is not the version a scan reads, and a
        # concurrent commit between fingerprint and scan would race
        # (round-3 advice). `refs` is the branch-pointer metadata table.
        row = (
            spark.sql(
                f"SELECT snapshot_id FROM {tbl}.refs WHERE name = 'main'"
            ).collect()
        )
        return f"iceberg-snapshot:{row[0]['snapshot_id']}" if row else "iceberg-snapshot:empty"
    jvm_files = []
    for root, _, files in os.walk(input_path):
        for fn in files:
            if fn.endswith((".parquet", ".orc")) or not fn.startswith(("_", ".")):
                p = os.path.join(root, fn)
                jvm_files.append(f"{os.path.relpath(p, input_path)}:{os.path.getsize(p)}")
    if not jvm_files and os.path.isfile(input_path):
        jvm_files = [f"{os.path.basename(input_path)}:{os.path.getsize(input_path)}"]
    blob = "\n".join(sorted(jvm_files)).encode()
    return f"{zlib.crc32(blob):08x}:{len(jvm_files)}"


def _checksum_cols(df: DataFrame) -> list[str]:
    """Columns folded into the per-bucket xxhash64 content checksum.
    `fmt` joined the segment schema when PForDelta landed; an index
    built before that has no such column, and its persisted manifests
    were hashed WITHOUT it — so `fmt` participates only when present,
    keeping recomputed checksums comparable to pre-fmt manifests (and
    avoiding an unresolved-column error on the scan)."""
    cols = ["term", "shard", "n"]
    if "fmt" in df.columns:
        cols.append("fmt")
    return cols + ["deltas", "tfs", "doclens", "positions"]


def bucket_checksums(spark: SparkSession, seg_path: str, buckets: list[int]) -> dict[int, dict]:
    """Order-independent content checksums for many buckets in ONE job
    (per-bucket jobs would add ~0.3s fixed cost × n_buckets)."""
    df = spark.read.parquet(seg_path).filter(F.col("bucket").isin(buckets))
    rows = (
        df.groupBy("bucket")
        .agg(
            F.count("*").alias("rows"),
            F.sum("n").alias("postings"),
            # bit_xor, not sum: order-independent AND overflow-free under
            # ANSI mode (sum of 64-bit hashes overflows LongType)
            F.bit_xor(
                F.xxhash64(*_checksum_cols(df))
            ).alias("checksum"),
        )
        .collect()
    )
    out = {
        int(r["bucket"]): {
            "rows": r["rows"],
            "postings": int(r["postings"] or 0),
            "checksum": int(r["checksum"] or 0),
        }
        for r in rows
    }
    for b in buckets:  # buckets with zero terms still get a manifest
        out.setdefault(b, {"rows": 0, "postings": 0, "checksum": 0})
    return out


def bucket_checksum(spark: SparkSession, seg_path: str, b: int) -> dict:
    return bucket_checksums(spark, seg_path, [b])[b]


# --------------------------------------------------------------------------
# build (two phases, resumable)
# --------------------------------------------------------------------------


def build_segments(
    tok_docs: DataFrame,
    index_dir: str,
    input_path: str,
    n_buckets: int = N_BUCKETS,
    n_shards: int = N_SHARDS,
    buckets_per_job: int = 16,
    progress: bool = False,
    stemmed: bool = False,
    codec_fmt: str = codec.FMT_PFOR,
) -> None:
    """Full (resumable) index build. Safe to re-invoke after a crash: every
    completed unit is skipped via its manifest; a fingerprint mismatch
    (input changed) fails loudly rather than mixing lineages.

    `stemmed` records (in stats.json) that tok_docs carried Porter-stemmed
    tokens (corpus.tokenized_docs(stem=True)); SegmentIndex/ServingIndex
    read the flag and switch their query analyzers to the stemmed variants
    automatically — callers never have to know how an index was built.

    `codec_fmt` picks the posting-stream codec: "pfor" (PForDelta, the
    default — ~35% smaller posting payload at equal build throughput,
    and the serving decoded-postings LRU makes warm-query latency
    codec-independent; see index/codec.py) or "vb" (varbyte — simpler,
    ~25% faster on COLD first-touch decodes, the right choice for
    one-shot batch scans that never warm a cache). The flag is persisted in stats.json and stamped on
    every segment row, so queries/merges/compaction need no out-of-band
    knowledge and mixed-codec indexes (old buckets vb, merged buckets
    pfor) decode correctly per row."""
    spark = tok_docs.sparkSession
    os.makedirs(index_dir, exist_ok=True)
    fp = input_fingerprint(spark, input_path)

    # ---- phase 1: tf rows + stats ----------------------------------------
    p1 = _read_manifest(index_dir, "phase1.json")
    if p1 and p1.get("status") == "complete":
        if p1["input_fingerprint"] != fp:
            raise ValueError(
                f"index at {index_dir} was built from a different input "
                f"({p1['input_fingerprint']} != {fp}); refusing to resume"
            )
        if bool(p1.get("stemmed", False)) != stemmed:
            raise ValueError(
                f"index at {index_dir} was built with stemmed="
                f"{p1.get('stemmed', False)}; refusing to resume with "
                f"stemmed={stemmed} (mixed analyzers in one index)"
            )
        if p1.get("codec", codec.FMT_VB) != codec_fmt:
            raise ValueError(
                f"index at {index_dir} was built with codec="
                f"{p1.get('codec', codec.FMT_VB)}; refusing to resume with "
                f"codec={codec_fmt} (a resumed build must re-encode only "
                f"missing buckets byte-identically)"
            )
    else:
        t0 = time.time()
        # ---- docmap first: dense per-shard ordinals (index/docmap.py).
        # Needs only the docid SET (a narrow column), no tokenization.
        dm = assign_local_ids(tok_docs.select("docid"), n_shards)
        dm.write.mode("overwrite").parquet(f"{index_dir}/docmap_ids")
        dm = spark.read.parquet(f"{index_dir}/docmap_ids")

        # ---- postings: join docs to their lids BEFORE exploding tokens
        # (a doc-level sort-merge exchange — the token payload moves once
        # here and once in the salted repartition below; the prize is
        # posting deltas over dense lids, several-fold smaller on disk and
        # proportionally faster to decode).
        tok_l = tok_docs.join(dm, "docid")
        occ = tok_l.select(
            F.col("local_id").alias("lid"),
            "doclen",
            "shard",
            F.posexplode("tokens").alias("pos", "term"),
        ).withColumn("bucket", bucket_col(F.col("term"), n_buckets))
        # THE shuffle of the build: salted repartition on (term, shard) +
        # sort-within-partitions. The sort leads with `bucket` (a function
        # of term) so the partitionBy writer sees its required ordering
        # already satisfied and preserves row order inside each file —
        # every (term, shard) group lands contiguous and sorted in exactly
        # one file of its bucket directory.
        (
            occ.repartition(F.col("term"), F.col("shard"))
            .sortWithinPartitions("bucket", "term", "shard", "lid", "pos")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{index_dir}/postings")
        )
        # ---- finalize the docmap as the forward index: attach doclen
        # (derived from the written postings — no re-tokenize; zero-token
        # docs get doclen 0 and simply own an unused lid).
        pr = spark.read.parquet(f"{index_dir}/postings")
        dl = pr.groupBy("shard", "lid").agg(F.first("doclen").alias("doclen"))
        # corpus stats ride the docmap WRITE as an Observation — no
        # separate re-read/aggregate job afterwards (round-4 serial-floor
        # item: every extra job is fixed scheduling cost that hits the
        # high-core scaling leg proportionally harder)
        from pyspark.sql import Observation

        obs = Observation("docmap_stats")
        (
            dm.join(
                dl.withColumnRenamed("lid", "local_id"),
                ["shard", "local_id"],
                "left",
            )
            .withColumn("doclen", F.coalesce(F.col("doclen"), F.lit(0)))
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum("doclen").alias("sum_dl"),
            )
            .write.mode("overwrite")
            .parquet(f"{index_dir}/docmap")
        )
        import shutil as _shutil

        _shutil.rmtree(f"{index_dir}/docmap_ids", ignore_errors=True)
        stats_row = obs.get
        n_input = int(stats_row["n"])
        cs = CorpusStats(
            n_docs=n_input,
            avgdl=float(stats_row["sum_dl"] or 0) / n_input if n_input else 0.0,
        )
        with open(f"{index_dir}/stats.json", "w") as f:
            json.dump(
                {
                    "n_docs": cs.n_docs,
                    "avgdl": cs.avgdl,
                    # exact integer Σdoclen: lets GenerationSet derive the
                    # logical stats of a generation union without reading
                    # any docmap column (r7; maintained by merge/compact/
                    # promote in lockstep with n_docs/avgdl)
                    "sum_doclen": int(stats_row["sum_dl"] or 0),
                    "n_buckets": n_buckets,
                    "n_shards": n_shards,
                    "stemmed": stemmed,
                    "codec": codec_fmt,
                },
                f,
            )
        _write_manifest(
            index_dir,
            "phase1.json",
            {
                "status": "complete",
                "input_path": input_path,
                "input_fingerprint": fp,
                "n_docs": cs.n_docs,
                "avgdl": cs.avgdl,
                "n_buckets": n_buckets,
                "n_shards": n_shards,
                "stemmed": stemmed,
                "codec": codec_fmt,
                "elapsed_sec": round(time.time() - t0, 2),
            },
        )

    # ---- phase 2 + finalize ------------------------------------------------
    encode_pending_buckets(spark, index_dir, fp, buckets_per_job, progress)


def _normalize_occurrence_buckets(
    spark: SparkSession, index_dir: str, meta: dict, buckets: list[int]
) -> None:
    """Rewrite each bucket's occurrence rows with the build's
    repartition(term, shard) + sort, restoring the one-file-per-group
    invariant promotion's file appends relaxed, then clear its marker.
    Crash-safe: staged write + rename-with-backup swap per bucket; a
    re-run simply re-normalizes (idempotent)."""
    from honeywell_search_engine_spark.index.maintenance import _swap_bucket_dir

    for b in buckets:
        src = f"{index_dir}/postings/bucket={b}"
        staged = f"{index_dir}/postings_norm_bucket_{b}"
        # repair a crash inside a PRIOR normalize's swap window: between
        # _swap_bucket_dir's two renames the live dir is missing and the
        # data sits in .bak — restore it before reading, or the scan below
        # fails and the stray bucket=N.bak dir poisons partition inference
        bak = src + ".bak"
        if not os.path.isdir(src) and os.path.isdir(bak):
            os.rename(bak, src)
        (
            spark.read.parquet(src)
            .repartition(F.col("term"), F.col("shard"))
            .sortWithinPartitions("term", "shard", "lid", "pos")
            .write.mode("overwrite")
            .parquet(staged)
        )
        _swap_bucket_dir(src, staged)
        meta["occ_multifile_buckets"] = [
            x for x in meta.get("occ_multifile_buckets", []) if x != b
        ]
        with open(f"{index_dir}/stats.json", "w") as f:
            json.dump(meta, f)


def encode_pending_buckets(
    spark: SparkSession,
    index_dir: str,
    fp: str,
    buckets_per_job: int = 16,
    progress: bool = False,
) -> None:
    """Phase 2: encode every bucket whose manifest is missing/incomplete
    (NO shuffle — groups are file-contiguous by construction), then
    finalize term_stats from segment metadata. Idempotent; also the merge
    path after deltas invalidate buckets."""
    with open(f"{index_dir}/stats.json") as f:
        meta = json.load(f)
    avgdl = meta["avgdl"]
    n_buckets = meta["n_buckets"]
    codec_fmt = meta.get("codec", codec.FMT_VB)
    todo = [
        b
        for b in range(n_buckets)
        if (m := _read_manifest(index_dir, f"bucket_{b}.json")) is None
        or m.get("status") != "complete"
    ]
    # promotion (index/promote.py) APPENDS delta occurrence files to its
    # affected buckets; the no-shuffle encode below requires every
    # (term, shard) group contiguous in ONE file. Normalize any marked
    # bucket we are about to re-encode first (one pruned repartition+sort
    # per bucket — only reachable after a crash mid-promotion or a manual
    # manifest invalidation; the promote path itself never re-encodes).
    multi = sorted(set(meta.get("occ_multifile_buckets", [])) & set(todo))
    if multi:
        _normalize_occurrence_buckets(spark, index_dir, meta, multi)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # a (term, shard) group must never be split across scan partitions.
    # Spark's actual split size is min(maxPartitionBytes, max(openCost,
    # bytes/parallelism)) — a huge maxPartitionBytes alone does NOT forbid
    # splitting when bytes/core shrinks, so pin BOTH knobs: every phase-1
    # file becomes exactly one scan partition (one task per file — the
    # file is the atomic unit; a group lives in one file by construction).
    prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_oc = spark.conf.get("spark.sql.files.openCostInBytes")
    prev_arb = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(512 * 1024**3))
    spark.conf.set("spark.sql.files.openCostInBytes", str(512 * 1024**3))
    # 100k-row Arrow batches for the encoder: per-batch fixed work
    # (dictionary encode, carry splice, varbyte setup) dominates at the
    # 10k default; measured fastest at ~100k (bigger thrashes caches)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
    encoder = make_segment_encoder(avgdl, n_buckets, fmt=codec_fmt)
    try:
        for i in range(0, len(todo), buckets_per_job):
            chunk = todo[i : i + buckets_per_job]
            t0 = time.time()
            rows = (
                spark.read.parquet(f"{index_dir}/postings")
                .filter(F.col("bucket").isin(chunk))  # partition-pruned scan
                .select("term", "shard", "lid", "doclen", "pos")
            )
            # repartition the (small, self-contained) ENCODED rows by
            # bucket before the write: one output file per bucket instead
            # of tasks-per-bucket fragments — the serial driver-side
            # commit shrinks ~17x and every later bucket-pruned query
            # scan touches exactly one file. The exchange moves only the
            # compressed segment payload (~0.7% of the corpus).
            encoded = rows.mapInArrow(encoder, schema=SEGMENT_SCHEMA).repartition(
                len(chunk), F.col("bucket")
            )
            (
                encoded.write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(f"{index_dir}/segments")
            )
            elapsed = round(time.time() - t0, 2)
            chks = bucket_checksums(spark, f"{index_dir}/segments", chunk)
            for b in chunk:
                _write_manifest(
                    index_dir,
                    f"bucket_{b}.json",
                    {
                        "status": "complete",
                        "bucket": b,
                        "input_fingerprint": fp,
                        "chunk_elapsed_sec": elapsed,
                        **chks[b],
                    },
                )
            if progress:
                print(f"[build_segments] buckets {chunk[0]}..{chunk[-1]} in {elapsed}s")
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", prev_oc)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev_arb)

    # ---- finalize: term_stats from segment metadata (no posting scan) ----
    fin = _read_manifest(index_dir, "finalize.json")
    if not todo and fin and fin.get("status") == "complete":
        return
    seg = spark.read.parquet(f"{index_dir}/segments")
    ts = (
        seg.groupBy("term")
        .agg(F.sum("n").alias("df"), F.sum("ctf").alias("ctf"))
        .withColumn(
            "idf",
            F.log1p(
                (F.lit(float(meta["n_docs"])) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
    )
    # n_postings == sum(df) over term_stats (df = sum of per-segment n), so
    # it rides the term_stats WRITE as an Observation — the separate
    # full-segments aggregate job is gone (round-4 serial-floor item)
    from pyspark.sql import Observation

    obs = Observation("term_stats_totals")
    (
        ts.coalesce(1)
        .sortWithinPartitions("term")  # row-group pruning for prefix scans
        .observe(obs, F.sum("df").alias("n_postings"))
        .write.mode("overwrite")
        .parquet(f"{index_dir}/term_stats")
    )
    n_postings = obs.get["n_postings"]
    _write_manifest(
        index_dir,
        "finalize.json",
        {
            "status": "complete",
            "input_fingerprint": fp,
            "n_postings": int(n_postings or 0),
        },
    )


def load_tombstones(index_dir: str) -> frozenset[int]:
    """Union of all tombstoned docids (see maintenance.delete_docs)."""
    tdir = os.path.join(index_dir, "tombstones")
    if not os.path.isdir(tdir):
        return frozenset()
    dead: set[int] = set()
    for fn in sorted(os.listdir(tdir)):
        if fn.endswith(".json"):
            with open(os.path.join(tdir, fn)) as f:
                dead.update(json.load(f)["docids"])
    return frozenset(dead)


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------


class SegmentIndex:
    """Reader handle over a built segment index directory."""

    def __init__(self, spark: SparkSession, path: str, isolate_session: bool = True):
        # Point-query session (r7): same SparkContext, isolated SQLConf,
        # AQE off. Every query through this handle is a couple of
        # single-digit-row exchanges (pruned terms × shards, then k rows)
        # — AQE has nothing to adapt, and its stage-by-stage
        # materialization adds fixed per-query latency (measured ~35-50
        # ms/query on the 20-query reference loop, ~0.7-1.0 s of the
        # loop). Builder-level conf (shuffle partitions, arrow, excluded
        # rules) is inherited by newSession(); only the AQE toggle
        # differs, and only for DataFrames built from this handle —
        # corpus-scale work (build/merge/compact/promote) reads its own
        # paths on the caller's session and keeps AQE.
        if isolate_session:
            q = spark.newSession()
            q.conf.set("spark.sql.adaptive.enabled", "false")
            spark = q
        self.spark = spark
        self.path = path
        with open(f"{path}/stats.json") as f:
            meta = json.load(f)
        self.stats = CorpusStats(meta["n_docs"], meta["avgdl"])
        self.n_buckets = meta["n_buckets"]
        self.n_shards = meta["n_shards"]
        self.stemmed = bool(meta.get("stemmed", False))
        self.codec_fmt = meta.get("codec", "vb")
        missing = [
            b
            for b in range(self.n_buckets)
            if (m := _read_manifest(path, f"bucket_{b}.json")) is None
            or m.get("status") != "complete"
        ]
        if missing:
            raise ValueError(f"index at {path} incomplete: buckets {missing[:8]}...")
        self.segments = spark.read.parquet(f"{path}/segments")
        self.term_stats = spark.read.parquet(f"{path}/term_stats")
        self.docmap = spark.read.parquet(f"{path}/docmap")
        # pruned docmap projection built ONCE: rehydrate runs per query
        # and every DataFrame op is a py4j round trip (~100 ms of pure
        # driver-side plan construction per point query before this
        # round's trim — guide §1: measure the whole query, including
        # what the driver does before the first task)
        self._dm = self.docmap.select(
            "shard", F.col("local_id").alias("lid"), "docid"
        )
        # static temp views registered ONCE: spark.sql {df} templating
        # re-registers a temp view per substitution per call (~7 ms each,
        # measured), so per-query SQL references these by name instead.
        # Names are instance-unique (two indexes can share a session when
        # isolate_session=False).
        import uuid as _uuid

        tag = _uuid.uuid4().hex[:10]
        self._seg_view = f"hse_seg_{tag}"
        self._ts_view = f"hse_ts_{tag}"
        self._dm_view = f"hse_dm_{tag}"
        self.segments.createOrReplaceTempView(self._seg_view)
        self.term_stats.createOrReplaceTempView(self._ts_view)
        self._dm.createOrReplaceTempView(self._dm_view)
        self._idf_cache: dict[str, float | None] = {}
        self.tombstones = load_tombstones(path)
        self._dead_bc = None
        self._scope_bcs: "OrderedDict[int, object]" = OrderedDict()

    def dead_broadcast(self):
        """Tombstones translated to shard-local ordinals and memoized as a
        Spark broadcast of {shard: sorted int64 lid array} (None when
        empty). A million tombstones is one ~8 MB broadcast shipped once
        per executor — never a per-task closure set."""
        if not self.tombstones:
            return None
        if self._dead_bc is None:
            from honeywell_search_engine_spark.index.docmap import dead_lids_by_shard

            by_shard = dead_lids_by_shard(self.docmap, self.tombstones)
            self._dead_bc = self.spark.sparkContext.broadcast(by_shard)
        return self._dead_bc

    def scope_broadcast(self, allowed_docids):
        """A query-time docid scope (the reference restricts every search
        to the caller's own documents — allowed_ids,
        backend/app/routers/search.py:99-116 / F2-F3) translated to
        {shard: sorted lid array} and broadcast, same mechanics as
        tombstones. Returns None for an unrestricted query.

        MEMOIZED per docid set (a caller's scope repeats across their
        query stream — round-2 advice: rebuilding the broadcast per query
        re-collected the translation every time). Small scopes only: the
        query layer (query/wand.py) routes scopes above SCOPE_INLINE_MAX
        through a cogroup join instead, so this path never materializes a
        large scope on the driver."""
        if allowed_docids is None:
            return None
        # Keyed by the frozenset VALUE (frozensets hash AND compare by
        # content) — keying by hash() alone would let two distinct scopes
        # that collide on the 64-bit hash silently share a broadcast and
        # leak one caller's scoped results to another (round-3 advice).
        key = frozenset(int(d) for d in allowed_docids)
        if key in self._scope_bcs:
            self._scope_bcs.move_to_end(key)
            return self._scope_bcs[key]
        from honeywell_search_engine_spark.index.docmap import dead_lids_by_shard

        by_shard = dead_lids_by_shard(self.docmap, allowed_docids)
        bc = self.spark.sparkContext.broadcast(by_shard)
        self._scope_bcs[key] = bc
        if len(self._scope_bcs) > 64:  # bound driver+executor memory
            _, old = self._scope_bcs.popitem(last=False)
            old.unpersist()
        return bc

    def rehydrate(self, df: DataFrame) -> DataFrame:
        """(shard, lid, ...) -> same rows with the global `docid` attached
        from the docmap. The kernel output side is tiny (<= shards * k), so
        it broadcasts and the docmap is the streamed side, column-pruned to
        (shard, local_id, docid). At 10^12 docs this becomes a docvalues
        point lookup (lid min/max row-group pruning or a KV fetch); the
        join form keeps the whole query one lazy plan."""
        return F.broadcast(df).join(self._dm, ["shard", "lid"])

    def idf_map(self, terms: list[str]) -> dict[str, float]:
        """idf for the given terms (absent term => absent key). Driver-side
        memoized: repeated query terms never re-launch the lookup job. The
        underlying scan is partition/row-group pruned — never a full
        dictionary read."""
        missing = [t for t in terms if t not in self._idf_cache]
        if missing:
            rows = (
                self.term_stats.filter(F.col("term").isin(missing))
                .select("term", "idf")
                .collect()
            )
            found = {r["term"]: float(r["idf"]) for r in rows}
            for t in missing:
                self._idf_cache[t] = found.get(t)
        return {t: v for t in terms if (v := self._idf_cache[t]) is not None}

    def segments_for(self, terms: list[str]) -> DataFrame:
        buckets = sorted({bucket_of(t, self.n_buckets) for t in terms})
        return self.segments.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )

    def segments_with_idf(self, terms: list[str]) -> DataFrame:
        """Pruned segment rows with `idf` attached via a broadcast join of
        the (filtered) term dictionary — lets a query run as ONE Spark job
        with no separate idf-lookup action.

        Built as ONE templated spark.sql call instead of the equivalent
        filter/isin/join chain: same plan (bucket partition pruning, term
        pushdown, broadcast idf), ~2× fewer driver-side py4j round trips
        per point query (59.6 → 33.3 ms/call measured; r7 late)."""
        buckets = sorted({bucket_of(t, self.n_buckets) for t in terms})
        lits = ",".join("'" + t.replace("'", "''") + "'" for t in terms)
        return self.spark.sql(
            f"SELECT /*+ BROADCAST(t) */ s.*, t.idf FROM {self._seg_view} s "
            f"JOIN {self._ts_view} t USING (term) "
            f"WHERE s.bucket IN ({','.join(map(str, buckets))}) "
            f"AND s.term IN ({lits})"
        )


def index_report(spark: SparkSession, index_dir: str) -> "DataFrame":
    """Ops surface: one row per bucket joining the LIVE segment stats
    (terms, postings, payload bytes) with the persisted lineage manifest
    (checksum, fingerprint, build status) — the table an operator scans
    for skew (a hot bucket), staleness (fingerprint drift), or corruption
    (manifest checksum vs recomputed). One Spark job over the segment
    metadata columns; payload columns are length()-ed, never decoded."""
    seg = spark.read.parquet(f"{index_dir}/segments")
    live = (
        seg
        .groupBy("bucket")
        .agg(
            F.count_distinct("term").alias("n_terms"),
            F.count("*").alias("n_rows"),
            F.sum("n").alias("n_postings"),
            F.sum(
                F.length("deltas") + F.length("tfs") + F.length("doclens")
                + F.coalesce(F.length("positions"), F.lit(0))
            ).alias("payload_bytes"),
            F.bit_xor(
                F.xxhash64(*_checksum_cols(seg))
            ).alias("live_checksum"),
        )
    )
    man = []
    for name in os.listdir(f"{index_dir}/manifests"):
        if name.startswith("bucket_") and name.endswith(".json"):
            m = _read_manifest(index_dir, name) or {}
            man.append(
                (
                    int(name[len("bucket_"):-len(".json")]),
                    m.get("status", "missing"),
                    int(m.get("checksum", 0)),
                    m.get("input_fingerprint", ""),
                )
            )
    mdf = spark.createDataFrame(
        man, "bucket int, status string, manifest_checksum long, input_fingerprint string"
    )
    return (
        live.join(F.broadcast(mdf), "bucket", "full_outer")
        .withColumn(
            "checksum_ok", F.col("live_checksum") == F.col("manifest_checksum")
        )
        .orderBy("bucket")
    )
