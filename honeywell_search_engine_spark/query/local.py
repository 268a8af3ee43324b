"""Serving-node query path: in-process BM25 over the Spark-built segments.

Why this exists: the reference's latency targets (p95 < 500 ms, 100 q/s —
reference PIPELINE.md:349-350) describe its *serving process* (FastAPI +
Postgres GIN lookups, backend/app/routers/search.py), not a batch engine.
Spark is the right tool for building, merging, and compacting the index
and for batch query workloads (query/wand.py), but a per-query Spark job
carries a fixed ~0.3-0.5 s scheduling cost that no kernel speed can
remove. The deployment story at 10^12 docs is the standard one: Spark
writes immutable segments to the lake; stateless serving nodes read them.

This module is that serving node. It is bit-exact with the Spark path by
construction — it runs the SAME shard kernels (query/wand.py) over the
SAME encoded rows; only the I/O differs:

- posting rows: pyarrow dataset read of ``{index}/segments`` with bucket
  partition-directory pruning + a `term IN (...)` filter pushed to parquet
  row groups — a query touches only its terms' lists (the whole point of
  an inverted index), a few KB-MB regardless of corpus size. Rows are
  LRU-memoized per term (hot-term working set).
- idf: the pruned term rows also ride the dataset read (term_stats is
  only needed for idf, which equals ln1p((N-df+.5)/(df+.5)) from the
  segment metadata df = sum of per-shard n) — no second lookup.
- docid rehydration: the docmap (forward index / docvalues) is loaded as
  per-shard lid->docid arrays. At bench scale that is a few MB; at
  10^12 docs a serving shard holds only ITS shard's docvalues
  (mmap/KV-backed), exactly like Lucene docvalues — the per-shard array
  layout here is that design at sandbox scale.

Tombstones are read from the same manifest files as the Spark path and
translated per shard with vectorized searchsorted. An instance is a
snapshot of one immutable index generation (see query/cache.py — staged
swaps require reopening to observe).
"""

from __future__ import annotations

import json
import math
from collections import OrderedDict

import numpy as np

from honeywell_search_engine_spark.index.naive import bucket_of
from honeywell_search_engine_spark.index.segments import load_tombstones
from honeywell_search_engine_spark.query import wand as W


# Per-shard posting-list size above which the decode-through path switches
# from fully-vectorized full-scan kernels to the block-walk kernels with
# exact block-max pruning (still decode-free via MemoList slices). The
# crossover: a full scan costs ~10 ns/posting, so a 128k list is ~1.3 ms —
# about the fixed bookkeeping cost of the pruning kernels; below it the
# scan wins (measured ~3x at 20k docs), above it pruning's skipped work
# dominates (a Zipf head term at web scale is 10^6-10^8 postings/shard).
FULLSCAN_MAX_POSTINGS = 1 << 17


def _succ_prefix(prefix: str) -> str | None:
    """Smallest string greater than every string with prefix `prefix`:
    the last code point incremented (dropping trailing U+10FFFF, which
    has no successor). [prefix, _succ_prefix(prefix)) is the exact
    prefix range under code-point order — unlike prefix+U+FFFF, it
    admits supplementary-plane continuations. None ⇒ no finite upper
    bound exists (prefix is all U+10FFFF)."""
    for i in range(len(prefix) - 1, -1, -1):
        cp = ord(prefix[i])
        if cp < 0x10FFFF:
            # skip the surrogate block: chr(0xD800..0xDFFF) is a lone
            # surrogate that cannot be UTF-8 encoded when pyarrow builds
            # the `term < ub` filter (a prefix ending in U+D7FF would
            # otherwise raise instead of suggesting) — the next valid
            # scalar after U+D7FF is U+E000 (r6 advice, low)
            nxt = 0xE000 if 0xD800 <= cp + 1 <= 0xDFFF else cp + 1
            return prefix[:i] + chr(nxt)
    return None


class ServingIndex:
    """Spark-free reader over a segment index directory (serving node)."""

    def __init__(
        self,
        path: str,
        term_cache_capacity: int = 65536,
        decode_through: bool = True,
        dec_cache_bytes: int = 256 << 20,
        shards: list[int] | None = None,
    ):
        import pyarrow.parquet as pq

        self.path = path
        # decode-through: AND/OR/single queries run on fully-decoded
        # posting lists from the (term, shard) LRU — warm queries skip
        # codec work entirely (phrase/NEAR already did this). False keeps
        # the block-selective encoded kernels (used by parity tests; also
        # the right setting for a one-shot cold query over a huge term).
        self.decode_through = decode_through
        # shard-subset mode (the 10^12-doc deployment unit): this node
        # owns only `shards` — docmap rows and posting payloads load for
        # those shards alone, so per-node memory scales with owned
        # shards, not the corpus; idf still uses GLOBAL df (see _idf), so
        # scores are node-independent and a ShardRouter merge is exact.
        self._shards = sorted(set(int(s) for s in shards)) if shards is not None else None
        self._df_cache: dict[str, int] = {}
        with open(f"{path}/stats.json") as f:
            meta = json.load(f)
        self.n_docs = int(meta["n_docs"])
        self.avgdl = float(meta["avgdl"])
        self.n_shards = int(meta["n_shards"])
        self.n_buckets = int(meta["n_buckets"])
        # a Porter-stemmed index stems its queries too (same contract as
        # the Spark path — wand._analyzers_for reads this flag)
        self.stemmed = bool(meta.get("stemmed", False))
        self.codec_fmt = meta.get("codec", "vb")
        # forward index: per-shard lid->docid (lids may have holes after
        # compaction — fill with -1) + sorted docid->lid translation pair
        dm = pq.read_table(
            f"{path}/docmap", columns=["shard", "local_id", "docid"],
            filters=(
                [("shard", "in", self._shards)]
                if self._shards is not None
                else None
            ),
        )
        shard = dm.column("shard").to_numpy()
        lid = dm.column("local_id").to_numpy()
        docid = dm.column("docid").to_numpy()
        self._docid_of: dict[int, np.ndarray] = {}
        self._by_docid: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for s in np.unique(shard):
            m = shard == s
            ls, ds = lid[m], docid[m]
            arr = np.full(int(ls.max()) + 1 if ls.size else 0, -1, dtype=np.int64)
            arr[ls] = ds
            self._docid_of[int(s)] = arr
            o = np.argsort(ds)
            self._by_docid[int(s)] = (ds[o], ls[o])
        # tombstones -> {shard: sorted lid array}
        self._dead = self._lids_by_shard(load_tombstones(path))
        self._term_lru: OrderedDict[str, list[dict]] = OrderedDict()
        self._term_cap = term_cache_capacity
        # decoded-postings LRU: (term, shard) -> codec.MemoList (encoded
        # row + its full decode). BYTE-budgeted, not entry-counted: a head
        # term's entry is 10^4x a tail term's, so a count cap either
        # under-uses memory or blows it — `dec_cache_bytes` (default
        # 256 MiB) is the serving node's decoded-working-set budget; the
        # hot (Zipf head) terms that dominate hits fit first, and
        # eviction only ever hits cold tail entries (which are cheap to
        # re-decode by definition).
        self._dec_lru: OrderedDict[tuple, object] = OrderedDict()
        self._dec_budget = int(dec_cache_bytes)
        self._dec_bytes = 0
        # hook for generation-set serving (query/generations.py): when
        # set, df for idf comes from the LOGICAL index (sum over live
        # generations) instead of this instance's segment metadata
        self._df_global = None

    def reload(self) -> "ServingIndex":
        """Re-open the index in place after maintenance mutated it on disk
        (promote_generation / merge_deltas / compact): re-reads stats,
        docmap, and tombstones, and drops every cache (term-row LRU,
        decoded-postings LRU, df memo, hot-document LRU) — no process
        restart. Posting rows are read lazily per query, so between the
        on-disk swap and this call an UNCACHED term would pair new
        postings with old stats: for strict consistency either promote
        into a versioned directory and open a fresh node on it, or drain
        the node around the maintenance window; reload() is the
        refresh-in-place hook for deployments that accept that brief
        window. A GenerationSet member should not be reloaded directly
        (the injected global stats/shadows would be lost) — re-open the
        GenerationSet instead."""
        docs = getattr(self, "_docs_path", None)
        id_col = getattr(self, "_docs_id_col", "docid")
        text_col = getattr(self, "_docs_text_col", "text")
        self.__init__(
            self.path,
            term_cache_capacity=self._term_cap,
            decode_through=self.decode_through,
            dec_cache_bytes=self._dec_budget,
            shards=self._shards,
        )
        if docs is not None:
            self.attach_docs(docs, id_col=id_col, text_col=text_col)
        return self

    # ---- translation ----------------------------------------------------

    def _lids_by_shard(self, docids) -> dict[int, np.ndarray]:
        out: dict[int, np.ndarray] = {}
        if not docids:
            return out
        ids = np.array(sorted(int(d) for d in docids), dtype=np.int64)
        sh = ids % self.n_shards
        for s in np.unique(sh):
            ds, ls = self._by_docid.get(int(s), (None, None))
            if ds is None:
                continue
            want = ids[sh == s]
            pos = np.searchsorted(ds, want)
            ok = pos < ds.size
            ok[ok] = ds[pos[ok]] == want[ok]
            if ok.any():
                out[int(s)] = np.sort(ls[pos[ok]])
        return out

    # ---- pruned posting reads --------------------------------------------

    def _rows_for(self, terms: list[str]) -> dict[str, list[dict]]:
        """{term: [segment row dict per shard]} — LRU first, then ONE
        pruned dataset read for all missing terms. A shard-subset node
        reads only its OWN shards' posting payloads; global df (for idf —
        scores must be identical on every node) rides a second,
        metadata-columns-only read over all shards."""
        out: dict[str, list[dict]] = {}
        missing = []
        for t in dict.fromkeys(terms):
            if t in self._term_lru:
                self._term_lru.move_to_end(t)
                out[t] = self._term_lru[t]
            else:
                missing.append(t)
        if missing:
            import pyarrow.dataset as ds

            data = ds.dataset(
                f"{self.path}/segments", format="parquet", partitioning="hive"
            )
            buckets = sorted({bucket_of(t, self.n_buckets) for t in missing})
            flt = ds.field("bucket").isin(buckets) & ds.field("term").isin(missing)
            if self._shards is not None:
                df_tbl = data.to_table(filter=flt, columns=["term", "n"])
                dfs = {t: 0 for t in missing}
                for t, n in zip(
                    df_tbl.column("term").to_pylist(),
                    df_tbl.column("n").to_pylist(),
                ):
                    dfs[t] += int(n)
                self._df_cache.update(dfs)
                flt = flt & ds.field("shard").isin(list(self._shards))
            tbl = data.to_table(filter=flt)
            got: dict[str, list[dict]] = {t: [] for t in missing}
            for row in tbl.to_pylist():
                got[row["term"]].append(row)
            for t, rows in got.items():
                self._term_lru[t] = rows
                out[t] = rows
                if len(self._term_lru) > self._term_cap:
                    old_t, _ = self._term_lru.popitem(last=False)
                    self._df_cache.pop(old_t, None)
        return out

    def _idf(self, rows: list[dict], term: str | None = None) -> float:
        """idf from segment metadata: df = sum of per-shard n (identical to
        the finalize aggregate, index/stats.py). On a shard-subset node
        `rows` covers only the owned shards, so df comes from the global
        metadata cache instead — idf (and therefore every score) is
        node-independent."""
        if self._df_global is not None and term is not None:
            df = self._df_global(term)
        elif self._shards is not None and term is not None:
            df = self._df_cache.get(term, 0)
        else:
            df = sum(int(r["n"]) for r in rows)
        return math.log1p((self.n_docs - df + 0.5) / (df + 0.5))

    # ---- queries ----------------------------------------------------------

    def search(
        self,
        query: str,
        k: int = 10,
        mode: str = "and",
        allowed_docids=None,
        exclude_terms: list[str] | None = None,
        pre_analyzed: list[str] | None = None,
    ) -> list[tuple[int, float]]:
        """[(docid, score)] by (-score, docid) — rank/score bit-identical
        to query/wand.bm25_topk_wand (tested on the reference query set).
        `exclude_terms` is websearch '-term' negation (AND mode only).
        `pre_analyzed` supplies already-analyzed (stemmed) index terms and
        skips query analysis — Porter is not idempotent, so delegating
        callers must not round-trip stems through the analyzer."""
        if pre_analyzed is not None:
            terms = list(dict.fromkeys(pre_analyzed))
        else:
            _aq, _tok, _sg = W._analyzers_for(self)
            terms = _aq(query)
        if not terms:
            return []
        neg_terms: list[str] = []
        if exclude_terms:
            if mode != "and":
                raise ValueError("exclude_terms (websearch '-term') is AND-only")
            neg_terms = sorted(set(exclude_terms))
            if set(terms) & set(neg_terms):
                return []  # contradiction: a & !a never matches
        rows_by_term = self._rows_for(terms + neg_terms)
        if mode == "and" and any(not rows_by_term[t] for t in terms):
            return []  # a term unknown globally -> conjunction empty
        idf = {t: self._idf(r, t) for t, r in rows_by_term.items() if r}
        scope = self._lids_by_shard(allowed_docids) if allowed_docids is not None else None
        by_shard: dict[int, list] = {}
        neg_by_shard: dict[int, list] = {}
        for t in terms:
            for row in rows_by_term[t]:
                by_shard.setdefault(int(row["shard"]), []).append((t, row))
        for t in neg_terms:
            for row in rows_by_term[t]:
                neg_by_shard.setdefault(int(row["shard"]), []).append((t, row))
        out: list[tuple[int, float]] = []
        for s, trs in by_shard.items():
            dead = self._dead.get(s, W._NO_DEAD)
            sc = scope.get(s, W._NO_DEAD) if scope is not None else None
            if self.decode_through:
                all_rows = trs + neg_by_shard.get(s, [])
                if max(int(r["n"]) for _, r in all_rows) <= FULLSCAN_MAX_POSTINGS:
                    # small lists: fully-vectorized scan kernels over the
                    # cached decoded arrays — lowest constant cost, and
                    # pruning cannot pay for its bookkeeping at this size
                    # (measured ~3x faster than the block-walk kernels)
                    pls = [(t, self._decoded(t, s, r)) for t, r in trs]
                    neg_pls = [
                        (t, self._decoded(t, s, r))
                        for t, r in neg_by_shard.get(s, [])
                    ]
                    if mode == "and":
                        if len(pls) < len(terms):
                            continue
                        if len(terms) == 1:
                            res = W._topk_single_decoded(
                                pls[0][1], idf[pls[0][0]], self.avgdl, k,
                                dead, sc, neg_pls,
                            )
                        else:
                            res = W._shard_kernel_and_decoded(
                                pls, idf, self.avgdl, k, dead, scope=sc,
                                neg_pls=neg_pls,
                            )
                    else:
                        res = W._shard_kernel_or_decoded(
                            pls, idf, self.avgdl, k, dead, scope=sc
                        )
                    arr = self._docid_of[s]
                    out.extend(
                        (int(arr[int(l)]), float(v)) for l, v in res
                    )
                    continue
                # big lists (Zipf head terms): MemoList — the SAME
                # encoded kernels, with their exact block-max pruning
                # (essential at scale: a full scan of a 10M-posting list
                # per query doesn't survive 100x), but block "decode" is
                # a slice of the cached full decode
                rows = [(t, self._memo(t, s, r)) for t, r in trs]
                neg_rows = [
                    (t, self._memo(t, s, r))
                    for t, r in neg_by_shard.get(s, [])
                ]
            else:
                rows = [(t, W._enc_from_row(r)) for t, r in trs]
                neg_rows = [
                    (t, W._enc_from_row(r)) for t, r in neg_by_shard.get(s, [])
                ]
            if mode == "and":
                if len(rows) < len(terms):
                    continue
                if len(terms) == 1:
                    res = W._topk_single(
                        rows[0][1], idf[rows[0][0]], self.avgdl, k, dead, sc,
                        neg_rows,
                    )
                else:
                    res = W._shard_kernel_and(
                        rows, idf, self.avgdl, k, dead, scope=sc,
                        neg_rows=neg_rows,
                    )
            else:
                res = W._shard_kernel_or(rows, idf, self.avgdl, k, dead, scope=sc)
            arr = self._docid_of[s]
            out.extend((int(arr[int(l)]), float(v)) for l, v in res)
        out.sort(key=lambda r: (-r[1], r[0]))
        return out[:k]

    def search_websearch(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """FULL websearch_to_tsquery semantics (quoted adjacency groups,
        '-term' negation, '-"quoted"' negated phrases, the 'or' keyword)
        — mirrors query/wand.bm25_topk_websearch, bit-identical. Never
        raises on user query strings (round-3 advice)."""
        from honeywell_search_engine_spark.functions.analyzer import (
            parse_websearch_query,
        )

        _aq, _tok, _sg = W._analyzers_for(self)
        groups = _sg(parse_websearch_query(query))
        if not groups:
            return []
        single = len(groups) == 1 and not groups[0][3]
        if single and not groups[0][2]:
            all_pos, neg, _, _ = groups[0]
            # all_pos/neg are already index-analyzed — skip re-analysis
            # (Porter is not idempotent; round-4 advice, local.py:234)
            return self.search(query, k, exclude_terms=neg, pre_analyzed=all_pos)
        scan_terms = sorted(
            {t for g in groups for t in g[0]}
            | {t for g in groups for t in g[1]}
            | {t for g in groups for ph in g[3] for t in ph}
        )
        rows_by_term = self._rows_for(scan_terms)
        if single and any(not rows_by_term[t] for t in groups[0][0]):
            return []  # a required term unknown globally -> empty
        idf = {t: self._idf(r, t) for t, r in rows_by_term.items() if r}
        by_shard: dict[int, dict[str, dict]] = {}
        for t in scan_terms:
            for row in rows_by_term[t]:
                by_shard.setdefault(int(row["shard"]), {})[t] = row
        # terms needing positions: members of any quoted phrase, positive
        # or negated (adjacency verification reads them)
        need_pos = {
            t
            for g in groups
            for ph in (list(g[2]) + list(g[3]))
            for t in ph
        }
        out: list[tuple[int, float]] = []
        for s, tmap in by_shard.items():
            dead = self._dead.get(s, W._NO_DEAD)
            if self.decode_through:
                # MemoList-backed: the websearch kernels run unchanged
                # (selective probes become slices of the cached decode)
                by_term = {
                    t: self._memo(t, s, r, positions=t in need_pos)
                    for t, r in tmap.items()
                }
            else:
                by_term = {t: W._enc_from_row(r) for t, r in tmap.items()}
            if single:
                all_pos, neg, phrases, _ = groups[0]
                if any(t not in by_term for t in all_pos):
                    continue
                pos_rows = [(t, by_term[t]) for t in all_pos]
                neg_rows = [(t, by_term[t]) for t in neg if t in by_term]
                res = W._shard_kernel_websearch(
                    pos_rows, phrases, neg_rows, idf, self.avgdl, k, dead
                )
            else:
                res = W._shard_kernel_websearch_or(
                    groups, by_term, idf, self.avgdl, k, dead
                )
            arr = self._docid_of[s]
            out.extend((int(arr[int(l)]), float(v)) for l, v in res)
        out.sort(key=lambda r: (-r[1], r[0]))
        return out[:k]

    def search_phrase(
        self, phrase: str, k: int = 10, slop: int = 0
    ) -> list[tuple[int, float]]:
        """Exact phrase / ordered-NEAR — mirrors wand.bm25_topk_phrase.

        Positional decode rides a (term, shard)-keyed LRU of fully-decoded
        posting lists, so a warm phrase query costs only intersection +
        positional verify — no varbyte work (measured ~3x faster at 60k
        docs; same results, pinned vs the Spark path and oracle)."""
        _aq, _tok, _sg = W._analyzers_for(self)
        terms = _tok(phrase)
        if not terms:
            return []
        rows_by_term = self._rows_for(terms)
        if any(not rows_by_term[t] for t in set(terms)):
            return []
        idf = {t: self._idf(r, t) for t, r in rows_by_term.items()}
        by_shard: dict[int, dict[str, dict]] = {}
        for t, rows in rows_by_term.items():
            for row in rows:
                by_shard.setdefault(int(row["shard"]), {})[t] = row
        out: list[tuple[int, float]] = []
        for s, tmap in by_shard.items():
            if any(t not in tmap for t in terms):
                continue
            dead = self._dead.get(s, W._NO_DEAD)
            if max(int(tmap[t]["n"]) for t in terms) > FULLSCAN_MAX_POSTINGS:
                # head-term phrase: keep candidate-block selectivity
                # (positions sliced only for candidate blocks), decode-free
                rows = [(t, self._memo(t, s, tmap[t], positions=True)) for t in terms]
                res = W._shard_kernel_phrase(
                    rows, idf, self.avgdl, k, dead, slop
                )
            else:
                pls = [(t, self._decoded(t, s, tmap[t], positions=True)) for t in terms]
                res = W._shard_kernel_phrase_decoded(
                    pls, idf, self.avgdl, k, dead, slop
                )
            arr = self._docid_of[s]
            out.extend((int(arr[int(l)]), float(v)) for l, v in res)
        out.sort(key=lambda r: (-r[1], r[0]))
        return out[:k]

    def search_near_unordered(
        self, query: str, k: int = 10, dist: int = 3
    ) -> list[tuple[int, float]]:
        """Ranked unordered two-term NEAR — mirrors
        wand.bm25_topk_near_unordered (same decoded-postings LRU hot path
        as search_phrase; rank/score bit-identical, tested)."""
        _aq, _tok, _sg = W._analyzers_for(self)
        terms = _tok(query)
        if len(terms) != 2 or terms[0] == terms[1]:
            raise ValueError(
                "search_near_unordered is the two-distinct-term NEAR "
                f"operator; got {terms!r}"
            )
        rows_by_term = self._rows_for(terms)
        if any(not rows_by_term[t] for t in terms):
            return []
        idf = {t: self._idf(r, t) for t, r in rows_by_term.items()}
        by_shard: dict[int, dict[str, dict]] = {}
        for t, rows in rows_by_term.items():
            for row in rows:
                by_shard.setdefault(int(row["shard"]), {})[t] = row
        out: list[tuple[int, float]] = []
        for s, tmap in by_shard.items():
            if any(t not in tmap for t in terms):
                continue
            dead = self._dead.get(s, W._NO_DEAD)
            if max(int(tmap[t]["n"]) for t in terms) > FULLSCAN_MAX_POSTINGS:
                rows = [(t, self._memo(t, s, tmap[t], positions=True)) for t in terms]
                res = W._shard_kernel_phrase(
                    rows, idf, self.avgdl, k, dead, slop=dist, unordered=True
                )
            else:
                pls = [(t, self._decoded(t, s, tmap[t], positions=True)) for t in terms]
                res = W._shard_kernel_phrase_decoded(
                    pls, idf, self.avgdl, k, dead, slop=dist, unordered=True
                )
            arr = self._docid_of[s]
            out.extend((int(arr[int(l)]), float(v)) for l, v in res)
        out.sort(key=lambda r: (-r[1], r[0]))
        return out[:k]

    def _memo(self, term: str, shard: int, row: dict,
              positions: bool = False):
        """MemoList (encoded row + its full decode, codec.MemoList) for
        one (term, shard), LRU-memoized — the hot-term working set of a
        serving node, same idea as the encoded-row LRU one level up.
        Kernels run on it unchanged (block decode = slice) so warm
        queries keep block-max pruning but skip codec work. Positions
        (flat absolute) decode only when a positional query first asks
        (`positions=True`); an entry cached without them is upgraded in
        place, so AND/OR traffic never pays for position decode and a
        later phrase query on the same term still hits the LRU."""
        from honeywell_search_engine_spark.index import codec

        key = (term, shard)
        ml = self._dec_lru.get(key)
        if ml is None or (positions and ml.pl.positions is None):
            if ml is not None:  # positions upgrade replaces the entry
                del self._dec_lru[key]
                self._dec_bytes -= ml.nbytes
            enc = W._enc_from_row(row)
            ml = codec.MemoList(
                enc,
                codec.decode_postings(
                    enc, with_positions=positions, flat_positions=True
                ),
            )
            if ml.nbytes > self._dec_budget:
                # An entry that alone exceeds the budget (a Zipf head
                # term at scale: 10^7+ postings/shard decodes past the
                # 256 MiB default) must NOT enter the LRU — inserting
                # it first would flush every other warm entry before
                # being discarded itself. Serve it uncached.
                return ml
            self._dec_lru[key] = ml
            self._dec_lru.move_to_end(key)
            self._dec_bytes += ml.nbytes
            while self._dec_bytes > self._dec_budget:
                k_old, old = self._dec_lru.popitem(last=False)
                self._dec_bytes -= old.nbytes
        else:
            self._dec_lru.move_to_end(key)
        return ml

    def _decoded(self, term: str, shard: int, row: dict,
                 positions: bool = False):
        """The cached PostingList for one (term, shard) — the phrase/NEAR
        kernels consume the decoded arrays directly."""
        return self._memo(term, shard, row, positions).pl

    # ---- suggest / spell (serving-side mirrors of query/suggest.py) ------

    def suggest(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        """Serving-node autocomplete: dictionary terms extending `prefix`,
        most-frequent first — [(term, df)], rank-identical to
        query/suggest.suggest_terms (df desc, term asc). The prefix is
        pushed as a half-open range [prefix, succ(prefix)) into the
        term_stats parquet scan — the finalize step writes it
        term-sorted, so row-group min/max statistics prune to the
        prefix's range — and verified exactly with str.startswith on
        the pruned slice. The upper bound is the SUCCESSOR prefix (last
        code point incremented, see _succ_prefix), not prefix+U+FFFF:
        a term whose next character after the prefix is
        supplementary-plane (> U+FFFF) compares greater than that
        bound and would be silently excluded even though it extends
        the prefix."""
        if not prefix:
            return []
        import pyarrow.dataset as ds

        data = ds.dataset(f"{self.path}/term_stats", format="parquet")
        flt = ds.field("term") >= prefix
        ub = _succ_prefix(prefix)
        if ub is not None:
            flt = flt & (ds.field("term") < ub)
        tbl = data.to_table(filter=flt, columns=["term", "df"])
        rows = [
            (t, int(d))
            for t, d in zip(
                tbl.column("term").to_pylist(), tbl.column("df").to_pylist()
            )
            if t.startswith(prefix)
        ]
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k]

    def correct_terms(
        self, terms: list[str], spell_dir: str, max_edit: int = 2, k: int = 3
    ) -> dict[str, list[tuple[str, int, int]]]:
        """Serving-side SymSpell lookup against a persisted deletes table
        (query/suggest.build_spell_table(out_dir=...)): {qterm: [(term,
        distance, df)]} ranked (distance asc, df desc, term asc) —
        candidate-set- and rank-identical to query/suggest.correct_terms
        (same delete-key theorem, same verify). The parquet read is
        filtered to the query terms' delete neighborhoods — a few hundred
        keys — so a serving node never scans the dictionary."""
        from honeywell_search_engine_spark.query.suggest import (
            py_deletes,
            py_levenshtein,
        )

        import pyarrow.dataset as ds

        qterms = list(dict.fromkeys(terms))
        if not qterms:
            return {}
        keys_by_term = {t: py_deletes(t, max_edit) for t in qterms}
        all_keys = sorted(set().union(*keys_by_term.values()))
        data = ds.dataset(spell_dir, format="parquet")
        tbl = data.to_table(
            filter=ds.field("delkey").isin(all_keys),
            columns=["delkey", "term", "df"],
        )
        by_key: dict[str, set] = {}
        cand_df: dict[str, int] = {}
        for dk, t, df in zip(
            tbl.column("delkey").to_pylist(),
            tbl.column("term").to_pylist(),
            tbl.column("df").to_pylist(),
        ):
            by_key.setdefault(dk, set()).add(t)
            cand_df[t] = int(df)
        out: dict[str, list[tuple[str, int, int]]] = {}
        for q in qterms:
            cands = set()
            for dk in keys_by_term[q]:
                cands |= by_key.get(dk, set())
            scored = [
                (t, d, cand_df[t])
                for t in cands
                if (d := py_levenshtein(q, t)) <= max_edit
            ]
            scored.sort(key=lambda r: (r[1], -r[2], r[0]))
            out[q] = scored[:k]
        return out

    def did_you_mean(
        self, query: str, spell_dir: str, max_edit: int = 2
    ) -> tuple[str, bool]:
        """Serving-side rewrite, mirror of query/suggest.did_you_mean:
        analyze with THIS index's analyzer (stemmed or plain), pass
        in-dictionary terms through (their distance-0 self-candidate
        ranks first), replace out-of-dictionary terms with their best
        candidate. Returns (corrected_query, changed)."""
        _aq, _tok, _sg = W._analyzers_for(self)
        qterms = _aq(query)
        if not qterms:
            return query, False
        best = {
            q: c[0][0]
            for q, c in self.correct_terms(
                qterms, spell_dir, max_edit, k=1
            ).items()
            if c
        }
        fixed = [best.get(t, t) for t in qterms]
        return " ".join(fixed), fixed != qterms

    # ---- full response rows (reference API row, Spark-free) --------------

    def attach_docs(
        self,
        docs_path: str,
        id_col: str = "docid",
        text_col: str = "text",
        doc_cache_entries: int = 4096,
    ) -> None:
        """Attach the forward text store (a docs parquet with
        (id_col, text_col)) — search_response fetches the k hit
        documents' text from it per query (query/respond.fetch_texts).
        The dataset handle is opened once here — per-query fetches skip
        the file-listing/metadata walk and go straight to the pushed
        id-filter read. `doc_cache_entries` bounds the hot-document text
        LRU (the standard serving document cache: Zipf queries hit the
        same head documents, so distinct queries still reuse fetches)."""
        import pyarrow.dataset as ds

        self._docs_path = docs_path
        self._docs_id_col = id_col
        self._docs_text_col = text_col
        self._docs_ds = ds.dataset(docs_path, format="parquet")
        self._doc_lru: OrderedDict[int, str | None] = OrderedDict()
        self._doc_cap = int(doc_cache_entries)

    def _fetch_texts(
        self, docids: list[int], found_only: bool = False
    ) -> dict[int, str]:
        """docid -> text through the document LRU; only cache misses hit
        the parquet store, in ONE pushed id-filter read. The LRU caches
        absence as None (negative lookups are as hot as hits under Zipf
        traffic); by default an absent id resolves to "" (the Spark
        path's left-join null→default), while `found_only=True` omits it
        — the distinction GenerationSet needs for newest-wins over
        per-generation stores where an EMPTY newest text must still win
        (r6 advice, low)."""
        from honeywell_search_engine_spark.query import respond

        out: dict[int, str] = {}
        missing = []
        _ABSENT = self._doc_lru  # unique sentinel, never a cached value
        for d in docids:
            t = self._doc_lru.get(d, _ABSENT)
            if t is _ABSENT:
                missing.append(d)
            else:
                self._doc_lru.move_to_end(d)
                if t is not None:
                    out[d] = t
                elif not found_only:
                    out[d] = ""
        if missing:
            fetched = respond.fetch_texts(
                self._docs_path, missing, self._docs_id_col,
                self._docs_text_col, dataset=self._docs_ds,
            )
            for d in missing:
                t = fetched.get(d)  # None ⇔ id absent from the store
                self._doc_lru[d] = t
                if t is not None:
                    out[d] = t
                elif not found_only:
                    out[d] = ""
            while len(self._doc_lru) > self._doc_cap:
                self._doc_lru.popitem(last=False)
        return out

    def search_response(
        self,
        query: str,
        k: int = 10,
        mode: str = "and",
        rerank_from: int | None = None,
    ) -> list[tuple]:
        """The reference's full search-response row, served Spark-free:
        [(rnk, docid, score_r, snippet, highlights, lex_score, has_oie,
        confidence)] — row-identical to the Spark path
        (operators/serving.search_response_indexed; parity pinned in
        tests/test_serving.py). BM25 top-k runs on the pruned posting
        lists as usual; the composition (query/respond.py mirrors of the
        snippet/highlight/triple operators) touches only the k hit
        documents, fetched from the attached docs store.

        `rerank_from=N` routes through the deterministic rerank stage
        (R7 analog): candidates = disjunctive top-N, feature-rescored
        (respond.rerank_hits_py ≡ operators/serving.rerank_topk), top-k
        of THAT order composed (rnk = rerank order, score_r = rerank
        score)."""
        from honeywell_search_engine_spark.query import respond

        if not hasattr(self, "_docs_path"):
            raise ValueError(
                "no text store attached — call attach_docs(docs_path) first"
            )
        _texts = self._fetch_texts
        if rerank_from is not None:
            cands = self.search(query, k=rerank_from, mode="or")
            texts = _texts([d for d, _ in cands])
            qterms = respond.analyze_query(query)
            ranked = respond.rerank_hits_py(cands, texts, qterms, k_out=k)
            hits = [(d, rr) for _rnk, d, rr, _sr in ranked]
            return respond.compose_response_rows(hits, texts, query)
        hits = self.search(query, k=k, mode=mode)
        return respond.compose_response_rows(
            hits, _texts([d for d, _ in hits]), query
        )


class ShardRouter:
    """Fan-out over shard-subset ServingIndex nodes — the 10^12-doc
    serving topology at sandbox scale: `n_shards` shards are dealt
    round-robin to `n_nodes` nodes, each node loads ONLY its shards'
    docmap and posting payloads (memory per node scales with owned
    shards, not corpus), and the router merges per-node top-k.

    The merge is exact: every node scores with GLOBAL df (ServingIndex
    shard-subset mode reads df from segment metadata across all shards),
    so scores are node-independent, and each node's (-score, docid)
    ordering is total, so the global top-k is contained in the union of
    per-node top-k lists. Results are bit-identical to a single
    full-index ServingIndex (tested)."""

    def __init__(
        self, path: str, n_nodes: int = 2, parallel: bool = True, **kw
    ):
        with open(f"{path}/stats.json") as f:
            n_shards = int(json.load(f)["n_shards"])
        self.nodes = [
            ServingIndex(path, shards=list(range(i, n_shards, n_nodes)), **kw)
            for i in range(min(n_nodes, n_shards))
        ]
        # in-process stand-in for the scatter-gather RPC: node queries run
        # on a thread pool (numpy/pyarrow release the GIL for the heavy
        # parts), so router latency tracks the slowest node, not the sum
        self._pool = None
        if parallel and len(self.nodes) > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=len(self.nodes))

    def _fanout(self, fn_name: str, k: int, *args, **kw):
        calls = [getattr(n, fn_name) for n in self.nodes]
        if self._pool is None:
            parts = [c(*args, k=k, **kw) for c in calls]
        else:
            parts = list(
                self._pool.map(lambda c: c(*args, k=k, **kw), calls)
            )
        out = [r for p in parts for r in p]
        out.sort(key=lambda r: (-r[1], r[0]))
        return out[:k]

    def search(self, query: str, k: int = 10, **kw) -> list[tuple[int, float]]:
        return self._fanout("search", k, query, **kw)

    def search_websearch(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        return self._fanout("search_websearch", k, query)

    def search_phrase(
        self, phrase: str, k: int = 10, slop: int = 0
    ) -> list[tuple[int, float]]:
        return self._fanout("search_phrase", k, phrase, slop=slop)

    def search_near_unordered(
        self, query: str, k: int = 10, dist: int = 3
    ) -> list[tuple[int, float]]:
        return self._fanout("search_near_unordered", k, query, dist=dist)

    # ---- dictionary surface ----------------------------------------------
    # suggest / spell read index-GLOBAL metadata (term_stats and the
    # SymSpell deletes table live at the shared lake path, identical from
    # every node — shard-subset mode restricts only docmap + posting
    # payloads), so any node answers exactly; no scatter-gather. The
    # router routes them to one node — this is the real topology too:
    # autocomplete boxes hit any serving node, not all of them.

    def reload(self) -> "ShardRouter":
        """Refresh every node from the on-disk index (see
        ServingIndex.reload) — fan out over the same thread pool so the
        router's refresh gap tracks the slowest node, not the sum."""
        if self._pool is None:
            for n in self.nodes:
                n.reload()
        else:
            list(self._pool.map(lambda n: n.reload(), self.nodes))
        return self

    def suggest(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        return self.nodes[0].suggest(prefix, k=k)

    def correct_terms(
        self, terms: list[str], spell_dir: str, max_edit: int = 2, k: int = 3
    ) -> dict[str, list[tuple[str, int, int]]]:
        return self.nodes[0].correct_terms(terms, spell_dir, max_edit, k)

    def did_you_mean(
        self, query: str, spell_dir: str, max_edit: int = 2
    ) -> tuple[str, bool]:
        return self.nodes[0].did_you_mean(query, spell_dir, max_edit)

    def attach_docs(
        self,
        docs_path: str,
        id_col: str = "docid",
        text_col: str = "text",
        doc_cache_entries: int = 4096,
    ) -> None:
        """Attach the forward text store to every node (the docs table is
        lake-global; each node could equally fetch only its own shards'
        docs — the router composes from the merged hit set, so it fetches
        via one node)."""
        for n in self.nodes:
            n.attach_docs(docs_path, id_col, text_col, doc_cache_entries)

    def search_response(
        self,
        query: str,
        k: int = 10,
        mode: str = "and",
        rerank_from: int | None = None,
    ) -> list[tuple]:
        """Full response rows over the fanned-out global top-k: the hit
        merge is the exact scatter-gather (see _fanout); the k-document
        composition (and the optional rerank stage over the merged
        disjunctive top-N) runs once at the router — identical to a full
        instance (tested)."""
        from honeywell_search_engine_spark.query import respond

        node = self.nodes[0]
        if not hasattr(node, "_docs_path"):
            raise ValueError(
                "no text store attached — call attach_docs(docs_path) first"
            )
        _texts = node._fetch_texts
        if rerank_from is not None:
            cands = self.search(query, k=rerank_from, mode="or")
            texts = _texts([d for d, _ in cands])
            qterms = respond.analyze_query(query)
            ranked = respond.rerank_hits_py(cands, texts, qterms, k_out=k)
            hits = [(d, rr) for _rnk, d, rr, _sr in ranked]
            return respond.compose_response_rows(hits, texts, query)
        hits = self.search(query, k=k, mode=mode)
        return respond.compose_response_rows(
            hits, _texts([d for d, _ in hits]), query
        )
