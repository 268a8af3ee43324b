"""BM25 top-k over encoded segments with block-max pruning.

Distributed plan:

    term_stats lookup (≤12 rows, partition-pruned)      [driver]
    segments scan: bucket-dir pruning + term pushdown    [executors]
    -> groupBy(shard).applyInPandas(shard kernel)        [executors,
       one tiny group per shard: ≤ n_terms encoded rows] parallel]
    -> global TakeOrderedAndProject(k, (-score, docid))  [k rows/shard]

Because ``shard = pmod(docid, n_shards)`` every document's postings live in
exactly one shard, so conjunctive evaluation is shard-local and the global
top-k is the k-merge of per-shard top-k's — exact, no recall loss (tested
rank-identical to both the naive Catalyst engine and the oracle).

Shard kernel (numpy, per shard):

- AND (default, reference F4 websearch_to_tsquery semantics): iterate
  terms by ascending df; decode the rarest list fully; every other list is
  decoded *selectively* — searchsorted over its block-max docids finds the
  only blocks that can contain surviving candidates, everything else is
  skipped (block-max docid skipping). Exact scores for survivors, float64,
  lexicographic term order (bit-identical to the oracle).
- Single term: blocks are visited in descending idf*bmax_u (block-max
  score order); once the k-th heap score exceeds the next block's upper
  bound the remaining blocks are provably irrelevant and never decoded —
  classic block-max top-k, exact.
- OR (disjunctive, reference F5 triple-match semantics): exact vectorized
  union scoring — see _shard_kernel_or for why the OR path trades pruning
  for guaranteed-exact returned scores.

Deleted documents (tombstones, index/maintenance.py) are filtered inside
the kernels from the broadcast tombstone set until compaction folds them
into the segments.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from honeywell_search_engine_spark.functions.analyzer import analyze_query
from honeywell_search_engine_spark.index import codec
from honeywell_search_engine_spark.index.segments import SegmentIndex

RESULT_SCHEMA = "docid long, score double"


def _analyzers_for(index):
    """Query analyzers matching how the index was built: a Porter-stemmed
    index (build_segments(stemmed=True), flag persisted in stats.json)
    stems queries too — like Postgres, where websearch_to_tsquery('english',
    ...) applies the same stemmer the tsvector build did. Returns
    (analyze_query_fn, tokenize_fn, groups_transform_fn)."""
    if getattr(index, "stemmed", False):
        from honeywell_search_engine_spark.functions.analyzer import (
            analyze_query_stemmed,
            stem_groups,
            tokenize_stemmed,
        )

        return analyze_query_stemmed, tokenize_stemmed, stem_groups
    from honeywell_search_engine_spark.functions.analyzer import tokenize

    return analyze_query, tokenize, (lambda g: g)

# a docid scope above this size never rides a driver collect/broadcast —
# it joins the docmap and cogroups with the segment rows instead
SCOPE_INLINE_MAX = 100_000


def _enc_from_row(row) -> codec.EncodedList:
    p_off = row["p_off"] if "p_off" in row else None
    return codec.EncodedList(
        n=int(row["n"]),
        bmax_docid=np.asarray(row["bmax_docid"], dtype=np.int64),
        bmax_u=np.asarray(row["bmax_u"], dtype=np.float64),
        d_off=np.asarray(row["d_off"], dtype=np.int64),
        t_off=np.asarray(row["t_off"], dtype=np.int64),
        l_off=np.asarray(row["l_off"], dtype=np.int64),
        deltas=bytes(row["deltas"]),
        tfs=bytes(row["tfs"]),
        doclens=bytes(row["doclens"]),
        positions=bytes(row["positions"]) if "positions" in row and row["positions"] is not None else b"",
        p_off=np.asarray(p_off, dtype=np.int64) if p_off is not None else None,
        # per-row stream codec (segment schema `fmt`); rows from indexes
        # built before the column existed decode as varbyte
        fmt=codec.FMT_FROM_TAG[int(row["fmt"])] if "fmt" in row and row["fmt"] is not None else codec.FMT_VB,
    )


def _u_exact(tfs: np.ndarray, doclens: np.ndarray, avgdl: float) -> np.ndarray:
    return codec.bm25_u(tfs, doclens, avgdl)


_NO_DEAD = np.zeros(0, dtype=np.int64)


def _select_topk_with_ties(lids: np.ndarray, scores: np.ndarray, k: int):
    """Top-k by score (tie: ascending lid) INCLUDING every row tied with
    the k-th score. Returning boundary ties makes the global merge exact
    under ANY lid assignment: final ordering tie-breaks on the rehydrated
    global docid, and nothing tied at the cut was dropped shard-side —
    required because merged-in documents get appended lids, which are not
    docid-ordered (index/docmap.py)."""
    if lids.size == 0:
        return []
    if lids.size > k:
        kth = np.partition(scores, lids.size - k)[lids.size - k]
        keep = scores >= kth
        lids, scores = lids[keep], scores[keep]
    idx = np.lexsort((lids, -scores))
    return list(zip(lids[idx], scores[idx]))


def _topk_single(enc: codec.EncodedList, idf: float, avgdl: float, k: int,
                 dead: np.ndarray = _NO_DEAD, scope: np.ndarray | None = None,
                 neg_rows: list = ()):
    """Exact single-term top-k with block-max score pruning. `dead` is a
    sorted int64 tombstoned-lid array for THIS shard (from a Spark
    broadcast — never a per-task Python set); `scope`, when given, is the
    sorted allowed-lid array (the reference's per-caller allowed_ids
    restriction, F2/F3); `neg_rows` are (term, EncodedList) exclusions
    (websearch '-term'), filtered per chunk BEFORE the top-k buffer so the
    pruning threshold never counts an excluded doc."""
    order = np.argsort(-enc.bmax_u, kind="stable")
    # Blocks are visited in descending-bound order in CHUNKS: the stop
    # test uses the first (= highest-bound) block of the next chunk, so
    # pruning stays exact — at worst chunk-1 extra blocks decode. The
    # chunk turns per-block Python/decode overhead into one batched
    # decode + one argpartition per chunk (a per-score Python heap and a
    # per-block loop both measured as the serving hot spot).
    chunk = 16
    topbuf = np.empty(0, dtype=np.float64)
    cand_d: list[np.ndarray] = []
    cand_s: list[np.ndarray] = []
    for i in range(0, order.size, chunk):
        batch = order[i : i + chunk]
        bound = idf * enc.bmax_u[batch[0]]  # max bound among all remaining
        if topbuf.size >= k and bound < topbuf.min():
            break  # every remaining block has a strictly smaller bound
        pl = codec.decode_blocks(enc, np.sort(batch))
        lids = pl.docids.astype(np.int64)
        scores = idf * _u_exact(pl.tfs, pl.doclens, avgdl)
        if dead.size:
            alive = ~np.isin(lids, dead)
            lids, scores = lids[alive], scores[alive]
        if scope is not None:
            m = np.isin(lids, scope)
            lids, scores = lids[m], scores[m]
        if neg_rows and lids.size:
            keep_n = ~_negated_mask(neg_rows, lids)
            lids, scores = lids[keep_n], scores[keep_n]
        cand_d.append(lids)
        cand_s.append(scores)
        if scores.size:
            merged = np.concatenate([topbuf, scores])
            if merged.size > k:
                merged = merged[np.argpartition(merged, merged.size - k)[merged.size - k:]]
            topbuf = merged
    if not cand_d:
        return []
    return _select_topk_with_ties(
        np.concatenate(cand_d), np.concatenate(cand_s), k
    )


def _candidate_blocks(enc: codec.EncodedList, cand: np.ndarray) -> np.ndarray:
    """Block index that could contain each candidate docid: first block
    whose bmax_docid >= cand (bmax_docid is ascending)."""
    return np.searchsorted(enc.bmax_docid, cand, side="left")


def _negated_mask(neg_rows: list, cand: np.ndarray) -> np.ndarray:
    """True where cand appears in ANY negated term's posting list —
    websearch '-term' exclusion. Candidate-selective decode: only the
    blocks that could contain a candidate are touched (same skip pattern
    as the AND intersect); a negated term's list is never fully decoded."""
    ci = cand.astype(np.int64)
    hit = np.zeros(ci.size, dtype=bool)
    for _t, enc in neg_rows:
        if ci.size == 0:
            break
        if isinstance(enc, codec.PostingList):  # decoded-LRU path
            hit |= _member_mask(enc.docids.astype(np.int64), ci)
            continue
        blocks = _candidate_blocks(enc, ci)
        valid = blocks < enc.bmax_docid.size
        if not valid.any():
            continue
        ublocks = np.unique(blocks[valid])
        pl = codec.decode_blocks(enc, ublocks)
        pd_ids = pl.docids.astype(np.int64)
        cand_v = ci[valid]
        pos = np.searchsorted(pd_ids, cand_v)
        ok = pos < pd_ids.size
        match = np.zeros(cand_v.size, dtype=bool)
        match[ok] = pd_ids[pos[ok]] == cand_v[ok]
        hit[np.flatnonzero(valid)[match]] = True
    return hit


def _shard_kernel_and(term_rows: list, idf: dict[str, float], avgdl: float,
                      k: int, dead: np.ndarray = _NO_DEAD, prune: bool = True,
                      scope: np.ndarray | None = None, neg_rows: list = ()):
    """Conjunctive evaluation of one shard. term_rows: (term, EncodedList),
    all query terms present (caller enforces).

    Rarest list drives; every other list is decoded selectively: only the
    blocks that can contain a surviving candidate (block-max docid skip).

    Score-bound pruning (`prune`, exact): with more candidates than k, each
    candidate's upper bound U = (driver's EXACT contribution) + sum over
    the other terms of idf * bmax_u of the block that would hold it —
    block METADATA only, nothing decoded. theta is derived ONLY from
    documents verified against the full conjunction: the top-k candidates
    by driver contribution are intersected first (≤k candidates — cheap),
    and if at least k of them survive, the k-th largest of their TRUE
    scores lower-bounds the shard's k-th true conjunctive score, so any
    candidate with U < theta can never reach the top-k (boundary ties
    included: a tie at the k-th score would need S = S_kth >= theta >
    U >= S, and every doc with S >= theta has U >= S >= theta so it
    survives). If fewer than k of the probed candidates complete the
    conjunction there is no sound theta and score pruning is skipped —
    only the always-valid "past the last block" drop applies. (An earlier
    version took theta from UNVERIFIED driver contributions, which
    over-prunes when high-driver-score docs fail the intersection.)"""
    term_rows = sorted(term_rows, key=lambda tr: tr[1].n)
    t0, e0 = term_rows[0]
    pl0 = codec.decode_postings(e0)
    cand = pl0.docids  # uint64 ascending
    tf_cols = {t0: (pl0.tfs, pl0.doclens)}
    if dead.size:
        alive = ~np.isin(cand.astype(np.int64), dead)
        cand = cand[alive]
        tf_cols[t0] = (pl0.tfs[alive], pl0.doclens[alive])
    if scope is not None:
        m = np.isin(cand.astype(np.int64), scope)
        tfs0, dls0 = tf_cols[t0]
        cand = cand[m]
        tf_cols[t0] = (tfs0[m], dls0[m])
    if neg_rows and cand.size:
        # websearch '-term' exclusion BEFORE pruning, so theta derives
        # only from docs that can actually be returned
        keep_n = ~_negated_mask(neg_rows, cand)
        if not keep_n.all():
            tfs0, dls0 = tf_cols[t0]
            cand = cand[keep_n]
            tf_cols[t0] = (tfs0[keep_n], dls0[keep_n])
    if prune and cand.size > k:
        tfs0, dls0 = tf_cols[t0]
        exact0 = idf[t0] * _u_exact(tfs0, dls0, avgdl)  # exact driver part
        ub = exact0.copy()
        keep_any = np.ones(cand.size, dtype=bool)
        ci = cand.astype(np.int64)
        for t, enc in term_rows[1:]:
            b = np.searchsorted(enc.bmax_docid, ci, side="left")
            valid = b < enc.bmax_docid.size
            keep_any &= valid  # beyond t's last block -> AND can never hold
            ub[valid] += idf[t] * enc.bmax_u[b[valid]]
        # probe: verify the k best-by-driver candidates against the full
        # conjunction (selective decode over ≤k docids — a handful of
        # blocks per list) and take theta from their TRUE scores
        probe_idx = np.sort(np.argpartition(exact0, exact0.size - k)[exact0.size - k:])
        v_cand, v_cols = _intersect_selective(
            term_rows[1:], cand[probe_idx],
            {t0: (tfs0[probe_idx], dls0[probe_idx])},
        )
        theta = None
        if v_cand.size >= k:
            v_score = np.zeros(v_cand.size, dtype=np.float64)
            for t in sorted(v_cols):
                tfs, dls = v_cols[t]
                v_score += idf[t] * _u_exact(tfs, dls, avgdl)
            theta = np.partition(v_score, v_score.size - k)[v_score.size - k]
        keep = keep_any if theta is None else keep_any & (ub >= theta)
        if not keep.all():
            cand = cand[keep]
            tf_cols[t0] = (tfs0[keep], dls0[keep])
    cand, tf_cols = _intersect_selective(term_rows[1:], cand, tf_cols)
    if cand.size == 0:
        return []
    # exact scores, lexicographic term order (oracle bit-parity)
    score = np.zeros(cand.size, dtype=np.float64)
    for t in sorted(tf_cols):
        tfs, dls = tf_cols[t]
        score += idf[t] * _u_exact(tfs, dls, avgdl)
    return _select_topk_with_ties(cand.astype(np.int64), score, k)


def _intersect_selective(rest_rows: list, cand: np.ndarray, tf_cols: dict):
    """Intersect `cand` (ascending docids, with driver tf columns already
    in tf_cols) against every (term, EncodedList) in rest_rows, decoding
    ONLY the blocks that can contain a surviving candidate. Returns the
    matched (cand, tf_cols) with one (tfs, doclens) column per term."""
    for t, enc in rest_rows:
        if cand.size == 0:
            return cand, tf_cols
        nblocks = enc.bmax_docid.size
        blocks = _candidate_blocks(enc, cand.astype(np.int64))
        valid = blocks < nblocks  # candidates beyond the last block can't match
        ublocks = np.unique(blocks[valid])
        pl = codec.decode_blocks(enc, ublocks)  # only candidate blocks decoded
        cand_v = cand[valid]
        pos = np.searchsorted(pl.docids, cand_v)
        ok = pos < pl.docids.size
        match = np.zeros(cand_v.size, dtype=bool)
        match[ok] = pl.docids[pos[ok]] == cand_v[ok]
        keep = np.zeros(cand.size, dtype=bool)
        keep[np.flatnonzero(valid)[match]] = True
        sel = pos[match]
        for tt in list(tf_cols):
            tf_cols[tt] = (tf_cols[tt][0][keep], tf_cols[tt][1][keep])
        tf_cols[t] = (pl.tfs[sel], pl.doclens[sel])
        cand = cand[keep]
    return cand, tf_cols


def _or_block_prune(term_rows: list, idf: dict[str, float], avgdl: float,
                    k: int, dead: np.ndarray, scope: np.ndarray | None = None):
    """Exact block-max pruning for OR mode. Returns, per term, the block
    indices that can still contain a top-k doc (or None to decode fully).

    theta: the k-th best EXACT single-term score of the strongest lists is
    a lower bound of the k-th best OR score (OR score >= any single-term
    contribution). Interval sweep: elementary docid intervals are delimited
    by the union of every term's block-end docids, so within one interval
    each term's covering block — and therefore the summed upper bound
    sum_t idf_t * bmax_u_t — is constant. Intervals with bound < theta
    (strict) hold only docs strictly below the k-th true score (ties at the
    k-th are kept: a tie would need S = S_kth >= theta > bound >= S).
    Only blocks intersecting surviving intervals are decoded."""
    # theta from the exact top-k of the single strongest list (highest
    # idf * max block bound) — cheap: block-max pruned single-term pass
    best_t = max(
        range(len(term_rows)),
        key=lambda i: idf[term_rows[i][0]] * float(term_rows[i][1].bmax_u.max()),
    )
    t0, e0 = term_rows[best_t]
    seed = _topk_single(e0, idf[t0], avgdl, k, dead, scope)
    if len(seed) < k:
        return None, None  # not enough evidence to prune safely
    theta = min(s for _, s in seed)

    edges = np.unique(
        np.concatenate([enc.bmax_docid for _, enc in term_rows])
    )  # interval i = (edges[i-1], edges[i]]
    tot = np.zeros(edges.size, dtype=np.float64)
    covering = []
    for t, enc in term_rows:
        b = np.searchsorted(enc.bmax_docid, edges, side="left")
        valid = b < enc.bmax_docid.size
        tot[valid] += idf[t] * enc.bmax_u[b[valid]]
        covering.append((b, valid))
    keep = tot >= theta
    if keep.all():
        return None, None  # nothing prunable
    blocks_per_term = []
    for (b, valid), (t, enc) in zip(covering, term_rows):
        sel = np.unique(b[keep & valid])
        blocks_per_term.append(sel)
    return blocks_per_term, (edges, keep)


def _shard_kernel_or(term_rows: list, idf: dict[str, float], avgdl: float,
                     k: int, dead: np.ndarray = _NO_DEAD, prune: bool = True,
                     scope: np.ndarray | None = None):
    """Disjunctive (OR) union scoring of one shard — exact, vectorized.

    Scores every doc that contains ANY query term: union of docids via
    np.unique, per-term contributions added in lexicographic term order
    (float64 determinism). Used for the reference's triple-match OR
    semantics (F5, fusion.py:73-88). With `prune`, an interval-sweep
    block-max pass (_or_block_prune) drops whole docid regions whose
    summed upper bound cannot reach the k-th best single-term score —
    exact (returned scores unchanged, boundary ties kept), and the skipped
    blocks are never decoded."""
    term_rows = sorted(term_rows, key=lambda tr: tr[0])
    blocks_per_term = region = None
    if prune and len(term_rows) > 1:
        blocks_per_term, region = _or_block_prune(
            term_rows, idf, avgdl, k, dead, scope
        )
    if blocks_per_term is None:
        decoded = [(t, codec.decode_postings(enc)) for t, enc in term_rows]
    else:
        decoded = [
            (t, codec.decode_blocks(enc, blocks))
            for (t, enc), blocks in zip(term_rows, blocks_per_term)
        ]
    union = np.unique(np.concatenate([pl.docids for _, pl in decoded]))
    if region is not None:
        # decoded blocks overhang pruned intervals: drop docs whose
        # elementary interval was eliminated (their true score < theta)
        edges, keep = region
        iv = np.searchsorted(edges, union.astype(np.int64), side="left")
        inb = iv < edges.size
        mask = np.zeros(union.size, dtype=bool)
        mask[inb] = keep[iv[inb]]
        union = union[mask]
    if dead.size:
        union = union[~np.isin(union.astype(np.int64), dead)]
    if scope is not None:
        union = union[np.isin(union.astype(np.int64), scope)]
    score = np.zeros(union.size, dtype=np.float64)
    for t, pl in decoded:  # lexicographic order
        pos = np.searchsorted(union, pl.docids)
        ok = pos < union.size
        ok[ok] = union[pos[ok]] == pl.docids[ok]  # pruned/tombstoned ids don't match
        contrib = idf[t] * _u_exact(pl.tfs, pl.doclens, avgdl)
        score[pos[ok]] += contrib[ok]
    return _select_topk_with_ties(union.astype(np.int64), score, k)


def _member_mask(sorted_ids: np.ndarray, cand: np.ndarray) -> np.ndarray:
    """True where cand[i] appears in sorted_ids (both int64-comparable,
    sorted_ids ascending) — one searchsorted, no decode, no Python set."""
    if cand.size == 0 or sorted_ids.size == 0:
        return np.zeros(cand.size, dtype=bool)
    pos = np.searchsorted(sorted_ids, cand)
    ok = pos < sorted_ids.size
    out = np.zeros(cand.size, dtype=bool)
    out[ok] = sorted_ids[pos[ok]] == cand[ok]
    return out


def _topk_single_decoded(pl, idf: float, avgdl: float, k: int,
                         dead: np.ndarray = _NO_DEAD,
                         scope: np.ndarray | None = None, neg_pls: list = ()):
    """Single-term top-k over a PRE-DECODED posting list — the serving
    decoded-LRU hot path. No block pruning (there is nothing left to
    skip once the list is in memory as arrays); scores are the same
    idf * _u_exact as _topk_single, so rank/score are bit-identical
    (elementwise scoring commutes with filtering; pinned by
    tests/test_local_serving.py)."""
    lids = pl.docids.astype(np.int64)
    scores = idf * _u_exact(pl.tfs, pl.doclens, avgdl)
    if dead.size:
        alive = ~np.isin(lids, dead)
        lids, scores = lids[alive], scores[alive]
    if scope is not None:
        m = np.isin(lids, scope)
        lids, scores = lids[m], scores[m]
    for _t, npl in neg_pls:
        if lids.size == 0:
            break
        keep = ~_member_mask(npl.docids.astype(np.int64), lids)
        lids, scores = lids[keep], scores[keep]
    return _select_topk_with_ties(lids, scores, k)


def _shard_kernel_and_decoded(term_pls: list, idf: dict[str, float],
                              avgdl: float, k: int,
                              dead: np.ndarray = _NO_DEAD,
                              scope: np.ndarray | None = None,
                              neg_pls: list = ()):
    """Conjunctive kernel over PRE-DECODED posting lists: term_pls =
    [(term, PostingList)], all query terms present (caller enforces).
    Same evaluation order as _shard_kernel_and — rarest list drives,
    dead/scope/negation applied to the driver before intersection, exact
    scores summed in lexicographic term order — so rank/score are
    bit-identical to the encoded kernel (same float ops on the same
    values; the encoded kernel's pruning is exact, so skipping it cannot
    change results)."""
    term_pls = sorted(term_pls, key=lambda tp: tp[1].docids.size)
    t0, pl0 = term_pls[0]
    cand = pl0.docids  # uint64 ascending
    cols = {t0: (pl0.tfs, pl0.doclens)}
    if dead.size:
        alive = ~np.isin(cand.astype(np.int64), dead)
        cand = cand[alive]
        cols[t0] = (pl0.tfs[alive], pl0.doclens[alive])
    if scope is not None:
        m = np.isin(cand.astype(np.int64), scope)
        tfs0, dls0 = cols[t0]
        cand, cols[t0] = cand[m], (tfs0[m], dls0[m])
    for _t, npl in neg_pls:
        if cand.size == 0:
            break
        keep = ~_member_mask(npl.docids, cand)
        if not keep.all():
            tfs0, dls0 = cols[t0]
            cand, cols[t0] = cand[keep], (tfs0[keep], dls0[keep])
    for t, pl in term_pls[1:]:
        if cand.size == 0:
            return []
        pos = np.searchsorted(pl.docids, cand)
        ok = pos < pl.docids.size
        keep = np.zeros(cand.size, dtype=bool)
        keep[ok] = pl.docids[pos[ok]] == cand[ok]
        sel = pos[keep]
        for tt in list(cols):
            cols[tt] = (cols[tt][0][keep], cols[tt][1][keep])
        cols[t] = (pl.tfs[sel], pl.doclens[sel])
        cand = cand[keep]
    if cand.size == 0:
        return []
    score = np.zeros(cand.size, dtype=np.float64)
    for t in sorted(cols):
        tfs, dls = cols[t]
        score += idf[t] * _u_exact(tfs, dls, avgdl)
    return _select_topk_with_ties(cand.astype(np.int64), score, k)


def _shard_kernel_or_decoded(term_pls: list, idf: dict[str, float],
                             avgdl: float, k: int,
                             dead: np.ndarray = _NO_DEAD,
                             scope: np.ndarray | None = None):
    """Disjunctive kernel over PRE-DECODED posting lists — union via
    np.unique, contributions scatter-added in lexicographic term order,
    exactly like _shard_kernel_or's unpruned path (whose pruned path is
    exact too), so rank/score are bit-identical."""
    term_pls = sorted(term_pls, key=lambda tp: tp[0])
    union = np.unique(np.concatenate([pl.docids for _, pl in term_pls]))
    if dead.size:
        union = union[~np.isin(union.astype(np.int64), dead)]
    if scope is not None:
        union = union[np.isin(union.astype(np.int64), scope)]
    score = np.zeros(union.size, dtype=np.float64)
    for t, pl in term_pls:  # lexicographic order
        pos = np.searchsorted(union, pl.docids)
        ok = pos < union.size
        ok[ok] = union[pos[ok]] == pl.docids[ok]
        contrib = idf[t] * _u_exact(pl.tfs, pl.doclens, avgdl)
        score[pos[ok]] += contrib[ok]
    return _select_topk_with_ties(union.astype(np.int64), score, k)


def _shard_kernel_phrase(term_rows: list, idf: dict[str, float], avgdl: float,
                         k: int, dead: np.ndarray = _NO_DEAD, slop: int = 0,
                         unordered: bool = False):
    """Exact phrase evaluation of one shard. term_rows: [(term,
    EncodedList)] in PHRASE order (repeats allowed). Docid intersection
    drives block-selective decode exactly like the AND kernel; positions
    are decoded ONLY for candidate blocks and adjacency is verified by
    chained intersection of per-term positions shifted by their phrase
    offset. Matching docs score standard BM25 over the phrase's distinct
    terms (lexicographic sum order — oracle bit-parity)."""
    m = len(term_rows)
    drive = min(range(m), key=lambda i: term_rows[i][1].n)
    pl0 = codec.decode_postings(
        term_rows[drive][1], with_positions=True, flat_positions=True
    )
    cand = pl0.docids
    # per_term[i] = (tfs, doclens, flat absolute positions) — positions
    # stay ONE flat array per term (per-posting boundaries are the tfs);
    # filtering/gathering is vectorized, never a per-doc list walk
    per_term: dict[int, tuple] = {drive: (pl0.tfs, pl0.doclens, pl0.positions)}

    def _filter_cols(tfs, dls, flat, keep):
        return tfs[keep], dls[keep], flat[np.repeat(keep, tfs.astype(np.int64))]

    if dead.size:
        alive = ~np.isin(cand.astype(np.int64), dead)
        per_term[drive] = _filter_cols(*per_term[drive], alive)
        cand = cand[alive]
    for i in sorted(range(m), key=lambda i: term_rows[i][1].n):
        if i == drive:
            continue
        if cand.size == 0:
            return []
        enc = term_rows[i][1]
        nblocks = enc.bmax_docid.size
        blocks = _candidate_blocks(enc, cand.astype(np.int64))
        valid = blocks < nblocks
        ublocks = np.unique(blocks[valid])
        pl = codec.decode_blocks(enc, ublocks, with_positions=True, flat_positions=True)
        cand_v = cand[valid]
        pos = np.searchsorted(pl.docids, cand_v)
        ok = pos < pl.docids.size
        match = np.zeros(cand_v.size, dtype=bool)
        match[ok] = pl.docids[pos[ok]] == cand_v[ok]
        keep = np.zeros(cand.size, dtype=bool)
        keep[np.flatnonzero(valid)[match]] = True
        sel = pos[match]
        for tt in list(per_term):
            per_term[tt] = _filter_cols(*per_term[tt], keep)
        # vectorized segment gather of pl's flat positions at postings `sel`
        cnt = pl.tfs.astype(np.int64)
        starts = np.zeros(cnt.size + 1, dtype=np.int64)
        np.cumsum(cnt, out=starts[1:])
        seg_s, seg_l = starts[sel], cnt[sel]
        out_starts = np.zeros(sel.size, dtype=np.int64)
        if sel.size > 1:
            np.cumsum(seg_l[:-1], out=out_starts[1:])
        gidx = (
            np.arange(int(seg_l.sum()), dtype=np.int64)
            - np.repeat(out_starts, seg_l)
            + np.repeat(seg_s, seg_l)
        )
        per_term[i] = (pl.tfs[sel], pl.doclens[sel], pl.positions[gidx])
        cand = cand[keep]
    if cand.size == 0:
        return []
    return _phrase_verify_score(
        [t for t, _ in term_rows], per_term, cand, idf, avgdl, k, slop,
        unordered=unordered,
    )


def _shard_kernel_phrase_decoded(
    term_pls: list, idf: dict[str, float], avgdl: float,
    k: int, dead: np.ndarray = _NO_DEAD, slop: int = 0,
    unordered: bool = False,
):
    """Phrase kernel over PRE-DECODED posting lists: term_pls = [(term,
    PostingList with flat absolute positions)] in phrase order. The
    serving-node hot path — ServingIndex keeps a decoded-postings LRU so
    repeated phrase/NEAR queries skip varbyte decode entirely.
    Rank/score-identical to _shard_kernel_phrase by construction: same
    intersection math on the same arrays, shared _phrase_verify_score
    (pinned by tests/test_local_serving.py)."""
    m = len(term_pls)
    drive = min(range(m), key=lambda i: term_pls[i][1].docids.size)
    pl0 = term_pls[drive][1]
    cand = pl0.docids
    per_term: dict[int, tuple] = {drive: (pl0.tfs, pl0.doclens, pl0.positions)}

    def _filter_cols(tfs, dls, flat, keep):
        return tfs[keep], dls[keep], flat[np.repeat(keep, tfs.astype(np.int64))]

    if dead.size:
        alive = ~np.isin(cand.astype(np.int64), dead)
        per_term[drive] = _filter_cols(*per_term[drive], alive)
        cand = cand[alive]
    for i in sorted(range(m), key=lambda i: term_pls[i][1].docids.size):
        if i == drive:
            continue
        if cand.size == 0:
            return []
        pl = term_pls[i][1]
        pos = np.searchsorted(pl.docids, cand)
        ok = pos < pl.docids.size
        keep = np.zeros(cand.size, dtype=bool)
        keep[ok] = pl.docids[pos[ok]] == cand[ok]
        sel = pos[keep]
        for tt in list(per_term):
            per_term[tt] = _filter_cols(*per_term[tt], keep)
        per_term[i] = (pl.tfs[sel], pl.doclens[sel], _gather_flat(pl, sel))
        cand = cand[keep]
    if cand.size == 0:
        return []
    return _phrase_verify_score(
        [t for t, _ in term_pls], per_term, cand, idf, avgdl, k, slop,
        unordered=unordered,
    )


def _phrase_verify_score(
    terms: list[str], per_term: dict[int, tuple], cand: np.ndarray,
    idf: dict[str, float], avgdl: float, k: int, slop: int,
    unordered: bool = False,
):
    # `unordered` (exactly two distinct terms): classic A NEAR/k B — a
    # candidate survives iff min |pos_A - pos_B| <= slop in EITHER order;
    # verified with the same composite (cand<<32)|pos keys: one
    # searchsorted of term A's keys into term B's gives each A-occurrence
    # its successor AND predecessor B-position within the same candidate.
    # positional verify, vectorized ACROSS candidates (no per-doc Python
    # loop — round-2 verdict item 6): every (candidate, position) pair is
    # one composite key (c << 32) | pos, ascending by construction, so one
    # searchsorted per phrase term verifies every candidate at once.
    # slop=0: a start survives term j iff key+j exists in term j's keys
    # (exact adjacency). slop>0: ordered-NEAR — greedy next-position
    # chaining (side='right' gives the smallest position > current WITHIN
    # the same candidate, checked via the key's candidate bits), so
    # `min span <= (m-1)+slop` stays an exact test.
    m = len(terms)
    n_cand = cand.size
    span_max = (m - 1) + slop

    def _keys(j: int) -> np.ndarray:
        tfs_j, _dls_j, flat_j = per_term[j]
        c = np.repeat(np.arange(n_cand, dtype=np.int64), tfs_j.astype(np.int64))
        return (c << 32) | flat_j.astype(np.int64)  # ascending by construction

    if unordered:
        if m != 2:
            raise ValueError("unordered NEAR is the two-term operator")
        k0, k1 = _keys(0), _keys(1)
        c0 = k0 >> 32
        p0 = k0 & 0xFFFFFFFF
        idx = np.searchsorted(k1, k0)
        hit = np.zeros(k0.size, dtype=bool)
        oks = idx < k1.size
        succ = np.zeros_like(k0)
        succ[oks] = k1[idx[oks]]
        same_s = oks & ((succ >> 32) == c0)
        hit |= same_s & (((succ & 0xFFFFFFFF) - p0) <= slop)
        okp = idx > 0
        pred = np.zeros_like(k0)
        pred[okp] = k1[idx[okp] - 1]
        same_p = okp & ((pred >> 32) == c0)
        hit |= same_p & ((p0 - (pred & 0xFFFFFFFF)) <= slop)
        hit_c = np.unique(c0[hit])
    elif slop == 0:
        cur = _keys(0)
        for j in range(1, m):
            if cur.size == 0:
                break
            kj = _keys(j)
            tgt = cur + j  # pos+j can't overflow into the candidate bits
            idx = np.searchsorted(kj, tgt)
            ok = idx < kj.size
            ok[ok] = kj[idx[ok]] == tgt[ok]
            cur = cur[ok]
        hit_c = np.unique(cur >> 32)
    else:
        cur = _keys(0)
        c0 = cur >> 32
        p0 = cur & 0xFFFFFFFF
        q = cur.copy()
        live = np.ones(cur.size, dtype=bool)
        for j in range(1, m):
            kj = _keys(j)
            idx = np.searchsorted(kj, q, side="right")
            in_rng = live & (idx < kj.size)
            nxt = np.zeros_like(q)
            nxt[in_rng] = kj[idx[in_rng]]
            live = in_rng & ((nxt >> 32) == c0)
            q = np.where(live, nxt, q)
        live &= ((q & 0xFFFFFFFF) - p0) <= span_max
        hit_c = np.unique(c0[live])
    phrase_ok = np.zeros(n_cand, dtype=bool)
    phrase_ok[hit_c] = True
    if not phrase_ok.any():
        return []
    cand = cand[phrase_ok]
    # distinct-term BM25 in lexicographic order (repeated phrase terms
    # contribute once, like the oracle)
    by_term: dict[str, tuple] = {}
    for i, t in enumerate(terms):
        tfs, dls, _ps = per_term[i]
        by_term.setdefault(t, (tfs[phrase_ok], dls[phrase_ok]))
    score = np.zeros(cand.size, dtype=np.float64)
    for t in sorted(by_term):
        tfs, dls = by_term[t]
        score += idf[t] * _u_exact(tfs, dls, avgdl)
    return _select_topk_with_ties(cand.astype(np.int64), score, k)


def _gather_flat(pl, sel: np.ndarray) -> np.ndarray:
    """Vectorized segment-gather of pl's flat position array at posting
    indices `sel` (per-posting segment lengths are the tfs)."""
    cnt = pl.tfs.astype(np.int64)
    starts = np.zeros(cnt.size + 1, dtype=np.int64)
    np.cumsum(cnt, out=starts[1:])
    seg_s, seg_l = starts[sel], cnt[sel]
    out_starts = np.zeros(sel.size, dtype=np.int64)
    if sel.size > 1:
        np.cumsum(seg_l[:-1], out=out_starts[1:])
    gidx = (
        np.arange(int(seg_l.sum()), dtype=np.int64)
        - np.repeat(out_starts, seg_l)
        + np.repeat(seg_s, seg_l)
    )
    return pl.positions[gidx]


def _probe_pl(pl, cand: np.ndarray, with_positions: bool = False):
    """Decoded-list analog of _probe_at: membership of sorted `cand` in a
    PostingList plus aligned value columns — one searchsorted, no codec
    work. Returns the same (keep, tfs, doclens, flat|None) contract."""
    empty = np.zeros(0, dtype=np.int64)
    if cand.size == 0:
        return np.zeros(0, dtype=bool), empty, empty, (empty if with_positions else None)
    pos = np.searchsorted(pl.docids, cand)
    ok = pos < pl.docids.size
    keep = np.zeros(cand.size, dtype=bool)
    keep[ok] = pl.docids[pos[ok]] == cand[ok]
    sel = pos[keep]
    flat = _gather_flat(pl, sel) if with_positions else None
    return keep, pl.tfs[sel], pl.doclens[sel], flat


def _probe_any(x, cand: np.ndarray, with_positions: bool = False):
    """Probe an EncodedList (block-selective decode) or an already-decoded
    PostingList (direct searchsorted) with one calling convention — lets
    the websearch kernels run unchanged over either representation (the
    serving decoded-LRU path passes PostingLists)."""
    if isinstance(x, codec.PostingList):
        return _probe_pl(x, cand, with_positions)
    return _probe_at(x, cand, with_positions)


def _probe_at(enc: codec.EncodedList, cand: np.ndarray, with_positions: bool = False):
    """Selectively decode `enc` at the sorted candidate docids `cand`:
    only blocks that could contain a candidate are touched (block-max
    docid skip). Returns (keep mask over cand, tfs, doclens,
    flat_positions|None) — the value arrays aligned with cand[keep]."""
    empty = np.zeros(0, dtype=np.int64)
    if cand.size == 0:
        return np.zeros(0, dtype=bool), empty, empty, (empty if with_positions else None)
    blocks = _candidate_blocks(enc, cand.astype(np.int64))
    valid = blocks < enc.bmax_docid.size
    if not valid.any():
        return (
            np.zeros(cand.size, dtype=bool), empty, empty,
            (empty if with_positions else None),
        )
    ublocks = np.unique(blocks[valid])
    pl = codec.decode_blocks(
        enc, ublocks, with_positions=with_positions, flat_positions=True
    )
    cand_v = cand[valid]
    pos = np.searchsorted(pl.docids, cand_v)
    ok = pos < pl.docids.size
    match = np.zeros(cand_v.size, dtype=bool)
    match[ok] = pl.docids[pos[ok]] == cand_v[ok]
    keep = np.zeros(cand.size, dtype=bool)
    keep[np.flatnonzero(valid)[match]] = True
    sel = pos[match]
    flat = _gather_flat(pl, sel) if with_positions else None
    return keep, pl.tfs[sel], pl.doclens[sel], flat


def _phrase_mask(ph_rows: list, cand: np.ndarray) -> np.ndarray:
    """Boolean mask over `cand` (sorted docids): True where the phrase —
    ph_rows as (term, EncodedList) in PHRASE order, repeats allowed —
    occurs at consecutive filtered-stream positions. Used for negated
    quoted phrases ('-"a b"', Postgres !(a <-> b)), where the phrase's
    terms are NOT required of the candidates, so presence and adjacency
    are both probed selectively (candidate blocks only)."""
    n = cand.size
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    alive = np.arange(n, dtype=np.int64)
    sub = cand
    flats: dict[str, tuple] = {}  # distinct term -> (tfs, flat) aligned with sub
    for t in dict.fromkeys(t for t, _ in ph_rows):
        enc = next(e for tt, e in ph_rows if tt == t)
        keep, tfs, _dls, flat = _probe_any(enc, sub, with_positions=True)
        if not keep.any():
            return out  # some phrase term absent from every candidate
        for tt in flats:
            ptfs, pflat = flats[tt]
            flats[tt] = (
                ptfs[keep], pflat[np.repeat(keep, ptfs.astype(np.int64))]
            )
        alive, sub = alive[keep], sub[keep]
        flats[t] = (tfs, flat)
    nsub = sub.size
    m = len(ph_rows)

    def _keys(j: int) -> np.ndarray:
        tfs_j, flat_j = flats[ph_rows[j][0]]
        c = np.repeat(np.arange(nsub, dtype=np.int64), tfs_j.astype(np.int64))
        return (c << 32) | flat_j.astype(np.int64)

    cur = _keys(0)
    for j in range(1, m):
        if cur.size == 0:
            break
        kj = _keys(j)
        tgt = cur + j
        idx = np.searchsorted(kj, tgt)
        ok = idx < kj.size
        ok[ok] = kj[idx[ok]] == tgt[ok]
        cur = cur[ok]
    if cur.size:
        out[alive[np.unique(cur >> 32)]] = True
    return out


def _websearch_match(
    pos_rows: list,
    phrase_groups: list,
    neg_rows: list,
    dead: np.ndarray = _NO_DEAD,
    neg_phrase_rows: list = (),
):
    """Match portion of one conjunctive websearch group on one shard:
    pos_rows are the DISTINCT required (term, EncodedList) pairs (loose
    terms + every quoted-phrase member), phrase_groups are token-lists
    that must each occur adjacently, neg_rows exclude docs containing the
    term, neg_phrase_rows exclude docs where that phrase occurs adjacently
    ('-"a b"'). Returns (cand, cols) — surviving lids plus per-required-
    term (tfs, doclens, flat_positions|None) columns for scoring. Exact;
    positions decode only for phrase members and only in candidate
    blocks."""
    need_pos = {t for ph in phrase_groups for t in ph}
    rows = sorted(pos_rows, key=lambda tr: tr[1].n)
    t0, e0 = rows[0]
    if isinstance(e0, codec.PostingList):  # decoded-LRU path: caller
        pl0 = e0  # guarantees positions are present for need_pos terms
    else:
        pl0 = codec.decode_postings(
            e0, with_positions=t0 in need_pos, flat_positions=True
        )
    cand = pl0.docids
    cols: dict[str, tuple] = {
        t0: (pl0.tfs, pl0.doclens, pl0.positions if t0 in need_pos else None)
    }

    def _filter(keep: np.ndarray) -> None:
        nonlocal cand
        for tt in list(cols):
            tfs, dls, flat = cols[tt]
            nf = (
                flat[np.repeat(keep, tfs.astype(np.int64))]
                if flat is not None
                else None
            )
            cols[tt] = (tfs[keep], dls[keep], nf)
        cand = cand[keep]

    if dead.size:
        _filter(~np.isin(cand.astype(np.int64), dead))
    for t, enc in rows[1:]:
        if cand.size == 0:
            return cand, cols
        wp = t in need_pos
        # _probe_any = the block-selective decode + membership + segment
        # gather this loop used to inline (same ops, shared with the
        # phrase-mask path), or a direct searchsorted when the caller
        # passes pre-decoded PostingLists (serving decoded-LRU path)
        keep, tfs, dls, flat = _probe_any(enc, cand, with_positions=wp)
        _filter(keep)
        cols[t] = (tfs, dls, flat if wp else None)
    if cand.size == 0:
        return cand, cols
    if neg_rows:
        hit = _negated_mask(neg_rows, cand)
        if hit.any():
            _filter(~hit)
    if cand.size == 0:
        return cand, cols
    # adjacency verification per quoted group — same composite-key sweep
    # as the phrase kernel, all groups must hold
    ok_all = np.ones(cand.size, dtype=bool)
    n_cand = cand.size
    for ph in phrase_groups:
        def _keys_of(t: str) -> np.ndarray:
            tfs, _dls, flat = cols[t]
            c = np.repeat(np.arange(n_cand, dtype=np.int64), tfs.astype(np.int64))
            return (c << 32) | flat.astype(np.int64)

        cur = _keys_of(ph[0])
        for j in range(1, len(ph)):
            if cur.size == 0:
                break
            kj = _keys_of(ph[j])
            tgt = cur + j
            idx = np.searchsorted(kj, tgt)
            okk = idx < kj.size
            okk[okk] = kj[idx[okk]] == tgt[okk]
            cur = cur[okk]
        g = np.zeros(n_cand, dtype=bool)
        g[np.unique(cur >> 32)] = True
        ok_all &= g
    if not ok_all.all():
        _filter(ok_all)
    # negated quoted phrases: exclude candidates where the phrase occurs
    # adjacently — probed selectively, the phrase terms are NOT required
    for ph_rows in neg_phrase_rows:
        if cand.size == 0:
            break
        hits = _phrase_mask(ph_rows, cand)
        if hits.any():
            _filter(~hits)
    return cand, cols


def _shard_kernel_websearch(
    pos_rows: list,
    phrase_groups: list,
    neg_rows: list,
    idf: dict[str, float],
    avgdl: float,
    k: int,
    dead: np.ndarray = _NO_DEAD,
    neg_phrase_rows: list = (),
):
    """One conjunctive websearch group on one shard, scored: match via
    _websearch_match, then BM25 over the group's required terms
    (lexicographic sum order — oracle bit-parity). No score-bound
    pruning: with unverified phrase groups pending there is no sound
    theta (same reasoning as the AND-prune fix)."""
    cand, cols = _websearch_match(
        pos_rows, phrase_groups, neg_rows, dead, neg_phrase_rows
    )
    if cand.size == 0:
        return []
    score = np.zeros(cand.size, dtype=np.float64)
    for t in sorted(cols):
        tfs, dls, _flat = cols[t]
        score += idf[t] * _u_exact(tfs, dls, avgdl)
    return _select_topk_with_ties(cand.astype(np.int64), score, k)


def _shard_kernel_websearch_or(
    groups: list,
    by_term: dict,
    idf: dict[str, float],
    avgdl: float,
    k: int,
    dead: np.ndarray = _NO_DEAD,
):
    """Disjunction of conjunctive websearch groups on one shard (the
    Postgres websearch 'or' keyword — AND binds tighter, so the query is
    an OR of groups). `groups` are (all_pos, neg, phrases, neg_phrases)
    from analyzer.parse_websearch_query; `by_term` maps this shard's terms
    to EncodedLists. A doc matches iff ANY group holds; its score sums
    BM25 over ALL distinct positive terms of the whole query present in
    the doc (union-presence scoring, lexicographic order — the
    `search_or` convention; oracle bit-parity). Group matching reuses
    _websearch_match; the scoring pass probes each positive term
    selectively at the matched union (candidate blocks only)."""
    union: np.ndarray | None = None
    for all_pos, neg, phrases, neg_phrases in groups:
        if any(t not in by_term for t in all_pos):
            continue  # a required term absent in this shard: group empty here
        pos_rows = [(t, by_term[t]) for t in all_pos]
        neg_rows = [(t, by_term[t]) for t in neg if t in by_term]
        npr = [
            [(t, by_term[t]) for t in ph]
            for ph in neg_phrases
            if all(t in by_term for t in ph)
            # a negated phrase with a term absent from this shard can
            # never occur adjacently -> excludes nothing
        ]
        cand, _cols = _websearch_match(pos_rows, phrases, neg_rows, dead, npr)
        if cand.size:
            union = cand if union is None else np.union1d(union, cand)
    if union is None or union.size == 0:
        return []
    score = np.zeros(union.size, dtype=np.float64)
    for t in sorted({t for g in groups for t in g[0]}):
        enc = by_term.get(t)
        if enc is None:
            continue
        keep, tfs, dls, _ = _probe_any(enc, union)
        if keep.any():
            score[keep] += idf[t] * _u_exact(tfs, dls, avgdl)
    return _select_topk_with_ties(union.astype(np.int64), score, k)


def bm25_topk_phrase(
    index: SegmentIndex, phrase: str, k: int = 10, slop: int = 0
) -> DataFrame:
    """Exact phrase (slop=0) / ordered-NEAR (slop>0) top-k over the
    positional segment index (reference tsvector positions,
    backend/migrations/003:32). Returns DataFrame(docid, score) by
    (-score, docid) — rank/score-identical to OracleIndex.search_phrase
    (tested)."""
    spark = index.spark
    _aq, _tok, _sg = _analyzers_for(index)
    terms = _tok(phrase)
    if not terms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    distinct = sorted(set(terms))
    avgdl = index.stats.avgdl
    dead_bc = index.dead_broadcast()
    phrase_terms = list(terms)  # phrase order, repeats preserved

    def run_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        dead = dead_bc.value.get(shard, _NO_DEAD) if dead_bc is not None else _NO_DEAD
        by_term = {r["term"]: _enc_from_row(r) for _, r in pdf.iterrows()}
        idf_b = {r["term"]: float(r["idf"]) for _, r in pdf.iterrows()}
        if any(t not in by_term for t in phrase_terms):
            return pd.DataFrame({"shard": [], "lid": [], "score": []})
        rows = [(t, by_term[t]) for t in phrase_terms]
        res = _shard_kernel_phrase(rows, idf_b, avgdl, k, dead, slop)
        return pd.DataFrame(
            {
                "shard": [shard] * len(res),
                "lid": [int(d) for d, _ in res],
                "score": [float(s) for _, s in res],
            }
        )

    segs = index.segments_with_idf(distinct)
    per_shard = segs.groupBy("shard").applyInPandas(
        run_shard, schema="shard int, lid long, score double"
    )
    return (
        index.rehydrate(per_shard)
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
        .select("docid", "score")
    )


def bm25_topk_near_unordered(
    index: SegmentIndex, query: str, k: int = 10, dist: int = 3
) -> DataFrame:
    """Ranked UNORDERED two-term proximity over the positional segment
    index (classic `A NEAR/k B`, Lucene/FTS default semantics; the ranked
    sibling of operators/search.match_near_unordered): top-k docs where
    the two analyzed tokens occur within `dist` filtered positions of each
    other IN EITHER ORDER, scored BM25 over both terms. Exactly two
    distinct analyzed tokens required — multi-term unordered coverage is a
    window-cover problem with different semantics (bm25_topk_phrase(slop)
    is the ordered m-term chain). Rank/score-identical to
    OracleIndex.search_near_unordered and ServingIndex.search_near_unordered
    (tested)."""
    spark = index.spark
    _aq, _tok, _sg = _analyzers_for(index)
    terms = _tok(query)
    if len(terms) != 2 or terms[0] == terms[1]:
        raise ValueError(
            "bm25_topk_near_unordered is the two-distinct-term NEAR "
            f"operator; got {terms!r} (use bm25_topk_phrase(slop) for the "
            "ordered chain)"
        )
    avgdl = index.stats.avgdl
    dead_bc = index.dead_broadcast()
    pair = list(terms)

    def run_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        dead = dead_bc.value.get(shard, _NO_DEAD) if dead_bc is not None else _NO_DEAD
        by_term = {r["term"]: _enc_from_row(r) for _, r in pdf.iterrows()}
        idf_b = {r["term"]: float(r["idf"]) for _, r in pdf.iterrows()}
        if any(t not in by_term for t in pair):
            return pd.DataFrame({"shard": [], "lid": [], "score": []})
        rows = [(t, by_term[t]) for t in pair]
        res = _shard_kernel_phrase(
            rows, idf_b, avgdl, k, dead, slop=dist, unordered=True
        )
        return pd.DataFrame(
            {
                "shard": [shard] * len(res),
                "lid": [int(d) for d, _ in res],
                "score": [float(s) for _, s in res],
            }
        )

    segs = index.segments_with_idf(sorted(set(terms)))
    per_shard = segs.groupBy("shard").applyInPandas(
        run_shard, schema="shard int, lid long, score double"
    )
    return (
        index.rehydrate(per_shard)
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
        .select("docid", "score")
    )


def bm25_topk_wand(
    index: SegmentIndex,
    query: str,
    k: int = 10,
    mode: str = "and",
    allowed_docids=None,
    exclude_terms: list[str] | None = None,
    pre_analyzed: list[str] | None = None,
) -> DataFrame:
    """Top-k BM25 over the segment index. mode='and' (conjunctive, default)
    or 'or' (disjunctive). Returns DataFrame(docid, score) ordered by
    (-score, docid).

    `pre_analyzed` supplies already-analyzed index terms (e.g. the stemmed
    positive group from the websearch parser) and skips query analysis —
    Porter is not idempotent ('university'→'univers'→'univ'), so a caller
    holding stemmed terms must NOT round-trip them through the analyzer.

    `allowed_docids` restricts the result to a caller-supplied global-docid
    scope (the reference limits every search to the caller's own documents,
    search.py:99-116 / F2-F3); corpus stats stay global — the scope filters
    candidates, it doesn't re-weigh the collection (documented semantics,
    matched by OracleIndex.search(allowed=...)). Small scopes (≤
    SCOPE_INLINE_MAX ids) ride a memoized broadcast; a large scope — a
    list above the threshold or any DataFrame of docids — is translated
    to (shard, lid) by a docmap join and COGROUPED with the segment rows,
    so it never materializes on the driver (a 10^8-id caller scope at
    100 TB stays distributed end to end).

    Single Spark job: idf rides into the shard kernels via a broadcast
    join of the (pruned) term_stats — no separate driver-side idf lookup
    job. AND semantics stay exact when a query term is unknown globally:
    no shard can then hold all terms, so every kernel returns empty."""
    spark = index.spark
    if pre_analyzed is not None:
        terms = list(dict.fromkeys(pre_analyzed))
    else:
        _aq, _tok, _sg = _analyzers_for(index)
        terms = _aq(query)
    if not terms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    neg_terms: list[str] = []
    if exclude_terms:
        if mode != "and":
            raise ValueError("exclude_terms (websearch '-term') is AND-only")
        neg_terms = sorted(set(exclude_terms))
        if set(terms) & set(neg_terms):
            return spark.createDataFrame([], RESULT_SCHEMA)  # contradiction
    n_terms = len(terms)
    avgdl = index.stats.avgdl
    mode_and = mode == "and"
    dead_bc = index.dead_broadcast()  # broadcast {shard: lid array} (or None)
    scope_df = scope_bc = None
    if allowed_docids is not None:
        if isinstance(allowed_docids, DataFrame):
            scope_df = allowed_docids
        elif len(allowed_docids) > SCOPE_INLINE_MAX:
            scope_df = spark.createDataFrame(
                ((int(d),) for d in allowed_docids), "docid long"
            )
        else:
            scope_bc = index.scope_broadcast(allowed_docids)
    scoped = allowed_docids is not None

    neg_set = set(neg_terms)

    def eval_shard(shard: int, pdf: pd.DataFrame, scope) -> pd.DataFrame:
        dead = dead_bc.value.get(shard, _NO_DEAD) if dead_bc is not None else _NO_DEAD
        all_rows = [(r["term"], _enc_from_row(r)) for _, r in pdf.iterrows()]
        rows = [tr for tr in all_rows if tr[0] not in neg_set]
        neg_rows = [tr for tr in all_rows if tr[0] in neg_set]
        idf_b = {r["term"]: float(r["idf"]) for _, r in pdf.iterrows()}
        if mode_and:
            if len(rows) < n_terms:
                return pd.DataFrame({"shard": [], "lid": [], "score": []})
            if n_terms == 1:
                res = _topk_single(
                    rows[0][1], idf_b[rows[0][0]], avgdl, k, dead, scope,
                    neg_rows,
                )
            else:
                res = _shard_kernel_and(
                    rows, idf_b, avgdl, k, dead, scope=scope, neg_rows=neg_rows
                )
        else:
            res = _shard_kernel_or(rows, idf_b, avgdl, k, dead, scope=scope)
        if not res:
            return pd.DataFrame({"shard": [], "lid": [], "score": []})
        return pd.DataFrame(
            {
                "shard": [shard] * len(res),
                "lid": [int(d) for d, _ in res],
                "score": [float(s) for _, s in res],
            }
        )

    def run_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        scope = (
            scope_bc.value.get(shard, _NO_DEAD) if scope_bc is not None
            else (_NO_DEAD if scoped else None)
        )
        return eval_shard(shard, pdf, scope)

    def run_shard_cogrouped(key, seg_pdf, scope_pdf) -> pd.DataFrame:
        # cogroup keys are the UNION of both sides' shards: a shard with
        # postings but no scoped docs (or vice versa) returns empty
        shard = int(key[0])
        scope = np.sort(scope_pdf["lid"].to_numpy().astype(np.int64))
        if len(seg_pdf) == 0 or scope.size == 0:
            return pd.DataFrame({"shard": [], "lid": [], "score": []})
        return eval_shard(shard, seg_pdf, scope)

    segs = index.segments_with_idf(terms + neg_terms)
    if scope_df is not None:
        scope_lids = index.docmap.join(
            scope_df.select(F.col("docid").cast("long").alias("docid")),
            "docid",
            "left_semi",
        ).select("shard", F.col("local_id").alias("lid"))
        per_shard = (
            segs.groupBy("shard")
            .cogroup(scope_lids.groupBy("shard"))
            .applyInPandas(
                run_shard_cogrouped, schema="shard int, lid long, score double"
            )
        )
    else:
        per_shard = segs.groupBy("shard").applyInPandas(
            run_shard, schema="shard int, lid long, score double"
        )
    # rehydrate lids -> global docids (docmap broadcast-join), then the
    # exact global order: (-score, docid) over per-shard top-k+ties.
    # ONE templated spark.sql call for the whole tail — the DataFrame-op
    # chain cost ~35 ms of py4j round trips per point query (r7 late);
    # identical plan (kernel output broadcasts, ORDER BY + LIMIT plans
    # as TakeOrderedAndProject)
    return index.spark.sql(
        "SELECT /*+ BROADCAST(p) */ dm.docid AS docid, p.score AS score "
        "FROM {p} p JOIN " + index._dm_view + " dm "
        "ON p.shard = dm.shard AND p.lid = dm.lid "
        f"ORDER BY p.score DESC, dm.docid ASC LIMIT {int(k)}",
        p=per_shard,
    )


def bm25_topk_websearch(
    index: SegmentIndex, query: str, k: int = 10
) -> DataFrame:
    """FULL websearch_to_tsquery semantics over the segment index
    (reference fusion.py:42): unprefixed words must ALL match, '"quoted
    words"' must additionally occur adjacently (chained <->), '-word'
    excludes documents containing it, '-"quoted words"' excludes documents
    containing the phrase adjacently, the standalone 'or' keyword joins
    conjunctive groups disjunctively (AND binds tighter), and a group-
    level contradiction drops that group (Postgres a & !a). Plain
    single-group queries ride the pruned AND path; single quoted groups
    run the combined positional kernel; everything else (OR / negated
    phrases) runs the group-union kernel. Rank/score bit-identical to
    OracleIndex.search_websearch (tested)."""
    from honeywell_search_engine_spark.functions.analyzer import parse_websearch_query

    spark = index.spark
    _aq, _tok, _sg = _analyzers_for(index)
    groups = _sg(parse_websearch_query(query))
    if not groups:
        return spark.createDataFrame([], RESULT_SCHEMA)

    avgdl = index.stats.avgdl
    dead_bc = index.dead_broadcast()

    if len(groups) == 1 and not groups[0][3]:
        all_pos, neg, phrases, _ = groups[0]
        if not phrases:
            # all_pos/neg are already index-analyzed (stemmed if the index
            # is) — pass them through pre_analyzed so they're not re-stemmed
            # (Porter is not idempotent; round-4 advice, wand.py:1090)
            return bm25_topk_wand(
                index, query, k, exclude_terms=neg, pre_analyzed=all_pos
            )
        neg_set = set(neg)
        n_pos = len(all_pos)

        def run_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(key[0])
            dead = dead_bc.value.get(shard, _NO_DEAD) if dead_bc is not None else _NO_DEAD
            all_rows = [(r["term"], _enc_from_row(r)) for _, r in pdf.iterrows()]
            idf_b = {r["term"]: float(r["idf"]) for _, r in pdf.iterrows()}
            pos_rows = [tr for tr in all_rows if tr[0] not in neg_set]
            neg_rows = [tr for tr in all_rows if tr[0] in neg_set]
            if len(pos_rows) < n_pos:
                return pd.DataFrame({"shard": [], "lid": [], "score": []})
            res = _shard_kernel_websearch(
                pos_rows, phrases, neg_rows, idf_b, avgdl, k, dead
            )
            return pd.DataFrame(
                {
                    "shard": [shard] * len(res),
                    "lid": [int(d) for d, _ in res],
                    "score": [float(s) for _, s in res],
                }
            )

        scan_terms = all_pos + neg
    else:
        # general path: OR of groups and/or negated phrases — the scan
        # covers every group's positive, negated, and neg-phrase terms
        scan_terms = sorted(
            {t for g in groups for t in g[0]}
            | {t for g in groups for t in g[1]}
            | {t for g in groups for ph in g[3] for t in ph}
        )

        def run_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(key[0])
            dead = dead_bc.value.get(shard, _NO_DEAD) if dead_bc is not None else _NO_DEAD
            by_term = {r["term"]: _enc_from_row(r) for _, r in pdf.iterrows()}
            idf_b = {r["term"]: float(r["idf"]) for _, r in pdf.iterrows()}
            res = _shard_kernel_websearch_or(
                groups, by_term, idf_b, avgdl, k, dead
            )
            return pd.DataFrame(
                {
                    "shard": [shard] * len(res),
                    "lid": [int(d) for d, _ in res],
                    "score": [float(s) for _, s in res],
                }
            )

    segs = index.segments_with_idf(scan_terms)
    per_shard = segs.groupBy("shard").applyInPandas(
        run_shard, schema="shard int, lid long, score double"
    )
    return (
        index.rehydrate(per_shard)
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
        .select("docid", "score")
    )


def bm25_topk_websearch_batch(
    index: SegmentIndex, queries: dict[str, str], k: int = 10
) -> DataFrame:
    """A whole batch of websearch queries (plain AND, '"quoted"' groups,
    '-term' negation, freely mixed) in ONE Spark job: one pruned segment
    scan over the union of every query's positive AND negated terms, one
    applyInPandas over shards where each kernel answers every query it
    can serve, one per-query rank window. Returns (qid, rnk, docid,
    score) — identical to per-query bm25_topk_websearch (tested)."""
    from pyspark.sql import Window

    from honeywell_search_engine_spark.functions.analyzer import parse_websearch_query

    spark = index.spark
    _aq, _tok, _sg = _analyzers_for(index)
    parsed: dict[str, list] = {}
    for qid, q in queries.items():
        groups = _sg(parse_websearch_query(q))
        if groups:  # no matchable group: no rows for this qid
            parsed[qid] = groups
    scan_terms = sorted(
        {
            t
            for groups in parsed.values()
            for g in groups
            for t in list(g[0]) + list(g[1]) + [x for ph in g[3] for x in ph]
        }
    )
    if not scan_terms:
        return spark.createDataFrame([], BATCH_RESULT_SCHEMA)
    avgdl = index.stats.avgdl
    dead_bc = index.dead_broadcast()

    use_count: dict[str, int] = {}
    need_pos: set = set()
    for groups in parsed.values():
        q_t = set()
        for g in groups:
            q_t |= set(g[0]) | set(g[1])
            for ph in list(g[2]) + list(g[3]):
                q_t |= set(ph)
                need_pos |= set(ph)
        for t in q_t:
            use_count[t] = use_count.get(t, 0) + 1

    def run_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        dead = dead_bc.value.get(shard, _NO_DEAD) if dead_bc is not None else _NO_DEAD
        # shared-term memoization: see bm25_topk_wand_batch — one decode
        # per task (positions only where some phrase needs them)
        by_term = {}
        for _, r in pdf.iterrows():
            enc = _enc_from_row(r)
            if use_count.get(r["term"], 0) > 1:
                enc = codec.MemoList(
                    enc,
                    codec.decode_postings(
                        enc,
                        with_positions=r["term"] in need_pos,
                        flat_positions=True,
                    ),
                )
            by_term[r["term"]] = enc
        idf_b = {r["term"]: float(r["idf"]) for _, r in pdf.iterrows()}
        out_q, out_d, out_s = [], [], []
        for qid, groups in parsed.items():
            if len(groups) == 1 and not groups[0][3]:
                all_pos, neg, phrases, _ = groups[0]
                pos_rows = [(t, by_term[t]) for t in all_pos if t in by_term]
                if len(pos_rows) < len(all_pos):
                    continue  # a required term absent in this shard
                neg_rows = [(t, by_term[t]) for t in neg if t in by_term]
                if phrases:
                    res = _shard_kernel_websearch(
                        pos_rows, phrases, neg_rows, idf_b, avgdl, k, dead
                    )
                elif len(all_pos) == 1:
                    res = _topk_single(
                        pos_rows[0][1], idf_b[pos_rows[0][0]], avgdl, k, dead,
                        None, neg_rows,
                    )
                else:
                    res = _shard_kernel_and(
                        pos_rows, idf_b, avgdl, k, dead, neg_rows=neg_rows
                    )
            else:  # OR groups / negated phrases: group-union kernel
                res = _shard_kernel_websearch_or(
                    groups, by_term, idf_b, avgdl, k, dead
                )
            for d, s in res:
                out_q.append(qid)
                out_d.append(int(d))
                out_s.append(float(s))
        return pd.DataFrame(
            {"qid": out_q, "shard": [shard] * len(out_q), "lid": out_d, "score": out_s}
        )

    segs = index.segments_with_idf(scan_terms)
    per_shard = segs.groupBy("shard").applyInPandas(
        run_shard, schema="qid string, shard int, lid long, score double"
    )
    hydrated = index.rehydrate(per_shard)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        hydrated.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "rnk", "docid", "score")
        .orderBy("qid", "rnk")
    )


def bm25_topk_phrase_batch(
    index: SegmentIndex, queries: dict[str, str], k: int = 10, slop: int = 0
) -> DataFrame:
    """Evaluate a batch of phrase/NEAR queries in ONE Spark job (same
    amortization as bm25_topk_wand_batch: one pruned positional segment
    scan over the union of all phrases' terms, per-shard kernels answer
    every phrase they can serve, one rank window). Returns
    (qid, rnk, docid, score) — identical to per-query bm25_topk_phrase."""
    from pyspark.sql import Window

    spark = index.spark
    _aq, _tok, _sg = _analyzers_for(index)  # stemmed index -> stemmed queries
    q_terms = {qid: _tok(q) for qid, q in queries.items()}
    live = {qid: ts for qid, ts in q_terms.items() if ts}
    scan_terms = sorted({t for ts in live.values() for t in ts})
    if not scan_terms:
        return spark.createDataFrame([], BATCH_RESULT_SCHEMA)
    avgdl = index.stats.avgdl
    dead_bc = index.dead_broadcast()

    use_count: dict[str, int] = {}
    for ts in live.values():
        for t in set(ts):
            use_count[t] = use_count.get(t, 0) + 1

    def run_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        dead = dead_bc.value.get(shard, _NO_DEAD) if dead_bc is not None else _NO_DEAD
        # shared-term memoization (positions included): see
        # bm25_topk_wand_batch — one decode per task, not per query
        by_term = {}
        for _, r in pdf.iterrows():
            enc = _enc_from_row(r)
            if use_count.get(r["term"], 0) > 1:
                enc = codec.MemoList(
                    enc,
                    codec.decode_postings(
                        enc, with_positions=True, flat_positions=True
                    ),
                )
            by_term[r["term"]] = enc
        idf_b = {r["term"]: float(r["idf"]) for _, r in pdf.iterrows()}
        out_q, out_d, out_s = [], [], []
        for qid, ts in live.items():
            if any(t not in by_term for t in ts):
                continue
            res = _shard_kernel_phrase(
                [(t, by_term[t]) for t in ts], idf_b, avgdl, k, dead, slop
            )
            for d, s in res:
                out_q.append(qid)
                out_d.append(int(d))
                out_s.append(float(s))
        return pd.DataFrame(
            {"qid": out_q, "shard": [shard] * len(out_q), "lid": out_d, "score": out_s}
        )

    segs = index.segments_with_idf(scan_terms)
    per_shard = segs.groupBy("shard").applyInPandas(
        run_shard, schema="qid string, shard int, lid long, score double"
    )
    hydrated = index.rehydrate(per_shard)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        hydrated.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "rnk", "docid", "score")
        .orderBy("qid", "rnk")
    )


BATCH_RESULT_SCHEMA = "qid string, rnk int, docid long, score double"


def bm25_topk_wand_batch(
    index: SegmentIndex, queries: dict[str, str], k: int = 10, mode: str = "and"
) -> DataFrame:
    """Evaluate a whole query batch in ONE Spark job.

    Per-query jobs pay ~0.3-0.5 s of scheduling each; a search engine's
    natural unit is the query *stream* (the reference's design target is
    100 q/s, PIPELINE.md:350). Here: one pruned segment scan over the
    union of all queries' terms, one applyInPandas over shards where each
    shard kernel answers every query it can serve, one final per-query
    rank window over <= n_queries * n_shards * k tiny rows.

    Returns DataFrame(qid, rnk, docid, score), rank per query by
    (-score, docid) — identical results to per-query bm25_topk_wand
    (tested)."""
    from pyspark.sql import Window

    spark = index.spark
    _aq, _tok, _sg = _analyzers_for(index)  # stemmed index -> stemmed queries
    q_terms = {qid: _aq(q) for qid, q in queries.items()}
    live_b = {qid: ts for qid, ts in q_terms.items() if ts}
    scan_terms = sorted({t for ts in live_b.values() for t in ts})
    if not scan_terms:
        return spark.createDataFrame([], BATCH_RESULT_SCHEMA)
    mode_and = mode == "and"
    avgdl = index.stats.avgdl
    dead_bc = index.dead_broadcast()

    use_count: dict[str, int] = {}
    for ts in live_b.values():
        for t in set(ts):
            use_count[t] = use_count.get(t, 0) + 1

    def run_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        dead = dead_bc.value.get(shard, _NO_DEAD) if dead_bc is not None else _NO_DEAD
        # terms shared by several queries (the Zipf head of a query log)
        # decode ONCE per task as a MemoList — every query after the
        # first runs decode-free with block-max pruning intact;
        # single-query terms stay encoded (selective decode only)
        by_term = {}
        for _, r in pdf.iterrows():
            enc = _enc_from_row(r)
            if use_count.get(r["term"], 0) > 1:
                enc = codec.MemoList(enc, codec.decode_postings(enc))
            by_term[r["term"]] = enc
        idf_b = {r["term"]: float(r["idf"]) for _, r in pdf.iterrows()}
        out_q, out_d, out_s = [], [], []
        for qid, ts in live_b.items():
            rows = [(t, by_term[t]) for t in ts if t in by_term]
            if mode_and:
                if len(rows) < len(ts):
                    continue  # some term absent in this shard => no AND hit here
                if len(ts) == 1:
                    res = _topk_single(rows[0][1], idf_b[rows[0][0]], avgdl, k, dead)
                else:
                    res = _shard_kernel_and(rows, idf_b, avgdl, k, dead)
            else:
                if not rows:
                    continue
                res = _shard_kernel_or(rows, idf_b, avgdl, k, dead)
            for d, s in res:
                out_q.append(qid)
                out_d.append(int(d))
                out_s.append(float(s))
        return pd.DataFrame(
            {"qid": out_q, "shard": [shard] * len(out_q), "lid": out_d, "score": out_s}
        )

    segs = index.segments_with_idf(scan_terms)
    per_shard = segs.groupBy("shard").applyInPandas(
        run_shard, schema="qid string, shard int, lid long, score double"
    )
    hydrated = index.rehydrate(per_shard)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        hydrated.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "rnk", "docid", "score")
        .orderBy("qid", "rnk")
    )
