"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline, pure column expressions
  (F.zip_with dot product — JVM-side, no Python);
- LSH-bucketed ANN (random hyperplane signs): the scale path — candidate
  generation via signature-prefix buckets, exact re-scoring only inside
  buckets. At 10^12 rows the bucket join replaces the O(n) scan per query.

The reference's vector channel is Qdrant HNSW (out of scope per SURVEY.md);
these operators give the same *capability* Spark-native for batch ANN.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector:
    (rnk, vec_id, cos_r rounded 1e-6). One scan, TakeOrderedAndProject."""
    q = [float(x) for x in query_vec]
    # sequential left-to-right sum (NOT np.dot's pairwise/SIMD order) so the
    # query norm is bit-identical to a SQL list_sum over the same values
    acc = 0.0
    for x in q:
        acc += x * x
    qn = float(np.sqrt(acc)) if acc else 1.0
    qlit = F.array(*[F.lit(x) for x in q])
    cos = _dot(F.col(vec_col), qlit) / (_norm(F.col(vec_col)) * F.lit(qn))
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"), cos.alias("cos")
    ).orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.select(
        F.row_number().over(w).alias("rnk"),
        "vec_id",
        F.round("cos", 6).alias("cos_r"),
    )


def rp_signature(dim: int, n_planes: int = 16, seed: int = 7) -> np.ndarray:
    """Deterministic random hyperplanes (seeded) for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def rp_planes_md5(dim: int, n_planes: int = 12) -> np.ndarray:
    """md5-derived hyperplanes: plane[p][i] = md5('rp{p}:{i}')[:15 hex] /
    2^60 - 0.5, uniform in [-0.5, 0.5). Engine-portable: DuckDB replays the
    same values bit-for-bit ('0x'||hex cast), so the driver's SQL oracle can
    reproduce the exact buckets (scaling an int by a power of two after the
    int->double rounding is exact in IEEE-754 in both engines)."""
    import hashlib

    vals = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for i in range(dim):
            h = int(hashlib.md5(f"rp{p}:{i}".encode()).hexdigest()[:15], 16)
            vals[p, i] = h / 2**60 - 0.5
    return vals


def rp_signatures_col(embeddings: DataFrame, planes: np.ndarray, vec_col: str):
    """(df with `sig` long column): sign-LSH signature via ONE Arrow-batched
    numpy matmul per batch (V @ planes.T), NOT n_planes chained aggregate()
    HOFs — struct-accumulator HOFs fall out of whole-stage codegen and were
    measured ~50x slower on the minhash path (dedup.py)."""
    import pandas as pd
    from pyspark.sql import types as T

    n_planes = planes.shape[0]
    pows = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
    planes_t = planes.T.copy()

    # hint-less pandas_udf: `from __future__ import annotations` stringifies
    # type hints, breaking eval-type inference (NOTES.md pitfall d)
    @F.pandas_udf(T.LongType())
    def _sig(vecs):
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        V = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (V @ planes_t) > 0.0
        return pd.Series((bits * pows).sum(axis=1).astype(np.int64))

    return embeddings.withColumn("sig", _sig(F.col(vec_col)))


def cosine_ann_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    probe_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane sign buckets; only rows
    whose signature is within `probe_hamming` of the query's signature are
    exactly scored (multi-probe: sum_{i<=h} C(p,i) buckets). Same output
    shape as the brute-force op.

    Scale: signatures are one numpy matmul per Arrow batch; the probe filter
    prunes ~(1 - sum_{i<=h} C(p,i)/2^p) of the corpus before any dot
    product (defaults: 79/4096 buckets = 1.9% scanned). The default
    probe_hamming=2 holds recall >= 0.8 on the clustered bench corpus
    (BENCH extra.knn_lsh_recall_clustered); raise it for harder corpora —
    every added hamming level multiplies candidates by ~C(p,i)/2^p, never
    approaching a full scan until h -> p. Planes are md5-derived
    (rp_planes_md5) so the DuckDB oracle replays the identical buckets."""
    from itertools import combinations

    dim = len(query_vec)
    planes = rp_planes_md5(dim, n_planes)
    q = np.asarray(query_vec, dtype=np.float64)
    qsig_bits = (planes @ q > 0.0).astype(int)
    qsig = int(sum(int(b) << p for p, b in enumerate(qsig_bits)))

    with_sig = rp_signatures_col(embeddings, planes, vec_col)
    # accept signatures within hamming distance h of qsig (multi-probe)
    accept = [qsig]
    for h in range(1, probe_hamming + 1):
        for flips in combinations(range(n_planes), h):
            m = qsig
            for p in flips:
                m ^= 1 << p
            accept.append(m)
    cand = with_sig.filter(F.col("sig").isin(accept))
    return cosine_topk_bruteforce(cand, query_vec, k, id_col, vec_col)


def ivf_centroids_md5(dim: int, n_centroids: int = 16) -> np.ndarray:
    """Deterministic pseudo-random centroid directions: cell c, dim i =
    md5('ivf{c}:{i}')[:15 hex] / 2^60 - 0.5 — engine-portable like
    rp_planes_md5 (a DuckDB oracle replays the identical cells). A real
    deployment would k-means these from a sample; fixed random directions
    are the standard zero-training IVF baseline and keep the assignment a
    pure function of the vector."""
    import hashlib

    vals = np.empty((n_centroids, dim), dtype=np.float64)
    for c in range(n_centroids):
        for i in range(dim):
            h = int(hashlib.md5(f"ivf{c}:{i}".encode()).hexdigest()[:15], 16)
            vals[c, i] = h / 2**60 - 0.5
    return vals


def ivf_cell_col(embeddings: DataFrame, centroids: np.ndarray, vec_col: str):
    """(df with `cell` int column): argmax_c dot(v, centroid_c) via ONE
    Arrow-batched numpy matmul per batch. Ties broken by the LOWEST cell
    index (np.argmax), mirrored in SQL by (dot DESC, cell ASC) ranking."""
    import pandas as pd
    from pyspark.sql import types as T

    cent_t = centroids.T.copy()

    @F.pandas_udf(T.IntegerType())
    def _cell(vecs):
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        V = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        return pd.Series(np.argmax(V @ cent_t, axis=1).astype(np.int32))

    return embeddings.withColumn("cell", _cell(F.col(vec_col)))


def cosine_ann_ivf(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: vectors are bucketed by their nearest (max-dot)
    centroid; only the query's `n_probe` nearest cells are exactly scored.
    Same output shape as the brute-force op.

    Scale: cell assignment is one matmul per Arrow batch and would be
    PRECOMPUTED as a partition column of the embedding table at 10^12 rows
    (cell-pruned scan per query); here it rides the plan so the operator
    is self-contained. Complements sign-LSH: IVF prunes by region
    (coarse cells), LSH by direction (hyperplane signs)."""
    dim = len(query_vec)
    cents = ivf_centroids_md5(dim, n_centroids)
    q = np.asarray(query_vec, dtype=np.float64)
    qd = cents @ q
    # top n_probe cells by dot desc, tie on cell asc (matches SQL mirror)
    order = np.lexsort((np.arange(n_centroids), -qd))
    probe = [int(c) for c in order[:n_probe]]
    with_cell = ivf_cell_col(embeddings, cents, vec_col)
    cand = with_cell.filter(F.col("cell").isin(probe))
    return cosine_topk_bruteforce(cand, query_vec, k, id_col, vec_col)


def build_ann_cells(
    embeddings: DataFrame,
    out_dir: str,
    dim: int = 64,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF cell assignment as a PARTITION COLUMN of the
    embedding table — the 10^12-row scale path: a query prunes to its
    n_probe cell DIRECTORIES at the parquet scan (PartitionFilters, plan-
    tested), touching ~n_probe/n_centroids of the data instead of scanning
    and assigning cells in-flight."""
    cents = ivf_centroids_md5(dim, n_centroids)
    (
        ivf_cell_col(
            embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")),
            cents,
            "embedding",
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(out_dir)
    )


def cosine_topk_ivf_indexed(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """ANN top-k over a build_ann_cells table: the cell filter prunes
    partition directories before any vector is read; exact cosine rescoring
    inside the probed cells. Identical results to the in-flight
    cosine_ann_ivf over the same rows (tested)."""
    dim = len(query_vec)
    cents = ivf_centroids_md5(dim, n_centroids)
    q = np.asarray(query_vec, dtype=np.float64)
    qd = cents @ q
    order = np.lexsort((np.arange(n_centroids), -qd))
    probe = [int(c) for c in order[:n_probe]]
    cand = spark.read.parquet(index_dir).filter(F.col("cell").isin(probe))
    return cosine_topk_bruteforce(cand, query_vec, k, "vec_id", "embedding")


def pairwise_cosine_dupes_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 12,
    probe_hamming: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs, PRODUCTION path: only rows sharing a
    sign-LSH bucket (all n_planes bits equal) are exactly scored — the
    all-pairs join never materializes; the only shuffle keys on the bucket
    signature. Cosine-similar vectors agree on each hyperplane with
    probability 1 - angle/pi, so high-threshold dupes land in one bucket
    with high probability. `probe_hamming=1` is multi-probe: the LEFT side
    additionally enters every bucket one bit-flip away (n_planes+1 keys per
    row), catching pairs that disagree on exactly one plane — recall rises
    at (n_planes+1)x candidate cost, still never all-pairs.
    Returns (id_a, id_b, cos_r) — approximate by construction (bucket
    recall), every returned cosine exact."""
    planes = rp_planes_md5(dim, n_planes)
    with_sig = rp_signatures_col(
        embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v")),
        planes,
        "v",
    )
    r = with_sig.select(
        F.col("vid").alias("id_b"), F.col("v").alias("vb"), "sig"
    )
    if probe_hamming == 0:
        l = with_sig.select(
            F.col("vid").alias("id_a"), F.col("v").alias("va"), "sig"
        )
        pairs = l.join(r, "sig")
    else:
        # multi-probe: explode the left side into its own bucket plus the
        # n_planes hamming-1 neighbors; join on the right side's exact sig
        probes = F.array(
            F.col("sig"),
            *[
                F.col("sig").bitwiseXOR(F.lit(1 << p).cast("long"))
                for p in range(n_planes)
            ],
        )
        l = with_sig.select(
            F.col("vid").alias("id_a"),
            F.col("v").alias("va"),
            F.explode(probes).alias("sig"),
        )
        pairs = l.join(r, "sig").dropDuplicates(["id_a", "id_b"])
    pairs = pairs.filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos_r"))
        .orderBy("id_a", "id_b")
    )


def pairwise_cosine_dupes_lsh_banded(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 24,
    bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via BANDED sign-LSH — the standard recall
    lever (MinHash-style banding applied to hyperplane signs): the
    n_planes signature splits into `bands` bands of r = n_planes/bands
    planes; a pair is a candidate iff it agrees on EVERY plane of at least
    one band. With per-plane agreement p = 1 - angle/pi, candidate
    probability is 1 - (1 - p^r)^bands — e.g. cos 0.95, 12 planes,
    3 bands: ~0.96 vs ~0.28 for the all-12-planes single bucket. Exact
    cosine verify after the bucket join removes false positives; the only
    shuffle keys on (band, band value); all-pairs never materializes.
    Returns (id_a < id_b, cos_r) — recall approximate (reported per-round
    in BENCH extra), every returned cosine exact."""
    assert n_planes % bands == 0
    r_bits = n_planes // bands
    planes = rp_planes_md5(dim, n_planes)
    with_sig = rp_signatures_col(
        embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v")),
        planes,
        "v",
    )
    slices = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("sig"), b * r_bits)
                .bitwiseAND(F.lit((1 << r_bits) - 1))
                .alias("bv"),
            )
            for b in range(bands)
        ]
    )
    exploded = with_sig.select(
        "vid", "v", F.explode(slices).alias("s")
    ).select("vid", "v", F.col("s.band").alias("band"), F.col("s.bv").alias("bv"))
    l = exploded.select(
        F.col("vid").alias("id_a"), F.col("v").alias("va"), "band", "bv"
    )
    r = exploded.select(
        F.col("vid").alias("id_b"), F.col("v").alias("vb"), "band", "bv"
    )
    pairs = (
        l.join(r, ["band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])  # a pair may share several bands
    )
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos_r"))
        .orderBy("id_a", "id_b")
    )


def pairwise_cosine_dupes(
    embeddings: DataFrame,
    threshold: float = 0.95,
    max_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 10_000,
) -> DataFrame:
    """Embedding near-duplicate pairs (cos >= threshold):
    (id_a, id_b, cos_r). This is an EXACT ALL-PAIRS theta join — an
    oracle/exactness slice, never the production path (that's
    pairwise_cosine_dupes_lsh[_banded]). Guarded: without `max_id` the
    input must hold <= `max_rows` rows or the call raises — an unbounded
    cartesian on a 10⁹-row corpus is the one scale-killer this API could
    otherwise express (round-4 verdict)."""
    e = embeddings
    if max_id is not None:
        e = e.filter(F.col(id_col) <= max_id)
    else:
        n = e.count()
        if n > max_rows:
            raise ValueError(
                f"pairwise_cosine_dupes is an exact all-pairs slice: input "
                f"has {n} rows > max_rows={max_rows}. Pass max_id=/max_rows= "
                f"to bound it, or use pairwise_cosine_dupes_lsh[_banded] "
                f"for the bucketed production path."
            )
    l = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    r = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = l.join(r, F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos_r"))
        .orderBy("id_a", "id_b")
    )


def knn_all_ops(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    probe_hamming: int = 2,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """The four ANN strategies (exact bruteforce, sign-LSH multi-probe,
    IVF n_probe, attribute-filtered exact) over ONE scan — the fused
    form of the knn_all gate (r7). Row-for-row identical to the tag
    union of cosine_topk_bruteforce / cosine_ann_lsh / cosine_ann_ivf /
    filtered-bruteforce (pinned in tests): the cosine is the same
    expression evaluated once per row, sig and cell ride a single
    Arrow-batched numpy matmul pair (one python stage instead of two),
    per-op membership explodes k-bounded tags, and one WindowGroupLimit
    window assigns the per-op ranks the four TakeOrdered branches
    assigned. 4 scans + 2 python stages + 4 limit subtrees become
    1 + 1 + 1.

    Scale note: identical to the unfused operators — the production
    paths at 10^12 rows remain the cell-partitioned/bucketed indexes;
    this is the in-flight gate/audit form."""
    import pandas as pd
    from itertools import combinations

    from pyspark.sql import types as T

    q = [float(x) for x in query_vec]
    dim = len(q)
    planes = rp_planes_md5(dim, n_planes)
    cents = ivf_centroids_md5(dim, n_centroids)
    qnp = np.asarray(q, dtype=np.float64)
    qsig_bits = (planes @ qnp > 0.0).astype(int)
    qsig = int(sum(int(b) << p for p, b in enumerate(qsig_bits)))
    accept = [qsig]
    for h in range(1, probe_hamming + 1):
        for flips in combinations(range(n_planes), h):
            m = qsig
            for p in flips:
                m ^= 1 << p
            accept.append(m)
    qd = cents @ qnp
    order = np.lexsort((np.arange(n_centroids), -qd))
    probe = [int(c) for c in order[:n_probe]]

    pows = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
    planes_t = planes.T.copy()
    cent_t = cents.T.copy()

    @F.pandas_udf(T.StructType([
        T.StructField("sig", T.LongType()),
        T.StructField("cell", T.IntegerType()),
    ]))
    def _sig_cell(vecs):
        if len(vecs) == 0:
            return pd.DataFrame({"sig": pd.Series([], dtype="int64"),
                                 "cell": pd.Series([], dtype="int32")})
        V = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (V @ planes_t) > 0.0
        return pd.DataFrame({
            "sig": ((bits * pows).sum(axis=1)).astype(np.int64),
            "cell": np.argmax(V @ cent_t, axis=1).astype(np.int32),
        })

    acc = 0.0
    for x in q:
        acc += x * x
    qn = float(np.sqrt(acc)) if acc else 1.0
    qlit = F.array(*[F.lit(x) for x in q])
    cos = _dot(F.col(vec_col), qlit) / (_norm(F.col(vec_col)) * F.lit(qn))

    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("_label"),
        cos.alias("cos"),
        _sig_cell(F.col(vec_col)).alias("_sc"),
    )
    ops = F.array(
        F.lit("bruteforce"),
        F.when(F.col("_sc.sig").isin(accept), F.lit("lsh")),
        F.when(F.col("_sc.cell").isin(probe), F.lit("ivf")),
        F.when(F.col("_label") == 1, F.lit("filtered")),
    )
    tagged = base.select(
        "vec_id", "cos", F.explode(ops).alias("op")
    ).filter(F.col("op").isNotNull())
    w = Window.partitionBy("op").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        tagged.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("op", "rnk", "vec_id", F.round("cos", 6).alias("cos_r"))
    )
