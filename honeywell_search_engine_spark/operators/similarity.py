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


def cosine_ann_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane sign buckets; only rows
    whose signature is within `probe_hamming` of the query's signature are
    exactly scored. Same output shape as the brute-force op.

    Scale: signatures are a per-row expression; the probe filter prunes
    ~(1 - sum_{i<=h} C(p,i)/2^p) of the corpus before any dot product."""
    dim = len(query_vec)
    planes = rp_signature(dim, n_planes)
    q = np.asarray(query_vec, dtype=np.float64)
    qsig_bits = (planes @ q > 0).astype(int)

    # signature as int: sum of bits — computed as column expression
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        dot_p = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in planes[p]]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot_p > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0))
    qsig = int(sum(int(b) << p for p, b in enumerate(qsig_bits)))

    with_sig = embeddings.withColumn("sig", sig)
    # accept signatures within hamming distance h of qsig
    accept = [qsig]
    if probe_hamming >= 1:
        accept += [qsig ^ (1 << p) for p in range(n_planes)]
    if probe_hamming >= 2:
        for p1 in range(n_planes):
            for p2 in range(p1 + 1, n_planes):
                accept.append(qsig ^ (1 << p1) ^ (1 << p2))
    cand = with_sig.filter(F.col("sig").isin(accept))
    return cosine_topk_bruteforce(cand, query_vec, k, id_col, vec_col)


def pairwise_cosine_dupes(
    embeddings: DataFrame,
    threshold: float = 0.95,
    max_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs (cos >= threshold):
    (id_a, id_b, cos_r). Bounded slice for exactness tests; the production
    path routes through cosine_ann_lsh buckets first."""
    e = embeddings
    if max_id is not None:
        e = e.filter(F.col(id_col) <= max_id)
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
