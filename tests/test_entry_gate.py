"""Replicates the driver's correctness gate: every __spark_entry__ query
with an oracle must match DuckDB on sf0.001 (sf0.01 is the driver's scale;
0.001 keeps CI fast — same code path)."""

import duckdb
import numpy as np
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = [
    "documents", "embeddings", "events", "lineitem", "orders",
    "part", "customer", "supplier", "nation", "region",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(list(df.columns)).reset_index(drop=True).astype(str)


ORACLED = sorted(set(E.queries()) & set(E.oracle_sql(SF)))
ROWS_ONLY = sorted(set(E.queries()) - set(E.oracle_sql(SF)))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    got = _canon(E.queries()[name](spark, SF).toPandas())
    exp = _canon(ddb.sql(E.oracle_sql(SF)[name]).df())
    assert list(got.columns) == list(exp.columns), f"{name}: columns"
    assert len(got) == len(exp), f"{name}: row count"
    assert got.equals(exp), f"{name}: values"


@pytest.mark.parametrize("name", ROWS_ONLY or ["__fully_oracled__"])
def test_rows_only_queries_run(spark, name):
    if name == "__fully_oracled__":
        assert not ROWS_ONLY  # every gate has a DuckDB mirror — nothing here
        return
    df = E.queries()[name](spark, SF)
    assert df.count() >= 0  # runs without error, stable schema
    assert df.columns


def test_entry_smoke(spark):
    rows = E.entry(spark).collect()
    assert len(rows) > 0
    assert [f.name for f in E.entry(spark).schema.fields] == ["rnk", "docid", "score_r"]


def test_lsh_recall_vs_bruteforce(spark):
    """knn_lsh is approximate but must be a subset-of-corpus exact scorer:
    every returned (vec_id, cos) must appear in the brute-force ranking
    with the same cosine."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    from honeywell_search_engine_spark.operators.similarity import (
        cosine_ann_lsh,
        cosine_topk_bruteforce,
    )

    rest = emb.filter(F.col("vec_id") != 0)
    bf = {
        r["vec_id"]: r["cos_r"]
        for r in cosine_topk_bruteforce(rest, qv, k=1000).collect()
    }
    for r in cosine_ann_lsh(rest, qv, k=10).collect():
        assert r["vec_id"] in bf and bf[r["vec_id"]] == r["cos_r"]


def test_ivf_is_exact_scorer_subset(spark):
    """knn_ivf returns exact cosines: every hit appears in the brute-force
    ranking with the identical rounded cosine."""
    from pyspark.sql import functions as F

    from honeywell_search_engine_spark.operators.similarity import (
        cosine_ann_ivf,
        cosine_topk_bruteforce,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    rest = emb.filter(F.col("vec_id") != 0)
    bf = {
        r["vec_id"]: r["cos_r"]
        for r in cosine_topk_bruteforce(rest, qv, k=1000).collect()
    }
    hits = cosine_ann_ivf(rest, qv, k=10).collect()
    assert hits
    for r in hits:
        assert r["vec_id"] in bf and bf[r["vec_id"]] == r["cos_r"]


def test_ivf_indexed_equals_inflight_and_prunes(spark, tmp_path):
    """The materialized cell-partitioned ANN table returns exactly the
    in-flight IVF results, and its scan is partition-pruned on cell."""
    from pyspark.sql import functions as F

    from honeywell_search_engine_spark.operators.similarity import (
        build_ann_cells,
        cosine_ann_ivf,
        cosine_topk_ivf_indexed,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    rest = emb.filter(F.col("vec_id") != 0)
    out = str(tmp_path / "ann_cells")
    build_ann_cells(rest, out)

    indexed = cosine_topk_ivf_indexed(spark, out, qv, k=10)
    inflight = cosine_ann_ivf(rest, qv, k=10)
    a = [(r["vec_id"], r["cos_r"]) for r in indexed.collect()]
    b = [(r["vec_id"], r["cos_r"]) for r in inflight.collect()]
    assert a == b and a

    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:200]


def test_multiprobe_lsh_dupes_superset(spark):
    """probe_hamming=1 recall is a superset of exact-bucket recall, with
    identical cosines, and stays a subset of the exact all-pairs result."""
    from pyspark.sql import functions as F

    from honeywell_search_engine_spark.operators.similarity import (
        pairwise_cosine_dupes,
        pairwise_cosine_dupes_lsh,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"]): r["cos_r"]
        for r in pairwise_cosine_dupes(emb, threshold=0.35).collect()
    }
    p0 = {
        (r["id_a"], r["id_b"]): r["cos_r"]
        for r in pairwise_cosine_dupes_lsh(emb, threshold=0.35, n_planes=6).collect()
    }
    p1 = {
        (r["id_a"], r["id_b"]): r["cos_r"]
        for r in pairwise_cosine_dupes_lsh(
            emb, threshold=0.35, n_planes=6, probe_hamming=1
        ).collect()
    }
    assert set(p0) <= set(p1) <= set(exact)
    assert len(p1) > len(p0)  # multi-probe actually recovered extra pairs
    for k, v in p1.items():
        assert exact[k] == v  # every returned cosine exact


def test_banded_lsh_dupes_precision_and_recall_lever(spark):
    """pairwise_cosine_dupes_lsh_banded: every returned pair must appear in
    the exact all-pairs result (the cosine verify removes ALL false
    positives), and banding must recall at least as many true pairs as the
    all-planes single bucket at the same plane count (the banding lever)."""
    from pyspark.sql import functions as F

    from honeywell_search_engine_spark.operators.similarity import (
        pairwise_cosine_dupes,
        pairwise_cosine_dupes_lsh,
        pairwise_cosine_dupes_lsh_banded,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") <= 200
    )
    thr = 0.30
    exact = {
        (r["id_a"], r["id_b"], r["cos_r"])
        for r in pairwise_cosine_dupes(emb, threshold=thr).collect()
    }
    banded = {
        (r["id_a"], r["id_b"], r["cos_r"])
        for r in pairwise_cosine_dupes_lsh_banded(
            emb, threshold=thr, n_planes=12, bands=3
        ).collect()
    }
    single = {
        (r["id_a"], r["id_b"], r["cos_r"])
        for r in pairwise_cosine_dupes_lsh(
            emb, threshold=thr, n_planes=12, probe_hamming=0
        ).collect()
    }
    assert exact, "fixture must contain pairs above the threshold"
    assert banded <= exact  # precision 1.0: verify removes bucket FPs
    assert single <= banded  # an intact 12-plane sig implies 3 intact bands
    assert len(banded) > len(single)  # the lever actually recalls more


def test_oracled_gates_are_driver_canonicalizable(spark):
    """The DRIVER's canonicalizer (unlike _canon above) cannot sort/hash
    array/map columns — the round-4 text_embeddings red row. Every oracled
    gate must emit scalar columns only."""
    from pyspark.sql import types as T

    bad = []
    for name in ORACLED:
        schema = E.queries()[name](spark, SF).schema
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"non-canonicalizable gate columns: {bad}"


def test_gate_board_within_driver_sample():
    """STANDING CONSTRAINT (round-5 discovery, COVERAGE.md): the driver
    samples exactly the first 50 queries() entries in insertion order, so
    a 51st gate would silently go unverified. Merge into a tagged-union
    family before appending."""
    import __spark_entry__ as e

    q = e.queries()
    assert len(q) <= 50, (
        f"gate board has {len(q)} entries; the driver samples only the "
        "first 50 — merge gates into a tagged-union family instead"
    )
    assert set(e.oracle_sql()) <= set(q)


def test_knn_all_fused_equals_branch_union(spark):
    """r7: the fused knn_all kernel (similarity.knn_all_ops) must be
    row-for-row identical to the tag union of the four individual
    operators it replaced in the gate (which remain the documented
    single-strategy surface)."""
    from pyspark.sql import functions as F

    from honeywell_search_engine_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    rest = emb.filter(F.col("vec_id") != 0)
    old = []
    for tag, df in [
        ("bruteforce", sim.cosine_topk_bruteforce(rest, qv, k=10)),
        ("lsh", sim.cosine_ann_lsh(rest, qv, k=10)),
        ("ivf", sim.cosine_ann_ivf(rest, qv, k=10)),
        (
            "filtered",
            sim.cosine_topk_bruteforce(
                emb.filter((F.col("vec_id") != 0) & (F.col("label") == 1)),
                qv,
                k=10,
            ),
        ),
    ]:
        for r in df.collect():
            old.append((tag, r["rnk"], r["vec_id"], r["cos_r"]))
    new = [
        (r["op"], r["rnk"], r["vec_id"], r["cos_r"])
        for r in sim.knn_all_ops(rest, qv, k=10).collect()
    ]
    assert sorted(new) == sorted(old) and len(new) == 40
