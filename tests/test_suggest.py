"""Prefix suggestions + SymSpell spell correction (query/suggest.py).

Exactness oracle: brute-force Levenshtein DP over the full index
dictionary — the delete-key candidate set, after the built-in
`levenshtein` verify, must equal {t in dict : lev(q, t) <= e} exactly
(SymSpell's delete-neighborhood theorem; Garbe 2012, public algorithm).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from honeywell_search_engine_spark.query.suggest import (
    build_spell_table,
    correct_terms,
    did_you_mean,
    py_deletes,
    suggest_terms,
)


def _lev(a: str, b: str) -> int:
    """Plain Levenshtein DP (matches Spark's `levenshtein` builtin)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def dict_terms(seg_index):
    return {
        r["term"]: r["df"]
        for r in seg_index.term_stats.select("term", "df").collect()
    }


@pytest.fixture(scope="module")
def spell(seg_index):
    return build_spell_table(seg_index.term_stats, max_edit=2).cache()


def _mutate(term: str) -> list[str]:
    """Deterministic misspellings: one deletion, one substitution, one
    insertion, one transposition."""
    mid = len(term) // 2
    return [
        term[:mid] + term[mid + 1 :],
        term[:mid] + ("z" if term[mid] != "z" else "q") + term[mid + 1 :],
        term[:mid] + "x" + term[mid:],
        term[: mid - 1] + term[mid] + term[mid - 1] + term[mid + 1 :],
    ]


def test_neighborhood_matches_python_mirror(spark, dict_terms):
    """The Catalyst HOF delete-neighborhood == the driver-side mirror
    used for query terms (same keys on both join sides is the whole
    correctness story of the bucketed lookup)."""
    from honeywell_search_engine_spark.query.suggest import _neighborhood_col

    sample = sorted(dict_terms)[:50]
    df = spark.createDataFrame([(t,) for t in sample], "term string")
    for e in (1, 2):
        got = {
            r["term"]: set(r["nb"])
            for r in df.select(
                "term", _neighborhood_col("term", e).alias("nb")
            ).collect()
        }
        for t in sample:
            assert got[t] == py_deletes(t, e), (t, e)


def test_correct_terms_exact_vs_bruteforce(spell, dict_terms):
    probes = []
    for t in sorted(dict_terms, key=lambda t: -dict_terms[t])[:5]:
        if len(t) >= 5:
            probes.extend(_mutate(t))
    probes = probes[:12]
    got = correct_terms(spell, probes, max_edit=2, k=10**9).toPandas()
    for q in probes:
        mine = {
            (r.term, r.distance)
            for r in got[got.qterm == q].itertuples()
        }
        brute = {
            (t, _lev(q, t)) for t in dict_terms if _lev(q, t) <= 2
        }
        assert mine == brute, q


def test_in_dictionary_term_is_its_own_best(spell, dict_terms):
    t = max(dict_terms, key=dict_terms.get)
    top = correct_terms(spell, [t], k=1).collect()
    assert top[0]["term"] == t and top[0]["distance"] == 0


def test_ranking_distance_then_df(spell, dict_terms):
    """rnk must order by (distance asc, df desc): a distance-1 rare term
    beats a distance-2 frequent one; ties at a distance break by df."""
    q = sorted(dict_terms, key=lambda t: -dict_terms[t])[0]
    rows = correct_terms(spell, _mutate(q)[:2], k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qterm"], []).append(r)
    for lst in by_q.values():
        lst.sort(key=lambda r: r["rnk"])
        keys = [(r["distance"], -r["df"], r["term"]) for r in lst]
        assert keys == sorted(keys)


def test_did_you_mean_rewrites_and_search_recovers(seg_index, spell, oracle):
    from honeywell_search_engine_spark.query.wand import bm25_topk_wand

    term = max(
        (
            r["term"]
            for r in seg_index.term_stats.filter(F.length("term") >= 6)
            .orderBy(F.desc("df"))
            .limit(1)
            .collect()
        ),
    )
    typo = _mutate(term)[1]  # substitution — never a dictionary word
    fixed, changed = did_you_mean(seg_index, spell, typo)
    assert changed and fixed == term
    assert len(bm25_topk_wand(seg_index, fixed, k=5).collect()) > 0
    ok, unchanged = did_you_mean(seg_index, spell, term)
    assert not unchanged and ok == term


def test_suggest_terms_matches_pandas(seg_index, dict_terms):
    for prefix in ("se", "data", "qz"):
        got = suggest_terms(seg_index.term_stats, prefix, k=8).collect()
        want = sorted(
            ((t, d) for t, d in dict_terms.items() if t.startswith(prefix)),
            key=lambda x: (-x[1], x[0]),
        )[:8]
        assert [(r["term"], r["df"]) for r in got] == want, prefix


def test_suggest_prefix_filter_is_pushed(seg_index):
    plan = (
        suggest_terms(seg_index.term_stats, "se", k=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "StartsWith" in plan and "PushedFilters" in plan


def test_spell_table_size_is_linear(spell, dict_terms):
    """|deletes| per term is 1 + len + len*(len-1)/2 distinct keys at
    most (depth <= 2) — the scale contract vs the dictionary size."""
    per_term = (
        spell.groupBy("term").count().agg(F.max("count")).collect()[0][0]
    )
    max_len = max(len(t) for t in dict_terms)
    assert per_term <= 1 + max_len + max_len * (max_len - 1) // 2


def test_serving_suggest_matches_spark(spark, seg_index):
    """ServingIndex.suggest (pyarrow range-pruned) must rank-match
    query/suggest.suggest_terms on the same index."""
    from honeywell_search_engine_spark.query.local import ServingIndex

    sv = ServingIndex(seg_index.path)
    prefixes = ["da", "se", "eng", "q", "zzz", "dat"]
    for p in prefixes:
        exp = [
            (r["term"], r["df"])
            for r in suggest_terms(seg_index.term_stats, p, k=10).collect()
        ]
        assert sv.suggest(p, k=10) == exp, p
    assert sv.suggest("", k=10) == []


def test_serving_spell_matches_spark(spark, seg_index, dict_terms, tmp_path):
    """ServingIndex.correct_terms / did_you_mean against a persisted
    spell table must candidate- and rank-match the Spark path (and the
    brute-force oracle transitively, via the existing exactness test)."""
    from honeywell_search_engine_spark.query.local import ServingIndex
    from honeywell_search_engine_spark.query.suggest import py_levenshtein

    spell_dir = str(tmp_path / "spell")
    build_spell_table(seg_index.term_stats, max_edit=2, out_dir=spell_dir)
    sv = ServingIndex(seg_index.path)
    qs = []
    for t in sorted(dict_terms)[10:14]:
        qs.extend(_mutate(t))
    spark_spell = spark.read.parquet(spell_dir)
    exp_rows = correct_terms(spark_spell, qs, max_edit=2, k=3).collect()
    exp: dict = {}
    for r in exp_rows:
        exp.setdefault(r["qterm"], []).append(
            (r["term"], r["distance"], r["df"])
        )
    got = sv.correct_terms(qs, spell_dir, max_edit=2, k=3)
    for q in qs:
        assert got.get(q, []) == exp.get(q, []), q
    # py_levenshtein == the DP oracle used by the Spark-side tests
    for a in qs[:4]:
        for b in sorted(dict_terms)[:20]:
            assert py_levenshtein(a, b) == _lev(a, b), (a, b)
    # did_you_mean end-to-end parity
    base = sorted(dict_terms)[12]
    typo_q = f"{_mutate(base)[1]} {sorted(dict_terms)[13]}"
    exp_fix = did_you_mean(seg_index, spark_spell, typo_q, max_edit=2)
    assert sv.did_you_mean(typo_q, spell_dir, max_edit=2) == exp_fix


def test_succ_prefix():
    from honeywell_search_engine_spark.query.local import _succ_prefix

    assert _succ_prefix("se") == "sf"
    assert _succ_prefix("a") == "b"
    # trailing max code point: carry into the previous position
    assert _succ_prefix("a\U0010FFFF") == "b"
    assert _succ_prefix("\U0010FFFF") is None
    s = _succ_prefix("café")
    assert s is not None and s > "café" and not s.startswith("café")


def test_serving_suggest_supplementary_plane(tmp_path):
    """Terms with supplementary-plane characters (> U+FFFF) right after
    the prefix must still be suggested — the old prefix+U+FFFF upper
    bound silently excluded them (advice r5)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from honeywell_search_engine_spark.query.local import ServingIndex

    terms = sorted(["se", "search", "se\U0001F600x", "sf", "s", "sd"])
    dfs = list(range(10, 10 + len(terms)))
    tdir = tmp_path / "term_stats"
    tdir.mkdir()
    pq.write_table(
        pa.table({"term": terms, "df": dfs}), tdir / "part-0.parquet"
    )
    sv = object.__new__(ServingIndex)
    sv.path = str(tmp_path)
    got = sv.suggest("se", k=10)
    assert set(t for t, _ in got) == {"se", "search", "se\U0001F600x"}
    # rank: df desc, term asc — and df values survive the round-trip
    exp = sorted(
        [(t, d) for t, d in zip(terms, dfs) if t.startswith("se")],
        key=lambda r: (-r[1], r[0]),
    )
    assert got == exp
