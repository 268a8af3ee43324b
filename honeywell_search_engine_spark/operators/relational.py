"""Relational operators mirroring the reference's query-path dataflow
(SURVEY.md §2.3-2.5) as reusable Spark functions, exercised over the
driver's testdata tables.

Each docstring cites the reference operator it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def fusion_merge(sem: DataFrame, lex: DataFrame, tri: DataFrame, key: str) -> DataFrame:
    """J3: the reference's 3-channel fusion merge — dict .update() over
    channel lists == full-outer join on the fused key with per-column
    coalesce (reference fusion.py:101-114). Inputs carry (key, <chan>_score,
    <chan>_rank); output one row per key with all channels' columns."""
    out = (
        sem.join(lex, key, "full_outer")
        .join(tri, key, "full_outer")
    )
    return out


def linear_confidence(df: DataFrame, sem="sem_score", lex="lex_score", tri="tri_score") -> DataFrame:
    """R4: confidence = min(1, 0.55*sem + 0.35*lex + 0.10*oie), as int
    percent (reference search.py:157-158,166). Missing channels -> 0."""
    conf = F.least(
        F.lit(1.0),
        F.lit(0.55) * F.coalesce(F.col(sem), F.lit(0.0))
        + F.lit(0.35) * F.coalesce(F.col(lex), F.lit(0.0))
        + F.lit(0.10) * F.coalesce(F.col(tri), F.lit(0.0)),
    )
    return df.withColumn("confidence", F.floor(conf * 100).cast("int"))


def rank_assignment(df: DataFrame, score_col: str, out_col: str = "rnk") -> DataFrame:
    """K4: semantic_rank/lexical_rank by enumeration order of the scored
    list (reference fusion.py:19-28,58) == row_number over (score desc,
    deterministic tie-break)."""
    order = [F.desc(score_col)] + [F.asc(c) for c in df.columns if c != score_col][:1]
    return df.withColumn(out_col, F.row_number().over(Window.orderBy(*order)))


def topk_per_group(
    df: DataFrame, group_col: str, order_col: str, k: int = 1, tie_col: str | None = None
) -> DataFrame:
    """A3: argmax over sentences per chunk (reference search.py:62-70) ==
    row_number over a per-group window, keep rnk <= k."""
    order = [F.desc(order_col)] + ([F.asc(tie_col)] if tie_col else [])
    w = Window.partitionBy(group_col).orderBy(*order)
    return df.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def latest_dedup(
    df: DataFrame, keys: list[str], ts_col: str, tie_col: str | None = None
) -> DataFrame:
    """A9: history dedup-upsert — keep the newest row per key (reference
    search_history.py:70-91). Window row_number == 1; `tie_col` (desc)
    makes equal-timestamp rows deterministic."""
    order = [F.desc(ts_col)] + ([F.desc(tie_col)] if tie_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def incremental_anti_join(new: DataFrame, done: DataFrame, key: str) -> DataFrame:
    """S7: incremental scan — rows not yet processed (reference
    tasks_embedding.py:30-41 `embedded = FALSE`) == left-anti join against
    the manifest of completed keys."""
    return new.join(done, key, "left_anti")


def child_parent_coalesce(
    child: DataFrame, parent: DataFrame, child_fk: str, parent_pk: str,
    child_text: str, parent_text: str,
) -> DataFrame:
    """J1: child->parent self-join with COALESCE(parent.text, child.text)
    (reference tasks_embedding.py:32-40)."""
    p = parent.select(
        F.col(parent_pk).alias("_ppk"), F.col(parent_text).alias("_ptext")
    )
    return (
        child.join(p, child[child_fk] == p["_ppk"], "left")
        .withColumn("composite_text", F.coalesce(F.col("_ptext"), F.col(child_text)))
        .drop("_ppk", "_ptext")
    )


def rrf_fusion(channels: list[DataFrame], key: str, rank_col: str = "rnk",
               k: int = 60) -> DataFrame:
    """R6: reciprocal-rank fusion, the reference's *documented* fusion
    design (PIPELINE.md:216-220): RRF(d) = Σ_channels 1/(k + rank_c(d)).
    Inputs carry (key, rank_col); absent channel contributes 0.
    Returns (key, rrf_score rounded 1e-6) sorted desc, tie on key."""
    out = None
    for i, ch in enumerate(channels):
        c = ch.select(F.col(key), F.col(rank_col).alias(f"_r{i}"))
        out = c if out is None else out.join(c, key, "full_outer")
    score = None
    for i in range(len(channels)):
        part = F.when(
            F.col(f"_r{i}").isNotNull(), F.lit(1.0) / (F.lit(float(k)) + F.col(f"_r{i}"))
        ).otherwise(F.lit(0.0))
        score = part if score is None else score + part
    return (
        out.select(F.col(key), F.round(score, 6).alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc(key))
    )
