"""End-to-end corpus curation: every pre-training data filter this engine
implements, composed into ONE audited pipeline.

The standard web-corpus curation recipe (CCNet / Gopher / The Pile
pipelines) is a fixed-order cascade — each document gets exactly one
verdict, the FIRST gate it fails:

    eval_heldout  — the benchmark/eval slice itself (never trained on)
    duplicate     — exact content duplicate (md5 of normalized text,
                    min-docid copy kept)
    non_english   — language gate (operators/textstats.langid semantics)
    too_short     — length gate
    low_quality   — composite quality score gate
    repetitive    — Gopher repetition rules (distinct-word / top-bigram /
                    dup-trigram fractions)
    lm_outlier    — corpus unigram-LM mean logprob below threshold
                    (CCNet perplexity analog)
    contaminated  — shares a word n-gram with the eval slice
                    (benchmark decontamination)
    kept          — survives every gate; the training corpus

Signals are computed over the INPUT corpus (not re-derived per surviving
subset) — the standard practice, and what keeps this ONE bounded set of
joins: the dedup/quality features fuse into one windowed projection
(textstats.clean_corpus), repetition is in-row, the LM table and eval
shingles broadcast. Near-duplicate (MinHash-LSH) removal composes after
this cascade via dedup.minhash_lsh_candidates + exact verify; it is kept
out of the audited cascade because candidate-bucket recall is
probabilistic where every verdict above is exact.

Default thresholds are the published ones (Gopher repetition cuts,
CCNet-style LM tail); callers tune per corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from honeywell_search_engine_spark.operators.dedup import decontaminate
from honeywell_search_engine_spark.operators.textstats import (
    clean_corpus,
    repetition_scores,
    unigram_logprob,
)

REASON_ORDER = [
    "contaminated",
    "duplicate",
    "eval_heldout",
    "kept",
    "lm_outlier",
    "low_quality",
    "non_english",
    "repetitive",
    "too_short",
]


def curate_verdicts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_docids: tuple = (),
    min_quality: float = 0.5,
    min_words: int = 20,
    min_distinct_word_frac: float = 0.2,
    max_top_bigram_frac: float = 0.18,
    max_dup_trigram_frac: float = 0.3,
    min_lm_logprob: float = -6.0,
    ngram_n: int = 4,
) -> DataFrame:
    """(docid, reason, keep) — one verdict per input document, fixed
    cascade order as documented in the module docstring."""
    base = clean_corpus(
        docs, id_col, text_col, min_quality=min_quality, min_words=min_words
    ).select("docid", F.col("reason").alias("_base"))
    rep = repetition_scores(docs, id_col, text_col).select(
        "docid",
        (
            (F.col("distinct_word_frac") < min_distinct_word_frac)
            | (F.col("top_bigram_frac") > max_top_bigram_frac)
            | (F.col("dup_trigram_frac") > max_dup_trigram_frac)
        ).alias("_rep_bad"),
    )
    lm = unigram_logprob(docs, id_col, text_col).select(
        "docid", (F.col("lp_r") < min_lm_logprob).alias("_lm_bad")
    )
    ev = [int(i) for i in eval_docids]
    if ev:
        cont = decontaminate(docs, ev, id_col, text_col, n=ngram_n).select(
            "docid", F.lit(True).alias("_cont")
        )
    else:
        cont = None

    v = base.join(rep, "docid", "left").join(lm, "docid", "left")
    if cont is not None:
        v = v.join(cont, "docid", "left")
    else:
        v = v.withColumn("_cont", F.lit(None).cast("boolean"))
    reason = (
        F.when(F.col("docid").isin(ev) if ev else F.lit(False), F.lit("eval_heldout"))
        .when(F.col("_base") != "kept", F.col("_base"))
        .when(F.coalesce(F.col("_rep_bad"), F.lit(False)), F.lit("repetitive"))
        .when(F.coalesce(F.col("_lm_bad"), F.lit(False)), F.lit("lm_outlier"))
        .when(F.coalesce(F.col("_cont"), F.lit(False)), F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    return v.select(
        F.col("docid").cast("long").alias("docid"),
        reason.alias("reason"),
        (reason == "kept").alias("keep"),
    ).orderBy("docid")


def curation_audit(docs: DataFrame, **kw) -> DataFrame:
    """(reason, n_docs) — the per-stage removal ledger, ordered by reason.
    Sum of n_docs == input row count (every doc verdicted exactly once)."""
    return (
        curate_verdicts(docs, **kw)
        .groupBy("reason")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("reason")
    )


def curated_corpus(docs: DataFrame, id_col: str = "doc_id", **kw) -> DataFrame:
    """The surviving training corpus: input rows whose verdict is kept."""
    keep = curate_verdicts(docs, id_col=id_col, **kw).filter(F.col("keep"))
    return docs.join(
        keep.select(F.col("docid").alias(id_col)), id_col, "left_semi"
    )
