"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure JVM column expressions (whole-stage codegen; zero Python) so they
hold up on a 100 TB corpus: no shuffle at all — these are embarrassingly
parallel per-row maps that Catalyst fuses into the scan.
"""

from __future__ import annotations

import string

from pyspark.sql import DataFrame, functions as F

from honeywell_search_engine_spark.functions.analyzer import STOPWORDS

_PUNCT = string.punctuation

# 30 high-frequency English function words (language-ID signal)
EN_FUNCTION_WORDS = sorted(
    STOPWORDS
    | {"a", "an", "that", "this", "it", "as", "at", "be", "has", "have", "not", "but"}
)


def _tokens_ws(text_col):
    """Whitespace tokens (token-count semantics of the reference's fallback
    `words/0.75` counter, chunking.py:22-43 — whitespace words, no filter).
    regexp_extract_all (not split) so empty text yields 0 tokens, matching
    SQL semantics."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(F.trim(c), F.lit(r"\S+"), F.lit(0))


def _tokens_word(text_col):
    """Word tokens: [a-z0-9]+ on lowercase (analyzer T3 without the
    stopword/minlen filter)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(F.lower(c), F.lit("[a-z0-9]+"), F.lit(0))


def token_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(docid, ws_tokens, word_tokens, bpe_est): whitespace count, regex
    word count, and a BPE-ish estimate (ceil(chars/4) — the usual ~4
    chars/token heuristic, cf. reference token fallback words/0.75)."""
    return docs.select(
        F.col(id_col).alias("docid"),
        F.size(_tokens_ws(text_col)).alias("ws_tokens"),
        F.size(_tokens_word(text_col)).alias("word_tokens"),
        F.ceil(F.length(F.col(text_col)) / F.lit(4.0)).cast("long").alias("bpe_est"),
    )


def quality_scores(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality features + composite score (rounded 1e-6):
    length, punctuation ratio, stopword ratio, mean word length.
    Score = heuristic in [0,1]: rewards mid-length docs with a natural
    stopword share and low punctuation density."""
    c = F.col(text_col)
    words = _tokens_word(text_col)
    n_words = F.size(words)
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*EN_FUNCTION_WORDS))
    )
    n_punct = F.length(c) - F.length(F.translate(c, _PUNCT, ""))
    # Σ length(w) via length(array_join): same integer, fully codegen'd —
    # the aggregate() HOF is CodegenFallback (interpreted per row; r7,
    # ~1.6× on this column at driver scale)
    total_wchars = F.length(F.array_join(words, "")).cast("long")
    nw = n_words.cast("double")
    stop_ratio = F.when(n_words > 0, n_stop / nw).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.length(c) > 0, n_punct.cast("double") / F.length(c)
    ).otherwise(F.lit(0.0))
    mean_wlen = F.when(n_words > 0, total_wchars / nw).otherwise(F.lit(0.0))
    len_score = F.least(nw / F.lit(100.0), F.lit(1.0))
    stop_score = F.lit(1.0) - F.least(
        F.abs(stop_ratio - F.lit(0.3)) / F.lit(0.3), F.lit(1.0)
    )
    punct_score = F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0))
    score = (
        F.lit(0.4) * len_score + F.lit(0.4) * stop_score + F.lit(0.2) * punct_score
    )
    return docs.select(
        F.col(id_col).alias("docid"),
        n_words.alias("n_words"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(mean_wlen, 6).alias("mean_wlen"),
        F.round(score, 6).alias("quality"),
    )


def langid_en(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: share of tokens that are English function
    words; is_en = ratio >= 0.05. (n-gram-free variant that is exactly
    SQL-expressible for the oracle; a char-trigram scorer would be the
    production upgrade.)"""
    words = _tokens_word(text_col)
    n_words = F.size(words)
    n_en = F.size(F.filter(words, lambda w: w.isin(*EN_FUNCTION_WORDS)))
    ratio = F.when(n_words > 0, n_en.cast("double") / n_words.cast("double")).otherwise(
        F.lit(0.0)
    )
    return docs.select(
        F.col(id_col).alias("docid"),
        F.round(ratio, 6).alias("en_ratio"),
        (ratio >= 0.05).alias("is_en"),
    )


def fingerprints(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic document fingerprints:
    - norm_md5: md5 of the normalized text (lowercase, punctuation deleted,
      whitespace collapsed — analyzer T1 semantics, JVM-side);
    - sim64: a 60-bit content fingerprint from the md5 hex (cheap stand-in
      for a rolling hash; stable across engines)."""
    c = F.col(text_col)
    norm = F.trim(
        F.regexp_replace(F.translate(F.lower(c), _PUNCT, ""), r"\s+", " ")
    )
    md5 = F.md5(norm)
    return docs.select(
        F.col(id_col).alias("docid"),
        md5.alias("norm_md5"),
        F.conv(F.substring(md5, 1, 15), 16, 10).cast("long").alias("fp60"),
    )


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    min_words: int = 20,
) -> DataFrame:
    """The composed training-data cleaning pipeline as ONE lazy plan:
    exact-dedup (keep the min-docid copy per normalized-content hash) ->
    language gate -> length gate -> quality gate. Every doc gets a verdict:
    (docid, keep boolean, reason in {kept, duplicate, non_english,
    too_short, low_quality}) — the first failing gate names the reason
    (dedup wins over language over length over quality, a fixed audit
    order).

    Shuffle profile: ONE exchange (the window over the content hash); the
    quality/langid features are pure codegen projections fused into the
    same stage. At 100 TB this is the shape you want: no joins, no
    collect, the dedup key is a uniform 128-bit hash."""
    from pyspark.sql import Window

    c = F.col(text_col)
    norm = F.trim(
        F.regexp_replace(F.translate(F.lower(c), _PUNCT, ""), r"\s+", " ")
    )
    words = _tokens_word(text_col)
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*EN_FUNCTION_WORDS)))
    nw = n_words.cast("double")
    stop_ratio = F.when(n_words > 0, n_stop / nw).otherwise(F.lit(0.0))
    n_punct = F.length(c) - F.length(F.translate(c, _PUNCT, ""))
    punct_ratio = F.when(
        F.length(c) > 0, n_punct.cast("double") / F.length(c)
    ).otherwise(F.lit(0.0))
    len_score = F.least(nw / F.lit(100.0), F.lit(1.0))
    stop_score = F.lit(1.0) - F.least(
        F.abs(stop_ratio - F.lit(0.3)) / F.lit(0.3), F.lit(1.0)
    )
    punct_score = F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0))
    quality = (
        F.lit(0.4) * len_score + F.lit(0.4) * stop_score + F.lit(0.2) * punct_score
    )
    en_ratio = F.when(n_words > 0, n_stop.cast("double") / nw).otherwise(F.lit(0.0))

    staged = docs.select(
        F.col(id_col).cast("long").alias("docid"),
        F.md5(norm).alias("_h"),
        n_words.alias("_nw"),
        en_ratio.alias("_en"),
        quality.alias("_q"),
    )
    w = Window.partitionBy("_h").orderBy("docid")
    ranked = staged.withColumn("_rn", F.row_number().over(w))
    reason = (
        F.when(F.col("_rn") > 1, F.lit("duplicate"))
        .when(F.col("_en") < 0.05, F.lit("non_english"))
        .when(F.col("_nw") < min_words, F.lit("too_short"))
        .when(F.col("_q") < min_quality, F.lit("low_quality"))
        .otherwise(F.lit("kept"))
    )
    return ranked.select(
        "docid",
        reason.alias("reason"),
        (reason == "kept").alias("keep"),
    ).orderBy("docid")


def unigram_logprob(
    docs: DataFrame, id_col: str, text_col: str, alpha: float = 0.5
) -> DataFrame:
    """Per-doc mean token log-probability under the CORPUS unigram language
    model with add-alpha smoothing — the model-free analog of CCNet's
    LM-perplexity quality signal (low mean logprob = unusual token mix =
    boilerplate / gibberish / wrong-language candidates for filtering):

        lp(t)   = ln((ctf_t + alpha) / (T + alpha * V))
        score_d = sum_t tf_{d,t} * lp(t) / doclen_d

    where ctf = corpus term frequency, T = total tokens, V = vocabulary
    size. Returns (docid, doclen, lp_r rounded 1e-6), docs with >=1 token.

    Plan: ONE tokenize pass -> (doc, term, tf) hash-agg -> broadcast the
    per-term lp table (vocab-sized) -> per-doc ordered sum (lexicographic
    term order, the engine-wide float contract so DuckDB replays the exact
    double). Same shape as the BM25 in-flight plan; scale-safe."""
    from honeywell_search_engine_spark.operators.search import doc_term_freqs

    tf = doc_term_freqs(docs, id_col, text_col)
    tot = tf.agg(
        F.sum("tf").alias("T"), F.count_distinct("term").alias("V")
    )
    lp_tbl = (
        tf.groupBy("term")
        .agg(F.sum("tf").alias("ctf"))
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            F.log(
                (F.col("ctf").cast("double") + F.lit(alpha))
                / (F.col("T").cast("double") + F.lit(alpha) * F.col("V"))
            ).alias("lp"),
        )
    )
    return (
        tf.join(F.broadcast(lp_tbl), "term")
        .withColumn("c", F.col("tf").cast("double") * F.col("lp"))
        .groupBy("docid")
        .agg(
            F.first("doclen").alias("doclen"),
            F.sort_array(F.collect_list(F.struct("term", "c"))).alias("cs"),
        )
        .select(
            F.col("docid").cast("long").alias("docid"),
            "doclen",
            F.round(
                F.aggregate("cs", F.lit(0.0), lambda a, x: a + x["c"])
                / F.col("doclen").cast("double"),
                6,
            ).alias("lp_r"),
        )
        .orderBy("docid")
    )


def repetition_scores(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models" quality rules — the de-facto web-corpus
    repetition filter set), all computed IN-ROW with higher-order
    functions — zero shuffles, whole-stage codegen end to end:

    - n_words: word-token count ([a-z0-9]+ on lowercase, no stopword filter)
    - distinct_word_frac: |distinct words| / n_words (low = word spam)
    - top_bigram_frac: occurrences of the MOST FREQUENT word bigram /
      total bigrams (high = repeated phrase loops)
    - dup_trigram_frac: 1 - |distinct trigrams| / total trigrams
      (high = copy-paste repetition)

    Fractions rounded 1e-6; docs with 0 words emit 0 for every fraction.
    Gopher cuts: distinct_word_frac < ~0.2, top_bigram_frac > ~0.18,
    dup_trigram_frac > ~0.30 mark removal candidates."""
    words = _tokens_word(text_col)

    def grams_all(toks, n):
        # ALL n-grams (repetition needs duplicates; dedup's helper distincts)
        idx = F.when(
            F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))

    w = F.col("_w")
    bi = F.col("_bi")
    tri = F.col("_tri")
    nw = F.size(w)
    top_bi = F.array_max(
        F.transform(
            F.array_distinct(bi),
            lambda g: F.size(F.filter(bi, lambda x: x == g)),
        )
    )
    return (
        docs.select(
            F.col(id_col).alias("docid"),
            words.alias("_w"),
            grams_all(words, 2).alias("_bi"),
            grams_all(words, 3).alias("_tri"),
        )
        .select(
            F.col("docid").cast("long").alias("docid"),
            nw.alias("n_words"),
            F.round(
                F.when(
                    nw > 0,
                    F.size(F.array_distinct(w)).cast("double") / nw.cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("distinct_word_frac"),
            F.round(
                F.when(
                    F.size(bi) > 0,
                    top_bi.cast("double") / F.size(bi).cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("top_bigram_frac"),
            F.round(
                F.when(
                    F.size(tri) > 0,
                    F.lit(1.0)
                    - F.size(F.array_distinct(tri)).cast("double")
                    / F.size(tri).cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_trigram_frac"),
        )
        .orderBy("docid")
    )


def source_stats(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", source_col: str = "source") -> DataFrame:
    """Per-source curation stats — the domain-level aggregation a crawl
    pipeline runs before per-doc filtering (drop/duplicate-heavy domains
    first, then row-level ops): (source, n_docs, n_distinct, dup_frac_r,
    avg_chars_r). Exact-dup detection = md5 of normalized text (same
    normalization as dedup.exact_duplicates). One shuffle (the groupBy)."""
    from honeywell_search_engine_spark.operators.dedup import _norm_text

    return (
        docs.select(
            F.col(source_col).alias("source"),
            F.md5(_norm_text(text_col)).alias("h"),
            F.length(text_col).alias("nc"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("h").alias("n_distinct"),
            F.round(F.avg(F.col("nc").cast("double")), 6).alias("avg_chars_r"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct",
            F.round(
                F.lit(1.0)
                - F.col("n_distinct").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_frac_r"),
            "avg_chars_r",
        )
        .orderBy("source")
    )
