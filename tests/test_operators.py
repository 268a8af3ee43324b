"""Operator unit tests on synthetic micro-inputs where the testdata is
degenerate (no exact dupes exist in the driver tables)."""

from pyspark.sql import functions as F


def test_exact_duplicates_finds_groups(spark):
    from honeywell_search_engine_spark.operators.dedup import exact_duplicates

    df = spark.createDataFrame(
        [
            (1, "Same Text here!"),
            (2, "same text  HERE"),   # normalizes identically
            (3, "different entirely"),
            (4, "same, text. here"),
        ],
        "doc_id long, text string",
    )
    groups = exact_duplicates(df, "doc_id", "text").collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["n_dupes"] == 3 and g["keep_docid"] == 1
    assert list(g["dupe_docids"]) == [1, 2, 4]


def test_lsh_candidates_catch_near_dupes(spark):
    from honeywell_search_engine_spark.operators.dedup import minhash_lsh_candidates

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    near = base.replace("kappa", "lambda", 1)  # one token changed
    far = "completely different words nothing shared at all " * 8
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = {
        (r["docid_a"], r["docid_b"])
        for r in minhash_lsh_candidates(df, "doc_id", "text").collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_hamming_close_for_near_dupes(spark):
    from honeywell_search_engine_spark.operators.dedup import simhash64

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    near = base.replace("kappa", "lambda", 1)
    far = "completely different words nothing shared at all " * 8
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    h = {r["docid"]: r["simhash"] for r in simhash64(df, "doc_id", "text").collect()}

    def ham(a, b):
        return bin((a & (2**64 - 1)) ^ (b & (2**64 - 1))).count("1")

    assert ham(h[1], h[2]) <= 8
    assert ham(h[1], h[3]) > 16


def test_match_phrase_inflight(spark):
    from honeywell_search_engine_spark.operators.search import match_phrase

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta"),   # 'alpha beta' x2
            (2, "beta alpha gamma"),              # reversed -> no
            (3, "alpha gamma beta"),              # gap -> no
            (4, "alpha alpha beta"),              # x1 (second alpha starts it)
        ],
        "doc_id long, text string",
    )
    got = {r["docid"]: r["n_occ"] for r in match_phrase(docs, "alpha beta").collect()}
    assert got == {1: 2, 4: 1}
    # repeated-term phrase
    got2 = {r["docid"]: r["n_occ"] for r in match_phrase(docs, "alpha alpha").collect()}
    assert got2 == {4: 1}
    # stopwords are removed before adjacency (tsquery-after-analyzer semantics)
    docs2 = spark.createDataFrame([(9, "alpha of the beta")], "doc_id long, text string")
    got3 = {r["docid"]: r["n_occ"] for r in match_phrase(docs2, "alpha beta").collect()}
    assert got3 == {9: 1}


def test_simhash_candidates_pigeonhole(spark):
    """Banding recall: any pair within bands-1 bit flips MUST surface
    (pigeonhole: 4 bands, <=3 flips leave an intact band); reported
    hamming is exact."""
    from honeywell_search_engine_spark.operators.dedup import simhash_candidates

    base = "spark merges data tables quickly across wide clusters " * 6
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                             # identical -> hamming 0
            (3, base + " extra trailing clause"),  # near-dup -> small hamming
            (4, "completely different content about gardening and soil"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["docid_a"], r["docid_b"]): r["hamming"]
        for r in simhash_candidates(docs, "doc_id", "text", max_hamming=10).collect()
    }
    assert rows[(1, 2)] == 0
    assert (1, 3) in rows and 0 < rows[(1, 3)] <= 10
    assert not any(4 in p for p in rows)


def test_decontaminate_semantics(spark):
    """decontaminate: planted-overlap fixture — docs sharing an n-gram with
    the eval set are flagged with the exact distinct-shingle hit count;
    eval docs never appear; disjoint docs never appear."""
    from honeywell_search_engine_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),        # eval
            (1, "one two three four five six"),                # eval
            (10, "xx alpha beta gamma delta yy"),              # 1 shared 4-gram
            (11, "one two three four five prime"),             # 2 shared
            (12, "totally unrelated words here none match"),   # clean
            (13, "alpha beta gamma delta epsilon tail"),       # 2 shared
        ],
        "doc_id long, text string",
    )
    got = {
        r["docid"]: r["n_hits"]
        for r in decontaminate(docs, [0, 1], "doc_id", "text", n=4).collect()
    }
    assert got == {10: 1, 11: 2, 13: 2}


def test_hot_shingle_cap_bounds_candidates(spark):
    """Planted boilerplate: every doc shares one hot line. Uncapped, the
    hot shingles alone make ALL pairs candidates (quadratic bucket);
    with max_shingle_df the hot shingles are dropped before the self-join
    and only genuinely-overlapping pairs survive."""
    from honeywell_search_engine_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingles,
    )

    boiler = "all rights reserved contact us for details"
    rows = [(i, f"unique{i}a word{i}b token{i}c " + boiler) for i in range(40)]
    # two genuine near-dupes sharing real content
    rows += [(100, "alpha beta gamma delta epsilon zeta " + boiler),
             (101, "alpha beta gamma delta epsilon eta " + boiler)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh = shingles(docs, "doc_id", "text", 3)
    hot_df = (
        sh.groupBy("shingle").count().filter(F.col("count") > 10).count()
    )
    assert hot_df > 0  # the boilerplate shingles really are hot

    # uncapped: every pair shares a boilerplate shingle -> 42*41/2 = 861
    # candidate pairs enter the join (jaccard filter hides most after the
    # quadratic work is already done)
    capped = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.3, max_shingle_df=10
    ).collect()
    uncapped = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.3
    ).collect()

    got_capped = {(r["docid_a"], r["docid_b"]) for r in capped}
    got_uncapped = {(r["docid_a"], r["docid_b"]) for r in uncapped}
    # the genuine near-dup pair survives the cap (their real-content
    # overlap alone clears the threshold on filtered shingle sets)
    assert (100, 101) in got_capped
    # uncapped, boilerplate-only overlap drags unrelated docs over the
    # threshold; the cap removes exactly those
    assert got_capped < got_uncapped


def test_minhash_bucket_cap_drops_giant_buckets(spark):
    """A template cluster (identical text) fills one band bucket; with
    max_bucket the bucket is dropped, distinct near-dupes still pair."""
    from honeywell_search_engine_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    rows = [(i, "identical template page body content here") for i in range(30)]
    # a genuine (small) duplicate pair: identical text -> identical
    # signature -> all bands match; its bucket of 2 survives the cap
    rows += [(200, "completely different story about rivers and stones"),
             (201, "completely different story about rivers and stones")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = minhash_lsh_candidates(docs, "doc_id", "text").collect()
    capped = minhash_lsh_candidates(
        docs, "doc_id", "text", max_bucket=8
    ).collect()
    up = {(r["docid_a"], r["docid_b"]) for r in uncapped}
    cp = {(r["docid_a"], r["docid_b"]) for r in capped}
    assert len(up) >= 30 * 29 // 2  # quadratic template bucket
    assert (200, 201) in cp  # real near-dupes still found
    assert all(a >= 200 for a, _ in cp)  # template pairs gone
    assert len(cp) < len(up)


def test_unigram_logprob_flags_unusual_docs(spark):
    """Docs made of corpus-rare tokens score lower mean logprob than docs
    made of corpus-common tokens (the CCNet LM-quality signal direction)."""
    from honeywell_search_engine_spark.operators.textstats import unigram_logprob

    rows = [(i, "common words appear everywhere always") for i in range(20)]
    rows += [(100, "common words appear everywhere always"),
             (101, "zyx qqv jjw unique gibberish tokens")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lp = {r["docid"]: r["lp_r"] for r in unigram_logprob(docs, "doc_id", "text").collect()}
    assert lp[101] < lp[100]  # rare-token doc is the filter candidate
    assert lp[100] == lp[0]  # identical docs, identical score


def test_match_near_unordered_semantics(spark):
    from honeywell_search_engine_spark.operators.search import (
        match_near,
        match_near_unordered,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),            # adjacent, in order
            (2, "beta alpha"),            # adjacent, reversed
            (3, "alpha xxx1 yyy1 zzz1 www1 beta"),   # filtered distance 5 > 3
            (4, "beta filler alpha"),     # filtered distance 2, reversed
            (5, "alpha only here"),
        ],
        "doc_id long, text string",
    )
    un = {r["docid"]: r["n_hits"] for r in
          match_near_unordered(docs, "alpha beta", dist=3).collect()}
    assert un == {1: 1, 2: 1, 4: 1}
    # ordered-NEAR with the same window only accepts alpha-before-beta
    od = {r["docid"] for r in match_near(docs, "alpha beta", slop=2).collect()}
    assert od == {1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        match_near_unordered(docs, "alpha beta gamma")


def test_quadratic_guards_on_by_default(spark):
    """Round-4 verdict item 3: the hot-shingle / hot-bucket caps must bind
    with DEFAULT arguments — a planted boilerplate cluster larger than the
    cap produces bounded candidates without any caller opt-in."""
    from honeywell_search_engine_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    # 1100 identical template docs -> identical minhash signature -> every
    # band bucket holds 1100 > max_bucket default (1024) -> dropped; the
    # two genuine near-dupes (bucket of 2) still pair.
    rows = [(i, "identical template page body content here") for i in range(1100)]
    rows += [
        (2000, "completely different story about rivers and stones"),
        (2001, "completely different story about rivers and stones"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cp = {
        (r["docid_a"], r["docid_b"])
        for r in minhash_lsh_candidates(docs, "doc_id", "text").collect()
    }
    assert cp == {(2000, 2001)}

    # 600 docs sharing ONE boilerplate shingle (df=600 > max_shingle_df
    # default 512) plus unique filler: with defaults the hot shingle is
    # dropped pre-join, so no boilerplate-only pair can form.
    jrows = [
        (i, f"standard footer boilerplate line unique{i} filler{i} words{i}")
        for i in range(600)
    ]
    jdocs = spark.createDataFrame(jrows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(jdocs, "doc_id", "text", n=3, threshold=0.1).collect()
    assert pairs == []


def test_pairwise_cosine_dupes_unbounded_raises(spark):
    """Round-4 verdict item 4: the exact all-pairs function must refuse an
    unbounded large input instead of silently cartesianing it."""
    import pytest as _pytest

    from honeywell_search_engine_spark.operators.similarity import (
        pairwise_cosine_dupes,
    )

    emb = spark.range(0, 50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with _pytest.raises(ValueError, match="all-pairs"):
        pairwise_cosine_dupes(emb, threshold=0.9, max_rows=10)
    # bounded calls still work: via max_rows headroom or max_id slice
    assert pairwise_cosine_dupes(emb, threshold=0.9).count() > 0
    assert pairwise_cosine_dupes(emb, threshold=0.9, max_id=5).count() > 0
