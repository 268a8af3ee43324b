"""Curation cascade (operators/curation.py): one verdict per doc, fixed
precedence, audit sums to input count, curated_corpus = kept rows."""

from honeywell_search_engine_spark.operators import curation


def _docs(spark):
    en = (
        "the quick brown fox jumps over the lazy dog while it was running "
        "through the green field and the sun was shining over all of them "
    )
    rows = [
        (0, en + "eval document zero"),                     # eval_heldout
        (1, en + "eval document one"),                      # eval_heldout
        (10, en + "a perfectly normal english document with plenty of words"),
        (11, en + "a perfectly normal english document with plenty of words"),  # duplicate of 10
        (12, "xq zr wf bn pk qv mm ll zz xx cc vv bb nn aa ss dd ff gg hh "
             "jj kk qq ww ee rr tt yy uu ii oo pp zz xx cc vv bb"),  # non_english
        (13, "the and of to"),                              # too_short
        (14, en + "spam spam spam spam spam spam spam spam spam spam spam "
             "spam spam spam spam spam spam spam spam spam spam spam"),  # repetitive
        (15, en + "eval document zero and more shared words following it"),  # contaminated
        (16, en + "another clean document that should simply be kept here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cascade_verdicts_and_precedence(spark):
    docs = _docs(spark)
    v = {
        r["docid"]: r["reason"]
        for r in curation.curate_verdicts(
            docs,
            eval_docids=(0, 1),
            min_quality=0.2,
            min_words=10,
            ngram_n=4,
        ).collect()
    }
    assert v[0] == v[1] == "eval_heldout"
    assert v[10] == "kept" or v[10] == "contaminated"  # shares en prefix 4-grams w/ eval
    assert v[11] == "duplicate"  # dedup outranks contamination
    assert v[12] == "non_english"
    assert v[13] == "too_short"
    assert v[14] == "repetitive"
    assert v[15] == "contaminated"


def test_audit_sums_to_input(spark):
    docs = _docs(spark)
    audit = curation.curation_audit(
        docs, eval_docids=(0, 1), min_quality=0.2, min_words=10
    ).collect()
    assert sum(r["n_docs"] for r in audit) == docs.count()


def test_curated_corpus_is_kept_rows(spark):
    docs = _docs(spark)
    verdicts = curation.curate_verdicts(
        docs, eval_docids=(0, 1), min_quality=0.2, min_words=10
    )
    kept_ids = {r["docid"] for r in verdicts.filter("keep").collect()}
    got_ids = {
        r["doc_id"]
        for r in curation.curated_corpus(
            docs, eval_docids=(0, 1), min_quality=0.2, min_words=10
        ).collect()
    }
    assert got_ids == kept_ids
    assert 11 not in got_ids and 13 not in got_ids
