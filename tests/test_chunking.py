"""Chunking kernel semantics (reference chunking.py behaviors) + Spark parity."""

from honeywell_search_engine_spark.functions import chunking as K


def test_token_count_fallback():
    # int(words / 0.75) — reference chunking.py:41-43
    assert K.count_tokens("a b c") == 4
    assert K.count_tokens("") == 0
    assert K.count_tokens("one") == 1


def test_sentence_split():
    s = K.sentences_of("First sentence. Second one here! Third? Yes indeed.")
    assert s == ["First sentence.", "Second one here!", "Third?", "Yes indeed."]
    # tiny fragments dropped; all-tiny -> whole text
    assert K.sentences_of("Hi. Yo.") == ["Hi. Yo."]
    assert K.sentences_of("") == []


def test_paragraphs():
    assert K.paragraphs_of("a\n\nb\n \n\nc") == ["a", "b", "c"]


def test_window_split():
    words = " ".join(f"w{i}" for i in range(100))
    parts = K.window_split(words, 10)  # step = 7 words
    assert all(len(p.split()) <= 7 for p in parts)
    assert " ".join(parts) == words


def test_pack_sentences_overlap():
    sents = [f"Sentence number {i} has exactly six words." for i in range(10)]
    per = K.count_tokens(sents[0])
    packed = K.pack_sentences(sents, per * 2 + 1, overlap=1)
    # every chunk after the first starts with the previous chunk's last sentence
    for a, b in zip(packed, packed[1:]):
        last_sent_of_a = a.rsplit(".", 2)[-2].strip() + "."
        assert b.startswith(last_sent_of_a)


def test_absorb_small():
    out = K.absorb_small(["tiny", "also tiny", "x " * 200], min_tokens=50)
    assert len(out) < 3


def test_small_doc_single_parent_is_own_child():
    rows = list(K.chunk_rows("A short document. Nothing fancy here."))
    kinds = [r[0] for r in rows]
    assert kinds == ["PARENT", "CHILD"]
    assert rows[0][3] == rows[1][3]  # identical text (chunking.py:279-289)


def test_large_doc_hierarchy():
    paras = []
    for p in range(6):
        paras.append(
            " ".join(
                f"Para {p} sentence {s} holds some words to count." for s in range(40)
            )
        )
    text = "\n\n".join(paras)
    rows = list(K.chunk_rows(text))
    parents = [r for r in rows if r[0] == "PARENT"]
    children = [r for r in rows if r[0] == "CHILD"]
    assert len(parents) >= 2 and len(children) > len(parents)
    # every parent within limits after merge; children within child limit
    for _, _, _, t, n in parents:
        assert n <= K.PARENT_MAX + K.PARENT_MIN  # merge can exceed max slightly
    for _, p, c, t, n in children:
        assert n <= K.CHILD_MAX
        assert 0 <= p < len(parents)
    # children of each parent cover the parent's sentences (first/last match)
    p0_children = [r for r in children if r[1] == 0]
    assert p0_children[0][3].split()[0] == parents[0][3].split()[0]


def test_spark_parity(spark, pages_pdf):
    from honeywell_search_engine_spark.operators.chunking import chunk_documents

    sample = pages_pdf.head(40)[["url", "text"]]
    df = spark.createDataFrame(sample)
    got = chunk_documents(df, "url", "text").collect()
    by_url = {}
    for r in got:
        by_url.setdefault(r["docid"], []).append(
            (r["kind"], r["parent_idx"], r["child_idx"], r["chunk_text"], r["tokens"])
        )
    for _, row in sample.iterrows():
        exp = list(K.chunk_rows(row.text))
        assert by_url.get(row.url, []) == exp, row.url
