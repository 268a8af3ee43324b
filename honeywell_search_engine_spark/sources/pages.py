"""Synthetic Common-Crawl-style `pages` corpus (the north-rule input table).

Schema is exactly BASELINE.json `input_hint`:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Generation is fully deterministic (seed folded per-row, independent of
generation order and partition layout, FIXTURES.md §1):

- 5,000-term Zipfian vocabulary (s = 1.07) so head terms land in >30% of
  docs — drives the salted-shuffle skew path of the index build;
- per-doc token count ~ lognormal(mu=5.3, sigma=0.6) (median ≈ 200);
- marker terms planted in known docs for exact-hit assertions;
- mixed case, punctuation, multi-space runs, boilerplate header/footer
  lines ("page N", "N / M", "Confidential"), hyphen-broken words, HTML
  entities and non-printables, so the extract/clean/normalize path
  (reference semantics backend/app/worker/tasks.py:64-71,120-133) is
  load-bearing;
- `text` is the ground truth: by construction it equals
  ``extract_text(html)``; the Spark Arrow-UDF path must reproduce it
  byte-identically per url (the input_hint invariant).
"""

from __future__ import annotations

import datetime as dt
import hashlib

import numpy as np
import pandas as pd

from honeywell_search_engine_spark.functions.analyzer import extract_text

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.07
N_MARKERS = 8

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_CONS = "bcdfghjklmnpqrstvwz"
_VOWS = "aeiou"

_CATEGORIES = ["news", "tech", "science", "sports", "culture", "travel", "health"]

# distinctive lead words so head terms are human-recognizable in queries
_HEAD_WORDS = [
    "data", "search", "index", "spark", "query", "engine", "document",
    "page", "web", "crawl", "term", "score", "rank", "text", "token",
]


def _word(i: int) -> str:
    """Deterministic pseudo-word for vocab slot i (len >= 3, non-stopword)."""
    if i < len(_HEAD_WORDS):
        return _HEAD_WORDS[i]
    n, parts = i, []
    for _ in range(3):
        parts.append(_CONS[n % len(_CONS)])
        n //= len(_CONS)
        parts.append(_VOWS[n % len(_VOWS)])
        n //= len(_VOWS)
    w = "".join(parts)
    # 3 CV pairs = 6 chars: always len>=3; stopwords are all <=5 chars and
    # none match the CV-CV-CV shape with this alphabet, but guard anyway.
    return w + "x" if w in {"the", "and"} else w


def vocabulary() -> list[str]:
    return [_word(i) for i in range(VOCAB_SIZE)]


def marker_term(k: int) -> str:
    return f"zyxqv{k}marker"


def _zipf_probs() -> np.ndarray:
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    p = ranks ** (-ZIPF_S)
    return p / p.sum()


def _doc_rng(i: int) -> np.random.Generator:
    # per-row seed folded from (SEED, i): order/partition independent
    h = hashlib.sha256(f"{SEED}:{i}".encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "little"))


_STOP_FILLER = ["the", "of", "and", "is", "in", "to", "on", "for", "by"]


def _render_body(tokens: list[str], rng: np.random.Generator) -> str:
    """Decorate plain tokens with case/punct/stopword noise (vectorized)."""
    n = len(tokens)
    r = rng.integers(0, 20, size=n)
    r2 = rng.integers(0, 12, size=n)
    fill = rng.integers(0, len(_STOP_FILLER), size=n)
    out = []
    for j, t in enumerate(tokens):
        if r[j] == 0:
            t = t.upper()
        elif r[j] == 1:
            t = t.capitalize()
        if r2[j] == 0:
            t += ","
        elif r2[j] == 1:
            t += "."
        out.append(t)
        if r2[j] == 2:
            out.append(_STOP_FILLER[fill[j]])
    return " ".join(out)


def _gen_rows(ids, vocab: np.ndarray, probs: np.ndarray, seed: int) -> pd.DataFrame:
    """Generate rows for the given doc ids — each row depends only on its id
    (per-row folded seed), so this function is trivially shardable across
    executors with no coordination."""
    rows = []
    epoch = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    cum = np.cumsum(probs)
    for i in ids:
        i = int(i)
        rng = _doc_rng(i)
        doclen = int(np.clip(rng.lognormal(5.3, 0.6), 8, 4000))
        # inverse-CDF sampling (searchsorted) — much faster than choice(p=...)
        idx = np.searchsorted(cum, rng.random(doclen), side="right")
        toks = list(vocab[idx])
        # plant marker terms: doc i gets marker k iff i % 97 == k * 7
        for k in range(N_MARKERS):
            if i % 97 == k * 7:
                toks.insert(int(rng.integers(0, len(toks))), marker_term(k))
        body = _render_body(toks, rng)
        # split into paragraphs of ~40 words
        words = body.split(" ")
        paras = [" ".join(words[p : p + 40]) for p in range(0, len(words), 40)]
        title = " ".join(toks[:3]).title()
        boiler_top = f"page {1 + i % 9}\n" if i % 3 == 0 else ""
        boiler_mid = "Confidential\n" if i % 5 == 0 else ""
        boiler_num = f"{1 + i % 9} / 12\n" if i % 4 == 0 else ""
        hyphen = "hyphen- ated data- driven\n" if i % 6 == 0 else ""
        nonprint = "\x01\x02" if i % 7 == 0 else ""
        html_doc = (
            "<html><head><title>{t}</title>"
            "<style>body {{ color: red }}</style>"
            "<script>var tracking = 1;</script></head><body>\n"
            "{bt}{bm}"
            "<h1>{t} &amp; more</h1>\n{np_}"
            + "\n".join(f"<p>{p}</p>" for p in paras)
            + "\n{bn}{hy}</body></html>"
        ).format(t=title, bt=boiler_top, bm=boiler_mid, np_=nonprint,
                 bn=boiler_num, hy=hyphen)
        html_bytes = html_doc.encode("utf-8")
        h = hashlib.sha256(f"{seed}:url:{i}".encode()).hexdigest()[:16]
        url = f"https://site{i % 211}.example.com/{_CATEGORIES[i % len(_CATEGORIES)]}/{h}"
        lang = "en" if i % 20 != 19 else ("de" if i % 40 == 19 else "fr")
        rows.append(
            {
                "url": url,
                "warc_ts": epoch + dt.timedelta(seconds=137 * i),
                "html": html_bytes,
                "text": extract_text(html_bytes),
                "lang": lang,
            }
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def generate_pages_pdf(n_docs: int, seed: int = SEED) -> pd.DataFrame:
    """Generate the corpus as a pandas DataFrame (deterministic, driver-side;
    for large n use write_pages_table_spark)."""
    vocab = np.array(vocabulary())
    probs = _zipf_probs()
    return _gen_rows(np.arange(n_docs), vocab, probs, seed)


def _arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )


def write_pages_table(path: str, n_docs: int, seed: int = SEED) -> None:
    """Write the corpus as a single parquet file (test scales).

    Iceberg-shaped; plain-parquet fallback per SURVEY.md §7 — the Iceberg
    runtime jar is not in this sandbox, so the reader is kept behind
    ``read_pages``.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = generate_pages_pdf(n_docs, seed)
    table = pa.Table.from_pandas(pdf, schema=_arrow_schema(), preserve_index=False)
    pq.write_table(table, path, row_group_size=8192)


def write_pages_table_spark(
    spark, path: str, n_docs: int, seed: int = SEED, partitions: int = 32
) -> None:
    """Distributed corpus generation: spark.range over doc ids ->
    mapInPandas generator (each row a pure function of its id) -> parquet
    directory. Scales linearly with executors; used for sf-bench."""
    from pyspark.sql import functions as F  # noqa: F401

    def gen(batches):
        vocab = np.array(vocabulary())
        probs = _zipf_probs()
        for b in batches:
            yield _gen_rows(b["id"].to_numpy(), vocab, probs, seed)

    (
        spark.range(0, n_docs, 1, partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
        .write.mode("overwrite")
        .parquet(path)
    )


def iceberg_available(spark) -> bool:
    """True iff the Iceberg Spark runtime jar is on the session classpath
    (probe once per JVM; the sandbox container ships without it)."""
    if not hasattr(iceberg_available, "_memo"):
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.source.IcebergSource"
            )
            iceberg_available._memo = True
        except Exception:
            iceberg_available._memo = False
    return iceberg_available._memo


def read_pages(spark, path: str):
    """Single entry point for the corpus scan.

    `path` is either a filesystem parquet directory (sandbox/testdata) or
    an Iceberg table identifier written as ``iceberg:<catalog.db.table>``
    — the form the input_hint's Common-Crawl pages table takes on a real
    cluster. The Iceberg branch needs the runtime jar (iceberg_available);
    Catalyst pushes the same lang/column pruning into either scan, and
    with Iceberg it additionally prunes partitions/files via the table's
    metadata tree. Lineage: segments.input_fingerprint uses the current
    SNAPSHOT ID for Iceberg inputs and a file listing for parquet."""
    if path.startswith("iceberg:"):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg table requested but the Iceberg Spark runtime jar "
                "is not on the classpath"
            )
        return spark.read.table(path[len("iceberg:"):])
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def reference_queries() -> dict[str, str]:
    """The fixed 20-query reference set (FIXTURES.md §3)."""
    v = vocabulary()
    return {
        # q01-q05: single head terms (giant postings, skew/salting path)
        "q01": v[0],
        "q02": v[1],
        "q03": v[2],
        "q04": v[3],
        "q05": v[4],
        # q06-q09: planted tail marker terms (exact known docid sets)
        "q06": marker_term(0),
        "q07": marker_term(1),
        "q08": marker_term(3),
        "q09": marker_term(5),
        # q10-q13: 2-3 term conjunctions (AND semantics)
        "q10": f"{v[0]} {v[1]}",
        "q11": f"{v[5]} {v[6]}",
        "q12": f"{v[2]} {v[7]} {v[9]}",
        "q13": f"{v[30]} {v[31]}",
        # q14-q15: head + tail mix (selective intersection, block skipping)
        "q14": f"{v[0]} {v[4000]}",
        "q15": f"{v[1]} {marker_term(2)}",
        # q16: stopword-heavy
        "q16": f"the of and {v[0]}",
        # q17: punctuation/case noise (same terms as q10 after normalization)
        "q17": f"{v[0].title()},, {v[1].upper()}!!",
        # q18: no-hit term
        "q18": "qqqqnohitterm",
        # q19: all stopwords -> empty term list -> empty result
        "q19": "the of and",
        # q20: >12 distinct terms (term-cap behavior)
        "q20": " ".join(v[100:115]),
    }
