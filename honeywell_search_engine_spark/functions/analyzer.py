"""Analyzer kernel: clean / normalize / tokenize / extract.

This module is the single source of truth for text semantics. The same pure
functions back (a) the in-memory test oracle and (b) the vectorized
Arrow/pandas UDFs used by the Spark engine, so the engine-vs-oracle
byte-identity contract holds by construction and is verified by tests.

Semantics reproduced from the reference implementation (not copied — the
reference is a FastAPI worker; this is a columnar kernel):

- ``normalize_text``: lowercase -> delete ASCII punctuation -> collapse
  whitespace -> strip  (reference: backend/app/worker/tasks.py:64-71)
- ``clean_text``: drop header/footer lines ("page N", "N/M",
  "confidential") -> strip non-printables -> re-join hyphen-broken words ->
  collapse whitespace -> strip  (reference: backend/app/worker/tasks.py:120-133)
- ``tokenize``: ``[a-zA-Z0-9]+`` on the lowercased string, drop the 18-word
  stopword list, drop tokens of length <= 2
  (reference: backend/app/routers/search.py:33-44)
- ``extract_text``: HTML bytes -> visible text (script/style removed, tags
  -> space, entities unescaped) -> ``clean_text``. Plays the role of the
  reference's PDF page extraction (backend/app/worker/tasks.py:98-117) for
  Common-Crawl-style pages; per-url byte-identical output is the contract.
"""

from __future__ import annotations

import html as _htmllib
import re
import string

import pandas as pd

# --- pure kernels (shared by oracle and engine) -----------------------------

_PUNCT_TABLE = str.maketrans("", "", string.punctuation)
_WS_RE = re.compile(r"\s+")
_HEADER_FOOTER_RE = re.compile(
    r"(^\s*page\s*\d+\s*$)|(^\s*\d+\s*/\s*\d+\s*$)|(^\s*confidential\s*$)",
    flags=re.IGNORECASE | re.MULTILINE,
)
_NON_PRINTABLE_RE = re.compile(r"[^\x09\x0A\x0D\x20-\x7E\u00A0-\uFFFF]+")
_HYPHEN_BREAK_RE = re.compile(r"(\w)-\s+(\w)")
_TOKEN_RE = re.compile(r"[a-zA-Z0-9]+")
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", flags=re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]+>")

STOPWORDS = frozenset(
    {
        "the", "is", "are", "was", "were", "of", "on", "in", "for", "to",
        "with", "using", "use", "based", "by", "and", "or", "from",
    }
)
MIN_TOKEN_LEN = 3  # reference keeps tokens with len(t) > 2
MAX_QUERY_TERMS = 12  # reference caps distinct query terms at 12 (utils.py:19)


def normalize_text(text: str) -> str:
    text = text.lower()
    text = text.translate(_PUNCT_TABLE)
    text = _WS_RE.sub(" ", text)
    return text.strip()


def clean_text(text: str) -> str:
    text = _HEADER_FOOTER_RE.sub(" ", text)
    text = _NON_PRINTABLE_RE.sub(" ", text)
    text = _HYPHEN_BREAK_RE.sub(r"\1\2", text)
    text = _WS_RE.sub(" ", text)
    return text.strip()


def tokenize(text: str) -> list[str]:
    return [
        t
        for t in _TOKEN_RE.findall(text.lower())
        if t not in STOPWORDS and len(t) >= MIN_TOKEN_LEN
    ]


def extract_text(html_bytes: bytes | str) -> str:
    """HTML -> visible text -> clean_text. Deterministic, pure."""
    if isinstance(html_bytes, (bytes, bytearray)):
        raw = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        raw = html_bytes
    raw = _SCRIPT_STYLE_RE.sub(" ", raw)
    raw = _TAG_RE.sub(" ", raw)
    raw = _htmllib.unescape(raw)
    return clean_text(raw)


def analyze(text: str) -> list[str]:
    """Full document analyzer: clean then tokenize (the index's term stream)."""
    return tokenize(clean_text(text))


def analyze_query(query: str) -> list[str]:
    """Query analyzer: same token pipeline, deduplicated deterministically.

    The reference dedups via an unordered ``set`` capped at 12
    (backend/app/services/search/utils.py:13-19) — nondeterministic; we fix
    that by sorting before the cap (documented deviation, SURVEY.md §2.7 T4).
    Conjunctive (AND) semantics downstream, per websearch_to_tsquery
    (backend/app/services/search/fusion.py:42).
    """
    return sorted(set(tokenize(query)))[:MAX_QUERY_TERMS]


def parse_websearch(query: str) -> tuple[list[str], list[str]]:
    """Postgres websearch_to_tsquery negation: a whitespace word prefixed
    with '-' excludes documents containing it (reference F4/T9 use
    websearch_to_tsquery, fusion.py:42). Returns (positive terms, negated
    terms), each through the standard query analyzer. A term that is both
    required and negated is a contradiction — the caller returns empty,
    matching Postgres (``a & !a`` never matches). Negated terms are NOT
    capped together with positives; each side gets the analyzer's own
    dedup/sort/cap."""
    pos_raw, neg_raw = [], []
    for w in query.split():
        if w.startswith("-") and len(w) > 1:
            neg_raw.append(w[1:])
        else:
            pos_raw.append(w)
    return analyze_query(" ".join(pos_raw)), analyze_query(" ".join(neg_raw))


_QUOTE_RE = re.compile(r'(-?)"([^"]*)"')


def parse_websearch_full(query: str) -> tuple[list[str], list[str], list[list[str]]]:
    """AND-only websearch subset: unquoted words AND, '-word' negation,
    '"quoted words"' adjacency groups (Postgres turns a quote into chained
    <-> phrase operators inside the conjunction). Returns (loose positive
    terms, negated terms, phrase token-lists). Single-word quotes degrade
    to loose terms; negated phrases ('-"..."') raise here. SUPERSEDED by
    :func:`parse_websearch_query`, which covers the whole Postgres surface
    (the 'or' keyword + negated phrases) — every query entry point routes
    through that; this remains the single-conjunction parser for callers
    that want the strict subset."""
    phrases: list[list[str]] = []
    singles: list[str] = []

    def grab(m: "re.Match") -> str:
        if m.group(1) == "-":
            raise ValueError("negated quoted phrases are not supported")
        toks = tokenize(m.group(2))
        if len(toks) >= 2:
            phrases.append(toks)
        elif toks:
            singles.append(toks[0])
        return " "

    rest = _QUOTE_RE.sub(grab, query)
    pos, neg = parse_websearch(rest)
    loose = sorted(set(pos) | set(singles))[:MAX_QUERY_TERMS]
    return loose, neg, phrases


_WS_TOKEN_RE = re.compile(r'-?"[^"]*"|\S+')


def split_or_groups(query: str) -> list[str]:
    """Split a websearch query string on the standalone OR keyword
    (Postgres websearch_to_tsquery: the bare word 'or' becomes ``|``, and
    AND binds tighter, so the query is a disjunction of conjunctive
    groups). Quote-aware: an 'or' inside double quotes is a phrase token,
    not an operator."""
    groups: list[str] = []
    cur: list[str] = []
    for tok in _WS_TOKEN_RE.findall(query):
        if not tok.startswith(('"', '-"')) and tok.lower() == "or":
            groups.append(" ".join(cur))
            cur = []
        else:
            cur.append(tok)
    groups.append(" ".join(cur))
    return groups


def _parse_group(q: str) -> tuple[list[str], list[str], list[list[str]], list[list[str]]]:
    """One conjunctive websearch group -> (loose, neg, phrases,
    neg_phrases). '-"a b"' is Postgres ``!(a <-> b)``: exclude docs where
    the phrase occurs adjacently; a negated single-word quote folds into
    plain '-word' negation (Postgres !word)."""
    phrases: list[list[str]] = []
    neg_phrases: list[list[str]] = []
    singles: list[str] = []
    neg_singles: list[str] = []

    def grab(m: "re.Match") -> str:
        toks = tokenize(m.group(2))
        if m.group(1) == "-":
            if len(toks) >= 2:
                neg_phrases.append(toks)
            elif toks:
                neg_singles.append(toks[0])
        else:
            if len(toks) >= 2:
                phrases.append(toks)
            elif toks:
                singles.append(toks[0])
        return " "

    rest = _QUOTE_RE.sub(grab, q)
    pos, neg = parse_websearch(rest)
    loose = sorted(set(pos) | set(singles))[:MAX_QUERY_TERMS]
    neg_all = sorted(set(neg) | set(neg_singles))[:MAX_QUERY_TERMS]
    return loose, neg_all, phrases, neg_phrases


def parse_websearch_query(
    query: str,
) -> list[tuple[list[str], list[str], list[list[str]], list[list[str]]]]:
    """FULL Postgres websearch_to_tsquery surface: the standalone 'or'
    keyword (disjunction of conjunctive groups, AND binds tighter),
    '"quoted"' adjacency phrases, '-word' negation, and '-"quoted"'
    negated phrases. Returns a list of groups, each
    (all_pos_terms_sorted, neg_terms, phrases, neg_phrases); the query
    matches a document iff ANY group's conjunction holds. Groups that can
    never match are dropped here so every engine path agrees: a group with
    no positive requirement, a pos∩neg term contradiction (Postgres
    ``a & !a``), or a phrase that is both required and negated. An empty
    return means the whole query matches nothing. Never raises on user
    input (unlike parse_websearch_full's negated-quote ValueError —
    round-3 advice)."""
    out = []
    for g in split_or_groups(query):
        loose, neg, phrases, neg_phrases = _parse_group(g)
        all_pos = sorted(set(loose) | {t for ph in phrases for t in ph})
        if not all_pos:
            continue
        if set(all_pos) & set(neg):
            continue
        if any(ph in neg_phrases for ph in phrases):
            continue
        out.append((all_pos, neg, phrases, neg_phrases))
    return out


# --- stemmed variants (opt-in; reference T8/T9 stems via Postgres
# to_tsvector('english', ...) — functions/stemmer.py implements the public
# Porter 1980 ancestor of that Snowball stemmer) --------------------------


def tokenize_stemmed(text: str) -> list[str]:
    from honeywell_search_engine_spark.functions.stemmer import stem_tokens

    return stem_tokens(tokenize(text))


def analyze_stemmed(text: str) -> list[str]:
    """Document analyzer with stemming: clean -> tokenize -> Porter-stem.
    Stemming runs AFTER the stopword/length filter (Postgres drops
    stopwords before stemming too)."""
    from honeywell_search_engine_spark.functions.stemmer import stem_tokens

    return stem_tokens(tokenize(clean_text(text)))


def analyze_query_stemmed(query: str) -> list[str]:
    """Query analyzer for a stemmed index: stem BEFORE dedup/sort/cap
    (distinct surface forms can merge into one stem — 'running runs'
    queries ONE term, like websearch_to_tsquery('english', ...))."""
    from honeywell_search_engine_spark.functions.stemmer import stem_tokens

    return sorted(set(stem_tokens(tokenize(query))))[:MAX_QUERY_TERMS]


def stem_groups(groups: list) -> list:
    """Stem every term of parse_websearch_query's groups (Postgres stems
    inside quotes and negations alike). Re-validates contradictions AFTER
    stemming — 'running -runs' becomes run & !run only post-stem, exactly
    when Postgres would produce the contradiction."""
    from honeywell_search_engine_spark.functions.stemmer import stem_word

    out = []
    for all_pos, neg, phrases, neg_phrases in groups:
        s_ph = [[stem_word(t) for t in ph] for ph in phrases]
        s_nph = [[stem_word(t) for t in ph] for ph in neg_phrases]
        # cap the loose stems only, THEN union the (uncapped) phrase-term
        # stems — mirrors _parse_group, where the cap hits `loose` before
        # phrase terms join all_pos. Capping after the union could drop a
        # phrase term from all_pos and break adjacency verification
        # (round-4 advice, analyzer.py:282).
        ph_terms = {t for ph in s_ph for t in ph}
        s_loose = sorted({stem_word(t) for t in all_pos})[:MAX_QUERY_TERMS]
        s_pos = sorted(set(s_loose) | ph_terms)
        s_neg = sorted({stem_word(t) for t in neg})[:MAX_QUERY_TERMS]
        if not s_pos or set(s_pos) & set(s_neg):
            continue
        if any(ph in s_nph for ph in s_ph):
            continue
        out.append((s_pos, s_neg, s_ph, s_nph))
    return out


# --- vectorized (Arrow-batch) versions --------------------------------------
# pandas .str ops run the same `re` engine over whole columns; identical
# output to the pure kernels is asserted by tests/test_analyzer.py.


def normalize_series(s: pd.Series) -> pd.Series:
    s = s.fillna("").str.lower().str.translate(_PUNCT_TABLE)
    s = s.str.replace(_WS_RE, " ", regex=True)
    return s.str.strip()


def clean_series(s: pd.Series) -> pd.Series:
    s = s.fillna("")
    s = s.str.replace(_HEADER_FOOTER_RE, " ", regex=True)
    s = s.str.replace(_NON_PRINTABLE_RE, " ", regex=True)
    s = s.str.replace(_HYPHEN_BREAK_RE, r"\1\2", regex=True)
    s = s.str.replace(_WS_RE, " ", regex=True)
    return s.str.strip()


def extract_series(html_col: pd.Series) -> pd.Series:
    s = html_col.map(
        lambda b: bytes(b).decode("utf-8", errors="replace")
        if isinstance(b, (bytes, bytearray))
        else ("" if b is None else b)
    )
    s = s.str.replace(_SCRIPT_STYLE_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    s = s.map(_htmllib.unescape)
    return clean_series(s)


# --- Spark column expressions (JVM-side, whole-stage codegen) ----------------
# Tokenization for the *index build* stays entirely JVM-side: lower +
# regexp_extract_all + array filter. Parity with tokenize() is tested.


def tokens_col(col):
    """JVM-side token array: Column-API equivalent of tokenize(). `col` is a
    string column name or Column of already-cleaned text. Runs entirely in
    whole-stage codegen — no Python in the index-build hot path."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(F.lower(c), F.lit("[a-zA-Z0-9]+"), F.lit(0))
    return F.filter(
        toks,
        lambda t: (F.length(t) >= MIN_TOKEN_LEN) & ~t.isin(*sorted(STOPWORDS)),
    )
