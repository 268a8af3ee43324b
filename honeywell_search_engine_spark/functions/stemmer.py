"""Pure-Python Porter stemmer + vectorized wrappers.

Closes the documented T8/T9 deviation (SURVEY.md §2.7): the reference's
lexical channel stems through Postgres ``to_tsvector('english', ...)``
(Snowball — backend/app/models/pdf_chunks.py:57-60,
backend/migrations/003_add_lexical_and_triples.sql:32), while this
engine's analyzer was deliberately unstemmed. The classic Porter
algorithm (M.F. Porter, "An algorithm for suffix stripping", Program
14(3), 1980) is the published ancestor of Snowball's english stemmer and
is public knowledge; this is a from-scratch implementation of that paper's
five steps — deterministic, dependency-free, and shared verbatim between
the in-memory oracle and the Arrow-vectorized Spark path so stemmed
engine == stemmed oracle holds by construction (same contract as
analyzer.py).

Stemming is OPT-IN (``analyze(text)`` stays byte-identical to round 1-3);
``stem=True`` paths produce the stemmed term stream for index build,
query analysis, and the ``bm25_stemmed`` driver gate.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in Porter's [C](VC)^m[V] decomposition: the number of
    vowel-sequence -> consonant-sequence transitions."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (
        len(w) >= 2
        and w[-1] == w[-2]
        and _is_cons(w, len(w) - 1)
    )


def _cvc(w: str) -> bool:
    """*o: stem ends consonant-vowel-consonant where the final consonant
    is not w, x, or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def stem(word: str) -> str:
    """Porter-stem one lowercase word. Words of length <= 2 are returned
    unchanged (the algorithm's own convention)."""
    w = word
    if len(w) <= 2:
        return w

    # step 1a — plurals
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # step 1b — -ed / -ing
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c — y -> i
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m>0 suffix mappings)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            s = w[: -len(suf)]
            if _measure(s) > 0:
                w = s + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            s = w[: -len(suf)]
            if _measure(s) > 0:
                w = s + rep
            break

    # step 4 (m>1 deletions; -ion needs a preceding s or t)
    for suf in _STEP4:
        if w.endswith(suf):
            s = w[: -len(suf)]
            if _measure(s) > 1 and (suf != "ion" or (s and s[-1] in "st")):
                w = s
            break

    # step 5a — drop final e
    if w.endswith("e"):
        s = w[:-1]
        m = _measure(s)
        if m > 1 or (m == 1 and not _cvc(s)):
            w = s

    # step 5b — -ll -> -l for m>1
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


# memoized batch interface — a corpus has far fewer distinct words than
# token occurrences, so the per-word cost amortizes to a dict lookup
_MEMO: dict[str, str] = {}


def stem_word(word: str) -> str:
    s = _MEMO.get(word)
    if s is None:
        s = stem(word)
        if len(_MEMO) < 1_000_000:  # bound executor memory
            _MEMO[word] = s
    return s


def stem_tokens(tokens: list[str]) -> list[str]:
    return [stem_word(t) for t in tokens]
