"""Hierarchical parent/child chunking kernel.

Reproduces the *semantics* of the reference's chunking module
(reference backend/app/worker/chunking.py:119-332) as pure functions with
a deliberately different, engine-friendly shape: one flat generator of
(kind, parent_idx, child_idx, text) tuples that a Spark pandas UDF can
explode into chunk rows.

Semantics contract (cited against the reference):
- token counting: deterministic fallback ``int(words / 0.75)``
  (chunking.py:37-43; the HF tokenizer isn't in this environment, and the
  engine needs a pure, reproducible count);
- sentence split: whitespace-normalize, then split at
  ``(?<=[.!?])\\s+(?=[A-Z]) | (?<=[.!?])\\s*\\n+ | \\n{2,}``, keep pieces
  longer than 5 chars, whole text if nothing survives (chunking.py:91-109);
- paragraph split on ``\\n\\s*\\n+`` of the raw text (chunking.py:75,112-115);
- recursive descent paragraph -> sentence -> word window
  (chunking.py:119-155), greedy sentence packing with 1-sentence overlap
  (chunking.py:158-203), word window of ``int(max_tokens * 0.75)`` words
  (chunking.py:206-221), forward-merge of sub-minimum chunks
  (chunking.py:224-242);
- parents <= 500 tokens (min 100), children <= 200 tokens (min n/a),
  parent small enough becomes its own single child (chunking.py:245-312).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

PARENT_MAX = 500
PARENT_MIN = 100
CHILD_MAX = 200
OVERLAP = 1

_SENT_BOUNDARY = re.compile(
    r"(?<=[.!?])\s+(?=[A-Z])|(?<=[.!?])\s*\n+|\n{2,}"
)
_PARA_BOUNDARY = re.compile(r"\n\s*\n+")
_WS = re.compile(r"\s+")


def count_tokens(text: str) -> int:
    """words / 0.75 — the reference's deterministic fallback counter."""
    return int(len(text.split()) / 0.75)


def sentences_of(text: str) -> list[str]:
    text = _WS.sub(" ", text).strip()
    if not text:
        return []
    kept = [s.strip() for s in _SENT_BOUNDARY.split(text) if len(s.strip()) > 5]
    return kept or [text]


def paragraphs_of(text: str) -> list[str]:
    return [p.strip() for p in _PARA_BOUNDARY.split(text) if p.strip()]


def window_split(text: str, max_tokens: int) -> list[str]:
    """Word-window fallback for a single oversized sentence."""
    words = text.split()
    if not words:
        return []
    step = int(max_tokens * 0.75)
    return [" ".join(words[i : i + step]) for i in range(0, len(words), step)]


def pack_sentences(sents: list[str], max_tokens: int, overlap: int = OVERLAP) -> list[str]:
    """Greedy packer: fill up to max_tokens, carry `overlap` trailing
    sentences into the next chunk; oversized sentences flush and
    window-split."""
    out: list[str] = []
    run: list[str] = []
    run_tok = 0
    for s in sents:
        t = count_tokens(s)
        if t > max_tokens:
            if run:
                out.append(" ".join(run))
            out.extend(window_split(s, max_tokens))
            run, run_tok = [], 0
            continue
        if run and run_tok + t > max_tokens:
            out.append(" ".join(run))
            if overlap and len(run) >= overlap:
                run = run[-overlap:]
                run_tok = sum(count_tokens(x) for x in run)
            else:
                run, run_tok = [], 0
        run.append(s)
        run_tok += t
    if run:
        out.append(" ".join(run))
    return out


def absorb_small(chunks: list[str], min_tokens: int) -> list[str]:
    """Forward-merge chunks below min_tokens into their successor."""
    out: list[str] = []
    carry: str | None = None
    for c in chunks:
        if carry is None:
            carry = c
        elif count_tokens(carry) < min_tokens:
            carry = carry + " " + c
        else:
            out.append(carry)
            carry = c
    if carry:
        out.append(carry)
    return out


def split_recursive(text: str, max_tokens: int = PARENT_MAX) -> list[str]:
    """paragraph -> sentence -> word-window descent."""
    if not text or not text.strip():
        return []
    if count_tokens(text) <= max_tokens:
        return [text.strip()]
    paras = paragraphs_of(text)
    if len(paras) > 1:
        pieces: list[str] = []
        for p in paras:
            pieces.extend(split_recursive(p, max_tokens))
        return absorb_small(pieces, PARENT_MIN)
    sents = sentences_of(text)
    if len(sents) > 1:
        return pack_sentences(sents, max_tokens)
    return window_split(text, max_tokens)


def chunk_rows(text: str) -> Iterator[tuple[str, int, int | None, str, int]]:
    """Flat chunk stream for one document:
    yields (kind, parent_idx, child_idx, text, token_count) with
    kind in {'PARENT', 'CHILD'}; child_idx is None for parents.
    """
    if not text or not text.strip():
        return
    parents = absorb_small(split_recursive(text, PARENT_MAX), PARENT_MIN)
    for p_idx, p_text in enumerate(parents):
        p_tok = count_tokens(p_text)
        yield ("PARENT", p_idx, None, p_text, p_tok)
        if p_tok <= CHILD_MAX:
            yield ("CHILD", p_idx, 0, p_text, p_tok)
        else:
            for c_idx, c_text in enumerate(
                pack_sentences(sentences_of(p_text), CHILD_MAX, OVERLAP)
            ):
                yield ("CHILD", p_idx, c_idx, c_text, count_tokens(c_text))
