"""Analysis chain: tokenizers producing ``(term, position, start, end)``.

``whitespace_tokenize`` reproduces the reference ``WhitespaceTokenizer``
(``/root/reference/src/core/analysis/whitespace_tokenizer.rs:31-155``):

* splits at Unicode-whitespace characters (``char::is_whitespace``);
* a token is truncated once its UTF-8 byte length reaches ``MAX_BYTES_LEN``
  (511) — note the reference counts **bytes**, unlike Lucene's char count
  (``whitespace_tokenizer.rs:23-24``); the remaining characters of an
  over-long run start a **new** token (the reader keeps consuming from the
  same buffer index);
* offsets are in characters; ``end`` is exclusive.

Position increments are always 1 (the reference ships only this tokenizer —
no synonyms/stopwords), so ``position == token index`` and
``num_overlap == 0``; field length = token count
(``doc_consumer.rs:906-926``).

``standard_tokenize`` is our addition (the north-star asks for Lucene
StandardAnalyzer-like semantics as the default mode): lowercase +
word-character runs (UAX#29-approximate), CJK ideographs emitted as unigrams.

Batch entry points operate on sequences of strings and return flat numpy
arrays — the shape consumed by the segment builder's Arrow UDF (no per-row
Python on the fast path: pure-ASCII space-separated corpora take a
vectorized shortcut).
"""

from __future__ import annotations

import re

import numpy as np

MAX_BYTES_LEN = 511  # whitespace_tokenizer.rs:24 — bytes, not chars

# Rust char::is_whitespace == the Unicode White_Space property (note: this
# deliberately EXCLUDES U+001C..U+001F, which Python's str.isspace() accepts).
_WS_SET = frozenset(
    "\t\n\x0b\x0c\r \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)


def _split_long_token(term: str) -> list[str]:
    """Chunk an over-long token exactly like the reference's read loop:
    append chars until the UTF-8 length reaches >= 511 bytes, then start a
    new token with the next character (whitespace_tokenizer.rs:106-123)."""
    if term.isascii():  # byte length == char length → plain slicing
        return [term[i:i + MAX_BYTES_LEN]
                for i in range(0, len(term), MAX_BYTES_LEN)]
    chunks: list[str] = []
    cur: list[str] = []
    cur_bytes = 0
    for ch in term:
        cur.append(ch)
        cur_bytes += len(ch.encode("utf-8"))
        if cur_bytes >= MAX_BYTES_LEN:
            chunks.append("".join(cur))
            cur = []
            cur_bytes = 0
    if cur:
        chunks.append("".join(cur))
    return chunks


def _needs_split(t: str) -> bool:
    """UTF-8 byte length >= 511, checked cheaply (chars first, bytes only
    for non-ASCII shorter-than-511-char tokens)."""
    if len(t) >= MAX_BYTES_LEN:
        return True
    return (not t.isascii()) and len(t.encode("utf-8")) >= MAX_BYTES_LEN


def whitespace_tokenize(text: str) -> list[tuple[str, int, int, int]]:
    """Tokenize one string → ``[(term, position, start_offset, end_offset)]``.

    Slow reference-shaped implementation used for parity tests and as the
    fallback for exotic inputs; the batch path below is the hot path.
    """
    out: list[tuple[str, int, int, int]] = []
    pos = 0
    i = 0
    n = len(text)
    while i < n:
        if text[i] in _WS_SET:
            i += 1
            continue
        start = i
        cur_bytes = 0
        while i < n and text[i] not in _WS_SET:
            cur_bytes += len(text[i].encode("utf-8"))
            i += 1
            if cur_bytes >= MAX_BYTES_LEN:
                break
        out.append((text[start:i], pos, start, i))
        pos += 1
    return out


_SIMPLE_RE = re.compile(r"[^\S ]")  # any whitespace other than plain space


def _is_simple(text: str) -> bool:
    """True when plain ``str.split(' ')`` semantics coincide with the
    reference tokenizer: only ASCII spaces as separators, no 511-byte runs."""
    if _SIMPLE_RE.search(text):
        return False
    # cheap over-long check: a >=511-char doc could still be one long run
    return " " in text or len(text) < MAX_BYTES_LEN


def batch_tokenize(texts, mode: str = "whitespace"):
    """Tokenize a batch of documents → ``(doc_idx, terms, positions)`` flat arrays.

    ``doc_idx`` is the row index within the batch; ``positions`` restart at 0
    per document. Offsets are omitted on the batch path (they are needed only
    for highlighting, which is deferred — SURVEY.md §7.4).
    """
    doc_idx: list[np.ndarray] = []
    all_terms: list[np.ndarray] = []
    all_pos: list[np.ndarray] = []
    for i, text in enumerate(texts):
        if text is None:
            continue
        if mode == "whitespace":
            if _is_simple(text):
                terms = [t for t in text.split(" ") if t]
                if any(_needs_split(t) for t in terms):
                    # split ONLY the over-long tokens — never route the
                    # whole doc through the per-char chunker
                    terms = [
                        c for t in terms
                        for c in (_split_long_token(t) if _needs_split(t) else (t,))
                    ]
            else:
                terms = [t for (t, _, _, _) in whitespace_tokenize(text)]
        elif mode == "standard":
            terms = standard_tokenize(text)
        else:
            raise ValueError(f"unknown analyzer mode: {mode}")
        k = len(terms)
        if k == 0:
            continue
        doc_idx.append(np.full(k, i, dtype=np.int64))
        all_terms.append(np.asarray(terms, dtype=object))
        all_pos.append(np.arange(k, dtype=np.int64))
    if not doc_idx:
        empty = np.empty(0, dtype=np.int64)
        return empty, np.empty(0, dtype=object), empty
    return np.concatenate(doc_idx), np.concatenate(all_terms), np.concatenate(all_pos)


# --- StandardAnalyzer-approximate mode (our addition; see module docstring) --

_WORD_RE = re.compile(
    r"[0-9A-Za-z_À-ɏЀ-ӿ]+|[぀-ヿ㐀-鿿豈-﫿]"
)


def standard_tokenize(text: str) -> list[str]:
    """Lowercased word-break tokens; CJK ideographs as unigrams; 255-char cap
    (Lucene StandardTokenizer's maxTokenLength default)."""
    return [m.group(0).lower()[:255] for m in _WORD_RE.finditer(text)]
