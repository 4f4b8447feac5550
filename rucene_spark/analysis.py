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
        if mode == "whitespace" or mode.startswith("delimited_payload"):
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
            if mode.startswith("delimited_payload"):
                # payload-mode indexes store the payload-stripped term;
                # stripping here keeps term vectors / highlighting
                # consistent with the indexed token stream
                d = parse_payload_mode(mode)
                terms = [t.partition(d)[0] for t in terms]
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


# --- Arrow-native factorized tokenization (the segment builder's hot path) --

# Rust char::is_whitespace chars OTHER than the plain ASCII space — a doc
# containing any of these needs the reference-shaped python tokenizer
_EXOTIC_WS_RE = (
    "[\\t\\n\\x0b\\x0c\\r\\x85\\xa0\\x{1680}"
    "\\x{2000}-\\x{200a}\\x{2028}\\x{2029}\\x{202f}\\x{205f}\\x{3000}]"
)


def tokenize_factorized(texts, mode: str = "whitespace"):
    """Tokenize + factorize a batch in Arrow C++ → ``(doc_idx, codes,
    uniques, positions)`` where ``codes`` indexes the lexicographically
    sorted ``uniques`` (exactly ``pd.factorize(sort=True)`` semantics).

    The hot path never materializes Python string objects: split,
    flatten, dictionary-encode and byte-length checks are pyarrow compute
    kernels; only the (rare) over-long *unique* tokens and exotic-
    whitespace documents touch Python. Over-long tokens are expanded into
    their 511-byte chunks in-stream via integer gather/repeat, preserving
    the reference's consecutive-position semantics
    (whitespace_tokenizer.rs:106-123).
    """
    if mode == "standard":
        return _tokenize_standard_arrow(texts)
    if mode != "whitespace":
        di, terms, pos = batch_tokenize(texts, mode=mode)
        codes, uniques = _factorize_sorted(terms)
        return di, codes, uniques, pos

    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(list(texts), type=pa.string())
    exotic = pc.match_substring_regex(arr, _EXOTIC_WS_RE)
    is_simple = pc.and_kleene(pc.is_valid(arr), pc.invert(exotic))
    simple_np = is_simple.to_numpy(zero_copy_only=False)
    simple_np = np.asarray(simple_np, dtype=bool)
    idx_map = np.flatnonzero(simple_np)

    # ---- Arrow path for simple docs
    sub = arr.filter(pa.array(simple_np))
    if len(sub):
        splits = pc.split_pattern(sub, " ")
        del sub
        flat = pc.list_flatten(splits)
        parents = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
        # free each corpus-sized intermediate once its successor exists —
        # 32 concurrent build workers hold these simultaneously and the
        # per-worker peak is what OOMs a maxed host (BASELINE.md r4k)
        del splits
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        keep = np.asarray(keep, dtype=bool)
        flat_f = flat.filter(pa.array(keep))
        del flat
        parents_f = parents[keep].astype(np.int64)
        del parents, keep
        denc = pc.dictionary_encode(flat_f)
        del flat_f
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        idx_f = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dict_np = np.asarray(denc.dictionary.to_pandas(), dtype=object)
        byte_lens = pc.binary_length(denc.dictionary).to_numpy(
            zero_copy_only=False)
        long_codes = np.flatnonzero(byte_lens >= MAX_BYTES_LEN)
    else:
        idx_f = np.empty(0, dtype=np.int64)
        parents_f = np.empty(0, dtype=np.int64)
        dict_np = np.empty(0, dtype=object)
        long_codes = np.empty(0, dtype=np.int64)

    # replacement strings per dictionary code (chunks for over-long tokens)
    rep_strings: list[list] = [None] * dict_np.size  # type: ignore[list-item]
    long_set = set(long_codes.tolist())
    for c in long_codes:
        rep_strings[c] = _split_long_token(dict_np[c])

    # ---- python path for exotic docs
    py_di: list[np.ndarray] = []
    py_terms: list[np.ndarray] = []
    py_pos: list[np.ndarray] = []
    for i in np.flatnonzero(~simple_np):
        t = texts[i]
        if t is None:
            continue
        toks = [tok for (tok, _, _, _) in whitespace_tokenize(t)]
        if not toks:
            continue
        py_di.append(np.full(len(toks), i, dtype=np.int64))
        py_terms.append(np.asarray(toks, dtype=object))
        py_pos.append(np.arange(len(toks), dtype=np.int64))
    terms_c = (np.concatenate(py_terms) if py_terms
               else np.empty(0, dtype=object))

    # ---- unified sorted vocabulary (long originals excluded — they are
    # never emitted, only their chunks are)
    normal_strings = (dict_np[[c for c in range(dict_np.size)
                               if c not in long_set]]
                      if dict_np.size else dict_np)
    chunk_strings = [s for c in long_codes for s in rep_strings[c]]
    parts = [p for p in (normal_strings,
                         np.asarray(chunk_strings, dtype=object), terms_c)
             if len(p)]
    if not parts:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty, np.empty(0, dtype=object), empty
    uniques = np.unique(np.concatenate(parts))

    # ---- expand over-long occurrences and map to final codes
    if dict_np.size:
        rep_counts = np.ones(dict_np.size, dtype=np.int64)
        for c in long_codes:
            rep_counts[c] = len(rep_strings[c])
        rep_offsets = np.concatenate(([0], np.cumsum(rep_counts)))
        rep_codes = np.empty(int(rep_offsets[-1]), dtype=np.int64)
        base_new = np.searchsorted(uniques, dict_np)
        for c in range(dict_np.size):
            if c in long_set:
                rep_codes[rep_offsets[c]:rep_offsets[c + 1]] = (
                    np.searchsorted(uniques, np.asarray(rep_strings[c],
                                                        dtype=object)))
            else:
                rep_codes[rep_offsets[c]] = base_new[c]

        exp = rep_counts[idx_f]
        n_new = int(exp.sum())
        parents_e = np.repeat(parents_f, exp)
        within = np.arange(n_new) - np.repeat(
            np.concatenate(([0], np.cumsum(exp)[:-1])), exp)
        codes_f = rep_codes[rep_offsets[idx_f].repeat(exp) + within]
        # per-doc positions: rank within parent (parents are ascending)
        if n_new:
            starts = np.concatenate(
                ([0], np.flatnonzero(parents_e[1:] != parents_e[:-1]) + 1))
            counts = np.diff(np.append(starts, n_new))
            pos_f = np.arange(n_new) - np.repeat(starts, counts)
        else:
            pos_f = np.empty(0, dtype=np.int64)
        di_f = idx_map[parents_e]
    else:
        codes_f = np.empty(0, dtype=np.int64)
        pos_f = np.empty(0, dtype=np.int64)
        di_f = np.empty(0, dtype=np.int64)

    if terms_c.size:
        codes_c = np.searchsorted(uniques, terms_c)
        di = np.concatenate([di_f, np.concatenate(py_di)])
        codes = np.concatenate([codes_f, codes_c])
        pos = np.concatenate([pos_f, np.concatenate(py_pos)])
    else:
        di, codes, pos = di_f, codes_f, pos_f
    return di, codes, uniques, pos


# --- Arrow fast path for the standard analyzer mode ------------------------
#
# `standard_tokenize` is match-then-lower per doc; the Arrow path is
# lower-then-split over the whole batch. The two commute for every char
# EXCEPT the 29 below, pre-derived by exhaustive scan of U+0000..U+10FFFF
# (re-derived and asserted in tests/test_analysis_standard_arrow.py):
#   * word-class chars whose lower() leaves the class or expands
#     (İ→i+U+0307; Ɓ→ɓ U+0253, ... — African-letter capitals in
#     U+0181..U+01B7 and U+023A..U+0245 whose lowercase lives past U+024F)
#   * out-of-class chars whose lower() joins the class (ẞ U+1E9E→ß,
#     KELVIN/ANGSTROM U+212A/212B→k/å, Ɀ/Ɒ U+2C7E/2C7F→z-forms)
# A doc containing any hazard char takes the Python tokenizer; everything
# else stays in Arrow C++ end-to-end. utf8_lower (utf8proc) and
# str.lower() agree on every other membership-relevant mapping
# (exhaustively A/B-checked in the same test).
_STD_HAZARD_RE = (
    "[\\x{0130}\\x{0181}\\x{0186}\\x{0189}-\\x{018a}\\x{018f}-\\x{0190}"
    "\\x{0193}-\\x{0194}\\x{0196}-\\x{0197}\\x{019c}-\\x{019d}\\x{019f}"
    "\\x{01a6}\\x{01a9}\\x{01ae}\\x{01b1}-\\x{01b2}\\x{01b7}\\x{023a}"
    "\\x{023e}\\x{0244}-\\x{0245}\\x{1e9e}\\x{212a}-\\x{212b}"
    "\\x{2c7e}-\\x{2c7f}]"
)
# CJK ideographs/kana tokenize as unigrams (the second _WORD_RE branch):
# space-pad each so the delimiter split below emits them individually
_STD_CJK_PAD = "([\\x{3040}-\\x{30ff}\\x{3400}-\\x{9fff}\\x{f900}-\\x{faff}])"
# delimiter = complement of both _WORD_RE branches (uppercase included:
# harmless post-lower, and keeps the class the exact complement)
_STD_DELIM = (
    "[^0-9A-Za-z_\\x{00c0}-\\x{024f}\\x{0400}-\\x{04ff}"
    "\\x{3040}-\\x{30ff}\\x{3400}-\\x{9fff}\\x{f900}-\\x{faff}]+"
)
# Lucene StandardTokenizer maxTokenLength default: 255 chars
_STD_MAX_TOKEN_LEN = 255


def _tokenize_standard_arrow(texts):
    """Arrow-native standard-mode tokenize + factorize → ``(doc_idx,
    codes, uniques, positions)`` (same contract as the whitespace fast
    path). One utf8_lower + one regex replace (CJK padding) + one regex
    split over the batch; per-token Python only for hazard-char docs."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(list(texts), type=pa.string())
    hazard = pc.match_substring_regex(arr, _STD_HAZARD_RE)
    is_simple = pc.and_kleene(pc.is_valid(arr), pc.invert(hazard))
    simple_np = np.asarray(is_simple.to_numpy(zero_copy_only=False),
                           dtype=bool)
    idx_map = np.flatnonzero(simple_np)

    if idx_map.size:
        sub = arr.filter(pa.array(simple_np))
        low = pc.utf8_lower(sub)
        del sub
        padded = pc.replace_substring_regex(
            low, pattern=_STD_CJK_PAD, replacement=" \\1 ")
        del low
        splits = pc.split_pattern_regex(padded, _STD_DELIM)
        del padded
        flat = pc.list_flatten(splits)
        parents = pc.list_parent_indices(splits).to_numpy(
            zero_copy_only=False)
        # drop each corpus-sized intermediate as soon as the next one
        # exists: a 32-concurrent-worker build holds every live copy of
        # the batch text simultaneously, and peak RSS is what OOMs a
        # maxed-out host (observed at 10M docs / 256 segments)
        del splits
        keep = np.asarray(pc.not_equal(flat, "").to_numpy(
            zero_copy_only=False), dtype=bool)
        flat_f = flat.filter(pa.array(keep))
        del flat
        parents_f = parents[keep].astype(np.int64)
        del parents, keep
        denc = pc.dictionary_encode(flat_f)
        del flat_f
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        idx_f = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dict_arr = denc.dictionary
        cp_lens = pc.utf8_length(dict_arr).to_numpy(zero_copy_only=False)
        if cp_lens.size and int(cp_lens.max()) > _STD_MAX_TOKEN_LEN:
            # 255-codepoint cap applies to the UNIQUE strings; two uniques
            # truncating to the same prefix merge via np.unique below
            dict_arr = pc.utf8_slice_codeunits(
                dict_arr, 0, _STD_MAX_TOKEN_LEN)
        dict_np = np.asarray(dict_arr.to_pandas(), dtype=object)
    else:
        idx_f = np.empty(0, dtype=np.int64)
        parents_f = np.empty(0, dtype=np.int64)
        dict_np = np.empty(0, dtype=object)

    # ---- python path for hazard docs
    py_di, py_terms, py_pos = [], [], []
    for i in np.flatnonzero(~simple_np):
        t = texts[i]
        if t is None:
            continue
        toks = standard_tokenize(t)
        if not toks:
            continue
        py_di.append(np.full(len(toks), i, dtype=np.int64))
        py_terms.append(np.asarray(toks, dtype=object))
        py_pos.append(np.arange(len(toks), dtype=np.int64))
    terms_c = (np.concatenate(py_terms) if py_terms
               else np.empty(0, dtype=object))

    parts = [p for p in (dict_np, terms_c) if len(p)]
    if not parts:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty.copy(), np.empty(0, dtype=object), empty.copy()
    uniques = np.unique(np.concatenate(parts))

    if idx_f.size:
        codes_f = np.searchsorted(uniques, dict_np)[idx_f]
        di_f = idx_map[parents_f]
        # per-doc positions: rank within parent (parents ascending)
        starts = np.concatenate(
            ([0], np.flatnonzero(parents_f[1:] != parents_f[:-1]) + 1))
        counts = np.diff(np.append(starts, parents_f.size))
        pos_f = np.arange(parents_f.size) - np.repeat(starts, counts)
    else:
        codes_f = np.empty(0, dtype=np.int64)
        di_f = np.empty(0, dtype=np.int64)
        pos_f = np.empty(0, dtype=np.int64)

    if terms_c.size:
        codes_c = np.searchsorted(uniques, terms_c)
        di = np.concatenate([di_f, np.concatenate(py_di)])
        codes = np.concatenate([codes_f, codes_c])
        pos = np.concatenate([pos_f, np.concatenate(py_pos)])
        # keep doc-ascending emission order so the invert's single-sort
        # fast path stays eligible when hazard docs are interleaved
        if di_f.size and di.size:
            order = np.argsort(di, kind="stable")
            di, codes, pos = di[order], codes[order], pos[order]
    else:
        di, codes, pos = di_f, codes_f, pos_f
    return di, codes, uniques, pos


def standard_tokenize_offsets(text: str) -> list[tuple[str, int, int]]:
    """``standard_tokenize`` with character offsets: ``(term, start, end)``
    per token. Offsets refer to the ORIGINAL text (the token itself is
    lowercased/capped), which is exactly why offset-based highlighting
    needs them — standard tokens are not substring-recoverable."""
    return [(m.group(0).lower()[:255], m.start(), m.end())
            for m in _WORD_RE.finditer(text)]


def batch_tokenize_offsets(texts, mode: str = "whitespace"):
    """Tokenize a batch WITH character offsets → flat numpy arrays
    ``(doc_idx, terms, positions, starts, ends)``.

    The offsets channel of the reference's token stream
    (``Token.start_offset``/``end_offset``, analysis/mod.rs:32-52;
    ``IndexOptions::DocsAndFreqsAndPositionsAndOffsets``,
    index_options.rs:18-24). Used only when the index opts into stored
    offsets — the offset-free factorized path stays the build hot path."""
    doc_idx, all_terms, all_pos, all_s, all_e = [], [], [], [], []
    for i, text in enumerate(texts):
        if text is None:
            continue
        if mode == "whitespace":
            toks = [(t, s, e) for (t, _, s, e) in whitespace_tokenize(text)]
        elif mode == "standard":
            toks = standard_tokenize_offsets(text)
        else:
            raise ValueError(
                f"analyzer mode {mode!r} does not produce offsets")
        if not toks:
            continue
        k = len(toks)
        doc_idx.append(np.full(k, i, dtype=np.int64))
        all_terms.append(np.asarray([t for t, _, _ in toks], dtype=object))
        all_pos.append(np.arange(k, dtype=np.int64))
        all_s.append(np.asarray([s for _, s, _ in toks], dtype=np.int64))
        all_e.append(np.asarray([e for _, _, e in toks], dtype=np.int64))
    if not doc_idx:
        empty = np.empty(0, dtype=np.int64)
        return (empty, np.empty(0, dtype=object), empty.copy(),
                empty.copy(), empty.copy())
    return (np.concatenate(doc_idx), np.concatenate(all_terms),
            np.concatenate(all_pos), np.concatenate(all_s),
            np.concatenate(all_e))


def parse_synonym_mode(mode: str) -> dict[str, list[str]]:
    """Parse ``synonym:src=syn1|syn2,src2=syn3`` into a mapping. The base
    tokenizer is whitespace; every occurrence of ``src`` additionally
    emits each synonym at the SAME position (pos_incr = 0 overlap
    tokens, analysis/mod.rs:32-52 Token.position semantics)."""
    spec = mode[len("synonym:"):]
    syn: dict[str, list[str]] = {}
    for part in spec.split(","):
        src, sep, tgt = part.partition("=")
        if not sep or not src or not tgt:
            raise ValueError(f"bad synonym spec segment: {part!r}")
        syn[src] = tgt.split("|")
    return syn


def tokenize_factorized_overlap(texts, mode: str = "whitespace"):
    """:func:`tokenize_factorized` plus an ``overlap`` mask — the
    position-increment channel of the reference's token stream
    (doc_consumer.rs:906-926): a token with ``pos_incr == 0`` shares the
    previous token's position and counts toward ``num_overlap``, which is
    EXCLUDED from the field length used for norms
    (bm25_similarity.rs:86, ``num_terms = length - num_overlap``).

    Returns ``(doc_idx, codes, uniques, positions, overlap)`` where
    ``overlap`` is None for analyzers that cannot emit overlaps (the
    shipped whitespace/standard modes) and a bool array otherwise."""
    if not mode.startswith("synonym:"):
        di, codes, uniques, pos = tokenize_factorized(texts, mode)
        return di, codes, uniques, pos, None
    syn = parse_synonym_mode(mode)
    di, codes, uniques, pos = tokenize_factorized(texts, "whitespace")
    extra = sorted({s for vs in syn.values() for s in vs})
    if not extra or uniques.size == 0:
        return di, codes, uniques, pos, np.zeros(di.size, dtype=bool)
    vocab = np.unique(np.concatenate(
        [uniques, np.asarray(extra, dtype=object)]))
    codes = np.searchsorted(vocab, uniques)[codes] if di.size else codes
    add_di, add_codes, add_pos = [di], [codes], [pos]
    for src, targets in sorted(syn.items()):
        hit = int(np.searchsorted(vocab, src))
        if hit >= vocab.size or vocab[hit] != src:
            continue
        src_occ = np.flatnonzero(codes == hit)
        if src_occ.size == 0:
            continue
        for t in targets:
            t_code = int(np.searchsorted(vocab, t))
            add_di.append(di[src_occ])
            add_codes.append(np.full(src_occ.size, t_code, dtype=np.int64))
            add_pos.append(pos[src_occ])
    n_base = di.size
    di = np.concatenate(add_di)
    codes = np.concatenate(add_codes)
    pos = np.concatenate(add_pos)
    overlap = np.zeros(di.size, dtype=bool)
    overlap[n_base:] = True
    return di, codes, vocab, pos, overlap


def _factorize_sorted(terms: np.ndarray):
    import pandas as pd

    codes, uniques = pd.factorize(terms, sort=True)
    return codes.astype(np.int64), np.asarray(uniques, dtype=object)


# --- StandardAnalyzer-approximate mode (our addition; see module docstring) --

_WORD_RE = re.compile(
    r"[0-9A-Za-z_À-ɏЀ-ӿ]+|[぀-ヿ㐀-鿿豈-﫿]"
)


def standard_tokenize(text: str) -> list[str]:
    """Lowercased word-break tokens; CJK ideographs as unigrams; 255-char cap
    (Lucene StandardTokenizer's maxTokenLength default)."""
    return [m.group(0).lower()[:255] for m in _WORD_RE.finditer(text)]


def parse_payload_mode(mode: str) -> str:
    """Parse ``delimited_payload`` / ``delimited_payload:<delim>`` →
    the delimiter (default ``|``, the classic DelimitedPayloadTokenFilter
    convention: a token ``term<delim>payload`` indexes ``term`` and
    attaches ``payload``'s UTF-8 bytes at that position)."""
    rest = mode[len("delimited_payload"):]
    if not rest:
        return "|"
    if not rest.startswith(":") or len(rest) < 2:
        raise ValueError(f"bad delimited_payload spec: {mode!r}")
    return rest[1:]


def tokenize_factorized_payload(texts, mode: str):
    """Whitespace tokenization + per-token payload split — the payloads
    channel of the reference's token stream (posting_reader.rs
    ``payload()``; the reference ships no payload-emitting analyzer
    either, so this mode is the extension-surface analogue of Lucene's
    DelimitedPayloadTokenFilter).

    Returns ``(doc_idx, codes, uniques, positions, payloads)`` where
    ``payloads`` is an object array of ``bytes`` aligned with the token
    stream (``b""`` for tokens without a delimiter)."""
    delim = parse_payload_mode(mode)
    di, terms, pos = batch_tokenize(texts, "whitespace")
    if di.size == 0:
        return (di, np.empty(0, dtype=np.int64),
                np.empty(0, dtype=object), pos,
                np.empty(0, dtype=object))
    # Arrow-vectorized str.partition(delim): split on the FIRST delimiter
    # only (max_splits=1) so later delimiters stay inside the payload,
    # then slice heads/tails out of the flattened pieces by list offset —
    # no per-token Python (round-3 VERDICT "What's wrong #4").
    import pyarrow as pa
    import pyarrow.compute as pc

    parts = pc.split_pattern(
        pa.array(terms, type=pa.string()), pattern=delim, max_splits=1)
    offs = np.asarray(parts.offsets)
    flat = parts.flatten()
    bare = np.asarray(flat.take(pa.array(offs[:-1])), dtype=object)
    pays = np.empty(terms.size, dtype=object)
    pays[:] = b""
    has = np.diff(offs) == 2
    if has.any():
        hit = np.flatnonzero(has)
        tails = flat.take(pa.array(offs[:-1][hit] + 1))
        pays[hit] = tails.cast(pa.binary()).to_pylist()
    codes, uniques = _factorize_sorted(bare)
    return di, codes, uniques, pos, pays
