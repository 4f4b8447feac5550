"""Tokenizer tests ported from the reference
(/root/reference/src/core/analysis/whitespace_tokenizer.rs:213-246) plus the
511-byte-cap semantics (whitespace_tokenizer.rs:23-24,106-123)."""

import numpy as np

from rucene_spark.analysis import (
    MAX_BYTES_LEN,
    batch_tokenize,
    standard_tokenize,
    whitespace_tokenize,
)


def test_reference_golden_offsets():
    source = "The quick brown fox jumps over a lazy dog"
    offsets = [(0, 3), (4, 9), (10, 15), (16, 19), (20, 25), (26, 30),
               (31, 32), (33, 37), (38, 41)]
    toks = whitespace_tokenize(source)
    assert [t[0] for t in toks] == source.split(" ")
    assert [t[1] for t in toks] == list(range(9))
    assert [(t[2], t[3]) for t in toks] == offsets


def test_unicode_whitespace_and_nbsp():
    # char::is_whitespace includes ideographic space U+3000…
    toks = whitespace_tokenize("a　b c")
    assert [t[0] for t in toks] == ["a", "b", "c"]
    # …but NOT the non-breaking space (the doc comment calls this out)
    toks = whitespace_tokenize("a­b")
    assert len(toks) == 1  # soft hyphen is not whitespace either
    # NBSP U+00A0 IS White_Space=yes in Unicode? No — it is; Rust
    # char::is_whitespace('\u{a0}') == true.
    toks = whitespace_tokenize("a b")
    assert [t[0] for t in toks] == ["a", "b"]


def test_511_byte_cap_splits_long_runs():
    long_tok = "x" * 600
    toks = whitespace_tokenize(f"pre {long_tok} post")
    assert [t[0] for t in toks] == ["pre", "x" * 511, "x" * 89, "post"]
    assert [t[1] for t in toks] == [0, 1, 2, 3]
    # multibyte char may push a chunk past 511 bytes (reference pushes the
    # char first, then checks >= MAX_BYTES_LEN)
    cjk = "试" * 200  # 3 bytes each → chunk breaks at 171 chars = 513 bytes
    toks = whitespace_tokenize(cjk)
    assert len(toks[0][0].encode()) >= MAX_BYTES_LEN
    assert "".join(t[0] for t in toks) == cjk


def test_batch_matches_scalar():
    docs = [
        "The quick brown fox",
        "a  b   c",  # runs of spaces
        "tab\tsep and　wide",
        "z" * 600 + " tail",
        "",
        None,
    ]
    di, terms, pos = batch_tokenize(docs)
    for i, doc in enumerate(docs):
        mine = list(terms[di == i])
        want = [t[0] for t in whitespace_tokenize(doc)] if doc else []
        assert mine == want, (i, mine, want)
        assert list(pos[di == i]) == list(range(len(want)))


def test_batch_empty():
    di, terms, pos = batch_tokenize([])
    assert di.size == 0 and terms.size == 0 and pos.size == 0


def test_standard_tokenizer():
    assert standard_tokenize("Hello, World! 42x") == ["hello", "world", "42x"]
    assert standard_tokenize("中文检索") == ["中", "文", "检", "索"]
