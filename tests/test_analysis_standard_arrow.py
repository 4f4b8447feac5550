"""Arrow fast path for the standard analyzer == the per-doc Python
tokenizer, token-for-token — plus a first-principles re-derivation of the
hazard-character set the fast path routes to Python.

The fast path lowers the whole batch (utf8_lower) and THEN splits; the
Python reference (`standard_tokenize`) matches and THEN lowers per
token. The two commute except on the 29 chars baked into
`_STD_HAZARD_RE`; this file re-derives that set by exhaustive scan so a
Unicode-table drift (new cased letters in the word ranges) fails loudly
instead of silently diverging.
"""

import re

import numpy as np
import pytest

import rucene_spark.analysis as A


def _old_path(texts):
    di, terms, pos = A.batch_tokenize(texts, mode="standard")
    codes, uniques = A._factorize_sorted(terms)
    return di, codes, uniques, pos


def _as_token_set(di, codes, uniques, pos):
    return sorted(zip(di.tolist(), pos.tolist(),
                      [uniques[c] for c in codes.tolist()]))


ADVERSARIAL = [
    None, "", "   ", "İstanbul SHOUTING İİ", "ẞ K Å ꭰ Ꭰ",
    "abc搜索def ひらがなカタカナ", "漢字toui", "under_score_42 MIXèd",
    "a" * 300 + " " + "漢" * 5, "Ɓird Ɔmega ʊnder", "ПРИВЕТ мир Ёлка",
    "ẋy", "Kelvin\u212asign", "tab\tsep\nnewline",
    "email@host.com, punct!done?", "¡¿·—–", "𝒜𝒷𝒸 math", "ß already",
    "Ⱥll Ⱦricky Ʉber Ʌmbda", "ЀЁЂЃ ѐёђѓ", "㐀㐁\u3040\u30ff",
    "\uf900\ufaff edge", "mixЁd漢Ёok",
]


def test_adversarial_equivalence():
    d1, c1, u1, p1 = _old_path(ADVERSARIAL)
    d2, c2, u2, p2 = A._tokenize_standard_arrow(ADVERSARIAL)
    assert _as_token_set(d1, c1, u1, p1) == _as_token_set(d2, c2, u2, p2)
    assert list(u1) == list(u2)


def test_corpus_equivalence():
    from rucene_spark.webtext import make_corpus

    texts = make_corpus(2000, seed=11)["text"].tolist()
    d1, c1, u1, p1 = _old_path(texts)
    d2, c2, u2, p2 = A._tokenize_standard_arrow(texts)
    assert _as_token_set(d1, c1, u1, p1) == _as_token_set(d2, c2, u2, p2)
    assert list(u1) == list(u2)


def test_emission_order_is_doc_ascending():
    # the invert's single-stable-sort fast path requires (doc asc, pos
    # nondecreasing within doc) — including when hazard docs interleave
    texts = ["plain one", "İstanbul hazard", "plain two", "ẞharp", "tail"]
    di, codes, uniques, pos = A._tokenize_standard_arrow(texts)
    assert (np.diff(di) >= 0).all()
    d_di = np.diff(di)
    assert ((np.diff(pos) >= 0) | (d_di > 0)).all()


def test_hazard_set_rederivation():
    """Exhaustively re-derive the hazard set; must equal _STD_HAZARD_RE."""
    word = re.compile("[0-9A-Za-z_\u00c0-\u024f\u0400-\u04ff]")
    cjk = re.compile("[\u3040-\u30ff\u3400-\u9fff\uf900-\ufaff]")
    derived = []
    for cp in range(0x110000):
        c = chr(cp)
        lo = c.lower()
        if cjk.match(c):
            if lo != c:
                derived.append(cp)
        elif word.match(c):
            if len(lo) != 1 or not word.match(lo):
                derived.append(cp)
        elif any(word.match(ch) or cjk.match(ch) for ch in lo):
            derived.append(cp)

    # parse the baked RE2 class back into codepoints
    spans = re.findall(
        r"\\x\{([0-9a-f]+)\}(?:-\\x\{([0-9a-f]+)\})?", A._STD_HAZARD_RE)
    baked = []
    for a, b in spans:
        lo_cp = int(a, 16)
        hi_cp = int(b, 16) if b else lo_cp
        baked.extend(range(lo_cp, hi_cp + 1))
    assert sorted(baked) == derived


def test_arrow_lower_matches_python_for_word_class():
    """utf8_lower and str.lower() must agree on every word-class char the
    fast path keeps (hazards excluded — they take the Python path)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    word = re.compile("[0-9A-Za-z_\u00c0-\u024f\u0400-\u04ff]")
    hazard = re.compile(
        "[\u0130\u0181\u0186\u0189-\u018a\u018f-\u0190\u0193-\u0194"
        "\u0196-\u0197\u019c-\u019d\u019f\u01a6\u01a9\u01ae\u01b1-\u01b2"
        "\u01b7\u023a\u023e\u0244-\u0245\u1e9e\u212a-\u212b\u2c7e-\u2c7f]")
    chars = [chr(cp) for cp in range(0x500)
             if word.match(chr(cp)) and not hazard.match(chr(cp))]
    arrow_low = pc.utf8_lower(pa.array(chars)).to_pylist()
    py_low = [c.lower() for c in chars]
    assert arrow_low == py_low


def test_arrow_lower_class_membership_full_unicode_range():
    """Round-4 ADVICE #2: the fast path lowercases BEFORE tokenizing, so
    a utf8proc/CPython drift ANYWHERE in the codepoint space would only
    matter if it moves a char's lowered form into or out of the word/CJK
    classes differently from str.lower().  Scan the full BMP+SMP cased
    range: for every non-hazard codepoint, utf8_lower and str.lower must
    agree on (a) word-class membership per lowered char and (b) CJK-class
    membership — exact string equality is additionally asserted wherever
    either side's lowered form touches the word class (the only chars the
    tokenizer keeps)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    word = re.compile("[0-9a-z_\u00c0-\u024f\u0400-\u04ff]")
    cjk = re.compile("[\u3040-\u30ff\u3400-\u9fff\uf900-\ufaff]")
    # the module's own hazard class, RE2 \x{...} -> Python chars
    hazard = re.compile(re.sub(
        r"\\x\{([0-9a-f]+)\}", lambda m: chr(int(m.group(1), 16)),
        A._STD_HAZARD_RE))
    chars = []
    for cp in range(0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        c = chr(cp)
        if hazard.match(c):
            continue
        # only chars whose lowering is non-trivial on either side, plus
        # everything already word/CJK-class, can affect tokenization
        if c.lower() != c or word.match(c) or cjk.match(c):
            chars.append(c)
    arrow_low = pc.utf8_lower(pa.array(chars)).to_pylist()
    diverge = []
    for c, al in zip(chars, arrow_low):
        pl = c.lower()
        if al == pl:
            continue
        a_word = "".join(ch for ch in al if word.match(ch))
        p_word = "".join(ch for ch in pl if word.match(ch))
        a_cjk = "".join(ch for ch in al if cjk.match(ch))
        p_cjk = "".join(ch for ch in pl if cjk.match(ch))
        if a_word != p_word or a_cjk != p_cjk:
            diverge.append((hex(ord(c)), al, pl))
    assert not diverge, (
        f"{len(diverge)} codepoints lower into the word/CJK classes "
        f"differently between utf8proc and CPython: {diverge[:10]}")


def test_cap_255_and_dedupe_after_truncation():
    long_a = "x" * 260 + "a"
    long_b = "x" * 260 + "b"  # truncates to the same 255-char prefix
    texts = [f"{long_a} {long_b} short"]
    d2, c2, u2, p2 = A._tokenize_standard_arrow(texts)
    d1, c1, u1, p1 = _old_path(texts)
    assert _as_token_set(d1, c1, u1, p1) == _as_token_set(d2, c2, u2, p2)
    toks = [u2[c] for c in c2.tolist()]
    assert toks[0] == toks[1] == "x" * 255
    assert p2.tolist() == [0, 1, 2]


@pytest.mark.parametrize("doc", ADVERSARIAL[3:])
def test_single_doc_equivalence(doc):
    d1, c1, u1, p1 = _old_path([doc])
    d2, c2, u2, p2 = A._tokenize_standard_arrow([doc])
    assert _as_token_set(d1, c1, u1, p1) == _as_token_set(d2, c2, u2, p2)
