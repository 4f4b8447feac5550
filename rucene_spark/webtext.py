"""Deterministic synthetic webtext corpus + reference query set (FIXTURES.md).

Shape per ``BASELINE.json.input_hint``:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
The html wraps the text exactly, so extraction is an exact inverse — the
per-row byte-identical invariant is testable with a content hash.

Everything derives from one ``numpy.default_rng(seed)`` stream; the same
``(n_docs, seed)`` always yields byte-identical tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .analysis import batch_tokenize

_CJK_POOL = [
    "搜索", "索引", "查询", "分词", "排序", "评分", "文档", "字段",
    "索引器", "检索", "合并", "缓存", "分段", "词项", "倒排", "相似度",
]
_PUNCT = np.array([",", ".", ";", "!", "?"])


def make_corpus(
    n_docs: int,
    seed: int = 42,
    n_sites: int = 500,
    vocab: int = 30_000,
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    site_ids = (rng.zipf(1.3, n_docs) - 1) % n_sites
    urls = np.array(
        [f"https://site{s:04d}.example/{i:08x}" for i, s in enumerate(site_ids)]
    )
    base = np.datetime64("2025-01-01T00:00:00")
    warc_ts = base + rng.integers(0, 180 * 86400, n_docs).astype("timedelta64[s]")
    langs = rng.choice(["en", "zh", "de"], size=n_docs, p=[0.85, 0.10, 0.05])

    lens = np.clip(
        np.round(rng.lognormal(mean=np.log(200.0), sigma=0.6, size=n_docs)),
        5,
        2000,
    ).astype(np.int64)
    total = int(lens.sum())
    tok_ids = (rng.zipf(1.07, total) - 1) % vocab
    toks = np.array([f"t{t:06d}" for t in tok_ids], dtype=object)

    # 0.5% CJK terms, 0.1% over-long (600-byte) tokens, 2% punctuation-attached
    r = rng.random(total)
    cjk_mask = r < 0.005
    toks[cjk_mask] = rng.choice(_CJK_POOL, size=int(cjk_mask.sum()))
    long_mask = (r >= 0.005) & (r < 0.006)
    toks[long_mask] = "x" * 600
    punct_mask = (r >= 0.006) & (r < 0.026)
    toks[punct_mask] = toks[punct_mask] + rng.choice(_PUNCT, size=int(punct_mask.sum()))

    bounds = np.concatenate(([0], np.cumsum(lens)))
    texts = [" ".join(toks[bounds[i]:bounds[i + 1]]) for i in range(n_docs)]

    htmls = [
        b"<html><head><title>"
        + " ".join(t.split(" ")[:5]).encode("utf-8")
        + b"</title></head><body>"
        + t.encode("utf-8")
        + b"</body></html>"
        for t in texts
    ]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(warc_ts),
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def extract_text(html: bytes) -> str:
    """The deterministic html→text extraction whose output must be
    byte-identical to the ``text`` column per url (input_hint invariant)."""
    body = html.split(b"<body>", 1)[1].rsplit(b"</body>", 1)[0]
    return body.decode("utf-8")


def term_df_spectrum(corpus: pd.DataFrame) -> pd.Series:
    """Document frequency per term (for picking query terms)."""
    di, terms, _ = batch_tokenize(corpus["text"].tolist())
    pdf = pd.DataFrame({"d": di, "t": terms})
    return pdf.groupby("t")["d"].nunique().sort_values(ascending=False)


def make_query_strings(corpus: pd.DataFrame) -> list[str]:
    """The "reference query set": deterministic query strings spanning the df
    spectrum (high/mid/rare/absent terms), boolean shapes, boosts, groups and
    phrases — syntax per query_string.rs:60-177 (FIXTURES.md §2)."""
    dfs = term_df_spectrum(corpus)
    plain = [t for t in dfs.index if t.startswith("t0")]
    hi, hi2 = plain[0], plain[1]
    mid = plain[len(plain) // 3]
    mid2 = plain[len(plain) // 3 + 1]
    rare = plain[-1]
    cjk = next((t for t in dfs.index if not t.isascii()), "搜索")
    absent = "tzzzzzz"

    # a real bigram for phrase queries: first two tokens of the longest doc
    longest = corpus.loc[corpus["text"].str.len().idxmax(), "text"].split(" ")
    big1, big2 = longest[0], longest[1]

    return [
        hi,
        mid,
        rare,
        absent,
        cjk,
        f"{hi} {mid}",
        f"{hi} {mid} {rare}",
        f"{hi} +{mid}",
        f"+{hi} +{mid}",
        f"{rare} {absent}",
        f"{hi} +({mid} {mid2})",
        f"({hi}^0.2 | {mid}^2)",
        f"{hi}^0.5 {rare}^3",
        f"+{hi} ({mid} {rare})",
        f'"{big1} {big2}"~0',
        f'"{big1} {big2}"~3',
        f'"{hi} {mid}"~5',
        f"{cjk} {hi}",
        f"+{cjk}",
        f"({hi} {mid}) +({rare} {mid2})",
        f'"{big1} {big2}"^2',
        f"{hi2} {mid2}^0.1",
    ]


def make_query_strings_large(corpus: pd.DataFrame, n: int = 200) -> list[str]:
    """Deterministic extension of :func:`make_query_strings` to ``n``
    distinct queries: the 22 reference shapes first, then term triples
    strided through the full df spectrum rotated over six boolean/boost
    shapes. Used by serving-throughput benches, where a 22-query batch
    is too little work per job to amortize fixed job-dispatch latency."""
    out = list(make_query_strings(corpus))
    dfs = term_df_spectrum(corpus)
    plain = [t for t in dfs.index if t.startswith("t0")]
    seen = set(out)
    i = 0
    while len(out) < n:
        a = plain[(7 * i) % len(plain)]
        b = plain[(13 * i + 3) % len(plain)]
        c = plain[(29 * i + 11) % len(plain)]
        shape = i % 6
        if shape == 0:
            q = f"{a} {b}"
        elif shape == 1:
            q = f"+{a} {b}"
        elif shape == 2:
            q = f"+{a} +{b}"
        elif shape == 3:
            q = f"({a}^2 | {b})"
        elif shape == 4:
            q = f"{a} +({b} {c})"
        else:
            q = f"{a}^0.5 {b}^2 {c}"
        i += 1
        if q in seen:
            continue
        seen.add(q)
        out.append(q)
    return out[:n]
