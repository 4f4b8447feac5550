"""Distributed inverted-index build — the Spark-native ``IndexWriter``.

Dataflow (the Spark re-expression of rucene's build pipeline, SURVEY.md §3.1):

    source df ──(JVM crc32 / range bucketing: segment_id)──▶ shuffle by segment
      ──▶ applyInPandas per segment: tokenize → invert → pack blocks
            → write postings/docmeta/segstats parquet (atomic: tmp + rename,
              done-marker last)  ──▶ manifest rows
      ──▶ global term_stats / collection_stats aggregation (Spark job)
      ──▶ atomic manifest.json

Correspondences (reference @ /root/reference):

* one Spark partition group ≡ one DWPT: per-segment doc-id assignment and
  private in-memory inversion (doc_writer_per_thread.rs:68,380);
* the shuffle by ``segment_id`` replaces the TermsHash
  (terms_hash_per_field.rs:37-286) — grouping is Spark's job, numpy does the
  per-segment invert;
* flush → codec (posting_writer.rs:304-455) becomes FOR-128/varint packed
  binary columns (codec.py) in per-segment Parquet, sorted by term so
  Parquet row-group stats give blocktree-like term seeks for free;
* tf is capped at 10 and only capped-freq positions are stored
  (posting_writer.rs:641,649-662);
* norms: byte315(1/sqrt(field_length)) per doc (doc_consumer.rs:813-821),
  denormalized *into* the postings blocks (1 byte/doc) so scoring never
  joins a norms table;
* ``segments_N`` two-phase commit (index_writer.rs:630-640,1725-1810)
  becomes the done-marker + manifest.json rename protocol, which also gives
  per-partition resumability with lineage + throughput metrics (north_rule);
* block-max metadata (max_tf, max_norm_byte per 128-doc block) is our BMW
  addition — the reference stores skip pointers but no impact bounds
  (skip_writer.rs:36-56; SURVEY.md §4.3).

Scale posture: the only wide exchange is the one shuffle by ``segment_id``;
global stats aggregate per-segment partials (the segment IS the salt for
hot terms — a stopword contributes ≤ n_segments rows to the final groupBy).
All per-row work is numpy inside Arrow UDFs.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import storage
from .analysis import tokenize_factorized_overlap
from .bm25 import TERM_FREQ_LIMIT
from .codec import BLOCK_SIZE, batch_for_encode, varint_encode_sized
from .smallfloat import encode_norm_value

MANIFEST = "manifest.json"

#: bigram ("common grams") channel constants — hot adjacent term pairs are
#: indexed as extra postings under ``<field>#2`` with term ``a\x1eb`` and
#: position = first-token position, so exact phrases over high-df terms
#: (stopwords under StandardAnalyzer normalization) conjunct over the tiny
#: pair lists instead of the corpus-sized single-term lists.  The reference
#: has no analogue (phrase_query.rs bails only via two-phase match_cost);
#: Lucene's CommonGramsFilter is the public pattern.  Pure acceleration:
#: rank/score identity vs the position-verify paths is test-asserted
#: (tests/test_bigrams.py).
BIGRAM_SEP = "\x1e"
BIGRAM_SUFFIX = "#2"
BIGRAM_DEFAULT_FRAC = 0.05
_BIGRAM_SAMPLE_DOCS = 200_000
_BIGRAM_ANALYZERS = ("whitespace", "standard")

_MANIFEST_ROW_SCHEMA = (
    "segment_id long, status string, docs long, terms long, blocks long, "
    "postings long, ttf long, build_secs double, min_key string, "
    "max_key string, dir string, bytes long"
)

_POSTINGS_PA_SCHEMA = pa.schema(
    [
        ("seg", pa.int32()),
        ("field", pa.string()),
        ("term", pa.string()),
        ("block_id", pa.int32()),
        ("num_docs", pa.int32()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("max_tf", pa.int32()),
        ("max_norm_byte", pa.int32()),
        ("min_dl", pa.int64()),
        ("ttf", pa.int64()),
        ("docs_bin", pa.binary()),
        ("tfs_bin", pa.binary()),
        ("norms_bin", pa.binary()),
        ("dls_bin", pa.binary()),
        ("pos_bin", pa.binary()),
        ("offs_bin", pa.binary()),
        ("pay_bin", pa.binary()),
    ]
)


def _invert_segment(
    pdf: pd.DataFrame, fields: list, key_col: str, analyzer: str,
    index_offsets: bool = False, field_options: dict | None = None,
    bigram_hot: dict[str, frozenset] | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Pure-numpy inversion of one segment → (postings, docmeta, segstats).

    ``fields`` is a list of ``(field_name, source_col)`` pairs — the bag of
    independently indexed fields of the reference's document model
    (field.rs:23-29, doc_consumer.rs:255-320: one PerField inverter per
    named field, each with its own postings, norms and stats). Postings
    and segstats carry a ``field`` column; per-field norms stay
    denormalized into the postings blocks exactly as in the single-field
    layout, so scoring never joins a norms table.
    """
    pdf = pdf.sort_values(key_col, kind="stable").reset_index(drop=True)
    n_docs = len(pdf)
    field_names = [fn for fn, _ in fields]

    docmeta = pdf.drop(columns=[c for _, c in fields]).copy()
    docmeta.insert(0, "doc", np.arange(n_docs, dtype=np.int64))

    post_parts: list[pd.DataFrame] = []
    stat_parts: list[pd.DataFrame] = []
    # deterministic field order (sorted) keeps the postings file sorted by
    # (field, term) for parquet row-group pruning
    for fname, col in sorted(fields):
        postings_f, stats_f, lens, norm_bytes, pair_out = _invert_field(
            pdf[col].tolist(), n_docs, fname, analyzer, index_offsets,
            (field_options or {}).get(fname, "positions"),
            (bigram_hot or {}).get(fname))
        suffix = "" if fname == field_names[0] else f"_{fname}"
        docmeta[f"doc_len{suffix}"] = lens
        docmeta[f"norm_byte{suffix}"] = norm_bytes
        if len(postings_f):
            post_parts.append(postings_f)
            stat_parts.append(stats_f)
        if pair_out is not None:
            # pair channel rides immediately after its base field; the
            # "#2" suffix byte-sorts between "<fname>" and any other
            # field name, keeping the file's (field, term) grouping
            post_parts.append(pair_out[0])
            stat_parts.append(pair_out[1])

    if not post_parts:
        empty = pd.DataFrame({f.name: [] for f in _POSTINGS_PA_SCHEMA})
        stats = pd.DataFrame(
            {"field": [], "term": [], "df": [], "ttf": [], "max_tf": [],
             "max_norm_byte": [], "min_dl": []}
        )
        return empty, docmeta, stats
    postings = pd.concat(post_parts, ignore_index=True)
    segstats = pd.concat(stat_parts, ignore_index=True)
    return postings, docmeta, segstats


def _encode_block_stream(vals: np.ndarray, n_blocks: int, full: np.ndarray,
                         block_of_run: np.ndarray, num_docs: np.ndarray,
                         blk_starts: np.ndarray) -> list[bytes]:
    """Per-block bytes: FOR for full 128-blocks, batched varint tail
    for partials (same bytes as per-block pack_ints)."""
    out: list[bytes] = [b""] * n_blocks
    run_is_part = ~full[block_of_run]
    buf, nbytes = varint_encode_sized(vals[run_is_part])
    part_idx = np.flatnonzero(~full)
    part_counts = num_docs[part_idx]
    v_ends = np.cumsum(part_counts)
    v_starts = v_ends - part_counts
    byte_off = np.concatenate(([0], np.cumsum(nbytes)))
    raw = buf.tobytes()
    b_lo = byte_off[v_starts]
    b_hi = byte_off[v_ends]
    for j in range(part_idx.size):
        out[part_idx[j]] = b"V" + raw[b_lo[j]:b_hi[j]]
    full_idx = np.flatnonzero(full)
    if full_idx.size:
        gather = (blk_starts[full_idx][:, None]
                  + np.arange(BLOCK_SIZE)).reshape(-1)
        for bi, enc in zip(full_idx, batch_for_encode(vals[gather])):
            out[bi] = b"F" + enc
    return out


def _invert_pairs(di: np.ndarray, codes: np.ndarray, uniques, pos: np.ndarray,
                  ordinals: np.ndarray, lens: np.ndarray,
                  norm_bytes: np.ndarray, fname: str, hot: frozenset):
    """Hot-pair bigram channel for one field of one segment.

    Emits postings under field ``fname#2`` with term ``a\\x1eb`` for every
    adjacent occurrence (a@p, b@p+1) where BOTH terms are in the ``hot``
    vocabulary.  Pair occurrences are counted over the tf-capped
    single-term position lists (ordinal < TERM_FREQ_LIMIT on both sides),
    so ``pair tf == |capped_pos(a) ∩ (capped_pos(b) − 1)|`` — exactly the
    phrase freq the position-verify paths compute; a phrase served from
    this channel is freq- and score-identical.  Norms/dls are the BASE
    field's (phrase scoring uses the field norm).  Pair tf can never
    exceed TERM_FREQ_LIMIT (intersection of two capped lists), so the
    position stream is complete and uncapped by construction.

    Returns ``(postings, segstats)`` DataFrames or ``None`` when the
    segment has no hot-pair occurrence.
    """
    if di.size < 2 or not hot:
        return None
    hot_u = np.fromiter((u in hot for u in uniques), dtype=bool,
                        count=len(uniques))
    if not hot_u.any():
        return None
    cap_ok = ordinals < TERM_FREQ_LIMIT
    left = np.flatnonzero(
        (di[1:] == di[:-1]) & (pos[1:] == pos[:-1] + 1)
        & hot_u[codes[1:]] & hot_u[codes[:-1]]
        & cap_ok[1:] & cap_ok[:-1])
    if left.size == 0:
        return None
    n_u = np.int64(len(uniques))
    comb = codes[left].astype(np.int64) * n_u + codes[left + 1].astype(np.int64)
    # emission order is doc-major / position-ascending (asserted by the
    # caller), so ONE stable sort by pair code yields (pair, doc, pos)
    porder = np.argsort(comb, kind="stable")
    c_s = comb[porder]
    d_s = di[left][porder]
    p_s = pos[left][porder]

    new_pair = np.empty(c_s.size, dtype=bool)
    new_pair[0] = True
    new_pair[1:] = c_s[1:] != c_s[:-1]
    new_doc = np.empty(c_s.size, dtype=bool)
    new_doc[0] = True
    new_doc[1:] = new_pair[1:] | (d_s[1:] != d_s[:-1])
    run_starts = np.flatnonzero(new_doc)
    run_ends = np.append(run_starts[1:], c_s.size)
    tf = (run_ends - run_starts).astype(np.int64)  # ≤ TERM_FREQ_LIMIT

    run_pair = c_s[run_starts]
    run_doc = d_s[run_starts]
    run_norm = norm_bytes[run_doc]
    run_dl = lens[run_doc]

    pair_starts = np.flatnonzero(new_pair[run_starts])
    pair_ends = np.append(pair_starts[1:], run_starts.size)
    runs_per_pair = pair_ends - pair_starts

    n_runs = run_starts.size
    idx_in_pair = np.arange(n_runs) - np.repeat(pair_starts, runs_per_pair)
    is_blk_start = (idx_in_pair % BLOCK_SIZE) == 0
    blk_starts = np.flatnonzero(is_blk_start)
    blk_ends = np.append(blk_starts[1:], n_runs)
    n_blocks = blk_starts.size
    num_docs = (blk_ends - blk_starts).astype(np.int64)
    full = num_docs == BLOCK_SIZE
    block_of_run = np.cumsum(is_blk_start) - 1

    uniq_arr = np.asarray(uniques, dtype=object)
    pair_term_of = {}

    def _pt(c: np.int64) -> str:
        s = pair_term_of.get(c)
        if s is None:
            s = (uniq_arr[int(c) // int(n_u)] + BIGRAM_SEP
                 + uniq_arr[int(c) % int(n_u)])
            pair_term_of[c] = s
        return s

    blk_terms = np.asarray([_pt(c) for c in run_pair[blk_starts]],
                           dtype=object)
    blk_block_id = (idx_in_pair[blk_starts] // BLOCK_SIZE).astype(np.int64)

    gaps = np.empty(n_runs, dtype=np.uint64)
    gaps[0] = run_doc[0]
    gaps[1:] = (run_doc[1:] - run_doc[:-1]).astype(np.uint64)
    gaps[blk_starts] = run_doc[blk_starts].astype(np.uint64)

    def enc(vals: np.ndarray) -> list[bytes]:
        return _encode_block_stream(vals, n_blocks, full, block_of_run,
                                    num_docs, blk_starts)

    # per-doc position delta chains (first absolute), like the base field
    pos_u = p_s.astype(np.uint64)
    pdeltas = np.empty(pos_u.size, dtype=np.uint64)
    pdeltas[0] = pos_u[0]
    pdeltas[1:] = pos_u[1:] - pos_u[:-1]
    run_pos_starts = np.cumsum(tf) - tf
    pdeltas[run_pos_starts] = pos_u[run_pos_starts]
    pbuf, pnbytes = varint_encode_sized(pdeltas)
    praw = pbuf.tobytes()
    pos_offsets = np.append(run_pos_starts, pos_u.size)
    pbyte_off = np.concatenate(([0], np.cumsum(pnbytes)))
    p_lo = pbyte_off[pos_offsets[blk_starts]]
    p_hi = pbyte_off[pos_offsets[blk_ends]]
    pos_bins = [praw[p_lo[b]:p_hi[b]] for b in range(n_blocks)]

    pfield = fname + BIGRAM_SUFFIX
    postings = pd.DataFrame(
        {
            "field": pfield,
            "term": blk_terms,
            "block_id": blk_block_id,
            "num_docs": num_docs,
            "first_doc": run_doc[blk_starts],
            "last_doc": run_doc[blk_ends - 1],
            "max_tf": np.maximum.reduceat(tf, blk_starts),
            "max_norm_byte": np.maximum.reduceat(run_norm, blk_starts),
            "min_dl": np.minimum.reduceat(run_dl, blk_starts),
            "ttf": np.add.reduceat(tf, blk_starts),
            "docs_bin": enc(gaps),
            "tfs_bin": enc(tf.astype(np.uint64)),
            "norms_bin": enc(run_norm.astype(np.uint64)),
            "dls_bin": enc(run_dl.astype(np.uint64)),
            "pos_bin": pos_bins,
            "offs_bin": [b""] * n_blocks,
            "pay_bin": [b""] * n_blocks,
        }
    )
    segstats = pd.DataFrame(
        {
            "field": pfield,
            "term": np.asarray([_pt(c) for c in run_pair[pair_starts]],
                               dtype=object),
            "df": runs_per_pair.astype(np.int64),
            "ttf": np.add.reduceat(tf, pair_starts).astype(np.int64),
            "max_tf": np.maximum.reduceat(tf, pair_starts).astype(np.int64),
            "max_norm_byte": np.maximum.reduceat(
                run_norm, pair_starts).astype(np.int64),
            "min_dl": np.minimum.reduceat(run_dl, pair_starts).astype(np.int64),
        }
    )
    return postings, segstats


def _invert_field(
    texts: list, n_docs: int, fname: str, analyzer: str,
    index_offsets: bool = False, index_options: str = "positions",
    bigram_hot: frozenset | None = None,
):
    """Invert one field of one segment → (postings, segstats, lens, norms).

    Overlap tokens (pos_incr = 0, e.g. synonym expansions) index and match
    like any other token but are EXCLUDED from the field length used for
    norms/dl (doc_consumer.rs:906-926 ``num_overlap``;
    bm25_similarity.rs:86 ``num_terms = length - num_overlap``).

    ``index_options`` mirrors the reference's per-field posting levels
    (index_options.rs:18-24): ``"positions"`` (full, the default),
    ``"freqs"`` (docs + term frequencies, no position stream — phrase/span
    queries on the field are an error), ``"docs"`` (docs only: stored tf
    is the constant 1, so freq()==1 and totalTermFreq==docFreq, exactly
    the reference's DOCS degradation; BM25 then scores with freq=1 while
    norms still encode the true field length). Lower levels skip the
    position bytes entirely — a docs-only tag/keyword field pays no
    positional storage."""
    pays = None
    if analyzer.startswith("delimited_payload"):
        # payloads channel (posting_reader.rs payload(); Lucene's
        # DelimitedPayloadTokenFilter pattern) — per-position bytes ride
        # a pay_bin sidecar exactly like the offsets channel
        from .analysis import tokenize_factorized_payload
        di, codes, uniques, pos, pays = tokenize_factorized_payload(
            texts, analyzer)
        overlap = None
        off_s = off_e = None
    elif index_offsets and index_options == "positions":
        # offsets channel (IndexOptions::DocsAndFreqsAndPositionsAndOffsets,
        # index_options.rs:18-24): per-token char offsets ride along the
        # stream and land in a per-block `offs_bin` sidecar; the
        # offset-free factorized path stays the hot default
        from .analysis import _factorize_sorted, batch_tokenize_offsets
        di, terms_o, pos, off_s, off_e = batch_tokenize_offsets(
            texts, mode=analyzer)
        codes, uniques = _factorize_sorted(terms_o)
        overlap = None
    else:
        di, codes, uniques, pos, overlap = tokenize_factorized_overlap(
            texts, mode=analyzer)
        off_s = off_e = None

    lens = np.zeros(n_docs, dtype=np.int64)
    if di.size:
        np.add.at(lens, di if overlap is None else di[~overlap], 1)
    norm_bytes = encode_norm_value(1.0, np.maximum(lens, 1)).astype(np.int64)
    norm_bytes[lens == 0] = 0

    if di.size == 0:
        empty = pd.DataFrame({f.name: [] for f in _POSTINGS_PA_SCHEMA})
        stats = pd.DataFrame(
            {"field": [], "term": [], "df": [], "ttf": [], "max_tf": [],
             "max_norm_byte": [], "min_dl": []}
        )
        return empty, stats, lens, norm_bytes, None

    # invert: sort token stream by (term, doc, position) — terms arrive
    # already factorized to sorted int codes (tokenize_factorized). The
    # tokenizers emit in (doc asc, position nondecreasing) order, so ONE
    # stable argsort on the codes yields the full (term, doc, pos) order;
    # synonym-mode overlap tokens are appended after the base stream
    # (positions jump back), so the order is CHECKED, not assumed, and
    # the 3-key lexsort remains the fallback — identical output either
    # way (both are stable over emission order).
    d_di = np.diff(di)
    emission_sorted = bool((d_di >= 0).all()) and bool(
        ((np.diff(pos) >= 0) | (d_di > 0)).all())
    order = (np.argsort(codes, kind="stable") if emission_sorted
             else np.lexsort((pos, di, codes)))
    t_s, d_s, p_s = codes[order], di[order], pos[order]
    # bigram channel eligibility: positions level, no payloads, no overlap
    # tokens (pos_incr=0 would break stream adjacency == positional
    # adjacency), doc-major emission (holds for the gated analyzers)
    build_pairs = (
        bigram_hot is not None
        and index_options == "positions"
        and pays is None
        and (overlap is None or not overlap.any())
        and emission_sorted)
    # run starts of (term, doc) pairs
    new_term = np.empty(t_s.size, dtype=bool)
    new_term[0] = True
    new_term[1:] = t_s[1:] != t_s[:-1]
    new_doc = np.empty(t_s.size, dtype=bool)
    new_doc[0] = True
    new_doc[1:] = new_term[1:] | (d_s[1:] != d_s[:-1])
    run_starts = np.flatnonzero(new_doc)
    run_ends = np.append(run_starts[1:], t_s.size)
    tf_raw = run_ends - run_starts
    pair_out = None
    if build_pairs:
        # occurrence ordinal of every stream token within its (term, doc)
        # run, position-ordered — the pair channel only counts adjacencies
        # whose BOTH sides survive the tf cap, matching verify semantics
        ordinals = np.empty(di.size, dtype=np.int64)
        ordinals[order] = np.arange(di.size) - np.repeat(run_starts, tf_raw)
        pair_out = _invert_pairs(di, codes, uniques, pos, ordinals,
                                 lens, norm_bytes, fname, bigram_hot)
    tf = np.minimum(tf_raw, TERM_FREQ_LIMIT)
    if index_options == "docs":
        # DOCS level: only membership is stored — freq()==1 everywhere,
        # ttf==df, max_tf==1 (index_options.rs DOCS semantics)
        tf = np.ones_like(tf)

    run_term = t_s[run_starts]
    run_doc = d_s[run_starts]
    run_norm = norm_bytes[run_doc]
    run_dl = lens[run_doc]

    if index_options == "positions":
        # capped position slices per (term, doc) run
        within = np.arange(t_s.size) - np.repeat(run_starts, tf_raw)
        keep = within < TERM_FREQ_LIMIT
        pos_capped = p_s[keep]
        if off_s is not None:
            offs_capped = off_s[order][keep]
            offe_capped = off_e[order][keep]
        if pays is not None:
            pays_capped = pays[order][keep]

    # term boundaries over the runs
    term_starts = np.flatnonzero(new_term[run_starts])
    term_ends = np.append(term_starts[1:], run_starts.size)

    # ---- fully vectorized block assembly: one varint pass per stream for
    # the whole segment (a per-block encode call would dominate build time —
    # hundreds of thousands of tiny numpy calls per segment)
    n_runs = run_starts.size
    n_terms = term_starts.size
    runs_per_term = term_ends - term_starts
    idx_in_term = np.arange(n_runs) - np.repeat(term_starts, runs_per_term)
    is_blk_start = (idx_in_term % BLOCK_SIZE) == 0
    blk_starts = np.flatnonzero(is_blk_start)
    blk_ends = np.append(blk_starts[1:], n_runs)
    n_blocks = blk_starts.size
    num_docs = (blk_ends - blk_starts).astype(np.int64)
    full = num_docs == BLOCK_SIZE
    block_of_run = np.cumsum(is_blk_start) - 1

    uniq_arr = np.asarray(uniques, dtype=object)
    blk_terms = uniq_arr[run_term[blk_starts]]
    blk_block_id = (idx_in_term[blk_starts] // BLOCK_SIZE).astype(np.int64)

    # in-block doc gaps (first absolute): cross-boundary diffs are
    # overwritten with the absolute first doc, so wraparound is harmless
    gaps = np.empty(n_runs, dtype=np.uint64)
    if n_runs:
        gaps[0] = run_doc[0]
        gaps[1:] = (run_doc[1:] - run_doc[:-1]).astype(np.uint64)
        gaps[blk_starts] = run_doc[blk_starts].astype(np.uint64)

    def encode_stream(vals: np.ndarray) -> list[bytes]:
        return _encode_block_stream(vals, n_blocks, full, block_of_run,
                                    num_docs, blk_starts)

    tf_u = tf.astype(np.uint64)
    if index_options != "positions":
        # freqs/docs levels carry no position (or offset) stream at all
        pos_bins = [b""] * n_blocks
    else:
        # positions: per-doc delta chains (first position absolute), batched
        pos_u = pos_capped.astype(np.uint64)
        pdeltas = np.empty(pos_u.size, dtype=np.uint64)
        if pos_u.size:
            pdeltas[0] = pos_u[0]
            pdeltas[1:] = pos_u[1:] - pos_u[:-1]
            run_pos_starts = np.cumsum(tf) - tf
            nz = tf > 0
            pdeltas[run_pos_starts[nz]] = pos_u[run_pos_starts[nz]]
        else:
            run_pos_starts = np.zeros(n_runs, dtype=np.int64)
        pbuf, pnbytes = varint_encode_sized(pdeltas)
        praw = pbuf.tobytes()
        pos_offsets = np.append(np.cumsum(tf) - tf, pos_u.size)
        pbyte_off = np.concatenate(([0], np.cumsum(pnbytes)))
        p_lo = pbyte_off[pos_offsets[blk_starts]]
        p_hi = pbyte_off[pos_offsets[blk_ends]]
        pos_bins = [praw[p_lo[b]:p_hi[b]] for b in range(n_blocks)]

    if off_s is not None and index_options == "positions":
        # interleaved (start, end-start) varints, one pass for the whole
        # segment, sliced per block at 2x the position boundaries
        inter = np.empty(2 * offs_capped.size, dtype=np.uint64)
        inter[0::2] = offs_capped.astype(np.uint64)
        inter[1::2] = (offe_capped - offs_capped).astype(np.uint64)
        obuf, onbytes = varint_encode_sized(inter)
        oraw = obuf.tobytes()
        obyte_off = np.concatenate(([0], np.cumsum(onbytes)))
        o_lo = obyte_off[2 * pos_offsets[blk_starts]]
        o_hi = obyte_off[2 * pos_offsets[blk_ends]]
        offs_bins = [oraw[o_lo[b]:o_hi[b]] for b in range(n_blocks)]
    else:
        offs_bins = [b""] * n_blocks

    if pays is not None and index_options == "positions":
        from .codec import batch_pack_payloads
        pay_bins = batch_pack_payloads(list(pays_capped), tf, num_docs)
    else:
        pay_bins = [b""] * n_blocks

    postings = pd.DataFrame(
        {
            "field": fname,
            "term": blk_terms,
            "block_id": blk_block_id,
            "num_docs": num_docs,
            "first_doc": run_doc[blk_starts],
            "last_doc": run_doc[blk_ends - 1],
            "max_tf": np.maximum.reduceat(tf, blk_starts) if n_blocks else [],
            "max_norm_byte": np.maximum.reduceat(run_norm, blk_starts) if n_blocks else [],
            "min_dl": np.minimum.reduceat(run_dl, blk_starts) if n_blocks else [],
            "ttf": np.add.reduceat(tf, blk_starts) if n_blocks else [],
            "docs_bin": encode_stream(gaps),
            "tfs_bin": encode_stream(tf_u),
            "norms_bin": encode_stream(run_norm.astype(np.uint64)),
            "dls_bin": encode_stream(run_dl.astype(np.uint64)),
            "pos_bin": pos_bins,
            "offs_bin": offs_bins,
            "pay_bin": pay_bins,
        }
    )
    segstats = pd.DataFrame(
        {
            "field": fname,
            "term": uniq_arr[run_term[term_starts]],
            "df": runs_per_term.astype(np.int64),
            "ttf": np.add.reduceat(tf, term_starts).astype(np.int64),
            "max_tf": np.maximum.reduceat(tf, term_starts).astype(np.int64),
            "max_norm_byte": np.maximum.reduceat(run_norm, term_starts).astype(np.int64),
            "min_dl": np.minimum.reduceat(run_dl, term_starts).astype(np.int64),
        }
    )
    return postings, segstats, lens, norm_bytes, pair_out


#: commit-critical dir publish — routed through the storage seam
#: (rucene_spark.storage) so an object-store port swaps one module
_atomic_write_dir = storage.publish_dir


def _build_segment_files(
    pdf: pd.DataFrame,
    index_dir: str,
    fields: list,
    key_col: str,
    analyzer: str,
    index_offsets: bool = False,
    field_options: dict | None = None,
    bigram_hot: dict[str, frozenset] | None = None,
) -> pd.DataFrame:
    """applyInPandas body: build + persist one segment, return manifest row.

    Resumable: if the segment's done-marker exists, the previous result is
    returned untouched (north_rule per-partition checkpoint).
    """
    seg = int(pdf["segment_id"].iloc[0])
    marker = os.path.join(index_dir, "markers", f"seg-{seg}.json")
    if storage.exists(marker):
        row = json.loads(storage.read_text(marker))
        row.setdefault("bytes", 0)  # markers from before the field existed
        return pd.DataFrame([row])

    t0 = time.time()
    pdf = pdf.drop(columns=["segment_id"])
    postings, docmeta, segstats = _invert_segment(
        pdf, fields, key_col, analyzer, index_offsets, field_options,
        bigram_hot)
    # `seg` is stored IN the files (constant column, ~free under RLE): the
    # manifest — not directory discovery — decides which dirs are live,
    # which is what makes every publish a single atomic manifest swap
    # (the segments_N commit-point discipline, index_writer.rs:630-640)
    postings.insert(0, "seg", np.int32(seg))
    docmeta.insert(0, "seg", np.int32(seg))
    segstats.insert(0, "seg", np.int32(seg))
    dirname = f"seg-{seg}-base"

    _atomic_write_dir(
        lambda d: storage.write_parquet(
            pa.Table.from_pandas(postings, schema=_POSTINGS_PA_SCHEMA, preserve_index=False),
            os.path.join(d, "part-0.parquet"),
            row_group_size=16384,
        ),
        os.path.join(index_dir, "postings", dirname),
    )
    dm_table = pa.Table.from_pandas(docmeta, preserve_index=False)
    # Spark cannot read TIMESTAMP(NANOS); downcast any ns timestamps to us
    for i, f in enumerate(dm_table.schema):
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
            dm_table = dm_table.set_column(
                i, f.name, dm_table.column(i).cast(pa.timestamp("us", f.type.tz))
            )
    _atomic_write_dir(
        lambda d: storage.write_parquet(
            dm_table, os.path.join(d, "part-0.parquet")),
        os.path.join(index_dir, "docmeta", dirname),
    )
    _atomic_write_dir(
        lambda d: storage.write_parquet(
            pa.Table.from_pandas(segstats, preserve_index=False),
            os.path.join(d, "part-0.parquet"),
        ),
        os.path.join(index_dir, "segstats", dirname),
    )

    keys = pdf[key_col].astype(str)
    row = {
        "segment_id": seg,
        "status": "built",
        "docs": len(pdf),
        "terms": len(segstats),
        "blocks": len(postings),
        "postings": int(segstats["df"].sum()) if len(segstats) else 0,
        "ttf": int(segstats["ttf"].sum()) if len(segstats) else 0,
        "build_secs": time.time() - t0,
        "min_key": keys.min() if len(keys) else "",
        "max_key": keys.max() if len(keys) else "",
        "dir": dirname,
        # recorded so the merge policy sizes segments from manifest
        # metadata alone (no filesystem walk on the maintenance path)
        "bytes": sum(
            storage.dir_size(os.path.join(index_dir, sub, dirname))
            for sub in ("postings", "docmeta", "segstats")),
    }
    storage.atomic_write_text(marker, json.dumps(row))
    return pd.DataFrame([row])


_BIGRAM_DOCS_SENTINEL = "\x00docs"


def _sample_bigram_vocab(df: DataFrame, fields: list, field_options: dict,
                         analyzer: str, frac: float) -> dict[str, list[str]]:
    """Estimate the hot vocabulary (df ≥ ``frac`` of docs) per field from a
    bounded sample, using the REAL tokenizer inside mapInPandas.

    Scale shape: the sample is capped at ``_BIGRAM_SAMPLE_DOCS`` docs
    regardless of corpus size (df-fraction estimation needs only a bounded
    sample — at 200k docs the ±error on a 5%-df term is < 0.2% absolute),
    and the driver collect is pre-filtered to candidate-hot terms plus one
    sentinel row, so it is metadata-bounded (≤ ~avgdl/frac rows).  The hot
    set is frozen into the index (manifest + sidecar) at initial build;
    delta segments reuse it, so channel completeness is a global
    invariant the query side can rely on.
    """
    n = df.count()
    samp_frac = min(1.0, _BIGRAM_SAMPLE_DOCS / max(n, 1))
    n_expected = max(1, int(n * samp_frac))
    out: dict[str, list[str]] = {}
    for fname, col in fields:
        if field_options.get(fname, "positions") != "positions":
            continue
        sample = (df.select(col) if samp_frac >= 1.0
                  else df.select(col).sample(False, samp_frac, seed=7))
        analyzer_, col_ = analyzer, col

        def fn(batches):
            for pdf in batches:
                texts = pdf[col_].tolist()
                di, codes, uniques, _pos, _ov = tokenize_factorized_overlap(
                    texts, mode=analyzer_)
                if di.size:
                    n_u = np.int64(len(uniques))
                    uk = np.unique(di.astype(np.int64) * n_u
                                   + codes.astype(np.int64))
                    uc, cnt = np.unique(uk % n_u, return_counts=True)
                    terms = [uniques[int(i)] for i in uc]
                else:
                    terms, cnt = [], np.empty(0, dtype=np.int64)
                yield pd.DataFrame(
                    {"term": [_BIGRAM_DOCS_SENTINEL] + terms,
                     "df": np.concatenate(([len(pdf)], cnt))})

        # pre-filter at 60% of the expected threshold (sampling slack),
        # exact-filter driver-side with the true sampled doc count
        pre = int(frac * 0.6 * n_expected)
        rows = (sample.mapInPandas(fn, "term string, df long")
                .groupBy("term").agg(F.sum("df").alias("df"))
                .filter((F.col("term") == _BIGRAM_DOCS_SENTINEL)
                        | (F.col("df") >= pre))
                .collect())
        n_sampled = sum(int(r["df"]) for r in rows
                        if r["term"] == _BIGRAM_DOCS_SENTINEL)
        cut = frac * max(n_sampled, 1)
        out[fname] = sorted(
            r["term"] for r in rows
            if r["term"] != _BIGRAM_DOCS_SENTINEL and int(r["df"]) >= cut)
    return out


def load_bigram_vocab(index_dir: str, manifest: dict
                      ) -> dict[str, frozenset] | None:
    """Hot vocabulary of a bigram-enabled index (None when disabled)."""
    bg = manifest.get("bigrams")
    if not bg:
        return None
    path = os.path.join(index_dir, "bigram_vocab", bg["dir"],
                        "part-0.parquet")
    tbl = storage.read_parquet(path)
    fields = tbl.column("field").to_pylist()
    terms = tbl.column("term").to_pylist()
    out: dict[str, set] = {}
    for f_, t in zip(fields, terms):
        out.setdefault(f_, set()).add(t)
    return {f_: frozenset(s) for f_, s in out.items()}


class IndexWriter:
    """Builds a persistent index directory from a DataFrame of documents."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        n_segments: int = 8,
        key_col: str = "url",
        text_col: str = "text",
        field: str = "text",
        analyzer: str = "whitespace",
        partitioner: str = "hash",
        store_cols: list[str] | None = None,
        fields: list[tuple[str, str]] | None = None,
        index_offsets: bool = False,
        bigrams: float | bool | None = None,
    ) -> None:
        """``fields`` is the multi-field document model: a list of
        ``(field_name, source_col)`` pairs, each independently indexed with
        its own postings/norms/stats (field.rs:23-29). Defaults to the
        single ``(field, text_col)`` pair for back-compat. An entry may
        carry a third element — the field's index-options level
        (index_options.rs:18-24): ``"positions"`` (default), ``"freqs"``,
        or ``"docs"``; lower levels skip the position bytes and make
        phrase/span queries on the field an error."""
        self.spark = spark
        self.index_dir = index_dir
        self.n_segments = n_segments
        self.key_col = key_col
        raw_fields = list(fields) if fields else [(field, text_col)]
        self.fields: list[tuple[str, str]] = []
        self.field_options: dict[str, str] = {}
        for spec in raw_fields:
            fn, col = spec[0], spec[1]
            opt = spec[2] if len(spec) > 2 else "positions"
            if opt not in ("docs", "freqs", "positions"):
                raise ValueError(
                    f"unknown index options {opt!r} for field {fn!r}"
                    " (expected docs | freqs | positions)")
            if index_offsets and opt != "positions":
                raise ValueError(
                    f"index_offsets requires positions, but field {fn!r}"
                    f" is indexed at level {opt!r}")
            self.fields.append((fn, col))
            self.field_options[fn] = opt
        if len({fn for fn, _ in self.fields}) != len(self.fields):
            raise ValueError(f"duplicate field names: {self.fields}")
        self.text_col = self.fields[0][1]
        self.field = self.fields[0][0]
        if index_offsets and analyzer.startswith("delimited_payload"):
            raise ValueError(
                "index_offsets and delimited_payload are mutually"
                " exclusive (char offsets of payload-stripped tokens are"
                " not recoverable)")
        self.analyzer = analyzer
        self.partitioner = partitioner
        self.store_cols = store_cols
        self.index_offsets = index_offsets
        # hot-pair bigram channel (module constants above): True → default
        # hot-df fraction, float → that fraction, None/False → off
        if bigrams is True:
            bigrams = BIGRAM_DEFAULT_FRAC
        if bigrams:
            if analyzer not in _BIGRAM_ANALYZERS:
                raise ValueError(
                    f"bigrams requires analyzer in {_BIGRAM_ANALYZERS}"
                    f" (got {analyzer!r}: overlap/payload token streams"
                    " break positional-adjacency extraction)")
            if not (0.0 < float(bigrams) < 1.0):
                raise ValueError(f"bigrams fraction must be in (0, 1):"
                                 f" {bigrams!r}")
            for fn_, _ in self.fields:
                if BIGRAM_SUFFIX in fn_ or BIGRAM_SEP in fn_:
                    raise ValueError(
                        f"field name {fn_!r} collides with the bigram"
                        f" channel namespace ({BIGRAM_SUFFIX!r})")
        self.bigram_frac: float | None = float(bigrams) if bigrams else None

    def _check_manifest_compat(self, m: dict) -> None:
        """Delta segments must agree with the existing index's analysis
        and posting levels — a writer constructed with, say, the default
        ``"positions"`` level appending to a docs-level index would make
        ``_check_positions`` gating and tf semantics diverge PER SEGMENT
        (the mirror of the duplicate-field / offsets guards in
        ``__init__``; Lucene raises the same way on a FieldType clash)."""
        man_an = m.get("analyzer", "whitespace")
        if man_an != self.analyzer:
            raise ValueError(
                f"writer analyzer {self.analyzer!r} does not match the"
                f" index manifest's {man_an!r}; delta segments would be"
                " tokenized differently than the base index")
        man_offs = bool(m.get("index_offsets", False))
        if man_offs != self.index_offsets:
            raise ValueError(
                f"writer index_offsets={self.index_offsets} does not match"
                f" the index manifest's {man_offs}")
        man_fopts = m.get("field_index_options") or {}
        for fn, _ in self.fields:
            man_level = man_fopts.get(fn, "positions")
            if man_level != self.field_options.get(fn, "positions"):
                raise ValueError(
                    f"field {fn!r}: writer index options"
                    f" {self.field_options.get(fn)!r} do not match the"
                    f" index manifest's {man_level!r}")

    @property
    def _field_cols(self) -> list[str]:
        return [c for _, c in self.fields]

    def _with_segment_id(self, df: DataFrame) -> DataFrame:
        key = F.col(self.key_col)
        if self.partitioner == "hash":
            # JVM-side crc32 (zlib-compatible) — no Python in this stage
            seg = F.crc32(F.encode(key.cast("string"), "UTF-8")) % self.n_segments
        elif self.partitioner == "range":
            lo, hi = df.agg(F.min(key), F.max(key)).first()
            width = int(hi) - int(lo) + 1
            seg = ((key.cast("long") - int(lo)) * self.n_segments / width).cast("long")
            seg = F.least(seg, F.lit(self.n_segments - 1))
        else:
            raise ValueError(self.partitioner)
        return df.withColumn("segment_id", seg.cast("long"))

    def add_documents(self, df: DataFrame, n_segments: int | None = None) -> dict:
        """Append new delta segments to an existing index — the Spark
        analogue of rucene's NRT story (new docs become new segments
        published by a commit; index_writer.rs:376,677). Readers opened
        after the manifest swap see the new docs; global term/collection
        stats are re-aggregated over all segments.
        """
        m = load_manifest(self.index_dir)
        self._check_manifest_compat(m)
        # allocate NEW ids from the monotone counter (never the current
        # max — a merge can shrink max below a previously used id, and a
        # reused id would match its predecessor's stale resume marker)
        base = int(m.get(
            "segment_counter",
            max(s["segment_id"] for s in m["segments"]) + 1))
        n_new = n_segments or self.n_segments

        # same stored-column projection as build() — delta segments must
        # not diverge from the base docmeta schema
        extra = self._extra_cols(df)
        key = F.col(self.key_col)
        seg = (F.crc32(F.encode(key.cast("string"), "UTF-8")) % n_new
               + F.lit(base)).cast("long")
        src = df.select(self.key_col, *self._field_cols, *extra).withColumn(
            "segment_id", seg)

        index_dir, fields, key_col, analyzer, ioffs, fopts = (
            self.index_dir, self.fields, self.key_col, self.analyzer,
            self.index_offsets, self.field_options)
        # delta segments inherit the index's FROZEN hot vocabulary (the
        # pair channel must stay complete across the whole index for the
        # query-side rewrite to be sound), regardless of writer params
        bighot = load_bigram_vocab(self.index_dir, m)

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            return _build_segment_files(pdf, index_dir, fields, key_col,
                                        analyzer, ioffs, fopts, bighot)

        rows = (src.groupBy("segment_id")
                .applyInPandas(fn, _MANIFEST_ROW_SCHEMA).collect())
        new_rows = sorted((r.asDict() for r in rows),
                          key=lambda r: r["segment_id"])
        # delta segments get a fresh generation: buffered deletes recorded
        # before this commit never apply to them (the delete-then-reindex
        # flow; DocumentsWriterDeleteQueue sequence-number analogue)
        gen = int(m.get("gen_counter", 0)) + 1
        for r in new_rows:
            r["status"] = "delta"
            r["gen"] = gen

        m["segments"] = m["segments"] + new_rows
        m["gen_counter"] = gen
        m["segment_counter"] = base + n_new
        m["doc_count"] = int(sum(s["docs"] for s in m["segments"]))
        # authoritative recompute over all segments' stat partials
        field_stats, ts_name = write_term_stats(
            self.spark, self.index_dir, max(1, len(m["segments"]) // 4), m)
        m["field_stats"] = field_stats
        m["term_stats_dir"] = ts_name
        m["sum_ttf"] = field_stats.get(self.field, {}).get("sum_ttf", 0)
        write_manifest(self.index_dir, m)
        return m

    def _extra_cols(self, df: DataFrame) -> list[str]:
        reserved = {self.key_col, *self._field_cols}
        if self.store_cols is not None:
            return [c for c in self.store_cols if c not in reserved]
        # default doc-values set: everything except binary payloads
        return [
            f.name for f in df.schema.fields
            if f.name not in reserved and f.dataType.typeName() != "binary"
        ]

    def update_documents(self, df: DataFrame,
                         n_segments: int | None = None) -> dict:
        """Delete-then-add by key (IndexWriter::update_document,
        index_writer.rs:430-470): buffer tombstones for every incoming key
        at the CURRENT generation, then append the new docs as delta
        segments at the next generation — the tombstones can never hide
        the replacements (gen scoping), and a later merge folds the old
        copies out physically."""
        m = load_manifest(self.index_dir)
        # fail BEFORE tombstones are buffered — a config clash must not
        # leave half the delete-then-add applied
        self._check_manifest_compat(m)
        gen = int(m.get("gen_counter", 0))
        tomb_dir = os.path.join(self.index_dir, "tombstones")
        storage.makedirs(tomb_dir)
        (df.select(F.col(self.key_col).cast("string").alias("key"),
                   F.lit(gen).cast("long").alias("gen"))
         .distinct()
         .write.mode("append").parquet(tomb_dir))
        return self.add_documents(df, n_segments=n_segments)

    def _prepare_bigram_vocab(self, df: DataFrame) -> dict | None:
        """Sample the hot vocabulary and persist the sidecar (resumable:
        an already-published sidecar is reloaded, keeping retried builds
        byte-deterministic). Returns the manifest ``bigrams`` entry."""
        if not self.bigram_frac:
            return None
        vocab_dir = os.path.join(self.index_dir, "bigram_vocab", "v0")
        if storage.exists(os.path.join(vocab_dir, "part-0.parquet")):
            entry = {"frac": self.bigram_frac, "dir": "v0",
                     "sep": BIGRAM_SEP, "suffix": BIGRAM_SUFFIX}
            hot = load_bigram_vocab(
                self.index_dir, {"bigrams": entry})
            self._bigram_hot = hot
            entry["n_hot"] = {f_: len(s) for f_, s in (hot or {}).items()}
            return entry
        vocab = _sample_bigram_vocab(
            df, self.fields, self.field_options, self.analyzer,
            self.bigram_frac)
        rows_f = [f_ for f_, ts in sorted(vocab.items()) for _ in ts]
        rows_t = [t for _, ts in sorted(vocab.items()) for t in ts]
        _atomic_write_dir(
            lambda d: storage.write_parquet(
                pa.table({"field": pa.array(rows_f, pa.string()),
                          "term": pa.array(rows_t, pa.string())}),
                os.path.join(d, "part-0.parquet")),
            vocab_dir)
        self._bigram_hot = {f_: frozenset(ts) for f_, ts in vocab.items()}
        return {"frac": self.bigram_frac, "dir": "v0", "sep": BIGRAM_SEP,
                "suffix": BIGRAM_SUFFIX,
                "n_hot": {f_: len(ts) for f_, ts in vocab.items()}}

    def build(self, df: DataFrame) -> dict:
        storage.makedirs(self.index_dir)
        bigram_entry = self._prepare_bigram_vocab(df)
        extra = self._extra_cols(df)
        src = self._with_segment_id(
            df.select(self.key_col, *self._field_cols, *extra))

        index_dir, fields, key_col, analyzer, ioffs, fopts = (
            self.index_dir,
            self.fields,
            self.key_col,
            self.analyzer,
            self.index_offsets,
            self.field_options,
        )
        bighot = getattr(self, "_bigram_hot", None)

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            return _build_segment_files(pdf, index_dir, fields, key_col,
                                        analyzer, ioffs, fopts, bighot)

        rows = (
            src.groupBy("segment_id")
            .applyInPandas(fn, _MANIFEST_ROW_SCHEMA)
            .collect()
        )
        seg_rows = sorted((r.asDict() for r in rows), key=lambda r: r["segment_id"])
        for r in seg_rows:
            r["gen"] = 0
        doc_count = int(sum(r["docs"] for r in seg_rows))

        manifest = {
            "version": 6,
            "field": self.field,
            "fields": [fn_ for fn_, _ in self.fields],
            "field_cols": {fn_: c for fn_, c in self.fields},
            "analyzer": self.analyzer,
            "index_offsets": self.index_offsets,
            # per-field posting level (index_options.rs:18-24); absent
            # entries (older manifests) default to "positions"
            "field_index_options": dict(self.field_options),
            "partitioner": self.partitioner,
            "key_col": self.key_col,
            "n_segments": self.n_segments,
            "doc_count": doc_count,
            "gen_counter": 0,
            # monotone id source (SegmentInfos.counter): segment ids are
            # NEVER reused, even after merges shrink the live id set —
            # reuse would let a stale resume marker resurrect a manifest
            # row whose data dirs a merge already folded away and GC'd
            "segment_counter": (max(r["segment_id"] for r in seg_rows) + 1
                                if seg_rows else 0),
            "segments": seg_rows,
        }
        if bigram_entry:
            manifest["bigrams"] = bigram_entry
        field_stats, ts_name = write_term_stats(
            self.spark, self.index_dir, max(1, self.n_segments // 4), manifest)
        manifest["field_stats"] = field_stats
        manifest["term_stats_dir"] = ts_name
        manifest["sum_ttf"] = field_stats.get(self.field, {}).get("sum_ttf", 0)
        write_manifest(self.index_dir, manifest)
        return manifest


def seg_dir(seg_row: dict) -> str:
    """Physical dir of one segment within each table tree. The name embeds
    a token so republishing (merge) never collides with a live dir — the
    manifest swap is the only publish step (Lucene's write-new-files /
    swap-commit-point / drop-old-files order)."""
    return seg_row.get("dir") or f"seg={seg_row['segment_id']}"


def seg_table_paths(index_dir: str, manifest: dict, table: str) -> list[str]:
    return [os.path.join(index_dir, table, seg_dir(s))
            for s in manifest["segments"]]


def read_seg_table(spark: SparkSession, index_dir: str, manifest: dict,
                   table: str) -> DataFrame:
    """Read exactly the manifest-listed segment dirs of one table — never
    directory discovery, so concurrently staged/orphaned dirs are
    invisible (TrackingDirectoryWrapper's read-side discipline)."""
    paths = seg_table_paths(index_dir, manifest, table)
    if any("dir" not in s for s in manifest["segments"]):
        # legacy v5 layout: hive-style seg=N dirs carry seg in the path
        return (spark.read.option("basePath", os.path.join(index_dir, table))
                .parquet(*paths))
    return spark.read.parquet(*paths)


def gc_index(index_dir: str) -> list[str]:
    """Remove dirs no commit point references (orphans from crashed
    merges/builds). Safe under the single-writer model: anything not in
    the CURRENT manifest is dead by definition."""
    m = load_manifest(index_dir)
    live = {(t, seg_dir(s)) for s in m["segments"]
            for t in ("postings", "docmeta", "segstats")}
    ts_live = m.get("term_stats_dir", "term_stats")
    removed = []
    for table in ("postings", "docmeta", "segstats"):
        root = os.path.join(index_dir, table)
        if not storage.is_dir(root):
            continue
        for d in storage.listdir(root):
            if (table, d) not in live:
                storage.remove_dir(os.path.join(root, d))
                removed.append(os.path.join(table, d))
    for d in storage.listdir(index_dir):
        if (d.startswith("term_stats") and d != ts_live) or \
                d.startswith("tmpstage-"):
            storage.remove_dir(os.path.join(index_dir, d))
            removed.append(d)
    return removed


def write_term_stats(spark: SparkSession, index_dir: str,
                     n_parts: int, manifest: dict) -> tuple[dict, str]:
    """(Re)aggregate per-segment stat partials into a NEW versioned
    term_stats dir (committed by the manifest swap, never overwritten in
    place); returns ``({field: {"sum_ttf": int}}, dirname)``
    (searcher.rs:732-767 per-field CollectionStatistics analogue).

    The per-segment pre-aggregation is the skew guard: a hot term enters
    this shuffle with at most one partial row per segment. Output files are
    (field, term)-sorted within the groupBy's hash partitioning (no extra
    range-sampling pass), which keeps Parquet row-group pruning for the
    searcher's ``term IN (...)`` stats lookups.
    """
    segstats = read_seg_table(spark, index_dir, manifest, "segstats")
    # bigram pair channels stay OUT of the global stats: pair terms are
    # never consulted for idf/df/count/BMW bounds (the phrase rewrite
    # reads pair postings directly), and on a 10M-doc webtext corpus the
    # pair vocabulary is ~1.4x the base vocabulary — excluding it keeps
    # the stats shuffle and the searcher's stats table at base size
    segstats = segstats.filter(~F.col("field").endswith(BIGRAM_SUFFIX))
    term_stats = (
        segstats
        .repartition(max(1, n_parts), "field", "term")
        .groupBy("field", "term")
        .agg(
            F.sum("df").alias("df"),
            F.sum("ttf").alias("ttf"),
            F.max("max_tf").alias("max_tf"),
            F.max("max_norm_byte").alias("max_norm_byte"),
            F.min("min_dl").alias("min_dl"),
        )
        .sortWithinPartitions("field", "term")
    )
    ts_name = f"term_stats-{uuid.uuid4().hex[:8]}"
    ts_dir = os.path.join(index_dir, ts_name)
    term_stats.write.mode("overwrite").parquet(ts_dir)
    rows = (spark.read.parquet(ts_dir).groupBy("field")
            .agg(F.sum("ttf").alias("sttf")).collect())
    return ({r["field"]: {"sum_ttf": int(r["sttf"] or 0)} for r in rows},
            ts_name)


def write_manifest(index_dir: str, manifest: dict) -> None:
    """Atomic commit-point swap (the ``segments_N`` two-phase commit,
    index_writer.rs:630-640)."""
    storage.atomic_write_text(os.path.join(index_dir, MANIFEST),
                              json.dumps(manifest, indent=1))


def load_manifest(index_dir: str) -> dict:
    return json.loads(storage.read_text(os.path.join(index_dir, MANIFEST)))
