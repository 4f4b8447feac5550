"""DataFrame-driven BM25 top-k searcher over a built index.

The reference's scorer trees (SURVEY.md §2.5) dissolve into relational
algebra on ``(seg, doc)``:

* postings scan      → Parquet scan of ``postings/`` with ``term`` pushdown
  (the blocktree seek becomes row-group pruning on the sorted term column);
* TermScorer         → mapInPandas block decode + vectorized f32 BM25;
* ConjunctionScorer  → groupBy must-count (zig-zag advance ≡ shuffle join);
* DisjunctionSumScorer → groupBy(seg,doc) sum + min_should_match count
  (disjunction_scorer.rs:24-104);
* ReqNotScorer       → must_not count == 0 (req_not_scorer.rs:21);
* Exact/SloppyPhraseScorer → conjunction join of position frames + the
  shared phrase kernels on the candidate set (two-phase iteration:
  cheap doc-level conjunction first, expensive position check after —
  search/mod.rs:127-155);
* TopDocsCollector   → ``ORDER BY score DESC, seg, doc LIMIT k``
  (TakeOrderedAndProject = per-partition heap + merge, top_docs.rs:28-172).

Scoring modes:

* ``lucene``  — float32, byte315 norms, reproduces the reference kernel
  (rank-identical to oracle.py); clause sums accumulate in f64 and cast to
  f32 once (same documented divergence as the oracle).
* ``precise`` — float64, exact field lengths; every formula is
  ANSI-SQL-expressible, which is what the DuckDB correctness gate checks.

Stats are global across segments; term stats for the query's terms are one
tiny pruned scan collected to the driver (the analogue of
``IndexSearcher``'s weight-time stats fetch, searcher.rs:690-767) and
memoized per searcher. All transcendentals (ln, the norm cache) are
computed driver-side in numpy and shipped as literals/closures, so executor
math is pure f32/f64 arithmetic.

Multi-term queries read the postings table ONCE (``term IN (...)`` pushed
to Parquet) and decode every clause in a single Arrow stage — the
scale-critical property that per-term scans would lose at wide boolean
queries.

``search_blockmax`` is the BMW (block-max WAND) serving path the north
rule adds on top of the reference (SURVEY.md §4.3): per-128-doc-block
upper bounds computed from stored ``(max_tf, max_norm_byte, min_dl)``
metadata prune block decodes against a θ lower bound obtained by exactly
scoring the highest-impact term. Pruning is provably rank-preserving (any
doc in a pruned block has total score < θ ≤ the true k-th score), which
``tests/test_blockmax.py`` asserts against the exhaustive scorer.
"""

from __future__ import annotations

import os
from functools import reduce

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import storage
from .bm25 import avgdl32, idf32, norm_cache32
from .build import load_manifest, read_seg_table
from .codec import (
    batch_delta_decode,
    batch_unpack,
    batch_unpack_positions,
    delta_decode,
    unpack_ints,
    varint_decode,
)
from .phrase import (
    exact_phrase_freq,
    sloppy_phrase_freq,
    sloppy_phrase_freq_2term_batch,
    sloppy_phrase_freq_2term_flat,
    sloppy_phrase_freq_nslot_batch,
    sloppy_phrase_freq_nslot_flat,
)
from .query import (
    BooleanQuery,
    BoostingQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    ExistsQuery,
    FilterQuery,
    MatchAllDocsQuery,
    MinScoreQuery,
    PhraseQuery,
    Query,
    RangeQuery,
    TermQuery,
)
from .query import SpanQuery as _SpanQueryT

K1 = np.float32(1.2)
B = np.float32(0.75)


def _kp1_64(k1: float) -> float:
    """(k1 + 1) for the float64 "precise" path. The default returns the
    LITERAL 2.2 (not 1.2 + 1.0, which differs in the last f64 bit) so the
    SQL oracles' 2.2 constant stays bit-identical."""
    return 2.2 if k1 == 1.2 else k1 + 1.0

def _collector_seg_reduce(doc, qid, gid, role, sc, g_role, g_nm, g_nf,
                          g_ms, r_nm, r_nf, r_ms, tomb, lucene, ftype, k):
    """Segment-local boolean reduction + top-k for the serving collector
    (_collector_topk_frame): numpy sort/reduceat mirror of the JVM
    two-stage aggregation (stage 1 per (qid, gid, doc); stage 2 folds
    satisfied one-level groups into virtual root clauses; root
    must/filter/not/msm arithmetic; tombstone mask; per-query top-k by
    (score desc, doc asc)).  Stable lexsort keeps scan order within each
    key so the float64 accumulation order matches the JVM sum."""
    # stage 1: reduce per (qid, gid, doc)
    order = np.lexsort((doc, gid, qid))
    d, g, q = doc[order], gid[order], qid[order]
    r, v = role[order], sc[order].astype(np.float64)
    nb = np.empty(len(d), dtype=bool)
    if len(d):
        nb[0] = True
    nb[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1]) | (q[1:] != q[:-1])
    starts = np.flatnonzero(nb)
    sc1 = np.add.reduceat(np.where(r <= 1, v, 0.0), starts)
    nm = np.add.reduceat((r == 0).astype(np.int64), starts)
    ns = np.add.reduceat((r == 1).astype(np.int64), starts)
    nf = np.add.reduceat((r == 2).astype(np.int64), starts)
    nn = np.add.reduceat((r == 3).astype(np.int64), starts)
    kq, kg, kd = q[starts], g[starts], d[starts]

    # stage 2: satisfied groups become virtual root clauses
    is_root = kg == 0
    if not is_root.all():
        gm = ~is_root
        gg = kg[gm]
        ok = ((nm[gm] == g_nm[gg]) & (nf[gm] == g_nf[gg])
              & (nn[gm] == 0) & (ns[gm] >= g_ms[gg]))
        grole = g_role[gg][ok]
        gsc_raw = sc1[gm][ok]
        if lucene:
            gsc = np.where(grole <= 1,
                           gsc_raw.astype(np.float32).astype(np.float64),
                           0.0)
        else:
            gsc = np.where(grole <= 1, gsc_raw, 0.0)
        q2 = np.concatenate([kq[is_root], kq[gm][ok]])
        d2 = np.concatenate([kd[is_root], kd[gm][ok]])
        v2 = np.concatenate([sc1[is_root], gsc])
        nm2 = np.concatenate([nm[is_root],
                              (grole == 0).astype(np.int64)])
        ns2 = np.concatenate([ns[is_root],
                              (grole == 1).astype(np.int64)])
        nf2 = np.concatenate([nf[is_root],
                              (grole == 2).astype(np.int64)])
        nn2 = np.concatenate([nn[is_root],
                              (grole == 3).astype(np.int64)])
        o2 = np.lexsort((d2, q2))
        d2, q2 = d2[o2], q2[o2]
        v2, nm2, ns2 = v2[o2], nm2[o2], ns2[o2]
        nf2, nn2 = nf2[o2], nn2[o2]
        # d2 CAN be empty: a batch whose rows are all group clauses with
        # no group satisfied (e.g. every should-group missed its msm)
        # leaves no root rows and no virtual clauses (found by the
        # merged-layout fuzz, tests/test_merged_fuzz.py)
        nb2 = np.empty(len(d2), dtype=bool)
        if len(d2):
            nb2[0] = True
        nb2[1:] = (d2[1:] != d2[:-1]) | (q2[1:] != q2[:-1])
        st2 = np.flatnonzero(nb2)
        sc3 = np.add.reduceat(v2, st2)
        nm3 = np.add.reduceat(nm2, st2)
        ns3 = np.add.reduceat(ns2, st2)
        nf3 = np.add.reduceat(nf2, st2)
        nn3 = np.add.reduceat(nn2, st2)
        q3, d3 = q2[st2], d2[st2]
    else:
        q3, d3, sc3 = kq, kd, sc1
        nm3, ns3, nf3, nn3 = nm, ns, nf, nn

    keep = ((nm3 == r_nm[q3]) & (nf3 == r_nf[q3]) & (nn3 == 0)
            & (ns3 >= r_ms[q3]))
    q3, d3, sc3 = q3[keep], d3[keep], sc3[keep]
    if tomb is not None and len(q3):
        pos = np.searchsorted(tomb, d3)
        dead = (pos < len(tomb)) & (
            tomb[np.minimum(pos, len(tomb) - 1)] == d3)
        q3, d3, sc3 = q3[~dead], d3[~dead], sc3[~dead]
    if len(q3) == 0:
        return q3, d3, sc3.astype(ftype)
    score = sc3.astype(ftype)
    # per-query top-k by (score desc, doc asc)
    o = np.lexsort((d3, -score.astype(np.float64), q3))
    qs_, ds_, ss_ = q3[o], d3[o], score[o]
    new_q = np.empty(len(qs_), dtype=bool)
    new_q[0] = True
    new_q[1:] = qs_[1:] != qs_[:-1]
    grp_start = np.maximum.accumulate(
        np.where(new_q, np.arange(len(qs_)), 0))
    sel = (np.arange(len(qs_)) - grp_start) < k
    return qs_[sel], ds_[sel], ss_[sel]


class _LazyPositions:
    """Per-term lazily-decoded position store for the collector kernels.

    The impact-ordered verify loop touches pos_bin blocks in
    ub-descending doc chunks; decoding one 128-entry block per
    ``batch_unpack_positions`` call costs a Python-level decode per
    block (~40µs), which dominates the adversarial stopword case where
    nearly every block survives (measured 58 of 65ms per segment visit).
    Here every block a chunk newly touches is decoded in ONE batched
    codec call into a preallocated per-term flat array (position count =
    Σtf, a few hundred KB per stopword term at 34k docs/seg), and the
    per-entry gather is a single vectorized fancy-index — no per-block
    Python loop. Blocks no surviving chunk lands in are still never
    varint-decoded (the θ-cutoff win is preserved)."""

    __slots__ = ("td", "eoff", "pstart", "pend", "have", "flat")

    def __init__(self, td: dict):
        self.td = td
        tfs = td["tfs"]
        self.eoff = np.cumsum(tfs) - tfs          # entry → flat start
        blk_ends = td["blk_ends"]
        self.pend = self.eoff[blk_ends - 1] + tfs[blk_ends - 1]
        self.pstart = self.eoff[blk_ends - td["counts"]]
        self.have = np.zeros(len(blk_ends), dtype=bool)
        self.flat = None                           # allocated on demand

    def gather(self, ent_chunk: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """flat positions + per-entry tf for ASCENDING entries."""
        td = self.td
        tfe = td["tfs"][ent_chunk]
        tot = int(tfe.sum())
        if tot == 0:
            return np.empty(0, dtype=np.int64), tfe
        bi = np.unique(np.searchsorted(td["blk_ends"], ent_chunk,
                                       side="right"))
        new = bi[~self.have[bi]]
        if new.size:
            if self.flat is None:
                self.flat = np.empty(int(td["tfs"].sum()), dtype=np.int64)
            blk_starts = td["blk_ends"] - td["counts"]
            tf_parts = [td["tfs"][blk_starts[b]:td["blk_ends"][b]]
                        for b in new]
            dec, _ = batch_unpack_positions(
                [td["pos_bins"][b] for b in new],
                np.concatenate(tf_parts))
            off = 0
            for b in new:
                ps, pe = int(self.pstart[b]), int(self.pend[b])
                self.flat[ps:pe] = dec[off:off + (pe - ps)]
                off += pe - ps
            self.have[new] = True
        idx = (np.repeat(self.eoff[ent_chunk], tfe) + np.arange(tot)
               - np.repeat(np.cumsum(tfe) - tfe, tfe))
        return self.flat[idx], tfe


def _phrase_seg_topk(tds, slots, offsets, tomb, k, chunk0, lucene, wk32,
                     cache, coef64, k1_, b_, avgdl64, slop=0, terms=None):
    """Segment-local exact-phrase top-k with impact-ordered verification.

    ``tds[ti]`` holds one unique term's postings for THIS segment:
    sorted ``docs``, aligned ``tfs``/``nbs``/``dls``, per-block entry
    ``counts`` and the still-encoded ``pos_bins`` blobs.  The phrase
    frequency of a doc is bounded by its minimum per-slot tf
    (phrase_scorer.rs:179-229: every occurrence consumes one position of
    every slot), and the BM25 kernel is monotone in freq, so
    ``ub(doc) = score(min_tf)`` is a true float32 upper bound.  Docs are
    verified in ub-descending chunks; once k docs are verified with true
    score θ, every remaining doc has ``ub < θ`` and is skipped WITHOUT
    its positions ever being decoded — pos_bin blocks no chunk doc lands
    in are never varint-decoded at all (the phrase analogue of
    search_blockmax's per-block bound; the reference has no phrase
    impacts — phrase_query.rs:223-270 bails only via two-phase
    match_cost — so rank identity vs the exhaustive JVM path is
    test-asserted, tests/test_phrase_collector.py).

    Verification itself is whole-chunk vectorized: each slot's positions
    become ``doc * SHIFT + (pos - slot_offset + pad)`` keys and the
    per-doc intersection of shifted position sets is one sorted
    ``np.intersect1d`` chain; freq per doc falls out of a unique-count
    over the surviving keys' doc prefixes.
    """
    uniq_tis = sorted({ti for ti, _ in slots})
    conj = tds[uniq_tis[0]]["docs"]
    for ti in uniq_tis[1:]:
        conj = np.intersect1d(conj, tds[ti]["docs"], assume_unique=True)
        if conj.size == 0:
            break
    if tomb is not None and conj.size:
        pos_ = np.searchsorted(tomb, conj)
        dead = (pos_ < len(tomb)) & (
            tomb[np.minimum(pos_, len(tomb) - 1)] == conj)
        conj = conj[~dead]
    if conj.size == 0:
        e64 = np.empty(0, dtype=np.float64)
        return np.empty(0, dtype=np.int64), e64

    ent = {ti: np.searchsorted(tds[ti]["docs"], conj) for ti in uniq_tis}
    if slop == 0:
        # exact: every occurrence consumes one position of every slot
        bound = tds[uniq_tis[0]]["tfs"][ent[uniq_tis[0]]]
        for ti in uniq_tis[1:]:
            bound = np.minimum(bound, tds[ti]["tfs"][ent[ti]])
    else:
        # sloppy: every _SloppyFreq loop iteration consumes one
        # next_position() of some slot and emits ≤1 match (+1 final
        # emit), so matches ≤ Σ_slots tf − n_slots + 1; each match
        # contributes ≤1 to freq (1/(1+len), len ≥ 0)
        bound = None
        for ti, _off in slots:
            tf_s = tds[ti]["tfs"][ent[ti]]
            bound = tf_s.copy() if bound is None else bound + tf_s
        bound = bound - len(slots) + 1
    t0 = uniq_tis[0]
    nbs_c = tds[t0]["nbs"][ent[t0]]
    dls_c = tds[t0]["dls"][ent[t0]]
    if lucene:
        mt = bound.astype(np.float32)
        ub = (wk32 * mt) / (mt + cache[nbs_c])
        ub64 = ub.astype(np.float64)
    else:
        mt = bound.astype(np.float64)
        ub64 = coef64 * mt / (
            mt + k1_ * ((1.0 - b_) + b_ * dls_c.astype(np.float64) / avgdl64))
    if slop == 0 and len(slots) == 1:
        # single slot — a 2-term phrase fully served by the bigram pair
        # channel (or a degenerate 1-term phrase): the stored tf IS the
        # phrase freq, so ub64 is already the exact score; top-k without
        # ever touching pos_bin
        sel = np.lexsort((conj, -ub64))[:k]
        return conj[sel], ub64[sel]
    order = np.lexsort((conj, -ub64))

    offpad = max(offsets) if offsets else 0
    stores = {ti: _LazyPositions(tds[ti]) for ti in uniq_tis}

    def _gather(ti, ent_chunk, docs_chunk):
        """positions of the given (ascending) entries of term ti →
        (doc-repeated array, flat positions, per-entry tf), decoding
        only the pos_bin blocks the entries land in (batched + memoized
        across chunks by the _LazyPositions store)."""
        flat, tfe = stores[ti].gather(ent_chunk)
        return np.repeat(docs_chunk, tfe), flat, tfe

    vd_parts, vs_parts = [], []
    n_hits = 0
    theta = None
    n = len(order)
    i = 0
    chunk = max(int(chunk0), 4 * k, 1)
    while i < n:
        if theta is not None and ub64[order[i]] < theta:
            break
        sel = order[i:min(n, i + chunk)]
        so = np.argsort(conj[sel])
        cd = conj[sel][so]
        nbs_k = nbs_c[sel][so]
        dls_k = dls_c[sel][so]

        gathered = {}
        for ti, off in slots:
            if ti not in gathered:
                gathered[ti] = _gather(ti, ent[ti][sel][so], cd)
        if slop == 0:
            acc = None
            maxpos = 0
            slot_keys = []
            for ti, off in slots:
                g = gathered[ti]
                maxpos = max(maxpos, int(g[1].max(initial=0)))
                slot_keys.append((g, off))
            # key on the doc's RANK within the chunk (not the global doc
            # id) so rank << bits can never overflow int64
            bits = int(maxpos + offpad + 2).bit_length()
            for (dr, pr, _tfe), off in slot_keys:
                keys = (np.searchsorted(cd, dr) << np.int64(bits)) + (
                    pr - off + offpad)
                acc = keys if acc is None else np.intersect1d(
                    acc, keys, assume_unique=True)
                if acc.size == 0:
                    break
            freq = np.zeros(len(cd), dtype=np.float64)
            if acc is not None and acc.size:
                hr, hc = np.unique(acc >> np.int64(bits),
                                   return_counts=True)
                freq[hr] = hc
        else:
            # sloppy verify on the chunk: per-doc position slices from
            # the gathered flat arrays (every chunk doc holds every
            # term), then the shared phrase kernels — batch-vectorized
            # for two distinct terms, per-doc heap walk otherwise
            # (candidate-capped upstream by the caller like the
            # exhaustive path)
            two_term = (len(slots) == 2 and slots[0][0] != slots[1][0])
            distinct = len({ti for ti, _ in slots}) == len(slots)
            if two_term:
                # flat fast path: the gathered arrays are already
                # doc-ordered flats (every chunk doc holds every term) —
                # feed the flat kernel directly, no per-doc slicing
                _da, pra, tfa = gathered[slots[0][0]]
                _db, prb, tfb = gathered[slots[1][0]]
                freq = sloppy_phrase_freq_2term_flat(
                    pra, tfa, prb, tfb,
                    offsets[0], offsets[1], slop).astype(np.float64)
            elif distinct:
                # n≥3 distinct slots: lockstep heap-walk simulation
                # across the whole chunk (round-4 verdict #2) — no
                # per-doc Python, no candidate cap needed
                freq = sloppy_phrase_freq_nslot_flat(
                    [gathered[ti][1] for ti, _ in slots],
                    [gathered[ti][2] for ti, _ in slots],
                    offsets, slop).astype(np.float64)
            else:
                slices = {}
                for ti, g in gathered.items():
                    _dr, pr, tfe = g
                    ends = np.cumsum(tfe)
                    slices[ti] = [pr[ends[j] - tfe[j]:ends[j]]
                                  for j in range(len(cd))]
                freq = np.zeros(len(cd), dtype=np.float64)
                for r in range(len(cd)):
                    pls = [slices[ti][r] for ti, _ in slots]
                    freq[r] = float(sloppy_phrase_freq(
                        pls, offsets, terms, slop))
        hit = freq > 0
        if hit.any():
            fr = freq[hit].astype(np.float64)
            if lucene:
                tff = fr.astype(np.float32)
                sc = (wk32 * tff) / (tff + cache[nbs_k[hit]])
                sc = sc.astype(np.float64)
            else:
                denom = fr + k1_ * (
                    (1.0 - b_) + b_ * dls_k[hit].astype(np.float64) / avgdl64)
                sc = coef64 * fr / denom
            vd_parts.append(cd[hit])
            vs_parts.append(sc)
            n_hits += int(hit.sum())
            if n_hits >= k:
                allsc = np.concatenate(vs_parts)
                theta = float(np.partition(allsc, len(allsc) - k)[len(allsc) - k])
        i += len(sel)
        chunk *= 4

    if not vd_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    dv = np.concatenate(vd_parts)
    sv = np.concatenate(vs_parts)
    o = np.lexsort((dv, -sv))[:k]
    return dv[o], sv[o]


def _span_count_bound(spec, tfm: dict):
    """Per-doc upper bound on the NUMBER of spans a spec can emit, as a
    numpy array over candidate docs (``tfm[ti]`` = the term's tf per
    doc, 0 where absent). freq = Σ 1/(1+width) ≤ span count, and the
    BM25 kernel is monotone in freq, so score(bound) is a true impact
    bound. Counts per node (spans.py kernels): a term emits tf spans;
    an or emits the union (Σ subs); an ordered near advances its FIRST
    clause's pointer every iteration, so it emits ≤ that clause's count
    (a gap is never first — ordered_near_spans raises); an unordered
    near pops one heap cell per emission, so ≤ Σ sub counts."""
    kind = spec[0]
    if kind == "term":
        return tfm[spec[1]]
    if kind == "or":
        return sum(_span_count_bound(s, tfm) for s in spec[1])
    if kind == "near":
        if spec[3]:
            return _span_count_bound(spec[1][0], tfm)
        return sum(_span_count_bound(s, tfm) for s in spec[1]
                   if s[0] != "gap")
    raise ValueError(f"unbounded span spec node: {spec!r}")


def _span_seg_topk(tds, spec, group_tis, tomb, k, chunk0, lucene, wk32,
                   cache, coef64, k1_, b_, avgdl64, fast2, ta2, tb2,
                   slop2, fastn=False):
    """Segment-local span top-k with impact-ordered verification — the
    span analogue of :func:`_phrase_seg_topk`.

    ``tds[ti]`` holds one term's postings for THIS segment. Candidates
    are docs holding ≥1 term of EVERY required clause group (the same
    bitmask conjunction the exhaustive frame runs JVM-side). The impact
    bound is score(_span_count_bound), so docs are verified in
    ub-descending chunks and verification stops once the k-th verified
    score exceeds every remaining bound; pos_bin blocks no surviving
    chunk doc lands in are never decoded. Verification is the shared
    span kernel — vectorized for the 2-term ordered shape (``fast2``),
    per-doc :func:`spans.span_freq` otherwise (candidate-capped
    upstream by the caller, like the exhaustive path)."""
    from .spans import (
        ordered_near_freq_2term_flat,
        ordered_near_freq_nclause_flat,
        span_freq,
    )

    e_i = np.empty(0, dtype=np.int64)
    if not tds:
        return e_i, np.empty(0, dtype=np.float64)
    if all(len(g) == 1 for g in group_tis):
        # every clause group is one required term: the candidate set is
        # a plain sorted intersection (the phrase kernel's shape) — no
        # concatenate/argsort/reduceat machinery
        conj = None
        for (ti,) in group_tis:
            td = tds.get(ti)
            docs_g = td["docs"] if td is not None else e_i
            conj = docs_g if conj is None else np.intersect1d(
                conj, docs_g, assume_unique=True)
            if conj.size == 0:
                break
        if conj is None:
            conj = e_i
    else:
        doc_parts, ti_parts = [], []
        for ti, td in tds.items():
            doc_parts.append(td["docs"])
            ti_parts.append(np.full(len(td["docs"]), ti, dtype=np.int64))
        doc_el = np.concatenate(doc_parts)
        ti_el = np.concatenate(ti_parts)
        o = np.argsort(doc_el, kind="stable")
        doc_el, ti_el = doc_el[o], ti_el[o]
        nb_ = np.empty(len(doc_el), dtype=bool)
        nb_[0] = True
        nb_[1:] = doc_el[1:] != doc_el[:-1]
        starts = np.flatnonzero(nb_)
        docs_u = doc_el[starts]
        keep = np.ones(len(docs_u), dtype=bool)
        for g in group_tis:
            gm = np.isin(ti_el, list(g)).astype(np.int64)
            keep &= np.add.reduceat(gm, starts) > 0
        conj = docs_u[keep]
    if tomb is not None and conj.size:
        p_ = np.searchsorted(tomb, conj)
        dead = (p_ < len(tomb)) & (
            tomb[np.minimum(p_, len(tomb) - 1)] == conj)
        conj = conj[~dead]
    if conj.size == 0:
        return e_i, np.empty(0, dtype=np.float64)

    n_cand = len(conj)
    ent, present = {}, {}
    # every ti the spec references gets a tf vector — terms with no
    # postings in this segment contribute 0 to the bound
    tfm: dict[int, np.ndarray] = {
        ti: np.zeros(n_cand, dtype=np.int64)
        for g in group_tis for ti in g
    }
    nbs_c = np.zeros(n_cand, dtype=np.int64)
    dls_c = np.zeros(n_cand, dtype=np.int64)
    filled = np.zeros(n_cand, dtype=bool)
    for ti, td in tds.items():
        p = np.searchsorted(td["docs"], conj)
        pm = (p < len(td["docs"])) & (
            td["docs"][np.minimum(p, len(td["docs"]) - 1)] == conj)
        ent[ti], present[ti] = p, pm
        tf_a = np.zeros(n_cand, dtype=np.int64)
        tf_a[pm] = td["tfs"][p[pm]]
        tfm[ti] = tf_a
        m = pm & ~filled
        if m.any():
            nbs_c[m] = td["nbs"][p[m]]
            dls_c[m] = td["dls"][p[m]]
            filled |= pm
    bound = _span_count_bound(spec, tfm)
    if lucene:
        bt = bound.astype(np.float32)
        ub64 = ((wk32 * bt) / (bt + cache[nbs_c])).astype(np.float64)
    else:
        bt = bound.astype(np.float64)
        ub64 = coef64 * bt / (
            bt + k1_ * ((1.0 - b_)
                        + b_ * dls_c.astype(np.float64) / avgdl64))
    order = np.lexsort((conj, -ub64))

    stores = {ti: _LazyPositions(td) for ti, td in tds.items()}

    def _gather_pos(ti, ent_chunk):
        """flat positions + per-entry tf for ASCENDING entries of term
        ti, decoding only the blocks touched (batched + memoized across
        chunks by the _LazyPositions store)."""
        return stores[ti].gather(ent_chunk)

    vd_parts, vs_parts = [], []
    n_hits = 0
    theta = None
    n = len(order)
    i = 0
    chunk = max(int(chunk0), 4 * k, 1)
    while i < n:
        if theta is not None and ub64[order[i]] < theta:
            break
        sel = order[i:min(n, i + chunk)]
        so = np.argsort(conj[sel])
        cidx = sel[so]
        cd = conj[cidx]
        nbs_k, dls_k = nbs_c[cidx], dls_c[cidx]
        if fast2:
            # flat fast path: both clauses are required single terms, so
            # every conj doc holds both (present[ta2]/present[tb2] are
            # all-True by the group-conjunction construction) — the
            # gathered flat positions feed the flat kernel directly, no
            # per-doc slicing
            flat_a, tfa = _gather_pos(ta2, ent[ta2][cidx])
            if tb2 == ta2:
                flat_b, tfb = flat_a, tfa
            else:
                flat_b, tfb = _gather_pos(tb2, ent[tb2][cidx])
            freqs = ordered_near_freq_2term_flat(
                flat_a, tfa, flat_b, tfb, slop2).astype(np.float64)
        elif fastn:
            # n-clause ordered near over term/gap clauses: every clause
            # term is its own required group, so every chunk doc holds
            # every clause — the gathered flats feed the lockstep kernel
            # directly (one gather per unique term, memoized per chunk)
            gath: dict[int, tuple] = {}
            clauses = []
            for s_ in spec[1]:
                if s_[0] == "gap":
                    clauses.append(("gap", s_[1]))
                    continue
                ti = s_[1]
                if ti not in gath:
                    gath[ti] = _gather_pos(ti, ent[ti][cidx])
                flat, tfe = gath[ti]
                clauses.append(("pos", flat, tfe))
            freqs = ordered_near_freq_nclause_flat(
                clauses, spec[2]).astype(np.float64)
        else:
            # per-term positions for this chunk: list-of-arrays aligned
            # to cd
            chunk_pos: dict[int, list] = {}
            for ti in tds:
                pm = present[ti][cidx]
                lst: list = [None] * len(cd)
                if pm.any():
                    flat, tfe = _gather_pos(ti, ent[ti][cidx][pm])
                    ends = np.cumsum(tfe)
                    where = np.flatnonzero(pm)
                    for j, w in enumerate(where):
                        lst[w] = flat[ends[j] - tfe[j]:ends[j]]
                chunk_pos[ti] = lst
            freqs = np.zeros(len(cd), dtype=np.float64)
            for r in range(len(cd)):
                pos_map = {ti: lst[r] for ti, lst in chunk_pos.items()
                           if lst[r] is not None}
                freqs[r] = float(span_freq(spec, pos_map))
        hit = freqs > 0
        if hit.any():
            fr = freqs[hit]
            if lucene:
                tff = fr.astype(np.float32)
                sc = ((wk32 * tff) / (tff + cache[nbs_k[hit]])
                      ).astype(np.float64)
            else:
                denom = fr + k1_ * (
                    (1.0 - b_)
                    + b_ * dls_k[hit].astype(np.float64) / avgdl64)
                sc = coef64 * fr / denom
            vd_parts.append(cd[hit])
            vs_parts.append(sc)
            n_hits += int(hit.sum())
            if n_hits >= k:
                allsc = np.concatenate(vs_parts)
                theta = float(
                    np.partition(allsc, len(allsc) - k)[len(allsc) - k])
        i += len(sel)
        chunk *= 4

    if not vd_parts:
        return e_i, np.empty(0, dtype=np.float64)
    dv = np.concatenate(vd_parts)
    sv = np.concatenate(vs_parts)
    o2 = np.lexsort((dv, -sv))[:k]
    return dv[o2], sv[o2]


def _iter_seg_chunks(batches):
    """Stream a collector partition's Arrow batches as one pandas frame
    per SEGMENT, without ever buffering the whole partition.

    A partition is a sequence of whole segment files (the searcher
    forbids file splits; _coalesced only unions whole partitions), each
    read in file order — so a segment's rows form one contiguous run in
    the batch stream. Buffering only until the seg value changes bounds
    worker memory at one segment's scan rows + one Arrow batch,
    independent of how many segments _coalesced packs into the task
    (a stopword-phrase scan over a many-segment partition would
    otherwise hold every packed segment's positions at once)."""
    buf: list = []
    cur = None
    for pdf in batches:
        if len(pdf) == 0:
            continue
        segs = pdf["seg"].to_numpy(np.int32)
        bounds = np.flatnonzero(segs[1:] != segs[:-1]) + 1
        start = 0
        for c in list(bounds) + [len(pdf)]:
            s = int(segs[start])
            if cur is not None and s != cur:
                yield cur, (buf[0] if len(buf) == 1
                            else pd.concat(buf, ignore_index=True))
                buf = []
            cur = s
            buf.append(pdf.iloc[start:c])
            start = c
    if buf:
        yield cur, (buf[0] if len(buf) == 1
                    else pd.concat(buf, ignore_index=True))


def _decode_seg_tds(sub: "pd.DataFrame", ti_of: dict) -> dict:
    """One segment's positional postings rows → per-term decode dict for
    the phrase/span collector kernels: sorted docs, aligned
    tfs/nbs/dls, per-block counts/ends and the still-encoded pos_bin
    blobs (decoded lazily by the kernels' block gathers)."""
    tds = {}
    for t, grp in sub.groupby("term", sort=False):
        grp = grp.sort_values("block_id")
        counts = grp["num_docs"].to_numpy(np.int64)
        tds[ti_of[t]] = {
            "docs": batch_delta_decode(
                batch_unpack(grp["docs_bin"].tolist(), counts), counts
            ).astype(np.int64),
            "tfs": batch_unpack(grp["tfs_bin"].tolist(),
                                counts).astype(np.int64),
            "nbs": batch_unpack(grp["norms_bin"].tolist(),
                                counts).astype(np.int64),
            "dls": batch_unpack(grp["dls_bin"].tolist(),
                                counts).astype(np.int64),
            "counts": counts,
            "blk_ends": np.cumsum(counts),
            "pos_bins": grp["pos_bin"].tolist(),
        }
    return tds


_SCORE_SCHEMA = "seg int, doc long, score float"
_SCORE_SCHEMA64 = "seg int, doc long, score double"
_ROLE_CODE = {"m": 0, "s": 1, "f": 2, "n": 3}  # boolean clause roles
_UB_SLACK = 1e-5  # relative slack on the BMW θ filter (f32 vs f64 rounding)
_MAX_CAND_BUCKETS = 4096  # BMW pass-2 candidate-bucket collect cap


class IndexSearcher:
    def __init__(self, spark: SparkSession, index_dir: str,
                 scoring: str = "lucene",
                 similarity: dict[str, tuple[float, float]] | None = None,
                 verify_candidate_cap: int = 2_000_000,
                 query_cache=None, caching_policy=None):
        """``similarity`` maps field → (k1, b) — the SimilarityProducer
        extension point (searcher.rs:148-154: a different Similarity per
        field); unlisted fields use the BM25 defaults (1.2, 0.75).

        ``query_cache`` (a :class:`rucene_spark.cache.LRUQueryCache`)
        caches filter-context match sets as persisted (seg, doc) frames;
        ``caching_policy`` defaults to
        :class:`~rucene_spark.cache.UsageTrackingQueryCachingPolicy`
        when a cache is given. Default is NO cache — the reference ships
        with its query cache disabled too (searcher.rs:696-701 builds a
        NoCacheQueryCache). One cache instance may be shared across
        searchers/generations; entries are generation-keyed.

        ``verify_candidate_cap`` bounds the PER-DOC Python verify paths
        (sloppy phrases of 3+ positions or with repeated terms, and span
        trees — the kernels that cannot be vectorized across docs). When
        the metadata upper bound on candidate docs (min required-term df)
        exceeds the cap, the query is rejected with guidance instead of
        silently running a corpus-sized Python loop — the sloppy/span
        analogue of block-max's degenerate-path degrade. Two-distinct-
        term sloppy phrases and 2-term-clause ORDERED span nears are
        exempt: their walks are batch-vectorized
        (phrase.sloppy_phrase_freq_2term_batch,
        spans.ordered_near_freq_2term_batch). Raise the cap explicitly
        for deliberate heavy queries."""
        self.spark = spark
        self.index_dir = index_dir
        self.scoring = scoring
        self.verify_candidate_cap = int(verify_candidate_cap)
        self.similarity = dict(similarity or {})
        m = load_manifest(index_dir)
        self.manifest = m
        self.key_col = m["key_col"]
        self.doc_count = m["doc_count"]
        # Scan partitions must equal SEGMENT FILES, for two reasons:
        # (a) parallelism — at the default 128 MiB maxPartitionBytes,
        # parquet bin-packing glues ~64 ten-MiB segment files into ~5 scan
        # tasks, and since the Arrow decode is fused into the scan stage,
        # every core beyond 5 idles (measured: local[32] no faster than
        # local[8] on a 1000-query batch); (b) correctness of the
        # micro-batch collector kernel (_collector_topk_frame), whose
        # segment-local boolean arithmetic and per-segment top-k require
        # each partition to hold a segment's postings COMPLETELY.  Setting
        # openCostInBytes = maxPartitionBytes disables packing (one file
        # per partition) and raising maxPartitionBytes above the largest
        # segment file disables splitting.  At cluster scale parallelism
        # comes from segment COUNT (a merge policy keeps per-segment files
        # bounded), exactly like Lucene shards.
        max_seg_bytes = max(
            (int(s.get("bytes", 0)) for s in m["segments"]), default=0)
        part_bytes = max(128 << 20, max_seg_bytes + (1 << 20))
        try:  # never LOWER a bound another searcher on this session set
            cur = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        except (ValueError, TypeError):
            cur = 0
        part_bytes = max(part_bytes, cur)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(part_bytes))
        spark.conf.set("spark.sql.files.openCostInBytes", str(part_bytes))
        self.sum_ttf = m["sum_ttf"]
        # per-field collection stats (field.rs:23-29 multi-field model):
        # each field has its own sum_ttf → avgdl → norm cache; doc_count is
        # the global corpus size (our documented global-stats divergence)
        self.fields: list[str] = m.get("fields") or [m["field"]]
        self.default_field: str = m["field"]
        # per-field posting level; pre-option manifests are full-positions
        self.field_options: dict[str, str] = (
            m.get("field_index_options") or
            {f_: "positions" for f_ in self.fields})
        fstats = m.get("field_stats") or {m["field"]: {"sum_ttf": m["sum_ttf"]}}
        self.avgdl_f: dict[str, np.float32] = {}
        self.cache_f: dict[str, np.ndarray] = {}
        self.avgdl64_f: dict[str, float] = {}
        self.sim_f: dict[str, tuple[float, float]] = {}
        for f_ in self.fields:
            k1, b = self.similarity.get(f_, (1.2, 0.75))
            self.sim_f[f_] = (float(k1), float(b))
            sttf = int(fstats.get(f_, {}).get("sum_ttf", 0))
            self.avgdl_f[f_] = avgdl32(sttf, self.doc_count)
            self.cache_f[f_] = norm_cache32(self.avgdl_f[f_], k1=k1, b=b)
            self.avgdl64_f[f_] = (sttf / self.doc_count) if sttf > 0 else 1.0
        self.avgdl = self.avgdl_f[self.default_field]
        self.cache = self.cache_f[self.default_field]
        self.avgdl64 = self.avgdl64_f[self.default_field]
        # reads go through the manifest's dir list (the commit point), not
        # directory discovery — a crashed merge's staged dirs are invisible
        self._postings = read_seg_table(spark, index_dir, m, "postings")
        self._docmeta = read_seg_table(spark, index_dir, m, "docmeta")
        # doc-values update overlay (.dvu-generation analogue): project
        # coalesce(latest overlay value, stored value) over docmeta —
        # postings/norms/stats untouched, like the reference's DV updates
        # .dvu overlay projection, gen-scoped (see merge.apply_dv_overlay:
        # an update applies only to segments with seg.gen <= update.gen,
        # so delete-then-readd never inherits a stale overlay value)
        from .merge import apply_dv_overlay
        self._docmeta = apply_dv_overlay(
            spark, index_dir, self._docmeta, self.key_col, m["segments"])
        self._term_stats = spark.read.parquet(
            os.path.join(index_dir, m.get("term_stats_dir", "term_stats")))
        # live docs: tombstones resolved to (seg, doc) once, anti-joined onto
        # every match frame (live_docs.rs analogue; stats stay stale until
        # merge squeezes deletes out, exactly like Lucene). A tombstone
        # applies only to docs ADDED at or before the delete (per-doc
        # add-gen <= tombstone.gen — the DocumentsWriterDeleteQueue
        # sequence-number rule, doc-precise across merges via the
        # manifest's gen_ranges), so delete-then-reindex never hides the
        # re-added doc, and a delete racing a merge still hides its
        # victims after the merge commits.
        self._deleted = None
        self._bcast_deleted = True
        tomb_dir = os.path.join(index_dir, "tombstones")
        if storage.is_dir(tomb_dir) and any(
                f.endswith(".parquet") for f in storage.listdir(tomb_dir)):
            # broadcast only while the tombstone set is small; above the
            # cap fall back to a shuffle anti-join (tombstones accumulate
            # unboundedly between merges — a broadcast would not); the
            # count is footer-metadata only, through the storage seam.
            # Cap sizing (RUCENE_TOMB_BCAST_CAP): 4M (key, gen) rows is
            # ~64 MiB broadcast / a few hundred MiB of transient driver
            # state in _tomb_by_seg — comfortably inside an 8 GiB
            # executor. The original 500k cap was the 30M-doc probe's
            # one cliff (BENCH_30M.json: 2% deletes = 600k tombstones
            # tripped the shuffle path, post-merge term query 1.1s →
            # 20.5s warm); above the cap, sustained delete-heavy
            # workloads should merge (which folds tombstones) rather
            # than serve through the anti-join forever.
            n_tomb = sum(
                storage.parquet_num_rows(os.path.join(tomb_dir, f))
                for f in storage.listdir(tomb_dir) if f.endswith(".parquet"))
            self._bcast_deleted = n_tomb <= int(
                os.environ.get("RUCENE_TOMB_BCAST_CAP", "4000000"))
            tomb = spark.read.parquet(tomb_dir)
            if "gen" not in tomb.columns:
                tomb = tomb.withColumn("gen", F.lit(1 << 62))
            tomb = tomb.select(F.col("key").alias("_tk"),
                               F.col("gen").alias("_tg")).distinct()
            if self._bcast_deleted:
                tomb = F.broadcast(tomb)
            # per-doc add-gen scope (merge.gen_scope_expr): merged
            # segments carry gen_ranges, so a delete issued while a
            # merge was in flight still hides its victims afterwards
            from .merge import gen_scope_expr
            self._deleted = self._docmeta.join(
                tomb,
                (F.col(self.key_col).cast("string") == F.col("_tk"))
                & (gen_scope_expr(m["segments"]) <= F.col("_tg")),
            ).select("seg", "doc")
        self._score_t = "float" if scoring == "lucene" else "double"
        self._score_schema = _SCORE_SCHEMA if scoring == "lucene" else _SCORE_SCHEMA64
        self._stats_cache: dict[tuple[str, str], dict | None] = {}
        self._plan_cache: dict[tuple[str, int], DataFrame] = {}
        self._tomb_cache: dict[int, np.ndarray] | None = None
        self._single_file: bool | None = None
        # hot-pair bigram channel (build.py _invert_pairs): frozen hot
        # vocabulary, loaded lazily from the sidecar on first exact-phrase
        # search (driver collect bounded by the hot-vocab size)
        self._bigram_cfg = m.get("bigrams")
        self._bigram_vocab: dict[str, frozenset] | None = None
        # filter-set query cache (cache.py). Generation key = manifest
        # content hash (the commit point, like SearcherManager's token)
        # PLUS the dv-overlay file set: DV updates change RangeQuery /
        # ExistsQuery membership via the docmeta overlay projection
        # WITHOUT publishing a new manifest, so a manifest-only key
        # would let a post-update searcher hit a stale cached set.
        # Tombstones need no key bits: cached frames are pre-`_live`,
        # every searcher anti-joins its own deletes on top.
        self._query_cache = query_cache
        self._caching_policy = None
        if query_cache is not None:
            if caching_policy is None:
                from .cache import UsageTrackingQueryCachingPolicy
                caching_policy = UsageTrackingQueryCachingPolicy()
            self._caching_policy = caching_policy
            import hashlib
            from .build import MANIFEST
            from .merge import DV_UPDATES
            src = storage.read_text(os.path.join(index_dir, MANIFEST))
            dvu = os.path.join(index_dir, DV_UPDATES)
            if storage.is_dir(dvu):
                src += "|" + ",".join(sorted(
                    f for f in storage.listdir(dvu) if f.endswith(".parquet")))
            self._gen_key = hashlib.sha256(src.encode()).hexdigest()

    def _coalesced(self, scan: DataFrame) -> DataFrame:
        """Pack multiple segment files into one scan task when segments
        far outnumber cores. The collector kernels reduce per SEGMENT
        inside the worker (np.unique(seg) loop), so their only layout
        invariant is that a segment's rows stay wholly inside one
        partition — coalesce() unions WHOLE input partitions with no
        shuffle and no file splits, preserving it. Without this, a
        229-segment index pays 229 task setups per query (~8 waves on
        32 cores) even though the term-pruned data per task is tiny —
        the 10M-doc profile showed every query family converging to
        this per-segment fixed cost (BENCH_10M.json). 2× parallelism
        keeps all cores busy under skewed segment sizes."""
        if os.environ.get("RUCENE_COALESCE", "1") == "0":
            return scan
        n_segs = len(self.manifest["segments"])
        target = 2 * self.spark.sparkContext.defaultParallelism
        if n_segs > target:
            return scan.coalesce(target)
        return scan

    def _segs_single_file(self) -> bool:
        """True iff every committed postings segment dir holds exactly ONE
        parquet file — the invariant the per-segment collector kernels
        (search_many's _collector_topk_frame, _phrase_collector_topk)
        require: their reduce is partition-local and the scan pins one
        FILE per partition, so a segment split across files would split a
        doc's clause rows across partitions and corrupt the boolean /
        phrase arithmetic. Build and merge writers both emit single-file
        postings; this memoized check (one listdir per segment, through
        the storage seam, first collector use only) makes legacy
        multi-file merged segments fall back to the layout-independent
        JVM aggregation paths instead of returning wrong results.

        Segments the manifest marks ``doc_sharded`` are exempt: the
        merger wrote them as doc-range-DISJOINT files (blocks cut at
        shard boundaries — SegmentMerger.merge), so each file holds its
        docs' clause rows completely and is its own valid reduce unit;
        the kernels' per-chunk arithmetic and top-k remain exact, the
        combine is a top-k union either way."""
        if self._single_file is None:
            from .build import seg_table_paths
            segs = self.manifest["segments"]
            paths = seg_table_paths(self.index_dir, self.manifest,
                                    "postings")
            self._single_file = all(
                s.get("doc_sharded")
                or sum(f.endswith(".parquet")
                       for f in storage.listdir(p)) <= 1
                for s, p in zip(segs, paths))
        return self._single_file

    def _bigram_hot(self, field: str):
        """Frozen hot vocabulary of the field's bigram channel, or None
        when the index has no channel / the env kill-switch is set."""
        if (self._bigram_cfg is None
                or os.environ.get("RUCENE_PHRASE_BIGRAMS", "1") == "0"):
            return None
        if self._bigram_vocab is None:
            from .build import load_bigram_vocab
            self._bigram_vocab = load_bigram_vocab(
                self.index_dir, {"bigrams": self._bigram_cfg}) or {}
        return self._bigram_vocab.get(field)

    def _tomb_by_seg(self) -> dict[int, np.ndarray]:
        """Resolved tombstones as per-segment sorted doc-id arrays, for the
        collector kernel's in-worker live-docs mask.  Only called when the
        broadcast gate held (RUCENE_TOMB_BCAST_CAP, default 4M
        tombstones), so the driver materializes at most that many
        (seg, doc) pairs — the same bound the broadcast anti-join
        already implies."""
        if self._deleted is None:
            return {}
        if self._tomb_cache is None:
            # Arrow-batched transfer: at the 4M-row cap a py4j
            # row-at-a-time collect costs tens of seconds; toPandas
            # under Arrow moves the two int columns in columnar
            # batches. The conf flip is runtime-scoped and restored —
            # sessions that keep Arrow off elsewhere are unaffected.
            conf = self.spark.conf
            key = "spark.sql.execution.arrow.pyspark.enabled"
            prev = conf.get(key, "false")
            conf.set(key, "true")
            try:
                pdf = self._deleted.toPandas()
            finally:
                conf.set(key, prev)
            segs = pdf["seg"].to_numpy(dtype=np.int64)
            docs = pdf["doc"].to_numpy(dtype=np.int64)
            order = np.lexsort((docs, segs))
            segs, docs = segs[order], docs[order]
            bounds = np.flatnonzero(np.diff(segs)) + 1
            self._tomb_cache = {
                int(chunk_segs[0]): np.unique(chunk_docs)
                for chunk_segs, chunk_docs in zip(
                    np.split(segs, bounds), np.split(docs, bounds))
                if chunk_segs.size}
        return self._tomb_cache

    def warmup(self) -> "IndexSearcher":
        """Absorb the session's first-query fixed costs before serving
        traffic: spawn the Python worker pool on every scan slot, read
        each postings segment file's parquet footer, prime the
        term-stats footer, and materialize the tombstone / layout
        memos. The work is metadata-plus-one-int-column only — no
        postings bytes are decoded — yet it fronts the cold-start the
        first real query otherwise pays (measured 10.1s first vs 5.2s
        steady at 10M docs, BENCH_10M.json). This is the
        SearcherFactory warm hook of the reference's SearcherManager
        (search_manager.rs:132 SearcherFactory; Lucene warms new NRT
        searchers the same way); streaming.SearcherManager calls it
        before swapping a refreshed searcher in."""
        def fn(it):
            n = 0
            for b in it:
                n += len(b)
            yield pd.DataFrame({"n": [n]})

        self._coalesced(self._postings.select("seg")).mapInPandas(
            fn, "n long").collect()
        self._term_stats.select("term").limit(1).collect()
        if self._bcast_deleted:
            self._tomb_by_seg()
        self._segs_single_file()
        return self

    def _check_field(self, field: str) -> None:
        """Unknown fields are a hard error — never silently score against
        another field's postings (round-1 VERDICT 'What's wrong #1')."""
        if field not in self.fields:
            raise ValueError(
                f"unknown field {field!r}; index has {self.fields}")

    def _check_positions(self, field: str) -> None:
        """Positional queries against a docs/freqs-level field are a hard
        error, matching the reference's IllegalState on running a
        phrase/span over a field indexed without positions
        (index_options.rs:18-24; posting_iterator position checks)."""
        opt = self.field_options.get(field, "positions")
        if opt != "positions":
            raise ValueError(
                f"field {field!r} was indexed at level {opt!r} (no"
                " positions); phrase/span queries require"
                " index options 'positions'")

    def _check_verify_cap(self, candidate_bound: int, what: str) -> None:
        """Reject a per-doc-Python verify whose metadata candidate bound
        (min required-clause df — free from term stats, no job) exceeds
        ``verify_candidate_cap``. The bound is conservative: the real
        conjunction can only be smaller, but a query whose RAREST
        required term matches more than the cap would verify a
        corpus-sized candidate set doc-by-doc in Python — at 10^12 docs
        that is the one loop that cannot be allowed to run implicitly."""
        if candidate_bound > self.verify_candidate_cap:
            raise ValueError(
                f"{what}: candidate bound {candidate_bound:,} exceeds"
                f" verify_candidate_cap={self.verify_candidate_cap:,}."
                " Narrow the query (FilterQuery / rarer required term),"
                " use an exact phrase (slop=0, fully JVM-side), or"
                " construct IndexSearcher(verify_candidate_cap=...)"
                " deliberately higher.")

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def _live(self, frame: DataFrame) -> DataFrame:
        """Skip deleted docs (BulkScorer's live_docs check, bulk_scorer.rs).
        Broadcast only below the tombstone cap; large delete sets anti-join
        by shuffle instead of flooding every executor."""
        if self._deleted is None:
            return frame
        deleted = (F.broadcast(self._deleted) if self._bcast_deleted
                   else self._deleted)
        return frame.join(deleted, ["seg", "doc"], "left_anti")

    _PLAN_CACHE_MAX = 1024
    # clause-table literal-inline cap for _batch_term_frame (above it, the
    # broadcast-join form with its one materialization job wins)
    _CL_LITERAL_MAX = 128

    def search(self, query: Query, k: int = 10) -> DataFrame:
        """Top-k by (score desc, seg asc, doc asc) joined back to doc keys.

        The planned DataFrame is memoized per (query value, k): Catalyst
        analysis/optimization is a fixed DRIVER cost that does not shrink
        with executor count, so a serving tier replaying a query mix
        would otherwise pay it per request (it caps throughput-scaling
        efficiency the way any serial fraction does). Unlike the
        reference's LRUQueryCache — a RESULT cache, disabled there
        (searcher.rs:696-701) — this caches only the plan: every call
        still executes the full distributed job, so deletes visible to
        THIS searcher (fixed at construction, like a Lucene point-in-time
        reader) and scores are always freshly computed."""
        ck = (repr(query), k)
        hit = self._plan_cache.get(ck)
        if hit is not None:
            return hit
        q0, b0 = self._fold_boost(query, np.float32(1.0))
        if (isinstance(q0, PhraseQuery)
                and (self._deleted is None or self._bcast_deleted)
                and os.environ.get("RUCENE_PHRASE_COLLECTOR", "1") != "0"
                and self._segs_single_file()):
            # root phrase (exact or sloppy): per-segment impact-pruned
            # collector — live-masked and per-seg top-k'd in the worker
            frame = self._phrase_collector_topk(q0, b0, k)
        elif (isinstance(q0, DisjunctionMaxQuery)
              and os.environ.get("RUCENE_TERM_COLLECTOR", "1") != "0"
              and self.doc_count >= int(os.environ.get(
                  "RUCENE_COLLECTOR_MIN_DOCS", "100000"))
              and (self._deleted is None or self._bcast_deleted)
              and self._segs_single_file()
              and all(isinstance(self._fold_boost(d, b0)[0], TermQuery)
                      for d in q0.disjuncts)
              and len({(self._fold_boost(d, b0)[0].field,
                        self._fold_boost(d, b0)[0].term)
                       for d in q0.disjuncts}) == len(q0.disjuncts)):
            # root dismax over unique term disjuncts: per-segment
            # collector (max + tie fold in-worker, ≤k rows per segment)
            frame = self._dismax_collector_topk(q0, b0, k)
        elif (isinstance(q0, _SpanQueryT)
              and os.environ.get("RUCENE_SPAN_COLLECTOR", "1") != "0"
              and (self._deleted is None or self._bcast_deleted)
              and self._segs_single_file()):
            # root span query: per-segment collector with span-count
            # impact bounds (conjunction + verify + top-k in-worker)
            frame = self._span_collector_topk(q0, b0, k)
        else:
            fs = None
            # Cost-based routing (the reference picks scorers by cost the
            # same way, boolean_query.rs BooleanWeight): the collector
            # kernel is zero-shuffle but pays a fixed mapInPandas setup
            # (~0.5s measured), while the JVM frame path's shuffle grows
            # with the corpus. Below the doc threshold the frame path
            # wins (5k docs: 0.05s vs 0.6s); above it the kernel does
            # (480k+: it is what closed the serving scaling axis).
            min_docs = int(os.environ.get(
                "RUCENE_COLLECTOR_MIN_DOCS", "100000"))
            if (os.environ.get("RUCENE_TERM_COLLECTOR", "1") != "0"
                    and self.doc_count >= min_docs
                    and (self._deleted is None or self._bcast_deleted)
                    and self._segs_single_file()):
                fs = self._flat_specs(query, 0, [0])
            if fs is not None:
                # flattenable term/boolean query: the same zero-shuffle
                # per-segment collector kernel a serving micro-batch uses
                # (_collector_topk_frame), as a batch of one — one scan
                # task per segment, k rows per segment out, no exchange
                # before the final tiny merge.  Already live-masked and
                # score-bit-identical to the _frame path
                # (tests/test_search_many.py).
                specs = fs[0]
                stats = self._stats_for(
                    [(f_, t) for f_, t, _, _, _ in specs])
                frame = self._collector_topk_frame(
                    specs, fs[2], {0: fs}, k, stats
                ).select("seg", "doc", "score")
            else:
                frame = self._live(
                    self._frame(query, np.float32(1.0), needs_scores=True))
        topk = frame.orderBy(F.desc("score"), "seg", "doc").limit(k)
        out = (
            self._docmeta.join(F.broadcast(topk), ["seg", "doc"])
            .orderBy(F.desc("score"), "seg", "doc")
        )
        if len(self._plan_cache) < self._PLAN_CACHE_MAX:
            self._plan_cache[ck] = out
        return out

    @staticmethod
    def _fold_boost(q: Query, boost: np.float32):
        while isinstance(q, BoostQuery):
            boost = np.float32(boost * np.float32(q.boost))
            q = q.query
        return q, boost

    def _flat_specs(self, q: Query, qid: int, gid_counter: list,
                    boost: np.float32 = np.float32(1.0)):
        """Flatten a term/boolean query (ONE level of nested boolean
        groups allowed) into batch-executor clause specs tagged
        ``"{qid}|{gtok}|{role}"`` where ``gtok`` is ``r`` for root
        clauses or a batch-globally-unique ``g<N>`` for members of a
        nested group. Returns
        ``(specs, (root_nm, root_nf, root_msm), groups)`` with
        ``groups[gtok] = (parent_role, scored, nm, nf, msm)``, or None
        if the shape needs its own frame (phrase/span/dismax/deeper
        nesting). Mirrors ``_boolean_frame``'s add() boost/role handling
        exactly so scores stay bit-identical to the per-query path."""
        q, boost = self._fold_boost(q, boost)
        if isinstance(q, TermQuery):
            eff = float(np.float32(boost * np.float32(q.boost)))
            return ([(q.field, q.term, f"{qid}|r|s", eff, True)],
                    (0, 0, 0), {})
        if not isinstance(q, BooleanQuery):
            return None
        specs: list[tuple] = []
        groups: dict[str, tuple] = {}
        clauses = [(q.musts, "m", True), (q.shoulds, "s", True),
                   (q.filters, "f", False), (q.must_nots, "n", False)]
        for subs, role, scored in clauses:
            for sub in subs:
                sub, sub_boost = self._fold_boost(
                    sub, boost if scored else np.float32(1.0))
                if isinstance(sub, TermQuery):
                    eff = (float(np.float32(sub_boost
                                            * np.float32(sub.boost)))
                           if scored else 1.0)
                    specs.append(
                        (sub.field, sub.term, f"{qid}|r|{role}", eff,
                         scored))
                    continue
                if not isinstance(sub, BooleanQuery):
                    return None
                inner = [(sub.musts, "m", True), (sub.shoulds, "s", True),
                         (sub.filters, "f", False),
                         (sub.must_nots, "n", False)]
                flat_members = []
                for isubs, irole, iscored in inner:
                    for m in isubs:
                        m, m_boost = self._fold_boost(
                            m, sub_boost if (scored and iscored)
                            else np.float32(1.0))
                        if not isinstance(m, TermQuery):
                            return None
                        eff = (float(np.float32(m_boost
                                                * np.float32(m.boost)))
                               if (scored and iscored) else 1.0)
                        flat_members.append((m, irole, eff,
                                             scored and iscored))
                gid_counter[0] += 1
                gtok = f"g{gid_counter[0]}"
                for m, irole, eff, isc in flat_members:
                    specs.append(
                        (m.field, m.term, f"{qid}|{gtok}|{irole}", eff,
                         isc))
                groups[gtok] = (role, scored, len(sub.musts),
                                len(sub.filters), sub.min_should_match)
        return (specs, (len(q.musts), len(q.filters),
                        q.min_should_match), groups)

    @staticmethod
    def _int_map(d: dict[int, int]):
        return F.map_from_arrays(
            F.array(*[F.lit(int(i)) for i in d]),
            F.array(*[F.lit(int(v)) for v in d.values()]))

    def search_many(self, queries: list[Query], k: int = 10) -> DataFrame:
        """Micro-batch serving: top-k for MANY queries in ONE distributed
        job, returned with a ``qid`` column (the query's index in
        ``queries``).

        One Spark job per request is a local-mode anti-pattern: job
        dispatch is a fixed driver cost, so per-request serving stops
        scaling with executors as soon as the per-query work is small
        (the reference serves per-query because a native process has no
        such dispatch floor — searcher.rs drives scorers inline). A
        high-throughput tier instead aggregates concurrent requests into
        micro-batches.

        The batch does NOT become one union branch per query — a
        200-branch union schedules thousands of tiny tasks through the
        driver's single-threaded DAG scheduler, which is exactly the
        serial floor again. Instead every term/boolean query in the
        batch is flattened into ONE shared clause table
        (``_flat_specs``) and executed by the same bit-exact batched
        kernel a single boolean query uses (``_batch_term_frame``): one
        term-pruned scan + one Arrow decode for the WHOLE batch, one
        (qid, seg, doc) aggregation applying each query's
        must/filter/not/msm arithmetic via literal per-qid maps, then a
        two-phase top-k — per (qid, seg) first, so no single reducer
        ever sees more than (k × n_segments) rows per query, then per
        qid on that reduced set. One level of nested boolean groups
        rides the same kernel (a second tiny aggregation turns each
        satisfied group into a virtual root clause). Queries the
        flattener rejects (phrase/span/dismax/deeper nesting) keep
        their own rank-identical TakeOrdered branch and union in. Stage
        count is constant in batch size; rank/score identity vs
        per-query search() is asserted by tests/test_search_many.py."""
        ck = (tuple(repr(q) for q in queries), k, "many")
        hit = self._plan_cache.get(ck)
        if hit is not None:
            return hit
        flat: dict[int, tuple] = {}
        others: list[int] = []
        gid_counter = [0]
        for i, q in enumerate(queries):
            fs = self._flat_specs(q, i, gid_counter)
            if fs is not None:
                flat[i] = fs
            else:
                others.append(i)

        branches = []
        if (flat and (self._deleted is None or self._bcast_deleted)
                and self._segs_single_file()):
            # per-segment collector kernel: zero-shuffle scoring + boolean
            # arithmetic + per-(query, segment) top-k inside the worker;
            # only (n_q × n_seg × k) rows reach the final per-query merge
            all_specs = [s for specs, _, _ in flat.values()
                         for s in specs]
            all_groups = {gtok: g for _, _, groups in flat.values()
                          for gtok, g in groups.items()}
            stats = self._stats_for(
                [(f_, t) for f_, t, _, _, _ in all_specs])
            coll = self._collector_topk_frame(
                all_specs, all_groups, flat, k, stats)
            w2 = Window.partitionBy("_q").orderBy(
                F.desc("score"), "seg", "doc")
            branches.append(
                coll.withColumn("_rn", F.row_number().over(w2))
                .filter(F.col("_rn") <= k).drop("_rn")
                .select(F.col("_q").alias("qid"), "seg", "doc", "score"))
        elif flat:
            # tombstones above the broadcast gate: keep the JVM
            # aggregation chain whose _live anti-join shuffles instead of
            # materializing the tombstone set on the driver
            all_specs = [s for specs, _, _ in flat.values()
                         for s in specs]
            all_groups = {gtok: g for _, _, groups in flat.values()
                          for gtok, g in groups.items()}
            stats = self._stats_for(
                [(f_, t) for f_, t, _, _, _ in all_specs])
            rows = self._batch_term_frame(all_specs, stats, with_tag=True)
            r = rows.select("_q", "_g", "seg", "doc", "score", "_r")
            # stage 1: aggregate per (qid, group, doc) — root clauses and
            # each nested group's members reduce independently (_q/_g/_r
            # are int codes from the clause table: no string hashing in
            # the batch's widest groupBy)
            g1 = r.groupBy("_q", "_g", "seg", "doc").agg(
                F.sum(F.when(F.col("_r") <= 1, F.col("score"))
                      .otherwise(F.lit(0.0))).alias("_sc"),
                F.count(F.when(F.col("_r") == 0, 1)).alias("_nm"),
                F.count(F.when(F.col("_r") == 1, 1)).alias("_ns"),
                F.count(F.when(F.col("_r") == 2, 1)).alias("_nf"),
                F.count(F.when(F.col("_r") == 3, 1)).alias("_nn"),
            )
            # stage 2: nested groups become virtual root clauses — kept
            # only when the group's own must/filter/not/msm arithmetic is
            # satisfied, contributing one count in the parent role and
            # (for scored roles) the group score cast like the per-query
            # nested frame does. Per-group and per-query requirement
            # constants ride in TINY broadcast-joined metadata frames —
            # literal map/when expression trees over hundreds of entries
            # sent the Catalyst optimizer quadratic (measured 40-100s per
            # plan); two broadcast hash joins plan in milliseconds.
            spark = self.spark
            if all_groups:
                gmeta = spark.createDataFrame(
                    [(int(gtok[1:]), _ROLE_CODE[v[0]], v[2], v[3], v[4])
                     for gtok, v in all_groups.items()],
                    "_g int, _grole int, _gnm long, _gnf long,"
                    " _gms long")
                j = g1.join(F.broadcast(gmeta), "_g", "left")
                is_root = F.col("_grole").isNull()
                g_ok = ((F.col("_nm") == F.col("_gnm"))
                        & (F.col("_nf") == F.col("_gnf"))
                        & (F.col("_nn") == 0)
                        & (F.col("_ns") >= F.col("_gms")))
                gsc = (F.when(F.col("_grole") <= 1,
                              F.col("_sc").cast(self._score_t)
                              .cast("double"))
                       .otherwise(F.lit(0.0)))
                contrib = j.filter(is_root | g_ok).select(
                    "_q", "seg", "doc",
                    F.when(is_root, F.col("_sc")).otherwise(gsc)
                    .alias("_sc"),
                    F.when(is_root, F.col("_nm")).otherwise(
                        (F.col("_grole") == 0).cast("long")).alias("_nm"),
                    F.when(is_root, F.col("_ns")).otherwise(
                        (F.col("_grole") == 1).cast("long")).alias("_ns"),
                    F.when(is_root, F.col("_nf")).otherwise(
                        (F.col("_grole") == 2).cast("long")).alias("_nf"),
                    F.when(is_root, F.col("_nn")).otherwise(
                        (F.col("_grole") == 3).cast("long")).alias("_nn"),
                )
                agg = contrib.groupBy("_q", "seg", "doc").agg(
                    F.sum("_sc").alias("_score"),
                    F.sum("_nm").alias("_nm"), F.sum("_ns").alias("_ns"),
                    F.sum("_nf").alias("_nf"), F.sum("_nn").alias("_nn"))
            else:
                agg = g1.select(
                    "_q", "seg", "doc", F.col("_sc").alias("_score"),
                    "_nm", "_ns", "_nf", "_nn")
            qmeta = spark.createDataFrame(
                [(i, v[1][0], v[1][1], v[1][2])
                 for i, v in flat.items()],
                "_q int, _rnm long, _rnf long, _rms long")
            cond = (
                (F.col("_nm") == F.col("_rnm"))
                & (F.col("_nf") == F.col("_rnf"))
                & (F.col("_nn") == 0)
                & (F.col("_ns") >= F.col("_rms"))
            )
            cand = self._live(
                agg.join(F.broadcast(qmeta), "_q").filter(cond).select(
                    F.col("_q").alias("qid"), "seg", "doc",
                    F.col("_score").cast(self._score_t).alias("score")))
            w1 = Window.partitionBy("qid", "seg").orderBy(
                F.desc("score"), "doc")
            w2 = Window.partitionBy("qid").orderBy(
                F.desc("score"), "seg", "doc")
            branches.append(
                cand.withColumn("_rn", F.row_number().over(w1))
                .filter(F.col("_rn") <= k).drop("_rn")
                .withColumn("_rn", F.row_number().over(w2))
                .filter(F.col("_rn") <= k).drop("_rn"))
        for i in others:
            qi, bi = self._fold_boost(queries[i], np.float32(1.0))
            if (isinstance(qi, PhraseQuery)
                    and (self._deleted is None or self._bcast_deleted)
                    and os.environ.get(
                        "RUCENE_PHRASE_COLLECTOR", "1") != "0"
                    and self._segs_single_file()):
                # phrases ride the zero-shuffle per-segment collector
                # (already live-masked + per-seg top-k'd)
                frame = self._phrase_collector_topk(qi, bi, k)
            elif (isinstance(qi, _SpanQueryT)
                    and (self._deleted is None or self._bcast_deleted)
                    and os.environ.get(
                        "RUCENE_SPAN_COLLECTOR", "1") != "0"
                    and self._segs_single_file()):
                frame = self._span_collector_topk(qi, bi, k)
            elif (isinstance(qi, DisjunctionMaxQuery)
                    and (self._deleted is None or self._bcast_deleted)
                    and os.environ.get(
                        "RUCENE_TERM_COLLECTOR", "1") != "0"
                    and self.doc_count >= int(os.environ.get(
                        "RUCENE_COLLECTOR_MIN_DOCS", "100000"))
                    and self._segs_single_file()
                    and all(isinstance(self._fold_boost(d, bi)[0],
                                       TermQuery) for d in qi.disjuncts)
                    and len({(self._fold_boost(d, bi)[0].field,
                              self._fold_boost(d, bi)[0].term)
                             for d in qi.disjuncts})
                    == len(qi.disjuncts)):
                frame = self._dismax_collector_topk(qi, bi, k)
            else:
                frame = self._live(self._frame(
                    queries[i], np.float32(1.0), needs_scores=True))
            branches.append(
                frame.orderBy(F.desc("score"), "seg", "doc").limit(k)
                .select(F.lit(i).alias("qid"), "seg", "doc", "score"))
        topk = reduce(DataFrame.unionByName, branches)
        out = (
            self._docmeta.join(F.broadcast(topk), ["seg", "doc"])
            .orderBy("qid", F.desc("score"), "seg", "doc")
        )
        if len(self._plan_cache) < self._PLAN_CACHE_MAX:
            self._plan_cache[ck] = out
        return out

    def _collector_topk_frame(self, all_specs: list[tuple],
                              all_groups: dict, flat: dict,
                              k: int, stats: dict) -> DataFrame:
        """Per-SEGMENT top-k collector for a flattened serving batch — the
        reference's per-segment search loop (searcher.rs drives one
        collector per LeafReader, then merges) re-expressed as one
        mapInPandas pass with NO shuffle.

        A doc's postings live entirely inside its segment, and the scan is
        partitioned one-segment-per-file (searcher __init__ pins
        maxPartitionBytes/openCostInBytes), so every (query, doc) boolean
        reduction — clause sums, must/filter/not counts, msm, one-level
        group folds — is segment-LOCAL.  The worker therefore folds its
        whole partition down to k rows per (query, segment) with numpy
        sort+reduceat, and only (n_queries × n_segments × k) metadata-sized
        rows ever leave the executors.  This replaces two ~(postings ×
        clauses)-row shuffles plus a global window sort (measured 12M+
        shuffled rows for a 200-query batch at 480k docs — the serving
        scaling ceiling) with zero exchanges before the final tiny merge.

        Global top-k correctness: the final (score desc, seg asc, doc asc)
        order restricted to one segment is the segment's own order, so the
        global top-k is a subset of the union of per-segment top-k's.
        Tombstones are masked in-worker (per-seg sorted arrays; only built
        under the RUCENE_TOMB_BCAST_CAP broadcast gate) BEFORE ranks are assigned, exactly
        like the anti-join path.  Score arithmetic reuses the gather
        expansion + IEEE op order of the batch kernel, and stage sums run
        in scan order via stable lexsort, so scores stay bit-identical to
        per-query search() (asserted by tests/test_search_many.py).
        Output: one frame ``_q int, seg, doc, score`` of per-(query,
        segment) top-k already msm-filtered and live-masked.
        """
        by_key: dict[tuple[str, str], list] = {}
        for field, term, tag, boost, scored in all_specs:
            self._check_field(field)
            wk32, idf_64, b64 = self._term_weights(field, term, boost,
                                                   stats)
            by_key.setdefault((field, term), []).append(
                (tag, scored, wk32, idf_64, b64))

        cache_f = self.cache_f
        scoring = self.scoring
        lucene = scoring == "lucene"
        ftype = np.float32 if lucene else np.float64

        def _parse(tag):
            qs, gs, rs = tag.split("|")
            return (int(qs), 0 if gs == "r" else int(gs[1:]),
                    _ROLE_CODE[rs])

        coef64 = {
            key: [(tag, scored, np.float32(wk32),
                   (idf_64 * b64) * _kp1_64(self.sim_f[key[0]][0]),
                   self.sim_f[key[0]][0], self.sim_f[key[0]][1])
                  for tag, scored, wk32, idf_64, b64 in specs_]
            for key, specs_ in by_key.items()
        }
        _keys = list(coef64)
        kid_of = {key: i for i, key in enumerate(_keys)}
        cl_counts = np.asarray([len(coef64[key]) for key in _keys],
                               dtype=np.int64)
        cl_starts = np.cumsum(cl_counts) - cl_counts
        _flat = [c for key in _keys for c in coef64[key]]
        parsed = [_parse(c[0]) for c in _flat]
        qid_cat = np.asarray([p[0] for p in parsed], dtype=np.int32)
        gid_cat = np.asarray([p[1] for p in parsed], dtype=np.int32)
        role_cat = np.asarray([p[2] for p in parsed], dtype=np.int8)
        scored_cat = np.asarray([c[1] for c in _flat], dtype=bool)
        wk32_cat = np.asarray([c[2] for c in _flat], dtype=np.float32)
        coef_cat = np.asarray([c[3] for c in _flat], dtype=np.float64)
        k1_cat = np.asarray([c[4] for c in _flat], dtype=np.float64)
        b_cat = np.asarray([c[5] for c in _flat], dtype=np.float64)
        fld_cat = np.asarray(
            [key[0] for key in _keys for _ in coef64[key]], dtype=object)
        avg_cat = np.asarray(
            [self.avgdl64_f[key[0]] for key in _keys
             for _ in coef64[key]], dtype=np.float64)

        # group metadata indexed by gid (0 = root, unused slot)
        n_g = max((int(g[1:]) for g in all_groups), default=0)
        g_role = np.zeros(n_g + 1, dtype=np.int8)
        g_nm = np.zeros(n_g + 1, dtype=np.int64)
        g_nf = np.zeros(n_g + 1, dtype=np.int64)
        g_ms = np.zeros(n_g + 1, dtype=np.int64)
        for gtok, (prole, _scored, nm_, nf_, ms_) in all_groups.items():
            gi = int(gtok[1:])
            g_role[gi] = _ROLE_CODE[prole]
            g_nm[gi], g_nf[gi], g_ms[gi] = nm_, nf_, ms_
        # per-query root requirements indexed by qid
        n_q = max(flat) + 1
        r_nm = np.zeros(n_q, dtype=np.int64)
        r_nf = np.zeros(n_q, dtype=np.int64)
        r_ms = np.zeros(n_q, dtype=np.int64)
        for i, (_specs, (nm_, nf_, ms_), _groups) in flat.items():
            r_nm[i], r_nf[i], r_ms[i] = nm_, nf_, ms_

        tomb = self._tomb_by_seg()
        k_ = int(k)

        # opt-in worker profile: one summary line per mapInPandas call
        # (decode vs reduce wall/cpu) appended under /tmp/rucene_prof
        prof = os.environ.get("RUCENE_COLLECTOR_PROF")

        def fn(batches):
            import time as _time
            t_wall0, t_cpu0 = _time.time(), _time.process_time()
            n_in = n_exp_tot = 0
            # streamed per segment (see _iter_seg_chunks): decode,
            # expand, reduce and emit one segment at a time, so worker
            # memory is bounded by one segment's scan rows however many
            # segments _coalesced packs into this task
            for s, pdf in _iter_seg_chunks(batches):
                n_rows = len(pdf)
                n_in += n_rows
                counts = pdf["num_docs"].to_numpy(np.int64)
                docs = batch_delta_decode(
                    batch_unpack(pdf["docs_bin"].tolist(), counts), counts
                ).astype(np.int64)
                tfs = batch_unpack(pdf["tfs_bin"].tolist(), counts)
                v_starts = np.cumsum(counts) - counts
                flds = pdf["field"].tolist()
                trms = pdf["term"].tolist()

                row_kid = np.fromiter(
                    (kid_of[(f_, t)] for f_, t in zip(flds, trms)),
                    dtype=np.int64, count=n_rows)
                rc = cl_counts[row_kid]
                n_exp = int(rc.sum())
                exp_row = np.repeat(np.arange(n_rows), rc)
                ends_rc = np.cumsum(rc)
                within = np.arange(n_exp) - np.repeat(ends_rc - rc, rc)
                cidx = np.repeat(cl_starts[row_kid], rc) + within
                identity = bool((rc == 1).all())
                lens_e = counts[exp_row]
                out_total = int(lens_e.sum())
                if identity:
                    idx = slice(None)
                else:
                    ends_e = np.cumsum(lens_e)
                    idx = (np.repeat(v_starts[exp_row], lens_e)
                           + np.arange(out_total)
                           - np.repeat(ends_e - lens_e, lens_e))

                tf_out = tfs[idx]
                fld_e = fld_cat[cidx]
                scored_e = scored_cat[cidx]
                if lucene:
                    nbs = batch_unpack(pdf["norms_bin"].tolist(), counts
                                       ).astype(np.int64)[idx]
                    denom = np.empty(out_total, dtype=np.float32)
                    for f_ in set(fld_e.tolist()):
                        mm = np.repeat(fld_e == f_, lens_e)
                        denom[mm] = cache_f[f_][nbs[mm]]
                    wk_v = np.repeat(wk32_cat[cidx], lens_e)
                    tff = tf_out.astype(np.float32)
                    sc = (wk_v * tff) / (tff + denom)
                else:
                    dls = batch_unpack(pdf["dls_bin"].tolist(), counts
                                       ).astype(np.float64)[idx]
                    avg_v = np.repeat(avg_cat[cidx], lens_e)
                    coef_v = np.repeat(coef_cat[cidx], lens_e)
                    k1_v = np.repeat(k1_cat[cidx], lens_e)
                    b_v = np.repeat(b_cat[cidx], lens_e)
                    tff = tf_out.astype(np.float64)
                    denom = tff + k1_v * ((1.0 - b_v) + b_v * dls / avg_v)
                    sc = coef_v * tff / denom
                sc = sc.astype(ftype)
                if not scored_e.all():
                    sc[np.repeat(~scored_e, lens_e)] = 0
                doc_a = docs[idx] if not identity else docs
                n_exp_tot += len(doc_a)
                q3, d3, s3 = _collector_seg_reduce(
                    doc_a,
                    np.repeat(qid_cat[cidx], lens_e),
                    np.repeat(gid_cat[cidx], lens_e),
                    np.repeat(role_cat[cidx], lens_e),
                    sc, g_role, g_nm, g_nf, g_ms,
                    r_nm, r_nf, r_ms, tomb.get(int(s)), lucene, ftype, k_)
                if len(q3) == 0:
                    continue
                yield pd.DataFrame({
                    "_q": q3,
                    "seg": np.full(len(q3), s, dtype=np.int32),
                    "doc": d3,
                    "score": s3,
                })
            if prof:
                os.makedirs("/tmp/rucene_prof", exist_ok=True)
                with open(f"/tmp/rucene_prof/{os.getpid()}.log", "a") as fh:
                    fh.write(
                        f"wall={_time.time() - t_wall0:.3f}"
                        f" cpu={_time.process_time() - t_cpu0:.3f}"
                        f" rows={n_in} exp={n_exp_tot}\n")

        by_field: dict[str, list[str]] = {}
        for f_, t in by_key:
            by_field.setdefault(f_, []).append(t)
        cond = reduce(
            lambda a, b: a | b,
            [(F.col("field") == f_) & F.col("term").isin(ts)
             for f_, ts in by_field.items()],
        )
        scan = self._postings.filter(cond).select(
            "field", "term", "seg", "num_docs", "docs_bin", "tfs_bin",
            "norms_bin", "dls_bin")
        return self._coalesced(scan).mapInPandas(
            fn, f"_q int, seg int, doc long, score {self._score_t}")

    def search_with_timeout(self, query: Query, k: int = 10,
                            timeout_s: float = 30.0) -> list:
        """TimeoutCollector analogue (collector/timeout.rs:34-98): bound
        the collection's wall clock. The reference's collector checks a
        deadline between per-leaf collect calls; in a distributed engine
        the natural cancellation unit is the JOB, so the search runs in
        its own Spark job group and the deadline cancels the group
        (interrupting running tasks). Raises ``TimeoutError`` on expiry —
        partial results of a cancelled distributed collection are not
        well-defined, so unlike the reference we surface the timeout
        instead of returning a truncated (non-deterministic) hit list.

        Job-group scoping from a worker thread requires PySpark's
        pinned-thread mode (``PYSPARK_PIN_THREAD``, the default since
        Spark 3.2): only then is ``setJobGroup`` thread-local on the JVM
        side. The search runs in an :class:`pyspark.InheritableThread`
        (the pinned-mode-aware thread wrapper); if pinning is explicitly
        disabled we skip the cancellation — cancelling a job group from a
        shared JVM thread could cancel unrelated concurrent jobs."""
        import os as _os
        import uuid as _uuid

        from pyspark import InheritableThread

        pinned = _os.environ.get(
            "PYSPARK_PIN_THREAD", "true").lower() != "false"
        sc = self.spark.sparkContext
        gid = f"rucene-timeout-{_uuid.uuid4().hex[:8]}"
        result: list = []
        err: list = []

        def run():
            if pinned:
                sc.setJobGroup(gid, "search_with_timeout",
                               interruptOnCancel=True)
            try:
                result.extend(self.search(query, k).collect())
            except Exception as e:  # cancelled jobs surface as Py4J errors
                err.append(e)

        t = InheritableThread(target=run, daemon=True)
        t.start()
        t.join(timeout_s)
        if t.is_alive():
            if pinned:
                sc.cancelJobGroup(gid)
                t.join(30.0)
            how = ("cancelled" if pinned else
                   "NOT cancelled: pinned-thread mode disabled")
            raise TimeoutError(
                f"search exceeded {timeout_s}s (job group {gid} {how})")
        if err:
            raise err[0]
        return result

    def count(self, query: Query) -> int:
        # count fast paths apply only without deletes (searcher.rs:632-654)
        if self._deleted is None:
            if isinstance(query, MatchAllDocsQuery):
                return self.doc_count
            if isinstance(query, TermQuery):
                self._check_field(query.field)
                stats = self._stats_for([(query.field, query.term)])
                row = stats.get((query.field, query.term))
                return int(row["df"]) if row else 0
        elif (self._bcast_deleted
              and os.environ.get("RUCENE_TERM_COLLECTOR", "1") != "0"):
            # tombstone-aware fast paths: Lucene's live count per leaf is
            # maxDoc - numDeletedDocs — a metadata fold, not a row export
            if isinstance(query, MatchAllDocsQuery):
                tomb = self._tomb_by_seg()
                return self.doc_count - sum(len(v) for v in tomb.values())
            if (isinstance(query, TermQuery)
                    and self.doc_count >= int(os.environ.get(
                        "RUCENE_COLLECTOR_MIN_DOCS", "100000"))):
                self._check_field(query.field)
                return self._term_count_live(query)
        return self._live(
            self._frame(query, np.float32(1.0), needs_scores=False)).count()

    def _term_count_live(self, q: TermQuery) -> int:
        """TermQuery count under deletes as a per-segment fold — the
        tombstone-aware analogue of the df fast path. The exhaustive
        route (`_live(_frame(...)).count()`) materializes every matching
        (seg, doc) row out of the scan workers just to anti-join away
        ≤cap tombstones (measured 5.2s warm at 10M docs / 293 segments).
        Here segments with no tombstones contribute ``sum(num_docs)``
        from block metadata alone — their ``docs_bin`` is never decoded —
        and tombstoned segments decode docs batched and subtract
        searchsorted hits; ONE scalar leaves each scan task, so the job
        is bound by the term-pruned scan, not corpus-sized row export.
        Additive per row-group, so no segment/file layout invariant
        (works on multi-file legacy segments too). Cross-route equality
        incl. post-merge: tests/test_count_live.py."""
        tomb = self._tomb_by_seg()
        tomb_segs = set(tomb)

        def fn(batches):
            for pdf in batches:
                segs = pdf["seg"].to_numpy(np.int64)
                counts = pdf["num_docs"].to_numpy(np.int64)
                masked = np.fromiter((int(s) in tomb_segs for s in segs),
                                     dtype=bool, count=len(segs))
                total = int(counts[~masked].sum())
                if masked.any():
                    c2 = counts[masked]
                    docs = batch_delta_decode(
                        batch_unpack(
                            pdf["docs_bin"].to_numpy()[masked].tolist(),
                            c2),
                        c2).astype(np.int64)
                    seg_rep = np.repeat(segs[masked], c2)
                    total += len(docs)
                    for s in np.unique(seg_rep):
                        tb = tomb[int(s)]
                        d = docs[seg_rep == s]
                        p = np.searchsorted(tb, d)
                        dead = (p < len(tb)) & (
                            tb[np.minimum(p, len(tb) - 1)] == d)
                        total -= int(dead.sum())
                yield pd.DataFrame({"c": [total]})

        scan = self._postings.filter(
            (F.col("field") == q.field) & (F.col("term") == q.term)
        ).select("seg", "num_docs", "docs_bin")
        df = self._coalesced(scan).mapInPandas(fn, "c long")
        row = df.agg(F.sum("c").alias("c")).collect()[0]
        return int(row["c"] or 0)

    _NUMERIC_DTYPES = ("tinyint", "smallint", "int", "bigint", "float",
                       "double", "decimal", "date", "timestamp")

    def _resolve_sort(self, sort_cols) -> list:
        """Resolve a mixed list of Column expressions (back-compat) and
        typed :class:`~rucene_spark.query.SortField` entries into
        ordering expressions with the reference's missing-value
        semantics (field_comparator.rs:124-367; see SortField)."""
        from .query import SortField

        dtypes = None
        out = []
        for sc in sort_cols:
            if not isinstance(sc, SortField):
                out.append(sc)
                continue
            if dtypes is None:
                dtypes = dict(self._docmeta.dtypes)
            if sc.field not in dtypes:
                raise ValueError(
                    f"unknown sort field {sc.field!r};"
                    f" docmeta has {sorted(dtypes)}")
            t = dtypes[sc.field]
            if t.startswith(self._NUMERIC_DTYPES):
                mv = 0 if sc.missing_value is None else sc.missing_value
                c = F.coalesce(F.col(sc.field), F.lit(mv).cast(t))
                out.append(c.desc() if sc.reverse else c.asc())
            else:
                mv = sc.missing_value or "first"
                if mv not in ("first", "last"):
                    raise ValueError(
                        f"string sort field {sc.field!r}: missing_value"
                        " must be 'first' or 'last'"
                        " (SortFieldMissingValue)")
                c = F.col(sc.field)
                # first/last refer to NATURAL order; under reverse the
                # -inf/+inf substitute flips ends accordingly
                if sc.reverse:
                    out.append(c.desc_nulls_last() if mv == "first"
                               else c.desc_nulls_first())
                else:
                    out.append(c.asc_nulls_first() if mv == "first"
                               else c.asc_nulls_last())
        return out

    def search_sorted(self, query: Query, sort_cols, k: int = 10,
                      early_terminate: bool = False) -> DataFrame:
        """Top-k by doc-values fields (sort_field.rs:28-110 analogue).

        ``sort_cols`` mixes raw Column expressions over docmeta columns
        (back-compat) and typed :class:`SortField` entries carrying
        per-type missing-value ordering. ``early_terminate`` is the
        EarlyTerminatingSortingCollector
        analogue (early_terminating.rs:24-92): each segment contributes at
        most its own top-k before the global merge — unlike the
        reference's (which requires index sort == query sort), the
        per-segment cut is always rank-safe here because the global top-k
        is a superset-free merge of per-segment top-ks."""
        sort_cols = self._resolve_sort(sort_cols)
        frame = self._live(self._frame(query, np.float32(1.0), needs_scores=False))
        joined = self._docmeta.join(frame.select("seg", "doc"), ["seg", "doc"])
        if early_terminate:
            w = Window.partitionBy("seg").orderBy(*sort_cols, "doc")
            joined = (joined.withColumn("_rn", F.row_number().over(w))
                      .filter(F.col("_rn") <= k).drop("_rn"))
        return joined.orderBy(*sort_cols, "seg", "doc").limit(k)

    def collapse(self, query: Query, group_col: str, k: int = 10) -> DataFrame:
        """Field collapsing: best-scoring hit per group value
        (collapse_top_docs.rs:239-326 analogue via window row_number)."""
        frame = self._live(self._frame(query, np.float32(1.0), needs_scores=True))
        joined = self._docmeta.join(frame, ["seg", "doc"])
        w = Window.partitionBy(group_col).orderBy(F.desc("score"), "seg", "doc")
        return (
            joined.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .orderBy(F.desc("score"), "seg", "doc")
            .limit(k)
        )

    def rescore(self, query: Query, rescore_query: Query, window: int, k: int,
                weight: float = 1.0, rescore_weight: float = 1.0) -> DataFrame:
        """Re-rank the top-``window`` of ``query`` with a second query
        (rescorer.rs:38-130: combined = w1*s1 + w2*s2 on the candidate set)."""
        first = (
            self._live(self._frame(query, np.float32(1.0), needs_scores=True))
            .orderBy(F.desc("score"), "seg", "doc")
            .limit(window)
            .withColumnRenamed("score", "s1")
        )
        second = self._frame(rescore_query, np.float32(1.0), needs_scores=True)
        combined = (
            first.join(second.withColumnRenamed("score", "s2"), ["seg", "doc"], "left")
            .withColumn(
                "score",
                (F.lit(weight) * F.col("s1")
                 + F.lit(rescore_weight) * F.coalesce(F.col("s2"), F.lit(0.0))
                 ).cast(self._score_t),
            )
            .select("seg", "doc", "score")
        )
        out = (
            self._docmeta.join(F.broadcast(combined.orderBy(
                F.desc("score"), "seg", "doc").limit(k)), ["seg", "doc"])
            .orderBy(F.desc("score"), "seg", "doc")
        )
        return out

    def search_blockmax(self, terms: list[str], k: int = 10,
                        boosts: list[float] | None = None,
                        prune_counter: dict | None = None,
                        field: str | None = None) -> DataFrame:
        """Block-max pruned top-k for a should-sum disjunction — the
        MaxScore/BMW hybrid the north rule adds over the reference
        (SURVEY.md §4.3: rucene stores skip pointers, skip_writer.rs:36-56,
        but no impact bounds and no WAND operator).

        1. θ: exactly score the highest-upper-bound ("driver") term; θ =
           its k-th score — a lower bound on the true k-th total score.
        2. MaxScore split (Turtle & Flood): non-essential terms N = the
           maximal ascending-ub prefix with Σ ub(N) < θ. Docs matching
           only N terms cannot reach top-k.
        3. Essential terms: decode blocks surviving the per-block bound
           ``ub(B) + Σ_{t'≠t} ub(t') ≥ θ`` — ub(B) is a pure JVM
           expression over stored ``(max_tf, max_norm_byte, min_dl)``
           metadata, no decode.
        4. Candidates: docs with essential partial + Σ ub(N) ≥ θ. Collect
           per-segment candidate doc-id ranges (n_segments tiny rows).
        5. Non-essential terms: decode only blocks whose
           ``[first_doc, last_doc]`` intersects the candidate range of
           their segment; join contributions back onto candidates.

        Rank-preservation: a doc losing any block to pruning provably has
        total score < θ ≤ true k-th score, so every true top-k doc is
        fully scored, and understated partials cannot displace them
        (asserted vs the exhaustive scorer in tests/test_blockmax.py).
        """
        if boosts is None:
            boosts = [1.0] * len(terms)
        field = field or self.default_field
        self._check_field(field)
        cache = self.cache_f[field]
        avgdl64 = self.avgdl64_f[field]
        k1_, b_ = self.sim_f[field]
        kp1 = _kp1_64(k1_)
        stats = self._stats_for([(field, t) for t in terms])
        lucene = self.scoring == "lucene"

        infos = []  # (term, boost, term_ub)
        for t, b in zip(terms, boosts):
            row = stats.get((field, t))
            if row is None:
                continue
            wk32, idf_64, b64 = self._term_weights(
                field, t, float(np.float32(b)), stats)
            mtf = float(row["max_tf"])
            if lucene:
                ub = float(wk32) * mtf / (
                    mtf + float(cache[int(row["max_norm_byte"])]))
            else:
                denom = mtf + k1_ * (
                    (1.0 - b_) + b_ * float(row["min_dl"]) / avgdl64)
                ub = idf_64 * b64 * kp1 * mtf / denom
            infos.append((t, float(np.float32(b)), ub))
        if not infos:
            return self._docmeta.join(
                self.spark.createDataFrame([], self._score_schema), ["seg", "doc"])

        if (prune_counter is None
                and os.environ.get("RUCENE_BMW_COLLECTOR", "1") != "0"
                and (self._deleted is None or self._bcast_deleted)
                and self._segs_single_file()):
            # per-segment BMW collector: the whole θ/split/prune pipeline
            # runs in numpy inside ONE scan pass (see
            # _blockmax_collector_topk) instead of the 4-5 chained jobs
            # below — 27.7s → kernel-bound at 10M docs, and still faster
            # at 5k (one job beats five). The multi-job path remains for
            # prune_counter introspection, multi-file segment layouts,
            # and shuffle-scale tombstones.
            return self._blockmax_collector_topk(infos, field, stats, k)

        # --- pass 1: θ from the strongest term, scored exactly
        driver_term, driver_boost, _ = max(infos, key=lambda x: x[2])
        first = (
            self._live(self._frame(TermQuery(field, driver_term),
                                   np.float32(driver_boost), True, stats))
            .orderBy(F.desc("score"), "seg", "doc").limit(k).collect()
        )
        theta = float(first[-1]["score"]) if len(first) == k else 0.0
        thr = theta * (1.0 - _UB_SLACK) - 1e-9

        # --- MaxScore split: maximal ascending-ub prefix below θ
        by_ub = sorted(infos, key=lambda x: x[2])
        nonessential, acc = [], 0.0
        for info in by_ub:
            if theta > 0 and acc + info[2] < thr:
                nonessential.append(info)
                acc += info[2]
            else:
                break
        ness_terms = {t for t, _, _ in nonessential}
        essential = [i for i in infos if i[0] not in ness_terms]
        ub_n = sum(ub for _, _, ub in nonessential)
        total_ub = sum(ub for _, _, ub in infos)

        # --- block upper-bound expression (metadata only, no decode)
        if lucene:
            cache_arr = F.array(*[F.lit(float(c)) for c in cache])
            denom_col = F.element_at(cache_arr, F.col("max_norm_byte") + 1)
        else:
            denom_col = F.lit(k1_) * (
                F.lit(1.0 - b_) + F.lit(b_) * F.col("min_dl") / F.lit(avgdl64))

        def block_keep(sub_infos):
            keep = F.lit(False)
            for t, b, ub in sub_infos:
                wk32, idf_64, b64 = self._term_weights(field, t, b, stats)
                scale = float(wk32) if lucene else idf_64 * b64 * kp1
                block_ub = (F.lit(scale) * F.col("max_tf")
                            / (F.col("max_tf") + denom_col))
                keep = keep | ((F.col("term") == t)
                               & (block_ub + F.lit(total_ub - ub) >= F.lit(thr)))
            return keep

        scan_cols = ["field", "term", "seg", "num_docs", "docs_bin",
                     "tfs_bin", "norms_bin", "dls_bin"]
        ess_scan = self._postings.filter(
            (F.col("field") == field)
            & F.col("term").isin([t for t, _, _ in essential]))
        ess_keep = block_keep(essential)
        ess_specs = [(field, t, "", b, True) for t, b, _ in essential]
        ess_decode = self._batch_term_frame(
            ess_specs, stats, with_tag=False,
            scan=ess_scan.filter(ess_keep).select(*scan_cols))
        partial = (
            ess_decode.groupBy("seg", "doc")
            .agg(F.sum("score").alias("score"))
        )

        if prune_counter is not None:
            all_scan = self._postings.filter(
                (F.col("field") == field)
                & F.col("term").isin([t for t, _, _ in infos]))
            prune_counter["theta"] = theta
            prune_counter["n_essential"] = len(essential)
            prune_counter["n_nonessential"] = len(nonessential)
            prune_counter["total_blocks"] = all_scan.count()
            prune_counter["kept_blocks"] = ess_scan.filter(ess_keep).count()

        if not nonessential:
            scored = partial
        else:
            partial = partial.persist()
            candidates = partial.filter(F.col("score") + F.lit(ub_n) >= F.lit(thr))
            # candidate doc-id BUCKETS per segment (16k docs/bucket ≈ 128
            # blocks): a non-essential block decodes only if it overlaps a
            # bucket that still holds a candidate — far tighter than the
            # per-segment [min, max] span when candidates are sparse. The
            # collect is bounded: above _MAX_CAND_BUCKETS we degrade to the
            # coarse per-segment range (metadata-sized either way).
            bshift = 14
            brows = (candidates
                     .groupBy("seg", F.shiftright(F.col("doc"), bshift)
                              .alias("b"))
                     .count().limit(_MAX_CAND_BUCKETS + 1).collect())
            if len(brows) <= _MAX_CAND_BUCKETS:
                bset = {(int(r["seg"]), int(r["b"])) for r in brows}
                by_seg: dict[int, list[int]] = {}
                for sg, bb in bset:
                    by_seg.setdefault(sg, []).append(bb)
                rng = F.lit(False)
                fb = F.shiftright(F.col("first_doc"), bshift)
                lb = F.shiftright(F.col("last_doc"), bshift)
                for sg, bs in by_seg.items():
                    lo, hi = (min(bs) << bshift), ((max(bs) + 1) << bshift) - 1
                    # narrow blocks (≤2 buckets) are bucket-checked exactly;
                    # wide blocks fall back to the conservative seg range —
                    # both keep every block that could hold a candidate
                    narrow_hit = ((lb - fb <= 1)
                                  & (fb.isin(bs) | lb.isin(bs)))
                    wide_hit = ((lb - fb > 1)
                                & (F.col("last_doc") >= lo)
                                & (F.col("first_doc") <= hi))
                    rng = rng | ((F.col("seg") == sg)
                                 & (narrow_hit | wide_hit))
                ness_scan = self._postings.filter(
                    (F.col("field") == field)
                    & F.col("term").isin(list(ness_terms)) & rng
                ).select(*scan_cols)
                ness_specs = [(field, t, "", b, True)
                              for t, b, _ in nonessential]
                ness_decode = self._batch_term_frame(
                    ness_specs, stats, with_tag=False, scan=ness_scan)
                ness_sum = ness_decode.groupBy("seg", "doc").agg(
                    F.sum("score").alias("_ns"))
                if prune_counter is not None:
                    prune_counter["kept_blocks"] += ness_scan.count()
                scored = (
                    candidates.join(ness_sum, ["seg", "doc"], "left")
                    .select("seg", "doc",
                            (F.col("score")
                             + F.coalesce(F.col("_ns"), F.lit(0.0))
                             ).alias("score"))
                )
            else:
                # DEGENERATE pruning: candidates cover (nearly) the whole
                # doc-id space — measured at 500k-1M Zipf docs, the coarse
                # per-segment ranges kept 4779/4780 blocks while still
                # paying the candidate-join machinery (3.5x a plain
                # disjunction). When block filtering cannot save IO, score
                # the non-essential terms EXHAUSTIVELY in one scan and sum
                # with the essential partials — exact disjunction scores
                # for every matching doc, so rank-identity is trivially
                # preserved (scoring a superset never demotes a true
                # top-k doc).
                ness_specs = [(field, t, "", b, True)
                              for t, b, _ in nonessential]
                ness_decode = self._batch_term_frame(
                    ness_specs, stats, with_tag=False)
                if prune_counter is not None:
                    prune_counter["degenerate"] = True
                    prune_counter["kept_blocks"] += self._postings.filter(
                        (F.col("field") == field)
                        & F.col("term").isin(list(ness_terms))).count()
                scored = (
                    partial.unionByName(
                        ness_decode.groupBy("seg", "doc").agg(
                            F.sum("score").alias("score")))
                    .groupBy("seg", "doc").agg(F.sum("score").alias("score"))
                )

        topk = (
            self._live(scored.select("seg", "doc",
                                     F.col("score").cast(self._score_t)
                                     .alias("score")))
            .orderBy(F.desc("score"), "seg", "doc").limit(k)
        )
        return (
            self._docmeta.join(F.broadcast(topk), ["seg", "doc"])
            .orderBy(F.desc("score"), "seg", "doc")
        )

    def _blockmax_collector_topk(self, infos: list[tuple], field: str,
                                 stats: dict, k: int) -> DataFrame:
        """Zero-shuffle BMW top-k — search_blockmax's θ/MaxScore-split/
        block-prune pipeline collapsed into the per-segment collector
        kernel (one mapInPandas over the term-pruned scan, ≤k rows per
        segment out), the way Lucene runs WAND per leaf inside one
        collect pass rather than as separate jobs.

        Per segment (= one scan partition, pinned by the searcher's
        one-file-per-partition read):

        1. θ_s: decode only the segment's strongest term (max block-ub
           upper bound), score it exactly, mask tombstones, take the
           k-th score. ≥k live docs have total ≥ θ_s (driver score is a
           lower bound of the total — BM25 contributions are
           non-negative), so θ_s lower-bounds the segment's true k-th
           total and pruning against it keeps the segment top-k intact;
           the global top-k is a subset of the per-segment top-k union.
        2. MaxScore split on SEGMENT-LOCAL term bounds (max of the
           term's block ubs in this segment — tighter than the global
           bound the multi-job path uses).
        3. Essential terms: decode only blocks with
           ``block_ub + Σ_{t'≠t} tub(t') ≥ thr`` — pure arithmetic over
           the (max_tf, max_norm_byte, min_dl) block metadata columns;
           pruned blocks are never varint-decoded.
        4. Candidates: essential partial + Σ ub(nonessential) ≥ thr.
        5. Non-essential terms: decode only blocks whose
           [first_doc, last_doc] holds a candidate (searchsorted), add
           contributions for candidate docs only.

        θ_s = 0 (fewer than k driver postings) makes thr negative and
        every test above vacuous — the pass degrades to exhaustive
        scoring, mirroring the multi-job path's ``theta > 0`` guard.
        Scores: per-term kernel identical to _collector_topk_frame
        (float32 in "lucene" mode), per-doc sum in float64, cast to the
        score type — rank- and score-identical to the exhaustive
        disjunction (tests/test_blockmax.py runs both routes)."""
        lucene = self.scoring == "lucene"
        cache = self.cache_f[field]
        cache64 = cache.astype(np.float64)
        avgdl64 = self.avgdl64_f[field]
        k1_, b_ = self.sim_f[field]
        kp1 = _kp1_64(k1_)
        terms = [t for t, _, _ in infos]
        ti_of = {t: i for i, t in enumerate(terms)}
        n_t = len(terms)
        wk32 = np.zeros(n_t, dtype=np.float32)
        coef = np.zeros(n_t, dtype=np.float64)
        for t, b, _ in infos:
            w32, idf64, b64 = self._term_weights(field, t, b, stats)
            wk32[ti_of[t]] = w32
            coef[ti_of[t]] = (idf64 * b64) * kp1
        wk64 = wk32.astype(np.float64)
        tomb = self._tomb_by_seg()
        k_ = int(k)
        ftype = np.float32 if lucene else np.float64
        slack = _UB_SLACK

        def _decode(g: pd.DataFrame):
            """(docs, tfs, norms-or-dls, element ti) for a row subset."""
            counts = g["num_docs"].to_numpy(np.int64)
            docs = batch_delta_decode(
                batch_unpack(g["docs_bin"].tolist(), counts), counts
            ).astype(np.int64)
            tfs = batch_unpack(g["tfs_bin"].tolist(), counts)
            if lucene:
                aux = batch_unpack(g["norms_bin"].tolist(), counts
                                   ).astype(np.int64)
            else:
                aux = batch_unpack(g["dls_bin"].tolist(), counts
                                   ).astype(np.int64)
            ti_el = np.repeat(
                np.fromiter((ti_of[t] for t in g["term"]),
                            dtype=np.int64, count=len(g)), counts)
            return docs, tfs, aux, ti_el

        def _score(tfs, aux, ti_el):
            if lucene:
                tff = tfs.astype(np.float32)
                return ((wk32[ti_el] * tff)
                        / (tff + cache[aux])).astype(np.float64)
            tff = tfs.astype(np.float64)
            denom = tff + k1_ * ((1.0 - b_)
                                 + b_ * aux.astype(np.float64) / avgdl64)
            return coef[ti_el] * tff / denom

        def _mask_dead(tb, docs):
            if tb is None or len(docs) == 0:
                return np.ones(len(docs), dtype=bool)
            pos = np.searchsorted(tb, docs)
            return ~((pos < len(tb))
                     & (tb[np.minimum(pos, len(tb) - 1)] == docs))

        def fn(batches):
            # streamed per segment (see _iter_seg_chunks): bounded memory
            for s, sub in _iter_seg_chunks(batches):
                tb = tomb.get(int(s))
                ti_row = np.fromiter(
                    (ti_of[t] for t in sub["term"]),
                    dtype=np.int64, count=len(sub))
                mtf = sub["max_tf"].to_numpy(np.float64)
                if lucene:
                    mnb = sub["max_norm_byte"].to_numpy(np.int64)
                    bub = wk64[ti_row] * mtf / (mtf + cache64[mnb])
                else:
                    mdl = sub["min_dl"].to_numpy(np.float64)
                    bub = coef[ti_row] * mtf / (
                        mtf + k1_ * ((1.0 - b_) + b_ * mdl / avgdl64))
                tub = np.zeros(n_t, dtype=np.float64)
                np.maximum.at(tub, ti_row, bub)
                present = np.unique(ti_row)
                # 1) θ_s from the segment's strongest term
                drv = int(present[np.lexsort(
                    (present, -tub[present]))[0]])
                drv_rows = ti_row == drv
                d_docs, d_tfs, d_aux, d_ti = _decode(sub[drv_rows])
                d_sc = _score(d_tfs, d_aux, d_ti)
                live = _mask_dead(tb, d_docs)
                live_sc = np.sort(d_sc[live].astype(ftype))
                theta = float(live_sc[-k_]) if len(live_sc) >= k_ else 0.0
                thr = theta * (1.0 - slack) - 1e-9
                # 2) MaxScore split on segment-local bounds
                order = present[np.lexsort((present, tub[present]))]
                ness, acc = [], 0.0
                for ti in order[:-1]:  # strongest term stays essential
                    if theta > 0 and acc + tub[ti] < thr:
                        ness.append(int(ti))
                        acc += tub[ti]
                    else:
                        break
                ness_set = set(ness)
                ub_n = float(sum(tub[ti] for ti in ness))
                total_ub = float(tub[present].sum())
                # 3) essential blocks surviving the metadata bound
                ess_rows = (~drv_rows & ~np.isin(ti_row, ness)
                            & (bub + (total_ub - tub[ti_row]) >= thr))
                docs_parts, sc_parts = [d_docs], [d_sc]
                if ess_rows.any():
                    e_docs, e_tfs, e_aux, e_ti = _decode(sub[ess_rows])
                    docs_parts.append(e_docs)
                    sc_parts.append(_score(e_tfs, e_aux, e_ti))
                docs_c = np.concatenate(docs_parts)
                sc_c = np.concatenate(sc_parts)
                o = np.argsort(docs_c, kind="stable")
                docs_c, sc_c = docs_c[o], sc_c[o]
                nb = np.empty(len(docs_c), dtype=bool)
                nb[0] = True
                nb[1:] = docs_c[1:] != docs_c[:-1]
                starts = np.flatnonzero(nb)
                docs_u = docs_c[starts]
                sums = np.add.reduceat(sc_c, starts)
                # 4) candidates; 5) non-essential contributions
                if ness_set:
                    cand = sums + ub_n >= thr
                    docs_u, sums = docs_u[cand], sums[cand]
                    n_rows = np.isin(ti_row, ness)
                    if n_rows.any() and len(docs_u):
                        fd = sub["first_doc"].to_numpy(np.int64)[n_rows]
                        ld = sub["last_doc"].to_numpy(np.int64)[n_rows]
                        p = np.searchsorted(docs_u, fd)
                        hit = (p < len(docs_u)) & (
                            docs_u[np.minimum(p, len(docs_u) - 1)] <= ld)
                        keep_idx = np.flatnonzero(n_rows)[hit]
                        if len(keep_idx):
                            n_docs, n_tfs, n_aux, n_ti = _decode(
                                sub.iloc[keep_idx])
                            n_sc = _score(n_tfs, n_aux, n_ti)
                            pn = np.searchsorted(docs_u, n_docs)
                            m = (pn < len(docs_u)) & (
                                docs_u[np.minimum(pn, len(docs_u) - 1)]
                                == n_docs)
                            np.add.at(sums, pn[m], n_sc[m])
                liveu = _mask_dead(tb, docs_u)
                docs_u, sums = docs_u[liveu], sums[liveu]
                if len(docs_u) == 0:
                    continue
                score = sums.astype(ftype)
                top = np.lexsort((docs_u, -score))[:k_]
                yield pd.DataFrame({
                    "seg": np.full(len(top), s, dtype=np.int32),
                    "doc": docs_u[top],
                    "score": score[top],
                })

        scan = self._postings.filter(
            (F.col("field") == field) & F.col("term").isin(terms)
        ).select("term", "seg", "num_docs", "docs_bin", "tfs_bin",
                 "norms_bin", "dls_bin", "max_tf", "max_norm_byte",
                 "min_dl", "first_doc", "last_doc")
        frame = self._coalesced(scan).mapInPandas(
            fn, f"seg int, doc long, score {self._score_t}")
        topk = frame.orderBy(F.desc("score"), "seg", "doc").limit(k)
        return (
            self._docmeta.join(F.broadcast(topk), ["seg", "doc"])
            .orderBy(F.desc("score"), "seg", "doc")
        )

    def _dismax_collector_topk(self, q: "DisjunctionMaxQuery",
                               boost: np.float32, k: int) -> DataFrame:
        """Zero-shuffle DisjunctionMax top-k — the per-segment collector
        kernel specialized to the dismax fold (dis_max.rs: score =
        max(disjuncts) + tie_breaker * Σ(others)). One scan pass over
        the disjunct terms' postings; per segment the worker decodes,
        scores each disjunct with the shared BM25 kernel, reduces
        max/sum per doc with reduceat, masks tombstones, and emits ≤k
        rows. Requires all-TermQuery disjuncts with unique (field, term)
        — the same precondition as the exhaustive path's one-scan fast
        path — and is score-identical to it (per-term float32 kernel,
        float64 fold, cast to the score type)."""
        specs = []
        for d in q.disjuncts:
            d, db = self._fold_boost(d, boost)
            specs.append((d.field, d.term,
                          float(np.float32(db * np.float32(d.boost)))))
        stats = self._stats_for([(f_, t) for f_, t, _ in specs])
        lucene = self.scoring == "lucene"
        ftype = np.float32 if lucene else np.float64
        n_c = len(specs)
        wk32 = np.zeros(n_c, dtype=np.float32)
        coef = np.zeros(n_c, dtype=np.float64)
        k1_a = np.zeros(n_c, dtype=np.float64)
        b_a = np.zeros(n_c, dtype=np.float64)
        avg_a = np.zeros(n_c, dtype=np.float64)
        flds: list[str] = []
        ci_of: dict[tuple[str, str], int] = {}
        for i, (f_, t, b) in enumerate(specs):
            self._check_field(f_)
            w32, idf64, b64 = self._term_weights(f_, t, b, stats)
            k1_, b_ = self.sim_f[f_]
            wk32[i] = w32
            coef[i] = (idf64 * b64) * _kp1_64(k1_)
            k1_a[i], b_a[i] = k1_, b_
            avg_a[i] = self.avgdl64_f[f_]
            flds.append(f_)
            ci_of[(f_, t)] = i
        cache_f = self.cache_f
        tie = float(q.tie_breaker)
        tomb = self._tomb_by_seg()
        k_ = int(k)

        def fn(batches):
            # streamed per segment (see _iter_seg_chunks): bounded memory
            for s, sub in _iter_seg_chunks(batches):
                counts = sub["num_docs"].to_numpy(np.int64)
                d_s = batch_delta_decode(
                    batch_unpack(sub["docs_bin"].tolist(), counts),
                    counts).astype(np.int64)
                tfs = batch_unpack(sub["tfs_bin"].tolist(), counts)
                ci_row = np.fromiter(
                    (ci_of[(f_, t)] for f_, t
                     in zip(sub["field"], sub["term"])),
                    dtype=np.int64, count=len(sub))
                ci_el = np.repeat(ci_row, counts)
                if lucene:
                    nbs = batch_unpack(sub["norms_bin"].tolist(), counts
                                       ).astype(np.int64)
                    denom = np.empty(len(ci_el), dtype=np.float32)
                    for f_ in set(flds):
                        mm = np.isin(
                            ci_el, [i for i, ff in enumerate(flds)
                                    if ff == f_])
                        denom[mm] = cache_f[f_][nbs[mm]]
                    tff = tfs.astype(np.float32)
                    v_s = ((wk32[ci_el] * tff) / (tff + denom)
                           ).astype(np.float64)
                else:
                    dls = batch_unpack(sub["dls_bin"].tolist(), counts
                                       ).astype(np.float64)
                    tff = tfs.astype(np.float64)
                    den = tff + k1_a[ci_el] * (
                        (1.0 - b_a[ci_el])
                        + b_a[ci_el] * dls / avg_a[ci_el])
                    v_s = coef[ci_el] * tff / den
                o = np.argsort(d_s, kind="stable")
                d_s, v_s = d_s[o], v_s[o]
                if len(d_s) == 0:
                    continue
                nb = np.empty(len(d_s), dtype=bool)
                nb[0] = True
                nb[1:] = d_s[1:] != d_s[:-1]
                starts = np.flatnonzero(nb)
                du = d_s[starts]
                mx = np.maximum.reduceat(v_s, starts)
                sm = np.add.reduceat(v_s, starts)
                score = (mx + tie * (sm - mx)).astype(ftype)
                tb = tomb.get(int(s))
                if tb is not None and len(du):
                    pos = np.searchsorted(tb, du)
                    dead = (pos < len(tb)) & (
                        tb[np.minimum(pos, len(tb) - 1)] == du)
                    du, score = du[~dead], score[~dead]
                if len(du) == 0:
                    continue
                top = np.lexsort((du, -score))[:k_]
                yield pd.DataFrame({
                    "seg": np.full(len(top), s, dtype=np.int32),
                    "doc": du[top],
                    "score": score[top],
                })

        by_field: dict[str, list[str]] = {}
        for f_, t, _ in specs:
            by_field.setdefault(f_, []).append(t)
        cond = reduce(
            lambda a, b: a | b,
            [(F.col("field") == f_) & F.col("term").isin(ts)
             for f_, ts in by_field.items()],
        )
        scan = self._postings.filter(cond).select(
            "field", "term", "seg", "num_docs", "docs_bin", "tfs_bin",
            "norms_bin", "dls_bin")
        return self._coalesced(scan).mapInPandas(
            fn, f"seg int, doc long, score {self._score_t}")

    # ------------------------------------------------------------------
    # explain
    # ------------------------------------------------------------------

    def explain(self, query: Query, seg: int, doc: int) -> dict:
        """Structured score breakdown for one (seg, doc) — the reference's
        ``Explanation`` tree (bm25_similarity.rs:265-361, explanation.rs):
        nested ``{value, description, details}`` dicts, float32 faithful in
        "lucene" mode."""
        if isinstance(query, TermQuery):
            return self._explain_term(query, np.float32(1.0), seg, doc)
        if isinstance(query, BoostQuery):
            if isinstance(query.query, TermQuery):
                return self._explain_term(
                    query.query, np.float32(query.boost), seg, doc)
            if isinstance(query.query, PhraseQuery):
                return self._explain_phrase(
                    query.query, np.float32(query.boost), seg, doc)
            from .query import SpanQuery as _SpanQuery
            if isinstance(query.query, _SpanQuery):
                return self._explain_span(
                    query.query, np.float32(query.boost), seg, doc)
            inner = self.explain(query.query, seg, doc)
            inner["value"] = float(
                np.float32(inner["value"] * np.float32(query.boost)))
            return inner
        if isinstance(query, BooleanQuery):
            # BooleanWeight::explain semantics: a failed must/filter, a
            # matching must_not, or unmet min_should_match all make the doc
            # a NON-match, even if other clauses would contribute score.
            details = []
            for sub in query.musts:
                e = self.explain(sub, seg, doc)
                details.append(e)
                if not e["match"]:
                    return {
                        "match": False, "value": 0.0,
                        "description": "Failure to meet condition of"
                                       " required clause",
                        "details": details,
                    }
            matched_shoulds = []
            for sub in query.shoulds:
                e = self.explain(sub, seg, doc)
                if e["match"]:
                    details.append(e)
                    matched_shoulds.append(e)
            if len(matched_shoulds) < query.min_should_match:
                return {
                    "match": False, "value": 0.0,
                    "description": f"Failure to match minimum number of"
                                   f" optional clauses:"
                                   f" {query.min_should_match}",
                    "details": details,
                }
            for sub in query.filters:
                if not self._matches_doc(sub, seg, doc):
                    return {
                        "match": False, "value": 0.0,
                        "description": "Failure to meet condition of"
                                       " filter clause",
                        "details": details,
                    }
            for sub in query.must_nots:
                if self._matches_doc(sub, seg, doc):
                    return {
                        "match": False, "value": 0.0,
                        "description": "Failure to meet condition of"
                                       " prohibited clause",
                        "details": details,
                    }
            if not details:
                return {"match": False, "value": 0.0,
                        "description": "no matching clauses", "details": []}
            value = float(np.float32(np.float64(
                sum(d["value"] for d in details))))
            return {
                "match": True,
                "value": value,
                "description": "sum of:",
                "details": details,
            }
        if isinstance(query, PhraseQuery):
            return self._explain_phrase(query, np.float32(1.0), seg, doc)
        from .query import SpanQuery as _SpanQuery
        if isinstance(query, _SpanQuery):
            return self._explain_span(query, np.float32(1.0), seg, doc)
        if isinstance(query, DisjunctionMaxQuery):
            # DisjunctionMaxWeight::explain (dis_max.rs): max of the
            # matching sub-explanations, plus tie_breaker × the others;
            # the combine arithmetic mirrors the frame's Spark agg
            # (f32 max, f64 sum, f64 combine, f32 cast)
            details = [self.explain(d, seg, doc) for d in query.disjuncts]
            matched = [e for e in details if e["match"]]
            if not matched:
                return {"match": False, "value": 0.0,
                        "description": "No matching clause",
                        "details": details}
            mx = max(np.float32(e["value"]) for e in matched)
            s64 = float(sum(np.float64(np.float32(e["value"]))
                            for e in matched))
            tie = float(query.tie_breaker)
            value = float(np.float32(np.float64(mx)
                                     + tie * (s64 - np.float64(mx))))
            desc = ("max of:" if tie == 0.0
                    else f"max plus {tie} times others of:")
            return {"match": True, "value": value, "description": desc,
                    "details": matched}
        # generic fallback: evaluate the query's frame at this one doc
        row = (
            self._frame(query, np.float32(1.0), needs_scores=True)
            .filter((F.col("seg") == seg) & (F.col("doc") == doc))
            .limit(1).collect()
        )
        if row:
            return {"match": True, "value": float(row[0]["score"]),
                    "description": f"{type(query).__name__}, score:",
                    "details": []}
        return {"match": False, "value": 0.0,
                "description": f"no match ({type(query).__name__})",
                "details": []}

    def _matches_doc(self, q: Query, seg: int, doc: int) -> bool:
        """Does ``q`` match one specific (seg, doc)? Explain-path helper."""
        f = self._frame(q, np.float32(1.0), needs_scores=False)
        return bool(
            f.filter((F.col("seg") == seg) & (F.col("doc") == doc))
            .limit(1).count())

    def _explain_term(self, q: TermQuery, boost: np.float32,
                      seg: int, doc: int) -> dict:
        from .smallfloat import NORM_TABLE

        self._check_field(q.field)
        stats = self._stats_for([(q.field, q.term)])
        row = stats.get((q.field, q.term))
        df_ = int(row["df"]) if row else 0
        hit = None
        if df_:
            blocks = self._postings.filter(
                (F.col("field") == q.field)
                & (F.col("term") == q.term) & (F.col("seg") == seg)
                & (F.col("first_doc") <= doc) & (F.col("last_doc") >= doc)
            ).collect()
            for b in blocks:
                d = delta_decode(unpack_ints(b["docs_bin"], b["num_docs"]))
                idx = np.flatnonzero(d == doc)
                if idx.size:
                    tfs = unpack_ints(b["tfs_bin"], b["num_docs"])
                    nbs = unpack_ints(b["norms_bin"], b["num_docs"])
                    hit = (int(tfs[idx[0]]), int(nbs[idx[0]]))
                    break
        if hit is None:
            return {"match": False, "value": 0.0,
                    "description": f"no matching term term={q.term}",
                    "details": []}
        freq, nb = hit
        cache = self.cache_f[q.field]
        k1_, b_ = self.sim_f[q.field]
        k1f = np.float32(k1_)
        total_boost = np.float32(boost * np.float32(q.boost))
        idf = idf32(df_, self.doc_count)
        field_len = float(NORM_TABLE[nb])
        tf_norm = np.float32(
            (np.float32(freq) * (k1f + np.float32(1.0)))
            / (np.float32(freq) + cache[nb]))
        value = float(np.float32(np.float32(idf * total_boost)
                                 * (k1f + np.float32(1.0)) * np.float32(freq)
                                 / (np.float32(freq) + cache[nb])))
        return {
            "match": True,
            "value": value,
            "description": f"score(doc={doc},freq={freq}), product of:",
            "details": [
                {"value": float(idf),
                 "description": "idf, computed as log(1 + (docCount - docFreq"
                                " + 0.5) / (docFreq + 0.5)) from:",
                 "details": [
                     {"value": float(df_), "description": "docFreq", "details": []},
                     {"value": float(self.doc_count), "description": "docCount",
                      "details": []},
                 ]},
                {"value": float(tf_norm),
                 "description": "tfNorm, computed as (freq * (k1 + 1)) / (freq"
                                " + k1 * (1 - b + b * fieldLength /"
                                " avgFieldLength)) from:",
                 "details": [
                     {"value": float(freq), "description": "termFreq", "details": []},
                     {"value": float(k1_), "description": "parameter k1", "details": []},
                     {"value": float(b_), "description": "parameter b", "details": []},
                     {"value": float(self.avgdl_f[q.field]),
                      "description": "avgFieldLength", "details": []},
                     {"value": field_len, "description": "fieldLength",
                      "details": []},
                 ]},
            ],
        }

    def payloads(self, field: str, term: str, seg: int,
                 doc: int) -> list[tuple[int, bytes]]:
        """Per-position payloads of one (seg, doc, term) — the
        ``PostingsEnum::payload()`` surface (posting_reader.rs payload();
        the reference exposes payloads via the postings iterator, it ships
        no payload-consuming query — neither do we). Returns
        ``[(position, payload_bytes), ...]``; positions without payloads
        carry ``b""``. Empty list when the doc/term has no postings or the
        field was not indexed with a payload-emitting analyzer
        (``delimited_payload`` mode)."""
        from .codec import unpack_payloads

        self._check_field(field)
        self._check_positions(field)
        blocks = self._postings.filter(
            (F.col("field") == field) & (F.col("term") == term)
            & (F.col("seg") == seg)
            & (F.col("first_doc") <= doc) & (F.col("last_doc") >= doc)
        ).collect()
        for b in blocks:
            d = delta_decode(unpack_ints(b["docs_bin"], b["num_docs"]))
            idx = np.flatnonzero(d == doc)
            if not idx.size:
                continue
            tfs = unpack_ints(b["tfs_bin"], b["num_docs"]).astype(np.int64)
            lo = int(tfs[:idx[0]].sum())
            tf = int(tfs[idx[0]])
            flat_pos = varint_decode(b["pos_bin"], int(tfs.sum())
                                     ).astype(np.int64)
            # per-doc delta chains: cumsum within this doc's slice
            pos = np.cumsum(flat_pos[lo:lo + tf])
            pay_bin = b["pay_bin"] if "pay_bin" in b.__fields__ else b""
            if pay_bin:
                pays = unpack_payloads(bytes(pay_bin), int(tfs.sum()))
                doc_pays = [bytes(p) for p in pays[lo:lo + tf]]
            else:
                doc_pays = [b""] * tf
            return list(zip(pos.tolist(), doc_pays))
        return []

    def _doc_positions(self, field: str, uniq_terms: list[str],
                       ti_of: dict, seg: int, doc: int):
        """Per-term positions of one (seg, doc) plus its (norm_byte, dl) —
        one pushed postings scan; explain-path helper."""
        rows = (
            self._positions_rows(field, uniq_terms, ti_of)
            .filter((F.col("seg") == seg) & (F.col("doc") == doc))
            .collect()
        )
        if not rows:
            return {}, 0, 0
        pos_map = {r["ti"]: np.asarray(r["positions"], dtype=np.int64)
                   for r in rows}
        return pos_map, int(rows[0]["norm_byte"]), int(rows[0]["dl"])

    def _idf_sum_detail(self, field: str, terms: list[str],
                        stats: dict) -> tuple[np.float32, float, dict]:
        """(f32 idf sum, f64 idf sum, Explanation detail) over ``terms``
        in encounter order — PhraseWeight/SpanWeight idf accumulation."""
        idf32_total = np.float32(0.0)
        idf64_total = 0.0
        per_term = []
        for t in terms:
            row = stats.get((field, t))
            df_ = int(row["df"]) if row else 0
            i32 = idf32(df_, self.doc_count)
            idf32_total = np.float32(idf32_total + i32)
            idf64_total += float(np.log(
                1.0 + (self.doc_count - df_ + 0.5) / (df_ + 0.5)))
            per_term.append({
                "value": float(i32),
                "description": f"idf(docFreq={df_},"
                               f" docCount={self.doc_count})",
                "details": [],
            })
        detail = {"value": float(idf32_total),
                  "description": "idf(), sum of:", "details": per_term}
        return idf32_total, idf64_total, detail

    def _explain_positional(self, field: str, idf_terms: list[str],
                            freq: float, nb: int, dl: int,
                            boost: np.float32, doc: int, what: str,
                            stats: dict) -> dict:
        """Shared BM25 Explanation tree for freq-bearing positional queries
        (phrase/span) — value arithmetic mirrors the corresponding frame's
        scoring kernel exactly (f32 path in "lucene" mode, f64 otherwise),
        bm25_similarity.rs:265-361."""
        from .smallfloat import NORM_TABLE

        idf32_total, idf64_total, idf_detail = self._idf_sum_detail(
            field, idf_terms, stats)
        k1_, b_ = self.sim_f[field]
        cache = self.cache_f[field]
        if self.scoring == "lucene":
            wk32 = np.float32(np.float32(idf32_total * boost)
                              * (np.float32(k1_) + np.float32(1.0)))
            tff = np.float32(freq)
            value = float((wk32 * tff) / (tff + cache[nb]))
            tf_norm = float((tff * (np.float32(k1_) + np.float32(1.0)))
                            / (tff + cache[nb]))
            field_len = float(NORM_TABLE[nb])
        else:
            coef64 = (idf64_total * float(boost)) * _kp1_64(k1_)
            denom = freq + k1_ * ((1.0 - b_) + b_ * dl
                                  / self.avgdl64_f[field])
            value = float(coef64 * freq / denom)
            tf_norm = float(freq * (k1_ + 1.0) / denom)
            field_len = float(dl)
        return {
            "match": True,
            "value": value,
            "description": f"score(doc={doc},freq={freq}),"
                           f" product of ({what}):",
            "details": [
                idf_detail,
                {"value": tf_norm,
                 "description": "tfNorm, computed as (freq * (k1 + 1)) /"
                                " (freq + k1 * (1 - b + b * fieldLength /"
                                " avgFieldLength)) from:",
                 "details": [
                     {"value": float(freq), "description": "phraseFreq"
                      if what.startswith("phrase") else "spanFreq",
                      "details": []},
                     {"value": float(k1_), "description": "parameter k1",
                      "details": []},
                     {"value": float(b_), "description": "parameter b",
                      "details": []},
                     {"value": float(self.avgdl_f[field]),
                      "description": "avgFieldLength", "details": []},
                     {"value": field_len, "description": "fieldLength",
                      "details": []},
                 ]},
            ],
        }

    def _explain_phrase(self, q: PhraseQuery, boost: np.float32,
                        seg: int, doc: int) -> dict:
        """PhraseWeight::explain — phraseFreq from the shared kernels (the
        same arithmetic the `_phrase_frame` JVM/numpy paths compute),
        idf summed over terms in phrase order."""
        self._check_field(q.field)
        self._check_positions(q.field)
        stats = self._stats_for([(q.field, t) for t in q.terms])
        if any((q.field, t) not in stats for t in q.terms):
            return {"match": False, "value": 0.0,
                    "description": "no matching term", "details": []}
        uniq_terms = sorted(set(q.terms))
        ti_of = {t: i for i, t in enumerate(uniq_terms)}
        pos_map, nb, dl = self._doc_positions(
            q.field, uniq_terms, ti_of, seg, doc)
        if len(pos_map) < len(uniq_terms):
            return {"match": False, "value": 0.0,
                    "description": "no matching term", "details": []}
        pls = [pos_map[ti_of[t]] for t in q.terms]
        if q.slop == 0:
            freq = float(exact_phrase_freq(pls, list(q.positions)))
        else:
            freq = float(sloppy_phrase_freq(
                pls, list(q.positions), list(q.terms), q.slop))
        if freq <= 0:
            return {"match": False, "value": 0.0,
                    "description": f"no matching phrase occurrence"
                                   f" (slop={q.slop})", "details": []}
        return self._explain_positional(
            q.field, list(q.terms), freq, nb, dl, boost, doc,
            "phrase " + " ".join(q.terms), stats)

    def _explain_span(self, q, boost: np.float32, seg: int,
                      doc: int) -> dict:
        """SpanWeight::explain — freq = f32 Σ 1/(1+width) over the span
        kernel's emitted spans, identical to `_span_frame`."""
        from .query import SpanBoostQuery, span_spec, span_terms
        from .spans import span_freq

        while isinstance(q, SpanBoostQuery):
            boost = np.float32(boost * np.float32(q.boost))
            q = q.query
        field = q.field
        self._check_field(field)
        self._check_positions(field)
        terms = span_terms(q)
        stats = self._stats_for([(field, t) for t in terms])
        uniq_terms = sorted(set(terms))
        ti_of = {t: i for i, t in enumerate(uniq_terms)}
        spec = span_spec(q, ti_of)
        pos_map, nb, dl = self._doc_positions(
            field, uniq_terms, ti_of, seg, doc)
        freq = float(span_freq(spec, pos_map)) if pos_map else 0.0
        if freq <= 0:
            return {"match": False, "value": 0.0,
                    "description": "no matching spans", "details": []}
        return self._explain_positional(
            field, terms, freq, nb, dl, boost, doc, "span query", stats)

    # ------------------------------------------------------------------
    # stats
    # ------------------------------------------------------------------

    def _stats_for(self, keys: list[tuple[str, str]]) -> dict[tuple[str, str], dict]:
        """(field, term) → stats row dict; memoized (misses cached too).

        One pruned scan fetches every missing key: terms are OR-grouped per
        field so the parquet filter stays pushdown-friendly."""
        want = set(keys)
        missing = [k for k in want if k not in self._stats_cache]
        if missing:
            by_field: dict[str, list[str]] = {}
            for f_, t in missing:
                by_field.setdefault(f_, []).append(t)
            cond = reduce(
                lambda a, b: a | b,
                [(F.col("field") == f_) & F.col("term").isin(ts)
                 for f_, ts in by_field.items()],
            )
            rows = self._term_stats.filter(cond).collect()
            for r in rows:
                self._stats_cache[(r["field"], r["term"])] = r.asDict()
            for k in missing:
                self._stats_cache.setdefault(k, None)
        return {k: self._stats_cache[k] for k in want
                if self._stats_cache[k] is not None}

    def _collect_terms(self, q: Query) -> list[tuple[str, str]]:
        """All (field, term) leaves of a query tree (validates fields)."""
        if isinstance(q, TermQuery):
            self._check_field(q.field)
            return [(q.field, q.term)]
        if isinstance(q, PhraseQuery):
            self._check_field(q.field)
            return [(q.field, t) for t in q.terms]
        from .query import SpanQuery as _SpanQuery, span_terms
        if isinstance(q, _SpanQuery):
            self._check_field(q.field)
            return [(q.field, t) for t in span_terms(q)]
        if isinstance(q, BooleanQuery):
            subs = q.musts + q.shoulds + q.filters + q.must_nots
        elif isinstance(q, (BoostQuery, ConstantScoreQuery, FilterQuery,
                            MinScoreQuery)):
            subs = [q.query]
        elif isinstance(q, DisjunctionMaxQuery):
            subs = q.disjuncts
        elif isinstance(q, BoostingQuery):
            subs = [q.positive, q.negative]
        else:
            return []
        return [t for s in subs for t in self._collect_terms(s)]

    # ------------------------------------------------------------------
    # planning: query tree → (seg, doc, score) frame
    # ------------------------------------------------------------------

    def _frame(self, q: Query, boost: np.float32, needs_scores: bool,
               stats: dict | None = None) -> DataFrame:
        if not needs_scores and self._query_cache is not None:
            cached = self._cached_filter_frame(q, boost, stats)
            if cached is not None:
                return cached
        return self._frame_impl(q, boost, needs_scores, stats)

    def _cached_filter_frame(self, q: Query, boost: np.float32,
                             stats: dict | None) -> DataFrame | None:
        """CachingWrapperWeight::create_scorer protocol
        (query_cache.rs:416-456), step for step: policy.on_use, index
        size eligibility (:424-428 — the leaf min_size test, applied to
        the whole index since our cache unit is the generation-keyed
        persisted frame, cache.py module docstring), cache lookup
        (:430-443, hit = constant-score set), then policy.should_cache
        gating compute-and-store (:445-455).  Returns None to run the
        query uncached.  Only reached with needs_scores=False — the
        QueryCache::do_cache equivalence contract (query_cache.rs:42-54).

        ConstantScore/Boost wrappers are skipped at this level (their
        inner query is consulted on recursion instead) — the policy
        tracks the ACTUAL query type (cache_policy.rs:93,105
        debug-asserts the weight is never CONSTANT).  Plain-term filter
        clauses inside BooleanQuery never reach here at all: they ride
        the batched one-scan term path (_boolean_frame term_specs),
        which beats a per-clause cached set — the same economics behind
        the policy's min-frequency 20 for cheap term filters."""
        from .cache import query_cache_key
        if isinstance(q, (ConstantScoreQuery, BoostQuery)):
            return None
        key = query_cache_key(q)
        if key is None:
            return None
        qc, policy = self._query_cache, self._caching_policy
        policy.on_use(q, key)
        if self.doc_count < qc.min_size:
            return None
        hit = qc.get(self._gen_key, key)
        if hit is None:
            if not policy.should_cache(q, key):
                return None
            frame = self._frame_impl(q, np.float32(1.0), False, stats)
            hit = qc.put(self._gen_key, key, frame.select("seg", "doc"))
        s = float(np.float32(boost))
        return hit.select(
            "seg", "doc", F.lit(s).cast(self._score_t).alias("score"))

    def _frame_impl(self, q: Query, boost: np.float32, needs_scores: bool,
                    stats: dict | None = None) -> DataFrame:
        if stats is None:
            stats = self._stats_for(self._collect_terms(q))

        if isinstance(q, TermQuery):
            return self._term_frame(q, boost, stats)
        if isinstance(q, BoostQuery):
            return self._frame(q.query, np.float32(boost * np.float32(q.boost)),
                               needs_scores, stats)
        if isinstance(q, ConstantScoreQuery):
            inner = self._frame(q.query, np.float32(1.0), False, stats)
            s = float(np.float32(boost * np.float32(q.boost)))
            return inner.select("seg", "doc",
                                F.lit(s).cast(self._score_t).alias("score"))
        if isinstance(q, MatchAllDocsQuery):
            s = float(np.float32(boost))
            return self._docmeta.select(
                "seg", "doc", F.lit(s).cast(self._score_t).alias("score"))
        if isinstance(q, RangeQuery):
            cond = F.col(q.column).isNotNull()
            if q.lower is not None:
                cond = cond & (F.col(q.column) >= F.lit(q.lower))
            if q.upper is not None:
                cond = cond & (F.col(q.column) <= F.lit(q.upper))
            s = float(np.float32(boost))
            return self._docmeta.filter(cond).select(
                "seg", "doc", F.lit(s).cast(self._score_t).alias("score"))
        from .query import MultiRangeQuery
        if isinstance(q, MultiRangeQuery):
            # multi-dim points (bkd_writer.rs): all dims in ONE scan; each
            # range reaches the Parquet reader as a pushed filter
            cond = F.lit(True)
            for col, lo, hi in q.ranges:
                cond = cond & F.col(col).isNotNull()
                if lo is not None:
                    cond = cond & (F.col(col) >= F.lit(lo))
                if hi is not None:
                    cond = cond & (F.col(col) <= F.lit(hi))
            s = float(np.float32(boost))
            return self._docmeta.filter(cond).select(
                "seg", "doc", F.lit(s).cast(self._score_t).alias("score"))
        if isinstance(q, ExistsQuery):
            s = float(np.float32(boost))
            return self._docmeta.filter(F.col(q.column).isNotNull()).select(
                "seg", "doc", F.lit(s).cast(self._score_t).alias("score"))
        if isinstance(q, FilterQuery):
            # candidate generation first, expensive per-doc predicate after
            # (two-phase iteration, filter_query.rs:28-52)
            inner = self._frame(q.query, boost, needs_scores, stats)
            joined = inner.join(self._docmeta, ["seg", "doc"])
            if callable(q.predicate):
                schema = self._score_schema
                pred = q.predicate

                def fn(batches):
                    for pdf in batches:
                        if len(pdf) == 0:
                            continue
                        mask = np.asarray(pred(pdf), dtype=bool)
                        yield pdf.loc[mask, ["seg", "doc", "score"]]

                return joined.mapInPandas(fn, schema)
            return joined.filter(q.predicate).select("seg", "doc", "score")
        if isinstance(q, MinScoreQuery):
            # min_scorer.rs:69-71 — matches() requires score strictly > min
            inner = self._frame(q.query, boost, True, stats)
            return inner.filter(F.col("score") > F.lit(float(q.min_score)))
        if isinstance(q, BooleanQuery):
            return self._boolean_frame(q, boost, needs_scores, stats)
        if isinstance(q, PhraseQuery):
            return self._phrase_frame(q, boost, stats)
        from .query import SpanQuery as _SpanQuery
        if isinstance(q, _SpanQuery):
            return self._span_frame(q, boost, stats)
        if isinstance(q, DisjunctionMaxQuery):
            all_terms = (
                all(isinstance(d, TermQuery) for d in q.disjuncts)
                and len({(d.field, d.term) for d in q.disjuncts})
                == len(q.disjuncts)
            )
            if all_terms:
                specs = [
                    (d.field, d.term, "",
                     float(np.float32(boost * np.float32(d.boost))), True)
                    for d in q.disjuncts
                ]
                unioned = self._batch_term_frame(specs, stats, with_tag=False)
            else:
                tagged = [
                    self._frame(d, boost, needs_scores, stats) for d in q.disjuncts
                ]
                unioned = reduce(DataFrame.unionByName, tagged)
            tie = float(q.tie_breaker)
            return (
                unioned.groupBy("seg", "doc")
                .agg(F.max("score").alias("_mx"), F.sum("score").alias("_sum"))
                .select(
                    "seg", "doc",
                    (F.col("_mx") + F.lit(tie) * (F.col("_sum") - F.col("_mx"))
                     ).cast(self._score_t).alias("score"),
                )
            )
        if isinstance(q, BoostingQuery):
            pos = self._frame(q.positive, boost, needs_scores, stats)
            neg = self._frame(q.negative, np.float32(1.0), False, stats)
            nb = float(q.negative_boost)
            return (
                pos.join(neg.select("seg", "doc", F.lit(True).alias("_neg")),
                         ["seg", "doc"], "left")
                .select(
                    "seg", "doc",
                    F.when(F.col("_neg").isNotNull(),
                           (F.col("score") * F.lit(nb)).cast(self._score_t))
                    .otherwise(F.col("score")).alias("score"),
                )
            )
        raise TypeError(f"unsupported query: {type(q)}")

    # -- leaves ---------------------------------------------------------

    def _term_frame(self, q: TermQuery, boost: np.float32, stats: dict) -> DataFrame:
        total_boost = float(np.float32(boost * np.float32(q.boost)))
        return self._batch_term_frame(
            [(q.field, q.term, "", total_boost, True)], stats, with_tag=False)

    def _term_weights(self, field: str, term: str, boost: float, stats: dict):
        """Per-(field, term) scoring constants: (wk32, idf64, boost64).
        ``wk32`` folds the field's k1 (per-field similarity)."""
        row = stats.get((field, term))
        df_ = int(row["df"]) if row else 0
        k1f = np.float32(self.sim_f[field][0])
        w32 = np.float32(idf32(max(df_, 1), self.doc_count) * np.float32(boost))
        wk32 = np.float32(w32 * (k1f + np.float32(1.0)))
        idf_64 = float(np.log(1.0 + (self.doc_count - df_ + 0.5) / (df_ + 0.5)))
        return wk32, idf_64, float(boost)

    def _batch_term_frame(self, specs: list[tuple], stats: dict,
                          with_tag: bool, scan: DataFrame | None = None) -> DataFrame:
        """ONE postings scan + ONE Arrow decode stage for many term clauses.

        ``specs``: (field, term, tag, boost, scored) per clause. Replaces
        the per-term scan union for boolean/dismax queries — the
        reference's per-clause postings iterators share one index pass here
        (conjunction_scorer.rs / disjunction_scorer.rs collapse into a
        single term-pruned columnar scan). Clauses may span fields; each
        decodes against its own field's norm cache / avgdl.

        Scale shape: the Python decode emits ONE row per (field, term)
        posting — ``(seg, doc, kid, tff, denom)``, all fixed-width ints/
        floats — and the per-CLAUSE expansion (a term referenced by many
        clauses of a serving micro-batch) happens JVM-side as a broadcast
        hash join against a clause table keyed by ``kid``.  The previous
        shape expanded per-clause INSIDE the Python worker with an
        object-dtype tag column, so a 1000-query batch paid Arrow
        serialization + string hashing on ~4x the rows; the join form
        keeps the hot columns in whole-stage codegen.  Score arithmetic
        runs in the SAME IEEE op order as the row-at-a-time path
        (f32: ``(wk*tff)/(tff+denom)``; f64: ``(coef*tff)/denom``), so
        scores stay bit-identical (asserted by test_engine_parity).
        ``with_tag`` adds the clause-table columns ``_ct`` (string tag,
        boolean-frame protocol) and ``_q``/``_g``/``_r`` (int qid / group
        id / role code m=0 s=1 f=2 n=3, serving-batch protocol).
        """
        by_key: dict[tuple[str, str], list] = {}
        for field, term, tag, boost, scored in specs:
            self._check_field(field)
            wk32, idf_64, b64 = self._term_weights(field, term, boost, stats)
            by_key.setdefault((field, term), []).append(
                (tag, scored, wk32, idf_64, b64))

        cache_f = self.cache_f
        scoring = self.scoring
        lucene = scoring == "lucene"
        # clause table rows: one per spec, keyed by the (field, term) key
        # id the decode emits.  _w folds every per-clause scalar the score
        # needs (f32 wk = idf*boost*(k1+1); f64 coef = idf*boost*(k1+1)).
        _keys = list(by_key)
        kid_of = {k: i for i, k in enumerate(_keys)}
        cl_rows = []
        for k in _keys:
            kid = kid_of[k]
            k1_, b_ = self.sim_f[k[0]]
            for tag, scored, wk32, idf_64, b64 in by_key[k]:
                if "|" in tag:
                    qs, gs, rs = tag.split("|")
                    qi, gi = int(qs), (0 if gs == "r" else int(gs[1:]))
                else:
                    qi, gi, rs = -1, 0, (tag or "s")
                ri = _ROLE_CODE.get(rs, 1)
                w = (float(wk32) if lucene
                     else (idf_64 * b64) * _kp1_64(k1_))
                cl_rows.append((kid, tag, qi, gi, ri, w, bool(scored)))

        # per-key field constants for the f64 denominator, gathered by kid
        # inside the decode (k1/b/avgdl are per FIELD; norms cache is the
        # f32 path's per-field denominator)
        k1_of_key = np.asarray([self.sim_f[k[0]][0] for k in _keys],
                               dtype=np.float64)
        b_of_key = np.asarray([self.sim_f[k[0]][1] for k in _keys],
                              dtype=np.float64)
        avg_of_key = np.asarray([self.avgdl64_f[k[0]] for k in _keys],
                                dtype=np.float64)

        def fn(batches):
            # whole-batch decode: every block of the Arrow batch is
            # unpacked in a few numpy passes (batch_unpack /
            # batch_delta_decode); emission is one row per posting with
            # fixed-width columns only — no per-block Python loop, no
            # per-clause duplication
            for pdf in batches:
                n_rows = len(pdf)
                if n_rows == 0:
                    continue
                counts = pdf["num_docs"].to_numpy(np.int64)
                docs = batch_delta_decode(
                    batch_unpack(pdf["docs_bin"].tolist(), counts), counts
                ).astype(np.int64)
                tfs = batch_unpack(pdf["tfs_bin"].tolist(), counts)
                flds = pdf["field"].tolist()
                trms = pdf["term"].tolist()
                row_kid = np.fromiter(
                    (kid_of[(f_, t)] for f_, t in zip(flds, trms)),
                    dtype=np.int64, count=n_rows)
                out = {
                    "seg": np.repeat(pdf["seg"].to_numpy(np.int32), counts),
                    "doc": docs,
                    "kid": np.repeat(row_kid, counts).astype(np.int32),
                }
                if lucene:
                    nbs = batch_unpack(pdf["norms_bin"].tolist(), counts
                                       ).astype(np.int64)
                    denom = np.empty(len(nbs), dtype=np.float32)
                    fld_doc = np.repeat(np.asarray(flds, dtype=object),
                                        counts)
                    for f_ in set(flds):
                        m = fld_doc == f_
                        denom[m] = cache_f[f_][nbs[m]]
                    out["tff"] = tfs.astype(np.float32)
                    out["denom"] = denom
                else:
                    dls = batch_unpack(pdf["dls_bin"].tolist(), counts
                                       ).astype(np.float64)
                    tff = tfs.astype(np.float64)
                    k1_v = np.repeat(k1_of_key[row_kid], counts)
                    b_v = np.repeat(b_of_key[row_kid], counts)
                    avg_v = np.repeat(avg_of_key[row_kid], counts)
                    out["tff"] = tff
                    out["denom"] = tff + k1_v * ((1.0 - b_v)
                                                 + b_v * dls / avg_v)
                yield pd.DataFrame(out)

        if scan is None:
            by_field: dict[str, list[str]] = {}
            for f_, t in by_key:
                by_field.setdefault(f_, []).append(t)
            cond = reduce(
                lambda a, b: a | b,
                [(F.col("field") == f_) & F.col("term").isin(ts)
                 for f_, ts in by_field.items()],
            )
            scan = self._postings.filter(cond).select(
                "field", "term", "seg", "num_docs", "docs_bin", "tfs_bin",
                "norms_bin", "dls_bin")
        num_t = "float" if lucene else "double"
        decoded = scan.mapInPandas(
            fn, f"seg int, doc long, kid int, tff {num_t}, denom {num_t}")

        # clause-table attach.  Small tables (every interactive query, and
        # serving micro-batches up to ~100 clauses) inline as a LITERAL
        # array expression indexed by kid — pure whole-stage-codegen
        # projection, no extra Spark job.  createDataFrame(local rows)
        # parallelizes through an RDD, so the previous broadcast-join form
        # cost one defaultParallelism-task materialization job PER frame
        # (round-4 sf0.1 regression: querystring builds two frames = two
        # extra 32-task jobs, +0.5s fixed).  Above the cap the join form
        # wins (a 1000-query batch amortizes one job; a literal array that
        # big would bloat the plan), so it remains the fallback.
        if len(cl_rows) <= self._CL_LITERAL_MAX:
            per_kid: list[list] = [[] for _ in _keys]
            for row in cl_rows:
                per_kid[row[0]].append(row)

            def _cl_struct(row):
                # one SQL literal per clause — the whole nested array
                # below ships as ONE expression string (a single py4j
                # round-trip; per-clause F.struct/F.lit calls measurably
                # dominated plan-build time).  repr(float) round-trips
                # exactly through DOUBLE, and the terminal cast restores
                # the f32 the join form carried.
                _kid, ct, qi, gi, ri, w, sc = row
                ct_sql = "'" + str(ct).replace("'", "''") + "'"
                return (f"named_struct('_ct',{ct_sql},'_q',{int(qi)},"
                        f"'_g',{int(gi)},'_r',{int(ri)},"
                        f"'_w',CAST({float(w)!r} AS {num_t}),"
                        f"'_scored',{'true' if sc else 'false'})")

            arr_sql = "array(" + ",".join(
                "array(" + ",".join(_cl_struct(r) for r in rows_k) + ")"
                for rows_k in per_kid) + ")"
            cl = F.element_at(F.expr(arr_sql), F.col("kid") + F.lit(1))
            if all(len(rows_k) == 1 for rows_k in per_kid):
                base = decoded.select(
                    "seg", "doc", "tff", "denom", cl[0].alias("_cl"))
            else:
                base = decoded.select(
                    "seg", "doc", "tff", "denom",
                    F.explode(cl).alias("_cl"))
            w_c, sc_c = F.col("_cl._w"), F.col("_cl._scored")
            tag_cols = [F.col("_cl._ct").alias("_ct"),
                        F.col("_cl._q").alias("_q"),
                        F.col("_cl._g").alias("_g"),
                        F.col("_cl._r").alias("_r")]
        else:
            cl_df = self.spark.createDataFrame(
                cl_rows,
                f"kid int, _ct string, _q int, _g int, _r int, _w {num_t},"
                " _scored boolean")
            base = decoded.join(F.broadcast(cl_df), "kid")
            w_c, sc_c = F.col("_w"), F.col("_scored")
            tag_cols = ["_ct", "_q", "_g", "_r"]
        # f32/f64 score in the row-at-a-time op order, inside codegen.
        # Spark widens float arithmetic to double, so the f32 path casts
        # back to float after EVERY op: double-rounding a single +,*,/ of
        # exact f32 operands is innocuous at 53>=2*24+2 bits of interim
        # precision, so each step is bit-identical to a native f32 op
        # (asserted by test_engine_parity).
        if lucene:
            num = (w_c * F.col("tff")).cast("float")
            den = (F.col("tff") + F.col("denom")).cast("float")
            expr = (num / den).cast("float")
        else:
            expr = (w_c * F.col("tff")) / F.col("denom")
        score = F.when(sc_c, expr).otherwise(
            F.lit(0.0).cast(num_t)).alias("score")
        cols = ["seg", "doc", score]
        if with_tag:
            cols += tag_cols
        return base.select(*cols)

    def _positions_rows(self, field: str, uniq_terms: list[str],
                        ti_of: dict) -> DataFrame:
        """ONE postings scan (+ positions) for a set of terms of one field,
        decoded whole-batch → rows (seg, doc, ti, norm_byte, dl, positions).
        Shared by the phrase and span paths."""

        def decode(batches):
            # whole-batch decode (no per-block Python loop); positions are
            # restored with one varint pass + segmented cumsum
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                counts = pdf["num_docs"].to_numpy(np.int64)
                docs = batch_delta_decode(
                    batch_unpack(pdf["docs_bin"].tolist(), counts), counts
                ).astype(np.int64)
                tfs_ = batch_unpack(pdf["tfs_bin"].tolist(), counts
                                    ).astype(np.int64)
                nbs = batch_unpack(pdf["norms_bin"].tolist(), counts
                                   ).astype(np.int64)
                dls = batch_unpack(pdf["dls_bin"].tolist(), counts
                                   ).astype(np.int64)
                flat_pos, _ = batch_unpack_positions(
                    pdf["pos_bin"].tolist(), tfs_)
                plists = np.split(flat_pos, np.cumsum(tfs_)[:-1])
                tis = np.repeat(
                    np.asarray([ti_of[t] for t in pdf["term"]],
                               dtype=np.int32), counts)
                yield pd.DataFrame(
                    {
                        "seg": np.repeat(pdf["seg"].to_numpy(np.int32), counts),
                        "doc": docs,
                        "ti": tis,
                        "norm_byte": nbs,
                        "dl": dls,
                        "positions": [p.tolist() for p in plists],
                    }
                )

        scan = self._postings.filter(
            (F.col("field") == field) & F.col("term").isin(uniq_terms)
        ).select("term", "seg", "num_docs", "docs_bin", "tfs_bin",
                 "norms_bin", "dls_bin", "pos_bin")
        return scan.mapInPandas(
            decode,
            "seg int, doc long, ti int, norm_byte int, dl long,"
            " positions array<long>",
        )

    def _phrase_collector_topk(self, q: PhraseQuery, boost: np.float32,
                               k: int) -> DataFrame:
        """Zero-shuffle exact-phrase top-k — the per-segment collector
        kernel (see _collector_topk_frame) extended to phrases, with
        impact-ordered verification (_phrase_seg_topk).

        The exhaustive exact path (_phrase_frame, slop=0) shuffles one
        position-array row per (candidate doc, term) into a (seg, doc)
        groupBy — corpus-sized for a stopword phrase (51.7s at 1M docs,
        BENCH_1M.json q_stopword_phrase).  Here each worker holds a whole
        segment's postings for the phrase terms (the searcher pins
        one-segment-file-per-partition), so conjunction, the min-tf
        score upper bound, ub-ordered position verification, tombstone
        masking and the per-segment top-k all happen in numpy inside the
        scan stage; only ≤ k rows per segment ever leave the executors,
        and pos_bin blocks that cannot beat θ are never varint-decoded.
        Used only where per-seg top-k is sound: a ROOT exact phrase going
        straight to the collector (search()), never as a boolean clause.
        Scores are bit-identical to _phrase_frame (same float32 kernel,
        same freq) — asserted by tests/test_phrase_collector.py.

        Sloppy phrases (slop > 0) ride the same kernel with the bound
        Σ_slots tf − n_slots + 1 (every _SloppyFreq iteration consumes
        one position advance and emits ≤1 match of weight ≤1) and the
        shared sloppy verify — batch-vectorized for two distinct terms,
        per-doc heap walk behind the same candidate cap as the
        exhaustive path otherwise."""
        self._check_field(q.field)
        self._check_positions(q.field)
        stats = self._stats_for([(q.field, t) for t in set(q.terms)])
        if any((q.field, t) not in stats for t in q.terms):
            return self.spark.createDataFrame([], self._score_schema)
        if q.slop > 0 and len(set(q.terms)) != len(q.terms):
            # repeated-term sloppy shapes verify per-doc in Python
            # (repeat groups): same candidate cap as the exhaustive
            # path.  Distinct-term phrases of any length are lockstep-
            # vectorized (sloppy_phrase_freq_nslot_flat) and exempt.
            self._check_verify_cap(
                min(int(stats[(q.field, t)]["df"]) for t in q.terms),
                f"sloppy phrase {q.terms!r}~{q.slop}")
        idf_total = np.float32(0.0)
        idf64_total = 0.0
        for t in q.terms:
            df_ = int(stats[(q.field, t)]["df"])
            idf_total = np.float32(idf_total + idf32(df_, self.doc_count))
            idf64_total += float(np.log(
                1.0 + (self.doc_count - df_ + 0.5) / (df_ + 0.5)))
        k1_, b_ = self.sim_f[q.field]
        weight32 = np.float32(idf_total * boost)
        wk32 = np.float32(weight32 * (np.float32(k1_) + np.float32(1.0)))
        coef64 = (idf64_total * float(boost)) * _kp1_64(k1_)

        # hot-pair rewrite (build.py bigram channel): for an exact phrase,
        # every adjacent (a@p, b@p+1) slot pair with BOTH terms in the hot
        # vocabulary collapses into ONE pseudo-slot backed by the pair
        # postings — pair-position set == capped(a) ∩ (capped(b)−1), so the
        # slot-intersection semantics (and therefore freq and score) are
        # unchanged, while the conjunction shrinks from corpus-sized
        # stopword lists to the tiny adjacency lists and the min-tf bound
        # becomes the EXACT adjacency count.  A 2-term hot phrase reduces
        # to a single slot and never decodes positions at all
        # (_phrase_seg_topk fast path).  Rank/score identity vs the
        # unrewritten path is asserted by tests/test_bigrams.py.
        from .build import BIGRAM_SEP, BIGRAM_SUFFIX
        hot = self._bigram_hot(q.field) if q.slop == 0 else None
        terms_pos = [(t, int(p)) for t, p in zip(q.terms, q.positions)]
        new_slots: list[tuple[str, int, bool]] = []
        j = 0
        while j < len(terms_pos):
            t, p = terms_pos[j]
            if (hot and j + 1 < len(terms_pos)
                    and terms_pos[j + 1][1] == p + 1
                    and t in hot and terms_pos[j + 1][0] in hot):
                new_slots.append(
                    (t + BIGRAM_SEP + terms_pos[j + 1][0], p, True))
                j += 2
            else:
                new_slots.append((t, p, False))
                j += 1
        base_terms = sorted({t for t, _, isp in new_slots if not isp})
        pair_terms = sorted({t for t, _, isp in new_slots if isp})
        uniq_terms = base_terms + pair_terms
        ti_of = {t: i for i, t in enumerate(uniq_terms)}
        slots = [(ti_of[t], p) for t, p, _ in new_slots]
        offsets = [p for _, p, _ in new_slots]
        slop_ = int(q.slop)
        terms_ = list(q.terms)
        n_uniq = len(uniq_terms)
        cache = self.cache_f[q.field]
        avgdl64 = self.avgdl64_f[q.field]
        lucene = self.scoring == "lucene"
        tomb = self._tomb_by_seg()
        k_ = int(k)
        chunk0 = int(os.environ.get("RUCENE_PHRASE_CHUNK", "4096"))
        term_ti = ti_of

        def fn(batches):
            # streamed per segment — peak memory is one segment's rows
            # no matter how many segments _coalesced packs in
            for s, sub in _iter_seg_chunks(batches):
                tds = _decode_seg_tds(sub, term_ti)
                if len(tds) < n_uniq:
                    continue
                dv, sv = _phrase_seg_topk(
                    tds, slots, offsets, tomb.get(int(s)), k_, chunk0,
                    lucene, wk32, cache, coef64, k1_, b_, avgdl64,
                    slop=slop_, terms=terms_)
                if len(dv) == 0:
                    continue
                yield pd.DataFrame({
                    "seg": np.full(len(dv), s, dtype=np.int32),
                    "doc": dv,
                    "score": sv,
                })

        conds = []
        if base_terms:
            conds.append((F.col("field") == q.field)
                         & F.col("term").isin(base_terms))
        if pair_terms:
            conds.append((F.col("field") == q.field + BIGRAM_SUFFIX)
                         & F.col("term").isin(pair_terms))
        scan = self._postings.filter(
            reduce(lambda a, b: a | b, conds)
        ).select("term", "seg", "block_id", "num_docs", "docs_bin",
                 "tfs_bin", "norms_bin", "dls_bin", "pos_bin")
        return self._coalesced(scan).mapInPandas(
            fn, f"seg int, doc long, score {self._score_t}")

    def _span_collector_topk(self, q, boost: np.float32,
                             k: int) -> DataFrame:
        """Zero-shuffle span top-k — the per-segment collector kernel
        extended to the span family (_span_seg_topk). The exhaustive
        _span_frame shuffles one positions row per (candidate doc, term)
        into a corpus-sized (seg, doc) groupBy before verifying; here
        conjunction, the span-count impact bound, ub-ordered
        verification, tombstone masking and the per-segment top-k all
        run in numpy inside the scan stage — only ≤k rows per segment
        leave the executors, and pos_bin blocks no surviving candidate
        lands in are never decoded. Used only for ROOT span queries
        (search()), where per-segment top-k is sound. Scores are
        identical to _span_frame (same float32 span-freq kernels,
        tests/test_spans.py cross-route assertions)."""
        from .query import (
            SpanBoostQuery,
            SpanGapQuery,
            SpanNearQuery,
            span_spec,
            span_terms,
        )

        while isinstance(q, SpanBoostQuery):
            boost = np.float32(boost * np.float32(q.boost))
            q = q.query
        field = q.field
        self._check_field(field)
        self._check_positions(field)
        terms = span_terms(q)
        uniq_terms = sorted(set(terms))
        ti_of = {t: i for i, t in enumerate(uniq_terms)}
        spec = span_spec(q, ti_of)
        stats = self._stats_for([(field, t) for t in uniq_terms])

        idf_total = np.float32(0.0)
        idf64_total = 0.0
        for t in terms:
            row = stats.get((field, t))
            df_ = int(row["df"]) if row else 0
            idf_total = np.float32(idf_total + idf32(df_, self.doc_count))
            idf64_total += float(np.log(
                1.0 + (self.doc_count - df_ + 0.5) / (df_ + 0.5)))
        k1_, b_ = self.sim_f[field]
        weight32 = np.float32(idf_total * boost)
        wk32 = np.float32(weight32 * (np.float32(k1_) + np.float32(1.0)))
        coef64 = (idf64_total * float(boost)) * _kp1_64(k1_)

        if isinstance(q, SpanNearQuery):
            groups = [span_terms(c) for c in q.clauses
                      if not isinstance(c, SpanGapQuery)]
        else:
            groups = [terms]
        group_tis = [sorted({ti_of[t] for t in g}) for g in groups]
        batch_on = os.environ.get("RUCENE_SPAN_BATCH", "1") != "0"
        fast2 = (spec[0] == "near" and bool(spec[3]) and len(spec[1]) == 2
                 and all(s[0] == "term" for s in spec[1]) and batch_on)
        # n-clause ordered near over term/gap clauses: lockstep-vectorized
        # (ordered_near_freq_nclause_flat, round-4 verdict #2) — exempt
        # from the per-doc-verify candidate cap like the 2-term shape
        fastn = (not fast2 and spec[0] == "near" and bool(spec[3])
                 and all(s[0] in ("term", "gap") for s in spec[1])
                 and spec[1][0][0] == "term" and batch_on)
        if not (fast2 or fastn):
            def _df(t: str) -> int:
                row = stats.get((field, t))
                return int(row["df"]) if row else 0
            bound = min((sum(_df(t) for t in g) for g in groups),
                        default=0)
            self._check_verify_cap(
                bound, f"span query over {sorted(set(terms))!r}")
        ta2 = spec[1][0][1] if fast2 else -1
        tb2 = spec[1][1][1] if fast2 else -1
        slop2 = spec[2] if fast2 else 0

        cache = self.cache_f[field]
        avgdl64 = self.avgdl64_f[field]
        lucene = self.scoring == "lucene"
        tomb = self._tomb_by_seg()
        k_ = int(k)
        chunk0 = int(os.environ.get("RUCENE_PHRASE_CHUNK", "4096"))
        ti_map = ti_of

        def fn(batches):
            # streamed per segment (see _iter_seg_chunks): bounded memory
            for s, sub in _iter_seg_chunks(batches):
                tds = _decode_seg_tds(sub, ti_map)
                dv, sv = _span_seg_topk(
                    tds, spec, group_tis, tomb.get(int(s)), k_, chunk0,
                    lucene, wk32, cache, coef64, k1_, b_, avgdl64,
                    fast2, ta2, tb2, slop2, fastn)
                if len(dv) == 0:
                    continue
                yield pd.DataFrame({
                    "seg": np.full(len(dv), s, dtype=np.int32),
                    "doc": dv,
                    "score": sv,
                })

        scan = self._postings.filter(
            (F.col("field") == field) & F.col("term").isin(uniq_terms)
        ).select("term", "seg", "block_id", "num_docs", "docs_bin",
                 "tfs_bin", "norms_bin", "dls_bin", "pos_bin")
        return self._coalesced(scan).mapInPandas(
            fn, f"seg int, doc long, score {self._score_t}")

    def _phrase_frame(self, q: PhraseQuery, boost: np.float32, stats: dict) -> DataFrame:
        """ONE postings scan for all phrase terms (``term IN (...)`` pushed
        down), one decode stage, then the two-phase ExactPhraseScorer as
        relational algebra (phrase_scorer.rs:122-294).

        For slop=0 the phrase frequency itself is computed ENTIRELY
        JVM-side: explode positions, shift each slot's position by its
        phrase offset, and count (seg, doc, base) groups hitting every
        slot — the per-doc intersection of shifted position sets
        (phrase_scorer.rs:179-229) as a groupBy. Python then sees only
        (seg, doc, freq, norm, dl) scalar rows for the BM25 kernel (bit
        parity with the batch term scorer), never position payloads — a
        stopword-pair phrase at 10^6+ docs stays Arrow/JVM-bound instead
        of materializing ~N candidate position maps into Python
        (round-2 VERDICT 'What's wrong #2').

        Sloppy phrases keep the per-doc kernel walk (inherently
        sequential, phrase_scorer.rs:537-575) on the conjunction-filtered
        candidate set."""
        self._check_field(q.field)
        self._check_positions(q.field)
        if any((q.field, t) not in stats for t in q.terms):
            return self.spark.createDataFrame([], self._score_schema)
        idf_total = np.float32(0.0)
        idf64_total = 0.0
        for t in q.terms:
            df_ = int(stats[(q.field, t)]["df"])
            idf_total = np.float32(idf_total + idf32(df_, self.doc_count))
            idf64_total += float(np.log(1.0 + (self.doc_count - df_ + 0.5) / (df_ + 0.5)))
        k1_, b_ = self.sim_f[q.field]
        weight32 = np.float32(idf_total * boost)
        wk32 = np.float32(weight32 * (np.float32(k1_) + np.float32(1.0)))

        uniq_terms = sorted(set(q.terms))
        ti_of = {t: i for i, t in enumerate(uniq_terms)}
        n_uniq = len(uniq_terms)
        rows = self._positions_rows(q.field, uniq_terms, ti_of)

        offsets = list(q.positions)
        terms = list(q.terms)
        term_tis = [ti_of[t] for t in terms]
        slop = q.slop
        cache = self.cache_f[q.field]
        scoring = self.scoring
        avgdl64 = self.avgdl64_f[q.field]
        boost64 = float(boost)
        coef64 = (idf64_total * boost64) * _kp1_64(k1_)

        if slop == 0:
            # one shuffle aligns each candidate doc's per-term position
            # arrays (tf-capped, <=10 elements each); the intersection of
            # offset-shifted arrays — phrase_scorer.rs:179-229's freq —
            # is a chained JVM array_intersect, so the frequency never
            # leaves the JVM and Python receives only scalar rows
            aligned0 = (
                rows.groupBy("seg", "doc")
                .agg(
                    F.count("*").alias("_n"),
                    F.map_from_entries(
                        F.collect_list(F.struct("ti", "positions"))
                    ).alias("_pm"),
                    F.first("norm_byte").alias("_nb"),
                    F.first("dl").alias("_dl"),
                )
                .filter(F.col("_n") == n_uniq)
            )
            def _shift(off: int):
                # single-arg lambda: a 2-arg lambda would make transform
                # pass the ELEMENT INDEX as the second argument
                return lambda x: x - F.lit(int(off))

            inter = None
            for t, off in zip(terms, offsets):
                arr = F.transform(
                    F.element_at(F.col("_pm"), F.lit(ti_of[t])),
                    _shift(off))
                inter = arr if inter is None else F.array_intersect(
                    inter, arr)
            scored_rows = (
                aligned0.select("seg", "doc", "_nb", "_dl",
                                F.size(inter).alias("_freq"))
                .filter(F.col("_freq") > 0)
            )

            def score(batches):
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    fr = pdf["_freq"].to_numpy(np.float64)
                    if scoring == "lucene":
                        tff = fr.astype(np.float32)
                        sc = (wk32 * tff) / (
                            tff + cache[pdf["_nb"].to_numpy(np.int64)])
                    else:
                        dl = pdf["_dl"].to_numpy(np.float64)
                        denom = fr + k1_ * ((1.0 - b_) + b_ * dl / avgdl64)
                        sc = coef64 * fr / denom
                    yield pd.DataFrame({
                        "seg": pdf["seg"].to_numpy(),
                        "doc": pdf["doc"].to_numpy(),
                        "score": sc,
                    })

            return scored_rows.mapInPandas(score, self._score_schema)

        aligned = (
            rows.groupBy("seg", "doc")
            .agg(
                F.count("*").alias("_n"),
                F.map_from_entries(
                    F.collect_list(F.struct("ti", "positions"))).alias("_pm"),
                F.first("norm_byte").alias("_nb"),
                F.first("dl").alias("_dl"),
            )
            .filter(F.col("_n") == n_uniq)
        )

        two_term = len(terms) == 2 and terms[0] != terms[1]
        distinct = len(set(terms)) == len(terms)
        if not distinct:
            # repeated-term phrases keep the per-doc heap walk (repeat
            # groups, phrase_scorer.rs:587-792); gate it on the metadata
            # candidate bound (min required-term df) so an adversarial
            # stopword phrase can't run a corpus-sized Python loop —
            # degrade-by-rejection with guidance, like block-max's
            # degenerate path (round-3 VERDICT #1).  Distinct-term
            # phrases of ANY length are lockstep-vectorized (round-4
            # verdict #2) and exempt.
            self._check_verify_cap(
                min(int(stats[(q.field, t)]["df"]) for t in q.terms),
                f"sloppy phrase {q.terms!r}~{slop}")

        def verify(batches):
            # sloppy only (exact phrases returned above). Two distinct
            # terms run the batch-vectorized alternating-leader walk;
            # n≥3 distinct terms run the lockstep heap-walk simulation
            # (sloppy_phrase_freq_nslot_batch); repeated-term shapes
            # keep the per-doc heap walk (phrase_scorer.rs:537-575)
            # behind the candidate cap checked above.
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                n_cand = len(pdf)
                pms = pdf["_pm"].tolist()
                if two_term:
                    freqs = sloppy_phrase_freq_2term_batch(
                        [pm[term_tis[0]] for pm in pms],
                        [pm[term_tis[1]] for pm in pms],
                        offsets[0], offsets[1], slop,
                    ).astype(np.float64)
                elif distinct:
                    freqs = sloppy_phrase_freq_nslot_batch(
                        [[np.asarray(pm[ti], dtype=np.int64) for pm in pms]
                         for ti in term_tis],
                        offsets, slop).astype(np.float64)
                else:
                    freqs = np.zeros(n_cand, dtype=np.float64)
                    for r in range(n_cand):
                        pm = pms[r]
                        pls = [np.asarray(pm[ti], dtype=np.int64)
                               for ti in term_tis]
                        freqs[r] = float(
                            sloppy_phrase_freq(pls, offsets, terms, slop))
                mask = freqs > 0
                if not mask.any():
                    continue
                sub = pdf[mask]
                fr = freqs[mask]
                if scoring == "lucene":
                    tff = fr.astype(np.float32)
                    sc = (wk32 * tff) / (
                        tff + cache[sub["_nb"].to_numpy(dtype=np.int64)]
                    )
                else:
                    dl = sub["_dl"].to_numpy(dtype=np.float64)
                    denom = fr + k1_ * ((1.0 - b_) + b_ * dl / avgdl64)
                    sc = coef64 * fr / denom
                yield pd.DataFrame(
                    {
                        "seg": sub["seg"].to_numpy(),
                        "doc": sub["doc"].to_numpy(),
                        "score": sc,
                    }
                )

        return aligned.mapInPandas(verify, self._score_schema)

    def _span_frame(self, q, boost: np.float32, stats: dict) -> DataFrame:
        """Span queries as a generalized position join: one postings scan
        for every term in the span tree, a clause-presence bitmask
        prefilter (JVM-side), then the shared span kernels on the
        candidate docs (spans.py; span.rs / span_near.rs / span_or.rs).
        Scored like a phrase: weight = f32-summed idf of the tree's
        distinct terms, freq = f32 Σ 1/(1+width) over emitted spans."""
        from .query import (
            SpanBoostQuery,
            SpanGapQuery,
            SpanNearQuery,
            span_spec,
            span_terms,
        )
        from .spans import span_freq

        # top-level SpanBoostQuery layers fold into the similarity boost
        # (span_boost.rs:290-291, b = boost * self.boost); boosts nested
        # deeper in the tree are scoring no-ops like the reference's
        # needs_scores=false sub-weights
        while isinstance(q, SpanBoostQuery):
            boost = np.float32(boost * np.float32(q.boost))
            q = q.query

        field = q.field
        self._check_field(field)
        self._check_positions(field)
        terms = span_terms(q)
        uniq_terms = sorted(set(terms))
        ti_of = {t: i for i, t in enumerate(uniq_terms)}
        spec = span_spec(q, ti_of)

        # combined idf weight, f32-accumulated in tree order (SpanWeight)
        idf_total = np.float32(0.0)
        idf64_total = 0.0
        for t in terms:
            row = stats.get((field, t))
            df_ = int(row["df"]) if row else 0
            idf_total = np.float32(idf_total + idf32(df_, self.doc_count))
            idf64_total += float(np.log(
                1.0 + (self.doc_count - df_ + 0.5) / (df_ + 0.5)))
        k1_, b_ = self.sim_f[field]
        weight32 = np.float32(idf_total * boost)
        wk32 = np.float32(weight32 * (np.float32(k1_) + np.float32(1.0)))

        # required-clause groups: a doc qualifies only with >=1 term of
        # EVERY top-level near clause (nested trees fold into their
        # top-level clause's group); or/term roots have a single group
        if isinstance(q, SpanNearQuery):
            groups = [span_terms(c) for c in q.clauses
                      if not isinstance(c, SpanGapQuery)]
        else:
            groups = [terms]
        full_mask = (1 << len(groups)) - 1
        # the 2-term-clause ORDERED near ("a before b within n" — the
        # common serving shape) verifies batch-vectorized
        # (spans.ordered_near_freq_2term_batch), so it is exempt from the
        # per-doc-Python candidate cap, like the 2-distinct-term sloppy
        # phrase
        batch_on = os.environ.get("RUCENE_SPAN_BATCH", "1") != "0"
        fast2 = (spec[0] == "near" and bool(spec[3]) and len(spec[1]) == 2
                 and all(s[0] == "term" for s in spec[1]) and batch_on)
        fastn = (not fast2 and spec[0] == "near" and bool(spec[3])
                 and all(s[0] in ("term", "gap") for s in spec[1])
                 and spec[1][0][0] == "term" and batch_on)
        if not (fast2 or fastn):
            # remaining per-doc-Python span shapes (or-trees, unordered
            # nears): gate on the metadata candidate bound — a doc needs
            # >=1 term of every required group, so min over groups of the
            # group's summed df bounds the candidate set (round-3
            # VERDICT #1).  Ordered nears over term/gap clauses of ANY
            # length are lockstep-vectorized (round-4 verdict #2) and
            # exempt.
            def _df(t: str) -> int:
                row = stats.get((field, t))
                return int(row["df"]) if row else 0
            bound = min((sum(_df(t) for t in g) for g in groups), default=0)
            self._check_verify_cap(
                bound, f"span query over {sorted(set(terms))!r}")
        ti_mask: dict[int, int] = {}
        for gi, g in enumerate(groups):
            for t in g:
                ti_mask[ti_of[t]] = ti_mask.get(ti_of[t], 0) | (1 << gi)
        mask_map = F.create_map(*[
            F.lit(x) for ti, mk in ti_mask.items() for x in (ti, mk)])

        rows = self._positions_rows(field, uniq_terms, ti_of)
        aligned = (
            rows.withColumn(
                "_m", F.coalesce(F.element_at(mask_map, F.col("ti")),
                                 F.lit(0)))
            .groupBy("seg", "doc")
            .agg(
                F.expr("bit_or(_m)").alias("_mk"),
                F.map_from_entries(
                    F.collect_list(F.struct("ti", "positions"))).alias("_pm"),
                F.first("norm_byte").alias("_nb"),
                F.first("dl").alias("_dl"),
            )
            .filter(F.col("_mk") == full_mask)
        )

        cache = self.cache_f[field]
        scoring = self.scoring
        avgdl64 = self.avgdl64_f[field]
        boost64 = float(boost)
        coef64 = (idf64_total * boost64) * _kp1_64(k1_)

        ta2 = spec[1][0][1] if fast2 else -1
        tb2 = spec[1][1][1] if fast2 else -1
        slop2 = spec[2] if fast2 else 0
        from .spans import (
            ordered_near_freq_2term_batch,
            ordered_near_freq_nclause_flat,
        )

        def verify(batches):
            from itertools import chain
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pms = pdf["_pm"].tolist()
                if fast2:
                    freqs = ordered_near_freq_2term_batch(
                        [m[ta2] for m in pms], [m[tb2] for m in pms],
                        slop2).astype(np.float64)
                elif fastn:
                    clauses = []
                    for s_ in spec[1]:
                        if s_[0] == "gap":
                            clauses.append(("gap", s_[1]))
                            continue
                        ti = s_[1]
                        lists = [m[ti] for m in pms]
                        ln = np.fromiter((len(x) for x in lists),
                                         dtype=np.int64, count=len(lists))
                        flat = np.fromiter(chain.from_iterable(lists),
                                           dtype=np.int64,
                                           count=int(ln.sum()))
                        clauses.append(("pos", flat, ln))
                    freqs = ordered_near_freq_nclause_flat(
                        clauses, spec[2]).astype(np.float64)
                else:
                    freqs = np.zeros(len(pdf), dtype=np.float64)
                    for r in range(len(pdf)):
                        pos_map = {ti: np.asarray(pl, dtype=np.int64)
                                   for ti, pl in pms[r].items()}
                        freqs[r] = float(span_freq(spec, pos_map))
                mask = freqs > 0
                if not mask.any():
                    continue
                sub = pdf[mask]
                fr = freqs[mask]
                if scoring == "lucene":
                    tff = fr.astype(np.float32)
                    sc = (wk32 * tff) / (
                        tff + cache[sub["_nb"].to_numpy(dtype=np.int64)])
                else:
                    dl = sub["_dl"].to_numpy(dtype=np.float64)
                    denom = fr + k1_ * ((1.0 - b_) + b_ * dl / avgdl64)
                    sc = coef64 * fr / denom
                yield pd.DataFrame(
                    {
                        "seg": sub["seg"].to_numpy(),
                        "doc": sub["doc"].to_numpy(),
                        "score": sc,
                    }
                )

        return aligned.mapInPandas(verify, self._score_schema)

    # -- boolean ---------------------------------------------------------

    def _boolean_frame(self, q: BooleanQuery, boost: np.float32,
                       needs_scores: bool, stats: dict) -> DataFrame:
        term_specs: list[tuple] = []
        tagged: list[DataFrame] = []

        def add(subs, tag, scored, sub_boost):
            for sub in subs:
                if isinstance(sub, TermQuery):
                    eff = (float(np.float32(sub_boost * np.float32(sub.boost)))
                           if scored else 1.0)
                    term_specs.append((sub.field, sub.term, tag, eff, scored))
                elif scored:
                    tagged.append(self._frame(sub, sub_boost, needs_scores, stats)
                                  .withColumn("_ct", F.lit(tag)))
                else:
                    tagged.append(
                        self._frame(sub, np.float32(1.0), False, stats)
                        .select("seg", "doc",
                                F.lit(0.0).cast(self._score_t).alias("score"))
                        .withColumn("_ct", F.lit(tag)))

        add(q.musts, "m", True, boost)
        add(q.shoulds, "s", True, boost)
        add(q.filters, "f", False, np.float32(1.0))
        add(q.must_nots, "n", False, np.float32(1.0))
        if term_specs:
            tagged.append(
                self._batch_term_frame(term_specs, stats, with_tag=True)
                .select("seg", "doc", "score", "_ct"))

        unioned = reduce(DataFrame.unionByName, tagged)
        agg = unioned.groupBy("seg", "doc").agg(
            F.sum(F.when(F.col("_ct").isin("m", "s"), F.col("score"))
                  .otherwise(F.lit(0.0))).alias("_score"),
            F.count(F.when(F.col("_ct") == "m", 1)).alias("_nm"),
            F.count(F.when(F.col("_ct") == "s", 1)).alias("_ns"),
            F.count(F.when(F.col("_ct") == "f", 1)).alias("_nf"),
            F.count(F.when(F.col("_ct") == "n", 1)).alias("_nn"),
        )
        cond = (
            (F.col("_nm") == len(q.musts))
            & (F.col("_nf") == len(q.filters))
            & (F.col("_nn") == 0)
            & (F.col("_ns") >= q.min_should_match)
        )
        return agg.filter(cond).select(
            "seg", "doc", F.col("_score").cast(self._score_t).alias("score")
        )
