"""Round-trip tests for the postings block codec (FIXTURES.md §4; geometry
from /root/reference/src/core/codec/postings/posting_format.rs:36 and
for_util.rs:29,187-245)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rucene_spark.codec import (
    BLOCK_SIZE,
    delta_decode,
    delta_encode,
    for_decode,
    for_encode,
    pack_ints,
    pack_positions,
    unpack_ints,
    unpack_positions,
    varint_decode,
    varint_encode,
)


def test_block_size_matches_reference():
    assert BLOCK_SIZE == 128  # posting_format.rs:36


def test_varint_roundtrip_spot():
    vals = np.array([0, 1, 127, 128, 255, 300, 2**20, 2**35, 2**53], dtype=np.uint64)
    assert (varint_decode(varint_encode(vals), len(vals)) == vals).all()


@settings(max_examples=100)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_varint_roundtrip_fuzz(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (varint_decode(varint_encode(arr), len(arr)) == arr).all()


def test_for_all_values_equal_path():
    # for_util.rs:29 ALL_VALUES_EQUAL → header 0 + single vint
    block = np.full(BLOCK_SIZE, 42, dtype=np.uint64)
    enc = for_encode(block)
    assert enc[0] == 0 and len(enc) == 2
    assert (for_decode(enc) == block).all()


@settings(max_examples=60)
@given(st.integers(min_value=1, max_value=2**30))
def test_for_roundtrip_fuzz(maxval):
    rng = np.random.default_rng(maxval)
    block = rng.integers(0, maxval + 1, BLOCK_SIZE).astype(np.uint64)
    assert (for_decode(for_encode(block)) == block).all()


def test_pack_ints_tail_and_block():
    tail = np.arange(17, dtype=np.uint64) * 3
    assert (unpack_ints(pack_ints(tail), 17) == tail).all()
    full = np.arange(BLOCK_SIZE, dtype=np.uint64) + 5
    assert (unpack_ints(pack_ints(full), BLOCK_SIZE) == full).all()


def test_delta_roundtrip():
    docs = np.array([3, 9, 10, 400, 100000], dtype=np.uint64)
    assert (delta_decode(delta_encode(docs)) == docs).all()


def test_positions_roundtrip():
    # three docs with tfs 3, 1, 4
    pos_lists = [np.array([2, 7, 30]), np.array([0]), np.array([1, 2, 3, 900])]
    tfs = np.array([3, 1, 4])
    buf = pack_positions(np.concatenate(pos_lists), tfs)
    out = unpack_positions(buf, tfs)
    for got, want in zip(out, pos_lists):
        assert (got == want).all()


def test_positions_with_zero_tf_docs():
    pos_lists = [np.array([5, 6]), np.array([], dtype=np.int64), np.array([9])]
    tfs = np.array([2, 0, 1])
    buf = pack_positions(np.concatenate(pos_lists), tfs)
    out = unpack_positions(buf, tfs)
    assert (out[0] == [5, 6]).all() and out[1].size == 0 and (out[2] == [9]).all()


# ---------------------------------------------------------------------------
# batched multi-buffer decode (the searcher's hot path)
# ---------------------------------------------------------------------------


def test_batch_unpack_matches_per_block():
    from rucene_spark.codec import batch_unpack

    rng = np.random.default_rng(7)
    for trial in range(30):
        bufs, counts, want = [], [], []
        for _ in range(rng.integers(1, 40)):
            kind = rng.integers(0, 4)
            if kind == 0:  # varint tail
                n = int(rng.integers(1, BLOCK_SIZE))
                v = rng.integers(0, 1 << int(rng.integers(1, 40)), n).astype(np.uint64)
            elif kind == 1:  # ALL_VALUES_EQUAL full block
                n = BLOCK_SIZE
                v = np.full(n, rng.integers(0, 1 << 30), dtype=np.uint64)
            else:  # FOR full block, random bit width
                n = BLOCK_SIZE
                v = rng.integers(0, 1 << int(rng.integers(1, 40)), n).astype(np.uint64)
            bufs.append(pack_ints(v))
            counts.append(n)
            want.append(v)
        got = batch_unpack(bufs, np.array(counts))
        assert (got == np.concatenate(want)).all()


def test_batch_delta_decode_matches_per_block():
    from rucene_spark.codec import batch_delta_decode, batch_unpack

    rng = np.random.default_rng(8)
    bufs, counts, want = [], [], []
    for _ in range(25):
        n = int(rng.integers(1, 200))
        n = min(n, BLOCK_SIZE)
        docs = np.sort(rng.choice(1 << 20, size=n, replace=False)).astype(np.uint64)
        bufs.append(pack_ints(delta_encode(docs)))
        counts.append(n)
        want.append(docs)
    counts = np.array(counts)
    got = batch_delta_decode(batch_unpack(bufs, counts), counts)
    assert (got == np.concatenate(want)).all()


def test_batch_unpack_positions_matches_per_block():
    from rucene_spark.codec import batch_unpack_positions

    rng = np.random.default_rng(9)
    bufs, all_tfs, counts, want = [], [], [], []
    for _ in range(20):
        n_docs = int(rng.integers(1, 30))
        tfs = rng.integers(0, 6, n_docs).astype(np.int64)
        pos_lists = [np.sort(rng.choice(500, size=t, replace=False)) for t in tfs]
        flat = (np.concatenate(pos_lists) if tfs.sum() else
                np.empty(0, dtype=np.int64))
        bufs.append(pack_positions(flat.astype(np.uint64), tfs))
        all_tfs.append(tfs)
        counts.append(n_docs)
        want.extend(pos_lists)
    flat_pos, tfs_out = batch_unpack_positions(bufs, np.concatenate(all_tfs))
    exp = (np.concatenate(want) if sum(len(w) for w in want) else
           np.empty(0, dtype=np.int64))
    assert (flat_pos == exp).all()


def test_batch_pack_ints_matches_per_block():
    from rucene_spark.codec import batch_pack_ints

    rng = np.random.default_rng(17)
    rows, counts = [], []
    for _ in range(60):
        n = int(rng.integers(1, BLOCK_SIZE + 1))
        rows.append(rng.integers(0, 1 << 24, n).astype(np.uint64))
        counts.append(n)
    # include all-equal full blocks (ALL_VALUES_EQUAL path)
    rows.append(np.full(BLOCK_SIZE, 7, dtype=np.uint64))
    counts.append(BLOCK_SIZE)
    got = batch_pack_ints(np.concatenate(rows), np.array(counts))
    want = [pack_ints(r) for r in rows]
    assert got == want


def test_batch_pack_positions_matches_per_block():
    from rucene_spark.codec import batch_pack_positions

    rng = np.random.default_rng(23)
    all_pos, all_tfs, docs_per_row, want = [], [], [], []
    for _ in range(40):
        n_docs = int(rng.integers(1, 40))
        tfs = rng.integers(0, 6, n_docs).astype(np.int64)
        pos_lists = [np.sort(rng.choice(500, size=t, replace=False))
                     for t in tfs]
        flat = (np.concatenate(pos_lists).astype(np.uint64) if tfs.sum()
                else np.empty(0, dtype=np.uint64))
        want.append(pack_positions(flat, tfs))
        all_pos.append(flat)
        all_tfs.append(tfs)
        docs_per_row.append(n_docs)
    got = batch_pack_positions(
        np.concatenate(all_pos), np.concatenate(all_tfs),
        np.array(docs_per_row))
    assert got == want


def test_batch_for_encode_bit_identical_to_scalar():
    from rucene_spark.codec import batch_for_encode, for_encode

    rng = np.random.default_rng(31)
    blocks = [rng.integers(0, 1 << bpv, BLOCK_SIZE).astype(np.uint64)
              | (np.uint64(1) << np.uint64(bpv - 1))  # pin the bit width
              for bpv in range(1, 64) for _ in range(3)]
    blocks += [np.zeros(BLOCK_SIZE, dtype=np.uint64),          # all-equal 0
               np.full(BLOCK_SIZE, 37, dtype=np.uint64),       # all-equal
               np.full(BLOCK_SIZE, (1 << 63) + 5, np.uint64)]  # 10-byte vint
    arr = np.stack(blocks)
    got = batch_for_encode(arr)
    assert got == [for_encode(b) for b in arr]
    # flat input and empty input
    assert batch_for_encode(arr.reshape(-1)) == got
    assert batch_for_encode(np.empty((0, BLOCK_SIZE), np.uint64)) == []


def test_varint_ten_byte_values_roundtrip():
    from rucene_spark.codec import varint_encode_sized, varint_decode
    vals = np.array([0, 1, 127, 128, 16383, 16384, (1 << 56) - 1, 1 << 56,
                     (1 << 63) + 12345, (1 << 64) - 1], dtype=np.uint64)
    buf, nbytes = varint_encode_sized(vals)
    assert nbytes[-1] == 10 and nbytes[0] == 1
    assert (varint_decode(buf.tobytes(), len(vals)) == vals).all()
