"""Real container-header parsing (round-5): struct-level BMP/PNG/WAV.

The fabricators emit VALID containers (PNG chunk CRCs + genuine zlib
stored-block IDAT with correct Adler-32; BMP 4-byte row padding; WAV RIFF
size chain) and parse_container walks the actual byte layouts back.
Golden-byte, round-trip, malformed-input, and Spark-path cases.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from rucene_spark import multimodal as mm


# --- golden byte layouts -------------------------------------------------


def test_bmp_golden_header():
    blob = mm.fabricate_bmp(3, 2)
    # BITMAPFILEHEADER: magic, file size, reserved, pixel offset
    assert blob[:2] == b"BM"
    size, = struct.unpack_from("<I", blob, 2)
    assert size == len(blob)
    offset, = struct.unpack_from("<I", blob, 10)
    assert offset == 54
    # stride for width=3 @24bpp: 3*3=9 -> padded to 12; 2 rows
    assert len(blob) == 54 + 12 * 2
    meta = mm.parse_container(blob)
    assert meta["format"] == "bmp"
    assert (meta["width"], meta["height"]) == (3, 2)


def test_bmp_top_down_negative_height():
    blob = bytearray(mm.fabricate_bmp(4, 5))
    struct.pack_into("<i", blob, 22, -5)  # top-down DIB: height < 0
    meta = mm.parse_container(bytes(blob))
    assert meta["height"] == 5


def test_png_is_a_real_png():
    blob = mm.fabricate_png(7, 4)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR payload: width, height, bit depth 8, color type 0 (grayscale)
    w, h, depth, ctype = struct.unpack_from(">IIBB", blob, 16)
    assert (w, h, depth, ctype) == (7, 4, 8, 0)
    # the IDAT zlib stream must inflate to the raw scanlines
    idat_len, = struct.unpack_from(">I", blob, 33)
    idat = blob[41:41 + idat_len]
    assert zlib.decompress(idat) == b"\x00" * (4 * (7 + 1))
    meta = mm.parse_container(blob)
    assert (meta["format"], meta["width"], meta["height"]) == ("png", 7, 4)


def test_png_crc_verification_rejects_corruption():
    blob = bytearray(mm.fabricate_png(7, 4))
    blob[16] ^= 0xFF  # flip a width byte inside IHDR -> CRC mismatch
    with pytest.raises(mm.ContainerError, match="CRC"):
        mm.parse_container(bytes(blob))


def test_wav_golden_header():
    blob = mm.fabricate_wav(16000, 2, 250)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    riff_size, = struct.unpack_from("<I", blob, 4)
    assert riff_size == len(blob) - 8
    meta = mm.parse_container(blob)
    assert meta["format"] == "wav"
    assert meta["sample_rate"] == 16000
    assert meta["channels"] == 2
    assert meta["duration_ms"] == 250 * 1000 // 16000


def test_wav_odd_chunk_word_alignment():
    # a 3-byte LIST chunk before fmt must be skipped with pad byte
    inner = mm.fabricate_wav(8000, 1, 100)
    body = (b"WAVE" + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
            + inner[12:])
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    meta = mm.parse_container(blob)
    assert meta["sample_rate"] == 8000


def test_malformed_inputs():
    with pytest.raises(mm.ContainerError, match="magic"):
        mm.parse_container(b"GIF89a\x00\x00")
    with pytest.raises(mm.ContainerError, match="truncated"):
        mm.parse_container(b"BM" + b"\x00" * 20)
    with pytest.raises(mm.ContainerError, match="truncated"):
        mm.parse_container(mm.fabricate_png(7, 4)[:20])
    with pytest.raises(mm.ContainerError, match="missing"):
        mm.parse_container(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_decode_media_remains_a_seam():
    with pytest.raises(NotImplementedError):
        mm.decode_media(mm.fabricate_png(2, 2))


# --- fabrication <-> oracle formula agreement ----------------------------


@pytest.mark.parametrize("doc_id,n_chars", [(0, 10), (1, 300), (2, 61),
                                            (3, 0), (7, 122), (44, 999)])
def test_blob_size_matches_oracle_formula(doc_id, n_chars):
    p = mm._fab_params(doc_id, n_chars)
    blob = mm.fabricate_blob(doc_id, n_chars)
    meta = mm.parse_container(blob)
    assert meta["format"] == p["format"]
    if p["format"] == "bmp":
        assert len(blob) == 54 + (3 * p["width"] + 3) // 4 * 4 * p["height"]
        assert meta["width"] == p["width"]
    elif p["format"] == "png":
        assert len(blob) == 68 + p["height"] * (p["width"] + 1)
        assert meta["height"] == p["height"]
    else:
        assert len(blob) == 44 + p["n_samples"] * p["channels"] * 2
        assert meta["duration_ms"] == (
            p["n_samples"] * 1000 // p["sample_rate"])


# --- Spark path ----------------------------------------------------------


def test_extract_container_meta_spark(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}", 50 + i * 13) for i in range(9)],
        "doc_id long, text string, n_chars int")
    rows = {r["doc_id"]: r for r in mm.extract_container_meta(df).collect()}
    assert len(rows) == 9
    assert rows[0]["format"] == "bmp" and rows[0]["sample_rate"] is None
    assert rows[1]["format"] == "png" and rows[1]["width"] == (50 + 13) % 61 + 1
    assert rows[2]["format"] == "wav" and rows[2]["channels"] == 1
    assert rows[5]["channels"] == 2
