"""Progressive (SOF2) JPEG decode — ITU T.81 Annex G successive
approximation. The certifying property: the progressive encoder quantizes
to the SAME integer coefficients as the baseline encoder (identical
per-block FDCT expression), so `decode_jpeg(progressive)` must be
BIT-IDENTICAL to `decode_jpeg(baseline)` of the same image — any error in
any of the four scan decoders (DC first/refine, AC first/refine, EOB runs,
correction bits) breaks the equality.

Reference parity note: the reference repo ships no codecs at all
(Altinity/demo-otel-parquet-antalya is compose + SQL); this tier is a
beyond-reference extension for multimodal training-data pipelines.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from demo_otel_parquet_antalya_spark.operators.multimodal import (
    decode_jpeg,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
    image_pixel_stats,
)


def _prog_equals_baseline(img: np.ndarray) -> None:
    base = decode_jpeg(encode_jpeg_baseline(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    np.testing.assert_array_equal(base, prog)


def test_random_images_decode_identically_across_shapes():
    rng = np.random.default_rng(11)
    for shape in [(8, 8), (16, 16), (13, 21), (16, 16, 3), (24, 17, 3),
                  (5, 5), (64, 64), (64, 64, 3), (1, 1), (7, 120, 3)]:
        _prog_equals_baseline(rng.integers(0, 256, shape, dtype=np.uint8))


def test_structured_images_hammer_eob_runs_and_zrl():
    """Flat and gradient images produce long zero runs / sparse high-band
    coefficients — the EOB-run (EOBn), ZRL, and correction-bit paths."""
    _prog_equals_baseline(np.full((40, 40), 128, dtype=np.uint8))
    _prog_equals_baseline(np.tile(np.arange(64, dtype=np.uint8), (64, 1)))
    _prog_equals_baseline(np.outer(np.arange(32), np.arange(32)).astype(np.uint8))
    # isolated outlier: one huge coefficient in a sea of zeros, many blocks
    # fully zero on either side -> cross-block EOB runs with buffered
    # correction bits
    img = np.full((48, 48), 100, dtype=np.uint8)
    img[20, 20] = 255
    img[3, 40] = 0
    _prog_equals_baseline(img)


def test_constant_blocks_are_pixel_exact():
    """Constant 8x8 blocks carry DC-only energy, which flat quantization
    preserves exactly — the closed-form contract the SQL oracle of
    multimodal_image_stats_mixed relies on."""
    img = np.empty((16, 16), dtype=np.uint8)
    for k in range(4):
        by, bx = divmod(k, 2)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (7 * 31 + k * 17) % 256
    out = decode_jpeg(encode_jpeg_progressive(img))
    np.testing.assert_array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
def test_hypothesis_round_trip_equals_baseline(h, w, color, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    _prog_equals_baseline(rng.integers(0, 256, shape, dtype=np.uint8))


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1), st.data())
def test_hypothesis_truncation_never_crashes(seed, data):
    """Truncation anywhere must either raise ValueError or return a
    partial-scan image of the full frame size (progressive renders
    progressively by design: every complete scan is displayable) — never
    IndexError/KeyError, never a wrong-shaped array."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    payload = encode_jpeg_progressive(img)
    cut = data.draw(st.integers(2, len(payload) - 1))
    try:
        out = decode_jpeg(payload[:cut])
    except ValueError:
        return
    assert out.shape[:2] == (16, 24)


def test_partial_scans_are_displayable_and_converge():
    """Cutting after each scan boundary yields a coarser-but-valid image;
    the DC-only prefix is within quantization coarseness of the block
    means, and the full file is exact vs baseline."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    payload = encode_jpeg_progressive(img)
    # find every scan's SOS; cut right before the SECOND SOS = DC-first only
    sos_positions = []
    i = 0
    while True:
        i = payload.find(b"\xff\xda", i + 1)
        if i < 0:
            break
        sos_positions.append(i)
    assert len(sos_positions) == 4  # gray: DC first, AC first, DC ref, AC ref
    dc_only = decode_jpeg(payload[: sos_positions[1]])
    assert dc_only.shape == (16, 16)
    # DC-first at Al=1: each 8x8 block is constant, within ~2+rounding of
    # the block's true mean
    means = img.reshape(2, 8, 2, 8).mean(axis=(1, 3))
    got = dc_only.reshape(2, 8, 2, 8)
    assert np.abs(got - got.mean(axis=(1, 3), keepdims=True)).max() == 0
    assert np.abs(got.mean(axis=(1, 3)) - means).max() <= 3
    full = decode_jpeg(payload)
    np.testing.assert_array_equal(full, decode_jpeg(encode_jpeg_baseline(img)))


def test_420_subsampling_decodes_identically():
    """4:2:0 (the dominant real-world layout): luma at 2x2 sampling
    factors, chroma 2x2-mean downsampled. The component coefficient
    grids then DIFFER from the MCU grid, exercising the non-interleaved
    AC scan geometry — progressive and baseline must still decode
    bit-identically (same planes, same per-block FDCT rounding)."""
    rng = np.random.default_rng(33)
    for shape in [(16, 16, 3), (24, 17, 3), (13, 21, 3), (40, 28, 3), (9, 9, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg_baseline(img, subsampling="420"))
        prog = decode_jpeg(encode_jpeg_progressive(img, subsampling="420"))
        np.testing.assert_array_equal(base, prog)
    # constant-chroma content survives 4:2:0 within rounding
    g = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    img = np.stack([g] * 3, axis=-1)
    d = decode_jpeg(encode_jpeg_baseline(img, subsampling="420")).astype(int)
    assert np.abs(d - img).max() <= 1


def test_restart_markers_resync_in_every_scan_type():
    """DRI + RSTn in progressive scans: DC predictors and EOB runs reset
    at each marker, segments byte-aligned — decode must equal the
    restart-free encode of the same image (both carry identical
    coefficients), in 4:4:4 and 4:2:0, gray and color."""
    rng = np.random.default_rng(34)
    for shape, sub in [((24, 40), "444"), ((16, 24, 3), "444"), ((16, 24, 3), "420")]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        want = decode_jpeg(encode_jpeg_progressive(img, subsampling=sub))
        for r in (1, 2, 7):
            got = decode_jpeg(
                encode_jpeg_progressive(img, restart_interval=r, subsampling=sub)
            )
            np.testing.assert_array_equal(got, want)
            base = decode_jpeg(
                encode_jpeg_baseline(img, restart_interval=r, subsampling=sub)
            )
            np.testing.assert_array_equal(base, want)


@settings(max_examples=60, deadline=None)
@given(st.integers(2, 10_000), st.sampled_from([0x01, 0x80, 0xFF]), st.booleans())
def test_byte_flip_fuzz_never_escapes_valueerror(pos, flip, progressive):
    """Any single corrupted byte must yield ValueError or a decodable
    uint8 image — never IndexError/KeyError/OverflowError/ZeroDivision
    (the per-payload degrade contract of every Spark stage rides on
    this)."""
    rng = np.random.default_rng(35)
    img = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    enc = encode_jpeg_progressive if progressive else encode_jpeg_baseline
    payload = bytearray(enc(img))
    m = bytearray(payload)
    m[pos % (len(m) - 2) + 2] ^= flip
    try:
        out = decode_jpeg(bytes(m))
    except ValueError:
        return
    assert out.dtype == np.uint8


def test_spark_image_stats_decode_progressive_payloads(spark):
    """The Spark pixel-stats stage must route progressive payloads through
    the real SOF2 decoder: exact stats on a constant-block image are only
    possible via a correct decode."""
    img = np.empty((16, 16), dtype=np.uint8)
    vals = []
    for k in range(4):
        by, bx = divmod(k, 2)
        v = (5 * 31 + k * 17) % 256
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
        vals.append(v)
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg_progressive(img)))],
        "media_id long, payload binary",
    )
    st_ = image_pixel_stats(df).collect()[0]
    assert (st_.width, st_.height) == (16, 16)
    assert st_.mean_px == pytest.approx(sum(vals) / 4)
    assert (st_.min_px, st_.max_px) == (min(vals), max(vals))
