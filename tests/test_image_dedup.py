"""Image-level dedup (operators/image_dedup.py): exact cross-format
fingerprinting and perceptual (dHash) near-dup search with pigeonhole
hamming banding — the image twin of the text dedup tier."""

from __future__ import annotations

import numpy as np
import pytest

from demo_otel_parquet_antalya_spark.operators import image_dedup as idd
from demo_otel_parquet_antalya_spark.operators import multimodal as mm


def _df(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, payload binary",
    )


def test_fingerprint_sees_through_the_container(spark):
    """The same picture as PNG, GIF, lossless WebP (plain AND
    transform-bearing), and block-constant JPEG must land in ONE group;
    a different picture and an undecodable payload must not."""
    img = np.zeros((16, 16), np.uint8)
    for k in range(4):
        by, bx = divmod(k, 2)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 40 + 50 * k
    other = img.copy()
    other[0, 0] ^= 1
    payloads = [
        mm.encode_png(img),
        mm.encode_gif(img),
        mm.encode_webp_lossless(img),
        mm.encode_webp_lossless(img, predictor_mode=9, subtract_green=True),
        mm.encode_jpeg_baseline(img),  # exact: constant blocks, flat quant
        mm.encode_png(other),
        b"not an image at all",
    ]
    rows = {r.media_id: r for r in idd.image_pixel_fingerprint(_df(spark, payloads)).collect()}
    same = {rows[i].pixel_md5 for i in range(5)}
    assert len(same) == 1 and None not in same
    assert rows[5].pixel_md5 not in same
    assert rows[6].pixel_md5 is None
    assert (rows[0].width, rows[0].height) == (16, 16)


def test_fingerprint_dims_are_part_of_the_hash(spark):
    """Equal byte streams of different shapes must not collide."""
    flat = np.arange(64, dtype=np.uint8)
    a = mm.encode_png(flat.reshape(8, 8))
    b = mm.encode_png(flat.reshape(4, 16))
    rows = {r.media_id: r.pixel_md5 for r in idd.image_pixel_fingerprint(_df(spark, [a, b])).collect()}
    assert rows[0] != rows[1]


def test_dhash_properties(spark):
    """Identical pictures hash identically across formats; a small patch
    edit moves few bits; an unrelated picture moves many."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    patched = img.copy()
    patched[10:14, 10:14] = (patched[10:14, 10:14].astype(np.int64) + 16) % 256
    unrelated = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    payloads = [
        mm.encode_png(img),
        mm.encode_webp_lossless(img),
        mm.encode_png(patched),
        mm.encode_png(unrelated),
        b"junk",
    ]
    h = {r.media_id: r.dhash for r in idd.image_dhash(_df(spark, payloads)).collect()}
    assert h[0] == h[1]  # format-independent
    near = bin((h[0] ^ h[2]) & ((1 << 64) - 1)).count("1")
    far = bin((h[0] ^ h[3]) & ((1 << 64) - 1)).count("1")
    assert near <= 8 < far
    assert h[4] is None


def test_near_dup_pairs_exact_within_radius(spark):
    """Pigeonhole banding is exact for the radius: hand-built hashes at
    known hamming distances are found iff within max_hamming, with the
    verified distance reported."""
    base = 0x0F0F0F0F0F0F0F0F
    h3 = base ^ 0b10101  # hamming 3
    h9 = base ^ ((1 << 40) - (1 << 31))  # hamming 9
    df = spark.createDataFrame(
        [(1, base - (1 << 64) if base >= 1 << 63 else base),
         (2, h3 - (1 << 64) if h3 >= 1 << 63 else h3),
         (3, h9 - (1 << 64) if h9 >= 1 << 63 else h9),
         (4, None)],
        "media_id long, dhash long",
    )
    pairs = {(r.a_id, r.b_id): r.hamming for r in idd.near_dup_image_pairs(df, max_hamming=6).collect()}
    assert pairs == {(1, 2): 3}


def test_neardup_corpus_answer_is_exactly_the_twins(spark):
    """The synthesized corpus's radius-6 answer must be exactly the
    (even, odd) twin pairs — the invariant the SQL oracle replays."""
    ids = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    hashes = idd.image_dhash(mm.synthesize_image_media_neardup(ids))
    pairs = {(r.a_id, r.b_id) for r in idd.near_dup_image_pairs(hashes, max_hamming=6).collect()}
    assert pairs == {(d, d + 1) for d in range(0, 120, 2)}


def test_crossformat_corpus_groups_by_residue_class(spark):
    """The cross-format synthesizer's duplicate classes are doc_id % 256,
    spanning WebP and JPEG members — the invariant the oracle replays."""
    ids = spark.range(200, 600).withColumnRenamed("id", "doc_id")  # 2 pages
    fp = idd.image_pixel_fingerprint(mm.synthesize_image_media_crossformat(ids))
    rows = fp.collect()
    by_hash: dict = {}
    for r in rows:
        by_hash.setdefault(r.pixel_md5, []).append(r.media_id)
    for members in by_hash.values():
        assert len({m % 256 for m in members}) == 1
        # classes with two members span the page boundary -> two formats
        if len(members) == 2:
            assert {m >> 8 for m in members} == {0, 1} or {m >> 8 for m in members} == {1, 2}
