"""Image-level deduplication for multimodal corpora.

The text tier dedups documents (exact md5, MinHash/LSH, SimHash, …); this
module is its IMAGE twin, built on the repo's pure-stdlib codecs — the
operation a LAION-style multimodal curation pipeline runs before
training:

- ``image_pixel_fingerprint``: decode (PNG/GIF/JPEG/WebP) -> canonical
  gray plane -> md5. EXACT dedup that sees through the CONTAINER: the
  same picture stored as a JPEG and as a WebP lands in one group
  (oracle-certified by ``multimodal_dedup_exact_pixels`` — the
  synthesizer alternates formats within each duplicate class).
- ``image_dhash``: the difference hash (dHash) — resize the gray plane
  to (hash_size+1) x hash_size, emit one bit per horizontal gradient
  sign. Robust to re-encoding and small edits; 64 bits at the default
  size.
- ``near_dup_image_pairs``: hamming-radius self-join over dHashes via
  PIGEONHOLE banding (hamming <= k ==> at least one of k+1 disjoint bit
  bands is equal), the SimHash blocking idiom: candidate generation is
  an equi-join on (band, band_bits) — shuffle keyed on short hashes,
  never an all-pairs comparison — and the exact ``bit_count(a XOR b)``
  verify runs JVM-side on the candidate sliver only.

Scale posture: fingerprint/dHash are one Arrow-batched ``mapInPandas``
pass over wherever the payload rows live (O(pixels) per row, zero
shuffle); the near-dup join shuffles (band, key) pairs — (k+1) rows per
image — and is quadratic only within identical band buckets, the LSH
cost model. Undecodable payloads degrade to NULL hashes
(quarantine-friendly), never fail the task.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.operators.multimodal import (
    PNG_SIGNATURE,
    decode_gif,
    decode_jpeg,
    decode_png,
    decode_webp,
    resize_nearest,
)

FINGERPRINT_SCHEMA = "media_id long, pixel_md5 string, width int, height int"
DHASH_SCHEMA = "media_id long, dhash long"


def _build_gray_decoder():
    """Factory so the function's ``<locals>`` qualname makes cloudpickle
    ship it BY VALUE into worker closures (the codec convention —
    executors never need this package importable)."""

    def decode_gray(b: bytes):
        """payload bytes -> canonical gray plane (2D uint8) or None.

        Multi-channel images canonicalize to the GREEN channel:
        integer-exact and deterministic (a float luma would make 'exact
        pixel dedup' depend on rounding), identical to the gray plane
        wherever r==g==b (every gray source, whichever container it was
        stored in), and green dominates luma anyway. ValueError
        (corrupt/truncated/bomb-guarded) propagates to the caller's
        per-payload handler."""
        if b[:8] == PNG_SIGNATURE:
            img = decode_png(b)
        elif b[:2] == b"\xff\xd8":
            img = decode_jpeg(b)
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            img = decode_gif(b)
        elif len(b) >= 16 and b[:4] == b"RIFF" and b[8:12] == b"WEBP":
            img = decode_webp(b)
        else:
            return None
        if img.ndim == 2:
            return img
        if img.shape[2] <= 2:  # gray / gray+alpha: channel 0 IS the gray
            return img[..., 0].copy()
        return img[..., 1].copy()

    return decode_gray


_decode_gray = _build_gray_decoder()


def image_pixel_fingerprint(media: DataFrame) -> DataFrame:
    """(media_id, pixel_md5, width, height): md5 over the canonical gray
    plane (dimensions folded into the hash so equal byte streams of
    different shapes never collide). Identical PICTURES get identical
    fingerprints regardless of container format — the exact-dedup key for
    an image corpus. Undecodable payloads -> NULL fingerprint."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def fp(payload):
            if payload is None:
                return None, None, None
            try:
                gray = _decode_gray(bytes(payload))
            except ValueError:
                return None, None, None
            if gray is None:
                return None, None, None
            h, w = gray.shape
            digest = hashlib.md5(
                f"{h}x{w}:".encode() + gray.tobytes()
            ).hexdigest()
            return digest, w, h

        for pdf in batches:
            rows = [fp(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "pixel_md5": [r[0] for r in rows],
                    "width": _pd.array([r[1] for r in rows], dtype="Int32"),
                    "height": _pd.array([r[2] for r in rows], dtype="Int32"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FINGERPRINT_SCHEMA)


def image_dhash(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """(media_id, dhash): the difference hash — gray plane resized to
    (hash_size+1) x hash_size with the deterministic nearest-neighbor
    resample, one bit per horizontal gradient sign (row-major, bit 0 =
    top-left comparison). hash_size=8 -> 64 bits, stored as a signed
    long (two's complement). Undecodable payloads -> NULL."""
    if hash_size * hash_size > 64:
        raise ValueError("dhash must fit a 64-bit long (hash_size <= 8)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def dhash(payload):
            if payload is None:
                return None
            try:
                gray = _decode_gray(bytes(payload))
            except ValueError:
                return None
            if gray is None:
                return None
            small = resize_nearest(gray, hash_size + 1, hash_size)
            v = 0
            bit = 0
            for y in range(hash_size):
                row = small[y]
                for x in range(hash_size):
                    if int(row[x + 1]) > int(row[x]):
                        v |= 1 << bit
                    bit += 1
            if v >= 1 << 63:  # two's complement into a signed long column
                v -= 1 << 64
            return v

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": _pd.array(
                        [dhash(p) for p in pdf["payload"]], dtype="Int64"
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, DHASH_SCHEMA)


def near_dup_image_pairs(
    hashes: DataFrame, max_hamming: int = 6, id_col: str = "media_id"
) -> DataFrame:
    """(a_id, b_id, hamming): every pair of images whose dHashes differ in
    at most ``max_hamming`` bits, via pigeonhole banding — EXACT for the
    radius (hamming <= k guarantees >= 1 of the k+1 disjoint bands is
    equal, so banding loses nothing; the bit_count verify then drops the
    band-collision false candidates). All JVM-side column expressions:
    band extraction is shift/mask arithmetic, the verify is
    bit_count(XOR) on the candidate sliver."""
    bands = max_hamming + 1
    bounds = [(i * 64) // bands for i in range(bands + 1)]
    band_structs = []
    for i in range(bands):
        lo, hi = bounds[i], bounds[i + 1]
        band_structs.append(
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("dhash"), lo)
                .bitwiseAND(F.lit((1 << (hi - lo)) - 1))
                .alias("key"),
            )
        )
    exploded = (
        hashes.filter(F.col("dhash").isNotNull())
        .select(
            F.col(id_col).alias("id"),
            "dhash",
            F.explode(F.array(*band_structs)).alias("b"),
        )
        # eager hinge (r14): the self-join's two sides are the same
        # subtree, and a broadcast plan has no exchange to reuse between
        # them — without this, the upstream ``hashes`` frame (an Arrow
        # mapInPandas image DECODE when fed from image_dhash) evaluates
        # twice per call; the checkpoint is (id, hash, band) rows only,
        # never pixels
        .localCheckpoint(eager=True)
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.bit_count(
                F.col("a.dhash").bitwiseXOR(F.col("b.dhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return cand
