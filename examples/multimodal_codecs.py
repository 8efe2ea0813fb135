#!/usr/bin/env python
"""The multimodal codec tier, end to end — every decode step real.

    python examples/multimodal_codecs.py

The pure-stdlib codecs (no PIL / torchaudio / ffmpeg anywhere):

1. PNG    — zlib inflate + per-spec scanline unfilter (lossless).
2. JPEG   — baseline SOF0 + progressive SOF2: canonical Huffman, dequant,
            orthonormal IDCT, chroma upsampling, BT.601.
3. GIF    — full LZW (variable widths, 12-bit cap), palettes, deinterlace
            (lossless); APNG/GIF animations composite per spec.
4. WAV    — RIFF chunk walk + PCM 8/16/32-bit / float32 sample decode.
5. AVI    — MJPEG demux (every frame chunk a standalone JPEG) and
            uncompressed BI_RGB 'DIB ' row unpacking (r8).
6. WebP   — lossless VP8L (r8): LSB-first prefix codes, color cache,
            LZ77, and all four inverse transforms (14 predictor modes,
            cross-color, subtract-green, color indexing).

Each chain is ALSO certified against a DuckDB oracle by the registered
queries (`multimodal_image_stats_mixed`, `multimodal_image_stats_webp`,
`multimodal_audio_features`, `multimodal_video_frame_stats_mixed`):
payloads are synthesized from closed forms on doc_id, so SQL recomputes
the decoded features with no codec — a value match proves the
encode->decode chain sample/pixel-exactly. All decoders are
decompression-bomb bounded (max_pixels + bounded inflate).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from demo_otel_parquet_antalya_spark.operators import multimodal as mm
from demo_otel_parquet_antalya_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="multimodal_codecs_example")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(7)

    # one payload per format, all hand-synthesized
    img = rng.integers(0, 256, (32, 24, 3), dtype=np.uint8)
    gray = rng.integers(0, 4, (16, 16), dtype=np.uint8) * 80
    pcm = (np.sin(np.arange(4000) / 20) * 20000).astype("<i2")
    frames = [
        mm.encode_jpeg_baseline(np.full((16, 16), 40 * (f + 1), dtype=np.uint8))
        for f in range(5)
    ]
    rows = [
        (1, bytearray(mm.encode_png(img))),
        (2, bytearray(mm.encode_jpeg_baseline(img))),
        (3, bytearray(mm.encode_gif(gray))),
        (4, bytearray(mm.encode_wav_pcm16(pcm, 16000))),
        (5, bytearray(mm.encode_avi_mjpeg(frames, fps=10, width=16, height=16))),
        # r8: transform-bearing lossless WebP (subtract-green + predictor)
        (6, bytearray(mm.encode_webp_lossless(img, predictor_mode=7,
                                              subtract_green=True))),
        # r8: uncompressed BI_RGB video — lossless frames, no JPEG
        (7, bytearray(mm.encode_avi_dib(
            [np.full((16, 16, 3), 30 * (f + 1), np.uint8) for f in range(3)],
            fps=10, width=16, height=16))),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")

    print("== container headers (image / audio / video) ==")
    mm.parse_image_headers(media).show()
    mm.parse_audio_headers(media).show()
    mm.parse_video_headers(media).show()

    print("== pixel stats (PNG + JPEG + GIF + WebP decode to pixels) ==")
    mm.image_pixel_stats(media).show()

    print("== audio features (WAV PCM sample decode) ==")
    mm.audio_features(media).show()

    print("== video frame stats (MJPEG + DIB AVI frame decode) ==")
    mm.video_frame_stats(media).show()

    print("== resize (each image format re-encoded in its own format) ==")
    mm.resize(media, 8, 8).show()

    print("== frame sampling (AVI payloads demux real frames) ==")
    mm.sample_frames(media, max_frames=3).select(
        "media_id", "frame_idx"
    ).show()

    print("== image dedup (r8): exact cross-format + perceptual dHash ==")
    from demo_otel_parquet_antalya_spark.operators import image_dedup as idd

    dup_rows = [
        (10, bytearray(mm.encode_png(gray))),
        (11, bytearray(mm.encode_webp_lossless(gray))),  # same picture!
        (12, bytearray(mm.encode_gif(gray))),            # same picture!
        (13, bytearray(mm.encode_png(img))),             # different
    ]
    dups = spark.createDataFrame(dup_rows, "media_id long, payload binary")
    idd.image_pixel_fingerprint(dups).show(truncate=12)
    idd.near_dup_image_pairs(idd.image_dhash(dups), max_hamming=6).show()

    spark.stop()


if __name__ == "__main__":
    main()
