"""GIF pixel codec: full LZW decode/encode, palettes, interlace. GIF is
LOSSLESS, so every round trip must be byte-for-byte pixel-exact — the
strongest codec contract in the multimodal tier."""

from __future__ import annotations

import numpy as np
import pytest

from demo_otel_parquet_antalya_spark.operators.multimodal import (
    decode_gif,
    encode_gif,
    image_pixel_stats,
    resize,
)


def test_round_trip_exact_across_palette_sizes_and_shapes():
    rng = np.random.default_rng(5)
    for h, w, ncol in [(8, 8, 2), (16, 16, 4), (64, 64, 256), (5, 300, 250)]:
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = pal[rng.integers(0, ncol, (h, w))]
        out = decode_gif(encode_gif(img))
        np.testing.assert_array_equal(out, img)


def test_dictionary_cap_and_grayscale():
    """65k pixels of structured data forces LZW through every code width to
    the 12-bit cap and a mid-stream clear; grayscale input comes back as
    its RGB expansion."""
    g = np.tile(np.arange(256, dtype=np.uint8).reshape(16, 16), (16, 16))
    out = decode_gif(encode_gif(g))
    np.testing.assert_array_equal(out, np.stack([g] * 3, axis=-1))


def test_interlaced_gif_decodes_in_display_order():
    """Hand-interlace a known image (GIF 4-pass row order), set the
    interlace flag, and require the decoder to un-shuffle it exactly."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 2, (10, 4)).astype(np.uint8) * 255
    plain = encode_gif(img)
    # image descriptor starts after header(6) + lsd(7) + 2-entry palette
    i = 13 + 3 * 2
    assert plain[i] == 0x2C
    # encode the pixels pre-shuffled into GIF's 4-pass interlace row order,
    # graft that stream onto the original header, set the interlace flag
    order = [r for r in range(0, 10, 8)] + [r for r in range(4, 10, 8)] \
        + [r for r in range(2, 10, 4)] + [r for r in range(1, 10, 2)]
    interlaced = bytearray(plain[:i] + encode_gif(img[order])[i:])
    interlaced[i + 9] |= 0x40
    out = decode_gif(bytes(interlaced))
    np.testing.assert_array_equal(out, np.stack([img] * 3, axis=-1))


def test_too_many_colors_and_malformed_raise():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)  # ~1024 colors
    if len(np.unique(img.reshape(-1, 3), axis=0)) > 256:
        with pytest.raises(ValueError, match="256"):
            encode_gif(img)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"\x89PNG\r\n\x1a\n")


def test_spark_resize_and_stats_route_gif_through_real_codec(spark):
    """A flat GIF resized through the Spark stage must come back as a
    decodable GIF with the same constant pixels, and image_pixel_stats
    must report its exact stats — only possible via the real codec."""
    img = np.full((32, 32, 3), 99, dtype=np.uint8)
    payload = encode_gif(img)
    df = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    row = resize(df, 8, 8).collect()[0]
    np.testing.assert_array_equal(
        decode_gif(bytes(row.payload)), np.full((8, 8, 3), 99, np.uint8)
    )
    st = image_pixel_stats(df).collect()[0]
    assert (st.width, st.height, st.mean_px, st.min_px, st.max_px) == (32, 32, 99.0, 99, 99)


def test_truncated_and_corrupt_streams_raise_valueerror():
    """Truncation anywhere (header, palette, LZW stream) must raise
    ValueError — the contract the Spark stages degrade on — never
    IndexError; and an invalid LZW code is refused, not crashed on."""
    good = encode_gif(np.full((8, 8), 7, dtype=np.uint8))
    for cut in (7, 12, 15, len(good) - 4):
        with pytest.raises(ValueError):
            decode_gif(good[:cut])


def test_animation_round_trip_and_patch_compositing():
    from demo_otel_parquet_antalya_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_animation,
    )

    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 16, (10, 12))] for _ in range(3)]
    got, delays = decode_gif_frames(encode_gif_animation(frames, delay_ms=80))
    assert delays == [80, 80, 80]
    for g, want in zip(got, frames):
        np.testing.assert_array_equal(g, want)

    # compositing: frame 2 differs from frame 1 only inside a 2x3 rect;
    # the decoded canvas must show the update there and frame 1's pixels
    # everywhere else (disposal 1 = leave in place)
    f1 = np.zeros((4, 6), dtype=np.uint8)
    f2 = f1.copy()
    f2[1:3, 2:5] = 255
    got2, _ = decode_gif_frames(encode_gif_animation([f1, f2]))
    np.testing.assert_array_equal(got2[1][1:3, 2:5], np.full((2, 3, 3), 255))
    assert (got2[1][0, :, :] == 0).all()


def test_animation_static_equivalence():
    from demo_otel_parquet_antalya_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_animation,
    )

    # static GIF -> exactly one frame, equal to decode_gif
    img = np.full((5, 7), 42, dtype=np.uint8)
    frames, delays = decode_gif_frames(encode_gif(img))
    assert len(frames) == 1
    np.testing.assert_array_equal(frames[0], decode_gif(encode_gif(img)))

def test_animation_transparency_composites_through():
    """GIF89a binary transparency: pixels of the frame's transparent
    palette index leave the canvas unchanged during compositing (no
    alpha blending exists in GIF — it's a per-pixel keep/replace)."""
    from demo_otel_parquet_antalya_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_animation,
    )

    base = np.full((8, 8, 3), 200, dtype=np.uint8)
    patch = np.full((4, 4, 3), 40, dtype=np.uint8)
    patch[::2, ::2] = 90  # checkerboard: 90 will be the transparent color
    anim = encode_gif_animation(
        [base, patch],
        disposals=[1, 1],
        offsets=[(0, 0), (2, 2)],
        screen=(8, 8),
        transparencies=[None, (90, 90, 90)],
    )
    frames, _ = decode_gif_frames(anim)
    want = base.copy()
    rect = want[2:6, 2:6]
    opaque = (patch != 90).all(axis=-1)
    rect[opaque] = 40  # only the opaque pixels composite
    np.testing.assert_array_equal(frames[0], base)
    np.testing.assert_array_equal(frames[1], want)
    # the transparent positions still show the base color
    assert (frames[1][2:6, 2:6][~opaque] == 200).all()

    # a transparent color absent from the palette is refused at encode
    with pytest.raises(ValueError, match="palette"):
        encode_gif_animation([base, patch], transparencies=[None, (1, 2, 3)],
                             offsets=[(0, 0), (2, 2)], screen=(8, 8),
                             disposals=[1, 1])


def test_animation_disposal_restore_previous():
    """GIF89a disposal 3: after a frame is displayed, its rect reverts to
    what the canvas held BEFORE the frame was drawn — so a later frame
    composites over the pre-disposal-3 state, not over the disposed
    frame's pixels (the discriminating case vs 'leave in place')."""
    from demo_otel_parquet_antalya_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_animation,
    )

    # base is NOT the palette's first (= background) color, so disposal 2
    # (restore background) and disposal 3 (restore previous) are
    # distinguishable in the divergence check below
    base = np.full((8, 8, 3), 200, dtype=np.uint8)  # frame 0: full canvas
    patch = np.full((4, 4, 3), 40, dtype=np.uint8)  # frame 1 at (2,2), disp 3
    dot = np.full((2, 2, 3), 90, dtype=np.uint8)  # frame 2 at (0,0)
    anim = encode_gif_animation(
        [base, patch, dot],
        disposals=[1, 3, 0],
        offsets=[(0, 0), (2, 2), (0, 0)],
        screen=(8, 8),
    )
    frames, _ = decode_gif_frames(anim)
    assert len(frames) == 3
    np.testing.assert_array_equal(frames[0], base)
    want1 = base.copy()
    want1[2:6, 2:6] = 40
    np.testing.assert_array_equal(frames[1], want1)
    # frame 2: the disposal-3 rect reverted to base before 'dot' composited
    want2 = base.copy()
    want2[0:2, 0:2] = 90
    np.testing.assert_array_equal(frames[2], want2)

    # disposal 2 vs 3 diverge on the same byte stream shape: with
    # 'restore background' the rect clears to palette bg, not to base
    anim2 = encode_gif_animation(
        [base, patch, dot],
        disposals=[1, 2, 0],
        offsets=[(0, 0), (2, 2), (0, 0)],
        screen=(8, 8),
    )
    frames2, _ = decode_gif_frames(anim2)
    assert not np.array_equal(frames2[2], frames[2])


def test_sample_frames_routes_animated_gif(spark):
    from demo_otel_parquet_antalya_spark.operators.multimodal import (
        encode_gif_animation,
        sample_frames,
    )

    frames = [np.full((8, 8), v, dtype=np.uint8) for v in (10, 20, 30, 40, 50)]
    payload = encode_gif_animation(frames)
    df = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    got = {r.frame_idx: bytes(r.frame) for r in sample_frames(df, max_frames=2).collect()}
    assert set(got) == {0, 2}
    np.testing.assert_array_equal(
        decode_gif(got[2]), np.full((8, 8, 3), 30, dtype=np.uint8)
    )


def test_decompression_bomb_guards():
    """Declared-dims and LZW-expansion bombs: a ~1 MB LZW stream can
    legally inflate ~4096x, and 16-bit dims allow 4.3G-pixel canvases —
    both bounded before allocation."""
    import struct

    from demo_otel_parquet_antalya_spark.operators.multimodal import (
        decode_gif,
        decode_gif_frames,
    )

    hdr = b"GIF87a" + struct.pack("<HH", 60000, 60000) + bytes([0xF0, 0, 0]) + b"\x00" * 6
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, 60000, 60000) + b"\x00\x02\x01\x00\x00\x3b"
    with pytest.raises(ValueError, match="decompression-bomb"):
        decode_gif(hdr + desc)
    with pytest.raises(ValueError, match="decompression-bomb"):
        decode_gif_frames(hdr + desc)
    # LZW output is capped at the declared pixel budget: a stream that
    # would expand past w*h stops there instead of inflating unbounded
    img = np.zeros((4, 4), dtype=np.uint8)
    ok = encode_gif(img)
    np.testing.assert_array_equal(decode_gif(ok), np.zeros((4, 4, 3), np.uint8))


def test_palette_index_overflow_is_a_value_error():
    """A corrupt GIF whose LZW indices exceed the palette must raise
    ValueError (degrade contract), not escape as a numpy IndexError."""
    import struct

    from demo_otel_parquet_antalya_spark.operators.multimodal import decode_gif

    # 2-entry palette but mcs=7 so LZW emits index 100
    payload = bytearray(b"GIF87a")
    payload += struct.pack("<HHBBB", 1, 1, 0x80, 0, 0)  # 2-entry global palette
    payload += b"\x01\x02\x03\x04\x05\x06"
    payload += struct.pack("<BHHHHB", 0x2C, 0, 0, 1, 1, 0)
    payload.append(7)  # mcs 7: alphabet 0..127
    # LZW stream emitting literal 100: clear(128) then 100 then end(129), 8-bit codes
    acc, n, body = 0, 0, bytearray()
    for code in (128, 100, 129):
        acc |= code << n
        n += 8
        while n >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    payload.append(len(body))
    payload += bytes(body) + b"\x00\x3b"
    with pytest.raises(ValueError, match="palette index"):
        decode_gif(bytes(payload))
