"""APNG (animated PNG) codec: acTL/fcTL/fdAT chunk layer over the PNG
codec, with the APNG compositing model — per-frame DISPOSE (none /
background / previous) and BLEND (source / over with straight alpha).
The third real animated container next to GIF and MJPEG-AVI, and the only
one with true alpha compositing.

Reference parity note: the reference repo ships no codecs; this is a
beyond-reference extension of the multimodal tier."""

from __future__ import annotations

import numpy as np
import pytest

from demo_otel_parquet_antalya_spark.operators.multimodal import (
    decode_apng_frames,
    decode_png,
    encode_apng,
    encode_png,
    is_apng,
)


def _rgba(v, a=255, shape=(8, 8)):
    out = np.zeros(shape + (4,), dtype=np.uint8)
    out[..., :3] = v
    out[..., 3] = a
    return out


def test_round_trip_full_canvas_frames():
    rng = np.random.default_rng(6)
    frames = [
        np.concatenate(
            [rng.integers(0, 256, (10, 12, 3), dtype=np.uint8),
             np.full((10, 12, 1), 255, np.uint8)], axis=-1,
        )
        for _ in range(3)
    ]
    payload = encode_apng(frames, delay_ms=80)
    assert is_apng(payload)
    got, delays = decode_apng_frames(payload)
    assert delays == [80, 80, 80]
    for g, want in zip(got, frames):
        np.testing.assert_array_equal(g, want)


def test_static_png_is_not_apng():
    png = encode_png(np.full((4, 4), 7, np.uint8))
    assert not is_apng(png)
    with pytest.raises(ValueError, match="acTL"):
        decode_apng_frames(png)


def test_dispose_ops_compose_like_gif():
    """dispose 2 (previous) restores the rect to its pre-frame state;
    dispose 1 (background) clears it to fully TRANSPARENT (unlike GIF's
    background color) — the next full-alpha patch must show base pixels
    after dispose-previous, transparent black after dispose-background."""
    base = _rgba(200)
    patch = _rgba(40, shape=(4, 4))
    dot = _rgba(90, shape=(2, 2))
    frames, _ = decode_apng_frames(
        encode_apng([base, patch, dot], offsets=[(0, 0), (2, 2), (0, 0)],
                    disposes=[0, 2, 0], screen=(8, 8))
    )
    want1 = base.copy(); want1[2:6, 2:6] = patch[0, 0]
    np.testing.assert_array_equal(frames[1], want1)
    want2 = base.copy(); want2[0:2, 0:2] = dot[0, 0]
    np.testing.assert_array_equal(frames[2], want2)  # rect reverted to base

    frames_bg, _ = decode_apng_frames(
        encode_apng([base, patch, dot], offsets=[(0, 0), (2, 2), (0, 0)],
                    disposes=[0, 1, 0], screen=(8, 8))
    )
    # after dispose-background the patch rect is transparent black
    assert (frames_bg[2][2:6, 2:6] == 0).all()


def test_blend_over_with_binary_alpha_keeps_canvas():
    """blend 'over' with alpha-0 pixels must leave the canvas unchanged;
    alpha-255 pixels replace — exact by the compositing equation."""
    base = _rgba(100)
    patch = _rgba(250, shape=(4, 4))
    patch[::2, ::2, 3] = 0  # transparent holes
    frames, _ = decode_apng_frames(
        encode_apng([base, patch], offsets=[(0, 0), (2, 2)],
                    blends=[0, 1], screen=(8, 8))
    )
    rect = frames[1][2:6, 2:6]
    holes = patch[..., 3] == 0
    assert (rect[holes] == base[0, 0]).all()
    assert (rect[~holes, 0] == 250).all()


def test_blend_over_fractional_alpha_matches_equation():
    """Straight-alpha 'over' at alpha 128 over an opaque canvas:
    out = src*a + dst*(1-a), a = 128/255 — checked to the rounding ulp."""
    base = _rgba(100)
    patch = _rgba(200, a=128, shape=(8, 8))
    frames, _ = decode_apng_frames(
        encode_apng([base, patch], blends=[0, 1], screen=(8, 8))
    )
    a = 128 / 255
    want = round(200 * a + 100 * (1 - a))
    assert abs(int(frames[1][4, 4, 0]) - want) <= 1
    assert frames[1][4, 4, 3] == 255  # opaque over opaque stays opaque


def test_first_frame_must_cover_canvas_and_truncation_raises():
    with pytest.raises(ValueError, match="full-canvas"):
        encode_apng([_rgba(1, shape=(2, 2))], screen=(8, 8), offsets=[(1, 1)])
    good = encode_apng([_rgba(5), _rgba(9)])
    # cuts into IHDR, acTL, and the last fdAT body (len-6 would only shave
    # the IEND trailer, which is harmless — every frame byte is present)
    for cut in (20, 40, len(good) - 20):
        with pytest.raises(ValueError):
            decode_apng_frames(good[:cut])


def test_sample_frames_routes_apng(spark):
    from demo_otel_parquet_antalya_spark.operators.multimodal import sample_frames

    frames = [_rgba(10), _rgba(60), _rgba(200)]
    payload = encode_apng(frames)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    rows = sample_frames(df, max_frames=8, decode_stub=False).collect()
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    for r, want in zip(rows, frames):
        np.testing.assert_array_equal(decode_png(bytes(r.frame)), want)
