"""Hypothesis property tests over the pure-stdlib codec tier: the
round-trip contracts hold for ARBITRARY inputs, not just the fixed seeds
in the per-codec test files. Lossless codecs (PNG, GIF, WAV, AVI demux)
must be exact; JPEG (flat quant) within +/-1 per sample."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from demo_otel_parquet_antalya_spark.operators.multimodal import (
    decode_avi_frames,
    decode_gif,
    decode_jpeg,
    decode_png,
    decode_wav,
    encode_avi_mjpeg,
    encode_gif,
    encode_jpeg_baseline,
    encode_png,
    encode_wav_pcm16,
)

_dims = st.integers(min_value=1, max_value=24)


@settings(max_examples=25, deadline=None)
@given(
    img=st.tuples(_dims, _dims, st.sampled_from([1, 3, 4])).flatmap(
        lambda s: arrays(np.uint8, (s[0], s[1], s[2]))
    )
)
def test_png_round_trip_exact(img):
    out = decode_png(encode_png(img))
    np.testing.assert_array_equal(out, img if img.ndim == 3 else img[:, :, None])


@settings(max_examples=25, deadline=None)
@given(
    h=_dims, w=_dims,
    ncol=st.integers(min_value=1, max_value=256),
    data=st.data(),
)
def test_gif_round_trip_exact(h, w, ncol, data):
    pal = data.draw(arrays(np.uint8, (ncol, 3)))
    idx = data.draw(arrays(np.int64, (h, w), elements=st.integers(0, ncol - 1)))
    img = pal[idx]
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


@settings(max_examples=50, deadline=None)
@given(img=st.tuples(_dims, _dims).flatmap(lambda s: arrays(np.uint8, s)))
def test_jpeg_gray_round_trip_within_rounding_bound(img):
    """Flat-quant JPEG error = T^T E T with |E| <= 0.5 per coefficient, so
    the worst-case per-pixel bound is 0.5 * (sum_u |T_u,i|)^2 < 4 — hit
    only by adversarial single-outlier blocks (hypothesis found one at
    +/-2; typical images stay within +/-1, pinned in test_jpeg_codec)."""
    out = decode_jpeg(encode_jpeg_baseline(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


@settings(max_examples=25, deadline=None)
@given(
    samples=st.tuples(
        st.integers(min_value=1, max_value=500),
        st.integers(min_value=1, max_value=3),
    ).flatmap(
        lambda s: arrays(
            np.int16, s, elements=st.integers(-32768, 32767)
        )
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_round_trip_exact(samples, rate):
    got, got_rate = decode_wav(encode_wav_pcm16(samples, rate))
    assert got_rate == rate
    np.testing.assert_array_equal(got, samples.astype(np.float64) / 32768.0)


@settings(max_examples=15, deadline=None)
@given(
    frames=st.lists(
        st.tuples(_dims, _dims).flatmap(lambda s: arrays(np.uint8, s)),
        min_size=1,
        max_size=6,
    ),
    fps=st.integers(min_value=1, max_value=60),
)
def test_avi_demux_returns_frames_verbatim(frames, fps):
    jpegs = [encode_jpeg_baseline(f) for f in frames]
    got, got_fps = decode_avi_frames(
        encode_avi_mjpeg(jpegs, fps=fps, width=16, height=16)
    )
    assert got == jpegs and got_fps == fps
