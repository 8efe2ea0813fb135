"""WAV PCM sample codec: sample-exact decode against hand-built canonical
payloads (VERDICT r4 item 6 — the audio slot next to the real RIFF header
walk), plus the Spark-side audio_features op and the closed-form synthesizer
the registry oracle replays in SQL."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from demo_otel_parquet_antalya_spark.operators.multimodal import (
    audio_features,
    decode_wav,
    encode_wav_pcm16,
    synthesize_wav_media,
)


def _wav(raw: bytes, afmt: int, ch: int, rate: int, bits: int) -> bytes:
    fmt = struct.pack("<HHIIHH", afmt, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    if len(raw) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_pcm16_round_trip_mono_and_stereo_is_sample_exact():
    mono = np.array([-32768, -1, 0, 1, 32767], dtype="<i2")
    s, rate = decode_wav(encode_wav_pcm16(mono, 8000))
    assert rate == 8000 and s.shape == (5, 1)
    np.testing.assert_array_equal(s[:, 0], mono.astype(np.float64) / 32768.0)

    stereo = np.array([[100, -100], [32767, -32768]], dtype="<i2")
    s2, rate2 = decode_wav(encode_wav_pcm16(stereo, 44100))
    assert rate2 == 44100 and s2.shape == (2, 2)
    np.testing.assert_array_equal(s2, stereo.astype(np.float64) / 32768.0)


def test_pcm8_pcm32_float32_decode_exact_values():
    s, _ = decode_wav(_wav(bytes([0, 128, 255]), 1, 1, 8000, 8))
    np.testing.assert_array_equal(s[:, 0], [-1.0, 0.0, 127.0 / 128.0])

    raw32 = struct.pack("<3i", -(2**31), 0, 2**31 - 1)
    s, _ = decode_wav(_wav(raw32, 1, 1, 8000, 32))
    np.testing.assert_array_equal(s[:, 0], [-1.0, 0.0, (2**31 - 1) / 2**31])

    rawf = struct.pack("<3f", -0.5, 0.0, 0.25)
    s, _ = decode_wav(_wav(rawf, 3, 1, 8000, 32))
    np.testing.assert_array_equal(s[:, 0], [-0.5, 0.0, 0.25])


def test_unsupported_and_malformed_payloads_raise():
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"\x89PNG\r\n\x1a\nxxxx")
    # mu-law (format 7) is compressed: declared out of scope, never guessed
    with pytest.raises(ValueError, match="format=7"):
        decode_wav(_wav(b"\x00\x01", 7, 1, 8000, 8))
    with pytest.raises(ValueError, match="fmt/data"):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")


def test_audio_features_known_signal_exact(spark):
    # square wave +/-16384 -> v = +/-0.5: rms 0.5, peak 0.5, zcr 7/7
    sq = np.array([16384, -16384] * 4, dtype="<i2")
    payload = encode_wav_pcm16(sq, 8000)
    df = spark.createDataFrame([(1, bytearray(payload)), (2, None), (3, bytearray(b"junk"))],
                               "media_id long, payload binary")
    got = {r.media_id: r for r in audio_features(df).collect()}
    r1 = got[1]
    assert (r1.sample_rate, r1.channels, r1.n_samples, r1.duration_ms) == (8000, 1, 8, 1)
    assert (r1.rms, r1.peak) == (0.5, 0.5)
    assert r1.zcr == round(7 / 7, 6)  # every adjacent pair flips sign
    assert got[2].rms is None and got[3].rms is None


def test_synthesized_media_matches_closed_form(spark):
    """The synthesizer's waveform is pure integer arithmetic on (id, i) —
    decode must reproduce it exactly, which is what lets the registry
    oracle recompute features in SQL with no codec."""
    ids = spark.createDataFrame([(0,), (3,), (13,)], "doc_id long")
    rows = {r.media_id: bytes(r.payload) for r in synthesize_wav_media(ids).collect()}
    for d, payload in rows.items():
        s, rate = decode_wav(payload)
        n = 512 + (d % 7) * 64
        assert rate == 16000 and s.shape == (n, 1)
        i = np.arange(n, dtype=np.int64)
        want = (((d * 7919 + i * 2663) % 65536) - 32768) / 32768.0
        np.testing.assert_array_equal(s[:, 0], want)


def test_spectral_features_recover_known_tones(spark):
    """The rFFT must recover the synthesized fundamental exactly: a
    square wave at bin k dominates at k (harmonics decay ~1/m), and the
    integer waveform's RMS is exactly amp/32768. Short and undecodable
    payloads degrade to NULLs."""
    from demo_otel_parquet_antalya_spark.operators.multimodal import (
        audio_spectral_features,
        synthesize_tone_media,
    )

    ids = spark.createDataFrame([(0,), (7,), (39,)], "doc_id long")
    media = synthesize_tone_media(ids)
    got = {r.media_id: r for r in audio_spectral_features(media).collect()}
    for d in (0, 7, 39):
        r = got[d]
        assert r.dominant_bin == 10 + d % 40
        assert r.dominant_freq_hz == round((10 + d % 40) * 16000 / 1024, 6)
        assert r.rms == round((16384 + (d % 5) * 1024) / 32768, 6)
        assert (r.sample_rate, r.n_samples) == (16000, 1024)

    short = spark.createDataFrame(
        [(1, bytearray(encode_wav_pcm16(np.zeros(100, dtype="<i2"), 8000))),
         (2, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in audio_spectral_features(short).collect()}
    assert rows[1].dominant_bin is None and rows[1].n_samples == 100
    assert rows[2].sample_rate is None
