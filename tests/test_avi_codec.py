"""MJPEG-in-AVI video codec: the last multimodal stub slot, now real —
RIFF/AVI container demux (sibling of the WAV chunk walk) + per-frame
baseline-JPEG pixel decode. Frame-exact pins against hand-built streams."""

from __future__ import annotations

import numpy as np
import pytest

from demo_otel_parquet_antalya_spark.operators.multimodal import (
    decode_avi_frame_pixels,
    decode_avi_frames,
    decode_avi_stream_format,
    decode_avi_video,
    decode_jpeg,
    decode_png,
    encode_avi_dib,
    encode_avi_mjpeg,
    encode_jpeg_baseline,
    parse_video_headers,
    sample_frames,
    synthesize_avi_media,
    video_frame_stats,
)


def _flat_jpeg(v: int) -> bytes:
    return encode_jpeg_baseline(np.full((16, 16), v, dtype=np.uint8))


def test_avi_round_trip_preserves_frame_bytes_and_fps():
    frames = [_flat_jpeg(v) for v in (10, 20, 30)]
    avi = encode_avi_mjpeg(frames, fps=25, width=16, height=16)
    got, fps = decode_avi_frames(avi)
    assert fps == 25
    assert got == frames  # demux is byte-exact: frames come back verbatim
    # and each demuxed frame pixel-decodes to its constant
    for f, v in zip(got, (10, 20, 30)):
        np.testing.assert_array_equal(decode_jpeg(f), np.full((16, 16), v, np.uint8))


def test_non_avi_payloads_raise():
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi_frames(b"\xff\xd8\xff")


def test_video_frame_stats_exact_means(spark):
    """Block-constant frames survive flat-quant JPEG exactly, so the
    per-frame mean through demux + pixel decode is integer-exact."""
    frames = [_flat_jpeg(v) for v in (40, 200)]
    avi = encode_avi_mjpeg(frames, fps=10, width=16, height=16)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, None), (3, bytearray(b"not a video"))],
        "media_id long, payload binary",
    )
    rows = {(r.media_id, r.frame_idx): r for r in video_frame_stats(df).collect()}
    assert set(rows) == {(1, 0), (1, 1)}  # non-AVI payloads yield no rows
    assert rows[(1, 0)].mean_px == 40.0 and rows[(1, 1)].mean_px == 200.0
    assert (rows[(1, 0)].width, rows[(1, 0)].height) == (16, 16)


def test_sample_frames_routes_avi_through_real_demux(spark):
    """AVI payloads must come back as their ORIGINAL JPEG frame bytes with
    original frame indices (only possible via real demux); non-AVI
    payloads keep the declared stub contract in the same frame."""
    frames = [_flat_jpeg(v) for v in (1, 2, 3, 4, 5)]
    avi = encode_avi_mjpeg(frames, fps=5, width=16, height=16)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"x" * 600))],
        "media_id long, payload binary",
    )
    got = {}
    for r in sample_frames(df, max_frames=2).collect():
        got.setdefault(r.media_id, {})[r.frame_idx] = bytes(r.frame)
    # 5 frames sampled down to 2: indices 0 and 2 (evenly strided floor(k*n/take))
    assert set(got[1]) == {0, 2}
    assert got[1][0] == frames[0] and got[1][2] == frames[2]
    assert len(got[2]) == 2 and len(got[2][0]) == 256  # stub byte windows


def test_parse_video_headers_detects_avi(spark):
    avi = encode_avi_mjpeg([_flat_jpeg(9)] * 4, fps=10, width=16, height=16)
    df = spark.createDataFrame([(1, bytearray(avi))], "media_id long, payload binary")
    r = parse_video_headers(df).collect()[0]
    assert r.mime_detected == "video/x-msvideo"
    assert r.n_tracks == 1
    assert r.duration_ms == 400  # 4 frames at 10 fps
    assert r.timescale is None


def test_dib_round_trip_exact_across_strides():
    """Uncompressed BI_RGB frames: bottom-up padded BGR rows must come
    back pixel-exact — incl. widths whose 3-byte rows need 4-byte stride
    padding (w=5 -> 15->16, w=6 -> 18->20)."""
    rng = np.random.default_rng(21)
    for w, h in [(5, 4), (6, 3), (16, 16), (1, 1)]:
        frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(3)]
        avi = encode_avi_dib(frames, fps=12, width=w, height=h)
        comp, fw, fh, bits = decode_avi_stream_format(avi)
        assert (comp, fw, fh, bits) == (b"\x00\x00\x00\x00", w, h, 24)
        out, fps = decode_avi_video(avi)
        assert fps == 12 and len(out) == 3
        for o, f in zip(out, frames):
            np.testing.assert_array_equal(o, f)


def test_dib_frame_pixel_decode_is_per_frame():
    """Samplers decode only picked frames: the per-frame entry point must
    match the whole-stream decode, and truncated frames raise."""
    rng = np.random.default_rng(22)
    frames = [rng.integers(0, 256, (4, 6, 3), dtype=np.uint8) for _ in range(2)]
    avi = encode_avi_dib(frames, fps=10, width=6, height=4)
    raw, _fps = decode_avi_frames(avi)
    fmt = decode_avi_stream_format(avi)
    np.testing.assert_array_equal(decode_avi_frame_pixels(raw[1], fmt), frames[1])
    with pytest.raises(ValueError, match="truncated DIB"):
        decode_avi_frame_pixels(raw[1][:-8], fmt)
    # inter-frame-predicted codings stay the declared refusal
    h264ish = (b"H264", 16, 16, 24)
    with pytest.raises(ValueError, match="inter-frame"):
        decode_avi_frame_pixels(b"\x00\x00\x00\x01\x67" * 8, h264ish)


def test_video_frame_stats_handles_dib(spark):
    """DIB is lossless, so per-frame means are exact with no quantization
    caveat at all."""
    frames = [
        np.full((16, 16, 3), 40, np.uint8),
        np.full((16, 16, 3), 200, np.uint8),
    ]
    avi = encode_avi_dib(frames, fps=10, width=16, height=16)
    df = spark.createDataFrame([(1, bytearray(avi))], "media_id long, payload binary")
    rows = {(r.media_id, r.frame_idx): r for r in video_frame_stats(df).collect()}
    assert rows[(1, 0)].mean_px == 40.0 and rows[(1, 1)].mean_px == 200.0
    assert (rows[(1, 0)].width, rows[(1, 0)].height) == (16, 16)


def test_sample_frames_reencodes_dib_as_png(spark):
    """Sampled DIB frames come back as standalone PNGs (lossless) with
    original indices, decodable downstream like any image payload."""
    rng = np.random.default_rng(23)
    frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(5)]
    avi = encode_avi_dib(frames, fps=5, width=8, height=8)
    df = spark.createDataFrame([(1, bytearray(avi))], "media_id long, payload binary")
    got = {r.frame_idx: bytes(r.frame) for r in sample_frames(df, max_frames=2).collect()}
    assert set(got) == {0, 2}
    for fi, png in got.items():
        np.testing.assert_array_equal(decode_png(png), frames[fi])


def test_sample_frames_strict_mode_raises_on_corrupt_payloads(spark):
    """decode_stub=False is strict: a corrupt AVI payload fails the task
    instead of silently degrading to byte windows (ADVICE r7: this
    semantic changed in r7 from skip to raise and was untested). Stub
    mode on the SAME payload degrades per-payload, quarantine-style."""
    frames = [np.full((8, 8, 3), v, np.uint8) for v in (10, 20)]
    avi = bytearray(encode_avi_dib(frames, fps=5, width=8, height=8))
    # truncate inside the SECOND movi frame chunk's body (the later
    # b"00db" hits are idx1 entries): the demux walk still yields the
    # chunk (bounded by end), but its DIB rows are short
    cut = bytes(avi[: avi.index(b"00db", avi.index(b"00db") + 1) + 12])
    df = spark.createDataFrame([(1, bytearray(cut))], "media_id long, payload binary")
    # stub mode: degrades to byte windows, the task survives
    assert sample_frames(df, max_frames=8, decode_stub=True).count() >= 1
    with pytest.raises(Exception, match="truncated DIB"):
        sample_frames(df, max_frames=8, decode_stub=False).collect()


def test_audio_first_avi_reads_the_video_strf():
    """Legal RIFF ordering can put the audio strl BEFORE the video strl;
    the format sniff must skip the audio WAVEFORMATEX strf (>= 20 bytes)
    and return the 'vids' stream's BITMAPINFOHEADER."""
    import struct

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    frames = [np.full((4, 4, 3), v, np.uint8) for v in (10, 20)]
    dib = encode_avi_dib(frames, fps=5, width=4, height=4)
    # audio strl: strh 'auds' + a 30-byte WAVEFORMATEX-ish strf whose
    # bytes at the BITMAPINFOHEADER offsets are garbage
    audio_strh = b"auds\x00\x00\x00\x00" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 16000, 0, 100, 4, 0, 0) + struct.pack("<4h", 0, 0, 0, 0)
    audio_strf = struct.pack("<HHIIHHH", 1, 1, 16000, 32000, 2, 16, 0) + b"\x00" * 12
    audio_strl = lst(b"strl", chunk(b"strh", audio_strh) + chunk(b"strf", audio_strf))
    # splice the audio strl INSIDE the hdrl list, before the video strl
    hdrl_kind = dib.index(b"hdrl")
    strl_at = dib.index(b"LIST", hdrl_kind)  # video strl header
    patched = bytearray(dib)
    patched[strl_at:strl_at] = audio_strl
    # fix the hdrl LIST length and the RIFF length
    hdrl_len_at = hdrl_kind - 4
    old_len = int.from_bytes(patched[hdrl_len_at:hdrl_kind], "little")
    patched[hdrl_len_at:hdrl_kind] = struct.pack("<I", old_len + len(audio_strl))
    patched[4:8] = struct.pack("<I", int.from_bytes(patched[4:8], "little") + len(audio_strl))
    comp, w, h, bits = decode_avi_stream_format(bytes(patched))
    assert (comp, w, h, bits) == (b"\x00\x00\x00\x00", 4, 4, 24)
    out, _fps = decode_avi_video(bytes(patched))
    np.testing.assert_array_equal(out[0], frames[0])


def test_synthesized_mixed_avi_covers_both_codecs(spark):
    """mixed=True: odd ids pack DIB, even ids MJPEG — both decode to the
    same closed form, and the strh fourcc at offset 112 tells them apart
    (the bit the oracle checks)."""
    ids = spark.createDataFrame([(2,), (3,)], "doc_id long")
    payloads = {
        r.media_id: bytes(r.payload)
        for r in synthesize_avi_media(ids, mixed=True).collect()
    }
    assert payloads[2][112:116] == b"MJPG"
    assert payloads[3][112:116] == b"DIB "
    for d, payload in payloads.items():
        frames, _fps = decode_avi_video(payload)
        assert len(frames) == 2 + (d % 3)
        for f, img in enumerate(frames):
            plane = img.astype(np.float64)
            if plane.ndim == 3:
                plane = plane.mean(axis=2)
            want = np.empty((16, 16), dtype=np.float64)
            for k in range(4):
                by, bx = divmod(k, 2)
                want[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    d * 31 + f * 97 + k * 17
                ) % 256
            np.testing.assert_array_equal(plane, want)


def test_synthesized_avi_matches_closed_form(spark):
    """Every sampled frame of the synthesizer must decode to its
    closed-form block values exactly — the invariant the SQL oracle
    replays with no codec."""
    ids = spark.createDataFrame([(0,), (4,), (11,)], "doc_id long")
    payloads = {r.media_id: bytes(r.payload) for r in synthesize_avi_media(ids).collect()}
    for d, payload in payloads.items():
        frames, fps = decode_avi_frames(payload)
        assert fps == 10 and len(frames) == 2 + (d % 3)
        for f, jpeg in enumerate(frames):
            img = decode_jpeg(jpeg)
            want = np.empty((16, 16), dtype=np.uint8)
            for k in range(4):
                by, bx = divmod(k, 2)
                want[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    d * 31 + f * 97 + k * 17
                ) % 256
            np.testing.assert_array_equal(img, want)
