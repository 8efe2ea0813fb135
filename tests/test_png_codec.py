"""Pure-stdlib PNG codec: decode (all five scanline filters), encode
round-trip, nearest-neighbor resample, and the real PNG path through the
Spark resize stage — no image library anywhere (VERDICT r3 item 5)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from demo_otel_parquet_antalya_spark.operators import multimodal
from demo_otel_parquet_antalya_spark.operators.multimodal import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
    resize_nearest,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Independent reference ENCODER that applies the requested filter type
    per scanline by the spec's forward formulas — so decode_png's unfilter
    paths (Sub/Up/Average/Paeth) are tested against a second implementation,
    not against encode_png's filter-0-only output."""
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        row = img[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        out = np.empty(w * ch, dtype=np.int32)
        for x in range(w * ch):
            a = int(row[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (row[x] - pred) % 256
        raw.append(f)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_roundtrip_all_channel_counts():
    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, (13, 9, ch), dtype=np.uint8)
        assert (decode_png(encode_png(img)) == img).all()


def test_unfilter_every_filter_type_vs_reference_encoder():
    """Each of the five PNG filters, cycled across scanlines, on RGB and
    grayscale — decode must recover the exact pixels the reference encoder
    filtered."""
    rng = np.random.default_rng(11)
    for ch in (1, 3, 4):
        img = rng.integers(0, 256, (10, 7, ch), dtype=np.uint8)
        for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
            got = decode_png(_png_with_filters(img, filters))
            assert (got == img).all(), (ch, filters)


def test_decode_rejects_out_of_scope_pngs():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JUNK" + good)
    # corrupt IHDR to 16-bit depth
    bad = bytearray(good)
    bad[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(bytes(bad))


def test_resize_nearest_pixel_exact():
    """Nearest-neighbor index map is floor(i*src/dst): downsampling a 4x4
    gradient to 2x2 keeps pixels (0,0),(0,2),(2,0),(2,2); upsampling 2x2 to
    4x4 replicates each source pixel into a 2x2 block."""
    g = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    small = resize_nearest(g, 2, 2)
    assert small.reshape(-1).tolist() == [0, 2, 8, 10]
    up = resize_nearest(small, 4, 4)
    assert up[:2, :2, 0].tolist() == [[0, 0], [0, 0]]
    assert up[2:, 2:, 0].tolist() == [[10, 10], [10, 10]]


def test_spark_resize_real_png_path(spark):
    """The registered resize stage must REALLY decode PNG payloads: output
    payload is a valid PNG whose pixels equal the numpy-computed
    nearest-neighbor expectation, pixel-exact; a non-PNG payload in the
    same frame takes the declared stub path."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 12, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_png(img))),
        (2, bytearray(b"\xff\xd8\xff fake-jpeg payload bytes")),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in multimodal.resize(media, width=6, height=8).collect()}
    decoded = decode_png(bytes(out[1].payload))
    expect = resize_nearest(img, 6, 8)
    assert (decoded == expect).all()
    assert (out[1].width, out[1].height) == (6, 8)
    assert len(out[2].payload) == 6 * 8  # stub size contract for non-PNG


def test_codec_ships_by_value_not_by_module_reference():
    """The codec trio must cloudpickle BY VALUE (factory-local qualnames), so
    the resize closure that references them never requires this package to be
    importable on a Python worker — the driver may run from any cwd and a
    cluster may not ship the package via pyFiles. A by-reference pickle would
    embed the module path and die with ModuleNotFoundError at unpickle time
    (regression: caught by the scratch-dir verify run, round 4)."""
    import subprocess
    import sys
    import tempfile

    from pyspark import cloudpickle

    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        f.write(
            cloudpickle.dumps(
                (multimodal.decode_png, multimodal.encode_png, multimodal.resize_nearest)
            )
        )
        blob_path = f.name
    # a worker that CANNOT import the package: clean cwd, no repo on sys.path
    script = (
        "import pickle, sys, numpy as np\n"
        "assert not any('repo' in p for p in sys.path)\n"
        f"dec, enc, rsz = pickle.load(open({blob_path!r}, 'rb'))\n"
        "img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)\n"
        "assert (dec(enc(img)) == img).all()\n"
        "assert rsz(img, 2, 2).shape == (2, 2, 3)\n"
        "assert 'demo_otel_parquet_antalya_spark' not in sys.modules\n"
        "print('OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], cwd=tempfile.gettempdir(),
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": ""},
    )
    assert proc.returncode == 0 and "OK" in proc.stdout, proc.stderr


def test_decompression_bomb_guards():
    """A tiny payload can declare a huge canvas (32-bit IHDR dims) or
    carry a zlib bomb in IDAT; both must raise ValueError BEFORE big
    allocations — and malformed zlib data must surface as ValueError
    (the per-payload degrade contract), never a bare zlib.error."""
    import struct
    import zlib

    from demo_otel_parquet_antalya_spark.operators.multimodal import decode_png

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # 100k x 100k gray: 40-ish bytes, 10G declared pixels
    huge = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 100_000, 100_000, 8, 0, 0, 0, 0))
    with pytest.raises(ValueError, match="decompression-bomb"):
        decode_png(huge + chunk(b"IDAT", b"x") + chunk(b"IEND", b""))
    # zlib bomb: 2x2 declared, IDAT inflates to ~1 MB — bounded inflate
    # detects the overlong stream without materializing it
    bomb = zlib.compress(b"\x00" * 1_000_000)
    small = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
    with pytest.raises(ValueError, match="wrong length"):
        decode_png(small + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
    # malformed zlib stream -> ValueError, not zlib.error
    with pytest.raises(ValueError, match="inflate failed"):
        decode_png(small + chunk(b"IDAT", b"\xff\xff\xff\xff") + chunk(b"IEND", b""))
