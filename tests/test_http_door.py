"""Unit tests for the shared HTTP door checks (http_door.py) that need no
live server: the error-send guards. Both HTTP surfaces call the door
OUTSIDE any try, so a send raising on a dead client would traceback
through socketserver's handle_error — the exact noise class the module
exists to eliminate (code-review r10, pass 2)."""

from __future__ import annotations

import io

from demo_otel_parquet_antalya_spark.http_door import (
    answer_and_drain,
    read_bounded_body,
)


class _DeadClientHandler:
    """A handler whose client RST'd before reading: every send raises."""

    def __init__(self, headers: dict, body: bytes = b""):
        self._headers = {k.lower(): v for k, v in headers.items()}
        self.rfile = io.BytesIO(body)
        self.close_connection = False

    class _H:
        def __init__(self, d):
            self._d = d

        def get(self, k, default=None):
            return self._d.get(k.lower(), default)

    @property
    def headers(self):
        return self._H(self._headers)

    def send_error(self, code, message=None):
        raise BrokenPipeError("client gone")


def test_door_error_sends_never_raise_on_dead_clients():
    import gzip

    cases = [
        ({"Transfer-Encoding": "chunked"}, b""),                # 411 path
        ({"Content-Length": "banana"}, b""),                    # 400 path
        ({"Content-Length": str(10**9)}, b""),                  # 413 path
        ({"Content-Length": "4", "Content-Encoding": "br"}, b"abcd"),   # 415
        ({"Content-Length": "7", "Content-Encoding": "gzip"}, b"notgzip"),  # 400
        # gzip bomb -> 413 path
        (
            {"Content-Length": "0", "Content-Encoding": "gzip"},
            b"",
        ),
    ]
    bomb = gzip.compress(b"\0" * 2048)
    cases.append(
        ({"Content-Length": str(len(bomb)), "Content-Encoding": "gzip"}, bomb)
    )
    for headers, body in cases:
        h = _DeadClientHandler(headers, body)
        # must not raise, must mark the connection for close where the
        # response could not be delivered
        out = read_bounded_body(h, 1024)
        assert out is None or isinstance(out, bytes)
    h = _DeadClientHandler({}, b"xyz")
    answer_and_drain(h, 413, "too big", 3)  # must not raise
    assert h.close_connection


def test_drain_limit_policy():
    """The shared drain bound: declared length when trustworthy (capped),
    a small FIXED window for chunked (no declared length exists — the
    411 drain must not extend to the surface cap, ADVICE r10), ZERO for
    a garbage declaration — an untrustworthy declaration never earns a
    blocking read, so a junk-header probe cannot pin a handler thread
    until the socket timeout (code-review r10, passes 5-6)."""
    from demo_otel_parquet_antalya_spark.http_door import (
        CHUNKED_DRAIN_BYTES,
        drain_limit,
    )

    def h(headers):
        return _DeadClientHandler(headers)

    assert drain_limit(h({}), 1000) == 0
    assert drain_limit(h({"Content-Length": "300"}), 1000) == 300
    assert drain_limit(h({"Content-Length": "5000"}), 1000) == 1000
    assert drain_limit(h({"Content-Length": "-5"}), 1000) == 0
    assert drain_limit(h({"Content-Length": "banana"}), 1000) == 0
    assert drain_limit(h({"Transfer-Encoding": "chunked"}), 1000) == 1000
    # at a 20 MiB receiver-sized cap, the chunked drain stays 64 KiB —
    # never the cap's worth of blocking reads per probe
    assert drain_limit(h({"Transfer-Encoding": "chunked"}), 20 * 2**20) == (
        CHUNKED_DRAIN_BYTES
    )
