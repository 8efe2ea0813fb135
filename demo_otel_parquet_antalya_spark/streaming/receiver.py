"""OTLP/HTTP log receiver: ``POST /v1/logs`` -> landing-directory JSON files.

Re-expresses the reference's otel-collector OTLP receiver (SURVEY.md §2.A1;
reference docker-compose.yaml:186-191) as the thinnest possible handoff into
Structured Streaming: the receiver does NO parsing — it appends each request
body verbatim as one file in the landing directory, and the streaming ingest
query (``streaming.ingest``) does all flattening in Spark.

Design notes (scale):
- The receiver is deliberately dumb and stateless; at production scale you run
  N of them behind a load balancer, all writing to the same object-store
  landing prefix — Spark's file stream source handles discovery.
- Files are written temp-then-rename so the stream source never reads a
  half-written file (rename is atomic on POSIX and object stores emulate it
  via PUT visibility).
- At-least-once: a 200 response is returned only after the rename, so an
  acked record is durably on disk — matching the reference collector's
  delivery contract (SURVEY.md §2.A streaming notes).
- Input is bounded and content-decoded at the door (r9): Content-Length
  over the collector-default 20 MiB cap answers 413 before any read,
  ``Content-Encoding: gzip`` is accepted (the OTLP/HTTP SHOULD; SDKs
  default to it above a size threshold) through a decompressobj with an
  output cap so a gzip bomb answers 413 rather than allocating, other
  encodings answer 415, and a malformed Content-Length answers 400
  instead of a traceback.
"""

from __future__ import annotations

import os
import tempfile
import threading
import uuid
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

# Per-request body cap, matching the otel collector's default
# max_request_body_size: without it a client-claimed Content-Length (or a
# tiny gzip bomb) materializes arbitrary bytes in receiver memory — the
# same decompression-bomb posture as the image codecs (declared-size
# guard before allocation).
MAX_BODY_BYTES = 20 * 1024 * 1024


def write_landing_file(landing_dir: str, payload: bytes, suffix: str = ".json") -> str:
    """Atomically persist one OTLP payload as a landing file."""
    os.makedirs(landing_dir, exist_ok=True)
    name = f"otlp-{uuid.uuid4().hex}{suffix}"
    fd, tmp = tempfile.mkstemp(dir=landing_dir, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        f.write(payload)
    final = os.path.join(landing_dir, name)
    os.replace(tmp, final)
    return final


class _OTLPHandler(BaseHTTPRequestHandler):
    landing_dir: str = "."

    # socket timeout: handle_one_request turns it into a clean close, so
    # a client that claims a length and stalls cannot pin a thread forever
    timeout = 30

    def _answer_and_drain(self, code: int, message: str, limit: int) -> None:
        """Send the error FIRST (the client reads it whether or not it has
        finished sending), then read and discard a BOUNDED amount of body:
        closing with unread body bytes RSTs the connection and a client
        mid-send would see ECONNRESET instead of the diagnosable status —
        and retry the same bad export forever. The drain bound (and the
        socket timeout) keeps a lying client from pinning the thread; past
        the bound the close's RST is the best we can do."""
        self.send_error(code, message)
        try:
            remaining = limit
            while remaining > 0:
                got = self.rfile.read(min(65536, remaining))
                if not got:
                    break
                remaining -= len(got)
        except OSError:
            pass  # client already gone / timed out: nothing to drain

    def _read_body(self) -> bytes | None:
        """The request body, bounded and content-decoded; None when an
        error response has already been sent. OTLP/HTTP servers SHOULD
        accept gzip request bodies (most SDKs default to it above a size
        threshold) — decompression runs through a decompressobj with an
        output cap so a gzip bomb answers 413, never an allocation."""
        if "chunked" in (self.headers.get("Transfer-Encoding") or "").lower():
            # stdlib http.server does not dechunk; the honest answer is
            # 411 (send Content-Length), not 400 "empty body". Chunked has
            # no declared length, so drain blind up to the cap.
            self._answer_and_drain(
                411, "chunked bodies are not supported", MAX_BODY_BYTES
            )
            return None
        try:
            length = int(self.headers.get("Content-Length", 0))
        except ValueError:
            self._answer_and_drain(400, "malformed Content-Length", MAX_BODY_BYTES)
            return None
        if length > MAX_BODY_BYTES:
            self._answer_and_drain(
                413,
                f"body exceeds {MAX_BODY_BYTES} bytes",
                min(length, 2 * MAX_BODY_BYTES),
            )
            return None
        body = self.rfile.read(length) if length > 0 else b""
        enc = (self.headers.get("Content-Encoding") or "").strip().lower()
        if enc in ("", "identity"):
            return body
        if enc not in ("gzip", "x-gzip"):  # RFC 9110: x-gzip == gzip
            self.send_error(415, f"unsupported Content-Encoding {enc!r}")
            return None
        # gzip CODING is member concatenation (RFC 9110): loop members so a
        # multi-member body (Go writer Reset, naive export concat) lands
        # complete — stopping at the first member's eof would ack 200 and
        # silently drop the rest, breaking the at-least-once contract
        out = bytearray()
        data = body
        try:
            while True:
                d = zlib.decompressobj(wbits=31)  # gzip wrapper
                out += d.decompress(data, MAX_BODY_BYTES + 1 - len(out))
                if len(out) > MAX_BODY_BYTES or d.unconsumed_tail:
                    self.send_error(413, "decompressed body exceeds cap")
                    return None
                if not d.eof:  # input ended before the gzip trailer
                    self.send_error(400, "truncated gzip body")
                    return None
                if d.unused_data:
                    data = d.unused_data  # next member (or garbage -> 400)
                    continue
                return bytes(out)
        except zlib.error:
            self.send_error(400, "malformed gzip body")
            return None

    def do_POST(self):  # noqa: N802 (stdlib naming)
        if self.path.rstrip("/") != "/v1/logs":
            self.send_error(404, "only /v1/logs is served")
            return
        body = self._read_body()
        if body is None:
            return
        if not body:
            self.send_error(400, "empty body")
            return
        # Real OTLP SDKs default to protobuf on /v1/logs. Decode it at the
        # door into the canonical JSON envelope so the landing directory —
        # and everything downstream (streaming ingest, flattener, quarantine)
        # — stays single-format. Bodies are collector-export-sized, so a
        # per-request decode is cheap; bulk .pb backfills instead go through
        # the distributed ``sources.otlp_proto.read_otlp_protobuf`` path.
        # Malformed protobuf is rejected with 400 (the OTLP/HTTP contract);
        # malformed JSON still lands verbatim and is quarantined downstream,
        # preserving round-1 behavior.
        ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip().lower()
        is_proto = ctype == "application/x-protobuf"
        if is_proto:
            import json

            from demo_otel_parquet_antalya_spark.sources.otlp_proto import (
                decode_export_logs_request,
            )

            try:
                envelope = decode_export_logs_request(body)
            except Exception:
                self.send_error(400, "malformed OTLP protobuf payload")
                return
            # Wire-valid bytes that decode to no resourceLogs (unknown-field-
            # only garbage, or a zero-record export) would flatten to zero rows
            # and vanish silently — reject so they stay observable instead of
            # slipping past the quarantine path that verbatim JSON junk hits.
            if not envelope.get("resourceLogs"):
                self.send_error(400, "decoded OTLP envelope has no resourceLogs")
                return
            body = json.dumps(envelope).encode("utf-8")
        write_landing_file(self.landing_dir, body)
        self.send_response(200)
        if is_proto:
            # OTLP/HTTP mirrors the request encoding in the success response;
            # an empty ExportLogsServiceResponse encodes to zero protobuf bytes.
            self.send_header("Content-Type", "application/x-protobuf")
            self.send_header("Content-Length", "0")
            self.end_headers()
        else:
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(b"{}")  # OTLP success response is an empty partial-success object

    def log_message(self, *args):  # silence default stderr chatter
        pass


class OTLPReceiver:
    """Threaded OTLP/HTTP ingest endpoint (reference port :4318)."""

    def __init__(self, landing_dir: str, host: str = "127.0.0.1", port: int = 0):
        os.makedirs(landing_dir, exist_ok=True)  # stream source needs the dir to exist
        handler = type("Handler", (_OTLPHandler,), {"landing_dir": landing_dir})
        self.server = ThreadingHTTPServer((host, port), handler)
        self.port = self.server.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "OTLPReceiver":
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.server.shutdown()
        self.server.server_close()
        if self._thread:
            self._thread.join(timeout=5)
