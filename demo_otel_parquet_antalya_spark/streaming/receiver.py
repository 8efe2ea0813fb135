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
- Input is bounded and content-decoded at the door (r9, shared with the
  SQL serving surface since r10 — ``http_door.read_bounded_body``):
  Content-Length over the collector-default 20 MiB cap answers 413 before
  any read, ``Content-Encoding: gzip`` is accepted (the OTLP/HTTP SHOULD;
  SDKs default to it above a size threshold) through a decompressobj with
  an output cap so a gzip bomb answers 413 rather than allocating, other
  encodings answer 415, a malformed Content-Length answers 400 instead of
  a traceback, a short body (client closed early) answers 400 instead of
  landing truncated, and a client stalled mid-body past the socket
  timeout answers a best-effort 408 instead of a handle_error traceback.
"""

from __future__ import annotations

import os
import tempfile
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from demo_otel_parquet_antalya_spark.http_door import (
    answer_and_drain,
    answer_best_effort,
    drain_limit,
    read_bounded_body,
)

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

    # socket timeout: a client that claims a length and stalls cannot pin
    # a thread forever — read_bounded_body turns the resulting
    # socket.timeout into a best-effort 408 + close (ADVICE r9: uncaught
    # it would traceback through socketserver's handle_error)
    timeout = 30

    def do_POST(self):  # noqa: N802 (stdlib naming)
        if self.path.rstrip("/") != "/v1/logs":
            # the one error answered BEFORE any body read: drain by the
            # shared drain_limit policy (declared length, chunked cap,
            # zero for garbage declarations) so a mid-send client reads
            # the 404 instead of an ECONNRESET retry loop while a junk
            # probe returns instantly (code-review r10, passes 5-6)
            answer_and_drain(
                self, 404, "only /v1/logs is served",
                drain_limit(self, MAX_BODY_BYTES),
            )
            return
        body = read_bounded_body(self, MAX_BODY_BYTES)
        if body is None:
            return
        if not body:
            answer_best_effort(self, 400, "empty body")
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
                answer_best_effort(self, 400, "malformed OTLP protobuf payload")
                return
            # Wire-valid bytes that decode to no resourceLogs (unknown-field-
            # only garbage, or a zero-record export) would flatten to zero rows
            # and vanish silently — reject so they stay observable instead of
            # slipping past the quarantine path that verbatim JSON junk hits.
            if not envelope.get("resourceLogs"):
                answer_best_effort(
                    self, 400, "decoded OTLP envelope has no resourceLogs"
                )
                return
            body = json.dumps(envelope).encode("utf-8")
        write_landing_file(self.landing_dir, body)
        # the payload is durably landed either way; a client that vanished
        # before reading its 200 must not traceback through handle_error.
        # (It may retry and land the same export again — exactly the
        # duplicate the at-least-once contract already permits.)
        try:
            self.send_response(200)
            if is_proto:
                # OTLP/HTTP mirrors the request encoding in the success
                # response; an empty ExportLogsServiceResponse encodes to
                # zero protobuf bytes.
                self.send_header("Content-Type", "application/x-protobuf")
                self.send_header("Content-Length", "0")
                self.end_headers()
            else:
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(b"{}")  # empty partial-success object
        except OSError:
            self.close_connection = True

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
