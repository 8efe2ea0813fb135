"""OTLP protobuf ingest: ``ExportLogsServiceRequest`` wire bytes -> canonical
JSON envelope -> the SAME ``flatten_otlp`` path as JSON ingest.

Real OTLP SDKs default to protobuf on /v1/logs (SURVEY.md §2.A1; reference
docker-compose.yaml:186-191 exposes both encodings through the collector).
The container has no protobuf runtime, so this module hand-decodes the
proto3 wire format for exactly the public opentelemetry-proto message tree
(opentelemetry/proto/collector/logs/v1/logs_service.proto and
opentelemetry/proto/logs/v1/logs.proto — field numbers below are that
public contract):

    ExportLogsServiceRequest: 1 = repeated ResourceLogs
    ResourceLogs:   1 Resource, 2 repeated ScopeLogs
    Resource:       1 repeated KeyValue
    ScopeLogs:      1 InstrumentationScope, 2 repeated LogRecord
    Scope:          1 name, 2 version, 3 repeated KeyValue
    LogRecord:      1 time_unix_nano(fixed64), 2 severity_number(varint),
                    3 severity_text, 5 body(AnyValue), 6 repeated KeyValue,
                    9 trace_id(bytes), 10 span_id(bytes),
                    11 observed_time_unix_nano(fixed64)
    KeyValue:       1 key, 2 AnyValue
    AnyValue:       1 string, 2 bool, 3 int64, 4 double (5 array / 6 kvlist /
                    7 bytes exist in the proto; the relational envelope keeps
                    the four scalar kinds, matching the JSON path's enforced
                    schema — see schema.py _ATTR_VALUE)

Decoded output follows the OTLP JSON mapping (int64/uint64 as decimal
strings, trace/span ids as HEX strings, zero-valued fields omitted), i.e.
bytes -> the exact envelope dict ``OTLP_ENVELOPE_SCHEMA`` enforces, so the
flattener, quarantine, and streaming ingest are shared with JSON.

Scale notes:
- The receiver decodes per-request (collector-shaped; bodies are small).
- Backfills of raw ``.pb`` landing files decode IN SPARK:
  ``read_otlp_protobuf`` is binaryFile -> mapInPandas (Arrow-batched, one
  Python decode per file, linear in bytes, no shuffle) -> from_json ->
  ``flatten_otlp``; a 100 TB protobuf backlog parallelizes per file.

An encoder is included so tests and the load generator can produce
byte-true fixtures without a protobuf dependency; decode(encode(x)) == x
is property-tested in tests/test_otlp_proto.py.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.schema import OTLP_ENVELOPE_SCHEMA

# The mapInPandas closure in ``decode_envelope_frame`` calls the module-level
# decoder web below (decode_export_logs_request -> _decode_* -> _read_varint).
# Register the module for BY-VALUE cloudpickle so that closure ships
# self-contained to Python workers: a driver launched from outside the repo
# (or a cluster that doesn't distribute the package via pyFiles) must not
# need this package importable on the worker side. Caught by the scratch-dir
# verify recipe, round 4; regression-tested in tests/test_otlp_proto.py.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

# ---------------------------------------------------------------------------
# proto3 wire primitives
# ---------------------------------------------------------------------------

_WT_VARINT, _WT_FIXED64, _WT_LEN, _WT_FIXED32 = 0, 1, 2, 5


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _iter_fields(data: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, raw value) over one message's bytes."""
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        field, wt = tag >> 3, tag & 0x7
        if wt == _WT_VARINT:
            val, pos = _read_varint(data, pos)
        elif wt == _WT_FIXED64:
            if pos + 8 > len(data):
                raise ValueError("truncated fixed64")
            val = int.from_bytes(data[pos : pos + 8], "little")
            pos += 8
        elif wt == _WT_LEN:
            n, pos = _read_varint(data, pos)
            if pos + n > len(data):
                raise ValueError("truncated length-delimited field")
            val = data[pos : pos + n]
            pos += n
        elif wt == _WT_FIXED32:
            if pos + 4 > len(data):
                raise ValueError("truncated fixed32")
            val = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _to_i64(v: int) -> int:
    """Two's-complement reinterpret: varint int64 arrives as unsigned."""
    return v - (1 << 64) if v >= 1 << 63 else v


# ---------------------------------------------------------------------------
# message decoders (wire bytes -> OTLP-JSON-mapped dicts)
# ---------------------------------------------------------------------------


def _decode_any_value(data: bytes) -> dict:
    out: dict = {}
    for field, _wt, val in _iter_fields(data):
        if field == 1:
            out["stringValue"] = val.decode("utf-8")
        elif field == 2:
            out["boolValue"] = bool(val)
        elif field == 3:
            out["intValue"] = str(_to_i64(val))  # JSON mapping: int64 as string
        elif field == 4:
            import struct

            out["doubleValue"] = struct.unpack("<d", int(val).to_bytes(8, "little"))[0]
        # 5 array / 6 kvlist / 7 bytes: outside the relational envelope
    return out


def _decode_key_value(data: bytes) -> dict:
    out: dict = {}
    for field, _wt, val in _iter_fields(data):
        if field == 1:
            out["key"] = val.decode("utf-8")
        elif field == 2:
            out["value"] = _decode_any_value(val)
    return out


def _decode_scope(data: bytes) -> dict:
    out: dict = {}
    for field, _wt, val in _iter_fields(data):
        if field == 1:
            out["name"] = val.decode("utf-8")
        elif field == 2:
            out["version"] = val.decode("utf-8")
        elif field == 3:
            out.setdefault("attributes", []).append(_decode_key_value(val))
    return out


def _decode_log_record(data: bytes) -> dict:
    out: dict = {}
    for field, _wt, val in _iter_fields(data):
        if field == 1 and val:
            out["timeUnixNano"] = str(val)
        elif field == 2 and val:
            out["severityNumber"] = val
        elif field == 3:
            out["severityText"] = val.decode("utf-8")
        elif field == 5:
            out["body"] = _decode_any_value(val)
        elif field == 6:
            out.setdefault("attributes", []).append(_decode_key_value(val))
        elif field == 9 and val:
            out["traceId"] = val.hex()  # OTLP JSON: ids are hex, not base64
        elif field == 10 and val:
            out["spanId"] = val.hex()
        elif field == 11 and val:
            out["observedTimeUnixNano"] = str(val)
    return out


def _decode_scope_logs(data: bytes) -> dict:
    out: dict = {}
    for field, _wt, val in _iter_fields(data):
        if field == 1:
            out["scope"] = _decode_scope(val)
        elif field == 2:
            out.setdefault("logRecords", []).append(_decode_log_record(val))
    return out


def _decode_resource_logs(data: bytes) -> dict:
    out: dict = {}
    for field, _wt, val in _iter_fields(data):
        if field == 1:
            attrs = [kv for f, _w, v in _iter_fields(val) if f == 1 for kv in [_decode_key_value(v)]]
            out["resource"] = {"attributes": attrs} if attrs else {}
        elif field == 2:
            out.setdefault("scopeLogs", []).append(_decode_scope_logs(val))
    return out


def decode_export_logs_request(data: bytes) -> dict:
    """OTLP protobuf ``ExportLogsServiceRequest`` -> canonical JSON envelope."""
    out: dict = {}
    for field, wt, val in _iter_fields(data):
        if field == 1:
            if wt != _WT_LEN:
                raise ValueError("resourceLogs must be length-delimited")
            out.setdefault("resourceLogs", []).append(_decode_resource_logs(val))
    return out


# ---------------------------------------------------------------------------
# encoder (fixtures / load generator — no protobuf dependency needed)
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # int64 negatives: 10-byte varint
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wt: int) -> bytes:
    return _varint(field << 3 | wt)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, _WT_LEN) + _varint(len(payload)) + payload


def _encode_any_value(v: dict) -> bytes:
    import struct

    out = b""
    if "stringValue" in v and v["stringValue"] is not None:
        out += _len_field(1, v["stringValue"].encode("utf-8"))
    if "boolValue" in v and v["boolValue"] is not None:
        out += _tag(2, _WT_VARINT) + _varint(1 if v["boolValue"] else 0)
    if "intValue" in v and v["intValue"] is not None:
        out += _tag(3, _WT_VARINT) + _varint(int(v["intValue"]))
    if "doubleValue" in v and v["doubleValue"] is not None:
        out += _tag(4, _WT_FIXED64) + struct.pack("<d", float(v["doubleValue"]))
    return out


def _encode_key_value(kv: dict) -> bytes:
    out = _len_field(1, kv.get("key", "").encode("utf-8"))
    if kv.get("value") is not None:
        out += _len_field(2, _encode_any_value(kv["value"]))
    return out


def _encode_log_record(r: dict) -> bytes:
    out = b""
    if r.get("timeUnixNano"):
        out += _tag(1, _WT_FIXED64) + int(r["timeUnixNano"]).to_bytes(8, "little")
    if r.get("severityNumber"):
        out += _tag(2, _WT_VARINT) + _varint(int(r["severityNumber"]))
    if r.get("severityText"):
        out += _len_field(3, r["severityText"].encode("utf-8"))
    if r.get("body"):
        out += _len_field(5, _encode_any_value(r["body"]))
    for kv in r.get("attributes") or []:
        out += _len_field(6, _encode_key_value(kv))
    if r.get("traceId"):
        out += _len_field(9, bytes.fromhex(r["traceId"]))
    if r.get("spanId"):
        out += _len_field(10, bytes.fromhex(r["spanId"]))
    if r.get("observedTimeUnixNano"):
        out += _tag(11, _WT_FIXED64) + int(r["observedTimeUnixNano"]).to_bytes(8, "little")
    return out


def _encode_scope(s: dict) -> bytes:
    out = b""
    if s.get("name"):
        out += _len_field(1, s["name"].encode("utf-8"))
    if s.get("version"):
        out += _len_field(2, s["version"].encode("utf-8"))
    for kv in s.get("attributes") or []:
        out += _len_field(3, _encode_key_value(kv))
    return out


def encode_export_logs_request(envelope: dict) -> bytes:
    """Canonical JSON envelope dict -> OTLP protobuf wire bytes."""
    out = b""
    for rl in envelope.get("resourceLogs") or []:
        rl_bytes = b""
        res = rl.get("resource") or {}
        res_bytes = b"".join(_len_field(1, _encode_key_value(kv)) for kv in res.get("attributes") or [])
        if res_bytes or rl.get("resource") is not None:
            rl_bytes += _len_field(1, res_bytes)
        for sl in rl.get("scopeLogs") or []:
            sl_bytes = b""
            if sl.get("scope") is not None:
                sl_bytes += _len_field(1, _encode_scope(sl["scope"]))
            for rec in sl.get("logRecords") or []:
                sl_bytes += _len_field(2, _encode_log_record(rec))
            rl_bytes += _len_field(2, sl_bytes)
        out += _len_field(1, rl_bytes)
    return out


# ---------------------------------------------------------------------------
# Spark batch path: raw .pb landing files -> flat otel.logs
# ---------------------------------------------------------------------------


# binaryFile's fixed schema — needed explicitly for the STREAMING source
# (file-stream sources require a declared schema; batch infers it)
BINARY_FILE_SCHEMA = "path string, modificationTime timestamp, length long, content binary"


def decode_envelope_frame(raw: DataFrame) -> DataFrame:
    """binaryFile frame (batch OR streaming) -> (path, resourceLogs) envelopes.

    mapInPandas (Arrow-batched; one decode per file, linear, shuffle-free) ->
    from_json against the enforced envelope schema. Undecodable payloads
    surface as NULL-envelope rows with the path kept, mirroring the JSON
    quarantine contract.
    """
    import json

    def decode_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                try:
                    env = json.dumps(decode_export_logs_request(bytes(content)))
                except Exception:
                    env = None
                rows.append({"path": path_, "envelope_json": env})
            yield pd.DataFrame(rows, columns=["path", "envelope_json"])

    decoded = raw.select("path", "content").mapInPandas(
        decode_batches, "path string, envelope_json string"
    )
    return decoded.select(
        "path", F.from_json("envelope_json", OTLP_ENVELOPE_SCHEMA).alias("env")
    ).select("path", "env.resourceLogs")


def read_otlp_protobuf(spark: SparkSession, path: str) -> DataFrame:
    """Distributed batch decode of OTLP protobuf landing files."""
    raw = spark.read.format("binaryFile").option("pathGlobFilter", "*.pb").load(path)
    return decode_envelope_frame(raw)


def read_otlp_protobuf_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of ``read_otlp_protobuf``: file-source stream over a
    ``.pb`` landing prefix, same per-file Arrow-batched decode, so protobuf
    backfills get the file-source checkpoint's exactly-once contract."""
    raw = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", "*.pb")
        .load(path)
    )
    return decode_envelope_frame(raw)


def ingest_otlp_protobuf(spark: SparkSession, path: str) -> DataFrame:
    """One-shot batch ingest: OTLP protobuf files -> flat otel.logs frame
    (shared ``flatten_otlp``)."""
    from demo_otel_parquet_antalya_spark.sources.otlp import flatten_otlp

    return flatten_otlp(read_otlp_protobuf(spark, path).select("resourceLogs"))
