"""OTLP protobuf codec tests (SURVEY.md §2.A1; VERDICT r2 item 1).

Four contracts:
1. decode(encode(env)) == env, property-tested over generated canonical
   envelopes (nested resource/scope/records, negative int64, missing
   optionals, unicode).
2. Golden twin: the same payload POSTed as JSON and as protobuf through
   ``streaming.receiver`` produces identical flat rows out of
   ``flatten_otlp`` (the reference accepts both encodings,
   reference docker-compose.yaml:186-191).
3. Receiver contract: malformed protobuf -> 400; wire-valid bytes with no
   resourceLogs -> 400 (stay observable, not silently vanishing); success
   response mirrors the request Content-Type (application/x-protobuf,
   empty body == empty ExportLogsServiceResponse).
4. Batch backfill: a ``.pb`` landing dir through ``ingest_otlp_protobuf``
   equals the JSON twin; undecodable ``.pb`` payloads surface as
   NULL-envelope rows with the path kept (quarantine contract).
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

from hypothesis import given, settings
from hypothesis import strategies as st

from demo_otel_parquet_antalya_spark.sources.otlp import flatten_otlp, ingest_otlp_json
from demo_otel_parquet_antalya_spark.sources.otlp_proto import (
    decode_export_logs_request,
    encode_export_logs_request,
    ingest_otlp_protobuf,
    read_otlp_protobuf,
)
from demo_otel_parquet_antalya_spark.streaming.receiver import OTLPReceiver
from tests.test_otlp_ingest import CANONICAL_PAYLOAD

# ---------------------------------------------------------------------------
# canonical-envelope strategies: generate exactly the OTLP-JSON-mapped form
# the decoder emits (int64 as decimal strings, hex ids, zero-valued fields
# omitted), so round-trip equality is exact dict equality.
# ---------------------------------------------------------------------------

_text = st.text(max_size=12)  # full unicode, hypothesis default alphabet


def _hex_id(n: int):
    return st.text(alphabet="0123456789abcdef", min_size=n, max_size=n)


_any_value = st.one_of(
    st.fixed_dictionaries({"stringValue": _text}),
    st.fixed_dictionaries({"boolValue": st.booleans()}),
    st.fixed_dictionaries(
        {"intValue": st.integers(min_value=-(2**63), max_value=2**63 - 1).map(str)}
    ),
    st.fixed_dictionaries(
        {"doubleValue": st.floats(allow_nan=False, allow_infinity=False)}
    ),
)

_kv = st.fixed_dictionaries({"key": _text}, optional={"value": _any_value})
_kv_list = st.lists(_kv, min_size=1, max_size=3)

_log_record = st.fixed_dictionaries(
    {},
    optional={
        "timeUnixNano": st.integers(min_value=1, max_value=2**64 - 1).map(str),
        "observedTimeUnixNano": st.integers(min_value=1, max_value=2**64 - 1).map(str),
        "severityNumber": st.integers(min_value=1, max_value=24),
        "severityText": st.text(min_size=1, max_size=10),
        "body": _any_value,
        "attributes": _kv_list,
        "traceId": _hex_id(32),
        "spanId": _hex_id(16),
    },
)

_scope = st.fixed_dictionaries(
    {},
    optional={
        "name": st.text(min_size=1, max_size=10),
        "version": st.text(min_size=1, max_size=10),
        "attributes": _kv_list,
    },
)

_scope_logs = st.fixed_dictionaries(
    {},
    optional={
        "scope": _scope,
        "logRecords": st.lists(_log_record, min_size=1, max_size=3),
    },
)

_resource_logs = st.fixed_dictionaries(
    {},
    optional={
        "resource": st.one_of(
            st.just({}), st.fixed_dictionaries({"attributes": _kv_list})
        ),
        "scopeLogs": st.lists(_scope_logs, min_size=1, max_size=3),
    },
)

_envelope = st.fixed_dictionaries(
    {}, optional={"resourceLogs": st.lists(_resource_logs, min_size=1, max_size=3)}
)


# ---------------------------------------------------------------------------
# 1. round-trip property
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(_envelope)
def test_roundtrip_decode_encode(env):
    assert decode_export_logs_request(encode_export_logs_request(env)) == env


def test_roundtrip_edge_values():
    env = {
        "resourceLogs": [
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name", "value": {"stringValue": "svc-日本語-🎉"}},
                        {"key": "int.min", "value": {"intValue": str(-(2**63))}},
                        {"key": "int.max", "value": {"intValue": str(2**63 - 1)}},
                        {"key": "neg", "value": {"intValue": "-1"}},
                        {"key": "flag", "value": {"boolValue": False}},
                        {"key": "pi", "value": {"doubleValue": 3.141592653589793}},
                        {"key": "empty", "value": {"stringValue": ""}},
                    ]
                },
                "scopeLogs": [
                    {
                        "scope": {"name": "s", "version": "1"},
                        "logRecords": [
                            {
                                "timeUnixNano": str(2**63 + 17),  # > int64: uint64 nanos
                                "severityNumber": 24,
                                "body": {"stringValue": "héllo\nworld"},
                                "traceId": "00ff" * 8,
                                "spanId": "a0b1c2d3e4f50617",
                            },
                            {},  # entirely-empty record survives
                        ],
                    }
                ],
            }
        ]
    }
    assert decode_export_logs_request(encode_export_logs_request(env)) == env


def test_malformed_bytes_raise():
    import pytest

    for bad in (
        b"\x0a",  # tag then truncated length
        b"\x0a\x05ab",  # declared length 5, only 2 bytes
        b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff",  # varint too long
        b"\x09\x01",  # fixed64 field truncated
        b"\x08",  # resourceLogs with varint wire type: wrong, truncated varint
    ):
        with pytest.raises(ValueError):
            decode_export_logs_request(bad)


def test_wire_valid_garbage_decodes_empty():
    # unknown-field-only bytes parse but carry no resourceLogs — the receiver
    # must treat this as rejectable, not silently landable
    assert decode_export_logs_request(b"\x10\x05") == {}
    assert decode_export_logs_request(b"") == {}


# ---------------------------------------------------------------------------
# 2 + 3. receiver golden twin and HTTP contract
# ---------------------------------------------------------------------------


def _post(port: int, body: bytes, ctype: str):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/logs", data=body, headers={"Content-Type": ctype}
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, resp.headers.get("Content-Type"), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), b""


def test_receiver_json_protobuf_golden_twin(spark, tmp_path):
    json_landing = str(tmp_path / "landing_json")
    pb_landing = str(tmp_path / "landing_pb")

    rx = OTLPReceiver(json_landing).start()
    try:
        status, _, _ = _post(rx.port, json.dumps(CANONICAL_PAYLOAD).encode(), "application/json")
        assert status == 200
    finally:
        rx.stop()

    rx = OTLPReceiver(pb_landing).start()
    try:
        status, resp_ctype, resp_body = _post(
            rx.port, encode_export_logs_request(CANONICAL_PAYLOAD), "application/x-protobuf"
        )
        assert status == 200
        # success response mirrors the request encoding (ADVICE r2): an empty
        # ExportLogsServiceResponse encodes to zero bytes
        assert resp_ctype == "application/x-protobuf"
        assert resp_body == b""
    finally:
        rx.stop()

    json_rows = ingest_otlp_json(spark, json_landing).collect()
    pb_rows = ingest_otlp_json(spark, pb_landing).collect()
    assert len(json_rows) == len(pb_rows) == 1
    assert json_rows == pb_rows


def test_receiver_rejects_malformed_and_empty_protobuf(tmp_path):
    landing = str(tmp_path / "landing")
    rx = OTLPReceiver(landing).start()
    try:
        # malformed wire bytes -> 400 (OTLP/HTTP contract)
        status, _, _ = _post(rx.port, b"\x0a\x05ab", "application/x-protobuf")
        assert status == 400
        # wire-valid garbage decoding to no resourceLogs -> 400, not a silent land
        status, _, _ = _post(rx.port, b"\x10\x05", "application/x-protobuf")
        assert status == 400
    finally:
        rx.stop()
    assert os.listdir(landing) == []  # nothing landed


# ---------------------------------------------------------------------------
# 4. distributed .pb backfill path
# ---------------------------------------------------------------------------


def _variant_payload(i: int) -> dict:
    p = json.loads(json.dumps(CANONICAL_PAYLOAD))
    rec = p["resourceLogs"][0]["scopeLogs"][0]["logRecords"][0]
    rec["timeUnixNano"] = str(1700000000_000000000 + i * 10**9)
    rec["body"] = {"stringValue": f"message {i}"}
    p["resourceLogs"][0]["resource"]["attributes"][0]["value"]["stringValue"] = f"svc-{i % 3}"
    return p


def test_pb_batch_ingest_equals_json_twin(spark, tmp_path):
    pb_dir = str(tmp_path / "pb")
    json_dir = str(tmp_path / "json")
    os.makedirs(pb_dir)
    os.makedirs(json_dir)
    for i in range(6):
        payload = _variant_payload(i)
        with open(os.path.join(pb_dir, f"batch-{i}.pb"), "wb") as f:
            f.write(encode_export_logs_request(payload))
        with open(os.path.join(json_dir, f"batch-{i}.json"), "w") as f:
            json.dump(payload, f)

    pb_rows = sorted(map(tuple, ingest_otlp_protobuf(spark, pb_dir).collect()))
    json_rows = sorted(map(tuple, ingest_otlp_json(spark, json_dir).collect()))
    assert len(pb_rows) == 6
    assert pb_rows == json_rows


def test_pb_streaming_ingest_equals_batch_and_is_incremental(spark, tmp_path):
    """Streaming .pb ingest (binaryFile source + checkpoint) produces the same
    warehouse rows as the batch twin, and a rerun processes only the delta —
    the same equivalence contract the JSON path has (test_streaming.py)."""
    from demo_otel_parquet_antalya_spark.sources.parquet_sink import read_logs
    from demo_otel_parquet_antalya_spark.streaming.ingest import run_ingest_protobuf_once

    pb_dir = str(tmp_path / "pb")
    os.makedirs(pb_dir)
    for i in range(5):
        with open(os.path.join(pb_dir, f"batch-{i}.pb"), "wb") as f:
            f.write(encode_export_logs_request(_variant_payload(i)))

    wh, ckpt = str(tmp_path / "wh"), str(tmp_path / "ckpt")
    run_ingest_protobuf_once(spark, pb_dir, wh, ckpt)
    # partition columns come back at the end of the scan schema — re-project
    # both sides to the canonical column order before comparing
    from demo_otel_parquet_antalya_spark.schema import OTEL_LOGS_SCHEMA

    cols = [f.name for f in OTEL_LOGS_SCHEMA.fields]
    streamed = sorted(map(tuple, read_logs(spark, wh).select(*cols).collect()))
    batch = sorted(map(tuple, ingest_otlp_protobuf(spark, pb_dir).select(*cols).collect()))
    assert len(streamed) == 5
    assert streamed == batch

    # incremental restart: only the new file is processed
    with open(os.path.join(pb_dir, "batch-late.pb"), "wb") as f:
        f.write(encode_export_logs_request(_variant_payload(99)))
    run_ingest_protobuf_once(spark, pb_dir, wh, ckpt)
    assert read_logs(spark, wh).count() == 6
    run_ingest_protobuf_once(spark, pb_dir, wh, ckpt)  # rerun with no delta: no-op
    assert read_logs(spark, wh).count() == 6


def test_pb_quarantine_keeps_path_for_undecodable(spark, tmp_path):
    pb_dir = str(tmp_path / "pb")
    os.makedirs(pb_dir)
    with open(os.path.join(pb_dir, "good.pb"), "wb") as f:
        f.write(encode_export_logs_request(CANONICAL_PAYLOAD))
    with open(os.path.join(pb_dir, "poison.pb"), "wb") as f:
        f.write(b"\x0a\xffnot protobuf at all")

    decoded = read_otlp_protobuf(spark, pb_dir).collect()
    by_path = {os.path.basename(r.path): r.resourceLogs for r in decoded}
    assert by_path["good.pb"] is not None
    assert by_path["poison.pb"] is None  # NULL envelope, path preserved

    flat = ingest_otlp_protobuf(spark, pb_dir)
    assert flat.count() == 1  # poison contributes zero rows, kills nothing


def test_proto_decoder_ships_by_value_not_by_module_reference():
    """The mapInPandas closure in decode_envelope_frame calls the module-level
    decoder web, so the module is registered for BY-VALUE cloudpickle: the
    closure must unpickle and decode in an interpreter that cannot import this
    package (driver launched from any cwd; cluster without pyFiles).
    Regression: caught by the scratch-dir verify run, round 4."""
    import subprocess
    import sys
    import tempfile

    from pyspark import cloudpickle

    from demo_otel_parquet_antalya_spark.sources import otlp_proto as m

    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        f.write(cloudpickle.dumps((m.decode_export_logs_request, m.encode_export_logs_request)))
        blob_path = f.name
    script = (
        "import pickle, sys\n"
        "assert not any('repo' in p for p in sys.path)\n"
        f"dec, enc = pickle.load(open({blob_path!r}, 'rb'))\n"
        "env = {'resourceLogs': [{'resource': {'attributes': [{'key': 'service.name',"
        " 'value': {'stringValue': 'x'}}]}, 'scopeLogs': [{'scope': {'name': 's'},"
        " 'logRecords': [{'timeUnixNano': '123', 'severityNumber': 9,"
        " 'severityText': 'INFO', 'body': {'stringValue': 'hello'}}]}]}]}\n"
        "assert dec(enc(env)) == env\n"
        "assert 'demo_otel_parquet_antalya_spark' not in sys.modules\n"
        "print('OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], cwd=tempfile.gettempdir(),
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": ""},
    )
    assert proc.returncode == 0 and "OK" in proc.stdout, proc.stderr
