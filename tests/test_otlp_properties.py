"""Property-based tests (hypothesis) for the OTLP flattener: for ANY
well-formed envelope, record count equals the sum of logRecords, promotion
and residual-attribute serialization hold, and ns→µs decode truncates.

The reference has no tests at all (SURVEY.md §5.1); these pin the flattener
contract against generated inputs rather than fixtures. One Spark job per
example is slow, so each property batches all generated envelopes into a
single ingest run.
"""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from demo_otel_parquet_antalya_spark.sources.otlp import ingest_otlp_json

# -- envelope strategy -------------------------------------------------------

_key = st.text(alphabet="abcdefghijklmnopqrstuvwxyz.", min_size=1, max_size=12)
_sval = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789 _-", max_size=20)


def _attr(k, v):
    return {"key": k, "value": {"stringValue": v}}


_attrs = st.lists(
    st.builds(_attr, _key, _sval), max_size=4, unique_by=lambda a: a["key"]
)

_record = st.fixed_dictionaries(
    {
        "timeUnixNano": st.integers(min_value=1, max_value=2_000_000_000_000_000_000).map(str),
        "severityText": st.sampled_from(["TRACE", "INFO", "WARN", "ERROR"]),
        "severityNumber": st.integers(min_value=1, max_value=24),
        "body": st.fixed_dictionaries({"stringValue": _sval}),
        "attributes": _attrs,
    }
)

_scope_log = st.fixed_dictionaries(
    {
        "scope": st.fixed_dictionaries(
            {"name": _sval, "version": st.just("1.0"), "attributes": _attrs}
        ),
        "logRecords": st.lists(_record, min_size=0, max_size=5),
    }
)

_resource_log = st.fixed_dictionaries(
    {
        "resource": st.fixed_dictionaries({"attributes": _attrs}),
        "scopeLogs": st.lists(_scope_log, min_size=0, max_size=3),
    }
)

_envelope = st.fixed_dictionaries({"resourceLogs": st.lists(_resource_log, min_size=0, max_size=3)})


def _n_records(env) -> int:
    return sum(
        len(sl["logRecords"]) for rl in env["resourceLogs"] for sl in rl["scopeLogs"]
    )


@settings(max_examples=5, deadline=None)
@given(st.lists(_envelope, min_size=1, max_size=6))
def test_flatten_invariants(spark, tmp_path_factory, envelopes):
    d = tmp_path_factory.mktemp("otlp_prop")
    for i, env in enumerate(envelopes):
        (d / f"e{i}.json").write_text(json.dumps(env))

    flat = ingest_otlp_json(spark, str(d))
    rows = flat.collect()

    # 1: one output row per logRecord, no matter the nesting shape
    assert len(rows) == sum(_n_records(e) for e in envelopes)

    for r in rows:
        # 2: schema invariants — non-null defaults hold
        assert r.timestamp is not None
        assert r.service_name is not None  # "" when unpromoted
        assert r.severity_text in {"TRACE", "INFO", "WARN", "ERROR"}
        # 3: residual JSON columns parse back to string maps without the
        # promoted keys
        for col in ("resource_attributes", "log_attributes", "scope_attributes"):
            v = getattr(r, col)
            if v is not None:
                m = json.loads(v)
                assert isinstance(m, dict) and all(isinstance(x, str) for x in m.values())
                assert "service.name" not in m or col != "resource_attributes"
        # 4: ns→µs truncation — the µs timestamp equals the raw ns value
        # (observed falls back to timeUnixNano here) integer-divided by 1000
        from datetime import datetime, timezone

        # integer µs from the datetime — float .timestamp()*1e6 loses 1 µs
        # at large epochs (53-bit mantissa), which hypothesis found
        epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
        delta = r.timestamp.replace(tzinfo=timezone.utc) - epoch
        ts_us = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        assert ts_us == r.observed_timestamp // 1000


@settings(max_examples=5, deadline=None)
@given(env=_envelope)
def test_flatten_promotes_service_name(spark, tmp_path_factory, env):
    # force a service.name attr into every resource
    for rl in env["resourceLogs"]:
        rl["resource"]["attributes"] = [
            a for a in rl["resource"]["attributes"] if a["key"] != "service.name"
        ] + [{"key": "service.name", "value": {"stringValue": "svc-prop"}}]
    d = tmp_path_factory.mktemp("otlp_prop2")
    (d / "e.json").write_text(json.dumps(env))
    flat = ingest_otlp_json(spark, str(d))
    rows = flat.collect()
    assert len(rows) == _n_records(env)
    assert all(r.service_name == "svc-prop" for r in rows)
    for r in rows:
        if r.resource_attributes is not None:
            assert "service.name" not in json.loads(r.resource_attributes)
