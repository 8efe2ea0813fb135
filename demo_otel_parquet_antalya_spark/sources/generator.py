"""Synthetic OTLP load generator (the reference's otelgen, SURVEY.md §2.A13).

Deterministic (seeded) OTLP/JSON payload generation for tests and the ingest
benchmark — the analogue of telemetrygen's 1000 logs/s × 10 workers config
(reference docker-compose.yaml:105-112). Payloads follow the envelope shape
of the reference's canonical curl example (README.md:49-63).
"""

from __future__ import annotations

import json
import os
import random

SEVERITIES = [("TRACE", 1), ("DEBUG", 5), ("INFO", 9), ("INFO", 9), ("INFO", 9), ("WARN", 13), ("ERROR", 17)]
SERVICES = ["checkout", "payments", "inventory", "auth", "my-app"]
BODIES = [
    "request handled",
    "cache miss",
    "user login",
    "db query slow",
    "retrying upstream call",
    "connection reset",
]


def make_payload(rng: random.Random, base_ns: int, n_records: int) -> dict:
    """One OTLP export request: one resource, one scope, n log records."""
    service = rng.choice(SERVICES)
    records = []
    for i in range(n_records):
        sev_text, sev_num = rng.choice(SEVERITIES)
        t = base_ns + i * 1_000_000 + rng.randrange(1_000_000)
        records.append(
            {
                "timeUnixNano": str(t),
                "observedTimeUnixNano": str(t + rng.randrange(5_000_000)),
                "severityText": sev_text,
                "severityNumber": sev_num,
                "body": {"stringValue": f"{rng.choice(BODIES)} #{i}"},
                "traceId": f"{rng.getrandbits(128):032x}",
                "spanId": f"{rng.getrandbits(64):016x}",
                "attributes": [
                    {"key": "http.status_code", "value": {"intValue": str(rng.choice([200, 200, 200, 404, 500]))}},
                    {"key": "region", "value": {"stringValue": rng.choice(["us-east", "eu-west"])}},
                ],
            }
        )
    return {
        "resourceLogs": [
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name", "value": {"stringValue": service}},
                        {"key": "service.namespace", "value": {"stringValue": "demo"}},
                        {"key": "deployment.environment", "value": {"stringValue": "prod"}},
                    ]
                },
                "scopeLogs": [
                    {
                        "scope": {"name": "otelgen", "version": "1.0.0", "attributes": []},
                        "logRecords": records,
                    }
                ],
            }
        ]
    }


def generate_files(
    out_dir: str,
    n_files: int = 10,
    records_per_file: int = 100,
    seed: int = 42,
    base_ns: int = 1_700_000_000_000_000_000,
) -> list[str]:
    """Write n_files OTLP JSON payload files; returns their paths."""
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    paths = []
    for i in range(n_files):
        payload = make_payload(rng, base_ns + i * 60_000_000_000, records_per_file)
        p = os.path.join(out_dir, f"otlp_{i:05d}.json")
        with open(p, "w") as f:
            json.dump(payload, f)
        paths.append(p)
    return paths
