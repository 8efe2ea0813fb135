#!/usr/bin/env python
"""End-to-end quickstart: the reference's manual smoke flow
(reference AGENTS.md:46-77) on this engine, in one script.

    python examples/quickstart.py

1. start the OTLP/HTTP receiver and the streaming ingest query
2. POST a log record to /v1/logs (same shape as the reference's curl test)
3. wait for it to become queryable (freshness contract)
4. run the reference's own queries — via the facade API AND verbatim
   ClickHouse SQL through the dialect shim
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from demo_otel_parquet_antalya_spark.plans import clickhouse_compat, facade
from demo_otel_parquet_antalya_spark.session import get_spark
from demo_otel_parquet_antalya_spark.sources.parquet_sink import read_logs
from demo_otel_parquet_antalya_spark.streaming.ingest import start_ingest_stream
from demo_otel_parquet_antalya_spark.streaming.receiver import OTLPReceiver

PAYLOAD = {
    "resourceLogs": [
        {
            "resource": {
                "attributes": [{"key": "service.name", "value": {"stringValue": "my-app"}}]
            },
            "scopeLogs": [
                {
                    "scope": {"name": "quickstart", "version": "1.0.0"},
                    "logRecords": [
                        {
                            "timeUnixNano": str(time.time_ns()),
                            "severityText": "INFO",
                            "severityNumber": 9,
                            "body": {"stringValue": "Test log message"},
                        }
                    ],
                }
            ],
        }
    ]
}


def main() -> None:
    spark = get_spark(app_name="quickstart")
    work = tempfile.mkdtemp(prefix="quickstart_")
    landing, warehouse, ckpt = f"{work}/landing", f"{work}/warehouse", f"{work}/ckpt"

    rx = OTLPReceiver(landing).start()
    q = start_ingest_stream(spark, landing, warehouse, ckpt, trigger_seconds=1.0)
    print(f"receiver on :{rx.port}, ingest stream running")

    req = urllib.request.Request(
        f"http://127.0.0.1:{rx.port}/v1/logs",
        data=json.dumps(PAYLOAD).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
    print("posted 1 log record")

    t0 = time.perf_counter()
    while True:
        try:
            if read_logs(spark, warehouse).count() >= 1:
                break
        except Exception:
            pass
        time.sleep(0.5)
    print(f"queryable after {time.perf_counter() - t0:.1f}s")

    logs = read_logs(spark, warehouse)
    logs.createOrReplaceTempView("otel_logs")

    print("\n-- facade: severity count by service (reference Q3)")
    facade.q3_severity_counts(logs).show()

    print("-- dialect shim: the reference's ClickHouse SQL, verbatim")
    clickhouse_compat.sql(
        spark,
        "SELECT service_name, severity_text, count() FROM ice.`otel.logs` "
        "GROUP BY service_name, severity_text",
    ).show()

    q.stop()
    rx.stop()
    print("done")


if __name__ == "__main__":
    main()
