"""File-level corruption quarantine: the resilient scan returns every row
from healthy files, the audit flags exactly the corrupt members, and the
default (non-resilient) scan still fails fast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.sources import quarantine

SCHEMA = "id bigint, v string"


@pytest.fixture()
def mixed_dir(spark, tmp_path):
    d = tmp_path / "data"
    spark.createDataFrame([(i, f"v{i}") for i in range(100)], SCHEMA).coalesce(
        2
    ).write.parquet(str(d))
    # a truncated upload: valid magic header, no footer
    (d / "part-torn.parquet").write_bytes(b"PAR1" + b"\x00" * 64)
    return str(d)


def test_resilient_scan_skips_corrupt_and_keeps_rows(spark, mixed_dir):
    df = quarantine.read_parquet_resilient(spark, mixed_dir, SCHEMA)
    assert df.count() == 100
    assert df.agg(F.sum("id")).first()[0] == sum(range(100))


def test_default_scan_fails_fast(spark, mixed_dir):
    with pytest.raises(Exception):
        spark.read.schema(SCHEMA).parquet(mixed_dir).count()


def test_audit_flags_exactly_the_corrupt_file(spark, mixed_dir):
    audit = quarantine.corrupt_file_audit(spark, mixed_dir).collect()
    by_ok = {r.path: (r.ok, r.error) for r in audit}
    bad = [p for p, (ok, _) in by_ok.items() if not ok]
    assert len(by_ok) == 3  # two healthy parts + the torn one
    assert bad == [p for p in by_ok if "part-torn" in p]
    assert by_ok[bad[0]][1]  # error message captured
    q = quarantine.quarantined_files(spark, mixed_dir)
    assert [r.path for r in q.collect()] == bad


def test_resilient_scan_requires_schema(spark, mixed_dir):
    with pytest.raises(ValueError, match="explicit schema"):
        quarantine.read_parquet_resilient(spark, mixed_dir, None)
