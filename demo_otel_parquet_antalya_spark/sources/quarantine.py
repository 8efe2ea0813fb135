"""Corrupt-file handling for huge parquet scans.

At 100 TB a scan WILL meet truncated uploads, torn multipart writes, and
bit-rotted objects; the default behavior (one corrupt file fails the whole
job hours in) is unacceptable, and silently skipping is worse. The pattern
here mirrors the row-level quarantine the OTLP flattener applies to poison
payloads (`sources/otlp.py::ingest_otlp_json_audited`), lifted to file
granularity:

- ``read_parquet_resilient``: the scan itself, with ``ignoreCorruptFiles``
  scoped to THIS read (an option, not a session-wide conf — other scans
  keep failing fast).
- ``corrupt_file_audit``: a DISTRIBUTED footer check — file paths fan out
  to executors, each opens only the parquet footer via pyarrow (O(footer)
  I/O per file, not O(file)), and returns (path, ok, error). The corrupt
  sliver is then a queryable frame to alert on / re-fetch — skipped files
  never vanish unobserved.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

AUDIT_SCHEMA = "path string, ok boolean, error string"


def read_parquet_resilient(spark: SparkSession, path: str, schema) -> DataFrame:
    """Scan that survives corrupt members. Schema is mandatory: with corrupt
    files in play, inference could sample exactly the broken one."""
    if schema is None:
        raise ValueError("explicit schema required for a resilient scan")
    return (
        spark.read.schema(schema)
        .option("ignoreCorruptFiles", "true")
        .parquet(path)
    )


def corrupt_file_audit(spark: SparkSession, path: str, glob: str = "*.parquet") -> DataFrame:
    """(path, ok, error) per file under ``path`` — executors validate
    footers in parallel; only the file listing touches the driver."""
    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path")
    )

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                local = p[len("file:"):] if p.startswith("file:") else p
                try:
                    pq.ParquetFile(local)  # opens + parses the footer only
                    rows.append((p, True, None))
                except Exception as e:  # noqa: BLE001 — the error IS the datum
                    rows.append((p, False, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=["path", "ok", "error"])

    return listing.mapInPandas(check, AUDIT_SCHEMA)


def quarantined_files(spark: SparkSession, path: str, glob: str = "*.parquet") -> DataFrame:
    """Just the corrupt sliver — what the resilient scan skipped."""
    from pyspark.sql import functions as F

    return corrupt_file_audit(spark, path, glob).filter(~F.col("ok"))
