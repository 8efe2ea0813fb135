"""Interchange-format source/sink matrix: JSONL, CSV, ORC, XML (+ Avro
when the spark-avro connector is on the classpath).

The reference's lake is parquet-only (otlp2parquet -> S3,
/root/reference/docker-compose.yaml:77-91), but a real deployment ingests
sidecar feeds — JSONL exports, CSV drops, ORC from legacy Hive — so the
engine exposes the full Spark DataSource matrix behind one schema-disciplined
API.

Scale rules enforced here rather than left to callers:

- **Explicit schema, always.** ``inferSchema``/JSON schema inference is a
  full extra pass over the input (100 TB read twice) and is
  sample-dependent; every reader below REQUIRES a DDL/StructType schema and
  sets ``mode=FAILFAST`` so type drift surfaces at the scan, not as silent
  NULLs downstream.
- **Columnar for analytics, row formats for interchange.** ORC keeps
  predicate pushdown + column pruning (plan-guarded in
  tests/test_formats.py); JSONL/CSV scans are full-row by nature, so the
  helpers exist for ingest/export edges, not for the query path.
- **CSV cannot carry nested types.** ``write_csv`` refuses arrays/maps/
  structs loudly instead of letting Spark stringify them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _require_schema(schema) -> None:
    if schema is None:
        raise ValueError(
            "explicit schema required: schema inference costs a second full "
            "pass over the input and is sample-dependent at scale"
        )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = "gzip") -> None:
    """One JSON object per line (the `.jsonl` interchange convention)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str | T.StructType) -> DataFrame:
    _require_schema(schema)
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))]
    if bad:
        raise ValueError(f"CSV cannot carry nested columns {bad}; export them as JSONL/ORC/parquet")
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_csv(spark: SparkSession, path: str, schema: str | T.StructType, header: bool = True) -> DataFrame:
    _require_schema(schema)
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str, schema: str | T.StructType | None = None) -> DataFrame:
    """ORC is self-describing; passing a schema still skips the footer
    sample and pins the contract."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro connector is on the classpath. The pip
    pyspark distribution ships avro-core but NOT the
    org.apache.spark:spark-avro DataSource, so this is typically False in
    the sandbox and True on a provisioned cluster."""
    try:
        # the same resolution format("avro") goes through — classpath
        # presence alone is not enough (pip pyspark ships avro-core jars
        # without the DataSource registration)
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    if not avro_available(df.sparkSession):
        raise RuntimeError(
            "spark-avro connector not on the classpath; add "
            "org.apache.spark:spark-avro_2.13 to spark.jars.packages"
        )
    df.write.mode(mode).format("avro").save(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro connector not on the classpath; add "
            "org.apache.spark:spark-avro_2.13 to spark.jars.packages"
        )
    return spark.read.format("avro").load(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite") -> None:
    """XML export (Spark 4 built-in source — legacy feed interchange)."""
    df.write.mode(mode).option("rootTag", "rows").option("rowTag", row_tag).xml(path)


def read_xml(spark: SparkSession, path: str, schema: str | T.StructType, row_tag: str = "row") -> DataFrame:
    _require_schema(schema)
    return (
        spark.read.schema(schema)
        .option("rowTag", row_tag)
        .option("mode", "FAILFAST")
        .xml(path)
    )
