"""OTLP/JSON ingestion: read the nested envelope, flatten to ``otel.logs`` rows.

Re-expresses the reference's otlp2parquet conversion (SURVEY.md §2.A3-A5;
input shape reference README.md:49-63, output schema README.md:91-109) as pure
DataFrame operations:

- triple ``explode`` un-nests resourceLogs[].scopeLogs[].logRecords[],
  carrying resource/scope context down to each record;
- attribute KV-lists become maps via ``map_from_entries``; the three
  service.* attrs are promoted to columns, the residual map is serialized
  to a JSON string (reference README.md:97-99,105-109);
- ``timeUnixNano`` (string nanos) decodes to a µs timestamp; the raw
  observed nanos stay as Int64 (reference README.md:95-96).

Everything is JVM-side (explode + higher-order functions) — no Python UDFs —
so ingest flattening whole-stage-codegens and scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.schema import (
    OTEL_LOGS_SCHEMA,
    OTLP_ENVELOPE_SCHEMA,
    PROMOTED_RESOURCE_ATTRS,
)


def read_otlp_json(spark: SparkSession, path: str) -> DataFrame:
    """Read OTLP/JSON export payloads (one JSON object per file or per line).

    Schema is enforced, never inferred — malformed records hit Spark's
    PERMISSIVE null-row path rather than poisoning the schema.
    """
    return spark.read.schema(OTLP_ENVELOPE_SCHEMA).option("multiLine", "true").json(path)


def _attr_value_str(value: Column) -> Column:
    """OTLP AnyValue -> string, first-present-wins (string/int/double/bool)."""
    return F.coalesce(
        value.getField("stringValue"),
        value.getField("intValue"),
        value.getField("doubleValue").cast("string"),
        value.getField("boolValue").cast("string"),
    )


def _attrs_to_map(attrs: Column) -> Column:
    """KV list [{key, value:{...}}] -> map<string,string>."""
    return F.map_from_entries(
        F.transform(attrs, lambda kv: F.struct(kv.getField("key"), _attr_value_str(kv.getField("value"))))
    )


def _map_to_json(m: Column) -> Column:
    """map -> JSON object text; empty/absent map -> NULL (reference emits
    Nullable(String) JSON columns, README.md:105-109)."""
    return F.when(F.size(F.map_keys(m)) > 0, F.to_json(m))


def flatten_otlp(envelopes: DataFrame) -> DataFrame:
    """Nested OTLP envelope -> flat 15-column ``otel.logs`` DataFrame.

    Each carried column is materialized in its OWN projection before the
    next ``explode``. Putting extraction and explode in one select makes the
    analyzer hoist the extraction above the Generate, whose output then
    carries the whole parent struct per exploded row — with k records per
    scope every output row lugs a full copy of all k siblings (O(k²) bytes),
    which OOM'd the partitioned streaming sink (its pre-write sort copies
    rows) at ~200k records. Split projections keep the Generate's carried
    columns to small scalars/maps, so memory is linear in record count.
    """
    promoted = list(PROMOTED_RESOURCE_ATTRS.items())

    rl = envelopes.select(F.explode("resourceLogs").alias("rl"))
    rl2 = rl.select(
        _attrs_to_map(F.col("rl.resource.attributes")).alias("res_attrs"),
        F.col("rl.scopeLogs").alias("sls"),
    )
    sl = rl2.select("res_attrs", F.explode("sls").alias("sl"))
    sl2 = sl.select(
        "res_attrs",
        F.col("sl.scope.name").alias("scope_name"),
        F.col("sl.scope.version").alias("scope_version"),
        _attrs_to_map(F.col("sl.scope.attributes")).alias("scope_attrs"),
        F.col("sl.logRecords").alias("recs"),
    )
    rec = sl2.select(
        "res_attrs",
        "scope_name",
        "scope_version",
        "scope_attrs",
        F.explode("recs").alias("r"),
    )

    time_ns = F.coalesce(
        F.col("r.timeUnixNano").cast("long"),
        F.col("r.observedTimeUnixNano").cast("long"),
        F.lit(0).cast("long"),
    )
    residual_res = F.map_filter(
        F.col("res_attrs"), lambda k, _: ~k.isin(*PROMOTED_RESOURCE_ATTRS.keys())
    )

    # ns→µs MUST be integer division: `/` is double division, and
    # current-epoch nanos (~1.7e18) exceed double's 2^53 exact-integer range,
    # so (ns / 1000).cast(long) can be off by ±1 µs (hypothesis-found)
    rec = rec.withColumn("__tns", time_ns)
    flat = rec.select(
        F.timestamp_micros(F.expr("__tns div 1000")).alias("timestamp"),
        F.coalesce(F.col("r.observedTimeUnixNano").cast("long"), F.col("__tns")).alias("observed_timestamp"),
        *[
            F.coalesce(F.element_at("res_attrs", F.lit(attr)), F.lit("") if col == "service_name" else F.lit(None))
            .alias(col)
            for attr, col in promoted
        ],
        F.coalesce(F.col("r.severityText"), F.lit("")).alias("severity_text"),
        F.coalesce(F.col("r.severityNumber"), F.lit(0)).alias("severity_number"),
        F.col("r.body.stringValue").alias("body"),
        F.col("r.traceId").alias("trace_id"),
        F.col("r.spanId").alias("span_id"),
        _map_to_json(residual_res).alias("resource_attributes"),
        _map_to_json(_attrs_to_map(F.col("r.attributes"))).alias("log_attributes"),
        F.col("scope_name"),
        F.col("scope_version"),
        _map_to_json(F.col("scope_attrs")).alias("scope_attributes"),
    )
    # lock column order/types to the canonical schema
    return flat.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in OTEL_LOGS_SCHEMA.fields]
    )


def ingest_otlp_json(spark: SparkSession, path: str) -> DataFrame:
    """One-shot batch ingest: OTLP JSON files -> flat otel.logs DataFrame."""
    return flatten_otlp(read_otlp_json(spark, path))


def read_otlp_json_audited(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Corrupt-tolerant read: (parsed envelopes, corrupt raw payloads).

    A poison payload in a 100 TB backfill must neither kill the job (FAILFAST)
    nor vanish silently (plain PERMISSIVE with enforced schema): the corrupt
    raw text is captured in a side column and split into an auditable frame
    the pipeline can count, sample, and quarantine (the reference's converter
    simply drops undecodable payloads — this is the upgrade).
    """
    from pyspark.sql.types import StringType, StructType

    audit_schema = StructType(OTLP_ENVELOPE_SCHEMA.fields[:]).add(
        "_corrupt_record", StringType()
    )
    # Spark forbids projecting ONLY the corrupt column from raw JSON
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); the documented
    # contract is to materialize the parsed result first. cache() here serves
    # that; a 100 TB backfill would instead write the parsed+audit frame to
    # parquet in one pass and split from that materialization.
    df = (
        spark.read.schema(audit_schema)
        .option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw")
    )
    return good, bad


def ingest_otlp_json_audited(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """flatten(good envelopes), plus the corrupt-payload audit frame."""
    good, bad = read_otlp_json_audited(spark, path)
    return flatten_otlp(good), bad
