"""Structured Streaming media ingest: landing dir of raw media files ->
classified, partitioned Parquet + quarantine — the multimodal sibling of
the OTLP log ingest (streaming/ingest.py), same exactly-once contract.

    readStream.format("binaryFile")  ->  classify_media (one Arrow pass,
        O(header) bytes per payload)  ->  writeStream
            healthy   -> warehouse/  partitionBy(media_type)
            unknown   -> quarantine/ (payload kept for forensics)

- The binaryFile source checkpoints processed files exactly like the JSON
  landing source, so re-runs ingest only the delta (incremental, at-once).
- The sink is idempotent: each micro-batch writes a dynamic OVERWRITE of
  its own ``ingest_batch_id`` partitions, so a batch replayed after a
  mid-write failure replaces its earlier partial output instead of
  double-appending — at-least-once delivery + idempotent writes =
  exactly-once effect (same guarantee class as ingest.py's file-sink
  metadata log, achieved the foreachBatch way).
- Classification is the HEADER gate from SCALE.md's codec section: a
  payload's declared shape is parsed from O(header) bytes before any
  pixel/sample decode is spent on it; undecodable payloads land in
  quarantine as rows, never as job failures.
- Partitioning by media_type gives downstream decode stages (image
  feature extraction, audio features, frame sampling) pruned scans: each
  reads only its modality's partition.

At cluster scale the landing dir is an object-store prefix; driver cost is
file listing only (bound via maxFilesPerTrigger / maxFileAge), and every
payload crosses the wire once: source -> executor -> columnar sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.operators.multimodal import classify_media

# binaryFile sources cap file size via this spark conf; the default 2 GiB
# would let one pathological payload dominate an executor's memory
_MEDIA_COLUMNS = ("path", "length", "payload")


def read_media_stream(
    spark: SparkSession,
    landing_dir: str,
    max_files_per_trigger: int | None = None,
    path_glob: str | None = None,
) -> DataFrame:
    """binaryFile stream over the landing dir -> (path, length, payload)."""
    # streaming sources require an explicit schema; binaryFile's is fixed
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length long, content binary"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path_glob is not None:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.load(landing_dir).select(
        "path", "length", F.col("content").alias("payload")
    )


def classify_media_files(files: DataFrame) -> DataFrame:
    """(path, length, payload) -> classification + payload, one Arrow pass.

    Works identically on batch and streaming frames (the stream==batch
    equivalence test rides on that). The synthetic media_id is a stable
    hash of the file path — downstream joins need a key, paths are the
    natural one, and xxhash64 keeps the shuffle key 8 bytes.
    """
    keyed = files.withColumn("media_id", F.xxhash64("path"))
    classified = classify_media(keyed, id_col="media_id")
    return (
        keyed.select("media_id", "path", "payload")
        .join(classified.drop("n_bytes"), "media_id")
        .withColumn("n_bytes", F.length("payload").cast("long"))
    )


def run_media_ingest_once(
    spark: SparkSession,
    landing_dir: str,
    warehouse_dir: str,
    checkpoint_dir: str,
    quarantine_dir: str | None = None,
) -> None:
    """Drain the landing dir once (Trigger.AvailableNow), exactly-once.

    Healthy rows (classified image/audio/video) land under
    ``warehouse_dir`` partitioned by media_type; unknown/unparseable
    payloads land under ``quarantine_dir`` (default
    ``<warehouse>/_quarantine``) with their bytes intact — reviewable,
    re-ingestable, never silently dropped.
    """
    qdir = quarantine_dir or os.path.join(warehouse_dir, "_quarantine")

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        # Idempotent-by-partition: every row carries its micro-batch id as a
        # trailing partition column, and the write is a DYNAMIC partition
        # overwrite — replaying batch N after a failure between the two
        # writes (or after writing but before the checkpoint commit)
        # re-OVERWRITES exactly batch N's partitions instead of
        # double-appending, which is what makes the foreachBatch path
        # exactly-once in effect (the classic idempotent-sink recipe from
        # the Structured Streaming guide). media_type stays the LEADING
        # partition column so downstream modality scans still prune.
        classified = (
            classify_media_files(batch_df)
            .withColumn("ingest_batch_id", F.lit(batch_id))
            .localCheckpoint()
        )
        healthy = classified.filter(F.col("media_type") != "unknown")
        (
            healthy.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("media_type", "ingest_batch_id")
            .parquet(warehouse_dir)
        )
        bad = classified.filter(F.col("media_type") == "unknown").select(
            "media_id", "path", "n_bytes", "payload", "ingest_batch_id"
        )
        if bad.take(1):
            (
                bad.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch_id")
                .parquet(qdir)
            )

    q = (
        read_media_stream(spark, landing_dir)
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
