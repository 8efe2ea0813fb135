"""foreachBatch incremental rollup: the maintained snapshot must equal the
batch aggregation of all input, and replaying a batch must not double-count."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.streaming.rollup import (
    incremental_rollup,
    read_rollup,
)

SCHEMA = "user_id bigint, ts timestamp, event_type string"


def _write(path, fname, rows):
    import os

    os.makedirs(path, exist_ok=True)
    base = pd.Timestamp("2024-01-01 00:00:00")
    with open(f"{path}/{fname}", "w") as f:
        for uid, off, etype in rows:
            f.write(
                json.dumps({"user_id": uid, "ts": str(base + pd.Timedelta(seconds=off)), "event_type": etype}) + "\n"
            )


def test_rollup_matches_batch_agg_across_batches(spark, tmp_path):
    b1 = [(1, 0, "click"), (2, 10, "click"), (3, 70, "view"), (4, 80, "click")]
    b2 = [(5, 15, "click"), (6, 90, "view"), (7, 130, "view")]
    src = str(tmp_path / "events")
    _write(src, "b1.json", b1)
    _write(src, "b2.json", b2)
    target = str(tmp_path / "rollup")

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    q = incremental_rollup(stream, target, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = {
        (str(r.bucket), r.event_type, r.n) for r in read_rollup(spark, target).collect()
    }
    want = {
        (str(r.bucket), r.event_type, r.n)
        for r in spark.read.schema(SCHEMA)
        .json(src)
        .groupBy(F.window("ts", "1 minute").getField("start").alias("bucket"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_rollup_replay_is_idempotent(spark, tmp_path):
    rows = [(1, 0, "click"), (2, 10, "view")]
    src = str(tmp_path / "events")
    _write(src, "b1.json", rows)
    target = str(tmp_path / "rollup")

    stream = spark.readStream.schema(SCHEMA).json(src)
    q = incremental_rollup(stream, target, str(tmp_path / "ckpt"))
    q.awaitTermination()
    first = {(str(r.bucket), r.event_type, r.n) for r in read_rollup(spark, target).collect()}

    # simulate a crash-replay of the SAME micro-batch: same batch_id, same
    # data -> the version dir is overwritten, counts unchanged
    from demo_otel_parquet_antalya_spark.streaming import rollup as R

    batch_df = spark.read.schema(SCHEMA).json(src)
    vs = R._versions(spark, target)
    inc = (
        batch_df.groupBy(F.window("ts", "1 minute").getField("start").alias("bucket"),
                         F.col("event_type"))
        .agg(F.count("*").alias("n"))
    )
    prior_vs = [v for v in vs if v < vs[-1]]
    assert not prior_vs  # single batch ran
    inc.select("bucket", "event_type", F.col("n").cast("long")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{target}/v={vs[-1]}")

    replayed = {(str(r.bucket), r.event_type, r.n) for r in read_rollup(spark, target).collect()}
    assert replayed == first


def test_q5_routed_through_rollup_matches_raw_scan(spark, tmp_path):
    """The dashboard time-series served from the maintained rollup must
    equal the raw-scan facade Q5 over the same ingested logs — the
    materialized-view routing contract."""
    from demo_otel_parquet_antalya_spark.plans import facade
    from demo_otel_parquet_antalya_spark.sources.generator import generate_files
    from demo_otel_parquet_antalya_spark.sources.otlp import ingest_otlp_json
    from demo_otel_parquet_antalya_spark.streaming.rollup import incremental_rollup

    d = tmp_path / "otlp"
    generate_files(str(d), n_files=4, records_per_file=60)
    logs = ingest_otlp_json(spark, str(d))
    land = str(tmp_path / "land")
    logs.write.parquet(land)

    stream = spark.readStream.schema(logs.schema).parquet(land)
    target, ckpt = str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    q = incremental_rollup(
        stream, target, ckpt,
        bucket="30 seconds", ts_col="timestamp", dim_col="service_name",
    )
    q.awaitTermination()

    routed = facade.q5_timeseries_from_rollup(spark, target)
    raw = facade.q5_timeseries(logs, interval_seconds=30)
    assert sorted(tuple(r) for r in routed.collect()) == sorted(
        tuple(r) for r in raw.collect()
    )
    assert routed.count() > 0


def test_multidim_rollup_matches_batch_and_serves_q3_and_q5(spark, tmp_path):
    """r10 (VERDICT r9 #2): a rollup maintained over a dimension TUPLE
    keeps the columns' own names; the snapshot must equal the batch
    aggregation across micro-batches, and ONE finest-grain
    (bucket, service, severity) snapshot serves BOTH dashboard panels
    exactly — q3 severity-counts by summing over buckets, q5 time-series
    by summing out severity (counts re-aggregate)."""
    import pytest

    from demo_otel_parquet_antalya_spark.plans import facade
    from demo_otel_parquet_antalya_spark.sources.generator import generate_files
    from demo_otel_parquet_antalya_spark.sources.otlp import ingest_otlp_json

    d = tmp_path / "otlp"
    generate_files(str(d), n_files=4, records_per_file=60)
    logs = ingest_otlp_json(spark, str(d))
    land = str(tmp_path / "land")
    logs.write.parquet(land)

    dims = ("service_name", "severity_text")
    stream = (
        spark.readStream.schema(logs.schema)
        .option("maxFilesPerTrigger", 2)  # >1 micro-batch: exercise merge
        .parquet(land)
    )
    target, ckpt = str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    q = incremental_rollup(
        stream, target, ckpt, bucket="30 seconds", ts_col="timestamp",
        dim_cols=dims,
    )
    q.awaitTermination()

    got = {
        (str(r.bucket), r.service_name, r.severity_text, r.n)
        for r in read_rollup(spark, target, dims).collect()
    }
    want = {
        (str(r.bucket), r.service_name, r.severity_text, r.n)
        for r in spark.read.parquet(land)
        .groupBy(
            F.window("timestamp", "30 seconds").getField("start").alias("bucket"),
            "service_name",
            "severity_text",
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want and len(want) > 2

    raw_logs = spark.read.parquet(land)
    routed3 = facade.q3_severity_counts_from_rollup(spark, target, dims)
    raw3 = facade.q3_severity_counts(raw_logs)
    assert sorted(tuple(r) for r in routed3.collect()) == sorted(
        tuple(r) for r in raw3.collect()
    )
    routed5 = facade.q5_timeseries_from_rollup(
        spark, target, dim_cols=dims, series_dim="service_name"
    )
    raw5 = facade.q5_timeseries(raw_logs, interval_seconds=30)
    assert sorted(tuple(r) for r in routed5.collect()) == sorted(
        tuple(r) for r in raw5.collect()
    )
    # a maintained-dimension ad-hoc filter commutes with the
    # re-aggregation: routed == raw under the same filter
    filt = [("severity_text", "=", "ERROR")]
    routed3f = facade.q3_severity_counts_from_rollup(spark, target, dims, filters=filt)
    raw3f = facade.q3_severity_counts(facade.adhoc_filter(raw_logs, filt))
    assert sorted(tuple(r) for r in routed3f.collect()) == sorted(
        tuple(r) for r in raw3f.collect()
    )
    # wrong claimed dims fail loudly BEFORE any snapshot I/O
    with pytest.raises(ValueError, match="maintained"):
        facade.q3_severity_counts_from_rollup(spark, target, ("service_name",))
    # a filter on a non-maintained column fails loudly too
    with pytest.raises(ValueError, match="dimensions"):
        facade.q5_timeseries_from_rollup(
            spark, target, dim_cols=dims, filters=[("body", "=~", "%x%")]
        )


def test_read_rollup_rejects_mismatched_dims(spark, tmp_path):
    """Claiming the wrong dimension tuple must raise, not serve NULLs:
    parquet schema-on-read fills a mis-claimed column with NULL, so a
    single-dim snapshot read as two-dim would produce silently-wrong
    all-null groups (code-review r10, confirmed live before the fix)."""
    import pytest

    rows = [(1, 0, "click"), (2, 10, "view")]
    src = str(tmp_path / "events")
    _write(src, "b1.json", rows)
    target = str(tmp_path / "rollup")
    q = incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src), target, str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    # correct claim reads fine
    assert read_rollup(spark, target, ("event_type",)).count() > 0
    # wrong claim raises with both column sets named
    with pytest.raises(ValueError, match="maintained with"):
        read_rollup(spark, target, ("service_name", "severity_text")).count()
    # ...and the facade route propagates it (serving answers 400)
    from demo_otel_parquet_antalya_spark.plans import facade

    with pytest.raises(ValueError):
        facade.q3_severity_counts_from_rollup(
            spark, target, ("service_name", "severity_text")
        ).count()


def test_q5_series_is_service_name_regardless_of_dim_order(spark, tmp_path):
    """The q5 panel's series is service_name by contract (logs.json), not
    whatever happens to be first in rollup_dims — a reversed tuple used
    to silently serve severity as the series (code-review r10, pass 2)."""
    import pytest

    from demo_otel_parquet_antalya_spark.plans import facade
    from demo_otel_parquet_antalya_spark.sources.generator import generate_files
    from demo_otel_parquet_antalya_spark.sources.otlp import ingest_otlp_json

    d = tmp_path / "otlp"
    generate_files(str(d), n_files=2, records_per_file=40)
    logs = ingest_otlp_json(spark, str(d))
    land = str(tmp_path / "land")
    logs.write.parquet(land)
    dims = ("severity_text", "service_name")  # deliberately reversed
    q = incremental_rollup(
        spark.readStream.schema(logs.schema).parquet(land),
        str(tmp_path / "rollup"), str(tmp_path / "ckpt"),
        bucket="30 seconds", ts_col="timestamp", dim_cols=dims,
    )
    q.awaitTermination()
    routed = facade.q5_timeseries_from_rollup(
        spark, str(tmp_path / "rollup"), dim_cols=dims
    )
    raw = facade.q5_timeseries(spark.read.parquet(land), interval_seconds=30)
    assert sorted(tuple(r) for r in routed.collect()) == sorted(
        tuple(r) for r in raw.collect()
    )
    # a multi-dim rollup without service_name cannot guess a series
    with pytest.raises(ValueError, match="service_name"):
        facade.q5_timeseries_from_rollup(
            spark, str(tmp_path / "rollup"),
            dim_cols=("severity_text", "scope_name"),
        )
    # an explicit series must be a maintained dimension
    with pytest.raises(ValueError, match="maintained"):
        facade.q5_timeseries_from_rollup(
            spark, str(tmp_path / "rollup"), dim_cols=dims, series_dim="body"
        )


def test_rollup_dims_are_strings_by_contract(spark, tmp_path):
    """A non-string dimension is cast to string at write, so committed
    snapshots, the empty-snapshot frame, and every reader agree on one
    typing; a PRE-CONTRACT snapshot that stored an int dimension is cast
    at read (self-healing migration), never rejected — raising would
    brick the restarted maintenance stream, whose merge reads the prior
    version through the same path (code-review r10, pass 3)."""
    rows = [(1, 0, "click"), (2, 10, "view")]
    src = str(tmp_path / "events")
    _write(src, "b1.json", rows)
    target = str(tmp_path / "rollup")
    q = incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src), target,
        str(tmp_path / "ckpt"), dim_cols=("user_id",),  # bigint source
    )
    q.awaitTermination()
    snap = read_rollup(spark, target, ("user_id",))
    assert dict(snap.dtypes)["user_id"] == "string"
    assert {r.user_id for r in snap.collect()} == {"1", "2"}
    # pre-contract snapshot: int-typed dim on disk reads back as string
    legacy = str(tmp_path / "legacy")
    spark.createDataFrame(
        [("2024-01-01 00:00:00", 7, 3)], "bucket string, user_id int, n int"
    ).selectExpr(
        "CAST(bucket AS timestamp) AS bucket", "user_id", "CAST(n AS int) AS n"
    ).write.parquet(f"{legacy}/v=0")
    open(f"{legacy}/v=0/_SUCCESS", "a").close()
    migrated = read_rollup(spark, legacy, ("user_id",))
    assert dict(migrated.dtypes)["user_id"] == "string"
    assert dict(migrated.dtypes)["n"] == "bigint"
    assert [tuple(r)[1:] for r in migrated.collect()] == [("7", 3)]


def test_read_rollup_rejects_foreign_snapshot_types(spark, tmp_path):
    """Dims self-heal by casting, but bucket/n types ARE validated: a
    directory holding some other tool's parquet with the right column
    names and wrong types must fail loudly — casting its n would produce
    silent NULL counts that the maintenance merge writes forward into
    every later version (code-review r10, pass 4)."""
    import pytest

    foreign = str(tmp_path / "foreign")
    spark.createDataFrame(
        [("2024-01-01", "a", "not_a_count")],
        "bucket string, event_type string, n string",
    ).write.parquet(f"{foreign}/v=0")
    open(f"{foreign}/v=0/_SUCCESS", "a").close()
    with pytest.raises(ValueError, match="not a snapshot this rollup wrote"):
        read_rollup(spark, foreign, ("event_type",)).count()


def test_read_rollup_accepts_ntz_buckets(spark, tmp_path):
    """F.window() yields timestamp_ntz when the event-time column is
    TIMESTAMP_NTZ, so snapshots this library wrote under an ntz session
    carry ntz buckets — the foreign-snapshot type validation must accept
    them or a restarted maintenance stream bricks on its own output
    (code-review r10, pass 5)."""
    ntz = str(tmp_path / "ntz")
    spark.createDataFrame(
        [("2024-01-01 00:00:00", "click", 2)],
        "bucket string, event_type string, n long",
    ).selectExpr(
        "CAST(bucket AS timestamp_ntz) AS bucket", "event_type", "n"
    ).write.parquet(f"{ntz}/v=0")
    open(f"{ntz}/v=0/_SUCCESS", "a").close()
    snap = read_rollup(spark, ntz, ("event_type",))
    assert [(r.event_type, r.n) for r in snap.collect()] == [("click", 2)]


# ---------------------------------------------------------------------------
# r11: remote-safe version listing + snapshot retention (VERDICT r10 #1/#2)
# ---------------------------------------------------------------------------


def _run_batches(spark, tmp_path, n_files=4, retain=None):
    """Maintain a rollup over n_files micro-batches — one stream RUN per
    file so batch i deterministically consumes file b{i} (a single run
    with maxFilesPerTrigger=1 maps files to batches in discovery order,
    which is not name order); returns (src, target)."""
    src = str(tmp_path / "events")
    target = str(tmp_path / "rollup")
    for i in range(n_files):
        _write(src, f"b{i}.json", [(10 * i + j, 30 * i + j, "click") for j in range(3)])
        stream = spark.readStream.schema(SCHEMA).json(src)
        q = incremental_rollup(
            stream, target, str(tmp_path / "ckpt"), retain_versions=retain
        )
        q.awaitTermination()
    return src, target


def test_versions_file_scheme_matches_plain_path(spark, tmp_path):
    """A ``file:`` URI target must list the same committed versions as the
    plain local path — the r10 form returned [] for ANY scheme'd path,
    silently serving an empty rollup (VERDICT r10 top directive)."""
    from demo_otel_parquet_antalya_spark.streaming import rollup as R

    _src, target = _run_batches(spark, tmp_path, n_files=3, retain=None)
    plain = R._versions(spark, target)
    assert plain  # sanity: the stream committed versions
    assert R._versions(spark, f"file://{target}") == plain
    assert R._versions(spark, f"file:{target}") == plain
    # end to end: a file:-scheme read serves the snapshot, not empty
    got = read_rollup(spark, f"file://{target}")
    assert got.count() == read_rollup(spark, target).count() > 0


def test_versions_remote_branch_via_hadoop_fs(spark, tmp_path, monkeypatch):
    """The Hadoop-FS glob branch (what an s3a/hdfs root takes) must list
    identically to the local fast path — exercised for real through
    Hadoop's LocalFileSystem by forcing the scheme split to call every
    path remote."""
    from demo_otel_parquet_antalya_spark.streaming import rollup as R

    _src, target = _run_batches(spark, tmp_path, n_files=3, retain=None)
    plain = R._versions(spark, target)
    monkeypatch.setattr(R, "_local_root", lambda p: None)
    assert R._versions(spark, f"file://{target}") == plain
    # an uncommitted version (no _SUCCESS) is invisible remotely too
    import os

    os.makedirs(f"{target}/v=999", exist_ok=True)
    assert R._versions(spark, f"file://{target}") == plain


def test_versions_unknown_remote_scheme_raises_not_empty(spark, tmp_path):
    """A remote scheme with no loadable FileSystem must raise LOUDLY:
    returning [] made read_rollup serve an empty 200 panel and — worse —
    made the maintenance merge silently discard all prior history
    (VERDICT r10 'what's wrong')."""
    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming import rollup as R

    with _pytest.raises(Exception) as exc:
        R._versions(spark, "nosuchfs://bucket/rollup")
    assert "nosuchfs" in str(exc.value).lower()


def test_retention_bounds_versions_and_preserves_counts(spark, tmp_path):
    """With retain_versions=2 the layout holds at most 2 snapshot dirs in
    steady state, and the surviving snapshot still equals the batch
    aggregation of ALL input — retention deletes stale copies, never
    history (each snapshot is complete; VERDICT r10 missing #2)."""
    import os

    from demo_otel_parquet_antalya_spark.streaming import rollup as R

    src, target = _run_batches(spark, tmp_path, n_files=4, retain=2)
    vs = R._versions(spark, target)
    assert len(vs) <= 2
    assert sorted(os.listdir(target)) == [f"v={v}" for v in vs]
    got = {
        (str(r.bucket), r.event_type, r.n) for r in read_rollup(spark, target).collect()
    }
    want = {
        (str(r.bucket), r.event_type, r.n)
        for r in spark.read.schema(SCHEMA)
        .json(src)
        .groupBy(F.window("ts", "1 minute").getField("start").alias("bucket"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_replay_after_vacuum_still_idempotent(spark, tmp_path):
    """Replay safety under retention: a replayed LAST batch merges from
    the newest version strictly below its id, which keep_last>=2 always
    retains — re-running the final merge over the vacuumed layout must
    reproduce the exact committed snapshot."""
    from demo_otel_parquet_antalya_spark.streaming import rollup as R

    src, target = _run_batches(spark, tmp_path, n_files=4, retain=2)
    vs = R._versions(spark, target)
    before = {
        (str(r.bucket), r.event_type, r.n) for r in read_rollup(spark, target).collect()
    }
    # replay the newest batch: its merge base (second-newest version) was
    # retained by the vacuum; its input is the last file in name order
    # (maxFilesPerTrigger=1 feeds files deterministically)
    import os

    last_file = sorted(os.listdir(src))[-1]
    batch_df = spark.read.schema(SCHEMA).json(f"{src}/{last_file}")
    inc = (
        batch_df.groupBy(
            F.window("ts", "1 minute").getField("start").alias("bucket"),
            F.col("event_type").cast("string").alias("event_type"),
        ).agg(F.count("*").alias("n"))
    )
    prior = R._read_version(spark, target, vs[-2], ("event_type",))
    merged = (
        prior.unionByName(inc)
        .groupBy("bucket", "event_type")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    R._commit_snapshot(merged, target, vs[-1], retain_versions=2)
    after = {
        (str(r.bucket), r.event_type, r.n) for r in read_rollup(spark, target).collect()
    }
    assert after == before


def test_vacuum_rejects_unsafe_keep_last(spark, tmp_path):
    """keep_last < 2 could delete the merge base a replayed batch needs —
    refused up front."""
    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.rollup import vacuum_versions

    with _pytest.raises(ValueError, match="keep_last"):
        vacuum_versions(spark, str(tmp_path / "x"), keep_last=1)


def test_dim_col_and_dim_cols_together_raise(spark, tmp_path):
    """Passing BOTH a non-default dim_col and dim_cols used to silently
    ignore dim_col — a migrating caller could believe their dimension was
    maintained when it was not (ADVICE r10)."""
    import pytest as _pytest

    src = str(tmp_path / "events")
    _write(src, "b0.json", [(1, 0, "click")])
    stream = spark.readStream.schema(SCHEMA).json(src)
    with _pytest.raises(ValueError, match="dim_col"):
        incremental_rollup(
            stream, str(tmp_path / "t"), str(tmp_path / "c"),
            dim_col="service_name", dim_cols=("a", "b"),
        )


def test_vacuum_remote_branch_via_hadoop_fs(spark, tmp_path, monkeypatch):
    """The vacuum's Hadoop-FS delete branch (what an s3a/hdfs root takes)
    must remove exactly the versions the local branch would — exercised
    for real through Hadoop's LocalFileSystem by forcing the scheme split
    remote for both the listing and the delete."""
    import os

    from demo_otel_parquet_antalya_spark.streaming import rollup as R

    _src, target = _run_batches(spark, tmp_path, n_files=4, retain=None)
    assert len(R._versions(spark, target)) == 4
    monkeypatch.setattr(R, "_local_root", lambda p: None)
    removed = R.vacuum_versions(spark, f"file://{target}", keep_last=2)
    assert len(removed) == 2
    monkeypatch.undo()
    vs = R._versions(spark, target)
    assert len(vs) == 2
    assert sorted(os.listdir(target)) == [f"v={v}" for v in vs]
    # the snapshot still serves (newest version was retained)
    assert read_rollup(spark, target).count() > 0


def test_vacuum_never_deletes_fresh_checkpoint_commits(spark, tmp_path):
    """A stream restarted over an old target with a FRESH checkpoint
    re-numbers batches from 0; retention must not delete the snapshot the
    new batch just wrote (vacuum is restricted to versions <= the
    committing batch id — code-review r11)."""
    import os

    from demo_otel_parquet_antalya_spark.streaming import rollup as R

    target = str(tmp_path / "rollup")
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "click", 5)], "bucket string, event_type string, n long"
    ).select(F.col("bucket").cast("timestamp"), "event_type", "n")
    # stale history from the previous checkpoint's numbering
    for v in (5, 6, 7):
        df.coalesce(1).write.mode("overwrite").parquet(f"{target}/v={v}")
    assert R._versions(spark, target) == [5, 6, 7]
    # the restarted stream's first batch commits v=0 with retention on
    R._commit_snapshot(df, target, batch_id=0, retain_versions=2)
    vs = R._versions(spark, target)
    assert 0 in vs and vs == [0, 5, 6, 7]  # nothing deleted, v=0 intact
    assert os.path.exists(f"{target}/v=0/_SUCCESS")
    # a standalone ops vacuum (no batch id) still applies plain retention
    removed = R.vacuum_versions(spark, target, keep_last=2)
    assert removed == [0, 5]


def test_retain_versions_validated_at_stream_construction(spark, tmp_path):
    """retain_versions < 2 must fail BEFORE the stream starts, not inside
    the first foreachBatch after data was committed (code-review r11) —
    on all three maintenance streams."""
    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        incremental_m4,
        incremental_sketches,
    )

    src = str(tmp_path / "events")
    _write(src, "b0.json", [(1, 0, "click")])
    stream = spark.readStream.schema(SCHEMA).json(src)
    for ctor in (incremental_rollup, incremental_sketches, incremental_m4):
        with _pytest.raises(ValueError, match="retain_versions"):
            ctor(stream, str(tmp_path / "t"), str(tmp_path / "c"), retain_versions=1)


def test_compact_rollup_grain_exact_and_guarded(spark, tmp_path):
    """r11 (the year-horizon escape hatch SCALE.md's growth bound names):
    a fine-grain rollup compacted to a coarser grain must equal the
    coarse aggregation computed from RAW input (counts re-aggregate
    exactly); a non-multiple grain and a missing source raise."""
    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        compact_rollup_grain,
    )

    src = str(tmp_path / "events")
    rows = [(i, 17 * i, "click" if i % 3 else "view") for i in range(40)]
    _write(src, "b0.json", rows)
    target = str(tmp_path / "rollup")
    q = incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src),
        target, str(tmp_path / "ckpt"), bucket="1 minute",
    )
    q.awaitTermination()

    dst = str(tmp_path / "coarse")
    n = compact_rollup_grain(spark, target, dst, 60, 300)
    got = {
        (str(r.bucket), r.event_type, r.n) for r in read_rollup(spark, dst).collect()
    }
    want = {
        (str(r.bucket), r.event_type, r.n)
        for r in spark.read.schema(SCHEMA)
        .json(src)
        .groupBy(F.window("ts", "5 minutes").getField("start").alias("bucket"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want and n == len(want) > 0
    # idempotent: recompacting the same source overwrites the same version
    assert compact_rollup_grain(spark, target, dst, 60, 300) == n
    # guards
    with _pytest.raises(ValueError, match="multiple"):
        compact_rollup_grain(spark, target, dst, 60, 90)
    with _pytest.raises(ValueError, match="no committed"):
        compact_rollup_grain(spark, str(tmp_path / "nowhere"), dst, 60, 300)
    # older_than: only buckets strictly before the cut coarsen
    cut = "2024-01-01 00:05:00"
    dst2 = str(tmp_path / "coarse2")
    compact_rollup_grain(spark, target, dst2, 60, 300, older_than=cut)
    old_part = {
        (str(r.bucket), r.event_type, r.n) for r in read_rollup(spark, dst2).collect()
    }
    assert old_part == {t for t in want if t[0] < cut}


def test_compact_rollup_grain_vacuums_its_destination(spark, tmp_path):
    """code-review r11: periodic compaction must not accumulate one full
    coarse snapshot per run forever — the destination is vacuumed to
    ``retain_versions`` after each commit, and the newest version always
    survives (it is the one just written)."""
    import os

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        compact_rollup_grain,
        read_rollup,
    )

    src = str(tmp_path / "events")
    target = str(tmp_path / "rollup")
    dst = str(tmp_path / "coarse")
    # advance the source stream between compactions: each run lands a
    # NEW dst version (v=<max src version> grows with the batches)
    for batch in range(5):
        _write(src, f"b{batch}.json", [(batch, 60 * batch + 7, "click")])
        q = incremental_rollup(
            spark.readStream.schema(SCHEMA).json(src),
            target, str(tmp_path / "ckpt"), bucket="1 minute",
        )
        q.awaitTermination()
        compact_rollup_grain(spark, target, dst, 60, 300, retain_versions=2)
    versions = sorted(d for d in os.listdir(dst) if d.startswith("v="))
    assert len(versions) == 2  # bounded, not one per run
    # and the retained newest snapshot is the complete current compaction
    assert read_rollup(spark, dst).agg(F.sum("n")).first()[0] == 5


def test_compact_rollup_grain_floors_pre_epoch_buckets(spark, tmp_path):
    """code-review r11: coarse bucketing must FLOOR, not truncate toward
    zero — a pre-1970 bucket truncated on a negative unix quotient lands
    one coarse bucket HIGH of where facade.time_bucket puts it, so the
    compacted rollup and the q5 re-bucketing route would bin the same
    count differently."""
    import os

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        compact_rollup_grain,
        read_rollup,
    )

    # hand-write a committed fine-grain snapshot with a pre-epoch bucket
    # aligned to 30 s: 1969-12-31 23:59:30 (unix -30)
    import datetime

    target = str(tmp_path / "rollup")
    snap = spark.createDataFrame(
        [(datetime.datetime(1969, 12, 31, 23, 59, 30), "click", 4)],
        "bucket timestamp, event_type string, n long",
    )
    snap.coalesce(1).write.parquet(f"{target}/v=0")
    dst = str(tmp_path / "coarse")
    compact_rollup_grain(spark, target, dst, 30, 300)
    [row] = read_rollup(spark, dst).collect()
    # floor(-30 / 300) = -1 -> 1969-12-31 23:55:00; truncation gives 1970
    assert str(row.bucket) == "1969-12-31 23:55:00"
    assert row.n == 4


def test_spanned_read_serves_mixed_grain_layout_exactly(spark, tmp_path):
    """r12 (VERDICT r11 #1): the mixed-grain union read — fine snapshot
    for buckets >= boundary, compact_rollup_grain output for the tail —
    must re-aggregate to EXACTLY the raw answers, both as a total (q3
    shape) and re-bucketed at a coarse multiple (q5 shape), and must not
    double-count while the fine snapshot still carries the tail."""
    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        RollupRouteIncompatible,
        compact_rollup_grain,
        read_rollup_spanned,
    )
    import pytest as _pytest

    src = str(tmp_path / "events")
    rows = [(i, 17 * i, "click" if i % 3 else "view") for i in range(80)]
    _write(src, "b0.json", rows)
    target = str(tmp_path / "rollup")
    q = incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src),
        target, str(tmp_path / "ckpt"), bucket="1 minute",
    )
    q.awaitTermination()

    # 17*79 s ~ 22 min of data; compact everything before minute 10
    boundary = "2024-01-01 00:10:00"
    coarse_dir = str(tmp_path / "coarse")
    compact_rollup_grain(spark, target, coarse_dir, 60, 300, older_than=boundary)

    spanned = read_rollup_spanned(spark, target, coarse_dir, boundary, 60, 300)
    raw = spark.read.schema(SCHEMA).json(src)

    # q3 shape: totals per dimension equal raw counts (no double-count even
    # though the fine snapshot still contains the compacted tail)
    got = {
        (r.event_type, r.n)
        for r in spanned.groupBy("event_type").agg(F.sum("n").alias("n")).collect()
    }
    want = {
        (r.event_type, r.n)
        for r in raw.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want and got

    # q5 shape: re-bucketed at the coarse grain the union equals raw 5-min
    # windows (fine 60 s rows floor into them; coarse rows map 1:1)
    bucket5 = F.timestamp_seconds(
        (F.floor(F.unix_timestamp("bucket") / 300) * 300).cast("long")
    )
    got5 = {
        (str(r.b), r.event_type, r.n)
        for r in spanned.groupBy(bucket5.alias("b"), "event_type")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    want5 = {
        (str(r.b), r.event_type, r.n)
        for r in raw.groupBy(
            F.window("ts", "5 minutes").getField("start").alias("b"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got5 == want5
    # the split is real: both sides contribute rows
    n_fine = spanned.filter(F.col("bucket") >= F.lit(boundary)).count()
    n_tail = spanned.filter(F.col("bucket") < F.lit(boundary)).count()
    assert n_fine > 0 and n_tail > 0

    # config guards are plain ValueError (serving 400s, never silent raw):
    with _pytest.raises(ValueError, match="not aligned to the coarse"):
        read_rollup_spanned(
            spark, target, coarse_dir, "2024-01-01 00:10:30", 60, 300
        )
    with _pytest.raises(ValueError, match="not a multiple"):
        read_rollup_spanned(spark, target, coarse_dir, boundary, 60, 90)
    # a missing side is a routing incompatibility (auto -> raw fallback)
    with _pytest.raises(RollupRouteIncompatible, match="no committed"):
        read_rollup_spanned(
            spark, target, str(tmp_path / "nowhere"), boundary, 60, 300
        )


def test_span_snapshots_per_row_grain_guard_fires(spark):
    """A snapshot whose buckets are NOT aligned to its claimed grain must
    fail the reading JOB (raise_error in the row guard), never silently
    mis-bin — the same discipline as compact_rollup_grain's guard."""
    import datetime

    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.rollup import span_snapshots

    schema = "bucket timestamp, event_type string, n long"
    fine = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 10, 0), "click", 3)], schema
    )
    # coarse side claims 300 s grain but holds a 00:01:30 bucket
    coarse = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 1, 30), "click", 5)], schema
    )
    spanned = span_snapshots(fine, coarse, "2024-01-01 00:10:00", 60, 300)
    with _pytest.raises(Exception, match="not this rollup's coarse snapshot"):
        spanned.agg(F.sum("n")).collect()
    # mismatched layouts refuse up front
    with _pytest.raises(ValueError, match="not the same rollup"):
        span_snapshots(fine, coarse.withColumnRenamed("event_type", "svc"),
                       "2024-01-01 00:10:00", 60, 300)


def test_tail_trim_bounds_the_maintained_snapshot(spark, tmp_path):
    """r12: the in-stream tail trim is what BOUNDS the maintained fine
    snapshot (the per-batch rewrite was O(all history) forever). The
    boundary must (a) clamp to what the coarse tail provably covers,
    (b) be recorded with the version and drive boundary='auto' spanned
    reads that equal raw, (c) never retreat, and (d) drop late rows
    below it — the documented lateness trade, loud in the contract."""
    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        RollupRouteIncompatible,
        compact_rollup_grain,
        read_rollup,
        read_rollup_spanned,
        read_trim_boundary,
    )
    import pytest as _pytest

    base_epoch = 1704067200  # 2024-01-01 00:00:00 UTC (the _write base)
    src = str(tmp_path / "events")
    target = str(tmp_path / "rollup")
    coarse = str(tmp_path / "coarse")
    ckpt = str(tmp_path / "ckpt")

    # batch 0: 20 minutes of traffic, maintained untrimmed
    _write(src, "b0.json", [(i, 15 * i, "click" if i % 3 else "view") for i in range(80)])
    incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src), target, ckpt, bucket="1 minute",
    ).awaitTermination()

    # compact the first 10 minutes to a 5-minute tail
    cut = "2024-01-01 00:10:00"
    compact_rollup_grain(spark, target, coarse, 60, 300, older_than=cut)

    # batch 1: newer traffic, stream restarted WITH the trim trio.
    # desired = max_ts - 300 floored (well past the cut), coverage =
    # max coarse bucket (00:05) + 300 = 00:10 -> boundary clamps to the
    # compaction cut exactly
    _write(src, "b1.json", [(100 + i, 1260 + 15 * i, "view") for i in range(16)])
    incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src), target, ckpt, bucket="1 minute",
        trim_horizon_s=300, trim_coarse_dir=coarse, trim_coarse_interval_s=300,
    ).awaitTermination()

    tb = read_trim_boundary(spark, target)
    assert tb == (base_epoch + 600, 300)
    fine = read_rollup(spark, target)
    min_bucket = fine.agg(F.min(F.unix_timestamp("bucket"))).first()[0]
    assert min_bucket >= base_epoch + 600  # the tail left the fine snapshot

    # boundary='auto' spanned read == raw over ALL data (both batches)
    raw = spark.read.schema(SCHEMA).json(src)
    spanned = read_rollup_spanned(spark, target, coarse, "auto", 60, 300)
    got = {
        (r.event_type, r.n)
        for r in spanned.groupBy("event_type").agg(F.sum("n").alias("n")).collect()
    }
    want = {
        (r.event_type, r.n)
        for r in raw.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want and got

    # batch 2: one LATE row below the boundary — dropped from the rollup
    # (the coarse tail was compacted without it; raw keeps it), and the
    # boundary does not retreat
    _write(src, "b2.json", [(999, 30, "late")])
    incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src), target, ckpt, bucket="1 minute",
        trim_horizon_s=300, trim_coarse_dir=coarse, trim_coarse_interval_s=300,
    ).awaitTermination()
    assert read_trim_boundary(spark, target)[0] >= base_epoch + 600
    spanned2 = read_rollup_spanned(spark, target, coarse, "auto", 60, 300)
    assert spanned2.filter(F.col("event_type") == "late").count() == 0

    # a stream trimming against an EMPTY coarse dir must trim nothing
    target2, ckpt2 = str(tmp_path / "rollup2"), str(tmp_path / "ckpt2")
    incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src), target2, ckpt2, bucket="1 minute",
        trim_horizon_s=300, trim_coarse_dir=str(tmp_path / "nowhere"),
        trim_coarse_interval_s=300,
    ).awaitTermination()
    assert read_trim_boundary(spark, target2) is None
    assert read_rollup(spark, target2).agg(
        F.min(F.unix_timestamp("bucket"))
    ).first()[0] == base_epoch  # bucket 0 still there

    # boundary='auto' against an untrimmed rollup is a routing
    # incompatibility (auto -> raw), never a silently truncated history
    with _pytest.raises(RollupRouteIncompatible, match="auto"):
        read_rollup_spanned(spark, target2, coarse, "auto", 60, 300)

    # a partial trim trio refuses at stream construction
    with _pytest.raises(ValueError, match="trim"):
        incremental_rollup(
            spark.readStream.schema(SCHEMA).json(src), target2, ckpt2,
            trim_horizon_s=300,
        )


def test_trim_marker_is_sticky_across_trimless_restarts(spark, tmp_path):
    """r12 self-review: trimmed-ness is a property of the merged CONTENT,
    so a stream restarted WITHOUT the trim trio must re-assert the prior
    version's boundary (marker + filter) — otherwise a static-boundary
    spanned reader over a once-trimmed rollup silently misses the buckets
    between its boundary and the real trim, and a late row below the
    boundary would re-introduce a partial bucket the coarse tail owns."""
    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        compact_rollup_grain,
        read_rollup,
        read_trim_boundary,
    )

    base_epoch = 1704067200
    src = str(tmp_path / "events")
    target, coarse, ckpt = (
        str(tmp_path / "rollup"), str(tmp_path / "coarse"), str(tmp_path / "ckpt")
    )
    _write(src, "b0.json", [(i, 15 * i, "click") for i in range(80)])
    incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src), target, ckpt, bucket="1 minute",
    ).awaitTermination()
    compact_rollup_grain(
        spark, target, coarse, 60, 300, older_than="2024-01-01 00:10:00"
    )
    _write(src, "b1.json", [(100 + i, 1260 + 15 * i, "click") for i in range(16)])
    incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src), target, ckpt, bucket="1 minute",
        trim_horizon_s=300, trim_coarse_dir=coarse, trim_coarse_interval_s=300,
    ).awaitTermination()
    assert read_trim_boundary(spark, target) == (base_epoch + 600, 300)

    # restart WITHOUT the trio; the batch carries one late row below the
    # boundary plus fresh traffic — the new version must keep the marker
    # and must NOT re-introduce the late bucket
    _write(src, "b2.json", [(999, 30, "click"), (500, 1600, "click")])
    incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src), target, ckpt, bucket="1 minute",
    ).awaitTermination()
    assert read_trim_boundary(spark, target) == (base_epoch + 600, 300)
    fine = read_rollup(spark, target)
    assert fine.agg(F.min(F.unix_timestamp("bucket"))).first()[0] >= base_epoch + 600
    # the fresh row landed
    assert fine.filter(
        F.unix_timestamp("bucket") == base_epoch + (1600 // 60) * 60
    ).count() == 1


def test_spanned_guards_from_r12_review(spark, tmp_path):
    """code-review r12: (a) a static boundary OLDER than the fine
    snapshot's recorded trim is a stale config — refused, because the
    buckets in between belong to neither side; (b) a coarse dir whose max
    bucket is not aligned to the configured trim grain must fail the
    maintenance batch BEFORE trimming (coverage would be over-claimed and
    the trim would destroy buckets nothing owns)."""
    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        compact_rollup_grain,
        incremental_rollup as _ir,
        read_rollup_spanned,
        read_trim_boundary,
    )

    src = str(tmp_path / "events")
    target, coarse, ckpt = (
        str(tmp_path / "rollup"), str(tmp_path / "coarse"), str(tmp_path / "ckpt")
    )
    _write(src, "b0.json", [(i, 15 * i, "click") for i in range(80)])
    _ir(
        spark.readStream.schema(SCHEMA).json(src), target, ckpt, bucket="1 minute",
    ).awaitTermination()
    compact_rollup_grain(
        spark, target, coarse, 60, 300, older_than="2024-01-01 00:10:00"
    )
    _write(src, "b1.json", [(100 + i, 1260 + 15 * i, "click") for i in range(16)])
    _ir(
        spark.readStream.schema(SCHEMA).json(src), target, ckpt, bucket="1 minute",
        trim_horizon_s=300, trim_coarse_dir=coarse, trim_coarse_interval_s=300,
    ).awaitTermination()
    assert read_trim_boundary(spark, target) == (1704067200 + 600, 300)

    # (a) static boundary below the recorded trim: refuse, don't gap
    with _pytest.raises(ValueError, match="older than the fine snapshot's"):
        read_rollup_spanned(
            spark, target, coarse, "2024-01-01 00:05:00", 60, 300
        )
    # ...while the exact recorded boundary (and 'auto') still serve
    assert read_rollup_spanned(
        spark, target, coarse, "2024-01-01 00:10:00", 60, 300
    ).count() == read_rollup_spanned(spark, target, coarse, "auto", 60, 300).count() > 0

    # (b) trim against a coarse dir at the WRONG claimed grain: the
    # 60 s-bucket fine snapshot itself (max bucket unaligned to 300)
    # stands in for a mis-paired compaction — the batch fails before
    # any trim, and the target keeps its data
    target2, ckpt2 = str(tmp_path / "rollup2"), str(tmp_path / "ckpt2")
    q = _ir(
        spark.readStream.schema(SCHEMA).json(src), target2, ckpt2,
        bucket="1 minute",
        trim_horizon_s=300, trim_coarse_dir=target, trim_coarse_interval_s=300,
    )
    with _pytest.raises(Exception, match="refusing to trim"):
        q.awaitTermination()
    # the guard's whole point: the batch failed BEFORE anything committed
    # or trimmed — target2 has no version at all (code-review r12,
    # second pass: 'raises' alone would stay green if a refactor raised
    # after a partial commit)
    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        _versions,
        read_grain,
    )

    assert _versions(spark, target2) == []

    # (c) DETERMINISTIC grain cross-check (second review pass): the
    # compaction records its grain with the destination, and a trim
    # configured with a DIFFERENT grain refuses even when the max bucket
    # happens to be aligned to it (the probe alone passes 300-vs-600
    # every other commit)
    assert read_grain(spark, coarse) == 300
    q2 = _ir(
        spark.readStream.schema(SCHEMA).json(src), target2, str(tmp_path / "ckpt3"),
        bucket="1 minute",
        trim_horizon_s=300, trim_coarse_dir=coarse, trim_coarse_interval_s=600,
    )
    with _pytest.raises(Exception, match="records grain 300s"):
        q2.awaitTermination()
    assert _versions(spark, target2) == []


def test_spanned_read_guards_from_advice_r12(spark, tmp_path):
    """ADVICE r12: (a, medium) the spanned READ cross-checks the coarse
    side's recorded _grain.json against the configured grain — a coarse
    dir compacted at a different grain passes the boundary-alignment and
    per-row guards (600-aligned buckets are 300-aligned), so without the
    check the top coarse bucket could straddle the split and double-count;
    (b) a static boundary beyond what the coarse tail covers, with the
    fine snapshot still holding the uncovered buckets, is a refused gap
    (ValueError -> 400), while genuinely-empty gaps (fresh deployment,
    quiet period) serve fine; (c) a partial/empty trim marker reads as
    absent, so boundary='auto' routes to raw instead of a json 500."""
    import os

    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        RollupRouteIncompatible,
        _versions,
        compact_rollup_grain,
        read_rollup_spanned,
        read_trim_boundary,
    )

    base = 1704067200  # 2024-01-01 00:00:00 UTC (the _write base)
    src = str(tmp_path / "events")
    target = str(tmp_path / "rollup")
    coarse = str(tmp_path / "coarse")
    # 20 minutes of traffic, untrimmed fine rollup, tail coarsened at 00:10
    _write(src, "b0.json", [(i, 15 * i, "click" if i % 3 else "view") for i in range(80)])
    incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src), target, str(tmp_path / "ckpt"),
        bucket="1 minute",
    ).awaitTermination()
    compact_rollup_grain(spark, target, coarse, 60, 300, older_than="2024-01-01 00:10:00")

    # (a) recorded grain 300 vs configured 600: both pass alignment checks
    # (base+600 is 600-aligned; every 300 s bucket is 300-aligned), only
    # the recorded-grain cross-check can catch it
    with _pytest.raises(ValueError, match="records grain 300s"):
        read_rollup_spanned(spark, target, coarse, "2024-01-01 00:10:00", 60, 600)

    # (b) boundary 00:15 but the coarse tail only covers up to 00:10 and
    # the fine snapshot still holds [00:10, 00:15) — a real gap, refused
    with _pytest.raises(ValueError, match="served by neither side"):
        read_rollup_spanned(spark, target, coarse, "2024-01-01 00:15:00", 60, 300)

    # (b benign, fresh deployment) a committed-but-empty coarse tail with
    # NO fine data below the boundary serves (no false positive)
    empty_coarse = str(tmp_path / "empty_coarse")
    compact_rollup_grain(
        spark, target, empty_coarse, 60, 300, older_than="2024-01-01 00:00:00"
    )
    spanned = read_rollup_spanned(
        spark, target, empty_coarse, "2024-01-01 00:00:00", 60, 300
    )
    raw = spark.read.schema(SCHEMA).json(src)
    assert spanned.agg(F.sum("n")).first()[0] == raw.count()

    # (b benign, quiet period) coverage < boundary but the fine snapshot
    # holds nothing in between: data only below 00:10 and at/after 00:15
    src2 = str(tmp_path / "events2")
    _write(src2, "b0.json",
           [(i, 15 * i, "click") for i in range(40)]        # [00:00, 00:10)
           + [(100 + i, 900 + 15 * i, "click") for i in range(20)])  # >= 00:15
    target2 = str(tmp_path / "rollup2")
    coarse2 = str(tmp_path / "coarse2")
    incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src2), target2,
        str(tmp_path / "ckpt2"), bucket="1 minute",
    ).awaitTermination()
    compact_rollup_grain(
        spark, target2, coarse2, 60, 300, older_than="2024-01-01 00:15:00"
    )
    # max coarse bucket is 00:05 (quiet 00:10-00:15) -> coverage 00:10 <
    # boundary 00:15, but no fine bucket lives in the gap
    spanned2 = read_rollup_spanned(
        spark, target2, coarse2, "2024-01-01 00:15:00", 60, 300
    )
    raw2 = spark.read.schema(SCHEMA).json(src2)
    assert spanned2.agg(F.sum("n")).first()[0] == raw2.count()

    # (c) a torn/empty marker reads as ABSENT: auto -> route incompatible
    # (raw fallback), never a json decode error surfacing as 500
    v = _versions(spark, target)[-1]
    marker = os.path.join(target, f"v={v}", "_trim_boundary.json")
    for content in ("", '{"epoch": 17040', "3"):
        with open(marker, "w") as f:
            f.write(content)
        assert read_trim_boundary(spark, target) is None
        with _pytest.raises(RollupRouteIncompatible, match="auto"):
            read_rollup_spanned(spark, target, coarse, "auto", 60, 300)
    os.remove(marker)

    # the atomic-write discipline leaves no temp droppings behind
    compact_rollup_grain(spark, target, coarse, 60, 300, older_than="2024-01-01 00:10:00")
    cv = _versions(spark, coarse)[-1]
    assert not [
        n for n in os.listdir(os.path.join(coarse, f"v={cv}")) if n.endswith(".tmp")
    ]


def test_grain_marker_records_coverage_and_fallbacks_hold(spark, tmp_path):
    """r13: compact_rollup_grain records the tail's coverage end in the
    grain sidecar, so the spanned gap check and the trim clamp read it as
    METADATA (no per-request / per-batch Spark job). A pre-r13 marker
    (interval only) falls back to deriving coverage with a job — same
    answers; a tampered unaligned coverage refuses the trim."""
    import json as _json
    import os

    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        _read_grain_meta,
        _versions,
        compact_rollup_grain,
        read_rollup_spanned,
    )

    base = 1704067200
    src = str(tmp_path / "events")
    target = str(tmp_path / "rollup")
    coarse = str(tmp_path / "coarse")
    _write(src, "b0.json", [(i, 15 * i, "click" if i % 3 else "view") for i in range(80)])
    incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src), target, str(tmp_path / "ckpt"),
        bucket="1 minute",
    ).awaitTermination()
    compact_rollup_grain(spark, target, coarse, 60, 300, older_than="2024-01-01 00:10:00")

    cv = _versions(spark, coarse)[-1]
    grain, coverage, hwm = _read_grain_meta(spark, coarse, cv)
    # max coarse bucket is 00:05, so the tail owns up to 00:10 exactly;
    # src_hwm (r14) is the SOURCE's max fine bucket start (19:45 -> 1185
    # floored to the minute = 1140)
    assert (grain, coverage, hwm) == (300, base + 600, base + 1140)

    # strip coverage_end (a pre-r13 marker): the spanned read derives the
    # same refusal/serve decisions with the fallback job
    marker = os.path.join(coarse, f"v={cv}", "_grain.json")
    with open(marker, "w") as f:
        f.write(_json.dumps({"interval_s": 300}))
    assert _read_grain_meta(spark, coarse, cv) == (300, None, None)
    raw = spark.read.schema(SCHEMA).json(src)
    spanned = read_rollup_spanned(spark, target, coarse, "2024-01-01 00:10:00", 60, 300)
    assert spanned.agg(F.sum("n")).first()[0] == raw.count()
    with _pytest.raises(ValueError, match="served by neither side"):
        read_rollup_spanned(spark, target, coarse, "2024-01-01 00:15:00", 60, 300)

    # a tampered, unaligned coverage_end refuses the trim before any data
    # could be destroyed
    with open(marker, "w") as f:
        f.write(_json.dumps({"interval_s": 300, "coverage_end": base + 601}))
    _write(src, "b1.json", [(100 + i, 1260 + 15 * i, "view") for i in range(16)])
    q = incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src), target, str(tmp_path / "ckpt"),
        bucket="1 minute",
        trim_horizon_s=300, trim_coarse_dir=coarse, trim_coarse_interval_s=300,
    )
    with _pytest.raises(Exception, match="coverage_end.*not aligned"):
        q.awaitTermination()


def test_compact_rollup_grain_carries_trimmed_tail_forward(spark, tmp_path):
    """r14: the steady-state compaction CADENCE — compact, trim, new data,
    compact again at a later cutoff, repeatedly. The r13 form re-coarsened
    only what the (now trimmed) fine snapshot held, so the second
    compaction overwrote the destination with a version MISSING the
    pre-trim history and the spanned read silently lost counts. Now prior
    destination rows below the source's recorded trim boundary carry
    forward, so the spanned 'auto' read equals raw after EVERY cycle;
    re-runs stay idempotent; a destination that cannot own the trimmed
    tail (short coverage / misaligned trim grain) is refused loudly."""
    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        compact_rollup_grain,
        read_rollup,
        read_rollup_spanned,
    )

    src = str(tmp_path / "events")
    ru, tail, ck = str(tmp_path / "ru"), str(tmp_path / "tail"), str(tmp_path / "ck")

    def _spanned_total():
        return (
            read_rollup_spanned(spark, ru, tail, "auto", 30, 300)
            .agg(F.sum("n")).first()[0]
        )

    def _raw_total():
        return spark.read.schema(SCHEMA).json(src).count()

    # hours 0-3, compact the tail below hour 2, then trim against it
    _write(src, "a.json", [(i, h * 3600 + m * 60, "e")
                           for i, (h, m) in enumerate(
                               (h, m) for h in range(4) for m in range(0, 60, 10))])
    incremental_rollup(
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src),
        ru, ck, bucket="30 seconds",
    ).awaitTermination()
    compact_rollup_grain(spark, ru, tail, 30, 300,
                         older_than="2024-01-01 02:00:00")

    # cycle 1: new hour arrives, trimmed maintenance, compaction advances
    _write(src, "b.json", [(100 + m, 4 * 3600 + m * 60, "e")
                           for m in range(0, 60, 10)])
    incremental_rollup(
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src),
        ru, ck, bucket="30 seconds",
        trim_horizon_s=3600, trim_coarse_dir=tail, trim_coarse_interval_s=300,
    ).awaitTermination()
    n1 = compact_rollup_grain(spark, ru, tail, 30, 300,
                              older_than="2024-01-01 04:00:00")
    assert _spanned_total() == _raw_total() == 30

    # idempotent re-run of the same source version
    assert compact_rollup_grain(spark, ru, tail, 30, 300,
                                older_than="2024-01-01 04:00:00") == n1
    assert _spanned_total() == 30

    # cycle 2: the same cadence again — nothing lost across cycles
    _write(src, "c.json", [(200 + m, 5 * 3600 + m * 60, "e")
                           for m in range(0, 60, 10)])
    incremental_rollup(
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src),
        ru, ck, bucket="30 seconds",
        trim_horizon_s=3600, trim_coarse_dir=tail, trim_coarse_interval_s=300,
    ).awaitTermination()
    compact_rollup_grain(spark, ru, tail, 30, 300,
                         older_than="2024-01-01 05:00:00")
    assert _spanned_total() == _raw_total() == 36
    # ...and the destination alone owns everything below the trim
    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        read_trim_boundary,
    )

    trim_e = read_trim_boundary(spark, ru)[0]
    tail_total = read_rollup(spark, tail).filter(
        F.unix_timestamp("bucket") < trim_e
    ).agg(F.sum("n")).first()[0]
    fine_total = read_rollup(spark, ru).agg(F.sum("n")).first()[0]
    assert tail_total + fine_total >= 36  # overlap allowed above the trim

    # guards: a trimmed source refuses a destination that cannot own its
    # tail — a base whose coverage ends below the trim boundary, and a
    # trim misaligned to the destination grain
    import datetime as _dt

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        _GRAIN_MARKER,
        _write_version_meta,
    )

    short = str(tmp_path / "short_tail")
    spark.createDataFrame(
        [(_dt.datetime(2024, 1, 1, 0, 0, 0), "e", 1)],
        "bucket timestamp, event_type string, n long",
    ).coalesce(1).write.parquet(f"{short}/v=0")
    _write_version_meta(spark, short, 0, _GRAIN_MARKER,
                        {"interval_s": 300, "coverage_end": 1704067500})
    with _pytest.raises(ValueError, match="covers only up to"):
        compact_rollup_grain(spark, ru, short, 30, 300)
    with _pytest.raises(ValueError, match="not aligned to dst_interval_s"):
        compact_rollup_grain(spark, ru, str(tmp_path / "t7"), 30, 700)


def test_trimmed_source_refuses_fresh_destination(spark, tmp_path):
    """code-review r14: a TRIMMED source compacted into a destination with
    no committed version (or an empty one) would commit a tail silently
    missing everything below the trim — the same neither-side class the
    short-coverage guard refuses; now both refuse."""
    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        compact_rollup_grain,
    )

    src = str(tmp_path / "events")
    ru, tail, ck = str(tmp_path / "ru"), str(tmp_path / "tail"), str(tmp_path / "ck")
    _write(src, "a.json", [(i, 15 * i, "e") for i in range(80)])
    incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src), ru, ck, bucket="1 minute",
    ).awaitTermination()
    compact_rollup_grain(spark, ru, tail, 60, 300,
                         older_than="2024-01-01 00:10:00")
    _write(src, "b.json", [(100 + i, 1260 + 15 * i, "e") for i in range(16)])
    incremental_rollup(
        spark.readStream.schema(SCHEMA).json(src), ru, ck, bucket="1 minute",
        trim_horizon_s=300, trim_coarse_dir=tail, trim_coarse_interval_s=300,
    ).awaitTermination()
    with _pytest.raises(ValueError, match="no committed version to carry"):
        compact_rollup_grain(spark, ru, str(tmp_path / "fresh"), 60, 300)
    # the REAL tail still compacts fine
    compact_rollup_grain(spark, ru, tail, 60, 300)

def test_rollup_trim_stale_coverage_cannot_lose_posthoc_arrivals(spark, tmp_path):
    """r14 second review, rollup twin of the M4 case: in-order rows
    landing in the then-live partial coarse bucket AFTER a compaction
    used to be trimmed away once the head advanced far enough for
    desired AND the (stale) coverage_end to allow it — the coarse tail
    never saw them. The trim's third clamp (the compaction's recorded
    src_hwm minus horizon, _safe_trim_cand) stalls the boundary until a
    re-compaction re-coarsens the arrivals, then advances it."""
    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        compact_rollup_grain,
        read_rollup_spanned,
        read_trim_boundary,
    )

    base_epoch = 1704067200
    src = str(tmp_path / "events")
    target = str(tmp_path / "rollup")
    coarse = str(tmp_path / "coarse")
    ckpt = str(tmp_path / "ckpt")
    trim_kw = dict(trim_horizon_s=600, trim_coarse_dir=coarse,
                   trim_coarse_interval_s=300)

    def stream():
        incremental_rollup(
            spark.readStream.schema(SCHEMA).json(src), target, ckpt,
            bucket="1 minute", **trim_kw,
        ).awaitTermination()

    def spanned_equals_raw():
        raw = spark.read.schema(SCHEMA).json(src)
        spanned = read_rollup_spanned(spark, target, coarse, "auto", 60, 300)
        got = {(r.event_type, r.n) for r in spanned.groupBy("event_type")
               .agg(F.sum("n").alias("n")).collect()}
        want = {(r.event_type, r.n) for r in raw.groupBy("event_type")
                .agg(F.count("*").alias("n")).collect()}
        assert got == want and got

    # b0 -> compact covering the LIVE partial coarse bucket [300, 600)
    _write(src, "b0.json", [(i, i * 25, "early") for i in range(23)])  # to 550
    stream()
    compact_rollup_grain(spark, target, coarse, 60, 300,
                         older_than="2024-01-01 00:10:00")
    # b1: in-order arrivals INTO the covered bucket (within horizon of
    # the head at 550); b2: the head jumps so desired (1200) and the
    # stale coverage (600) would both allow trimming b1's bucket 540
    _write(src, "b1.json", [(100, 560, "mid"), (101, 590, "mid")])
    stream()
    _write(src, "b2.json", [(200 + i, 1800 + i * 40, "late") for i in range(6)])
    stream()
    tb = read_trim_boundary(spark, target)
    assert tb is not None and tb[0] < base_epoch + 600  # stalled, not 600
    spanned_equals_raw()  # the 'mid' rows survive in the fine snapshot

    # re-compaction re-coarsens the arrivals and records a fresh hwm
    # (bucket 1980 -> safe 1200); coverage_end stays 600 (the [600,1800)
    # range holds no data, so no coarse bucket extends past it) and now
    # correctly binds: the next batch advances exactly to the coverage
    compact_rollup_grain(spark, target, coarse, 60, 300,
                         older_than="2024-01-01 00:20:00")
    _write(src, "b3.json", [(300 + i, 3000 + i * 30, "tail") for i in range(4)])
    stream()
    assert read_trim_boundary(spark, target) == (base_epoch + 600, 300)
    spanned_equals_raw()  # 'mid' now served from the coarse side

def test_rollup_lifecycle_random_schedules(spark, tmp_path):
    """Rollup twin of the M4 randomized lifecycle sweep: seeded random
    interleavings of {append+maintain (trim trio on/off), grain-compact
    at a random coarse-aligned cutoff + idempotent re-run, strip the
    coarse marker's coverage/hwm fields (the pre-r13/pre-fix marker
    states — the rollup tier's derive-coverage and hwm-fallback paths,
    which the M4 tier refuses by policy)} — asserting after EVERY step
    that per-coarse-bucket, per-dimension sums from what the layout
    serves (spanned 'auto', or the full fine snapshot while no trim
    marker exists) equal direct counts over every raw event ingested.
    Schedules stay in-contract: monotone event time, batch span <= the
    trim horizon."""
    import os
    import random

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        RollupRouteIncompatible,
        compact_rollup_grain,
        read_rollup,
        read_rollup_spanned,
    )

    horizon_s, coarse_s = 600, 300

    for seed in (7, 41):
        rng = random.Random(seed)
        root = tmp_path / f"s{seed}"
        src = str(root / "events")
        target, coarse = str(root / "rollup"), str(root / "coarse")
        ckpt = str(root / "ckpt")
        state = {"off": 0, "uid": 0, "files": 0}

        def direct():
            raw = spark.read.schema(SCHEMA).json(src)
            return {
                (r.cb, r.event_type, r.n)
                for r in raw.groupBy(
                    (F.floor(F.unix_timestamp("ts") / coarse_s)).alias("cb"),
                    "event_type",
                ).agg(F.count("*").alias("n")).collect()
            }

        def served():
            try:
                df = read_rollup_spanned(spark, target, coarse, "auto", 60, coarse_s)
            except RollupRouteIncompatible:
                df = read_rollup(spark, target)
            return {
                (r.cb, r.event_type, r.n)
                for r in df.groupBy(
                    (F.floor(F.unix_timestamp("bucket") / coarse_s)).alias("cb"),
                    "event_type",
                ).agg(F.sum("n").alias("n")).collect()
            }

        def append_and_stream(trim):
            n = rng.randint(5, 25)
            dur = rng.randint(1, 4) * 150  # batch span <= horizon
            rows = [
                (state["uid"] + i, state["off"] + rng.randrange(dur),
                 rng.choice(["view", "click", "buy"]))
                for i in range(n)
            ]
            state["off"] += dur + rng.randrange(300)
            state["uid"] += n
            _write(src, f"f{state['files']}.json", rows)
            state["files"] += 1
            kw = dict(trim_horizon_s=horizon_s, trim_coarse_dir=coarse,
                      trim_coarse_interval_s=coarse_s) if trim else {}
            incremental_rollup(
                spark.readStream.schema(SCHEMA).json(src), target, ckpt,
                bucket="1 minute", **kw,
            ).awaitTermination()

        append_and_stream(trim=rng.random() < 0.5)
        assert served() == direct(), f"seed={seed} after first batch"
        for step in range(6):
            op = rng.choice(["plain", "trim", "trim", "compact", "strip"])
            if op == "compact":
                hi = max(state["off"] // coarse_s, 1)
                cut_epoch = 1704067200 + rng.randint(1, hi) * coarse_s
                import datetime

                cut = datetime.datetime.fromtimestamp(
                    cut_epoch, datetime.timezone.utc
                ).strftime("%Y-%m-%d %H:%M:%S")
                n1 = compact_rollup_grain(spark, target, coarse, 60, coarse_s,
                                          older_than=cut)
                n2 = compact_rollup_grain(spark, target, coarse, 60, coarse_s,
                                          older_than=cut)
                assert n1 == n2, f"seed={seed} step={step} non-idempotent"
            elif op == "strip":
                # degrade the newest coarse marker to its pre-r13 shape
                # (grain only): the next trimming batch must take the
                # derive-coverage job + the hwm fallback, still lossless
                from demo_otel_parquet_antalya_spark.streaming.rollup import (
                    _versions,
                )

                cvs = _versions(spark, coarse)
                if cvs:
                    p = os.path.join(coarse, f"v={cvs[-1]}", "_grain.json")
                    with open(p) as f:
                        d = json.loads(f.read())
                    with open(p, "w") as f:
                        f.write(json.dumps({"interval_s": d["interval_s"]}))
            else:
                append_and_stream(trim=op == "trim")
            assert served() == direct(), f"seed={seed} step={step} op={op}"

def test_fresh_checkpoint_over_existing_state_refused(spark, tmp_path):
    """r14 single-writer guard: a stream with a FRESH checkpoint pointed
    at an existing maintained state restarts batch ids at 0 — it would
    overwrite history versions with un-merged increments and, once its
    ids caught up past the old head, silently discard everything it
    committed below it. The batch now refuses loudly BEFORE any write;
    the original checkpoint keeps resuming fine."""
    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        _versions,
        read_rollup,
    )

    src = str(tmp_path / "events")
    target, ckpt_a = str(tmp_path / "rollup"), str(tmp_path / "ckpt_a")
    _write(src, "b0.json", [(1, 0, "click"), (2, 10, "view")])
    _write(src, "b1.json", [(3, 70, "click")])

    def run(ckpt):
        incremental_rollup(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1).json(src),
            target, ckpt, bucket="1 minute",
        ).awaitTermination()

    run(ckpt_a)
    assert _versions(spark, target)[-1] == 1
    before = {(str(r.bucket), r.event_type, r.n)
              for r in read_rollup(spark, target).collect()}

    # a FRESH checkpoint re-reads b0 as its batch 0 -> refused, state intact
    _write(src, "b2.json", [(4, 130, "view")])
    with _pytest.raises(Exception, match="does not own the existing state"):
        run(str(tmp_path / "ckpt_fresh"))
    assert _versions(spark, target)[-1] == 1
    assert {(str(r.bucket), r.event_type, r.n)
            for r in read_rollup(spark, target).collect()} == before

    # the original checkpoint resumes past the incident and stays exact
    run(ckpt_a)
    want = {
        (str(r.bucket), r.event_type, r.n)
        for r in spark.read.schema(SCHEMA).json(src)
        .groupBy(F.window("ts", "1 minute").getField("start").alias("bucket"),
                 "event_type")
        .agg(F.count("*").alias("n")).collect()
    }
    got = {(str(r.bucket), r.event_type, r.n)
           for r in read_rollup(spark, target).collect()}
    assert got == want
