"""Continuous sketch maintenance: merged streaming states answer exactly
like a single batch pass (sketches are exact below their compaction
threshold at this volume), and the read side stays within the published
error bound against the raw data."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.streaming.sketches import (
    incremental_sketches,
    read_sketches,
    sketch_estimates,
)

SCHEMA = "ts timestamp, user_id bigint, value double"


def _write(path, fname, rows):
    import os

    os.makedirs(path, exist_ok=True)
    base = pd.Timestamp("2024-01-01 00:00:00")
    with open(f"{path}/{fname}", "w") as f:
        for off, uid, val in rows:
            f.write(
                json.dumps(
                    {
                        "ts": str(base + pd.Timedelta(seconds=off)),
                        "user_id": uid,
                        "value": val,
                    }
                )
                + "\n"
            )


def test_stream_sketches_match_batch_answers(spark, tmp_path):
    b1 = [(i * 7, i % 40, float(i % 97)) for i in range(120)]
    b2 = [(3600 + i * 5, i % 25, float((i * 3) % 89)) for i in range(100)]
    b3 = [(i * 11 + 1, (i * 13) % 40, float((i * 7) % 61)) for i in range(80)]
    src = str(tmp_path / "events")
    _write(src, "b1.json", b1)
    _write(src, "b2.json", b2)
    _write(src, "b3.json", b3)

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    q = incremental_sketches(stream, str(tmp_path / "sk"), str(tmp_path / "ckpt"))
    q.awaitTermination()

    states = read_sketches(spark, str(tmp_path / "sk"))
    got = {
        str(r.hour): (r.approx_users, r.p50, r.p95)
        for r in sketch_estimates(states).collect()
    }

    raw = spark.read.schema(SCHEMA).json(src)
    exact = {
        str(r.hour): (r.n_users, sorted(r.vals))
        for r in raw.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.collect_list("value").alias("vals"),
        )
        .collect()
    }
    assert got.keys() == exact.keys()
    for hour, (users, p50, p95) in got.items():
        n_users, vals = exact[hour]
        n = len(vals)
        # HLL at this cardinality: within 5%
        assert abs(users - n_users) / n_users <= 0.05, (hour, users, n_users)
        # KLL rank-error contract (k=256 -> ~1.3%; assert 3% + 1/n)
        for quantile, val in ((0.5, p50), (0.95, p95)):
            rank = sum(1 for v in vals if v <= val) / n
            assert abs(rank - quantile) <= 0.03 + 1.0 / n, (hour, quantile, val, rank)


def test_replayed_batch_converges(spark, tmp_path):
    rows = [(i, i % 10, float(i)) for i in range(50)]
    src = str(tmp_path / "events")
    _write(src, "b1.json", rows)
    stream = spark.readStream.schema(SCHEMA).json(src)
    incremental_sketches(
        stream, str(tmp_path / "sk"), str(tmp_path / "ckpt")
    ).awaitTermination()
    before = {
        str(r.hour): (r.approx_users, r.p50, r.p95)
        for r in sketch_estimates(read_sketches(spark, str(tmp_path / "sk"))).collect()
    }
    # replay batch 0 by hand: its merge base is snapshots with id < 0 (none),
    # so the rewritten v=0 must equal the original — no double-merge
    from demo_otel_parquet_antalya_spark.streaming.sketches import _sketch_batch

    batch = spark.read.schema(SCHEMA).json(src)
    _sketch_batch(batch, "ts", "user_id", "value").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "sk" / "v=0"))
    after = {
        str(r.hour): (r.approx_users, r.p50, r.p95)
        for r in sketch_estimates(read_sketches(spark, str(tmp_path / "sk"))).collect()
    }
    assert after == before


def test_stream_m4_equals_batch_m4(spark, tmp_path):
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        _m4_batch,
        incremental_m4,
        read_m4,
    )

    import os

    base = pd.Timestamp("2024-01-01 00:00:00")
    src = str(tmp_path / "events")
    os.makedirs(src, exist_ok=True)
    for fname, rows in (
        ("b1.json", [(i * 97, i, float((i * 13) % 71)) for i in range(60)]),
        ("b2.json", [(3600 + i * 41, 100 + i, float((i * 7) % 53)) for i in range(50)]),
    ):
        with open(f"{src}/{fname}", "w") as f:
            for off, eid, val in rows:
                f.write(
                    json.dumps(
                        {
                            "ts": str(base + pd.Timedelta(seconds=off)),
                            "event_id": eid,
                            "value": val,
                        }
                    )
                    + "\n"
                )

    stream = spark.readStream.schema(
        "ts timestamp, event_id bigint, value double"
    ).option("maxFilesPerTrigger", 1).json(src)
    q = incremental_m4(
        stream, str(tmp_path / "m4"), str(tmp_path / "ckpt"),
        ts_col="ts", id_col="event_id", value_col="value",
    )
    q.awaitTermination()

    got = {
        (r.bucket, r.v_first, r.v_min, r.v_max, r.v_last)
        for r in read_m4(spark, str(tmp_path / "m4")).collect()
    }
    raw = spark.read.schema("ts timestamp, event_id bigint, value double").json(src)
    want = {
        (r.bucket, r.v_first, r.v_min, r.v_max, r.v_last)
        for r in _m4_batch(raw, "ts", "event_id", "value").collect()
    }
    assert got == want and len(got) >= 2


def test_sketch_retention_bounds_versions(spark, tmp_path):
    """r11: the sketch maintenance stream inherits the rollup layout's
    retention — retain_versions bounds the version-dir count while the
    surviving snapshot still answers from ALL batches (states merge,
    never truncate)."""
    import os

    from demo_otel_parquet_antalya_spark.streaming import rollup as R

    src = str(tmp_path / "events")
    target = str(tmp_path / "sk")
    rows = [(i * 7, i % 40, float(i % 97)) for i in range(90)]
    for i in range(3):
        _write(src, f"b{i}.json", rows[30 * i : 30 * (i + 1)])
        q = incremental_sketches(
            spark.readStream.schema(SCHEMA).json(src),
            target, str(tmp_path / "ckpt"), retain_versions=2,
        )
        q.awaitTermination()
    vs = R._versions(spark, target)
    assert len(vs) <= 2
    assert sorted(os.listdir(target)) == [f"v={v}" for v in vs]
    got = {
        str(r.hour): r.approx_users
        for r in sketch_estimates(read_sketches(spark, target)).collect()
    }
    raw = spark.read.schema(SCHEMA).json(src)
    want = {
        str(r.hour): r.users
        for r in raw.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    # HLL at this cardinality is exact in practice; allow sketch error
    assert set(got) == set(want)
    for h, users in want.items():
        assert abs(got[h] - users) <= max(2, int(0.05 * users))


def test_m4_grain_compaction_and_spanned_read_exact(spark, tmp_path):
    """r12: the M4 downsample joins the mixed-grain layout — compact the
    hourly tail to 4 h buckets (exact: min/max re-aggregate outright,
    first/last by their carried arg keys), span at a coarse-aligned
    boundary, re-merge to daily — and the result must equal DIRECT daily
    M4 over the raw events. Guards: misaligned boundary / older_than,
    recorded-grain mismatch, missing side."""
    import os

    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        RollupRouteIncompatible,
        read_grain,
    )
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        _m4_batch,
        _m4_with_start,
        compact_m4_grain,
        incremental_m4,
        m4_remerge,
        read_m4_spanned,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")
    base_epoch = 1704067200
    src = str(tmp_path / "events")
    os.makedirs(src, exist_ok=True)
    # ~30 h of events: the tail below +24 h compacts to 4 h buckets
    with open(f"{src}/b1.json", "w") as f:
        for i in range(300):
            f.write(json.dumps({
                "ts": str(base + pd.Timedelta(seconds=i * 361)),
                "event_id": i, "value": float((i * 13) % 71),
            }) + "\n")
    stream = spark.readStream.schema(
        "ts timestamp, event_id bigint, value double"
    ).json(src)
    m4_dir, coarse_dir = str(tmp_path / "m4"), str(tmp_path / "m4_tail")
    incremental_m4(
        stream, m4_dir, str(tmp_path / "ckpt"),
        ts_col="ts", id_col="event_id", value_col="value",
    ).awaitTermination()

    boundary = base_epoch + 86400  # day 2 start; aligned to 14400
    n = compact_m4_grain(
        spark, m4_dir, coarse_dir, 14400, older_than_epoch=boundary
    )
    assert n > 0 and read_grain(spark, coarse_dir) == 14400

    # spanned + daily re-merge == direct daily M4 over raw
    spanned = read_m4_spanned(spark, m4_dir, coarse_dir, boundary)
    got = {
        (r.bucket_start, r.v_first, r.v_min, r.v_max, r.v_last)
        for r in m4_remerge(spanned, 86400).collect()
    }
    raw = spark.read.schema("ts timestamp, event_id bigint, value double").json(src)
    daily = m4_remerge(
        _m4_with_start(_m4_batch(raw, "ts", "event_id", "value"), 3600), 86400
    )
    want = {
        (r.bucket_start, r.v_first, r.v_min, r.v_max, r.v_last)
        for r in daily.collect()
    }
    assert got == want and len(got) == 2  # both days present, both sides real
    assert spanned.filter(F.col("bucket_start") < boundary).count() > 0
    assert spanned.filter(F.col("bucket_start") >= boundary).count() > 0

    # guards
    with _pytest.raises(ValueError, match="not aligned"):
        compact_m4_grain(spark, m4_dir, coarse_dir, 14400,
                         older_than_epoch=boundary + 3600)
    with _pytest.raises(ValueError, match="multiple"):
        compact_m4_grain(spark, m4_dir, coarse_dir, 5400)
    with _pytest.raises(ValueError, match="not aligned"):
        read_m4_spanned(spark, m4_dir, coarse_dir, boundary + 3600)
    with _pytest.raises(ValueError, match="records grain"):
        read_m4_spanned(spark, m4_dir, coarse_dir, boundary,
                        coarse_interval_s=28800)
    with _pytest.raises(RollupRouteIncompatible, match="no committed"):
        read_m4_spanned(spark, m4_dir, str(tmp_path / "nowhere"), boundary)


def test_m4_panel_unspanned_equals_direct_and_refuses_loudly(spark, tmp_path):
    """r13 (VERDICT r12 #3): the panel frame over a single maintained M4
    snapshot (no coarse tail) re-merges to any multiple of the maintained
    grain exactly; a non-multiple interval and a missing snapshot refuse
    as RollupRouteIncompatible (serving maps them to 400 — the M4 panel
    has no raw fallback); a partial spanned trio is a plain config error."""
    import os

    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        RollupRouteIncompatible,
    )
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        _m4_batch,
        incremental_m4,
        m4_panel,
        m4_remerge,
        _m4_with_start,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")
    src = str(tmp_path / "events")
    os.makedirs(src, exist_ok=True)
    with open(f"{src}/b1.json", "w") as f:
        for i in range(90):
            f.write(
                json.dumps(
                    {
                        "ts": str(base + pd.Timedelta(seconds=i * 397)),
                        "event_id": i,
                        "value": float((i * 13) % 71),
                    }
                )
                + "\n"
            )
    stream = spark.readStream.schema(
        "ts timestamp, event_id bigint, value double"
    ).json(src)
    m4_dir = str(tmp_path / "m4")
    incremental_m4(
        stream, m4_dir, str(tmp_path / "ckpt"),
        ts_col="ts", id_col="event_id", value_col="value",
    ).awaitTermination()

    got = {
        (str(r.t), r.v_first, r.v_min, r.v_max, r.v_last)
        for r in m4_panel(spark, m4_dir, interval_s=7200).collect()
    }
    raw = spark.read.schema("ts timestamp, event_id bigint, value double").json(src)
    want = {
        (str(r.t), r.v_first, r.v_min, r.v_max, r.v_last)
        for r in m4_remerge(
            _m4_with_start(_m4_batch(raw, "ts", "event_id", "value"), 3600), 7200
        )
        .select(
            F.timestamp_seconds("bucket_start").alias("t"),
            "v_first", "v_min", "v_max", "v_last",
        )
        .collect()
    }
    assert got == want and len(got) >= 2

    with _pytest.raises(RollupRouteIncompatible, match="not a positive multiple"):
        m4_panel(spark, m4_dir, interval_s=5400)
    with _pytest.raises(RollupRouteIncompatible, match="no committed"):
        m4_panel(spark, str(tmp_path / "nowhere"), interval_s=7200)
    with _pytest.raises(ValueError, match="ALL of"):
        m4_panel(spark, m4_dir, interval_s=7200, coarse_dir="/x")


def test_m4_spanned_gap_check_and_coverage_marker(spark, tmp_path):
    """r13 (the rollup tier's ADVICE-r12 gap check, applied to its M4
    twin): a boundary beyond what the coarse tail covers is refused when
    the fine state still holds the uncovered buckets (silent missing
    pixels otherwise); benign cases — boundary at coverage, genuinely no
    data in the gap — serve. compact_m4_grain records coverage_end in the
    grain sidecar so the steady-state check is a metadata read; a pre-r13
    interval-only marker falls back to deriving coverage with a job."""
    import json as _json
    import os

    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        _read_grain_meta,
        _versions,
    )
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        compact_m4_grain,
        incremental_m4,
        read_m4_spanned,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")
    base_epoch = 1704067200
    src = str(tmp_path / "events")
    os.makedirs(src, exist_ok=True)
    # ~30 h of events
    with open(f"{src}/b1.json", "w") as f:
        for i in range(300):
            f.write(json.dumps({
                "ts": str(base + pd.Timedelta(seconds=i * 361)),
                "event_id": i, "value": float((i * 13) % 71),
            }) + "\n")
    m4_dir, coarse_dir = str(tmp_path / "m4"), str(tmp_path / "m4_tail")
    incremental_m4(
        spark.readStream.schema("ts timestamp, event_id bigint, value double").json(src),
        m4_dir, str(tmp_path / "ckpt"),
        ts_col="ts", id_col="event_id", value_col="value",
    ).awaitTermination()

    # tail compacted only up to hour 12; coverage_end recorded with it
    cover_to = base_epoch + 43200
    compact_m4_grain(spark, m4_dir, coarse_dir, 14400, older_than_epoch=cover_to)
    cv = _versions(spark, coarse_dir)[-1]
    assert _read_grain_meta(spark, coarse_dir, cv) == (14400, cover_to)

    # boundary at exactly the coverage end: serves (no gap)
    assert read_m4_spanned(spark, m4_dir, coarse_dir, cover_to).count() > 0
    # boundary a day past it: the fine state holds [12 h, 24 h) — refused
    with _pytest.raises(ValueError, match="served by neither side"):
        read_m4_spanned(spark, m4_dir, coarse_dir, base_epoch + 86400)

    # pre-r13 marker (interval only): same decisions via the fallback job
    marker = os.path.join(coarse_dir, f"v={cv}", "_grain.json")
    with open(marker, "w") as f:
        f.write(_json.dumps({"interval_s": 14400}))
    assert read_m4_spanned(spark, m4_dir, coarse_dir, cover_to).count() > 0
    with _pytest.raises(ValueError, match="served by neither side"):
        read_m4_spanned(spark, m4_dir, coarse_dir, base_epoch + 86400)


def test_sketch_panel_refuses_missing_snapshot_and_bad_interval(spark, tmp_path):
    """r13: the approx panel's library core refuses a never-committed
    snapshot and a non-hour-multiple interval as RollupRouteIncompatible
    (the serving layer maps both to 400 — no raw fallback exists)."""
    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        RollupRouteIncompatible,
    )
    from demo_otel_parquet_antalya_spark.streaming.sketches import sketch_panel

    with _pytest.raises(RollupRouteIncompatible, match="no committed"):
        sketch_panel(spark, str(tmp_path / "nowhere"), 86400)
    with _pytest.raises(RollupRouteIncompatible, match="not a positive multiple"):
        sketch_panel(spark, str(tmp_path / "nowhere"), 5400)
