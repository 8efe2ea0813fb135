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
    grain, coverage, hwm = _read_grain_meta(spark, coarse_dir, cv)
    # coverage_end = the cutoff; src_hwm (r14) = the SOURCE's max fine
    # bucket start, past the cutoff (the trim clamp's licensing bound)
    assert (grain, coverage) == (14400, cover_to)
    assert hwm is not None and hwm >= cover_to

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


# ---------------------------------------------------------------------------
# r14 (VERDICT r13 #1): the M4 tail trim — the rollup tier's bound ported to
# the last O(history) maintained state in the layout.
# ---------------------------------------------------------------------------

M4_EVENT_SCHEMA = "ts timestamp, event_id bigint, value double"
BASE_EPOCH = 1704067200  # 2024-01-01 00:00:00 UTC


def _write_m4_events(src: str, fname: str, rows):
    """rows: (epoch_offset_s, event_id, value) triples."""
    import os

    base = pd.Timestamp("2024-01-01 00:00:00")
    os.makedirs(src, exist_ok=True)
    with open(f"{src}/{fname}", "w") as f:
        for off, eid, val in rows:
            f.write(json.dumps({
                "ts": str(base + pd.Timedelta(seconds=off)),
                "event_id": eid, "value": val,
            }) + "\n")


def _m4_stream(spark, src):
    return (
        spark.readStream.schema(M4_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )


def test_m4_trim_bounds_state_marker_and_spanned_reads(spark, tmp_path):
    """The trimmed M4 maintenance stream: (a) drops fine pixel buckets the
    coarse tail owns and records the boundary as the rollup tier's
    _trim_boundary.json marker, clamped to coarse coverage; (b) the
    spanned read with boundary='auto' follows the marker and equals BOTH
    the static-boundary read and direct batch M4 over the raw events
    (stream == batch through a trim); (c) the boundary is sticky across a
    restart without the trio, and a row later than the horizon is DROPPED
    (the documented lateness contract)."""
    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        read_trim_boundary,
    )
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        _m4_batch,
        _m4_with_start,
        compact_m4_grain,
        incremental_m4,
        m4_panel,
        m4_remerge,
        read_m4,
        read_m4_spanned,
    )

    src = str(tmp_path / "events")
    m4_dir = str(tmp_path / "m4")
    coarse_dir = str(tmp_path / "m4_tail")
    ckpt = str(tmp_path / "ckpt")
    fine_s, coarse_s, horizon_s = 600, 3600, 7200

    # ~30 h of history at a 10-minute pixel grain (non-default: the grain
    # is parameterized in r14 exactly because real M4 grains are fine)
    hist = [(i * 361, i, float((i * 13) % 71)) for i in range(300)]
    _write_m4_events(src, "b0.json", hist)
    incremental_m4(
        _m4_stream(spark, src), m4_dir, ckpt,
        ts_col="ts", id_col="event_id", value_col="value", interval_s=fine_s,
    ).awaitTermination()
    assert read_trim_boundary(spark, m4_dir) is None  # untrimmed so far

    # compact the first day into the 1 h coarse tail
    boundary = BASE_EPOCH + 86400
    compact_m4_grain(
        spark, m4_dir, coarse_dir, coarse_s, src_interval_s=fine_s,
        older_than_epoch=boundary,
    )

    # resume WITH the trim trio: one new on-time batch around hour 30
    fresh = [(108000 + i * 37, 1000 + i, float(i % 7)) for i in range(40)]
    _write_m4_events(src, "b1.json", fresh)
    incremental_m4(
        _m4_stream(spark, src), m4_dir, ckpt,
        ts_col="ts", id_col="event_id", value_col="value", interval_s=fine_s,
        trim_horizon_s=horizon_s, trim_coarse_dir=coarse_dir,
        trim_coarse_interval_s=coarse_s,
    ).awaitTermination()

    # the desired boundary (max_e - 2 h ~ hour 28) exceeds coarse coverage
    # (hour 24), so the clamp wins: trim == coverage == the compaction cut
    assert read_trim_boundary(spark, m4_dir) == (boundary, coarse_s)
    fine_buckets = [r.bucket for r in read_m4(spark, m4_dir).collect()]
    assert fine_buckets and min(fine_buckets) * fine_s >= boundary

    # spanned auto == spanned static == direct batch M4 over ALL raw rows
    raw = spark.read.schema(M4_EVENT_SCHEMA).json(src)
    direct_daily = {
        (r.bucket_start, r.v_first, r.v_min, r.v_max, r.v_last)
        for r in m4_remerge(
            _m4_with_start(_m4_batch(raw, "ts", "event_id", "value", fine_s), fine_s),
            86400,
        ).collect()
    }
    for b in ("auto", boundary):
        got = {
            (r.bucket_start, r.v_first, r.v_min, r.v_max, r.v_last)
            for r in m4_remerge(
                read_m4_spanned(
                    spark, m4_dir, coarse_dir, b, fine_interval_s=fine_s
                ),
                86400,
            ).collect()
        }
        assert got == direct_daily and len(got) == 2, b

    # the panel frame agrees between auto and static boundaries too
    kw = dict(
        fine_interval_s=fine_s, coarse_dir=coarse_dir,
        coarse_interval_s=coarse_s,
    )
    p_auto = [tuple(r) for r in m4_panel(
        spark, m4_dir, 86400, boundary_epoch="auto", **kw).collect()]
    p_static = [tuple(r) for r in m4_panel(
        spark, m4_dir, 86400, boundary_epoch=boundary, **kw).collect()]
    assert p_auto == p_static and len(p_auto) == 2

    # restart WITHOUT the trio: boundary sticky, late row dropped
    late_and_new = [(3600 * 10, 9999, 999999.0)] + [
        (111600 + i * 31, 2000 + i, float(i % 5)) for i in range(20)
    ]
    _write_m4_events(src, "b2.json", late_and_new)
    incremental_m4(
        _m4_stream(spark, src), m4_dir, ckpt,
        ts_col="ts", id_col="event_id", value_col="value", interval_s=fine_s,
    ).awaitTermination()
    assert read_trim_boundary(spark, m4_dir) == (boundary, coarse_s)
    snap = read_m4(spark, m4_dir)
    assert snap.filter(F.col("bucket") < boundary // fine_s).count() == 0
    assert snap.agg(F.max("v_max")).first()[0] < 999999.0  # late row gone
    # ...and the on-time rows of the restart batch ARE maintained
    assert snap.filter(F.col("bucket") >= 111600 // fine_s).count() > 0


def test_m4_trim_validation_and_markerless_coarse_stall(spark, tmp_path):
    """Constructor guards: partial trio, non-positive values, a coarse
    grain that is not a multiple of the maintained grain. Runtime: a
    coarse dir with NO grain marker proves no coverage for the
    grain-relative M4 buckets, so the trim STALLS (fine snapshot keeps
    the tail, no marker) instead of trusting an unverifiable unit; a
    marker recording a different grain fails the batch loudly."""
    import os

    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        read_trim_boundary,
    )
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        incremental_m4,
        read_m4,
    )

    src = str(tmp_path / "events")
    _write_m4_events(src, "b0.json", [(i * 600, i, float(i)) for i in range(200)])
    stream = _m4_stream(spark, src)

    with _pytest.raises(ValueError, match="ALL of"):
        incremental_m4(stream, "/t", "/c", trim_horizon_s=3600)
    with _pytest.raises(ValueError, match="positive"):
        incremental_m4(stream, "/t", "/c", trim_horizon_s=0,
                       trim_coarse_dir="/x", trim_coarse_interval_s=3600)
    with _pytest.raises(ValueError, match="multiple"):
        incremental_m4(stream, "/t", "/c", interval_s=600,
                       trim_horizon_s=3600, trim_coarse_dir="/x",
                       trim_coarse_interval_s=1000)
    with _pytest.raises(ValueError, match="positive"):
        incremental_m4(stream, "/t", "/c", interval_s=0)

    # markerless coarse dir: grain-relative buckets are unverifiable ->
    # no coverage -> the trim stalls (nothing deleted, no marker)
    m4_dir, ckpt = str(tmp_path / "m4"), str(tmp_path / "ckpt")
    coarse_dir = str(tmp_path / "fake_coarse")
    spark.range(1).selectExpr(
        "CAST(0 AS LONG) bucket", "'k' k_first", "CAST(1 AS DOUBLE) v_first",
        "CAST(1 AS DOUBLE) v_min", "CAST(1 AS DOUBLE) v_max", "'k' k_last",
        "CAST(1 AS DOUBLE) v_last",
    ).coalesce(1).write.parquet(os.path.join(coarse_dir, "v=0"))
    incremental_m4(
        _m4_stream(spark, src), m4_dir, ckpt, interval_s=600,
        trim_horizon_s=600, trim_coarse_dir=coarse_dir,
        trim_coarse_interval_s=3600,
    ).awaitTermination()
    assert read_trim_boundary(spark, m4_dir) is None
    assert read_m4(spark, m4_dir).count() == 200  # every bucket kept

    # grain-mismatch marker: the batch fails loudly instead of trimming
    with open(os.path.join(coarse_dir, "v=0", "_grain.json"), "w") as f:
        f.write(json.dumps({"interval_s": 7200}))
    _write_m4_events(src, "b1.json", [(200 * 600, 999, 1.0)])
    q = incremental_m4(
        _m4_stream(spark, src), m4_dir, ckpt, interval_s=600,
        trim_horizon_s=600, trim_coarse_dir=coarse_dir,
        trim_coarse_interval_s=3600,
    )
    with _pytest.raises(Exception, match="records grain"):
        q.awaitTermination()


def test_m4_fine_grain_recorded_and_restart_mismatch_fails(spark, tmp_path):
    """r14: every maintained M4 commit records its grain; a stream
    restarted with a DIFFERENT interval_s over the same target must fail
    loudly (bucket indices in different units would silently mis-merge),
    and readers cross-check the recorded grain the same way."""
    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.rollup import read_grain
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        incremental_m4,
        m4_panel,
    )

    src = str(tmp_path / "events")
    m4_dir, ckpt = str(tmp_path / "m4"), str(tmp_path / "ckpt")
    _write_m4_events(src, "b0.json", [(i * 97, i, float(i)) for i in range(60)])
    incremental_m4(_m4_stream(spark, src), m4_dir, ckpt, interval_s=600)\
        .awaitTermination()
    assert read_grain(spark, m4_dir) == 600

    _write_m4_events(src, "b1.json", [(9000, 99, 5.0)])
    q = incremental_m4(_m4_stream(spark, src), m4_dir, ckpt, interval_s=300)
    with _pytest.raises(Exception, match="records grain"):
        q.awaitTermination()

    with _pytest.raises(ValueError, match="records grain"):
        m4_panel(spark, m4_dir, 3600, fine_interval_s=300)
    assert m4_panel(spark, m4_dir, 3600, fine_interval_s=600).count() > 0


def test_compact_m4_grain_carries_trimmed_tail_forward(spark, tmp_path):
    """r14: the M4 steady-state compaction cadence — compact, trim, new
    pixels, compact again at a later cutoff. Prior destination rows below
    the source's recorded trim boundary carry forward (the r13 form
    overwrote them with only what the trimmed fine snapshot held —
    silent pixel loss); spanned 'auto' re-merge equals direct batch M4
    over ALL raw events after every cycle; a markerless destination base
    is refused for a trimmed source."""
    import os

    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        _m4_batch,
        _m4_with_start,
        compact_m4_grain,
        incremental_m4,
        m4_remerge,
        read_m4_spanned,
    )

    src = str(tmp_path / "events")
    m4_dir, tail = str(tmp_path / "m4"), str(tmp_path / "m4_tail")
    ckpt = str(tmp_path / "ckpt")
    fine_s, coarse_s = 600, 3600

    def _direct_daily():
        raw = spark.read.schema(M4_EVENT_SCHEMA).json(src)
        return {
            (r.bucket_start, r.v_first, r.v_min, r.v_max, r.v_last)
            for r in m4_remerge(
                _m4_with_start(
                    _m4_batch(raw, "ts", "event_id", "value", fine_s), fine_s
                ), 86400,
            ).collect()
        }

    def _spanned_daily():
        return {
            (r.bucket_start, r.v_first, r.v_min, r.v_max, r.v_last)
            for r in m4_remerge(
                read_m4_spanned(spark, m4_dir, tail, "auto",
                                fine_interval_s=fine_s),
                86400,
            ).collect()
        }

    # ~30 h of history; compact day 1, trim against it
    _write_m4_events(src, "a.json",
                     [(i * 361, i, float((i * 13) % 71)) for i in range(300)])
    incremental_m4(
        _m4_stream(spark, src), m4_dir, ckpt, interval_s=fine_s,
    ).awaitTermination()
    day2 = BASE_EPOCH + 86400
    compact_m4_grain(spark, m4_dir, tail, coarse_s, src_interval_s=fine_s,
                     older_than_epoch=day2)
    _write_m4_events(src, "b.json",
                     [(108000 + i * 37, 1000 + i, float(i % 7)) for i in range(40)])
    incremental_m4(
        _m4_stream(spark, src), m4_dir, ckpt, interval_s=fine_s,
        trim_horizon_s=7200, trim_coarse_dir=tail,
        trim_coarse_interval_s=coarse_s,
    ).awaitTermination()

    # cycle: compaction advances past the trim — prior tail must carry
    n1 = compact_m4_grain(spark, m4_dir, tail, coarse_s,
                          src_interval_s=fine_s,
                          older_than_epoch=day2 + 4 * 3600)
    assert _spanned_daily() == _direct_daily()
    # idempotent re-run
    assert compact_m4_grain(spark, m4_dir, tail, coarse_s,
                            src_interval_s=fine_s,
                            older_than_epoch=day2 + 4 * 3600) == n1
    assert _spanned_daily() == _direct_daily()

    # second cycle with fresh pixels
    _write_m4_events(src, "c.json",
                     [(115200 + i * 53, 2000 + i, float(i % 11)) for i in range(30)])
    incremental_m4(
        _m4_stream(spark, src), m4_dir, ckpt, interval_s=fine_s,
        trim_horizon_s=7200, trim_coarse_dir=tail,
        trim_coarse_interval_s=coarse_s,
    ).awaitTermination()
    compact_m4_grain(spark, m4_dir, tail, coarse_s, src_interval_s=fine_s,
                     older_than_epoch=day2 + 7 * 3600)
    assert _spanned_daily() == _direct_daily()

    # a markerless base cannot be carried for a trimmed source: the base
    # is the newest destination version STRICTLY BELOW the source's
    # latest id (the idempotent-overwrite rule), so strip THAT marker
    from demo_otel_parquet_antalya_spark.streaming.rollup import _versions

    sv = _versions(spark, m4_dir)[-1]
    base_v = [v for v in _versions(spark, tail) if v < sv][-1]
    os.remove(os.path.join(tail, f"v={base_v}", "_grain.json"))
    with _pytest.raises(ValueError, match="records no"):
        compact_m4_grain(spark, m4_dir, tail, coarse_s,
                         src_interval_s=fine_s)


def test_unspanned_reads_refuse_trimmed_snapshots(spark, tmp_path):
    """r14: an UNSPANNED panel over a TRIMMED snapshot would silently
    serve truncated history — refused as RollupRouteIncompatible on both
    tiers (rollup: auto routing falls back to the exact raw scan; M4:
    a 400 naming the spanned configuration, since no raw fallback
    exists). The spanned forms keep serving the same layouts."""
    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.plans.facade import (
        q3_severity_counts_from_rollup,
        q5_timeseries_from_rollup,
    )
    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        RollupRouteIncompatible,
        compact_rollup_grain,
        incremental_rollup,
    )
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        compact_m4_grain,
        incremental_m4,
        m4_panel,
    )

    src = str(tmp_path / "events")
    _write_m4_events(src, "a.json",
                     [(i * 361, i, float((i * 13) % 71)) for i in range(300)])
    boundary = BASE_EPOCH + 86400

    # M4 tier
    m4_dir, m4_tail = str(tmp_path / "m4"), str(tmp_path / "m4_tail")
    incremental_m4(_m4_stream(spark, src), m4_dir, str(tmp_path / "ck1"))\
        .awaitTermination()
    compact_m4_grain(spark, m4_dir, m4_tail, 14400, older_than_epoch=boundary)
    _write_m4_events(src, "b.json", [(108000, 999, 3.0)])
    incremental_m4(
        _m4_stream(spark, src), m4_dir, str(tmp_path / "ck1"),
        trim_horizon_s=7200, trim_coarse_dir=m4_tail,
        trim_coarse_interval_s=14400,
    ).awaitTermination()
    with _pytest.raises(RollupRouteIncompatible, match="is trimmed"):
        m4_panel(spark, m4_dir, 7200)
    assert m4_panel(spark, m4_dir, 14400, coarse_dir=m4_tail,
                    coarse_interval_s=14400,
                    boundary_epoch="auto").count() > 0

    # rollup tier (dims default event_type; reuse event_id as the dim)
    ru, ru_tail = str(tmp_path / "ru"), str(tmp_path / "ru_tail")
    stream = (
        spark.readStream.schema(M4_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1).json(src)
        .selectExpr("ts", "'e' AS service_name", "'INFO' AS severity_text")
    )
    dims = ("service_name", "severity_text")
    incremental_rollup(
        stream, ru, str(tmp_path / "ck2"), bucket="30 seconds",
        ts_col="ts", dim_cols=dims,
    ).awaitTermination()
    compact_rollup_grain(spark, ru, ru_tail, 30, 300, dim_cols=dims,
                         older_than="2024-01-02 00:00:00")
    _write_m4_events(src, "c.json", [(111600, 1000, 1.0)])
    incremental_rollup(
        (spark.readStream.schema(M4_EVENT_SCHEMA)
         .option("maxFilesPerTrigger", 1).json(src)
         .selectExpr("ts", "'e' AS service_name", "'INFO' AS severity_text")),
        ru, str(tmp_path / "ck2"), bucket="30 seconds", ts_col="ts",
        dim_cols=dims,
        trim_horizon_s=3600, trim_coarse_dir=ru_tail,
        trim_coarse_interval_s=300,
    ).awaitTermination()
    with _pytest.raises(RollupRouteIncompatible, match="is trimmed"):
        q5_timeseries_from_rollup(spark, ru, interval_seconds=300,
                                  dim_cols=dims)
    with _pytest.raises(RollupRouteIncompatible, match="is trimmed"):
        q3_severity_counts_from_rollup(spark, ru, dim_cols=dims)


def test_m4_trimmed_source_refuses_fresh_destination(spark, tmp_path):
    """code-review r14 (M4 twin): a trimmed M4 source meeting a fresh
    destination would silently commit a tail missing every pre-trim
    pixel; refused, while the real tail keeps compacting."""
    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        compact_m4_grain,
        incremental_m4,
    )

    src = str(tmp_path / "events")
    m4_dir, tail, ck = str(tmp_path / "m4"), str(tmp_path / "tail"), str(tmp_path / "ck")
    _write_m4_events(src, "a.json",
                     [(i * 361, i, float(i % 7)) for i in range(300)])
    incremental_m4(_m4_stream(spark, src), m4_dir, ck).awaitTermination()
    compact_m4_grain(spark, m4_dir, tail, 14400,
                     older_than_epoch=BASE_EPOCH + 86400)
    _write_m4_events(src, "b.json", [(108000, 999, 3.0)])
    incremental_m4(
        _m4_stream(spark, src), m4_dir, ck, trim_horizon_s=7200,
        trim_coarse_dir=tail, trim_coarse_interval_s=14400,
    ).awaitTermination()
    with _pytest.raises(ValueError, match="no committed version to carry"):
        compact_m4_grain(spark, m4_dir, str(tmp_path / "fresh"), 14400)
    compact_m4_grain(spark, m4_dir, tail, 14400)  # the real tail still works


def test_state_reads_refuse_foreign_snapshots(spark, tmp_path):
    """r14 (probed): spark.read.schema(...) NULL-FILLS columns the files
    lack, so a sketch/M4 read or maintenance merge pointed at a foreign
    directory would silently propagate all-null states (the rollup
    tier's r10 NULL-dims class). Every sketch/M4 state read now
    validates the snapshot's actual columns first."""
    import datetime

    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        incremental_sketches,
        m4_panel,
        read_m4,
        read_sketches,
        sketch_panel,
    )

    # a committed ROLLUP-shaped snapshot standing in for the wrong dir
    foreign = str(tmp_path / "foreign")
    spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 0, 0), "click", 4)],
        "bucket timestamp, event_type string, n long",
    ).coalesce(1).write.parquet(f"{foreign}/v=0")

    for reader in (read_sketches, read_m4):
        with _pytest.raises(ValueError, match="not the expected"):
            reader(spark, foreign).collect()
    with _pytest.raises(ValueError, match="not the expected"):
        sketch_panel(spark, foreign, 3600)
    with _pytest.raises(ValueError, match="not the expected"):
        m4_panel(spark, foreign, 3600)

    # the maintenance MERGE is the dangerous site: batch N>0 reads the
    # newest version below its id as the merge base — stage a legit
    # batch 0, swap its snapshot for the foreign one, resume: the merge
    # must fail the batch, not write null states forward
    import shutil

    src = str(tmp_path / "events")
    target, ckpt = str(tmp_path / "sk"), str(tmp_path / "ckpt")
    _write(src, "b0.json", [(i, i % 5, float(i)) for i in range(20)])
    incremental_sketches(
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src),
        target, ckpt,
    ).awaitTermination()
    shutil.rmtree(f"{target}/v=0")
    shutil.copytree(f"{foreign}/v=0", f"{target}/v=0")
    _write(src, "b1.json", [(3600 + i, i % 5, float(i)) for i in range(20)])
    q = incremental_sketches(
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src),
        target, ckpt,
    )
    with _pytest.raises(Exception, match="not the expected"):
        q.awaitTermination()


def test_all_versioned_state_readers_refuse_foreign_snapshots(spark, tmp_path):
    """r14 sweep of the remaining versioned-state tiers (drift counts,
    reservoir samples, template catalog, CC labels): every pinned-schema
    reader goes through the shared column validation — a foreign
    snapshot raises instead of null-filling."""
    import datetime

    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.cc import read_components
    from demo_otel_parquet_antalya_spark.streaming.drift import read_psi
    from demo_otel_parquet_antalya_spark.streaming.reservoir import read_sample
    from demo_otel_parquet_antalya_spark.streaming.templates import (
        read_template_catalog,
    )

    foreign = str(tmp_path / "foreign")
    spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 0, 0), "click", 4)],
        "bucket timestamp, event_type string, n long",
    ).coalesce(1).write.parquet(f"{foreign}/v=0")

    ref = spark.createDataFrame([("a", 1)], "category string, n long")
    readers = [
        lambda: read_components(spark, foreign),
        lambda: read_psi(spark, foreign, ref),
        lambda: read_sample(spark, foreign, "event_id", ["value"]),
        lambda: read_template_catalog(spark, foreign),
    ]
    for r in readers:
        with _pytest.raises(ValueError, match="not the expected"):
            r().collect()

def test_m4_trim_stale_coverage_cannot_lose_posthoc_arrivals(spark, tmp_path):
    """r14 second review (found while building the randomized lifecycle
    sweep): coverage_end is a bucket-RANGE claim frozen at compaction
    time, so IN-ORDER, in-contract pixels landing in the then-live
    partial coarse bucket AFTER a compaction used to be trimmed from
    fine once the head advanced — without the coarse tail ever having
    seen them (measured: served v_max 35.0 vs direct 999.0). The trim
    now also clamps to the compaction's recorded source high-water mark
    minus the horizon (_safe_trim_cand): the boundary STALLS until a
    re-compaction has re-coarsened the arrivals, then advances."""
    import os

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        read_trim_boundary,
    )
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        _m4_batch,
        _m4_with_start,
        compact_m4_grain,
        incremental_m4,
        m4_remerge,
        read_m4_spanned,
    )

    src = str(tmp_path / "events")
    m4_dir, tail = str(tmp_path / "m4"), str(tmp_path / "tail")
    ckpt = str(tmp_path / "ckpt")
    fine_s, coarse_s, horizon_s = 600, 3600, 7200

    def stream():
        incremental_m4(
            _m4_stream(spark, src), m4_dir, ckpt, interval_s=fine_s,
            trim_horizon_s=horizon_s, trim_coarse_dir=tail,
            trim_coarse_interval_s=coarse_s,
        ).awaitTermination()

    def daily(df):
        return {
            (r.bucket_start, r.v_first, r.v_min, r.v_max, r.v_last)
            for r in m4_remerge(df, 86400).collect()
        }

    def direct_vs_served():
        raw = spark.read.schema(M4_EVENT_SCHEMA).json(src)
        direct = daily(_m4_with_start(
            _m4_batch(raw, "ts", "event_id", "value", fine_s), fine_s))
        served = daily(read_m4_spanned(
            spark, m4_dir, tail, "auto", fine_interval_s=fine_s))
        return direct, served

    # b1 -> compact covering the LIVE partial coarse bucket -> b2 lands
    # more pixels in that covered bucket (in-order, within horizon of the
    # head) -> b3 jumps the head far enough that desired AND coverage
    # would both allow trimming b2's pixels
    _write_m4_events(src, "b1.json", [(i * 100, i, float(i)) for i in range(36)])
    stream()
    compact_m4_grain(spark, m4_dir, tail, coarse_s, src_interval_s=fine_s,
                     older_than_epoch=BASE_EPOCH + coarse_s)
    _write_m4_events(src, "b2.json", [(3550, 100, 999.0), (3590, 101, 888.0)])
    stream()
    _write_m4_events(src, "b3.json",
                     [(10800 + i * 20, 200 + i, float(i)) for i in range(11)])
    stream()

    direct, served = direct_vs_served()
    assert served == direct  # b2's 999.0 v_max survives
    # the boundary stalled BELOW the stale coverage_end instead of
    # trusting it (src_hwm at the compaction was bucket 3000; safe =
    # floor((3000 - 7200) / 3600) * 3600 < 0)
    tb = read_trim_boundary(spark, m4_dir)
    assert tb is not None and tb[0] < BASE_EPOCH + coarse_s

    # a re-compaction re-coarsens b2's pixels and records a fresh hwm
    # (~bucket 10800), re-licensing the advance: the next batch trims to
    # the coverage cut exactly, and nothing is lost
    compact_m4_grain(spark, m4_dir, tail, coarse_s, src_interval_s=fine_s,
                     older_than_epoch=BASE_EPOCH + coarse_s)
    _write_m4_events(src, "b4.json",
                     [(18000 + i * 20, 300 + i, float(i)) for i in range(5)])
    stream()
    assert read_trim_boundary(spark, m4_dir) == (BASE_EPOCH + coarse_s, coarse_s)
    direct, served = direct_vs_served()
    assert served == direct

    # pre-fix marker (no src_hwm): the sound fallback is coverage - one
    # coarse bucket; the boundary holds monotone, still no loss
    from demo_otel_parquet_antalya_spark.streaming.rollup import _versions

    cv = _versions(spark, tail)[-1]
    marker = os.path.join(tail, f"v={cv}", "_grain.json")
    with open(marker) as f:
        d = json.loads(f.read())
    d.pop("src_hwm")
    with open(marker, "w") as f:
        f.write(json.dumps(d))
    _write_m4_events(src, "b5.json", [(25200 + i * 20, 400 + i, 5.0) for i in range(5)])
    stream()
    assert read_trim_boundary(spark, m4_dir) == (BASE_EPOCH + coarse_s, coarse_s)
    direct, served = direct_vs_served()
    assert served == direct

def test_m4_lifecycle_random_schedules(spark, tmp_path):
    """Seeded RANDOM interleavings of the M4 steady-state lifecycle —
    {append+maintain with the trim trio, append+maintain without it,
    grain-compact at a random coarse-aligned cutoff (idempotent re-run
    asserted each time)} — checking after EVERY step that what the
    layout serves equals direct batch M4 over every raw event ever
    ingested: the spanned 'auto' union once a trim boundary exists, the
    full fine snapshot before one (markerless 'auto' must refuse). The
    hand-written cadence tests pin FIXED interleavings; this sweeps the
    schedule space the composition rules (three-way clamped monotone
    trim, carry-forward compaction, sticky boundary) must hold over —
    building this sweep is what surfaced the stale-coverage loss fixed
    in _safe_trim_cand. Schedules stay in-contract: event time advances
    monotonically and each batch spans at most the trim horizon."""
    import random

    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        RollupRouteIncompatible,
    )
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        _m4_batch,
        _m4_with_start,
        compact_m4_grain,
        incremental_m4,
        m4_remerge,
        read_m4,
        read_m4_spanned,
    )

    fine_s, coarse_s, horizon_s = 600, 3600, 7200

    def daily(df):
        return {
            (r.bucket_start, r.v_first, r.v_min, r.v_max, r.v_last)
            for r in m4_remerge(df, 86400).collect()
        }

    for seed in (11, 23):
        rng = random.Random(seed)
        root = tmp_path / f"s{seed}"
        src = str(root / "events")
        m4_dir, tail = str(root / "m4"), str(root / "tail")
        ckpt = str(root / "ckpt")
        state = {"off": 0, "eid": 0, "files": 0}

        def direct():
            raw = spark.read.schema(M4_EVENT_SCHEMA).json(src)
            return daily(_m4_with_start(
                _m4_batch(raw, "ts", "event_id", "value", fine_s), fine_s))

        def served():
            try:
                return daily(read_m4_spanned(
                    spark, m4_dir, tail, "auto", fine_interval_s=fine_s))
            except RollupRouteIncompatible:
                # no trim marker yet <=> nothing ever trimmed: the full
                # fine snapshot is the authoritative history
                return daily(_m4_with_start(read_m4(spark, m4_dir), fine_s))

        def append_and_stream(trim):
            n = rng.randint(5, 30)
            dur = rng.randint(1, 4) * 1800  # batch span <= horizon
            rows = [
                (state["off"] + rng.randrange(dur), state["eid"] + i,
                 float(rng.randrange(1000)) / 8.0)
                for i in range(n)
            ]
            state["off"] += dur + rng.randrange(1200)
            state["eid"] += n
            _write_m4_events(src, f"f{state['files']}.json", rows)
            state["files"] += 1
            kw = dict(trim_horizon_s=horizon_s, trim_coarse_dir=tail,
                      trim_coarse_interval_s=coarse_s) if trim else {}
            incremental_m4(
                _m4_stream(spark, src), m4_dir, ckpt, interval_s=fine_s, **kw,
            ).awaitTermination()

        append_and_stream(trim=rng.random() < 0.5)  # compact needs a snapshot
        assert served() == direct(), f"seed={seed} after first batch"
        for step in range(5):
            op = rng.choice(["plain", "trim", "trim", "compact"])
            if op == "compact":
                hi = max(state["off"] // coarse_s, 1)
                cutoff = BASE_EPOCH + rng.randint(1, hi) * coarse_s
                n1 = compact_m4_grain(
                    spark, m4_dir, tail, coarse_s, src_interval_s=fine_s,
                    older_than_epoch=cutoff,
                )
                n2 = compact_m4_grain(
                    spark, m4_dir, tail, coarse_s, src_interval_s=fine_s,
                    older_than_epoch=cutoff,
                )
                assert n1 == n2, f"seed={seed} step={step} non-idempotent"
            else:
                append_and_stream(trim=op == "trim")
            assert served() == direct(), f"seed={seed} step={step} op={op}"

def test_fresh_checkpoint_refused_on_every_versioned_tier(spark, tmp_path):
    """r14 single-writer guard, swept across the other versioned-state
    maintenance streams (M4, sketches, drift — the rollup tier has its
    own test): a fresh checkpoint over an existing target refuses its
    batch 0 before any write; the state stays intact."""
    import pytest as _pytest

    from demo_otel_parquet_antalya_spark.streaming.drift import (
        incremental_category_counts,
    )
    from demo_otel_parquet_antalya_spark.streaming.rollup import _versions
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        incremental_m4,
        incremental_sketches,
    )

    src = str(tmp_path / "events")
    _write_m4_events(src, "b0.json", [(0, 1, 1.0), (700, 2, 2.0)])
    _write_m4_events(src, "b1.json", [(1400, 3, 3.0)])
    root = str(tmp_path / "states")

    ev = lambda: _m4_stream(spark, src)
    tiers = {
        f"{root}/m4": lambda ck: incremental_m4(
            ev(), f"{root}/m4", ck, interval_s=600),
        f"{root}/sk": lambda ck: incremental_sketches(
            ev(), f"{root}/sk", ck, ts_col="ts", user_col="event_id",
            value_col="value"),
        f"{root}/dr": lambda ck: incremental_category_counts(
            ev().selectExpr("ts", "CAST(event_id AS STRING) AS category"),
            f"{root}/dr", ck, "category"),
    }
    for i, (tdir, start) in enumerate(tiers.items()):
        start(str(tmp_path / f"ck_{i}")).awaitTermination()
        vs_before = _versions(spark, tdir)
        assert vs_before  # committed state exists
        q = start(str(tmp_path / f"ck_fresh_{i}"))
        with _pytest.raises(Exception, match="does not own the existing state"):
            q.awaitTermination()
        assert _versions(spark, tdir) == vs_before, tdir  # intact
