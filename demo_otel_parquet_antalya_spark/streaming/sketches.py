"""Continuously-maintained sketch states: distinct-users (HLL) and value
quantiles (KLL) per hour, kept as MERGEABLE BINARY STATES in the versioned
snapshot layout.

The batch queries (approx_hll_rollup_merge, approx_kll_quantile_rollup)
show the read side: daily answers from hourly states without rescanning
raw events. This module is the write side a live pipeline needs: each
micro-batch sketches ITS rows (one map-side-combined aggregate), then the
new states merge with the prior snapshot's states via the sketch-union
aggregates — datasketches states are associative/commutative, so the
merged state equals the state a single pass over all data would have
built (within the sketch's published error), and snapshot size stays
bounded by hour-key cardinality times sketch size, independent of stream
volume.

Replay discipline is rollup.py's: a batch writes snapshot ``v=<batch_id>``
merged from the newest snapshot with a SMALLER id, so crash-replays
converge instead of double-merging. (HLL union is idempotent outright;
KLL merge is not, so the versioned-base rule is what carries exactly-once
semantics for it.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.streaming.rollup import (
    RollupRouteIncompatible,
    _GRAIN_MARKER,
    _check_retain,
    _commit_snapshot,
    _read_grain_meta,
    _versions,
    _write_version_meta,
)

SKETCH_SCHEMA = "hour timestamp, hll binary, kll binary"


def read_sketches(spark: SparkSession, target_dir: str) -> DataFrame:
    vs = _versions(spark, target_dir)
    if not vs:
        return spark.createDataFrame([], SKETCH_SCHEMA)
    return spark.read.schema(SKETCH_SCHEMA).parquet(f"{target_dir}/v={vs[-1]}")


def sketch_estimates(states: DataFrame) -> DataFrame:
    """Read hourly states out as answers: distinct users + p50/p95."""
    return states.select(
        "hour",
        F.expr("CAST(hll_sketch_estimate(hll) AS BIGINT)").alias("approx_users"),
        F.round(F.expr("kll_sketch_get_quantile_double(kll, 0.5)"), 6).alias("p50"),
        F.round(F.expr("kll_sketch_get_quantile_double(kll, 0.95)"), 6).alias("p95"),
    )


def _sketch_batch(df: DataFrame, ts_col: str, user_col: str, value_col: str) -> DataFrame:
    # CAST to double: kll_sketch_agg_double hard-requires FLOAT/DOUBLE and
    # integer value columns are common (e.g. severity_number) — a lossless
    # widening here beats every caller failing at stream runtime (r13,
    # surfaced by the serving bench maintaining sketches over the logs
    # warehouse). No-op for already-double columns.
    return df.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("hour")).agg(
        F.expr(f"hll_sketch_agg({user_col})").alias("hll"),
        F.expr(f"kll_sketch_agg_double(CAST({value_col} AS DOUBLE), 256)").alias("kll"),
    )


def incremental_sketches(
    events: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark_delay: str = "10 minutes",
    retain_versions: int | None = 3,
):
    """Start the sketch-maintenance stream; returns the StreamingQuery.
    ``retain_versions`` vacuums all but the newest N snapshot versions
    after each commit (rollup.vacuum_versions' replay-safety rule)."""
    _check_retain(retain_versions)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = _sketch_batch(batch_df, ts_col, user_col, value_col)
        prior_vs = [v for v in _versions(spark, target_dir) if v < batch_id]
        if prior_vs:
            prior = spark.read.schema(SKETCH_SCHEMA).parquet(
                f"{target_dir}/v={prior_vs[-1]}"
            )
            merged = (
                prior.unionByName(inc)
                .groupBy("hour")
                .agg(
                    F.expr("hll_union_agg(hll)").alias("hll"),
                    F.expr("kll_merge_agg_double(kll, 256)").alias("kll"),
                )
            )
        else:
            merged = inc
        _commit_snapshot(merged, target_dir, batch_id, retain_versions)

    keyed = events.withWatermark(ts_col, watermark_delay)
    return (
        keyed.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Continuous M4 downsampling state: first/min/max/last per time bucket are
# all re-aggregable (min/max outright; first/last by carrying their
# (ts, tiebreak) argument keys), so the pixel-perfect dashboard reduction
# can be maintained per micro-batch in the same versioned layout — a
# Grafana panel then reads ~2k tiny rows, never raw events.
# ---------------------------------------------------------------------------

M4_SCHEMA = (
    "bucket long, k_first string, v_first double, v_min double, "
    "v_max double, k_last string, v_last double"
)


def _m4_batch(df: DataFrame, ts_col: str, id_col: str, value_col: str) -> DataFrame:
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / 3600).cast("long")
    # orderable composite key for first/last: zero-padded epoch-micros + id
    key = F.concat_ws(
        "#",
        F.lpad(F.unix_micros(F.col(ts_col)).cast("string"), 20, "0"),
        F.lpad(F.col(id_col).cast("string"), 20, "0"),
    )
    return (
        df.select(bucket.alias("bucket"), key.alias("k"), F.col(value_col).alias("v"))
        .groupBy("bucket")
        .agg(
            F.expr("min_by(k, k)").alias("k_first"),
            F.expr("min_by(v, k)").alias("v_first"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
            F.expr("max_by(k, k)").alias("k_last"),
            F.expr("max_by(v, k)").alias("v_last"),
        )
    )


def _m4_merge(states: DataFrame) -> DataFrame:
    return states.groupBy("bucket").agg(
        F.expr("min_by(k_first, k_first)").alias("k_first"),
        F.expr("min_by(v_first, k_first)").alias("v_first"),
        F.min("v_min").alias("v_min"),
        F.max("v_max").alias("v_max"),
        F.expr("max_by(k_last, k_last)").alias("k_last"),
        F.expr("max_by(v_last, k_last)").alias("v_last"),
    )


def read_m4(spark: SparkSession, target_dir: str) -> DataFrame:
    vs = _versions(spark, target_dir)
    if not vs:
        return spark.createDataFrame([], M4_SCHEMA)
    return spark.read.schema(M4_SCHEMA).parquet(f"{target_dir}/v={vs[-1]}")


def incremental_m4(
    events: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark_delay: str = "10 minutes",
    retain_versions: int | None = 3,
):
    """Maintain the M4 dashboard reduction continuously; returns the
    query. ``retain_versions`` as in ``incremental_sketches``."""
    _check_retain(retain_versions)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = _m4_batch(batch_df, ts_col, id_col, value_col)
        prior_vs = [v for v in _versions(spark, target_dir) if v < batch_id]
        if prior_vs:
            prior = spark.read.schema(M4_SCHEMA).parquet(
                f"{target_dir}/v={prior_vs[-1]}"
            )
            merged = _m4_merge(prior.unionByName(inc))
        else:
            merged = inc
        _commit_snapshot(merged, target_dir, batch_id, retain_versions)

    keyed = events.withWatermark(ts_col, watermark_delay)
    return (
        keyed.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Mixed-grain M4 (r12): all six M4 stats re-aggregate exactly across ANY
# grain coarsening — min/max outright, first/last because the state CARRIES
# their composite (epoch-micros, id) argument keys — so the rollup tier's
# steady-state layout (fine recent history + coarse long tail,
# rollup.compact_rollup_grain / span_snapshots) extends to the M4
# downsample unchanged in spirit: compact the tail to a coarser pixel
# grain, span the two snapshots at a boundary, re-merge to any multiple of
# the coarse grain.
# ---------------------------------------------------------------------------

# the maintained stream's bucket unit (_m4_batch floors unix seconds by it)
M4_INTERVAL_S = 3600


def m4_remerge(states: DataFrame, interval_s: int) -> DataFrame:
    """Re-aggregate M4 rows carrying a ``bucket_start`` epoch column to
    ``interval_s`` buckets — exact at any coarsening (the arg keys travel).
    Returns rows in the M4 state shape plus ``bucket_start``."""
    coarse = (F.floor(F.col("bucket_start") / interval_s) * interval_s).cast("long")
    return (
        states.groupBy(coarse.alias("bucket_start"))
        .agg(
            F.expr("min_by(k_first, k_first)").alias("k_first"),
            F.expr("min_by(v_first, k_first)").alias("v_first"),
            F.min("v_min").alias("v_min"),
            F.max("v_max").alias("v_max"),
            F.expr("max_by(k_last, k_last)").alias("k_last"),
            F.expr("max_by(v_last, k_last)").alias("v_last"),
        )
    )


def _m4_with_start(states: DataFrame, interval_s: int) -> DataFrame:
    """Convert an M4 snapshot's index-unit ``bucket`` to an absolute
    ``bucket_start`` epoch column, so snapshots of DIFFERENT grains become
    comparable (the maintained snapshot indexes hours; a compacted one
    indexes its own coarser grain)."""
    return states.withColumn(
        "bucket_start", (F.col("bucket") * interval_s).cast("long")
    ).drop("bucket")


def compact_m4_grain(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    dst_interval_s: int,
    src_interval_s: int = M4_INTERVAL_S,
    older_than_epoch: int | None = None,
    retain_versions: int | None = 3,
) -> int:
    """Re-aggregate the maintained M4 snapshot into a coarser pixel grain
    (the M4 twin of ``rollup.compact_rollup_grain``): exact, because every
    M4 stat re-aggregates with its carried arg keys. The destination's
    ``bucket`` column is in DST-interval units (the same
    floor(unix/interval) convention as the source) and the destination
    version records its grain (``_grain.json``), so the spanned reader can
    cross-check the configured grain deterministically.
    ``older_than_epoch`` (epoch seconds, must be dst-aligned) compacts only
    buckets starting strictly before it; ``retain_versions`` vacuums the
    destination as in the rollup compaction (None keeps all versions).
    Returns the number of coarse rows written."""
    _check_retain(retain_versions)
    if src_interval_s <= 0 or dst_interval_s <= 0 or dst_interval_s % src_interval_s:
        raise ValueError(
            f"dst_interval_s={dst_interval_s} is not a positive multiple "
            f"of src_interval_s={src_interval_s} — M4 buckets would mis-bin"
        )
    if older_than_epoch is not None and older_than_epoch % dst_interval_s:
        raise ValueError(
            f"older_than_epoch={older_than_epoch} is not aligned to the "
            f"{dst_interval_s}s destination grain — the compacted tail "
            "would cut a coarse bucket"
        )
    vs = _versions(spark, src_dir)
    if not vs:
        raise ValueError(f"no committed M4 snapshot under {src_dir!r}")
    snap = _m4_with_start(
        spark.read.schema(M4_SCHEMA).parquet(f"{src_dir}/v={vs[-1]}"),
        src_interval_s,
    )
    if older_than_epoch is not None:
        snap = snap.filter(F.col("bucket_start") < F.lit(older_than_epoch))
    out = m4_remerge(snap, dst_interval_s).select(
        (F.col("bucket_start") / dst_interval_s).cast("long").alias("bucket"),
        "k_first", "v_first", "v_min", "v_max", "k_last", "v_last",
    )
    from pyspark.sql import Observation

    obs = Observation()
    out = out.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.max("bucket").alias("max_b"),
    )
    _commit_snapshot(out, dst_dir, vs[-1], retain_versions, grain_s=dst_interval_s)
    rows = obs.get["rows"]
    max_b = obs.get["max_b"]
    if max_b is not None:
        # record the tail's coverage end (first epoch second it does NOT
        # own) next to the grain, the rollup tier's r13 discipline: the
        # spanned reader's gap check then costs a metadata read, not a
        # job. Crash window leaves the interval-only marker -> readers
        # derive coverage with one job instead (same answers).
        _write_version_meta(
            spark, dst_dir, vs[-1], _GRAIN_MARKER,
            {
                "interval_s": int(dst_interval_s),
                "coverage_end": (int(max_b) + 1) * int(dst_interval_s),
            },
        )
    return rows


def read_m4_spanned(
    spark: SparkSession,
    fine_dir: str,
    coarse_dir: str,
    boundary_epoch: int,
    fine_interval_s: int = M4_INTERVAL_S,
    coarse_interval_s: int | None = None,
) -> DataFrame:
    """The mixed-grain M4 union: bucket starts ``>= boundary_epoch`` from
    the fine snapshot, ``< boundary_epoch`` from the compacted tail, in
    the absolute ``bucket_start`` shape ``m4_remerge`` consumes. The
    boundary must be aligned to the COARSE grain; the coarse side's
    recorded ``_grain.json`` is cross-checked against the configured
    ``coarse_interval_s`` (plain ValueError — config mismatch), a
    missing side raises ``RollupRouteIncompatible`` (serve from raw),
    and a boundary beyond the coarse tail's recorded/derived coverage is
    refused when the fine state still holds the uncovered buckets (the
    rollup tier's gap check, r13 — see the inline comment). Exact for
    any downstream re-merge whose interval is a multiple of the coarse
    grain — same argument as ``rollup.span_snapshots``, with the arg
    keys carrying first/last."""
    cvs = _versions(spark, coarse_dir)
    if not cvs:
        raise RollupRouteIncompatible(
            f"no committed M4 snapshot under {coarse_dir!r} yet"
        )
    cv = cvs[-1]
    recorded, coverage = _read_grain_meta(spark, coarse_dir, cv)
    if coarse_interval_s is None:
        if recorded is None:
            raise ValueError(
                f"coarse M4 snapshot at {coarse_dir!r} records no grain "
                "marker — pass coarse_interval_s explicitly"
            )
        coarse_interval_s = recorded
    elif recorded is not None and recorded != coarse_interval_s:
        raise ValueError(
            f"coarse M4 snapshot at {coarse_dir!r} records grain "
            f"{recorded}s, not the configured {coarse_interval_s}s — "
            "wrong grain or wrong directory"
        )
    if fine_interval_s <= 0 or coarse_interval_s % fine_interval_s:
        raise ValueError(
            f"coarse_interval_s={coarse_interval_s} is not a multiple of "
            f"fine_interval_s={fine_interval_s} — not this M4's compaction"
        )
    if boundary_epoch % coarse_interval_s:
        raise ValueError(
            f"boundary epoch {boundary_epoch} is not aligned to the "
            f"coarse {coarse_interval_s}s grain — the split would cut a "
            "bucket"
        )
    fvs = _versions(spark, fine_dir)
    if not fvs:
        raise RollupRouteIncompatible(
            f"no committed M4 snapshot under {fine_dir!r} yet"
        )
    fine_all = _m4_with_start(
        spark.read.schema(M4_SCHEMA).parquet(f"{fine_dir}/v={fvs[-1]}"),
        fine_interval_s,
    )
    # gap refusal (r13, the rollup tier's ADVICE-r12 check applied to its
    # M4 twin): a boundary beyond what the coarse tail covers would drop
    # buckets in [coverage end, boundary) from BOTH sides even though the
    # (never-trimmed) fine M4 state still holds them — silent missing
    # pixels. Exact probe: only raises when the fine side actually holds
    # such a bucket, so fresh deployments / quiet periods serve fine.
    # Coverage reads from the grain sidecar (metadata); pre-r13 markers
    # derive it with one column-pruned job.
    if coverage is None:
        cov = (
            spark.read.schema(M4_SCHEMA).parquet(f"{coarse_dir}/v={cv}")
            .agg(F.max("bucket").alias("b"))
            .first()
        )
        coverage = None if cov.b is None else (int(cov.b) + 1) * coarse_interval_s
    if coverage is None or coverage < boundary_epoch:
        gap = fine_all.filter(F.col("bucket_start") < F.lit(boundary_epoch))
        if coverage is not None:
            gap = gap.filter(F.col("bucket_start") >= F.lit(coverage))
        if gap.select("bucket_start").limit(1).count():
            raise ValueError(
                f"M4 span boundary (epoch {boundary_epoch}) exceeds what "
                f"the coarse snapshot at {coarse_dir!r} covers (up to "
                f"{coverage if coverage is not None else 'nothing'}) and "
                "the fine snapshot still holds buckets in between — they "
                "would be served by neither side; re-run the grain "
                "compaction or lower the boundary"
            )
    fine = fine_all.filter(F.col("bucket_start") >= F.lit(boundary_epoch))
    coarse = _m4_with_start(
        spark.read.schema(M4_SCHEMA).parquet(f"{coarse_dir}/v={cv}"),
        coarse_interval_s,
    ).filter(F.col("bucket_start") < F.lit(boundary_epoch))
    return fine.unionByName(coarse)


def m4_panel(
    spark: SparkSession,
    fine_dir: str,
    interval_s: int,
    fine_interval_s: int = M4_INTERVAL_S,
    coarse_dir: str | None = None,
    coarse_interval_s: int | None = None,
    boundary_epoch: int | None = None,
    start=None,
    end=None,
) -> DataFrame:
    """The downsample PANEL frame (r13, VERDICT r12 #3): per ``interval_s``
    pixel bucket, the four M4 stats (first/min/max/last of the maintained
    value) read from the maintained snapshot — never raw events. With the
    spanned trio (``coarse_dir``, ``coarse_interval_s``,
    ``boundary_epoch``) the read spans the mixed-grain layout
    (``read_m4_spanned``); without it, the latest fine snapshot alone.

    Exactness rule, refused loudly when unmet (``RollupRouteIncompatible``
    — serving maps it to 400, because unlike the count rollup there is NO
    raw fallback route: the M4 state is the production source and raw
    events may be beyond retention at the panel's horizon):
    ``interval_s`` must be a positive multiple of the layout's coarsest
    grain (the coarse grain when spanned, else the maintained grain).
    The internal first/last ARG KEYS are re-merge machinery and stay out
    of the panel payload.

    ``start`` / ``end`` (optional; ISO timestamp or epoch int) window the
    panel to pixel buckets in ``[start, end)``. Both must be aligned to
    the REQUESTED ``interval_s`` (a window that cuts a pixel bucket has
    no exact answer from the state — plain ValueError, a 400 on the
    serving path, never silently-wrong edge pixels). The filter applies
    to the base buckets BEFORE the re-merge (equivalent, since the
    window is a whole number of output pixels, and cheaper)."""
    spanned_cfg = (coarse_dir, coarse_interval_s, boundary_epoch)
    if any(v is not None for v in spanned_cfg) and any(
        v is None for v in spanned_cfg
    ):
        raise ValueError(
            "spanned M4 serving needs ALL of coarse_dir, coarse_interval_s "
            "and boundary_epoch — a partial trio would silently serve "
            "single-snapshot history"
        )
    if coarse_dir is not None:
        base_grain = int(coarse_interval_s)
        states = read_m4_spanned(
            spark, fine_dir, coarse_dir, boundary_epoch,
            fine_interval_s=fine_interval_s,
            coarse_interval_s=coarse_interval_s,
        )
    else:
        base_grain = int(fine_interval_s)
        vs = _versions(spark, fine_dir)
        if not vs:
            raise RollupRouteIncompatible(
                f"no committed M4 snapshot under {fine_dir!r} yet"
            )
        states = _m4_with_start(
            spark.read.schema(M4_SCHEMA).parquet(f"{fine_dir}/v={vs[-1]}"),
            fine_interval_s,
        )
    if interval_s <= 0 or interval_s % base_grain:
        raise RollupRouteIncompatible(
            f"interval={interval_s}s is not a positive multiple of the "
            f"maintained M4 grain ({base_grain}s) — the snapshot cannot "
            "serve it exactly"
        )
    # window on WHOLE output pixels: resolve each edge against the
    # requested interval (rollup._boundary_epoch validates alignment and
    # parses ISO/epoch with session-timezone semantics)
    from demo_otel_parquet_antalya_spark.streaming.rollup import _boundary_epoch

    if start is not None:
        states = states.filter(
            F.col("bucket_start") >= F.lit(_boundary_epoch(spark, start, interval_s))
        )
    if end is not None:
        states = states.filter(
            F.col("bucket_start") < F.lit(_boundary_epoch(spark, end, interval_s))
        )
    return (
        m4_remerge(states, interval_s)
        .select(
            F.timestamp_seconds(F.col("bucket_start")).alias("t"),
            "v_first", "v_min", "v_max", "v_last",
        )
        .orderBy("t")
    )


def sketch_panel(
    spark: SparkSession,
    sketch_dir: str,
    interval_s: int = 3600,
    start=None,
    end=None,
) -> DataFrame:
    """The approx-analytics PANEL frame (r13): distinct users (HLL) and
    value p50/p95 (KLL) per ``interval_s`` bucket, read from the
    continuously-maintained hourly sketch states — never raw events.
    Coarser buckets re-MERGE the states (``hll_union_agg`` /
    ``kll_merge_agg_double`` — the same mergeability the maintenance
    stream itself relies on), so a daily panel touches 24 tiny state
    rows per day, independent of raw volume.

    Same serving contract as ``m4_panel``: NO raw fallback (the sketch
    state is the production source; raw may be beyond retention), so a
    missing snapshot or a non-hour-multiple ``interval_s`` raises
    ``RollupRouteIncompatible`` (a 400 at the endpoint) instead of a
    silent rescan; ``start``/``end`` window on WHOLE output buckets
    (edges must align to ``interval_s`` — a cut bucket has no exact
    state answer). Estimates carry the sketches' published error —
    approximate BY CONTRACT, which is why this family's queries are
    rows-only in the oracle suite (t2-exempt); the serving test pins
    HTTP == the library's own merge over the same state instead."""
    if interval_s <= 0 or interval_s % 3600:
        raise RollupRouteIncompatible(
            f"interval={interval_s}s is not a positive multiple of the "
            "maintained hourly sketch grain — the states cannot serve it "
            "exactly"
        )
    vs = _versions(spark, sketch_dir)
    if not vs:
        raise RollupRouteIncompatible(
            f"no committed sketch snapshot under {sketch_dir!r} yet"
        )
    states = spark.read.schema(SKETCH_SCHEMA).parquet(f"{sketch_dir}/v={vs[-1]}")
    from demo_otel_parquet_antalya_spark.streaming.rollup import _boundary_epoch

    if start is not None:
        states = states.filter(
            F.unix_timestamp("hour") >= F.lit(_boundary_epoch(spark, start, interval_s))
        )
    if end is not None:
        states = states.filter(
            F.unix_timestamp("hour") < F.lit(_boundary_epoch(spark, end, interval_s))
        )
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp("hour") / interval_s).cast("long") * interval_s
    )
    merged = states.groupBy(bucket.alias("t")).agg(
        F.expr("hll_union_agg(hll)").alias("hll"),
        F.expr("kll_merge_agg_double(kll, 256)").alias("kll"),
    )
    return merged.select(
        "t",
        F.expr("CAST(hll_sketch_estimate(hll) AS BIGINT)").alias("approx_users"),
        F.round(F.expr("kll_sketch_get_quantile_double(kll, 0.5)"), 6).alias("p50"),
        F.round(F.expr("kll_sketch_get_quantile_double(kll, 0.95)"), 6).alias("p95"),
    ).orderBy("t")
