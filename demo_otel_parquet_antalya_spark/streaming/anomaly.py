"""Streaming EWMA anomaly detection on per-key event rates.

Continuous counterpart of the batch ``anomaly_rolling_zscore`` registry
query (plans/registry.py): where the batch pass scores each hour against a
trailing window, this operator keeps an exponentially-weighted mean and
variance of the per-minute event rate PER KEY in ``applyInPandasWithState``
state and flags buckets whose rate deviates more than ``threshold`` sigma —
the "alert when a service's log rate jumps" shape the reference's dashboards
only answer by re-querying (SURVEY.md §2.B Q5/Q6).

State per key is four scalars (mean, var, last bucket, bucket count) —
O(|keys|) total, independent of event volume, so the state store survives
any stream rate. EWMA needs no window buffer, which is exactly why it is
the streaming-native choice over a literal trailing-window z-score.

Semantics:
- arriving rows are bucketed to the minute inside the operator; buckets are
  processed in ascending order, each scored BEFORE it updates the moments
  (a bucket never explains away its own spike);
- the first ``warmup`` buckets of a key are never flagged (moments are
  still forming);
- buckets at or before the key's last processed bucket are dropped — late
  data beyond the watermark is the watermark's problem, not the sketch's.

The worker closure is pickled by value; executors need no package install.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = (
    "grp string, bucket timestamp, n bigint, "
    "ewma_mean double, ewma_std double, zscore double, is_anomaly boolean"
)

STATE_SCHEMA = "mean double, var double, last_bucket long, n_buckets long"


def ewma_anomaly_stream(
    events: DataFrame,
    alpha: float = 0.3,
    threshold: float = 3.0,
    warmup: int = 3,
    group_col: str = "event_type",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """events stream -> per-(key, minute-bucket) anomaly verdict stream.

    Emits one row per completed (key, bucket) with the rate, the moments
    BEFORE the bucket's update, the z-score, and the flag (append-friendly
    update mode).
    """

    def detect(key, pdf_iter, state):
        import math as _math

        import pandas as _pd

        (grp,) = key
        if state.hasTimedOut:
            state.remove()
            return

        frames = [pdf for pdf in pdf_iter]
        if not frames:
            return
        pdf = _pd.concat(frames)
        counts = (
            pdf.assign(bucket=pdf["ts"].dt.floor("min"))
            .groupby("bucket")
            .size()
            .sort_index()
        )

        if state.exists:
            mean, var, last_bucket, n_buckets = state.get
        else:
            mean, var, last_bucket, n_buckets = 0.0, 0.0, -1, 0

        out = {k: [] for k in ("bucket", "n", "ewma_mean", "ewma_std", "zscore", "is_anomaly")}
        for bucket, n in counts.items():
            epoch = int(bucket.value // 1_000_000_000)
            if epoch <= last_bucket:
                continue  # late duplicate of an already-scored bucket
            n = int(n)
            if n_buckets == 0:
                mean, var = float(n), 0.0
                z, flag = 0.0, False
            else:
                std = _math.sqrt(var)
                z = (n - mean) / std if std > 0 else 0.0
                flag = n_buckets >= warmup and abs(z) > threshold
                # score with the OLD moments, then fold the bucket in
                var = (1 - alpha) * (var + alpha * (n - mean) ** 2)
                mean = alpha * n + (1 - alpha) * mean
            out["bucket"].append(bucket)
            out["n"].append(n)
            out["ewma_mean"].append(mean)
            out["ewma_std"].append(_math.sqrt(var))
            out["zscore"].append(z)
            out["is_anomaly"].append(flag)
            last_bucket = epoch
            n_buckets += 1

        state.update((float(mean), float(var), int(last_bucket), int(n_buckets)))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 24 * 3600 * 1000)
        if out["bucket"]:
            yield _pd.DataFrame({"grp": [grp] * len(out["bucket"]), **out})

    keyed = events.select(
        events[group_col].alias("grp"), events[ts_col].alias("ts")
    ).withWatermark("ts", watermark_delay)
    return keyed.groupBy("grp").applyInPandasWithState(
        detect,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def ewma_reference_batch(bucket_counts: list[tuple[str, int]], alpha: float, threshold: float, warmup: int):
    """Plain-Python oracle for tests: same math over an ordered bucket
    series; returns list of (n, mean_after, z, flag)."""
    import math

    mean, var, n_buckets = 0.0, 0.0, 0
    out = []
    for _bucket, n in bucket_counts:
        if n_buckets == 0:
            mean, var = float(n), 0.0
            out.append((n, mean, 0.0, False))
        else:
            std = math.sqrt(var)
            z = (n - mean) / std if std > 0 else 0.0
            flag = n_buckets >= warmup and abs(z) > threshold
            var = (1 - alpha) * (var + alpha * (n - mean) ** 2)
            mean = alpha * n + (1 - alpha) * mean
            out.append((n, mean, z, flag))
        n_buckets += 1
    return out
