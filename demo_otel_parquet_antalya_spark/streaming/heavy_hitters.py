"""Streaming heavy hitters: count-min sketch + top-k tracker in bounded state.

The reference's dashboards answer "top services by traffic" with full
re-aggregation per query window (SURVEY.md §2.B Q5/Q6 shapes); this is the
continuous counterpart — an ENGINE EXTENSION like the sessionizer: per
group, a ``applyInPandasWithState`` operator that maintains

- a count-min sketch (``depth`` x ``width`` counters) — the frequency
  oracle: bounded memory regardless of item cardinality, point estimates
  with one-sided error <= traffic/width at ~(1/2)^depth probability;
- a candidate set of the current top ``k`` items by estimated count.

Each micro-batch emits the group's refreshed top-k (update mode). State per
group is depth*width + 2k longs — at 100 TB cardinalities the state store
scales with the number of GROUPS (services, tenants), never with the item
stream (users, trace ids).

Hashes are the affine universal family (a*x + b) mod p mod width with
seeded params — deterministic across runs and executors, so sketches
merge/restore consistently from the checkpoint.

The worker closure is pickled by value; executors need no package install.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

_P = (1 << 31) - 1

OUTPUT_SCHEMA = "grp string, item bigint, est_count bigint, rank int, total_seen bigint"


def _cms_params(depth: int, seed: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _P), rng.randrange(0, _P)) for _ in range(depth)]


def heavy_hitters_stream(
    events: DataFrame,
    k: int = 5,
    depth: int = 4,
    width: int = 1024,
    seed: int = 11,
    group_col: str = "event_type",
    item_col: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """events stream -> per-group top-k item stream (update mode).

    Emits (grp, item, est_count, rank, total_seen) rows per micro-batch;
    ``total_seen`` is the group's cumulative event count, so downstream
    consumers keep the row set with the highest total_seen per group as
    "current".
    """
    params = _cms_params(depth, seed)
    state_schema = "cms array<long>, items array<long>, counts array<long>, total long"

    def track(key, pdf_iter, state):
        import numpy as _np
        import pandas as _pd

        (grp,) = key
        if state.hasTimedOut:  # idle group: drop its sketch
            state.remove()
            return

        new_items = []
        for pdf in pdf_iter:
            new_items.append(pdf["item"].to_numpy(dtype=_np.int64))
        if not new_items:
            return
        x = _np.concatenate(new_items)

        if state.exists:
            cms_flat, items, counts, total = state.get
            cms = _np.array(cms_flat, dtype=_np.int64).reshape(depth, width)
            cand = dict(zip(items, counts))
        else:
            cms = _np.zeros((depth, width), dtype=_np.int64)
            cand = {}
            total = 0

        # one vectorized pass per hash row: bucket every arriving item,
        # bincount the buckets, add into the sketch
        xs = x.astype(_np.uint64)
        for d, (a, b) in enumerate(params):
            buckets = ((_np.uint64(a) * xs + _np.uint64(b)) % _np.uint64(_P)) % _np.uint64(width)
            cms[d] += _np.bincount(buckets.astype(_np.int64), minlength=width)
        total += len(x)

        # candidate maintenance: only items SEEN THIS BATCH can grow, so
        # re-estimating this batch's uniques (joined with the carried
        # candidates) suffices
        uniq = _np.unique(x)
        us = uniq.astype(_np.uint64)
        ests = _np.full(len(uniq), _np.iinfo(_np.int64).max, dtype=_np.int64)
        for d, (a, b) in enumerate(params):
            buckets = ((_np.uint64(a) * us + _np.uint64(b)) % _np.uint64(_P)) % _np.uint64(width)
            ests = _np.minimum(ests, cms[d][buckets.astype(_np.int64)])
        for item, est in zip(uniq.tolist(), ests.tolist()):
            cand[int(item)] = int(est)
        top = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        cand = dict(top)

        state.update(
            (
                [int(v) for v in cms.reshape(-1)],
                [int(i) for i in cand.keys()],
                [int(c) for c in cand.values()],
                int(total),
            )
        )
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 24 * 3600 * 1000)
        yield _pd.DataFrame(
            {
                "grp": [grp] * len(top),
                "item": [i for i, _ in top],
                "est_count": [c for _, c in top],
                "rank": list(range(1, len(top) + 1)),
                "total_seen": [total] * len(top),
            }
        )

    keyed = events.select(
        events[group_col].alias("grp"),
        events[item_col].alias("item"),
        events[ts_col].alias("ts"),
    ).withWatermark("ts", watermark_delay)
    return keyed.groupBy("grp").applyInPandasWithState(
        track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
