"""Graph analytics over relational edge lists: weighted PageRank.

Complements ``dedup.connected_components`` (the other iterative graph
operator): CC answers "which nodes belong together", PageRank answers
"which nodes matter" — e.g. document centrality inside near-dup clusters,
or supplier importance in an order-flow graph, the classic
quality-weighting signal for training-data curation (PageRank: Page,
Brin, Motwani, Winograd 1999).

Scale shape: one edge-list equi-join + one keyed aggregation per
iteration, with the iteration count FIXED (not convergence-tested) so the
result is a deterministic function of the edge list — which is what lets
a relational oracle replay it as K unrolled join+aggregate rounds. Each
round's lineage is truncated with localCheckpoint, exactly like the CC
loop; the edge frame and out-degree table are computed once and cached.

Semantics (standard damped PageRank on a WEIGHTED directed graph):
  rank_0(n)   = 1 / N
  rank_i+1(n) = (1 - d) / N + d * sum_{(s -> n) in E} rank_i(s) * w(s, n) / out_w(s)
where out_w(s) is s's total outgoing weight and N the number of distinct
nodes (union of sources and destinations). Dangling-node mass (nodes with
no out-edges) is dropped, not redistributed — the simplest published
variant; the oracle mirrors it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# Per-round state tables (ranks / hub-authority scores / labels) hold ONE
# row per node. At or below a limiting node count the state is BROADCAST
# into the static edge frame — the fastest measured small-graph shape (no
# edge-side exchange, no second edge layout, trade graph at sf0.1: 9.6 s vs
# 10.3 s end-to-end). Above it a multi-MB broadcast per half-step loses to
# exchanging the state table, so the edge list is hash-partitioned on the
# per-round join key and persist()ed: an InMemoryTableScan REPORTS its
# child's outputPartitioning, so every round's ShuffledHashJoin reuses the
# layout with zero edge-side exchange or sort (10M-edge/4M-node synthetic:
# iteration wall halves vs the checkpoint shape). label_propagation is the
# one exception on the broadcast path (r15): its per-round aggregate is
# keyed on an EDGE-cardinality key (votes), so it lays the augmented edge
# frame out by the aggregate key even when state broadcasts — see
# _iter_layout.
#
# The limit itself is DERIVED from the session (r12, VERDICT r11 #4): node
# count was only ever a proxy for state BYTES vs broadcast cost, and the
# r11 100k constant was a box measurement that would be wrong in one
# direction or the other on any real cluster. Estimated per-row state
# bytes (measured avg key width + 8 for the score/label) against the
# session's own spark.sql.autoBroadcastJoinThreshold, scaled down by the
# executor count (every executor holds a full copy, while the shuffle
# alternative moves the node-sized state once) — see
# derived_broadcast_state_max. The r11 bracketing points stay correctly
# classified by the derived default (~131k at the stock 10 MiB threshold
# on one executor: 48k nodes/1.8M edges broadcast-wins 5.5 s vs 9.7 s;
# 160k nodes/4.4M edges partitioned-wins 12.1 s vs 15.5 s) without the
# hand-tuned constant. Set this module global to an int to pin the old
# fixed-limit behavior session-wide, or pass broadcast_state_max per call.
#
# localCheckpoint CANNOT serve the partitioned path: a checkpointed frame
# scans back as ExistingRDD with UnknownPartitioning(0), so the previous
# "pre-partition the edge list once, every iteration reuses this layout"
# comments here were FALSE — each round silently re-exchanged AND re-sorted
# the full edge list (found by the r11 profile of graph_hits_trade).
BROADCAST_STATE_MAX: int | None = None

# In-memory + build overhead per broadcast-hash-relation entry beyond the
# key/value payload: the UnsafeRow object + BytesToBytesMap entry pointers
# + load-factor slack. 64 B is deliberately conservative (Spark's own
# relation builds run ~40-80 B/entry depending on key type); with the
# +8 B score and 8-20 B keys it puts the stock-conf single-executor
# crossover at ~120-130k nodes, inside the r11 measured bracket
# (48k broadcast-wins, 160k partitioned-wins).
HASH_RELATION_ROW_BYTES = 64

# UnsafeRow fixed-width types: 8 bytes in the row regardless of rendered
# string length (octet_length of the cast would overestimate a bigint id)
_FIXED_WIDTH_8 = frozenset(
    {"tinyint", "smallint", "int", "bigint", "float", "double", "date", "timestamp"}
)


def derived_broadcast_state_max(spark, avg_key_bytes: float = 8.0) -> int:
    """Max node count whose per-round state table still broadcasts
    profitably, derived from the session instead of a box constant:

      threshold_bytes / ((HASH_RELATION_ROW_BYTES + avg_key_bytes + 8)
                         × executor_count)

    ``spark.sql.autoBroadcastJoinThreshold`` is the cluster's own stated
    judgment of how large a broadcast relation may be; a disabled
    threshold (<= 0) is honored — the operator never broadcasts state the
    planner was told not to. Executor count scales the allowance down
    because every executor receives a full copy of the per-round state
    while the partitioned-layout alternative moves it across the cluster
    once — on a 100-executor cluster the derived limit is 100× smaller,
    which errs toward the scale-safe partitioned path."""
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        thresh = int(raw)
    except ValueError:
        jvm = spark.sparkContext._jvm
        thresh = int(
            jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
        )
    if thresh <= 0:
        return 0
    # executor JVM count; local mode reports only the driver entry -> 1
    n_exec = max(
        1, spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
    )
    # Dynamic-allocation floor (VERDICT r12): at job start an autoscaling
    # cluster's REGISTERED count can read low (executors not yet granted),
    # which RAISES the derived limit — the unsafe direction, because the
    # broadcast lands on every executor the cluster scales up to. When the
    # session declares a scaling ceiling, size against it instead of the
    # momentary registration; a ceiling left at Spark's infinity default
    # is ignored (it is not a statement about cluster size). Static
    # clusters and local mode are unaffected.
    if (
        str(spark.conf.get("spark.dynamicAllocation.enabled", "false")).lower()
        == "true"
    ):
        for key in (
            "spark.dynamicAllocation.maxExecutors",
            "spark.executor.instances",
        ):
            declared = spark.conf.get(key, None)
            try:
                ceiling = int(declared)
            except (TypeError, ValueError):
                continue
            if 0 < ceiling < 2**31 - 1:  # set, finite (not the Int.MaxValue default)
                n_exec = max(n_exec, ceiling)
                break
    row_bytes = HASH_RELATION_ROW_BYTES + avg_key_bytes + 8.0
    return int(thresh // (row_bytes * n_exec))


def _pick_small(nodes: DataFrame, key: str, broadcast_state_max) -> tuple[int, bool]:
    """(node count, use-broadcast-state?) in ONE aggregate job over the
    node-sized frame: the count every loop already paid, fused with the
    average UnsafeRow key width the derived limit needs. Resolution order:
    explicit per-call limit, then a pinned module global, then the
    conf-derived default."""
    dt = dict(nodes.dtypes).get(key)
    if dt in _FIXED_WIDTH_8:
        width = F.lit(8.0)
    else:
        # variable-width: 8 B offset/len word + the encoded bytes
        width = F.octet_length(F.col(key).cast("string")) + F.lit(8.0)
    row = nodes.agg(F.count("*").alias("n"), F.avg(width).alias("w")).first()
    n_nodes = int(row.n)
    limit = broadcast_state_max
    if limit is None:
        limit = BROADCAST_STATE_MAX
    if limit is None:
        limit = derived_broadcast_state_max(
            nodes.sparkSession, float(row.w) if row.w is not None else 8.0
        )
    return n_nodes, n_nodes <= limit


def _iter_layout(e: DataFrame, key: str, small: bool = False) -> DataFrame:
    """The static edge frame an iterative operator joins every round:
    the already-materialized canonical frame itself when the per-node
    state is broadcast-sized (the probe side's layout is irrelevant under
    a broadcast join), else a persist()ed hash layout on ``key`` —
    persist preserves outputPartitioning where localCheckpoint erases it
    (see ``BROADCAST_STATE_MAX``). The key is the per-round JOIN key on
    the partitioned-state path (the node-sized state shuffles into the
    layout, zero edge-side exchange). Callers whose per-round aggregate
    is keyed on an EDGE-cardinality key (label_propagation's vote stream)
    pass small=False with the AGGREGATE key instead, which makes the
    keyed count above the broadcast join exchange-free — measured A/B in
    the r15 optimization round: a win exactly when the per-round exchange
    it removes is edge-sized (LP votes), a loss when it is node-sized
    partials (pagerank/HITS contribs: +1 layout shuffle, 32 near-empty
    tasks per round, jobs +2 — rejected for those)."""
    if small:
        return e
    out = e.repartition(key).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        out.count()  # materialize now: rounds must reuse, never recompute
    except BaseException:
        # a failed materialization must not leave the CacheManager entry
        # registered for the session's lifetime (code-review r11, third
        # pass: the callers' finally blocks only cover layouts that were
        # successfully built)
        out.unpersist()
        raise
    return out


def _state_side(state: DataFrame, small: bool) -> DataFrame:
    """How the per-round state table enters an edge join: broadcast when
    the node count is small; else a shuffle_hash hint — build the
    per-partition hash from the (node-sized) state side and STREAM the
    partition-aligned persisted edges, sorting neither side."""
    return F.broadcast(state) if small else state.hint("shuffle_hash")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    k: int = 6,
    damping: float = 0.85,
    checkpoint_interval: int = 3,
    broadcast_state_max: int | None = None,
) -> DataFrame:
    """(node, rank) after exactly ``k`` damped power-iteration rounds.

    ``edges`` is a directed edge list; ``weight`` (optional) weights each
    edge's contribution, default 1.0. Parallel edges are legal (their
    weights add). Deterministic given the edge list: fixed iteration
    count, no convergence test — by design, so relational oracles can
    replay the exact computation. Below ``broadcast_state_max`` nodes the
    contrib table is broadcast into the canonical edge frame each round;
    above it the edge list is persist()ed hash-partitioned on ``src`` and
    each round shuffle-hash-joins the contrib table into that layout —
    both paths compute the identical result (see ``BROADCAST_STATE_MAX``
    for why the old checkpoint-the-partitioned-frame shape was wrong).
    """
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        (F.col(weight) if weight else F.lit(1.0)).cast("double").alias("w"),
    )
    # collapse parallel edges once so every iteration joins the minimal
    # list; the out-weight normalization references the collapsed frame
    # twice in ONE plan — the collapse EXCHANGE is computed once
    # (ReusedExchange; the aggregate above it still evaluates per branch,
    # which is CPU only — the upstream edges source is never re-scanned
    # while exchange reuse holds), and the checkpoint after the join is
    # the single materialization every round reuses
    e = e.groupBy("src", "dst").agg(F.sum("w").alias("w"))
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .localCheckpoint(eager=True)
    )

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # one bounded aggregate: node count + avg key width for the derived limit
    n_nodes, small = _pick_small(nodes, "node", broadcast_state_max)
    e = _iter_layout(e, "src", small)
    base = (1.0 - damping) / n_nodes

    # Per round, only the CONTRIB table (dst, c) is materialized; a node's
    # rank is reconstructed inline as base + damping * coalesce(c, 0)
    # wherever needed (sources with no in-edges have c = NULL -> the
    # teleport share). This halves the joins per round vs materializing a
    # full (node, rank) frame: one edges-left-join-contrib + one keyed sum.
    def rank_of(c_col):
        return F.lit(base) + F.lit(damping) * F.coalesce(c_col, F.lit(0.0))

    contrib = None
    try:
        for i in range(k):
            if contrib is None:
                joined = e.withColumn("rank", F.lit(1.0 / n_nodes))
            else:
                joined = e.join(
                    _state_side(contrib, small), e.src == contrib.node_c, "left"
                ).withColumn("rank", rank_of(F.col("c")))
            contrib = (
                joined.select("dst", (F.col("rank") * F.col("p")).alias("cc"))
                .groupBy("dst")
                .agg(F.sum("cc").alias("c"))
                .select(F.col("dst").alias("node_c"), "c")
            )
            # checkpoint_interval=3 re-adjudicated in the r15 optimization
            # round (the r11 "fuse" vs r13 "don't fuse" conflict): with
            # numeric node keys and contrib-only rounds, fusing 3 rounds
            # per truncation runs the SAME exchanges in one query — every
            # shuffle/broadcast is still its own AQE stage, so no work is
            # re-evaluated — while dropping the per-round materialization
            # barriers: 26 -> 18 jobs, wall best-of-4 2.54 -> 1.72-1.87 s
            # at sf0.1 (interval 6 saves 6 more jobs but the depth-6 plan
            # re-plans measurably slower on first run — 5.9 s). The knob
            # stays for clusters where plan depth is costlier than
            # materialization. On the big path the final round checkpoints too:
            # the node-sized checkpoint cuts the returned plan off the
            # persist()ed layout so the finally can release it (CacheManager
            # entries outlive the frame, unlike checkpointed RDDs, which
            # the ContextCleaner frees on GC)
            if (i + 1) % checkpoint_interval == 0 and (i + 1 < k or not small):
                contrib = contrib.localCheckpoint(eager=True)
        if not small and k % checkpoint_interval != 0:
            contrib = contrib.localCheckpoint(eager=True)
    finally:
        if not small:
            e.unpersist()
    return nodes.join(contrib, nodes.node == contrib.node_c, "left").select(
        "node", rank_of(F.col("c")).alias("rank")
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 4,
    checkpoint_interval: int = 2,
    broadcast_state_max: int | None = None,
) -> DataFrame:
    """(node, hub, authority) after exactly ``k`` HITS rounds (Kleinberg
    1999, "Authoritative sources in a hyperlinked environment") on the
    UNWEIGHTED distinct edge list.

    Per round: authority(v) = sum of hub over in-edges, then hub(u) = sum
    of authority over out-edges; the published per-half-step L1
    normalization is DEFERRED to a single final division — each half-step
    is linear and L1 normalization is a scalar multiple, so intermediate
    normalizers cancel out of the next normalized iterate (x/||x|| is
    scale-invariant); the final normalized (hub, authority) are identical
    in exact arithmetic, and doubles don't overflow for any realistic k
    (mass grows ~avg-degree per half-step: degree 1e4, k=4 -> ~1e32 <<
    DBL_MAX). This removes every per-round normalizer aggregate — the r4
    wall-clock was dominated by 8 materialized normalized frames.

    Fixed iteration count, hub_0 = 1.0 — deterministic, so a relational
    oracle replays it as k unrolled raw join+aggregate rounds plus one
    final normalization. Nodes with no out-edges have hub 0, no in-edges
    authority 0 (coalesced at the end).

    Scale shape identical to pagerank's rounds: below
    ``broadcast_state_max`` nodes the score tables are broadcast into ONE
    canonical edge frame (no dst layout needed — a broadcast join ignores
    the probe side's layout); above it the edge list is persist()ed twice
    (hash-partitioned on src and on dst) and each half-step
    shuffle-hash-joins only the score table into the matching layout.
    ``checkpoint_interval`` counts HALF-steps between lineage truncations
    (2 = once per full round).
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    _, small = _pick_small(nodes, "node", broadcast_state_max)
    # both layouts default to the canonical frame so the finally below can
    # tell "built" from "not yet built": if the SECOND layout's
    # materialization fails, the first must still be released
    # (code-review r11, third pass)
    e_by_src = e_by_dst = e

    h = nodes.select("node", F.lit(1.0).alias("s"))
    a = None
    step = 0
    try:
        if not small:
            e_by_src = _iter_layout(e, "src", small)
            e_by_dst = _iter_layout(e, "dst", small)
        for i in range(k):
            a = (
                e_by_src.join(_state_side(h, small), e_by_src.src == h.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("s").alias("s"))
            )
            step += 1
            # on the big path the FINAL round's a must checkpoint before h
            # consumes it: the post-loop checkpoints would otherwise run
            # the last a-join twice (once inside h's job, once for a's own)
            if step % checkpoint_interval == 0 or (not small and i + 1 == k):
                a = a.localCheckpoint(eager=True)
            h = (
                e_by_dst.join(_state_side(a, small), e_by_dst.dst == a.node)
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("s").alias("s"))
            )
            step += 1
            if step % checkpoint_interval == 0 and i + 1 < k:
                h = h.localCheckpoint(eager=True)
        if not small:
            # the final node-sized checkpoint cuts the returned plan off the
            # persist()ed layouts so the finally below can release them —
            # CacheManager entries are not GC-freed, and leaving them would
            # leak two edge-list copies per call
            h = h.localCheckpoint(eager=True)
    finally:
        for layout in (e_by_src, e_by_dst):
            if layout is not e:
                layout.unpersist()

    def _l1(scores: DataFrame, out: str) -> DataFrame:
        # one final normalization per score family: 1-row broadcast
        # aggregate crossJoin, the repo's standard global-scalar shape
        tot = scores.agg(F.sum("s").alias("_tot"))
        return scores.crossJoin(F.broadcast(tot)).select(
            F.col("node").alias(f"{out[0]}n"), (F.col("s") / F.col("_tot")).alias(out)
        )

    return (
        nodes.join(_l1(h, "hub"), nodes.node == F.col("hn"), "left")
        .join(_l1(a, "authority"), nodes.node == F.col("an"), "left")
        .select(
            "node",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, triangles) over the UNDIRECTED simple graph induced by
    ``edges`` (direction, duplicates, and self-loops are collapsed/dropped
    first): the number of triangles each node participates in — the
    cliqueness counterpart to ``connected_components``' membership and
    ``dedup_cluster_density``'s edge-ratio verdict. Nodes in the graph with
    no triangle get an explicit 0 row.

    Scale shape: the classic degree-ordered orientation (each undirected
    edge points from its lower (degree, node) endpoint to the higher) makes
    the wedge self-join enumerate each triangle exactly once from its
    lowest-order apex, and bounds per-vertex wedge fan-out by the oriented
    out-degree <= O(sqrt(m)) — total work O(m^1.5) independent of hub
    degrees, the MPC-standard bound. Three equi-joins + one keyed count;
    no window, nothing collected.
    """
    u, v = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = (
        edges.where(F.col(src) != F.col(dst))
        .select(u.alias("u"), v.alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # orient each edge by the (deg, node) total order; carry the head's
    # order key so the wedge join can keep its two heads strictly ordered
    # (every wedge — hence every triangle — enumerated exactly once)
    du, dv = deg.alias("du"), deg.alias("dv")
    u_key = F.struct(F.col("du.deg").alias("d"), F.col("u").alias("n"))
    v_key = F.struct(F.col("dv.deg").alias("d"), F.col("v").alias("n"))
    eo = (
        e.join(du, e.u == F.col("du.node"))
        .join(dv, e.v == F.col("dv.node"))
        .select(
            F.when(
                u_key < v_key,
                F.struct(
                    F.col("u").alias("lo"),
                    F.col("v").alias("hi"),
                    v_key.alias("hi_key"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("v").alias("lo"),
                    F.col("u").alias("hi"),
                    u_key.alias("hi_key"),
                )
            )
            .alias("o")
        )
        .select("o.lo", "o.hi", "o.hi_key")
        .localCheckpoint(eager=True)
    )
    x, y = eo.alias("x"), eo.alias("y")
    wedges = x.join(
        y,
        (F.col("x.lo") == F.col("y.lo")) & (F.col("x.hi_key") < F.col("y.hi_key")),
    ).select(
        F.col("x.lo").alias("a"), F.col("x.hi").alias("b"), F.col("y.hi").alias("c")
    )
    tri = wedges.join(
        e,
        (F.least("b", "c") == e.u) & (F.greatest("b", "c") == e.v),
    ).select("a", "b", "c")
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        deg.select("node")
        .join(per_node, "node", "left")
        .select("node", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )


def k_core(
    edges: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 6,
    broadcast_state_max: int | None = None,
) -> DataFrame:
    """(node, degree) for the nodes surviving ``rounds`` peel iterations
    of the k-core reduction on the UNDIRECTED simple graph (direction,
    duplicates, self-loops collapsed/dropped): each round removes every
    node whose current degree is < ``k`` and the edges touching it — the
    standard core-decomposition step (Seidman 1983, "Network structure
    and minimum degree") that separates a dedup/linkage graph's dense
    core from its periphery, one level finer than triangle counts.

    The iteration count is FIXED (not convergence-tested), the same
    oracle-replay discipline as ``pagerank``/``hits``: the result after R
    rounds is a deterministic function of the edge list, so a relational
    oracle unrolls R degree-filter-semijoin rounds and must match
    exactly. Peeling is monotone (the surviving set only shrinks), so a
    converged round is a no-op and extra rounds never change the result;
    ``rounds`` ~ O(log n) suffices for typical graphs because peel
    cascades shorten geometrically, and the converged fixpoint IS the
    true k-core.

    Scale shape: per round one keyed degree aggregate + one semi-join per
    endpoint against the node-sized survivor set, each on a monotonically
    SHRINKING edge frame (work decays with the periphery); lineage
    truncated per round via localCheckpoint. Below ``broadcast_state_max``
    nodes the survivor set is pinned broadcast (the edge frame never
    shuffles for the joins); above it the joins are left UNHINTED — the
    edge frame is rebuilt each round so a persisted layout cannot
    amortize here the way the fixed-edge loops' can, and a shuffle_hash
    hint measured SLOWER at 10x/100x than letting AQE convert the join
    itself: the survivor set usually shrinks under the runtime broadcast
    threshold, and the hint would pin the join to a shuffle AQE knows it
    can skip. No windows, nothing collected.
    """
    u, v = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = (
        edges.where(F.col(src) != F.col(dst))
        .select(u.alias("u"), v.alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    def degrees(frame: DataFrame) -> DataFrame:
        return (
            frame.select(F.col("u").alias("node"))
            .unionAll(frame.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )

    # the broadcast decision needs the node stats, and round 1 needs the
    # degree table — ONE checkpointed frame answers both (a separate
    # distinct+count pass would cost an extra full-edge job; code-review
    # r11, third pass)
    deg0 = degrees(e).localCheckpoint(eager=True)
    _, small = _pick_small(deg0, "node", broadcast_state_max)
    for i in range(rounds):
        deg = deg0 if i == 0 else degrees(e)
        keep = deg.filter(F.col("deg") >= k).select("node")
        keep_u = keep.withColumnRenamed("node", "u")
        keep_v = keep.withColumnRenamed("node", "v")
        if small:
            keep_u, keep_v = F.broadcast(keep_u), F.broadcast(keep_v)
        e = (
            e.join(keep_u, "u", "semi")
            .join(keep_v, "v", "semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
        .filter(F.col("degree") >= k)
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
    broadcast_state_max: int | None = None,
) -> DataFrame:
    """(node, community) after exactly ``rounds`` synchronous label-
    propagation iterations (Raghavan-Albert-Kumara 2007) on the
    UNDIRECTED simple graph: label_0(v) = v; each round every node adopts
    the most frequent label among its neighbors PLUS its own current
    label (the self-vote — the standard damping that keeps synchronous
    updates from oscillating on near-bipartite regions), ties broken to
    the SMALLEST label. Deterministic: fixed rounds, total tie order — so
    a relational oracle replays the rounds exactly (same discipline as
    pagerank/hits/k_core). Communities refine connected components:
    a chain of weakly-bridged duplicate cliques is one component but
    several propagation communities.

    Scale shape: per round, below ``broadcast_state_max`` nodes the label
    table is broadcast into the canonical edge frame; above it one
    shuffle of the label table into the persist()ed ``v``-partitioned
    edge layout (shuffle-hash, neither side sorted) — plus one keyed
    count and one keyed min-struct argmax (no window, nothing collected);
    lineage truncated per round.
    """
    u, v = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    und = (
        edges.where(F.col(src) != F.col(dst))
        .select(u.alias("u"), v.alias("v"))
        .distinct()
    )
    e = (
        und.select("u", "v")
        .unionAll(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=True)
    )
    labels = e.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    ).localCheckpoint(eager=True)
    _, small = _pick_small(labels, "node", broadcast_state_max)
    # self-vote as a SELF-LOOP edge (r15): one (n, n) row per node folds
    # the per-round unionAll(labels) into the single label join — the
    # union had UnknownPartitioning, which forced a full vote-stream
    # exchange every round; the augmented frame is static, so it is laid
    # out once (aggregate key u on the broadcast-state path -> every
    # round's two keyed aggregates run exchange-free; join key v on the
    # partitioned-state path, as before) and the per-round vote multiset
    # is IDENTICAL: the self-loop joins the node's own label exactly once.
    e_aug = e.unionAll(
        labels.select(F.col("node").alias("u"), F.col("node").alias("v"))
    )
    e = _iter_layout(e_aug, "u" if small else "v")
    try:
        for _ in range(rounds):
            votes = (
                e.join(_state_side(labels, small), e.v == labels.node)
                .select(F.col("u").alias("node"), "lbl")
                .groupBy("node", "lbl")
                .agg(F.count("*").alias("c"))
            )
            # argmax by (count desc, label asc) as a keyed min over a
            # struct — stays in whole-stage codegen, no window
            labels = (
                votes.groupBy("node")
                .agg(
                    F.min(
                        F.struct((-F.col("c")).alias("nc"), F.col("lbl"))
                    ).alias("m")
                )
                .select("node", F.col("m.lbl").alias("lbl"))
                .localCheckpoint(eager=True)
            )
    finally:
        # labels is checkpointed every round, so the returned plan never
        # references the persist()ed layout — release it (CacheManager
        # entries are not GC-freed)
        e.unpersist()
    return labels.select("node", F.col("lbl").alias("community"))
