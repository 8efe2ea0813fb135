"""Query registry: every implemented operator gets a (Spark plan, oracle SQL) pair.

This is the engine's operator inventory in executable form (SURVEY.md §2.B/§2.C):
each entry is a named query with

- ``build(spark, sf_dir) -> DataFrame`` — the idiomatic-Spark plan (DataFrame
  API or spark.sql; Catalyst optimizes either),
- ``oracle`` — dialect-neutral ANSI SQL that DuckDB runs over the same parquet
  tables; the driver hash-compares both results. ``oracle=None`` marks
  genuinely non-SQL-expressible operators (rows-only check).

Conventions that make the hash-compare deterministic:
- every computed column is aliased identically on both sides;
- LIMIT queries carry a total ORDER BY with unique tiebreakers;
- floats are ROUNDed on both sides (Spark and DuckDB both round half away
  from zero for doubles);
- DuckDB ``SUM(int)`` returns HUGEINT → always ``CAST(... AS BIGINT)`` in the
  oracle to match Spark's LongType.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.plans.tables import load_table


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""
    tags: tuple = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline suite


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = "", tags: tuple = (), bench: bool = False):
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        # a duplicate name would silently REPLACE the earlier query (and its
        # oracle) everywhere — the registry, the driver window, bench — so
        # refuse at import time, where the collision is one traceback away
        if name in QUERIES:
            raise ValueError(f"query {name!r} is already registered")
        QUERIES[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc, tags=tags, bench=bench)
        return fn

    return wrap


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ===========================================================================
# Scan / project / filter  (SURVEY §2.C rows 1-6; reference B1-B7)
# ===========================================================================


@register(
    "scan_count",
    "SELECT COUNT(*) AS n FROM lineitem",
    doc="Full parquet scan + count-star (reference B1; README.md:84).",
    bench=True,
)
def q_scan_count(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


@register(
    "filter_eq_count",
    "SELECT COUNT(*) AS n FROM events WHERE event_type = 'click'",
    doc="Equality predicate pushed to the parquet scan (reference B7: Grafana ad-hoc filters).",
)
def q_filter_eq_count(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .agg(F.count("*").alias("n"))
    )


@register(
    "project_alias",
    "SELECT l_orderkey AS k, l_linenumber AS n FROM lineitem ORDER BY k, n LIMIT 100",
    doc="Projection with aliases + deterministic top-k (reference B2,B3).",
)
def q_project_alias(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("k"), F.col("l_linenumber").alias("n"))
        .orderBy("k", "n")
        .limit(100)
    )


@register(
    "filter_range_conj",
    "SELECT COUNT(*) AS n FROM orders "
    "WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderstatus = 'F'",
    doc="Range + equality conjunction (reference B6,B7: Grafana $timeFilter + ad-hoc).",
)
def q_filter_range_conj(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")) & (F.col("o_orderstatus") == "F"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "filter_in_like",
    "SELECT COUNT(*) AS n FROM part "
    "WHERE p_brand IN ('Brand#12','Brand#23') OR p_type LIKE '%BRASS%'",
    doc="IN-list and LIKE predicates (SURVEY §2.C).",
)
def q_filter_in_like(spark, sf_dir):
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin("Brand#12", "Brand#23") | F.col("p_type").like("%BRASS%"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "filter_null_check",
    "SELECT COUNT(*) AS n FROM customer WHERE c_acctbal IS NOT NULL AND c_acctbal < 0",
    doc="NULL-handling predicate (SURVEY §2.C IS NULL row).",
)
def q_filter_null_check(spark, sf_dir):
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal").isNotNull() & (F.col("c_acctbal") < 0))
        .agg(F.count("*").alias("n"))
    )


# ===========================================================================
# Joins  (SURVEY §2.C join rows)
# ===========================================================================


@register(
    "join_revenue_by_region",
    "SELECT r_name, ROUND(SUM(o_totalprice), 2) AS revenue FROM orders "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "GROUP BY r_name ORDER BY r_name",
    doc=(
        "Star-schema multi-join + agg. Dimension tables (customer/nation/region) are "
        "broadcast — no shuffle of the orders fact side; at 100 TB the only shuffle "
        "is the final tiny groupBy(r_name)."
    ),
    bench=True,
)
def q_join_revenue_by_region(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("r_name")
    )


@register(
    "join_anti_customers_without_orders",
    "SELECT COUNT(*) AS n FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
    "WHERE o_orderkey IS NULL",
    doc="Left-outer-join null filter, planned as a left ANTI join in Spark (no wide row materialization).",
)
def q_join_anti(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count("*").alias("n"))
    )


@register(
    "join_semi_suppliers_with_lineitems",
    "SELECT COUNT(*) AS n FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)",
    doc="Semi join (EXISTS/IN) via left_semi — lineitem side never materializes columns.",
)
def q_join_semi(spark, sf_dir):
    supplier = _t(spark, sf_dir, "supplier")
    lineitem = _t(spark, sf_dir, "lineitem").select("l_suppkey")
    return (
        supplier.join(lineitem, supplier.s_suppkey == lineitem.l_suppkey, "left_semi")
        .agg(F.count("*").alias("n"))
    )


@register(
    "join_outer_order_counts",
    "SELECT CAST(c_custkey AS BIGINT) AS custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders "
    "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
    "GROUP BY c_custkey ORDER BY custkey LIMIT 100",
    doc="Left outer join preserving unmatched build-side rows.",
)
def q_join_outer(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .select(F.col("c_custkey").alias("custkey"), "n_orders")
        .orderBy("custkey")
        .limit(100)
    )


@register(
    "join_theta_late_ship",
    "SELECT COUNT(*) AS n FROM lineitem JOIN orders "
    "ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate",
    doc=(
        "Equi-join with a residual theta predicate: Spark hashes on l_orderkey "
        "and applies the range condition as a post-join filter — never a "
        "nested-loop, so it scales like a plain equi-join."
    ),
    bench=True,
)
def q_join_theta(spark, sf_dir):
    lineitem = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        lineitem.join(
            orders,
            (lineitem.l_orderkey == orders.o_orderkey) & (lineitem.l_shipdate > orders.o_orderdate),
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "join_asof_event_order",
    "SELECT event_id, "
    "(SELECT MAX(o.o_orderdate) FROM orders o WHERE o.o_orderdate <= e.ts) AS asof_date "
    "FROM events e ORDER BY event_id LIMIT 50",
    doc=(
        "As-of join (nearest earlier order date per event). Implementation: the "
        "distinct right-side keys are aggregated to a sorted array and broadcast; "
        "each event probes it with array_max(filter(...)) — fully parallel, no "
        "shuffle of the event side, no per-row subquery. Valid whenever the "
        "as-of dimension's key set is broadcastable (here: distinct dates); the "
        "large-large case is operators/asof.py's merge_asof."
    ),
)
def q_join_asof(spark, sf_dir):
    events = _t(spark, sf_dir, "events").select("event_id", "ts")
    dates = (
        _t(spark, sf_dir, "orders")
        .select("o_orderdate")
        .distinct()
        .agg(F.sort_array(F.collect_list("o_orderdate")).alias("dates"))
    )
    return (
        events.join(F.broadcast(dates))
        .select(
            "event_id",
            F.array_max(F.filter(F.col("dates"), lambda d: d <= F.col("ts"))).alias("asof_date"),
        )
        .orderBy("event_id")
        .limit(50)
    )


@register(
    "join_asof_grouped",
    "SELECT CAST(e.event_id AS BIGINT) AS event_id, "
    "(SELECT MAX(o.o_orderdate) FROM orders o "
    " WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS asof_date "
    "FROM events e ORDER BY event_id LIMIT 200",
    doc=(
        "Keyed as-of join (large-large path): nearest earlier order PER "
        "CUSTOMER for each event, via the JVM union+window formulation "
        "(one shuffle, codegen; operators/asof.py:asof_join_windowed). The "
        "applyInPandas merge_asof variant (asof_join_grouped) computes the "
        "same thing (pytest-equivalence) as the custom-Python-operator "
        "template; the broadcast-timeline variant covers the keyless case "
        "(join_asof_event_order)."
    ),
)
def q_join_asof_grouped(spark, sf_dir):
    from demo_otel_parquet_antalya_spark.operators.asof import asof_join_windowed

    events = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("user_id"), "o_orderdate")
    )
    joined = asof_join_windowed(
        events, orders, on="user_id", left_ts="ts", right_ts="o_orderdate",
        right_value_cols=["o_orderdate"],
    )
    return (
        joined.select(
            F.col("event_id").cast("long").alias("event_id"),
            F.col("o_orderdate").alias("asof_date"),
        )
        .orderBy("event_id")
        .limit(200)
    )


@register(
    "join_range_bucketed",
    "SELECT d.o_orderdate AS d, CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_shipped "
    "FROM (SELECT DISTINCT o_orderdate FROM orders) d "
    "LEFT JOIN lineitem l ON l.l_shipdate >= d.o_orderdate "
    "AND l.l_shipdate <= d.o_orderdate + INTERVAL 2 DAY "
    "GROUP BY d.o_orderdate ORDER BY d LIMIT 100",
    doc=(
        "Interval/range join via BUCKETING: pure range predicates otherwise "
        "plan a nested loop, so both sides get a coarse time bucket (week; "
        ">= window width) as an equi key — a <=2-day window spans at most 2 "
        "adjacent buckets, so the probe side explodes to its bucket and the "
        "next, the join hashes on the bucket, and the exact range filters "
        "the residue. Scales like any equi-join at 100 TB; this is the "
        "standard rewrite for large-large interval joins."
    ),
)
def q_join_range_bucketed(spark, sf_dir):
    # weekly buckets: epoch-day div 7 (integer-safe)
    def bucket(col):
        return F.floor(F.datediff(F.to_date(col), F.lit("1970-01-01")) / 7)

    days = _t(spark, sf_dir, "orders").select("o_orderdate").distinct()
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", bucket("l_shipdate").alias("b")
    )
    probe = days.select(
        "o_orderdate", F.explode(F.array(bucket("o_orderdate"), bucket("o_orderdate") + 1)).alias("b")
    )
    matched = (
        probe.join(li, "b")
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 2 DAYS"))
        )
        .groupBy("o_orderdate")
        .agg(F.count("*").alias("n"))
    )
    return (
        days.join(matched, "o_orderdate", "left")
        .select(
            F.col("o_orderdate").alias("d"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_shipped"),
        )
        .orderBy("d")
        .limit(100)
    )


# ===========================================================================
# Aggregation  (SURVEY §2.C agg rows; reference B9)
# ===========================================================================


@register(
    "agg_multikey_counts",
    "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders "
    "GROUP BY o_orderstatus, o_orderpriority ORDER BY o_orderstatus, o_orderpriority",
    doc="Multi-key hash aggregate (reference B9: severity count by service, README.md:120-123).",
)
def q_agg_multikey(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@register(
    "agg_pricing_summary",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
    "ROUND(SUM(l_quantity), 2) AS sum_qty, "
    "ROUND(SUM(l_extendedprice), 2) AS sum_price, "
    "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
    "ROUND(AVG(l_extendedprice), 2) AS avg_price, "
    "MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship "
    "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    doc="TPC-H Q1-shaped pricing summary: partial (map-side) aggregation then one small shuffle.",
    bench=True,
)
def q_agg_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_count_distinct",
    "SELECT COUNT(DISTINCT o_custkey) AS n FROM orders",
    doc="Exact distinct aggregate (two-phase partial-distinct under the hood).",
)
def q_agg_count_distinct(spark, sf_dir):
    return _t(spark, sf_dir, "orders").agg(F.countDistinct("o_custkey").alias("n"))


@register(
    "agg_rollup",
    "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders "
    "GROUP BY ROLLUP(o_orderstatus, o_orderpriority) "
    "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    doc="ROLLUP grouping sets (SURVEY §2.C).",
)
def q_agg_rollup(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@register(
    "agg_grouping_sets",
    "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders "
    "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority)) "
    "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    doc="Explicit GROUPING SETS via SQL (Catalyst expands to a union of aggregates).",
)
def q_agg_grouping_sets(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders "
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority)) "
        "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"
    )


@register(
    "agg_cube",
    "SELECT o_orderstatus, EXTRACT(YEAR FROM o_orderdate) AS y, COUNT(*) AS n FROM orders "
    "GROUP BY CUBE(o_orderstatus, y) "
    "ORDER BY o_orderstatus NULLS FIRST, y NULLS FIRST",
    doc="CUBE over status × order-year.",
)
def q_agg_cube(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("y", F.year("o_orderdate").cast("long"))
        .cube("o_orderstatus", "y")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("y").asc_nulls_first())
    )


@register(
    "agg_stats_moments",
    "SELECT ROUND(stddev_samp(l_quantity), 4) AS sd, ROUND(var_samp(l_quantity), 4) AS var, "
    "ROUND(corr(l_quantity, l_extendedprice), 6) AS c "
    "FROM lineitem",
    doc="Statistical aggregates (stddev/variance/correlation) — one-pass moment computation.",
)
def q_agg_stats_moments(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd"),
        F.round(F.var_samp("l_quantity"), 4).alias("var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("c"),
    )


# ===========================================================================
# Window functions  (SURVEY §2.C window rows)
# ===========================================================================


@register(
    "window_first_order_per_customer",
    "SELECT custkey, orderkey, rn FROM ("
    "  SELECT o_custkey AS custkey, o_orderkey AS orderkey, "
    "  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn "
    "  FROM orders) t WHERE rn = 1 ORDER BY custkey LIMIT 100",
    doc="Ranking window: first order per customer (top-1-per-group, single shuffle on the partition key).",
)
def q_window_rank(spark, sf_dir):
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("o_custkey").alias("custkey"), F.col("o_orderkey").alias("orderkey"), "rn")
        .orderBy("custkey")
        .limit(100)
    )


@register(
    "window_running_sum",
    "SELECT event_id, ROUND(SUM(value) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running "
    "FROM events ORDER BY event_id LIMIT 100",
    doc="Analytic window with an explicit ROWS frame: per-user running sum.",
)
def q_window_running(spark, sf_dir):
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", F.round(F.sum("value").over(w), 4).alias("running"))
        .orderBy("event_id")
        .limit(100)
    )


@register(
    "window_lag_gap",
    "SELECT event_id, gap_s FROM ("
    "  SELECT event_id, CAST(FLOOR(EXTRACT(EPOCH FROM ts - LAG(ts) OVER ("
    "    PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap_s FROM events) t "
    "WHERE gap_s IS NOT NULL ORDER BY event_id LIMIT 100",
    doc="LAG with time-delta arithmetic — the building block for sessionization.",
)
def q_window_lag(spark, sf_dir):
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.floor(F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")).cast("long").alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
        .orderBy("event_id")
        .limit(100)
    )


@register(
    "window_sessionize",
    "WITH g AS (SELECT user_id, CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
    "OR EXTRACT(EPOCH FROM ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 21600 "
    "THEN 1 ELSE 0 END AS s FROM events) "
    "SELECT CAST(user_id AS BIGINT) AS user_id, CAST(SUM(s) AS BIGINT) AS n_sessions "
    "FROM g GROUP BY user_id ORDER BY user_id",
    doc=(
        "Sessionization: a 6 h inactivity gap starts a new session; sessions "
        "counted per user. LAG + conditional sum — one shuffle on user_id, "
        "the canonical batch sessionize (the reference has no stateful "
        "streaming; SURVEY §2.A notes)."
    ),
)
def q_window_sessionize(spark, sf_dir):
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
    new_sess = F.when(gap.isNull() | (gap > 21600), 1).otherwise(0)
    return (
        _t(spark, sf_dir, "events")
        .select(F.col("user_id"), new_sess.alias("s"))
        .groupBy("user_id")
        .agg(F.sum("s").alias("n_sessions"))
        .select(F.col("user_id").cast("long").alias("user_id"), F.col("n_sessions").cast("long"))
        .orderBy("user_id")
    )


@register(
    "window_session_native",
    "WITH g AS ("
    "  SELECT user_id, ts, event_id, CASE WHEN LAG(ts) OVER "
    "    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
    "    OR EXTRACT(EPOCH FROM ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 21600 "
    "    THEN 1 ELSE 0 END AS new FROM events), "
    "s AS (SELECT user_id, ts, SUM(new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid FROM g) "
    "SELECT CAST(user_id AS BIGINT) AS user_id, MIN(ts) AS s, "
    "MAX(ts) + INTERVAL 21600 SECOND AS e, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM s GROUP BY user_id, sid ORDER BY user_id, s LIMIT 200",
    doc=(
        "Spark's NATIVE session_window aggregate (6 h gap): dynamic-width "
        "session per key with start = first event, end = last event + gap. "
        "Same operator powers streaming session aggregation; the oracle "
        "reproduces it with the manual lag/cumsum formulation, proving the "
        "two sessionization paths agree."
    ),
)
def q_window_session_native(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", F.session_window("ts", "6 hours").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("w.start").alias("s"),
            F.col("w.end").alias("e"),
            F.col("n").cast("long"),
        )
        .orderBy("user_id", "s")
        .limit(200)
    )


@register(
    "agg_percentiles",
    "SELECT ROUND(quantile_cont(o_totalprice, 0.25), 2) AS p25, "
    "ROUND(quantile_cont(o_totalprice, 0.50), 2) AS p50, "
    "ROUND(quantile_cont(o_totalprice, 0.75), 2) AS p75 FROM orders",
    doc=(
        "Exact continuous percentiles (Spark `percentile` ≡ DuckDB "
        "quantile_cont, both linear-interpolation). The approximate "
        "scale path is percentile_approx (t2-exempt)."
    ),
)
def q_agg_percentiles(spark, sf_dir):
    return _t(spark, sf_dir, "orders").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 2).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 2).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 2).alias("p75"),
    )


@register(
    "pivot_status_by_year",
    "SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y, "
    'COUNT(*) FILTER (WHERE o_orderstatus = \'F\') AS "F", '
    'COUNT(*) FILTER (WHERE o_orderstatus = \'O\') AS "O", '
    'COUNT(*) FILTER (WHERE o_orderstatus = \'P\') AS "P" '
    "FROM orders GROUP BY y ORDER BY y",
    doc=(
        "Pivot (long->wide): order counts per status column by year. With "
        "explicit pivot values Spark skips the extra distinct-values job and "
        "plans a single conditional aggregate."
    ),
)
def q_pivot_status_by_year(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("y", F.year("o_orderdate").cast("long"))
        .groupBy("y")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
        .orderBy("y")
    )


@register(
    "array_posexplode",
    "SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INTEGER) AS idx, "
    "ROUND(CAST(unnest(embedding) AS DOUBLE), 4) AS val "
    "FROM embeddings WHERE vec_id < 5 ORDER BY vec_id, idx",
    doc="Positional array un-nesting (posexplode ≡ unnest WITH ORDINALITY).",
)
def q_array_posexplode(spark, sf_dir):
    return (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 5)
        .select("vec_id", F.posexplode("embedding").alias("pos", "v"))
        .select(
            "vec_id",
            (F.col("pos") + 1).cast("int").alias("idx"),
            F.round(F.col("v").cast("double"), 4).alias("val"),
        )
        .orderBy("vec_id", "idx")
    )


# ===========================================================================
# Time bucketing & sorting  (reference B8, B10-B12; Grafana panel queries)
# ===========================================================================


@register(
    "time_bucket_minute",
    "SELECT date_trunc('minute', ts) AS m, COUNT(*) AS n FROM events GROUP BY m ORDER BY m",
    doc="Calendar-unit time bucketing (reference B8: Grafana $timeSeries).",
)
def q_time_bucket_minute(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("minute", "ts").alias("m"))
        .agg(F.count("*").alias("n"))
        .orderBy("m")
    )


@register(
    "time_bucket_30s_series",
    "SELECT CAST(to_timestamp(CAST(FLOOR(EXTRACT(EPOCH FROM ts) / 30) * 30 AS BIGINT)) AS TIMESTAMP) AS t, "
    "event_type AS series, COUNT(*) AS n "
    "FROM events GROUP BY t, series ORDER BY t, series",
    doc=(
        "The Grafana time-series panel shape (reference Q5, logs.json:123): 30 s "
        "buckets × series, exactly the $timeSeries/interval=30s macro expansion."
    ),
    bench=True,
)
def q_time_bucket_30s(spark, sf_dir):
    bucket = F.timestamp_seconds((F.floor(F.unix_timestamp("ts") / 30) * 30).cast("long"))
    return (
        _t(spark, sf_dir, "events")
        .groupBy(bucket.alias("t"), F.col("event_type").alias("series"))
        .agg(F.count("*").alias("n"))
        .orderBy("t", "series")
    )


@register(
    "rollup_spanned_rebucket",
    "SELECT CAST(to_timestamp(CAST(FLOOR(EXTRACT(EPOCH FROM ts) / 900) * 900 AS BIGINT)) AS TIMESTAMP) AS t, "
    "event_type AS series, COUNT(*) AS value "
    "FROM events GROUP BY t, series ORDER BY t, series",
    doc=(
        "Mixed-grain rollup serving (r12, VERDICT r11 #1): a 30 s rollup's "
        "recent span (buckets >= 2024-01-21) unioned with its 300 s "
        "grain-compacted tail via streaming/rollup.py's _coarsen + "
        "span_snapshots, re-bucketed to 900 s. Counts re-aggregate, so the "
        "spanned re-bucketing must equal direct 900 s bucketing of the raw "
        "events — the oracle replays exactly that."
    ),
    tags=("rollup", "streaming"),
)
def q_rollup_spanned_rebucket(spark, sf_dir):
    from demo_otel_parquet_antalya_spark.plans.facade import time_bucket
    from demo_otel_parquet_antalya_spark.streaming.rollup import (
        _coarsen,
        span_snapshots,
    )

    boundary = "2024-01-21 00:00:00"  # coarse-aligned; splits every SF's range
    fine = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.timestamp_seconds(
                (F.floor(F.unix_timestamp("ts") / 30) * 30).cast("long")
            ).alias("bucket"),
            F.col("event_type").cast("string").alias("event_type"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    # the compacted tail: exactly compact_rollup_grain(older_than=boundary)'s
    # frame-level core over the fine snapshot
    coarse = _coarsen(
        fine.filter(F.col("bucket") < F.lit(boundary)), 30, 300, ("event_type",)
    )
    spanned = span_snapshots(fine, coarse, boundary, 30, 300)
    return (
        spanned.groupBy(
            time_bucket("bucket", 900).alias("t"),
            F.col("event_type").alias("series"),
        )
        .agg(F.sum("n").cast("long").alias("value"))
        .orderBy("t", "series")
    )


@register(
    "m4_spanned_rebucket",
    "WITH s AS (SELECT CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) * 86400 AS bucket, "
    "ts, event_id, value FROM events), "
    "w AS (SELECT bucket, value, "
    "ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY ts, event_id) AS rn_a, "
    "ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY ts DESC, event_id DESC) AS rn_d "
    "FROM s) "
    "SELECT bucket, "
    "MAX(CASE WHEN rn_a = 1 THEN value END) AS v_first, "
    "MIN(value) AS v_min, MAX(value) AS v_max, "
    "MAX(CASE WHEN rn_d = 1 THEN value END) AS v_last "
    "FROM w GROUP BY bucket ORDER BY bucket",
    doc=(
        "Mixed-grain M4 (r12): the hourly M4 state's tail coarsened to 4 h "
        "buckets (sketches.m4_remerge — min/max re-aggregate outright, "
        "first/last by their carried (epoch-micros, id) arg keys), spanned "
        "with the recent hourly side at a coarse-aligned boundary "
        "(2024-01-21), then re-merged to daily pixels. Exact at any grain "
        "mix, so the oracle replays it as DIRECT daily M4 over raw events "
        "— the downsample twin of rollup_spanned_rebucket."
    ),
    tags=("timeseries", "streaming"),
)
def q_m4_spanned_rebucket(spark, sf_dir):
    from demo_otel_parquet_antalya_spark.streaming.sketches import (
        _m4_batch,
        _m4_with_start,
        m4_remerge,
    )

    boundary = 1705795200  # 2024-01-21 00:00:00 UTC; % 14400 == % 86400 == 0
    fine = _m4_with_start(
        _m4_batch(_t(spark, sf_dir, "events"), "ts", "event_id", "value"), 3600
    )
    coarse = m4_remerge(fine.filter(F.col("bucket_start") < boundary), 14400)
    spanned = fine.filter(F.col("bucket_start") >= boundary).unionByName(coarse)
    return (
        m4_remerge(spanned, 86400)
        .select(
            F.col("bucket_start").alias("bucket"),
            "v_first", "v_min", "v_max", "v_last",
        )
        .orderBy("bucket")
    )


@register(
    "sort_topk_orders",
    "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25",
    doc="Top-K sort: Spark plans TakeOrderedAndProject (per-partition heap + driver merge, no full sort).",
)
def q_sort_topk(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey")
    )


@register(
    "recent_events_tail",
    "SELECT event_id, ts, event_type FROM events ORDER BY ts DESC, event_id LIMIT 10",
    doc="'Recent logs' tail (reference Q2, README.md:114-118) over the events log-proxy.",
)
def q_recent_tail(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type")
        .orderBy(F.col("ts").desc(), F.col("event_id"))
        .limit(10)
    )


# ===========================================================================
# Set operations  (SURVEY §2.C)
# ===========================================================================


@register(
    "set_intersect_nations",
    "SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk",
    doc="INTERSECT (distinct semantics).",
)
def q_set_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s).orderBy("nk")


@register(
    "set_except_nations",
    "SELECT c_nationkey AS nk FROM customer "
    "EXCEPT SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9900 ORDER BY nk",
    doc="EXCEPT (distinct semantics); right side filtered at acctbal > 9900 so the difference stays non-empty at sf0.001/0.01/0.1 (5000 went degenerate at sf0.1: every nation gains a qualifying supplier).",
)
def q_set_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9900)
        .select(F.col("s_nationkey").alias("nk"))
    )
    return c.subtract(s).orderBy("nk")  # EXCEPT = distinct set-difference


@register(
    "set_union_all_count",
    "SELECT COUNT(*) AS n FROM (SELECT c_nationkey AS nk FROM customer UNION ALL SELECT s_nationkey FROM supplier) t",
    doc="UNION ALL (no dedup, no shuffle — pure concatenation of partitions).",
)
def q_set_union_all(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionAll(s).agg(F.count("*").alias("n"))


# ===========================================================================
# Scalar functions: string / date / math / conditional / array / JSON
# ===========================================================================


@register(
    "string_functions",
    "SELECT UPPER(SUBSTR(r_name, 1, 3)) AS pre, LENGTH(r_name) AS len, "
    "CONCAT(r_name, '_', CAST(r_regionkey AS VARCHAR)) AS tagged "
    "FROM region ORDER BY pre",
    doc="Scalar string functions (upper/substr/length/concat).",
)
def q_string_functions(spark, sf_dir):
    return (
        _t(spark, sf_dir, "region")
        .select(
            F.upper(F.substring("r_name", 1, 3)).alias("pre"),
            F.length("r_name").cast("long").alias("len"),
            F.concat_ws("_", F.col("r_name"), F.col("r_regionkey").cast("string")).alias("tagged"),
        )
        .orderBy("pre")
    )


@register(
    "date_extract_year",
    "SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y, COUNT(*) AS n "
    "FROM orders GROUP BY y ORDER BY y",
    doc="Date-part extraction + group (reference B5/B8 family).",
)
def q_date_extract(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("long").alias("y"))
        .agg(F.count("*").alias("n"))
        .orderBy("y")
    )


@register(
    "math_revenue_total",
    "SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue FROM lineitem",
    doc="Arithmetic expression aggregate (whole-stage-codegen'd, no Python).",
)
def q_math_revenue(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@register(
    "case_when_flags",
    "SELECT CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f, "
    "CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big "
    "FROM orders",
    doc="Conditional aggregation via CASE WHEN.",
)
def q_case_when(spark, sf_dir):
    return _t(spark, sf_dir, "orders").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_f"),
        F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)).alias("n_big"),
    )


@register(
    "array_element_access",
    "SELECT vec_id, ROUND(CAST(embedding[1] AS DOUBLE), 4) AS e1 FROM embeddings ORDER BY vec_id LIMIT 20",
    doc="Array element access (1-indexed in both dialects).",
)
def q_array_element(spark, sf_dir):
    return (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", F.round(F.element_at("embedding", 1).cast("double"), 4).alias("e1"))
        .orderBy("vec_id")
        .limit(20)
    )


@register(
    "array_hof_norm",
    "SELECT vec_id, ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 3) AS sq_norm "
    "FROM embeddings ORDER BY vec_id LIMIT 50",
    doc="Higher-order array function: squared L2 norm via transform+aggregate (the similarity-search kernel).",
)
def q_array_hof(spark, sf_dir):
    sq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", F.round(sq, 3).alias("sq_norm"))
        .orderBy("vec_id")
        .limit(50)
    )


@register(
    "json_extract_filter",
    "SELECT COUNT(*) AS n FROM events WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50",
    doc="JSON attribute extraction in a predicate (reference B14: JSON attr columns, README.md:105-109).",
)
def q_json_extract(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .filter(F.get_json_object("props", "$.k").cast("int") > 50)
        .agg(F.count("*").alias("n"))
    )


@register(
    "json_extract_group",
    "SELECT CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10) AS BIGINT) AS bucket, "
    "COUNT(*) AS n FROM events GROUP BY bucket ORDER BY bucket",
    doc="JSON value promoted to a grouping dimension.",
)
def q_json_group(spark, sf_dir):
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.floor(k / 10).cast("long").alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


@register(
    "date_arithmetic",
    "SELECT CAST(l_orderkey AS BIGINT) AS k, CAST(l_linenumber AS BIGINT) AS n, "
    "CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS ship_days, "
    "CAST(l_shipdate + INTERVAL 90 DAY AS TIMESTAMP) AS warranty_end "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "ORDER BY k, n LIMIT 100",
    doc="Date arithmetic: datediff + interval addition (reference B5/B8 family).",
)
def q_date_arithmetic(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_orderkey").cast("long").alias("k"),
            F.col("l_linenumber").cast("long").alias("n"),
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).cast("long").alias("ship_days"),
            (F.col("l_shipdate") + F.expr("INTERVAL 90 DAYS")).alias("warranty_end"),
        )
        .orderBy("k", "n")
        .limit(100)
    )


@register(
    "string_regexp_transform",
    "SELECT p_partkey, regexp_replace(p_name, '[aeiou]', '_', 'g') AS consonants, "
    "COALESCE(regexp_extract(p_type, '([A-Z]+)$', 1), '') AS last_word "
    "FROM part ORDER BY p_partkey LIMIT 100",
    doc="Regex scalar transforms: global replace + capture-group extract.",
)
def q_string_regexp(spark, sf_dir):
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.regexp_replace("p_name", "[aeiou]", "_").alias("consonants"),
            F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("last_word"),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


@register(
    "set_union_distinct",
    "SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey AS nk FROM supplier ORDER BY nk",
    doc="UNION with distinct semantics (dedup across both inputs).",
)
def q_set_union_distinct(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct().orderBy("nk")


# ===========================================================================
# Subqueries & CTEs  (SURVEY §2.C)
# ===========================================================================


@register(
    "scalar_subquery_above_avg",
    "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)",
    doc="Uncorrelated scalar subquery (Catalyst plans a reusable subquery broadcast).",
)
def q_scalar_subquery(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)"
    )


@register(
    "exists_correlated",
    "SELECT COUNT(*) AS n FROM customer c WHERE EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)",
    doc="Correlated EXISTS — decorrelated by Catalyst into a semi join.",
)
def q_exists_correlated(spark, sf_dir):
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT COUNT(*) AS n FROM customer c WHERE EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)"
    )


@register(
    "cte_top_nation_revenue",
    "WITH rev AS (SELECT c_nationkey, SUM(o_totalprice) AS total FROM orders "
    "JOIN customer ON o_custkey = c_custkey GROUP BY c_nationkey) "
    "SELECT n_name, ROUND(total, 2) AS total FROM rev JOIN nation ON c_nationkey = n_nationkey "
    "ORDER BY total DESC, n_name LIMIT 10",
    doc="CTE + join + agg composition.",
)
def q_cte(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        "WITH rev AS (SELECT c_nationkey, SUM(o_totalprice) AS total FROM orders "
        "JOIN customer ON o_custkey = c_custkey GROUP BY c_nationkey) "
        "SELECT n_name, ROUND(total, 2) AS total FROM rev JOIN nation ON c_nationkey = n_nationkey "
        "ORDER BY total DESC, n_name LIMIT 10"
    )


# ===========================================================================
# Approximate aggregates (bench-only: approximate by design, no exact oracle)
# ===========================================================================


@register(
    "approx_count_distinct_custkey",
    None,
    doc="HyperLogLog++ approximate distinct (bench-only; t2-exempt per SURVEY §2.C).",
    tags=("approx",),
)
def q_approx_count_distinct(spark, sf_dir):
    return _t(spark, sf_dir, "orders").agg(
        F.approx_count_distinct("o_custkey").alias("approx_n")
    )


@register(
    "approx_percentiles",
    None,
    doc=(
        "approx_percentile (t-digest-style sketch): the single-pass scale "
        "path for agg_percentiles; exact twin is the oracle-matched query, "
        "this one is t2-exempt (approximate by design)."
    ),
    tags=("approx",),
)
def q_approx_percentiles(spark, sf_dir):
    return _t(spark, sf_dir, "orders").agg(
        F.percentile_approx("o_totalprice", [0.25, 0.5, 0.75], 10000).alias("approx_pcts")
    )


@register(
    "join_salted_revenue",
    "SELECT r_name, ROUND(SUM(o_totalprice), 2) AS revenue FROM orders "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "GROUP BY r_name ORDER BY r_name",
    doc=(
        "The star-join revenue query computed through util.salted_join on "
        "the orders->customer edge — same oracle as join_revenue_by_region, "
        "proving the skew-salting rewrite is semantics-preserving (the tool "
        "for power-law hot keys beyond AQE's skew splitting)."
    ),
)
def q_join_salted_revenue(spark, sf_dir):
    from demo_otel_parquet_antalya_spark.util import salted_join

    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"), "o_totalprice")
    customer = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = _t(spark, sf_dir, "region")
    return (
        salted_join(orders, customer, "k", salt_buckets=8)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("r_name")
    )


# ===========================================================================
# Window frames, distribution functions, reshaping, series generation
# (widening the delegated-SQL surface: SURVEY §2.C window/pivot rows)
# ===========================================================================


@register(
    "window_frames",
    "SELECT o_custkey, o_orderkey, "
    "first_value(o_totalprice) OVER w AS first_price, "
    "last_value(o_totalprice) OVER "
    "  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
    "   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price, "
    "FLOOR((2 * SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w3 "
    "       + COUNT(*) OVER w3) / (2.0 * COUNT(*) OVER w3)) / 100.0 AS avg3 "
    "FROM orders WHERE o_custkey < 100 "
    "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), "
    "w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
    "   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) "
    "ORDER BY o_custkey, o_orderkey LIMIT 300",
    doc=(
        "Explicit window frames: default growing frame (first_value), "
        "unbounded both-ways frame (last_value), and a 3-row sliding mean. "
        "Frame arithmetic runs in one pass per partition in the JVM window "
        "operator; the unique o_orderkey tiebreak makes results engine-stable."
    ),
)
def q_window_frames(spark, sf_dir):
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wall = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    wslide = w.rowsBetween(-2, 0)
    # sliding mean in exact integer CENTS with integer half-up rounding
    # (floor((2S+n)/2n)): averaging raw doubles leaves the pre-ROUND value
    # 1 ulp apart between engines at half-way points, and even ROUND(double)
    # itself is not decimal-exact in every engine (caught at sf0.1) — all-
    # integer arithmetic up to one final /100.0 is bit-deterministic
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    s = F.sum(cents).over(wslide)
    n = F.count(F.lit(1)).over(wslide)
    avg_cents = F.floor((2 * s + n) / (2.0 * n))
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(wall).alias("last_price"),
            (avg_cents / 100.0).alias("avg3"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(300)
    )


@register(
    "window_ntile_dist",
    "SELECT o_orderkey, o_orderstatus, "
    "CAST(ntile(4) OVER w AS INT) AS quartile, "
    "ROUND(percent_rank() OVER w, 6) AS pr, "
    "ROUND(cume_dist() OVER w, 6) AS cd "
    "FROM orders WHERE o_custkey < 50 "
    "WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) "
    "ORDER BY o_orderstatus, o_orderkey LIMIT 300",
    doc=(
        "Distribution window functions (ntile / percent_rank / cume_dist) — "
        "the quantile-bucketing shape used for stratified sampling of "
        "training corpora. Unique tiebreak keeps every function deterministic."
    ),
)
def q_window_ntile_dist(spark, sf_dir):
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .orderBy("o_orderstatus", "o_orderkey")
        .limit(300)
    )


@register(
    "window_range_frame",
    "SELECT o_orderkey, o_orderstatus, "
    "CAST(COUNT(*) OVER "
    "  (PARTITION BY o_orderstatus ORDER BY o_totalprice "
    "   RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_within_1k "
    "FROM orders WHERE o_custkey < 50 "
    "ORDER BY o_orderstatus, o_orderkey LIMIT 300",
    doc=(
        "Value-based RANGE frame: for each order, how many same-status "
        "orders fall within $1000 below its price. The frame is defined by "
        "the ORDER BY value, not row position, so ties need no tiebreak — "
        "the count is identical for equal prices by construction."
    ),
)
def q_window_range_frame(spark, sf_dir):
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice").rangeBetween(-1000, 0)
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.count("*").over(w).cast("long").alias("n_within_1k"),
        )
        .orderBy("o_orderstatus", "o_orderkey")
        .limit(300)
    )


@register(
    "unpivot_metrics",
    "SELECT l_returnflag, 'sum_qty' AS metric, ROUND(CAST(SUM(l_quantity) AS DOUBLE), 2) AS val "
    "FROM lineitem GROUP BY l_returnflag "
    "UNION ALL "
    "SELECT l_returnflag, 'sum_price' AS metric, ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 2) AS val "
    "FROM lineitem GROUP BY l_returnflag "
    "UNION ALL "
    "SELECT l_returnflag, 'avg_disc' AS metric, ROUND(AVG(l_discount), 6) AS val "
    "FROM lineitem GROUP BY l_returnflag "
    "ORDER BY l_returnflag, metric",
    doc=(
        "Wide-to-long reshaping with the native unpivot operator (Expand "
        "node — one pass, no self-union rescan; the oracle's UNION ALL form "
        "scans three times, which is exactly what unpivot avoids at scale)."
    ),
)
def q_unpivot_metrics(spark, sf_dir):
    wide = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        )
    )
    return wide.unpivot(
        "l_returnflag", ["sum_qty", "sum_price", "avg_disc"], "metric", "val"
    ).orderBy("l_returnflag", "metric")


@register(
    "pivot_dynamic",
    "SELECT o_orderstatus, "
    'CAST(COUNT(*) FILTER (WHERE o_orderpriority = \'1-URGENT\') AS BIGINT) AS "1-URGENT", '
    'CAST(COUNT(*) FILTER (WHERE o_orderpriority = \'2-HIGH\') AS BIGINT) AS "2-HIGH", '
    'CAST(COUNT(*) FILTER (WHERE o_orderpriority = \'3-MEDIUM\') AS BIGINT) AS "3-MEDIUM", '
    'CAST(COUNT(*) FILTER (WHERE o_orderpriority = \'4-NOT SPECIFIED\') AS BIGINT) AS "4-NOT SPECIFIED", '
    'CAST(COUNT(*) FILTER (WHERE o_orderpriority = \'5-LOW\') AS BIGINT) AS "5-LOW" '
    "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    doc=(
        "Dynamic pivot: the column set is DISCOVERED at plan time (distinct "
        "scan, collected — bounded by the pivot-width contract), then passed "
        "as explicit pivot values so the main pass stays single-shuffle. "
        "Passing values explicitly is also the 100 TB path: Spark otherwise "
        "runs the distinct scan eagerly itself."
    ),
)
def q_pivot_dynamic(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    values = sorted(
        r[0] for r in orders.select("o_orderpriority").distinct().collect()
    )
    pv = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", values)
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("long").alias(v) for v in values],
    ).orderBy("o_orderstatus")


@register(
    "date_series_gaps",
    "WITH days AS ("
    "  SELECT CAST(unnest(generate_series("
    "    MIN(CAST(o_orderdate AS DATE)), MAX(CAST(o_orderdate AS DATE)), "
    "    INTERVAL 1 DAY)) AS DATE) AS day FROM orders), "
    "per_day AS (SELECT CAST(o_orderdate AS DATE) AS day, "
    "            CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1) "
    "SELECT CAST(d.day AS TIMESTAMP) AS day, COALESCE(p.n, 0) AS n "
    "FROM days d LEFT JOIN per_day p USING (day) "
    "ORDER BY day LIMIT 400",
    doc=(
        "Dense calendar via sequence()+explode joined against per-day counts "
        "— the gap-filling series shape every dashboard needs (reference Q5 "
        "time series leaves gaps; this closes them). The generated side is "
        "one row per day, broadcast-sized at any horizon."
    ),
)
def q_date_series_gaps(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    days = (
        orders.agg(
            F.min(F.to_date("o_orderdate")).alias("d0"),
            F.max(F.to_date("o_orderdate")).alias("d1"),
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    per_day = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    return (
        days.join(per_day, "day", "left")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
        )
        .orderBy("day")
        .limit(400)
    )


@register(
    "map_priority_counts",
    "SELECT o_orderstatus, "
    "CAST(COUNT(DISTINCT o_orderpriority) AS INT) AS n_priorities, "
    "CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS urgent_n, "
    "CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS low_n "
    "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    doc=(
        "Map-typed columns JVM-side: per-status counts collect into a "
        "map<priority, n> (map_from_entries over collect_list), then "
        "size() and element_at() read it back out. The map stays inside "
        "Tungsten rows end-to-end; output is flattened to hashable columns."
    ),
)
def q_map_priority_counts(spark, sf_dir):
    per = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    mapped = (
        per.groupBy("o_orderstatus")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("o_orderpriority", "n")))
            ).alias("m")
        )
    )
    return mapped.select(
        "o_orderstatus",
        F.size(F.map_keys(F.col("m"))).alias("n_priorities"),
        F.coalesce(F.element_at("m", F.lit("1-URGENT")), F.lit(0)).cast("long").alias("urgent_n"),
        F.coalesce(F.element_at("m", F.lit("5-LOW")), F.lit(0)).cast("long").alias("low_n"),
    ).orderBy("o_orderstatus")


@register(
    "agg_pandas_udaf_iqr",
    "SELECT o_orderstatus, "
    "ROUND(quantile_cont(o_totalprice, 0.75) - quantile_cont(o_totalprice, 0.25), 2) AS iqr "
    "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    doc=(
        "Custom aggregate as a GROUPED_AGG pandas UDF (Arrow-batched "
        "interquartile range — pandas' linear-interpolation quantile is "
        "definitionally quantile_cont). The UDAF path complements the "
        "row-at-a-time-free built-in surface: partial aggregation is NOT "
        "available to UDAFs, so the plan shuffles raw group rows — which is "
        "why built-ins are preferred whenever one exists."
    ),
)
def q_agg_pandas_udaf_iqr(spark, sf_dir):
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # legacy two-arg form: the annotation-based form can't resolve string
    # annotations here (module uses `from __future__ import annotations`)
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def iqr(v):
        return float(v.quantile(0.75) - v.quantile(0.25))

    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.round(iqr("o_totalprice"), 2).alias("iqr"))
        .orderBy("o_orderstatus")
    )


@register(
    "approx_hll_custkey",
    None,
    doc=(
        "Datasketches HLL: hll_sketch_agg builds a mergeable binary sketch, "
        "hll_sketch_estimate reads it — the re-aggregatable distinct-count "
        "path (per-partition sketches union across days/files; approx_"
        "count_distinct's HLL++ is single-shot). Approximate -> rows-only."
    ),
)
def q_approx_hll_custkey(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))").alias("approx_customers"))
    )


@register(
    "json_variant_typed",
    "SELECT event_type, "
    "CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k, "
    "CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INT) AS max_k "
    "FROM events GROUP BY event_type ORDER BY event_type",
    doc=(
        "Semi-structured VARIANT path (Spark 4): parse_json ONCE into the "
        "binary variant encoding, then typed variant_get extractions — at "
        "scale this beats per-path get_json_object re-parsing (one parse "
        "feeds N extractions) and is the open-table-format answer to the "
        "reference's JSON attribute columns."
    ),
)
def q_json_variant_typed(spark, sf_dir):
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        _t(spark, sf_dir, "events")
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("int").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "array_filter_exists",
    "SELECT doc_id, "
    "CAST(len(list_filter(string_split(trim(text), ' '), x -> len(x) > 8)) AS INT) AS n_long, "
    "len(list_filter(string_split(trim(text), ' '), x -> regexp_matches(x, '[0-9]'))) > 0 AS has_num "
    "FROM documents ORDER BY doc_id LIMIT 200",
    doc=(
        "Array higher-order predicates: filter(lambda) + exists(lambda) "
        "over the token array — single projection, no explode/re-group "
        "round trip (the naive relational form shuffles |tokens| rows)."
    ),
)
def q_array_filter_exists(spark, sf_dir):
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.filter(toks, lambda x: F.length(x) > 8)).alias("n_long"),
            F.exists(toks, lambda x: x.rlike("[0-9]")).alias("has_num"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@register(
    "histogram_totalprice",
    "WITH b AS (SELECT LEAST(CAST(FLOOR((o_totalprice - mn) / ((mx - mn) / 10.0)) AS INT), 9) AS bin "
    "FROM orders, (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders) "
    ") SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY bin ORDER BY bin",
    doc=(
        "Equi-width histogram (10 bins over the observed range): two-pass — "
        "a min/max aggregate broadcast as a scalar subquery, then one "
        "scan binning every row. The dashboard distribution shape; at scale "
        "the first pass is a cheap column-statistics read."
    ),
)
def q_histogram_totalprice(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    return (
        orders.join(F.broadcast(bounds))
        .select(
            F.least(
                F.floor((F.col("o_totalprice") - F.col("mn")) / ((F.col("mx") - F.col("mn")) / 10.0)).cast("int"),
                F.lit(9),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("bin")
    )


@register(
    "profile_columns",
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
    "CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS null_custkey, "
    "CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd_status, "
    "CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nd_priority, "
    "ROUND(MIN(o_totalprice), 2) AS min_price, ROUND(MAX(o_totalprice), 2) AS max_price, "
    "ROUND(AVG(length(o_orderstatus)), 4) AS avg_status_len "
    "FROM orders",
    doc=(
        "One-pass data-quality profile (null counts, distinct counts, "
        "ranges, string-length stats) — the pre-training corpus audit "
        "shape. Single scan, all aggregates partial-agg combinable except "
        "the exact distincts (Expand-based; swap for approx_count_distinct "
        "at 100 TB)."
    ),
)
def q_profile_columns(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("o_custkey")).cast("long").alias("null_custkey"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        F.countDistinct("o_orderpriority").alias("nd_priority"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg(F.length("o_orderstatus")), 4).alias("avg_status_len"),
    )


@register(
    "explode_outer_keep_empty",
    "WITH words AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents), "
    "pairs AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN NULL ELSE w[i] || ' ' || w[i+1] || ' ' || w[i+2] END AS s "
    "  FROM words LEFT JOIN LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-2, 1))) AS i) t ON TRUE "
    "  WHERE len(w) >= 3 OR i = 1) "
    "SELECT doc_id, CAST(COUNT(s) AS BIGINT) AS n_shingles FROM pairs "
    "GROUP BY doc_id ORDER BY doc_id LIMIT 200",
    doc=(
        "explode_outer: degenerate rows (docs too short to shingle) survive "
        "the explode as NULL instead of vanishing — the auditability "
        "guarantee that per-doc accounting never loses rows."
    ),
)
def q_explode_outer_keep_empty(spark, sf_dir):
    from demo_otel_parquet_antalya_spark.functions.text import word_shingles

    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode_outer(word_shingles(F.col("text"), 3)).alias("s"))
        .groupBy("doc_id")
        .agg(F.count("s").cast("long").alias("n_shingles"))
        .orderBy("doc_id")
        .limit(200)
    )


@register(
    "map_filter_hot_priorities",
    "SELECT o_orderstatus, o_orderpriority FROM orders "
    "GROUP BY o_orderstatus, o_orderpriority HAVING COUNT(*) >= 100 "
    "ORDER BY o_orderstatus, o_orderpriority",
    doc=(
        "Map higher-order functions: counts collect into map<priority,n> "
        "per status, map_filter keeps hot entries, map_keys explodes back "
        "to rows — the attribute-map pruning shape used on OTLP attr "
        "columns (drop rare keys before promotion)."
    ),
)
def q_map_filter_hot_priorities(spark, sf_dir):
    per = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    mapped = per.groupBy("o_orderstatus").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderpriority", "n")))
        ).alias("m")
    )
    hot = F.map_filter(F.col("m"), lambda k, v: v >= 100)
    return (
        mapped.select(
            "o_orderstatus",
            F.explode(F.sort_array(F.map_keys(hot))).alias("o_orderpriority"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@register(
    "scalar_try_functions",
    "SELECT o_orderkey, "
    "CASE WHEN (o_custkey % 7) = 0 THEN NULL ELSE ROUND(o_totalprice / (o_custkey % 7), 4) END AS per_unit, "
    "TRY_CAST(o_orderpriority AS INTEGER) AS pri_num "
    "FROM orders WHERE o_custkey < 200 ORDER BY o_orderkey LIMIT 300",
    doc=(
        "ANSI-safe scalar surface: try_divide yields NULL on zero divisors "
        "and try_cast NULL on malformed strings — a malformed row degrades "
        "to NULL instead of failing a 100 TB job ('1-URGENT' never parses "
        "as int; both engines agree)."
    ),
)
def q_scalar_try_functions(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .select(
            "o_orderkey",
            F.round(F.try_divide("o_totalprice", F.col("o_custkey") % 7), 4).alias("per_unit"),
            F.try_to_number("o_orderpriority", F.lit("999")).cast("int").alias("pri_num"),
        )
        .orderBy("o_orderkey")
        .limit(300)
    )


@register(
    "array_agg_sorted",
    "SELECT o_orderstatus, "
    "array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities "
    "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    doc=(
        "collect_set + sort_array: grouped array aggregation with a "
        "deterministic join-to-string (set order is engine-specific, so the "
        "canonical form sorts before comparing)."
    ),
)
def q_array_agg_sorted(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias("priorities")
        )
        .orderBy("o_orderstatus")
    )


@register(
    "set_intersect_all_keys",
    "SELECT c_nationkey AS k FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier "
    "ORDER BY k LIMIT 200",
    doc=(
        "Bag-semantics INTERSECT ALL (duplicates preserved up to the "
        "smaller multiplicity) — completes the set-op family next to "
        "UNION/INTERSECT/EXCEPT."
    ),
)
def q_set_intersect_all_keys(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersectAll(s).orderBy("k").limit(200)


@register(
    "tz_local_hour_counts",
    "SELECT CAST(EXTRACT(HOUR FROM ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York') AS INT) AS local_hour, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM events GROUP BY local_hour ORDER BY local_hour",
    doc=(
        "Timezone-aware bucketing: UTC event times re-expressed in a "
        "dashboard-local zone (DST-correct via the IANA tz database on "
        "both engines) — the 'traffic by local hour' panel shape."
    ),
)
def q_tz_local_hour_counts(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.hour(F.from_utc_timestamp("ts", "America/New_York")).alias("local_hour")
        )
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("local_hour")
    )


@register(
    "join_bloom_prefiltered",
    "SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n, "
    "ROUND(SUM(o_totalprice), 2) AS revenue "
    "FROM orders JOIN customer ON o_custkey = c_custkey "
    "WHERE c_custkey % 5 = 0 "
    "GROUP BY nk ORDER BY nk",
    doc=(
        "Equi-join preceded by a bloom pre-filter built from the selective "
        "side's keys: bloom-certain non-matches die at the fact scan before "
        "the shuffle (the runtime-row-filter pattern for dimension key sets "
        "too large to broadcast as rows). False positives are removed by "
        "the real join, so the result — and the oracle — is the plain join."
    ),
)
def q_join_bloom_prefiltered(spark, sf_dir):
    from demo_otel_parquet_antalya_spark.operators import bloom

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    pre = bloom.bloom_prefilter(orders, cust, "o_custkey", "c_custkey")
    return (
        pre.join(cust, pre.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("nk")
    )


@register(
    "approx_top_events",
    "SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS n FROM events "
    "GROUP BY event_type ORDER BY n DESC, item LIMIT 4",
    doc=(
        "approx_top_k sketch (single-pass, mergeable, fixed memory) for "
        "batch heavy hitters — the offline twin of the streaming count-min "
        "tracker. With distinct cardinality far below sketch capacity the "
        "estimate is EXACT, so the oracle is the plain GROUP BY top-k; at "
        "100 TB cardinalities it degrades gracefully to approximate."
    ),
)
def q_approx_top_events(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .agg(F.expr("approx_top_k(event_type, 4)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "item")
    )


@register(
    "fuzzy_match_types",
    "WITH t AS (SELECT DISTINCT p_type FROM part) "
    "SELECT a.p_type AS type_a, b.p_type AS type_b, "
    "CAST(levenshtein(a.p_type, b.p_type) AS INT) AS dist "
    "FROM t a JOIN t b ON a.p_type < b.p_type "
    "WHERE levenshtein(a.p_type, b.p_type) <= 6 "
    "ORDER BY type_a, type_b LIMIT 300",
    doc=(
        "Fuzzy string matching (edit distance) over a DISTINCT-reduced "
        "domain: dedupe the attribute values first (150 types, broadcast-"
        "sized), then all-pairs levenshtein on the tiny set — the catalog-"
        "harmonization shape (near-identical labels), never run on raw rows."
    ),
)
def q_fuzzy_match_types(spark, sf_dir):
    t = _t(spark, sf_dir, "part").select("p_type").distinct()
    a, b = t.alias("a"), t.alias("b")
    dist = F.levenshtein(F.col("a.p_type"), F.col("b.p_type"))
    return (
        a.join(F.broadcast(b), F.col("a.p_type") < F.col("b.p_type"))
        .filter(dist <= 6)
        .select(
            F.col("a.p_type").alias("type_a"),
            F.col("b.p_type").alias("type_b"),
            dist.cast("int").alias("dist"),
        )
        .orderBy("type_a", "type_b")
        .limit(300)
    )


@register(
    "latest_event_per_user",
    "WITH r AS (SELECT user_id, event_id, ts, event_type, "
    "  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
    "  FROM events) "
    "SELECT CAST(user_id AS BIGINT) AS user_id, event_id, ts, event_type "
    "FROM r WHERE rn = 1 ORDER BY user_id LIMIT 300",
    doc=(
        "Latest-record-per-key materialization (the CDC/SCD 'current "
        "state' view): one window pass, shuffle on the key only — the "
        "standard compaction of an append-only event log into a snapshot."
    ),
)
def q_latest_event_per_user(spark, sf_dir):
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(F.col("user_id").cast("long"), "event_id", "ts", "event_type")
        .orderBy("user_id")
        .limit(300)
    )


# ===========================================================================
# Training-data prep, part 2: split / pack / contamination / scrub / vocab
# (north-star extensions; corpus-management shapes every large training
# pipeline needs beyond dedup+quality, which are covered above)
# ===========================================================================


@register(
    "split_train_val_test",
    "SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM ("
    "  SELECT n_chars, CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' "
    "         ELSE 'test' END AS split FROM ("
    "    SELECT n_chars, CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b"
    "    FROM documents)) "
    "GROUP BY split ORDER BY split",
    doc=(
        "Deterministic train/val/test split: bucket = md5(key) mod 100, so "
        "membership is a pure function of the key — stable across runs, "
        "cluster sizes, and partitionings (no rand(), no seed coordination "
        "across 1000 executors). The md5 prefix is engine-portable, which is "
        "what lets DuckDB verify the exact same assignment."
    ),
)
def q_split_train_val_test(spark, sf_dir):
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        _t(spark, sf_dir, "documents")
        .select(F.col("n_chars"), split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("split")
    )


@register(
    "pack_sequences_contiguous",
    "SELECT seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens FROM ("
    "  SELECT CAST(FLOOR(COALESCE(SUM(n_tokens) OVER ("
    "           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
    "         / 512.0) AS BIGINT) AS seq_id, n_tokens FROM ("
    "    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens "
    "    FROM documents)) "
    "GROUP BY seq_id ORDER BY seq_id",
    doc=(
        "Sequence packing: assign docs (in stable doc_id order) to fixed "
        "512-token training sequences by bucketing the running token count — "
        "one window pass, no driver loop. At 100 TB the single ORDER BY "
        "window is the textbook case for range-partitioned windows: "
        "repartitionByRange(doc_id) + per-range cumsum + broadcast range "
        "offsets; here the dataset-per-shard form is what ships."
    ),
)
def q_pack_sequences_contiguous(spark, sf_dir):
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    seq = F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 512.0)
    return (
        toks.select(seq.cast("long").alias("seq_id"), "n_tokens")
        .groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("seq_tokens"),
        )
        .orderBy("seq_id")
    )


@register(
    "quality_repetition_filter",
    "SELECT doc_id, CAST(total_tokens AS BIGINT) AS total_tokens, "
    "CAST(top_token_count AS BIGINT) AS top_token_count FROM ("
    "  SELECT doc_id, SUM(n) AS total_tokens, MAX(n) AS top_token_count FROM ("
    "    SELECT doc_id, COUNT(*) AS n FROM ("
    "      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) "
    "    GROUP BY doc_id, tok) "
    "  GROUP BY doc_id) "
    "WHERE 10 * top_token_count >= total_tokens ORDER BY doc_id",
    doc=(
        "Gopher-style repetition quality gate: flag docs whose single most "
        "frequent token is >=10% of the doc. Integer-only comparison "
        "(10*top >= total) so the oracle hash never hits float rounding. "
        "One explode + two-level partial agg; the explode is row-bounded by "
        "token count, never materialized wider than the shuffle batch."
    ),
)
def q_quality_repetition_filter(spark, sf_dir):
    per_tok = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("n"))
    )
    per_doc = per_tok.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("total_tokens"),
        F.max("n").cast("long").alias("top_token_count"),
    )
    return (
        per_doc.filter(10 * F.col("top_token_count") >= F.col("total_tokens"))
        .orderBy("doc_id")
    )


@register(
    "contamination_ngram_check",
    "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
    "g AS (SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS gram "
    "      FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) r), "
    "corpus AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 20 != 0), "
    "bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0) "
    "SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams "
    "FROM corpus c JOIN bench b USING (gram) "
    "GROUP BY c.doc_id ORDER BY c.doc_id",
    doc=(
        "Benchmark-contamination check: count word n-grams each corpus doc "
        "shares with a held-out benchmark set (here every-20th doc; n=3 to "
        "match the synthetic vocab density — production uses n=8..13). "
        "Benchmark gram set is DISTINCT-reduced then broadcast, so the scan "
        "over 100 TB of corpus grams never shuffles: map-side hash probe "
        "plus a key-only groupBy on doc_id."
    ),
)
def q_contamination_ngram_check(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ws") >= 3,
                F.expr("transform(sequence(1, size(ws) - 2), i -> concat_ws(' ', slice(ws, i, 3)))"),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    corpus = grams.filter(F.col("doc_id") % 20 != 0).distinct()
    bench = grams.filter(F.col("doc_id") % 20 == 0).select("gram").distinct()
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .orderBy("doc_id")
    )


@register(
    "scrub_denylist_tokens",
    "WITH h AS (SELECT doc_id, length(regexp_replace(text, '\\b(customer|order)\\b', "
    "'[REDACTED]', 'g')) AS len_after FROM documents), "
    "t AS (SELECT doc_id, COUNT(*) AS hits FROM ("
    "        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) "
    "      WHERE tok IN ('customer', 'order') GROUP BY doc_id) "
    "SELECT CAST(COUNT(t.doc_id) AS BIGINT) AS n_docs_affected, "
    "CAST(SUM(COALESCE(t.hits, 0)) AS BIGINT) AS total_hits, "
    "CAST(SUM(h.len_after) AS BIGINT) AS chars_after_redaction "
    "FROM h LEFT JOIN t ON h.doc_id = t.doc_id",
    doc=(
        "Denylist scrubbing (the PII-redaction shape: emails/phones/names -> "
        "a regexp_replace with word boundaries): rewrite the text column and "
        "report docs touched / total replacements. regexp_replace runs "
        "JVM-side inside codegen — no Python in the hot path; the audit "
        "counts come from a token explode aggregated per doc then joined "
        "back, all map-side until the final single-row agg."
    ),
)
def q_scrub_denylist_tokens(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        F.length(
            F.regexp_replace("text", r"\b(customer|order)\b", "[REDACTED]")
        ).alias("len_after"),
    )
    t = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok").isin("customer", "order"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("hits"))
    )
    return h.join(t, "doc_id", "left").agg(
        F.count(t["hits"]).alias("n_docs_affected"),
        F.sum(F.coalesce(t["hits"], F.lit(0))).cast("long").alias("total_hits"),
        F.sum("len_after").cast("long").alias("chars_after_redaction"),
    )


@register(
    "vocab_top_tokens",
    "SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM ("
    "  SELECT unnest(string_split(text, ' ')) AS tok FROM documents) "
    "GROUP BY tok ORDER BY n DESC, tok LIMIT 100",
    doc=(
        "Corpus vocabulary build: token frequency table, top-100. The "
        "explode+groupBy is fully map-side-combinable (partial agg on the "
        "token key before the shuffle), so shuffle volume is |vocab| per "
        "partition, not |tokens| — the only shape that survives a 100 TB "
        "corpus with a multi-million-entry vocab."
    ),
)
def q_vocab_top_tokens(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(100)
    )


@register(
    "corpus_shuffle_deterministic",
    "SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS shuffle_key "
    "FROM documents ORDER BY shuffle_key, doc_id LIMIT 200",
    doc=(
        "Deterministic global corpus shuffle: order by md5(key) — "
        "reproducible across runs and engines (vs rand(), which is neither). "
        "At scale this is repartitionByRange(shuffle_key) + "
        "sortWithinPartitions at write time: each output shard is a random "
        "sample of the corpus, which is exactly what sequential training-"
        "data loaders need."
    ),
)
def q_corpus_shuffle_deterministic(spark, sf_dir):
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", key.alias("shuffle_key"))
        .orderBy("shuffle_key", "doc_id")
        .limit(200)
    )


@register(
    "scd2_user_intervals",
    "SELECT user_id, event_id, event_type, valid_from, valid_to, is_current FROM ("
    "  SELECT CAST(user_id AS BIGINT) AS user_id, event_id, event_type, "
    "         ts AS valid_from, "
    "         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to, "
    "         CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "              IS NULL THEN 1 ELSE 0 END AS is_current "
    "  FROM events) "
    "ORDER BY user_id, valid_from, event_id LIMIT 300",
    doc=(
        "SCD Type-2 interval build: turn an append-only event log into "
        "[valid_from, valid_to) history rows with an is_current flag — the "
        "other half of the CDC pair with latest_event_per_user. One LEAD "
        "window per key; shuffle is on user_id only, and the window state "
        "per key is O(1), so the pass is safe at any log size."
    ),
)
def q_scd2_user_intervals(spark, sf_dir):
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return (
        _t(spark, sf_dir, "events")
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            "event_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            valid_to.alias("valid_to"),
            F.when(valid_to.isNull(), 1).otherwise(0).alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "event_id")
        .limit(300)
    )


@register(
    "mixture_weighted_sources",
    "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total, "
    "CAST(SUM(CASE WHEN b < w THEN 1 ELSE 0 END) AS BIGINT) AS n_kept FROM ("
    "  SELECT source, "
    "    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b, "
    "    CASE WHEN source IN ('src0','src1','src2') THEN 80 "
    "         WHEN source IN ('src3','src4') THEN 50 ELSE 20 END AS w "
    "  FROM documents) "
    "GROUP BY source ORDER BY source",
    doc=(
        "Training-mix construction: per-source sampling weights (here "
        "80/50/20%) applied via the same md5-bucket trick as the split — "
        "each doc's keep/drop decision is a pure function of its key, so "
        "the mixture is reproducible run-to-run and engine-to-engine with "
        "no rand() seed coordination. Pure map-side until the per-source "
        "count agg."
    ),
)
def q_mixture_weighted_sources(spark, sf_dir):
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    weight = (
        F.when(F.col("source").isin("src0", "src1", "src2"), 80)
        .when(F.col("source").isin("src3", "src4"), 50)
        .otherwise(20)
    )
    return (
        _t(spark, sf_dir, "documents")
        .select("source", (bucket < weight).cast("int").alias("keep"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("keep").cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )


# ===========================================================================
# Observability / product analytics: anomaly detection, funnel, retention
# ===========================================================================


@register(
    "anomaly_rolling_zscore",
    "SELECT event_type, h, n, s, c FROM ("
    "  SELECT event_type, h, n, "
    "    CAST(COUNT(*) OVER w AS BIGINT) AS c, "
    "    CAST(COALESCE(SUM(n) OVER w, 0) AS BIGINT) AS s, "
    "    CAST(COALESCE(SUM(n * n) OVER w, 0) AS BIGINT) AS ss "
    "  FROM ("
    "    SELECT event_type, date_trunc('hour', ts) AS h, "
    "           CAST(COUNT(*) AS BIGINT) AS n "
    "    FROM events GROUP BY event_type, date_trunc('hour', ts)) "
    "  WINDOW w AS (PARTITION BY event_type ORDER BY h "
    "               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)) "
    "WHERE c >= 12 AND (c*n - s)*(c*n - s)*(c - 1) > 4*c*(c*ss - s*s) "
    "ORDER BY event_type, h",
    doc=(
        "Rolling z-score anomaly detection on the per-hour event-rate "
        "series (the observability alerting shape): flag hours where the "
        "count deviates >2 sigma from the trailing 24h window. The z test "
        "is algebraically rearranged to PURE INTEGER arithmetic — "
        "(c*n-s)^2*(c-1) > 4c(c*ss-s^2) — so there is no float in the "
        "comparison and the oracle hash can never hit a rounding boundary "
        "(the lesson from the window_frames 1-ulp bug). Raw events collapse "
        "to the hourly series first, so the window pass runs over "
        "|types|*|hours| rows regardless of raw volume."
    ),
)
def q_anomaly_rolling_zscore(spark, sf_dir):
    hourly = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    stats = hourly.select(
        "event_type",
        "h",
        "n",
        F.count("*").over(w).cast("long").alias("c"),
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long").alias("s"),
        F.coalesce(F.sum(F.col("n") * F.col("n")).over(w), F.lit(0))
        .cast("long")
        .alias("ss"),
    )
    c, n, s, ss = F.col("c"), F.col("n"), F.col("s"), F.col("ss")
    dev = c * n - s
    return (
        stats.filter((c >= 12) & (dev * dev * (c - 1) > 4 * c * (c * ss - s * s)))
        .select("event_type", "h", "n", "s", "c")
        .orderBy("event_type", "h")
    )


@register(
    "funnel_view_click_purchase",
    "WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events "
    "           WHERE event_type = 'view' GROUP BY user_id), "
    "c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e "
    "      JOIN v ON e.user_id = v.user_id "
    "      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id), "
    "p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e "
    "      JOIN c ON e.user_id = c.user_id "
    "      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id) "
    "SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view, "
    "       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_after_view, "
    "       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_after_click",
    doc=(
        "Ordered funnel analysis: users who viewed, then clicked AFTER "
        "their first view, then purchased AFTER that click — strict event "
        "ordering, not mere set membership. Each stage is a per-user MIN "
        "aggregate (shuffle on user_id only) joined into the next stage's "
        "filter. The stage frames are |users| rows — unbounded at 100 TB — "
        "so the join strategy is deliberately left to AQE: it broadcasts "
        "when the frame fits under autoBroadcastJoinThreshold and degrades "
        "to a shuffle join instead of OOMing the driver when it doesn't "
        "(VERDICT r1 'What's wrong' #1: a forced broadcast hint here would "
        "override AQE's size check and fail the job at scale)."
    ),
)
def q_funnel_view_click_purchase(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


@register(
    "cohort_weekly_retention",
    "WITH first_seen AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week "
    "                    FROM events GROUP BY user_id) "
    "SELECT f.cohort_week, "
    "  CAST(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) / 7 AS INT) AS week_offset, "
    "  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active "
    "FROM events e JOIN first_seen f ON e.user_id = f.user_id "
    "GROUP BY f.cohort_week, week_offset ORDER BY f.cohort_week, week_offset",
    doc=(
        "Cohort retention: bucket users by first-activity week, count "
        "distinct active users at each week offset. The first-seen frame "
        "is one per-user MIN (|users| rows — unbounded at 100 TB, so the "
        "join back onto the log is left to AQE rather than force-broadcast; "
        "see VERDICT r1 'What's wrong' #1); the retention agg shuffles on "
        "(cohort, offset) — a handful of cells — with count-distinct on "
        "user_id as the only wide state. "
        "Monday-start date_trunc('week') agrees between Spark and DuckDB."
    ),
)
def q_cohort_weekly_retention(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", "ts"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "merge_upsert_orders",
    "WITH changes AS ("
    "  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2 AS o_totalprice, "
    "         o_orderdate, o_orderpriority "
    "  FROM orders WHERE o_orderkey % 10 = 0), "
    "merged AS ("
    "  SELECT * FROM changes "
    "  UNION ALL "
    "  SELECT b.* FROM orders b WHERE NOT EXISTS ("
    "    SELECT 1 FROM changes c WHERE c.o_orderkey = b.o_orderkey)) "
    "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, "
    "       ROUND(SUM(o_totalprice), 2) AS total "
    "FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus",
    doc=(
        "MERGE INTO / upsert shape (operators/upsert.py): apply a keyed "
        "change feed (every 10th order repriced) over the base snapshot — "
        "changes UNION ALL (base ANTI JOIN changes). The change set "
        "broadcasts, so the 100 TB base side never shuffles; output is a "
        "new snapshot, never an in-place rewrite. Verified end-to-end via "
        "the per-status aggregate."
    ),
)
def q_merge_upsert_orders(spark, sf_dir):
    from demo_otel_parquet_antalya_spark.operators.upsert import merge_upsert

    base = _t(spark, sf_dir, "orders")
    changes = base.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    merged = merge_upsert(base, changes, keys=["o_orderkey"])
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "skew_key_diagnostic",
    "SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n, "
    "       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS total_rows "
    "FROM lineitem GROUP BY l_suppkey "
    "ORDER BY n DESC, l_suppkey LIMIT 20",
    doc=(
        "Join-key skew diagnostic: the top-20 heaviest keys with the table "
        "total alongside — the profiling pass that decides between a plain "
        "shuffle join, AQE skew splitting, and util.salted_join. Partial "
        "agg + TakeOrderedAndProject: the heavy-hitter scan itself never "
        "sorts the full key domain. Integer-only output."
    ),
)
def q_skew_key_diagnostic(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    total = li.agg(F.count("*").alias("total_rows"))
    return (
        li.groupBy("l_suppkey")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))
        .orderBy(F.col("n").desc(), "l_suppkey")
        .limit(20)
    )


@register(
    "histogram_equidepth",
    "SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n, "
    "MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM ("
    "  SELECT o_totalprice, NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket "
    "  FROM orders) GROUP BY bucket ORDER BY bucket",
    doc=(
        "Equi-DEPTH histogram (quantile binning): 10 buckets of equal row "
        "count with their value ranges — the complement of the equi-width "
        "histogram_totalprice. The o_orderkey tiebreak makes the NTILE "
        "assignment a total order, hence engine-deterministic. The global "
        "sort is the verifiable small-scale form; at 100 TB the same "
        "buckets come from approx_percentile boundaries broadcast into a "
        "map-side CASE — no global sort — at the cost of boundary "
        "approximation."
    ),
)
def q_histogram_equidepth(spark, sf_dir):
    w = W.orderBy("o_totalprice", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .select("o_totalprice", F.ntile(10).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bucket")
    )


# ===========================================================================
# Statistical / regression aggregates (SURVEY §2.C agg-function surface)
# ===========================================================================


@register(
    "agg_regression",
    "SELECT l_returnflag, "
    "ROUND(regr_slope(l_extendedprice, l_quantity), 2) AS slope, "
    "ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS icept, "
    "ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2, "
    "CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n "
    "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    doc=(
        "Linear-regression aggregates (slope/intercept/R²) per group — "
        "single-pass moment computation, map-side combinable like any "
        "algebraic aggregate; no second scan, no driver math."
    ),
)
def q_agg_regression(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 2).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias("icept"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
            F.regr_count("l_extendedprice", "l_quantity").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_conditional_bools",
    "SELECT o_orderstatus, "
    "CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big, "
    "bool_and(o_totalprice > 900) AS all_above_floor, "
    "bool_or(o_orderpriority = '1-URGENT') AS any_urgent "
    "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    doc=(
        "Conditional/boolean aggregates: count_if, bool_and, bool_or "
        "(Spark every/any) — all algebraic, one shuffle."
    ),
)
def q_agg_conditional_bools(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
            F.bool_and(F.col("o_totalprice") > 900).alias("all_above_floor"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_mode_deterministic",
    "SELECT o_orderstatus, o_orderpriority AS mode_priority, CAST(n AS BIGINT) AS n FROM ("
    "  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, "
    "  ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY COUNT(*) DESC, o_orderpriority) AS rn "
    "  FROM orders GROUP BY o_orderstatus, o_orderpriority) t "
    "WHERE rn = 1 ORDER BY o_orderstatus",
    doc=(
        "Deterministic mode (most frequent value, ties broken by value "
        "order): count-then-rank rather than the engine-native mode() whose "
        "tie-break is unspecified and engine-dependent. Two-level shuffle, "
        "both on small post-aggregate data."
    ),
)
def q_agg_mode_deterministic(spark, sf_dir):
    counts = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("o_orderstatus").orderBy(F.col("n").desc(), "o_orderpriority")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "n")
        .orderBy("o_orderstatus")
    )


@register(
    "agg_median_by_group",
    "SELECT o_orderpriority, ROUND(median(o_totalprice), 2) AS med "
    "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    doc=(
        "Grouped exact median (Spark median ≡ percentile 0.5 ≡ DuckDB "
        "quantile_cont interpolation). The 100 TB path is "
        "approx_percentile — bounded-memory sketch — once exactness "
        "stops mattering more than memory."
    ),
)
def q_agg_median_by_group(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.round(F.median("o_totalprice"), 2).alias("med"))
        .orderBy("o_orderpriority")
    )


# ===========================================================================
# Classic TPC-H-shaped analytics (SURVEY §2.C join/agg surface, bench shapes)
# ===========================================================================


@register(
    "tpch_q3_shipping_priority",
    "SELECT l_orderkey, "
    "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue, "
    "o_orderdate, o_orderpriority "
    "FROM customer "
    "JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "WHERE c_mktsegment = 'BUILDING' "
    "AND o_orderdate < TIMESTAMP '1995-03-15' "
    "AND l_shipdate > TIMESTAMP '1995-03-15' "
    "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
    "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10",
    doc=(
        "TPC-H Q3 shape (shipping priority): selective dimension filter -> "
        "fact join -> grouped revenue -> top-k. customer is the small side "
        "(broadcast); lineitem never shuffles before its filter. The LIMIT "
        "plans as TakeOrderedAndProject — no global sort at 100 TB. "
        "Revenue is summed in DECIMAL(18,4): money totals must round "
        "identically on every engine, and double-sum order makes "
        "ROUND(sum,2) land on half-cent boundaries nondeterministically."
    ),
    bench=True,
)
def q_tpch_q3(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1995-03-15").cast("timestamp")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
            ),
            2,
        ).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q10_returned_items",
    "SELECT c_custkey, c_name, "
    "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue, "
    "ROUND(c_acctbal, 2) AS acctbal "
    "FROM customer "
    "JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "WHERE o_orderdate >= TIMESTAMP '1995-01-01' "
    "AND o_orderdate < TIMESTAMP '1995-04-01' "
    "AND l_returnflag = 'R' "
    "GROUP BY c_custkey, c_name, c_acctbal "
    "ORDER BY revenue DESC, c_custkey LIMIT 20",
    doc=(
        "TPC-H Q10 shape (returned-item reporting): quarter time-range on "
        "orders (1995 Q1 — the generator's first populated quarter, so "
        "the oracle hash covers real rows, not a trivially-equal empty "
        "set) + flag filter on lineitem; customer broadcast last. "
        "Both fact filters push to the parquet scans (min/max row-group "
        "skipping on o_orderdate at scale)."
    ),
    bench=True,
)
def q_tpch_q10(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
            ),
            2,
        ).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q18_large_orders",
    "SELECT c_custkey, o_orderkey, o_orderdate, "
    "ROUND(o_totalprice, 2) AS totalprice, ROUND(qty, 2) AS qty FROM ("
    "  SELECT l_orderkey, SUM(l_quantity) AS qty FROM lineitem "
    "  GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) big "
    "JOIN orders ON o_orderkey = l_orderkey "
    "JOIN customer ON c_custkey = o_custkey "
    "ORDER BY totalprice DESC, o_orderkey LIMIT 20",
    doc=(
        "TPC-H Q18 shape (large-volume orders): pre-aggregate lineitem to "
        "order grain FIRST (map-side-combinable sum shrinks the fact ~4x "
        "before any join), HAVING-filter to the rare heavy orders, then "
        "join the survivors. Aggregating before joining is the 100 TB "
        "ordering; joining first would shuffle the full fact twice."
    ),
)
def q_tpch_q18(spark, sf_dir):
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("qty", 2).alias("qty"),
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(20)
    )


# ===========================================================================
# String aggregation / conditional scalars / bitwise / nth_value
# ===========================================================================


@register(
    "string_agg_nation_names",
    "SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
    doc=(
        "String aggregation (LISTAGG/string_agg): collect_list + sort_array "
        "+ array_join. Sorting inside the aggregate (not a global sort) "
        "keeps the result deterministic and the shuffle key-only."
    ),
)
def q_string_agg_nation_names(spark, sf_dir):
    return (
        _t(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("names"),
            F.count("*").alias("n"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "scalar_conditional_fns",
    "SELECT o_orderkey, "
    "ROUND(GREATEST(o_totalprice, 100000.0), 2) AS hi, "
    "ROUND(LEAST(o_totalprice, 100000.0), 2) AS lo, "
    "NULLIF(o_orderstatus, 'F') AS open_status, "
    "COALESCE(NULLIF(o_orderstatus, 'F'), 'closed') AS status_label "
    "FROM orders ORDER BY o_orderkey LIMIT 100",
    doc="Conditional scalar functions: GREATEST/LEAST/NULLIF/COALESCE — pure codegen, no shuffle.",
)
def q_scalar_conditional_fns(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.round(F.greatest("o_totalprice", F.lit(100000.0)), 2).alias("hi"),
            F.round(F.least("o_totalprice", F.lit(100000.0)), 2).alias("lo"),
            F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("open_status"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("F")), F.lit("closed")).alias("status_label"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


@register(
    "agg_bitwise",
    "SELECT l_returnflag, "
    "CAST(bit_and(l_linenumber) AS INT) AS b_and, "
    "CAST(bit_or(l_linenumber) AS INT) AS b_or, "
    "CAST(bit_xor(l_linenumber) AS INT) AS b_xor "
    "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    doc=(
        "Bitwise aggregates (bit_and/bit_or/bit_xor) — commutative+"
        "associative, so fully map-side combinable; used for flag-mask "
        "rollups over wide event tables."
    ),
)
def q_agg_bitwise(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.bit_and("l_linenumber").alias("b_and"),
            F.bit_or("l_linenumber").alias("b_or"),
            F.bit_xor("l_linenumber").alias("b_xor"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "window_nth_value",
    "SELECT event_id, "
    "ROUND(FIRST_VALUE(value) OVER w, 4) AS first_v, "
    "ROUND(NTH_VALUE(value, 3) OVER w, 4) AS third_v "
    "FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "ORDER BY event_id LIMIT 100",
    doc=(
        "Positional window functions (FIRST_VALUE / NTH_VALUE) over a "
        "running frame — one window pass, same shuffle as any per-user "
        "ordered analytic."
    ),
)
def q_window_nth_value(spark, sf_dir):
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.round(F.first("value").over(w), 4).alias("first_v"),
            F.round(F.nth_value("value", 3).over(w), 4).alias("third_v"),
        )
        .orderBy("event_id")
        .limit(100)
    )


# ===========================================================================
# TPC-H suite completion (SURVEY §2.C join/agg/subquery surface).
# The testdata schema is column-slimmed TPC-H (no partsupp, no comment/
# commitdate/receiptdate/shipmode/container/phone columns), so queries whose
# predicates need those columns are adapted: the plan SHAPE (join graph,
# subquery class, agg structure) is preserved and the predicate swapped for an
# equivalent-selectivity one on an existing column. Q2/Q9/Q11/Q16/Q20 need
# partsupp and are out of scope for this dataset.
# ===========================================================================


@register(
    "tpch_q4_order_priority",
    "SELECT o_orderpriority, COUNT(*) AS n FROM orders "
    "WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
    "AND o_orderdate < TIMESTAMP '1996-04-01' "
    "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
    "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) "
    "GROUP BY o_orderpriority ORDER BY o_orderpriority",
    doc=(
        "TPC-H Q4 shape (order-priority checking): quarter filter on orders, "
        "EXISTS lineitem late-shipment probe (adapted: l_shipdate > "
        "o_orderdate + 60d stands in for commitdate < receiptdate). Plans as "
        "a LEFT SEMI join keyed on l_orderkey — the quarter filter shrinks "
        "the build side before the semi, and the non-equi date term rides "
        "the equi key, so no cartesian at any scale."
    ),
)
def q_tpch_q4(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q5_local_supplier_volume",
    "SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "WHERE r_name = 'ASIA' "
    "AND o_orderdate >= TIMESTAMP '1996-01-01' "
    "AND o_orderdate < TIMESTAMP '1997-01-01' "
    "GROUP BY n_name ORDER BY revenue DESC, n_name",
    doc=(
        "TPC-H Q5 (local supplier volume): 6-table star with the "
        "customer-nation = supplier-nation co-location term. lineitem joins "
        "orders on the shuffle key once; supplier/nation/region are "
        "broadcast dims, so the only big exchange is lineitem x orders. The "
        "region filter prunes the nation broadcast to one region's worth "
        "before it ever touches the fact."
    ),
)
def q_tpch_q5(spark, sf_dir):
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "tpch_q6_forecast_revenue",
    "SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue "
    "FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "AND l_shipdate < TIMESTAMP '1997-01-01' "
    "AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24",
    doc=(
        "TPC-H Q6 (forecast revenue change): pure scan-filter-agg. All three "
        "predicates push to the parquet scan (PushedFilters), the aggregate "
        "is map-side partial + 1-row merge — the cheapest possible shape at "
        "100 TB: IO-bound, zero shuffle of data rows."
    ),
)
def q_tpch_q6(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_q7_volume_shipping",
    "SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue "
    "FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
    "CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year, "
    "l_extendedprice * (1 - l_discount) AS volume "
    "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey "
    "JOIN orders ON o_orderkey = l_orderkey "
    "JOIN customer ON c_custkey = o_custkey "
    "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
    "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
    "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
    "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
    "AND l_shipdate >= TIMESTAMP '1996-01-01' "
    "AND l_shipdate < TIMESTAMP '1998-01-01') shipping "
    "GROUP BY supp_nation, cust_nation, l_year "
    "ORDER BY supp_nation, cust_nation, l_year",
    doc=(
        "TPC-H Q7 (volume shipping between two nations): the nation pair "
        "predicate is applied via two pre-filtered broadcast copies of "
        "nation, so supplier and customer shrink to two nations' worth "
        "before the fact join; the pair-symmetry OR is evaluated on the "
        "two joined dim names, not as a cross filter."
    ),
)
def q_tpch_q7(spark, sf_dir):
    pair = ("NATION_1", "NATION_2")
    n1 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    "SELECT o_year, ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) "
    "/ SUM(volume), 4) AS mkt_share "
    "FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year, "
    "l_extendedprice * (1 - l_discount) AS volume, n2.n_name AS nation "
    "FROM part JOIN lineitem ON p_partkey = l_partkey "
    "JOIN supplier ON s_suppkey = l_suppkey "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation n1 ON c_nationkey = n1.n_nationkey "
    "JOIN region ON n1.n_regionkey = r_regionkey "
    "JOIN nation n2 ON s_nationkey = n2.n_nationkey "
    "WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY' "
    "AND o_orderdate >= TIMESTAMP '1996-01-01' "
    "AND o_orderdate < TIMESTAMP '1998-01-01') all_nations "
    "GROUP BY o_year ORDER BY o_year",
    doc=(
        "TPC-H Q8 (national market share): 8-table star, conditional-share "
        "aggregate. The selective p_type filter makes part a broadcast dim "
        "(at 100 TB AQE demotes it to shuffle join if the filtered side "
        "outgrows the threshold — no hint forces it on the unbounded side); "
        "customer-side nation+region prune the probe before the fact joins. "
        "The share is one pass: SUM(CASE)/SUM."
    ),
)
def q_tpch_q8(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cust_nkey"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("nation")
    )
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("cust_nkey")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q12_late_lines_by_flag",
    "SELECT l_returnflag, "
    "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
    "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
    "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
    "WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY "
    "AND o_orderdate >= TIMESTAMP '1996-01-01' "
    "AND o_orderdate < TIMESTAMP '1997-01-01' "
    "GROUP BY l_returnflag ORDER BY l_returnflag",
    doc=(
        "TPC-H Q12 shape (shipping-mode / priority split; adapted: "
        "l_returnflag stands in for the absent l_shipmode, shipdate-lag "
        "for the absent commit/receipt pair). One equi join with a "
        "residual non-equi date term, then a two-way conditional count — "
        "both counts in a single grouped pass, no second scan."
    ),
)
def q_tpch_q12(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "tpch_q13_customer_distribution",
    "SELECT c_count, COUNT(*) AS custdist FROM ("
    "SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count "
    "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
    "AND o_orderpriority <> '1-URGENT' "
    "GROUP BY c_custkey) c_orders "
    "GROUP BY c_count ORDER BY custdist DESC, c_count DESC",
    doc=(
        "TPC-H Q13 (customer distribution; adapted: the o_comment NOT LIKE "
        "filter becomes an o_orderpriority exclusion — same left-join-with-"
        "ON-clause-filter shape, which is the semantic point: the filter "
        "must live in the join condition, not a WHERE, to keep 0-order "
        "customers). Double aggregation: per-customer count, then histogram "
        "of counts — the second groupBy is tiny (distinct counts)."
    ),
)
def q_tpch_q13(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q14_promo_revenue",
    "SELECT ROUND(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%' "
    "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
    "/ SUM(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "WHERE l_shipdate >= TIMESTAMP '1996-09-01' "
    "AND l_shipdate < TIMESTAMP '1996-10-01'",
    doc=(
        "TPC-H Q14 (promotion effect): month-sliced fact joined to part, "
        "conditional-share aggregate. The month filter cuts lineitem ~1/84 "
        "at the scan; part joins hint-free (it grows with the corpus, so "
        "AQE broadcasts while it fits, shuffle-joins beyond). One pass, "
        "1-row result."
    ),
)
def q_tpch_q14(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").like("PROMO%"), disc).otherwise(0.0))
                / F.sum(disc),
                2,
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q15_top_supplier",
    "WITH revenue AS (SELECT l_suppkey AS supplier_no, "
    "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue "
    "FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "AND l_shipdate < TIMESTAMP '1996-04-01' "
    "GROUP BY l_suppkey) "
    "SELECT s_suppkey, s_name, total_revenue "
    "FROM supplier JOIN revenue ON s_suppkey = supplier_no "
    "WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue) "
    "ORDER BY s_suppkey",
    doc=(
        "TPC-H Q15 (top supplier): revenue-per-supplier aggregate reused "
        "twice (argmax + detail). The max is a 1-row aggregate broadcast "
        "back onto the supplier-grain frame — no single-partition window, "
        "no global sort; the per-supplier frame is |supplier|-sized, so "
        "recomputing it for the scalar is two cheap passes over an "
        "already-aggregated input."
    ),
)
def q_tpch_q15(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    "SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly "
    "FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey "
    "WHERE p_brand = 'Brand#3' "
    "AND l1.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2 "
    "WHERE l2.l_partkey = l1.l_partkey)",
    doc=(
        "TPC-H Q17 shape (small-quantity-order revenue; adapted: brand-only "
        "filter, no p_container in schema; 0.5x threshold keeps the "
        "predicate non-vacuous on uniform quantities). The correlated "
        "per-part AVG decorrelates to: semi-prune lineitem to the brand's "
        "parts FIRST (broadcast the filtered part), aggregate avg per "
        "partkey over just those rows, then rejoin — the full-fact "
        "per-part aggregate the naive plan would compute never happens."
    ),
)
def q_tpch_q17(spark, sf_dir):
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    thresholds = li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("qty_threshold")
    )
    # thresholds is an AGGREGATE frame (one row per part of the brand) —
    # linear in |part|, so no forced broadcast hint; AQE broadcasts it while
    # it fits and falls back to a shuffle join when the brand outgrows it
    return (
        li.join(thresholds.withColumnRenamed("l_partkey", "t_partkey"),
                F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "tpch_q19_discounted_revenue",
    "SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 "
    "AND l_quantity BETWEEN 1 AND 11) "
    "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 "
    "AND l_quantity BETWEEN 10 AND 20) "
    "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 "
    "AND l_quantity BETWEEN 20 AND 30)",
    doc=(
        "TPC-H Q19 shape (discounted revenue, disjunctive mixed-table "
        "predicate; adapted: brand/size stand in for the absent container/"
        "shipmode legs). The OR spans both tables, so it can only be "
        "evaluated post-join — but Catalyst derives the single-table "
        "implications (p_brand IN (...), p_size <= 35, l_quantity <= 30) "
        "and pushes those to both scans, so each side is pruned before the "
        "broadcast join and the residual OR runs on the survivors."
    ),
)
def q_tpch_q19(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    leg = lambda brand, size_hi, q_lo, q_hi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return (
        joined.filter(
            leg("Brand#1", 15, 1, 11) | leg("Brand#2", 25, 10, 20) | leg("Brand#3", 35, 20, 30)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q21_suppliers_kept_waiting",
    "SELECT s_name, COUNT(*) AS numwait "
    "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey "
    "JOIN orders ON o_orderkey = l1.l_orderkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE o_orderstatus = 'F' AND n_name = 'NATION_5' "
    "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey "
    "AND l2.l_suppkey <> l1.l_suppkey) "
    "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey "
    "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > l1.l_shipdate) "
    "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20",
    doc=(
        "TPC-H Q21 shape (suppliers who kept orders waiting; adapted: "
        "'this supplier shipped last in a multi-supplier order' via "
        "l_shipdate — the schema has no receipt/commit dates). EXISTS -> "
        "LEFT SEMI and NOT EXISTS -> LEFT ANTI self-joins on the order "
        "key; both reuse the same l_orderkey shuffle partitioning, and "
        "the nation filter shrinks the supplier side to 1/25 before the "
        "fact join."
    ),
)
def q_tpch_q21(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    waiting = (
        l1.join(l2, (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2), "left_semi")
        .join(
            l3,
            (F.col("l_orderkey") == l3.o3)
            & (F.col("l_suppkey") != l3.s3)
            & (l3.d3 > F.col("l_shipdate")),
            "left_anti",
        )
    )
    return (
        waiting.join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "tpch_q22_global_sales_opportunity",
    "SELECT cntrycode, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal "
    "FROM (SELECT c_nationkey AS cntrycode, c_acctbal FROM customer "
    "WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7) "
    "AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer "
    "WHERE c_acctbal > 0.00 AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7)) "
    "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) custsale "
    "GROUP BY cntrycode ORDER BY cntrycode",
    doc=(
        "TPC-H Q22 shape (global sales opportunity; adapted: c_nationkey "
        "stands in for the absent phone-prefix country code). The "
        "uncorrelated AVG is a 1-row broadcast scalar; the NOT EXISTS is a "
        "LEFT ANTI against orders projected to o_custkey only — at 100 TB "
        "the anti side is a distinct-key shuffle of one bigint column, not "
        "the orders table."
    ),
)
def q_tpch_q22(spark, sf_dir):
    codes = [1, 2, 3, 4, 5, 6, 7]
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(codes))
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    orders_keys = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders_keys, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# Derived partsupp fixture + the five partsupp TPC-H shapes (VERDICT r3
# item 4). The driver testdata ships no partsupp table, so it is DERIVED,
# identically on both engines, from the distinct (l_partkey, l_suppkey)
# pairs of lineitem — FK-consistent with part, supplier AND lineitem by
# construction (every lineitem join partner exists, the true TPC-H
# property) — with deterministic integer-arithmetic attributes:
# ps_availqty in [1, 9998], ps_supplycost = k/100 + 1 with k < 100000.
# All arithmetic is integer + one double division, bit-identical across
# engines. These five queries sit past the 50-slot driver window on
# purpose: the driver runs them against the same DuckDB CTE, but the
# fixture derivation would be the thing under test in slot terms.
# ---------------------------------------------------------------------------

_PARTSUPP_SQL = (
    "partsupp AS (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey, "
    "CAST((l_partkey * 7 + l_suppkey * 13) % 9998 + 1 AS INTEGER) AS ps_availqty, "
    "CAST((l_partkey * 31 + l_suppkey * 17) % 100000 AS DOUBLE) / 100.0 + 1.0 "
    "AS ps_supplycost FROM lineitem GROUP BY l_partkey, l_suppkey)"
)


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp fixture (see block comment above)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .select(
            "ps_partkey",
            "ps_suppkey",
            ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % 9998 + 1)
            .cast("int")
            .alias("ps_availqty"),
            (
                ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 100000)
                .cast("double")
                / 100.0
                + 1.0
            ).alias("ps_supplycost"),
        )
    )


@register(
    "tpch_q2_min_cost_supplier",
    f"WITH {_PARTSUPP_SQL}, "
    "europe AS (SELECT s_suppkey, s_name, s_acctbal, n_name "
    "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'), "
    "costs AS (SELECT ps_partkey, ps_suppkey, ps_supplycost FROM partsupp "
    "JOIN europe ON ps_suppkey = s_suppkey), "
    "minc AS (SELECT ps_partkey, MIN(ps_supplycost) AS mc FROM costs "
    "GROUP BY ps_partkey) "
    "SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost "
    "FROM part "
    "JOIN costs ON p_partkey = costs.ps_partkey "
    "JOIN minc ON minc.ps_partkey = costs.ps_partkey "
    "AND costs.ps_supplycost = minc.mc "
    "JOIN europe ON costs.ps_suppkey = europe.s_suppkey "
    "WHERE p_size = 15 AND p_type = 'STANDARD' "
    "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100",
    doc=(
        "TPC-H Q2 shape (minimum-cost supplier; adapted: p_brand stands in "
        "for the absent p_mfgr, region-filtered supplier attrs for the "
        "absent address/phone/comment). The per-part MIN(ps_supplycost) is "
        "the correlated-subquery decorrelation: one aggregate on the "
        "already-region-pruned costs, equi-joined back — never a per-row "
        "subquery. supplier/nation/region fold into one broadcast dim; "
        "partsupp is the only shuffled side. Cost equality compares "
        "bit-identical doubles (same derivation both engines)."
    ),
)
def q_tpch_q2(spark, sf_dir):
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    europe = (
        sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = _partsupp(spark, sf_dir).join(
        F.broadcast(europe.select("s_suppkey")),
        F.col("ps_suppkey") == F.col("s_suppkey"),
    ).select("ps_partkey", "ps_suppkey", "ps_supplycost")
    minc = costs.groupBy("ps_partkey").agg(F.min("ps_supplycost").alias("mc"))
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    return (
        costs.join(minc, ["ps_partkey"])
        .filter(F.col("ps_supplycost") == F.col("mc"))
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(europe), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q9_product_type_profit",
    f"WITH {_PARTSUPP_SQL} "
    "SELECT n_name AS nation, YEAR(o_orderdate) AS o_year, "
    "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) "
    "* (1 - CAST(l_discount AS DECIMAL(18,4))) "
    "- CAST(ps_supplycost AS DECIMAL(18,4)) "
    "* CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit "
    "FROM lineitem "
    "JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey "
    "JOIN part ON p_partkey = l_partkey "
    "JOIN supplier ON s_suppkey = l_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN orders ON o_orderkey = l_orderkey "
    "WHERE p_name LIKE '%red%' "
    "GROUP BY n_name, YEAR(o_orderdate) ORDER BY nation, o_year DESC",
    doc=(
        "TPC-H Q9 shape (product-type profit): the five-way star around "
        "lineitem with profit = revenue - supply cost. part (filtered), "
        "supplier and nation broadcast; partsupp joins on the composite "
        "(partkey, suppkey) — co-partitioned with lineitem's own key "
        "pair, and derived FROM it, so the join is total. Money runs in "
        "DECIMAL(18,4) per the repo's engine-identical-rounding rule."
    ),
)
def q_tpch_q9(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    profit = dec("l_extendedprice") * (F.lit(1) - dec("l_discount")) - dec(
        "ps_supplycost"
    ) * dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "tpch_q11_important_stock",
    f"WITH {_PARTSUPP_SQL}, "
    "ps2 AS (SELECT ps_partkey, "
    "CAST(ps_supplycost AS DECIMAL(18,4)) * ps_availqty AS v "
    "FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE n_name IN ('NATION_3', 'NATION_7')) "
    "SELECT ps_partkey, CAST(SUM(v) AS DOUBLE) AS total_value FROM ps2 "
    "GROUP BY ps_partkey "
    "HAVING SUM(v) > (SELECT SUM(v) FROM ps2) * 0.001 "
    "ORDER BY total_value DESC, ps_partkey",
    doc=(
        "TPC-H Q11 shape (important stock identification): nation-filtered "
        "inventory value per part, kept only above a fraction of the "
        "GLOBAL total — the classic uncorrelated scalar-subquery HAVING. "
        "The global total is a 1-row broadcast; value accumulates in "
        "DECIMAL (exact, order-insensitive) and converts to double only "
        "at the output/threshold boundary."
    ),
)
def q_tpch_q11(spark, sf_dir):
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    ps2 = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(sup), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost").cast("decimal(18,4)") * F.col("ps_availqty")).alias(
                "v"
            ),
        )
    )
    total = ps2.agg(F.sum("v").alias("__total"))
    return (
        ps2.groupBy("ps_partkey")
        .agg(F.sum("v").alias("sv"))
        .join(F.broadcast(total))
        .filter(F.col("sv") > F.col("__total") * 0.001)
        .select("ps_partkey", F.col("sv").cast("double").alias("total_value"))
        .orderBy(F.col("total_value").desc(), "ps_partkey")
    )


@register(
    "tpch_q16_parts_supplier_relationship",
    f"WITH {_PARTSUPP_SQL} "
    "SELECT p_brand, p_type, p_size, "
    "CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt "
    "FROM partsupp JOIN part ON p_partkey = ps_partkey "
    "WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%' "
    "AND p_size IN (1, 4, 7, 10, 15, 23, 45, 49) "
    "AND ps_suppkey NOT IN "
    "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
    "GROUP BY p_brand, p_type, p_size "
    "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size",
    doc=(
        "TPC-H Q16 shape (parts/supplier relationship; adapted: the "
        "negative-balance supplier exclusion stands in for the absent "
        "comment-complaints filter). NOT IN over a non-null key column "
        "plans as a broadcast anti-join; the distinct-supplier count per "
        "(brand, type, size) is the partial-agg-friendly two-level "
        "count-distinct."
    ),
)
def q_tpch_q16(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 49))
    )
    bad_sup = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        _partsupp(spark, sf_dir)
        .join(bad_sup, F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q20_potential_part_promotion",
    f"WITH {_PARTSUPP_SQL}, "
    "qty AS (SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "AND l_shipdate < TIMESTAMP '1997-01-01' "
    "GROUP BY l_partkey, l_suppkey) "
    "SELECT s_name, s_suppkey FROM supplier WHERE s_suppkey IN "
    "(SELECT ps_suppkey FROM partsupp "
    "JOIN qty ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey "
    "WHERE ps_partkey IN "
    "(SELECT p_partkey FROM part WHERE p_name LIKE 'red%') "
    "AND ps_availqty > 0.5 * q) "
    "ORDER BY s_name, s_suppkey",
    doc=(
        "TPC-H Q20 shape (potential part promotion; adapted: s_name/"
        "s_suppkey output for the absent s_address): suppliers holding "
        "excess stock (availqty > half the year's shipped quantity) of "
        "'red' parts. The nested INs plan as left-semi joins: part filter "
        "broadcast into partsupp, the year's shipped quantities as one "
        "pre-aggregate co-keyed with partsupp, the winner set semi-joined "
        "into supplier — no correlated execution anywhere."
    ),
)
def q_tpch_q20(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    qty = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    red_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    winners = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(red_parts), F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            qty,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("q"))
        .select("ps_suppkey")
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(winners, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name", "s_suppkey")
    )


_RECURSIVE_CHAIN_SQL = """
WITH RECURSIVE
ordered AS (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM {orders}
),
edges AS (
  SELECT a.o_custkey, a.o_orderkey AS okey, b.o_orderkey AS next_key
  FROM ordered a JOIN ordered b ON a.o_custkey = b.o_custkey AND b.rn = a.rn + 1
),
chain(custkey, okey, pos) AS (
  SELECT o_custkey, o_orderkey, 1 FROM ordered WHERE rn = 1
  UNION ALL
  SELECT c.custkey, e.next_key, c.pos + 1 FROM chain c JOIN edges e ON c.okey = e.okey
)
SELECT pos, COUNT(*) AS n FROM chain GROUP BY pos ORDER BY pos
"""


@register(
    "cte_recursive_order_chain",
    _RECURSIVE_CHAIN_SQL.replace("{orders}", "orders"),
    doc=(
        "Recursive CTE (Spark 4 WITH RECURSIVE, UNION ALL form): walk each "
        "customer's time-ordered order chain from its first order and "
        "histogram the walk depth. The recursion is a DAG walk (successor "
        "edges from a window pass), so UNION ALL terminates at the longest "
        "chain; each iteration is one equi-join on the order key. The SQL "
        "text is identical on both engines — the dialect-portability "
        "demonstration for migrating recursive workloads."
    ),
)
def q_cte_recursive_order_chain(spark, sf_dir):
    return spark.sql(_RECURSIVE_CHAIN_SQL, orders=_t(spark, sf_dir, "orders"))


@register(
    "events_transition_matrix",
    "WITH seq AS (SELECT user_id, event_type, "
    "LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type "
    "FROM events) "
    "SELECT event_type, next_type, COUNT(*) AS n "
    "FROM seq WHERE next_type IS NOT NULL "
    "GROUP BY event_type, next_type ORDER BY event_type, next_type",
    doc=(
        "Click-path transition matrix (Markov first-order): per-user LEAD "
        "over the time-ordered event stream, then a tiny "
        "|types|x|types| count. One user-keyed window shuffle — the same "
        "exchange every per-user analytic shares — and the aggregate is "
        "map-side-combinable."
    ),
)
def q_events_transition_matrix(spark, sf_dir):
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _t(spark, sf_dir, "events").select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "next_type")
    )


@register(
    "time_bucket_latency_percentiles",
    "SELECT date_trunc('hour', ts) AS bucket, "
    "ROUND(quantile_cont(value, 0.5), 4) AS p50, "
    "ROUND(quantile_cont(value, 0.95), 4) AS p95, "
    "ROUND(quantile_cont(value, 0.99), 4) AS p99, "
    "COUNT(*) AS n FROM events GROUP BY bucket ORDER BY bucket",
    doc=(
        "THE observability dashboard shape: per-hour latency percentile "
        "bands (p50/p95/p99) over the metric column. Exact interpolated "
        "percentiles (Spark percentile == DuckDB quantile_cont) — one "
        "shuffle on the bucket; at 100 TB the drop-in is "
        "approx_percentile, a mergeable sketch with the same plan."
    ),
)
def q_time_bucket_latency_percentiles(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
            F.count("*").alias("n"),
        )
        .orderBy("bucket")
    )


@register(
    "dq_expectations_split",
    "SELECT rule, COUNT(*) AS n_violations FROM ("
    "SELECT CASE "
    "WHEN value IS NULL OR value < 0 OR value > 100 THEN 'value_range_0_100' "
    "WHEN event_type NOT IN ('click', 'view', 'purchase', 'signup', 'error') "
    "THEN 'event_type_domain' "
    "WHEN user_id IS NULL OR user_id < 0 THEN 'user_id_valid' "
    "END AS rule FROM events) v "
    "WHERE rule IS NOT NULL GROUP BY rule ORDER BY rule",
    doc=(
        "Data-contract expectations in ONE scan (the Great-Expectations "
        "shape, engine-native): each row is checked against the ordered "
        "rule list and lands in its first violated rule's bucket; clean "
        "rows cost one predicate chain and no shuffle. The same CASE "
        "column splits a pipeline into (clean, quarantine) frames — the "
        "row-level generalization of the ingest path's payload quarantine."
    ),
)
def q_dq_expectations_split(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    rule = (
        F.when(
            F.col("value").isNull() | (F.col("value") < 0) | (F.col("value") > 100),
            "value_range_0_100",
        )
        .when(
            ~F.col("event_type").isin("click", "view", "purchase", "signup", "error"),
            "event_type_domain",
        )
        .when(F.col("user_id").isNull() | (F.col("user_id") < 0), "user_id_valid")
    )
    return (
        ev.select(rule.alias("rule"))
        .filter(F.col("rule").isNotNull())
        .groupBy("rule")
        .agg(F.count("*").alias("n_violations"))
        .orderBy("rule")
    )


@register(
    "privacy_pseudonymize_users",
    "SELECT substr(sha256(concat('pepper-v1:', CAST(user_id AS VARCHAR))), 1, 16) "
    "AS pseudo_id, COUNT(*) AS n_events "
    "FROM events GROUP BY pseudo_id ORDER BY n_events DESC, pseudo_id LIMIT 20",
    doc=(
        "Salted-hash pseudonymization (the privacy pass of a training-data "
        "pipeline): user ids map through sha256(pepper || id) so "
        "cross-table joins on the pseudonym still work while raw ids never "
        "leave the scan stage. Identical digests on both engines make the "
        "mapping itself oracle-checkable; rotating the pepper re-keys the "
        "corpus in one scan."
    ),
)
def q_privacy_pseudonymize_users(spark, sf_dir):
    pseudo = F.substring(
        F.sha2(F.concat(F.lit("pepper-v1:"), F.col("user_id").cast("string")), 256), 1, 16
    )
    return (
        _t(spark, sf_dir, "events")
        .groupBy(pseudo.alias("pseudo_id"))
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.col("n_events").desc(), "pseudo_id")
        .limit(20)
    )


@register(
    "agg_winsorized_means",
    "WITH b AS (SELECT event_type, quantile_cont(value, 0.05) AS lo, "
    "quantile_cont(value, 0.95) AS hi FROM events GROUP BY event_type) "
    "SELECT e.event_type, "
    "ROUND(AVG(LEAST(GREATEST(value, lo), hi)), 4) AS winsorized_mean, "
    "ROUND(AVG(value), 4) AS raw_mean, COUNT(*) AS n "
    "FROM events e JOIN b ON e.event_type = b.event_type "
    "GROUP BY e.event_type ORDER BY e.event_type",
    doc=(
        "Winsorized (p5/p95-clamped) per-group means — the outlier-robust "
        "aggregate of metric pipelines. Two passes sharing one shuffle key: "
        "the bounds frame is |groups| rows (broadcast), the clamp is a "
        "scan-stage LEAST/GREATEST; at 100 TB the exact quantile_cont "
        "bounds swap for approx_percentile with the identical plan."
    ),
)
def q_agg_winsorized_means(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    bounds = ev.groupBy(F.col("event_type").alias("bt")).agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), ev.event_type == F.col("bt"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg(clamped), 4).alias("winsorized_mean"),
            F.round(F.avg("value"), 4).alias("raw_mean"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "privacy_forget_users",
    "WITH deny AS (SELECT user_id FROM events GROUP BY user_id "
    "ORDER BY COUNT(*) DESC, user_id LIMIT 5) "
    "SELECT event_type, COUNT(*) AS n_retained FROM events "
    "WHERE user_id NOT IN (SELECT user_id FROM deny) "
    "GROUP BY event_type ORDER BY event_type",
    doc=(
        "Right-to-be-forgotten scrub: a deletion list anti-joins the event "
        "log and only the survivors flow on (here the deny set is derived "
        "deterministically — the 5 heaviest users — so the oracle can "
        "reproduce it). The anti side is a distinct-key frame, broadcast "
        "at any real deletion-request volume; the full rewrite pairs this "
        "with the registry's snapshot commit so the purge is atomic and "
        "auditable."
    ),
)
def q_privacy_forget_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    deny = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "user_id")
        .limit(5)
        .select("user_id")
    )
    return (
        ev.join(F.broadcast(deny), "user_id", "left_anti")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_retained"))
        .orderBy("event_type")
    )


@register(
    "approx_hll_rollup_merge",
    None,
    doc=(
        "The sketch ROLLUP pattern that makes 100 TB distinct counts "
        "re-aggregatable: hourly hll_sketch_agg sketches (what a "
        "materialized rollup would persist), then hll_union_agg merges "
        "them to daily uniques WITHOUT rescanning raw events — merging "
        "k sketches costs O(k * sketch_size) regardless of event volume. "
        "Approximate -> rows-only; accuracy vs the exact per-day distinct "
        "is pytest-bounded at 5%."
    ),
)
def q_approx_hll_rollup_merge(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    return (
        hourly.groupBy("day")
        .agg(F.expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)").alias("approx_users"))
        .orderBy("day")
    )


_LATERAL_TOPN_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM {customer} c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM {orders} o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
WHERE c.c_custkey <= 50
ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
"""


@register(
    "join_lateral_topn",
    "SELECT c.c_custkey, t.o_orderkey, t.o_totalprice "
    "FROM customer c, "
    "LATERAL (SELECT o_orderkey, o_totalprice FROM orders o "
    "WHERE o.o_custkey = c.c_custkey "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t "
    "WHERE c.c_custkey <= 50 "
    "ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey",
    doc=(
        "Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-2 "
        "orders per customer) — the SQL-standard lateral-join surface. "
        "Catalyst decorrelates it into a windowed rank over one equi-join "
        "(DecorrelateInnerQuery), so the executed plan is the same "
        "shuffle-once top-k-per-key shape as the DataFrame window form, "
        "never a per-row nested loop."
    ),
)
def q_join_lateral_topn(spark, sf_dir):
    return spark.sql(
        _LATERAL_TOPN_SQL,
        customer=_t(spark, sf_dir, "customer"),
        orders=_t(spark, sf_dir, "orders"),
    )


@register(
    "sample_rate_cap_per_key",
    "WITH ranked AS (SELECT user_id, event_id, "
    "ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts) "
    "ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn "
    "FROM events), "
    "kept AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_kept "
    "FROM ranked WHERE rn <= 3 GROUP BY user_id), "
    "tot AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events "
    "FROM events GROUP BY user_id) "
    "SELECT user_id, n_events, n_kept FROM tot JOIN kept USING (user_id) "
    "ORDER BY user_id",
    doc=(
        "Per-key rate-cap sampling (ingest throttling for hot keys): keep at "
        "most 3 events per (user, hour), chosen by md5(event_id) order so "
        "the cap is a deterministic uniform sample WITHIN the hour, not a "
        "head-of-hour bias. One keyed window shuffle; the md5 sort key "
        "makes the kept set a pure function of the data — stable across "
        "runs, partitionings, and executor counts."
    ),
)
def q_sample_rate_cap_per_key(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", F.date_trunc("hour", "ts")).orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    kept = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_kept"))
    )
    tot = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    return tot.join(kept, "user_id").select("user_id", "n_events", "n_kept").orderBy("user_id")


@register(
    "agg_grouping_id_labels",
    "SELECT COALESCE(o_orderpriority, '(all)') AS priority, "
    "COALESCE(CAST(year(o_orderdate) AS VARCHAR), '(all)') AS yr, "
    "CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority, "
    "CAST(GROUPING(year(o_orderdate)) AS BIGINT) AS g_year, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM orders "
    "GROUP BY ROLLUP(o_orderpriority, year(o_orderdate)) "
    "ORDER BY g_priority, g_year, priority, yr",
    doc=(
        "GROUPING() subtotal disambiguation on a ROLLUP: distinguishes a "
        "real NULL group key from the subtotal row the rollup synthesized — "
        "the part of the grouping-sets surface that labels WHICH level each "
        "output row belongs to (dashboards key on it). Same single-shuffle "
        "expand plan as agg_rollup."
    ),
)
def q_agg_grouping_id_labels(spark, sf_dir):
    # Spark SQL form: grouping() must reference the grouping EXPRESSION
    # verbatim, which the SQL path resolves directly (the DataFrame path
    # cannot reference an aliased grouping expression inside grouping()).
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, '(all)') AS priority,
               COALESCE(CAST(year(o_orderdate) AS STRING), '(all)') AS yr,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
               CAST(grouping(year(o_orderdate)) AS BIGINT) AS g_year,
               COUNT(*) AS n
        FROM {orders}
        GROUP BY ROLLUP(o_orderpriority, year(o_orderdate))
        ORDER BY g_priority, g_year, priority, yr
        """,
        orders=_t(spark, sf_dir, "orders"),
    )


@register(
    "time_series_interpolate",
    "WITH src AS (SELECT event_type, date_trunc('minute', ts) AS m, "
    "ROUND(AVG(value), 4) AS v FROM events "
    "WHERE ts < (SELECT MIN(ts) FROM events) + INTERVAL 1 DAY "
    "GROUP BY 1, 2), "
    "cal AS (SELECT event_type, CAST(unnest(generate_series(mn, mx, "
    "INTERVAL 1 MINUTE)) AS TIMESTAMP) AS m "
    "FROM (SELECT event_type, MIN(m) AS mn, MAX(m) AS mx FROM src GROUP BY 1) b), "
    "j AS (SELECT c.event_type, c.m, s.v FROM cal c "
    "LEFT JOIN src s ON s.event_type = c.event_type AND s.m = c.m), "
    "w AS (SELECT event_type, m, v, "
    "last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY m "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv, "
    "last_value(CASE WHEN v IS NOT NULL THEN m END IGNORE NULLS) "
    "OVER (PARTITION BY event_type ORDER BY m "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pm, "
    "first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY m "
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv, "
    "first_value(CASE WHEN v IS NOT NULL THEN m END IGNORE NULLS) "
    "OVER (PARTITION BY event_type ORDER BY m "
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nm "
    "FROM j) "
    "SELECT event_type, m, "
    "CASE WHEN v IS NOT NULL THEN v "
    "ELSE pv + (nv - pv) * ((epoch(m) - epoch(pm)) / (epoch(nm) - epoch(pm))) "
    "END AS v_filled, "
    "CASE WHEN v IS NOT NULL THEN 'actual' ELSE 'interp' END AS src "
    "FROM w ORDER BY event_type, m",
    doc=(
        "Dense per-type minute series with LINEAR INTERPOLATION across "
        "gaps (the dashboard gap-fill upgrade over zero-fill "
        "date_series_gaps): per-type calendar from sequence()+explode, "
        "then carry-forward/carry-back windows (last/first IGNORE NULLS) "
        "give both bracketing actuals and their timestamps in ONE "
        "type-partitioned window pass each way — no self-join, no "
        "per-gap loop. Interpolation arithmetic runs on the already-"
        "rounded endpoints, so both engines lerp identical doubles."
    ),
)
def q_time_series_interpolate(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    lo = ev.agg(F.min("ts").alias("t0"))
    src = (
        ev.join(F.broadcast(lo))
        .filter(F.col("ts") < F.col("t0") + F.expr("INTERVAL 1 DAY"))
        .groupBy(
            "event_type", F.date_trunc("minute", "ts").alias("m")
        )
        .agg(F.round(F.avg("value"), 4).alias("v"))
    )
    cal = (
        src.groupBy("event_type")
        .agg(F.min("m").alias("mn"), F.max("m").alias("mx"))
        .select(
            "event_type",
            F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 MINUTE"))).alias("m"),
        )
    )
    j = cal.join(src, ["event_type", "m"], "left")
    back = W.partitionBy("event_type").orderBy("m").rowsBetween(W.unboundedPreceding, 0)
    fwd = W.partitionBy("event_type").orderBy("m").rowsBetween(0, W.unboundedFollowing)
    marked = F.when(F.col("v").isNotNull(), F.col("m"))
    w = j.select(
        "event_type", "m", "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(marked, ignorenulls=True).over(back).alias("pm"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(marked, ignorenulls=True).over(fwd).alias("nm"),
    )
    frac = (F.unix_timestamp("m") - F.unix_timestamp("pm")) / (
        F.unix_timestamp("nm") - F.unix_timestamp("pm")
    )
    return w.select(
        "event_type",
        "m",
        # interpolated values stay UNROUNDED: lerp midpoints land exactly on
        # round-half boundaries (frac=1/2 of 4-decimal endpoints), where the
        # engines' ROUND semantics diverge (Spark rounds the exact binary
        # expansion, DuckDB the scaled float); the raw IEEE lerp of identical
        # inputs in identical op order is bit-equal instead
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
        .alias("v_filled"),
        F.when(F.col("v").isNotNull(), F.lit("actual")).otherwise(F.lit("interp")).alias("src"),
    ).orderBy("event_type", "m")


@register(
    "time_bucket_hopping",
    "WITH b AS (SELECT event_type, "
    "CAST(to_timestamp(floor(epoch(ts) / 60) * 60) AS TIMESTAMP) AS b0 "
    "FROM events WHERE ts < TIMESTAMP '2024-01-01 02:00:00'), "
    "e AS (SELECT event_type, unnest([b0 - INTERVAL 1 MINUTE, b0]) AS w_start "
    "FROM b) "
    "SELECT w_start, w_start + INTERVAL 2 MINUTE AS w_end, event_type, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM e GROUP BY w_start, event_type "
    "ORDER BY w_start, event_type",
    doc=(
        "HOPPING (sliding) window aggregate — window 2 min, slide 1 min: "
        "every event lands in exactly window/slide = 2 overlapping buckets. "
        "Spark's window() generates the bucket memberships map-side before "
        "the single keyed shuffle (same plan shape as tumbling, x2 rows); "
        "the oracle reconstructs membership by exploding both window starts "
        "per event. The streaming form is the same expression under a "
        "watermark."
    ),
)
def q_time_bucket_hopping(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-01 02:00:00").cast("timestamp")
    )
    return (
        ev.groupBy(
            F.window("ts", "2 minutes", "1 minute").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
        )
        .orderBy("w_start", "event_type")
    )


@register(
    "dq_referential_orphans",
    "SELECT 'lineitem.l_orderkey->orders' AS fk, CAST(COUNT(*) AS BIGINT) AS orphans "
    "FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey) "
    "UNION ALL "
    "SELECT 'orders.o_custkey->customer', CAST(COUNT(*) AS BIGINT) "
    "FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey) "
    "UNION ALL "
    "SELECT 'customer.c_nationkey->nation', CAST(COUNT(*) AS BIGINT) "
    "FROM customer c WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey) "
    "UNION ALL "
    "SELECT 'supplier.s_nationkey->nation', CAST(COUNT(*) AS BIGINT) "
    "FROM supplier s WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey) "
    "UNION ALL "
    "SELECT 'nation.n_regionkey->region', CAST(COUNT(*) AS BIGINT) "
    "FROM nation n WHERE NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey) "
    "ORDER BY fk",
    doc=(
        "Referential-integrity audit across every FK edge of the star "
        "schema in one result: anti-join orphan counts per edge. Each "
        "anti-join broadcasts its parent key set when the parent is a "
        "dimension; the fact-to-fact edge (lineitem->orders) is the one "
        "real shuffle. The whole-lake DQ gate a 100 TB ingest runs before "
        "promoting a snapshot."
    ),
)
def q_dq_referential_orphans(spark, sf_dir):
    edges = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    out = None
    for fk, child, ck, parent, pk in edges:
        c = _t(spark, sf_dir, child)
        p = _t(spark, sf_dir, parent).select(pk)
        n = (
            c.join(p, c[ck] == p[pk], "left_anti")
            .agg(F.count("*").alias("orphans"))
            .select(F.lit(fk).alias("fk"), "orphans")
        )
        out = n if out is None else out.unionByName(n)
    return out.orderBy("fk")


@register(
    "drift_psi_event_mix",
    "WITH ref AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n FROM events "
    "WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1), "
    "cur AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n FROM events "
    "WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY 1), "
    "tot AS (SELECT (SELECT SUM(n) FROM ref) AS rn, (SELECT SUM(n) FROM cur) AS cn), "
    "j AS (SELECT ref.event_type, ref.n / tot.rn AS p, cur.n / tot.cn AS q "
    "FROM ref JOIN cur USING (event_type), tot) "
    "SELECT event_type, ROUND(p, 6) AS p_ref, ROUND(q, 6) AS q_cur, "
    "ROUND((q - p) * ln(q / p), 6) AS psi_term "
    "FROM j ORDER BY event_type",
    doc=(
        "Population-stability-index drift gate on the event-type mix: "
        "category shares in a reference window vs the current window, "
        "per-category (q-p)*ln(q/p) contributions (sum >= 0.2 = the "
        "classic 'significant drift' alarm). Two map-side-combined counts "
        "+ a broadcast-sized share join — the distribution-drift monitor "
        "an ML ingest runs per batch at any scale."
    ),
)
def q_drift_psi_event_mix(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    ref = ev.filter(F.col("ts") < cut).groupBy("event_type").agg(
        F.count("*").cast("double").alias("rn")
    )
    cur = ev.filter(F.col("ts") >= cut).groupBy("event_type").agg(
        F.count("*").cast("double").alias("cn")
    )
    rt = ref.agg(F.sum("rn").alias("rt"))
    ct = cur.agg(F.sum("cn").alias("ct"))
    j = (
        ref.join(cur, "event_type")
        .join(F.broadcast(rt))
        .join(F.broadcast(ct))
        .select(
            "event_type",
            (F.col("rn") / F.col("rt")).alias("p"),
            (F.col("cn") / F.col("ct")).alias("q"),
        )
    )
    return j.select(
        "event_type",
        F.round("p", 6).alias("p_ref"),
        F.round("q", 6).alias("q_cur"),
        F.round((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p")), 6).alias("psi_term"),
    ).orderBy("event_type")


@register(
    "dq_primary_key_uniqueness",
    "SELECT 'customer.c_custkey' AS pk, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    "CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys FROM customer "
    "UNION ALL SELECT 'orders.o_orderkey', CAST(COUNT(*) AS BIGINT), "
    "CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders "
    "UNION ALL SELECT 'events.event_id', CAST(COUNT(*) AS BIGINT), "
    "CAST(COUNT(DISTINCT event_id) AS BIGINT) FROM events "
    "UNION ALL SELECT 'documents.doc_id', CAST(COUNT(*) AS BIGINT), "
    "CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM documents "
    "UNION ALL SELECT 'embeddings.vec_id', CAST(COUNT(*) AS BIGINT), "
    "CAST(COUNT(DISTINCT vec_id) AS BIGINT) FROM embeddings "
    "ORDER BY pk",
    doc=(
        "Primary-key uniqueness audit across the lake in one result — "
        "rows vs distinct keys per declared PK (equal = clean). Completes "
        "the DQ gate trio with dq_expectations_split (row contracts) and "
        "dq_referential_orphans (FK edges); each leg is one map-side-"
        "combined aggregate."
    ),
)
def q_dq_primary_key_uniqueness(spark, sf_dir):
    pks = [
        ("customer.c_custkey", "customer", "c_custkey"),
        ("orders.o_orderkey", "orders", "o_orderkey"),
        ("events.event_id", "events", "event_id"),
        ("documents.doc_id", "documents", "doc_id"),
        ("embeddings.vec_id", "embeddings", "vec_id"),
    ]
    out = None
    for label, table, key in pks:
        t = _t(spark, sf_dir, table)
        leg = t.agg(
            F.count("*").alias("n_rows"),
            F.countDistinct(key).alias("n_keys"),
        ).select(F.lit(label).alias("pk"), "n_rows", "n_keys")
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("pk")


@register(
    "drift_ks_value",
    "WITH pooled AS (SELECT value, "
    "CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_ref "
    "FROM events), "
    "tot AS (SELECT CAST(SUM(is_ref) AS DOUBLE) AS n1, "
    "CAST(SUM(1 - is_ref) AS DOUBLE) AS n2 FROM pooled), "
    "c AS (SELECT value, "
    "SUM(is_ref) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "CURRENT ROW) AS c1, "
    "SUM(1 - is_ref) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND CURRENT ROW) AS c2 FROM pooled), "
    "m AS (SELECT value, MAX(c1) AS c1, MAX(c2) AS c2 FROM c GROUP BY value) "
    "SELECT ROUND(MAX(ABS(c1 / tot.n1 - c2 / tot.n2)), 6) AS ks_d, "
    "CAST(tot.n1 AS BIGINT) AS n_ref, CAST(tot.n2 AS BIGINT) AS n_cur "
    "FROM m, tot GROUP BY tot.n1, tot.n2",
    doc=(
        "Exact two-sample Kolmogorov-Smirnov statistic on the numeric "
        "value column between the reference and current windows — the "
        "numeric complement of the PSI gate: D = max |F_ref - F_cur| over "
        "pooled order statistics via one global-sort window + per-value "
        "max (ties collapse to the step's right limit on both sides "
        "identically). One range-partitioned sort at scale; output is one "
        "row. NB the global window is over DISTINCT VALUES' cumulative "
        "counts, bounded by the column's cardinality after the per-value "
        "collapse."
    ),
)
def q_drift_ks_value(spark, sf_dir):
    from demo_otel_parquet_antalya_spark.operators import stats

    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    pooled = ev.select(
        "value", F.when(F.col("ts") < cut, 1).otherwise(0).alias("is_ref")
    )
    return stats.ks_two_sample(pooled, "value", "is_ref")


@register(
    "approx_theta_set_ops",
    "WITH e AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-01 12:00:00'), "
    "v AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'), "
    "c AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'purchase') "
    "SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS viewers, "
    "CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS purchasers, "
    "CAST((SELECT COUNT(*) FROM v JOIN c USING (user_id)) AS BIGINT) AS both_vc, "
    "CAST((SELECT COUNT(*) FROM (SELECT user_id FROM v UNION SELECT user_id FROM c) u) "
    "AS BIGINT) AS either_vc, "
    "CAST((SELECT COUNT(*) FROM v WHERE user_id NOT IN (SELECT user_id FROM c)) "
    "AS BIGINT) AS view_only",
    doc=(
        "Theta-sketch SET ALGEBRA (datasketches): distinct-user sketches "
        "per event type, then intersection / union / difference of the "
        "SKETCHES answer 'how many users did BOTH / EITHER / ONLY one action' "
        "without ever re-scanning or joining raw events — the audience-"
        "overlap primitive HLL cannot express (HLL unions only). Sketches "
        "are tiny and mergeable, so at 100 TB each per-segment sketch is "
        "maintained incrementally and overlap queries are O(sketch). At "
        "this cardinality the sketches are exact, so the oracle is the "
        "exact set algebra; accuracy at scale is the published "
        "datasketches bound."
    ),
)
def q_approx_theta_set_ops(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-01 12:00:00").cast("timestamp")
    )
    sk = ev.groupBy("event_type").agg(F.expr("theta_sketch_agg(user_id)").alias("sk"))
    sk.createOrReplaceTempView("__theta_sk")
    return spark.sql(
        """
        SELECT
          CAST(theta_sketch_estimate(v.sk) AS BIGINT) AS viewers,
          CAST(theta_sketch_estimate(c.sk) AS BIGINT) AS purchasers,
          CAST(theta_sketch_estimate(theta_intersection(v.sk, c.sk)) AS BIGINT) AS both_vc,
          CAST(theta_sketch_estimate(theta_union(v.sk, c.sk)) AS BIGINT) AS either_vc,
          CAST(theta_sketch_estimate(theta_difference(v.sk, c.sk)) AS BIGINT) AS view_only
        FROM (SELECT sk FROM __theta_sk WHERE event_type = 'view') v,
             (SELECT sk FROM __theta_sk WHERE event_type = 'purchase') c
        """
    )


@register(
    "approx_top_rollup_merge",
    "SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS n FROM events "
    "GROUP BY event_type ORDER BY n DESC, item",
    doc=(
        "Mergeable top-k ROLLUP (datasketches frequent-items): hourly "
        "approx_top_k_accumulate states combined to the global top items "
        "WITHOUT re-scanning raw events — the heavy-hitters analogue of "
        "the HLL rollup-merge (merging k states costs O(k * sketch), "
        "independent of event volume). Capacity exceeds the type "
        "cardinality here, so the sketch is exact and the oracle is the "
        "exact global count; at real cardinality the published "
        "frequent-items error bound applies."
    ),
)
def q_approx_top_rollup_merge(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.expr("approx_top_k_accumulate(event_type, 16)").alias("st")
    )
    return (
        hourly.agg(F.expr("approx_top_k_combine(st)").alias("c"))
        .select(F.explode(F.expr("approx_top_k_estimate(c, 16)")).alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("n"))
        .orderBy(F.col("n").desc(), "item")
    )


# ===========================================================================
# Log-template mining (Drain-style) — the observability-native text op:
# collapse raw log messages to templates by masking variable tokens, then
# group to the template catalog. SURVEY §2 north-star extension; the
# reference's Grafana log panel shows raw bodies only.
# ===========================================================================


def _event_message_sql() -> str:
    """Synthesized log line per event (the testdata has no free-text log
    body; real OTLP bodies plug straight into the same masking chain).
    value is rendered through ROUND()::BIGINT — any digit run masks to
    <NUM>, so engine float-formatting differences cannot leak into the
    template."""
    return (
        "'evt=' || event_type || ' user=' || CAST(user_id AS VARCHAR) || "
        "' value=' || CAST(CAST(ROUND(value) AS BIGINT) AS VARCHAR) || 'ms'"
    )


@register(
    "log_template_mining",
    "SELECT {tpl} AS template, CAST(COUNT(*) AS BIGINT) AS n_events, "
    "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
    "FROM (SELECT user_id, {msg} AS message FROM events) "
    "GROUP BY template ORDER BY n_events DESC, template",
    doc=(
        "Drain-style log-template mining: mask variable tokens (UUID, hex, "
        "IP, number — functions/text.py::TEMPLATE_MASKS) with chained JVM "
        "regexp_replace, then group by the masked template. Template "
        "extraction is a zero-shuffle scan-stage pass; the only shuffle is "
        "the final (tiny) template-cardinality aggregate, map-side "
        "combined. The oracle applies the identical masking chain via "
        "text.template_masks_sql."
    ),
    tags=("northstar", "logmine"),
    bench=True,
)
def q_log_template_mining(spark, sf_dir):
    from demo_otel_parquet_antalya_spark.functions import text as _tx

    ev = _t(spark, sf_dir, "events")
    msg = F.concat(
        F.lit("evt="),
        F.col("event_type"),
        F.lit(" user="),
        F.col("user_id").cast("string"),
        F.lit(" value="),
        F.round(F.col("value")).cast("long").cast("string"),
        F.lit("ms"),
    )
    return (
        ev.select(_tx.log_template(msg).alias("template"), F.col("user_id"))
        .groupBy("template")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_events").desc(), "template")
    )


# fill in the oracle now that template_masks_sql is importable without a
# circular import at module load
def _finalize_log_template_oracle():
    from demo_otel_parquet_antalya_spark.functions.text import template_masks_sql

    spec = QUERIES["log_template_mining"]
    spec.oracle = spec.oracle.format(
        tpl=template_masks_sql("message"), msg=_event_message_sql()
    )


_finalize_log_template_oracle()


@register(
    "approx_kll_quantile_rollup",
    None,
    doc=(
        "The sketch ROLLUP pattern for quantiles (datasketches KLL): "
        "hourly kll_sketch_agg_double states over events.value (what a "
        "materialized rollup would persist), merged per day with "
        "kll_merge_agg_double and read out at p50/p95/p99 WITHOUT "
        "rescanning raw events — latency-percentile dashboards over "
        "100 TB become O(hours x sketch_size) merges. Completes the "
        "mergeable-sketch family (HLL uniques, frequent-items top-k, "
        "theta set algebra, KLL quantiles). Approximate -> rows-only; "
        "the published KLL rank-error bound vs the exact per-day "
        "percentiles is pytest-asserted."
    ),
)
def q_approx_kll_quantile_rollup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(F.expr("kll_sketch_agg_double(value, 256)").alias("sk"))
    daily = hourly.groupBy("day").agg(
        F.expr("kll_merge_agg_double(sk, 256)").alias("msk")
    )
    return daily.select(
        "day",
        F.round(F.expr("kll_sketch_get_quantile_double(msk, 0.5)"), 6).alias("p50"),
        F.round(F.expr("kll_sketch_get_quantile_double(msk, 0.95)"), 6).alias("p95"),
        F.round(F.expr("kll_sketch_get_quantile_double(msk, 0.99)"), 6).alias("p99"),
    ).orderBy("day")


@register(
    "string_edit_distance_join",
    "SELECT a.c_custkey AS id_a, "
    "CAST(COUNT(*) AS BIGINT) AS n_matches, "
    "CAST(SUM(levenshtein(a.c_name, b.c_name)) AS BIGINT) AS sum_dist "
    "FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey "
    "WHERE levenshtein(a.c_name, b.c_name) <= 1 "
    "GROUP BY id_a ORDER BY id_a",
    doc=(
        "Ed-Join edit-distance similarity join (Xiao/Wang/Lin VLDB'08): "
        "all customer-name pairs within Levenshtein 1, found via "
        "occurrence-numbered positional q-gram tokens + the q*d+1 "
        "prefix filter under a global rarity order, then one exact "
        "levenshtein per surviving candidate — never the all-pairs "
        "product the ORACLE runs. Exact (prefix filtering has no recall "
        "loss), which is what lets the brute-force oracle verify it. "
        "operators/stringsim.py."
    ),
    tags=("northstar", "stringsim"),
)
def q_string_edit_distance_join(spark, sf_dir):
    from demo_otel_parquet_antalya_spark.operators.stringsim import (
        edit_distance_join,
    )

    cust = _t(spark, sf_dir, "customer")
    pairs = edit_distance_join(cust, "c_custkey", "c_name", d=1, q=2)
    return (
        pairs.groupBy(F.col("id_a"))
        .agg(
            F.count("*").alias("n_matches"),
            F.sum("dist").cast("long").alias("sum_dist"),
        )
        .orderBy("id_a")
    )


@register(
    "record_linkage_scores",
    "WITH pairs AS ("
    "  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b, "
    "         a.c_nationkey = b.c_nationkey AS agr_nation, "
    "         a.c_mktsegment = b.c_mktsegment AS agr_segment, "
    "         ABS(a.c_acctbal - b.c_acctbal) <= 100.0 AS agr_balance "
    "  FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey "
    "  WHERE levenshtein(a.c_name, b.c_name) <= 1), "
    "scored AS ("
    "  SELECT id_a, id_b, ROUND("
    "    CASE WHEN agr_nation THEN log2(0.9 / 0.04) ELSE log2(0.1 / 0.96) END + "
    "    CASE WHEN agr_segment THEN log2(0.85 / 0.2) ELSE log2(0.15 / 0.8) END + "
    "    CASE WHEN agr_balance THEN log2(0.8 / 0.1) ELSE log2(0.2 / 0.9) END, 6) "
    "  AS weight FROM pairs) "
    "SELECT CASE WHEN weight >= 4.0 THEN 'match' "
    "WHEN weight >= 0.0 THEN 'possible' ELSE 'non_match' END AS verdict, "
    "CAST(COUNT(*) AS BIGINT) AS n_pairs, "
    "ROUND(AVG(weight), 6) AS avg_weight "
    "FROM scored GROUP BY verdict ORDER BY verdict",
    doc=(
        "Fellegi-Sunter record-linkage scoring (JASA 1969) composed on the "
        "deletion-neighborhood (SymSpell/FastSS) blocking tier: candidate "
        "pairs come from edit_distance_join_deletions (never all-pairs, "
        "~7x faster than the q-gram prefix filter on short keys), each "
        "pair gets an "
        "agreement vector over (nation, segment, balance-within-100) and "
        "a log2(m/u) match weight with fixed m/u probabilities (an EM fit "
        "would estimate them from the same agreement aggregates — one "
        "extra groupBy per iteration), then pairs classify into "
        "match / possible / non_match by weight thresholds. All "
        "arithmetic is deterministic doubles, so the brute-force oracle "
        "verifies the whole chain. operators/stringsim.py supplies the "
        "blocking."
    ),
    tags=("northstar", "linkage"),
    bench=True,
)
def q_record_linkage_scores(spark, sf_dir):
    from demo_otel_parquet_antalya_spark.operators.stringsim import (
        edit_distance_join_deletions,
    )
    import math

    cust = _t(spark, sf_dir, "customer")
    # deletion-neighborhood blocking: on serial-number-style keys the
    # q-gram prefix filter over-generates ~40x (see
    # string_edit_join_deletions) — the linkage pipeline uses the
    # short-key tier
    blocks = edit_distance_join_deletions(cust, "c_custkey", "c_name", d=1)
    feats = cust.select(
        F.col("c_custkey").alias("id"),
        "c_nationkey",
        "c_mktsegment",
        "c_acctbal",
    )
    fa = feats.select(
        F.col("id").alias("id_a"),
        F.col("c_nationkey").alias("nat_a"),
        F.col("c_mktsegment").alias("seg_a"),
        F.col("c_acctbal").alias("bal_a"),
    )
    fb = feats.select(
        F.col("id").alias("id_b"),
        F.col("c_nationkey").alias("nat_b"),
        F.col("c_mktsegment").alias("seg_b"),
        F.col("c_acctbal").alias("bal_b"),
    )

    def w(cond, m, u):
        return F.when(cond, math.log2(m / u)).otherwise(math.log2((1 - m) / (1 - u)))

    weight = F.round(
        w(F.col("nat_a") == F.col("nat_b"), 0.9, 0.04)
        + w(F.col("seg_a") == F.col("seg_b"), 0.85, 0.2)
        + w(F.abs(F.col("bal_a") - F.col("bal_b")) <= 100.0, 0.8, 0.1),
        6,
    )
    scored = (
        blocks.join(fa, "id_a")
        .join(fb, "id_b")
        .select("id_a", "id_b", weight.alias("weight"))
    )
    verdict = (
        F.when(F.col("weight") >= 4.0, "match")
        .when(F.col("weight") >= 0.0, "possible")
        .otherwise("non_match")
    )
    return (
        scored.select(verdict.alias("verdict"), "weight")
        .groupBy("verdict")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg("weight"), 6).alias("avg_weight"),
        )
        .orderBy("verdict")
    )


@register(
    "string_edit_join_deletions",
    "SELECT a.c_custkey AS id_a, "
    "CAST(COUNT(*) AS BIGINT) AS n_matches, "
    "CAST(SUM(levenshtein(a.c_name, b.c_name)) AS BIGINT) AS sum_dist "
    "FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey "
    "WHERE levenshtein(a.c_name, b.c_name) <= 1 "
    "GROUP BY id_a ORDER BY id_a",
    doc=(
        "Deletion-neighborhood (SymSpell/FastSS) exact edit-distance "
        "join — same output and oracle as string_edit_distance_join, "
        "different blocking: variants carry the full string minus d "
        "chars, so candidates track the answer even on serial-number "
        "keys where q-gram prefixes collapse (measured at sf0.1: 10M "
        "Ed-Join candidates vs a 262k-pair answer; the deletion path "
        "runs the same join 7x faster). The short-key tier; Ed-Join "
        "remains the long-string tier. "
        "operators/stringsim.py::edit_distance_join_deletions."
    ),
    tags=("northstar", "stringsim"),
)
def q_string_edit_join_deletions(spark, sf_dir):
    from demo_otel_parquet_antalya_spark.operators.stringsim import (
        edit_distance_join_deletions,
    )

    cust = _t(spark, sf_dir, "customer")
    pairs = edit_distance_join_deletions(cust, "c_custkey", "c_name", d=1)
    return (
        pairs.groupBy(F.col("id_a"))
        .agg(
            F.count("*").alias("n_matches"),
            F.sum("dist").cast("long").alias("sum_dist"),
        )
        .orderBy("id_a")
    )


_ER_WEIGHT_SQL = (
    "ROUND("
    "CASE WHEN a.c_nationkey = b.c_nationkey THEN log2(0.9 / 0.04) "
    "ELSE log2(0.1 / 0.96) END + "
    "CASE WHEN a.c_mktsegment = b.c_mktsegment THEN log2(0.85 / 0.2) "
    "ELSE log2(0.15 / 0.8) END + "
    "CASE WHEN ABS(a.c_acctbal - b.c_acctbal) <= 100.0 THEN log2(0.8 / 0.1) "
    "ELSE log2(0.2 / 0.9) END, 6)"
)


@register(
    "er_golden_records",
    "WITH RECURSIVE pairs AS ("
    "  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b "
    "  FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey "
    "  WHERE levenshtein(a.c_name, b.c_name) <= 1 "
    "  AND " + _ER_WEIGHT_SQL + " >= 4.0), "
    "edges AS (SELECT id_a AS a, id_b AS b FROM pairs "
    "          UNION SELECT id_b, id_a FROM pairs), "
    "reach(src, dst) AS ("
    "  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n "
    "  UNION "
    "  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a), "
    "comp AS (SELECT src, MIN(dst) AS cluster FROM reach GROUP BY src) "
    "SELECT CAST(cluster AS BIGINT) AS golden_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_merged "
    "FROM comp GROUP BY cluster HAVING COUNT(*) >= 2 ORDER BY golden_id",
    doc=(
        "End-to-end entity resolution to GOLDEN RECORDS: deletion-"
        "neighborhood blocking -> Fellegi-Sunter agreement weights -> "
        "match pairs (weight >= 4) -> connected components (pointer-"
        "jumped min-label propagation) -> survivorship by min member id "
        "with merged-duplicate counts. Every stage is the independently-"
        "proven operator (stringsim, linkage weights, dedup.connected_"
        "components); the oracle replays the WHOLE chain — brute "
        "levenshtein join + the same weight arithmetic + a recursive-CTE "
        "transitive closure."
    ),
    tags=("northstar", "linkage"),
    bench=True,
)
def q_er_golden_records(spark, sf_dir):
    from demo_otel_parquet_antalya_spark.operators import dedup
    from demo_otel_parquet_antalya_spark.operators.stringsim import (
        edit_distance_join_deletions,
    )
    import math

    cust = _t(spark, sf_dir, "customer")
    blocks = edit_distance_join_deletions(cust, "c_custkey", "c_name", d=1)
    feats = cust.select(
        F.col("c_custkey").alias("id"), "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    fa = feats.select(
        F.col("id").alias("id_a"),
        F.col("c_nationkey").alias("nat_a"),
        F.col("c_mktsegment").alias("seg_a"),
        F.col("c_acctbal").alias("bal_a"),
    )
    fb = feats.select(
        F.col("id").alias("id_b"),
        F.col("c_nationkey").alias("nat_b"),
        F.col("c_mktsegment").alias("seg_b"),
        F.col("c_acctbal").alias("bal_b"),
    )

    def w(cond, m, u):
        return F.when(cond, math.log2(m / u)).otherwise(math.log2((1 - m) / (1 - u)))

    weight = F.round(
        w(F.col("nat_a") == F.col("nat_b"), 0.9, 0.04)
        + w(F.col("seg_a") == F.col("seg_b"), 0.85, 0.2)
        + w(F.abs(F.col("bal_a") - F.col("bal_b")) <= 100.0, 0.8, 0.1),
        6,
    )
    matches = (
        blocks.join(fa, "id_a")
        .join(fb, "id_b")
        .filter(weight >= 4.0)
        .select("id_a", "id_b")
    )
    cc = dedup.connected_components(matches)
    return (
        cc.groupBy(F.col("cluster_id").alias("golden_id"))
        .agg(F.count("*").alias("n_merged"))
        .filter(F.col("n_merged") >= 2)
        .orderBy("golden_id")
    )


@register(
    "timeseries_m4_downsample",
    "WITH s AS (SELECT CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS bucket, "
    "ts, event_id, value FROM events WHERE event_type = 'click'), "
    "w AS (SELECT bucket, value, "
    "ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY ts, event_id) AS rn_a, "
    "ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY ts DESC, event_id DESC) AS rn_d "
    "FROM s) "
    "SELECT bucket, "
    "MAX(CASE WHEN rn_a = 1 THEN value END) AS v_first, "
    "MIN(value) AS v_min, MAX(value) AS v_max, "
    "MAX(CASE WHEN rn_d = 1 THEN value END) AS v_last "
    "FROM w GROUP BY bucket ORDER BY bucket",
    doc=(
        "M4 time-series downsampling (Jugel et al., VLDB'14): per pixel-"
        "column time bucket keep exactly first/min/max/last — the four "
        "points that make the downsampled line RENDER pixel-identically "
        "to the raw series. THE dashboard operator at 100 TB: a Grafana "
        "panel needs ~2k buckets regardless of row count, and the whole "
        "reduction is one map-side-combinable aggregate (min_by/max_by "
        "with a (ts, event_id) struct tiebreak), no window, no sort of "
        "raw rows. The reference's dashboards rescan raw parquet per "
        "refresh (SURVEY §2.B Q5); composing this under the maintained "
        "rollup gives both resolution and boundedness."
    ),
    tags=("northstar", "timeseries"),
)
def q_timeseries_m4_downsample(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    bucket = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    return (
        ev.select(bucket.alias("bucket"), "ts", "event_id", "value")
        .groupBy("bucket")
        .agg(
            F.expr("min_by(value, struct(ts, event_id))").alias("v_first"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.expr("max_by(value, struct(ts, event_id))").alias("v_last"),
        )
        .orderBy("bucket")
    )
