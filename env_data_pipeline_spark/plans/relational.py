"""Generic relational query surface (SURVEY.md §2.6 engine-native note,
§7.0 flagship).

The reference never sorts, limits, or set-ops its results — but any
real analytics engine over this domain must, so these are first-class
engine queries over the TESTDATA tables: scan -> filter -> join ->
agg -> window -> sort -> limit, each with a DuckDB oracle.

Scale notes per query in docstrings; all aggregates are rounded to 4
decimals on BOTH engines so summation-order ulp noise cannot break the
value-hash comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from env_data_pipeline_spark.catalog import table
from env_data_pipeline_spark.plans.registry import BENCH_EXTRA, query


@query(
    "flagship_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           -- money sums in exact 1e-4 units (group sums ~1e9-1e10:
           -- raw-double ROUND flips on summation order at sf>=0.1)
           ROUND(SUM(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT))
                 / 10000.0, 4) AS sum_base_price,
           ROUND(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                * 10000 + 0.5) AS BIGINT)) / 10000.0, 4)
             AS sum_disc_price,
           ROUND(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                * (1 + l_tax) * 10000 + 0.5) AS BIGINT))
                 / 10000.0, 4) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary (SURVEY.md §7.0).

    Scale: single scan + partial/final hash agg on 6 groups — no
    shuffle pressure at any SF; the shipdate predicate and the 7-column
    projection push down to the Parquet scan.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(
                F.sum(F.floor(F.col("l_extendedprice") * 10000 + 0.5).cast("bigint"))
                / F.lit(10000.0),
                4,
            ).alias("sum_base_price"),
            F.round(
                F.sum(F.floor(disc_price * 10000 + 0.5).cast("bigint"))
                / F.lit(10000.0),
                4,
            ).alias("sum_disc_price"),
            F.round(
                F.sum(F.floor(charge * 10000 + 0.5).cast("bigint")) / F.lit(10000.0),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "revenue_by_region",
    oracle="""
    SELECT r.r_name AS region_name,
           -- exact 1e-4 money units (see revenue_rollup_region_nation:
           -- region sums are ~1e9 where raw-double rounding is
           -- summation-order-sensitive)
           ROUND(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                * 10000 + 0.5) AS BIGINT)) / 10000.0, 4) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY revenue DESC
    """,
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join: fact -> dims (J3-shaped star join).

    Scale: customer/nation/region are dimensions — broadcast them so
    the only shuffle is the final 5-group aggregation. lineitem⋈orders
    is the large-large edge; at 100 TB both sides hash-partition on
    orderkey (sort-merge under AQE), everything downstream is
    broadcast. Explicit broadcast() hints pin the dim sides.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.round(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 10000
                        + 0.5
                    ).cast("bigint")
                )
                / F.lit(10000.0),
                4,
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue"))
    )


@query(
    "topk_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_orderpriority, rn
    """,
)
def topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranking window (W4-shaped).

    Scale: one shuffle on the partition key; rank pushdown
    (WindowGroupLimit) keeps per-partition state at K rows instead of
    sorting whole partitions. Ties broken deterministically by
    orderkey so the result is unique (oracle-hash safe).
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_orderpriority", "rn")
    )


@query(
    "semi_anti_join_customers",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with_orders,
      (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without_orders
    """,
)
def semi_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti joins — the natural form of the reference's
    presence checks (F13) and whitelist filters (F4), SURVEY.md §2.5.

    Scale: semi/anti joins shuffle only the join key and carry no
    payload columns from the right side; Catalyst rewrites both from
    EXISTS/NOT EXISTS identically.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count("*").alias("n_with_orders")
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count("*").alias("n_without_orders")
    )
    # one lazy plan (no driver-side actions at build time); the two
    # 1-row aggregates cross-join into the single result row
    return semi.crossJoin(anti)


@query(
    "order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style: date-range filter + semi join + agg.

    Scale: the date predicate prunes the orders scan before the
    shuffle; the semi join carries only l_orderkey/l_shipdate.
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    filtered = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    matched = filtered.join(
        li,
        (filtered.o_orderkey == li.l_orderkey) & (li.l_shipdate > filtered.o_orderdate),
        "left_semi",
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "set_ops_part_types",
    oracle="""
    WITH big AS (SELECT DISTINCT p_type FROM part WHERE p_size > 25),
         costly AS (SELECT DISTINCT p_type FROM part WHERE p_retailprice > 1500)
    SELECT
      (SELECT COUNT(*) FROM (SELECT p_type FROM big UNION SELECT p_type FROM costly)) AS n_union,
      (SELECT COUNT(*) FROM (SELECT p_type FROM big INTERSECT SELECT p_type FROM costly)) AS n_intersect,
      (SELECT COUNT(*) FROM (SELECT p_type FROM big EXCEPT SELECT p_type FROM costly)) AS n_except
    """,
)
def set_ops_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except — engine-native set-op surface
    (SURVEY.md §2.6 note: absent from the reference, required here)."""
    p = table(spark, sf_dir, "part")
    big = p.filter(F.col("p_size") > 25).select("p_type").distinct()
    costly = p.filter(F.col("p_retailprice") > 1500).select("p_type").distinct()
    # one lazy plan: each set-op feeds a 1-row aggregate, cross-joined
    # into the result row (no driver-side actions at build time)
    n_union = big.union(costly).distinct().agg(F.count("*").alias("n_union"))
    n_intersect = big.intersect(costly).agg(F.count("*").alias("n_intersect"))
    n_except = (
        big.exceptAll(costly).distinct().agg(F.count("*").alias("n_except"))
    )
    return n_union.crossJoin(n_intersect).crossJoin(n_except)


@query(
    "events_sessionized_stats",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type, value,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT user_id, ts, event_id, event_type, value,
               CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM ordered
    ),
    sessions AS (
        SELECT user_id, event_type, value,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def events_sessionized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + gap>30min flag + running sum (the batch
    analog of the streaming event path, SURVEY.md §2.9).

    Scale: both windows share one partitioning (user_id), so this is a
    single shuffle; at 100 TB the per-user partitions are small and
    skew-safe.
    """
    ev = table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(w_order)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))
                > 1800 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w_run))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("session_value"))
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# AS-OF join (engine-native, SURVEY.md §2.5): last-touch attribution
# ---------------------------------------------------------------------------


@query(
    "events_asof_last_touch",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT p.event_id, p.user_id, p.ts,
             e.event_type AS prior_event_type,
             e.ts AS prior_ts,
             e.event_id AS prior_event_id,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY e.ts DESC, e.event_id DESC) AS rn
      FROM p LEFT JOIN events e
        ON e.user_id = p.user_id AND e.ts < p.ts
    )
    SELECT event_id, user_id, ts, prior_event_type, prior_ts, prior_event_id
    FROM j WHERE rn = 1
    """,
)
def events_asof_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for each purchase, the user's latest strictly-prior
    event (last-touch attribution). Runs the merge-pattern asof_join
    (operators/asof.py: one shuffle, sort within partition, running
    last-non-null) — the oracle cross-checks with an independent
    algorithm (range join + ROW_NUMBER), so parity proves the as-of
    semantics, not just the arithmetic."""
    from env_data_pipeline_spark.operators.asof import asof_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    prior = ev.select(
        "user_id",
        "ts",
        F.col("event_type").alias("prior_event_type"),
        F.col("ts").alias("prior_ts"),
        F.col("event_id").alias("prior_event_id"),
    )
    res = asof_join(
        purchases,
        prior,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["prior_event_type", "prior_ts", "prior_event_id"],
        tiebreak="prior_event_id",
        strict=True,
    )
    return res.select(
        "event_id",
        "user_id",
        "ts",
        F.col("_match.prior_event_type").alias("prior_event_type"),
        F.col("_match.prior_ts").alias("prior_ts"),
        F.col("_match.prior_event_id").alias("prior_event_id"),
    )


BENCH_EXTRA.add("events_asof_last_touch")
# r10: the AQE skew-join demonstration query (90%-hot tenant key)
BENCH_EXTRA.add("events_skewed_tenant_profile")


@query(
    "orders_pit_prior_features",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate,
             MAX(o_orderkey) AS prior_orderkey,
             arg_max(o_totalprice, o_orderkey) AS prior_totalprice,
             arg_max(o_orderpriority, o_orderkey) AS prior_priority
      FROM orders GROUP BY 1, 2
    )
    SELECT b.o_orderkey, b.o_custkey,
           o.prior_orderkey,
           ROUND(o.prior_totalprice, 4) AS prior_totalprice,
           o.prior_priority,
           date_diff('day', CAST(o.o_orderdate AS DATE),
                     CAST(b.o_orderdate AS DATE)) AS days_since_prior
    FROM orders b
    ASOF LEFT JOIN o
      ON b.o_custkey = o.o_custkey AND b.o_orderdate > o.o_orderdate
    """,
)
def orders_pit_prior_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME feature join (the feature-store staple): for each
    order, the same customer's most recent STRICTLY-PRIOR order —
    key, value, priority, and recency in days. "As of the moment this
    order was placed, what did this customer last do" is the leakage-
    safe way to build training features from history: a plain
    latest-per-customer join would leak future orders into past rows.
    First orders carry NULL features (~10% of rows), exercising the
    no-history path.

    Runs the merge-pattern asof_join (operators/asof.py: one shuffle
    on custkey, in-partition sort, running last-non-null — no range
    cross-join, holds at 100 TB). Same-date ties resolve to the max
    orderkey on both engines (the window's _tie sort here, arg_max
    pre-aggregation in the oracle). The oracle is DuckDB's native
    ASOF JOIN — an independent algorithm, so parity proves the as-of
    semantics, not just the arithmetic."""
    from env_data_pipeline_spark.operators.asof import asof_join

    orders = table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    prior = orders.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        "o_totalprice",
        "o_orderpriority",
    )
    res = asof_join(
        base,
        prior,
        on="o_custkey",
        left_ts="o_orderdate",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice", "o_orderpriority", "o_orderdate"],
        tiebreak="o_orderkey",
        strict=True,
    )
    return res.select(
        "o_orderkey",
        "o_custkey",
        F.col("_match.o_orderkey").alias("prior_orderkey"),
        F.round("_match.o_totalprice", 4).alias("prior_totalprice"),
        F.col("_match.o_orderpriority").alias("prior_priority"),
        F.datediff(
            F.to_date("o_orderdate"), F.to_date("_match.o_orderdate")
        ).alias("days_since_prior"),
    )


@query(
    "events_interval_attribution",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           COUNT(CASE WHEN e.event_type = 'click' THEN 1 END) AS n_prior_clicks,
           COUNT(CASE WHEN e.event_type = 'view' THEN 1 END) AS n_prior_views,
           ROUND(SUM(e.value), 4) AS prior_window_value
    FROM p LEFT JOIN events e
      ON e.user_id = p.user_id
     AND e.ts >= p.ts - INTERVAL 10 MINUTE
     AND e.ts < p.ts
    GROUP BY 1, 2, 3
    """,
)
def events_interval_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL join (the time-window complement of the as-of join):
    for each purchase, the same user's activity in the 10 minutes
    strictly before it — click/view counts and summed value.

    Scale shape: the join is EQUI on user_id (one shuffle keyed by
    user) with the time-range predicate evaluated inside each matched
    group — never a cross product. A pathological single user with
    millions of events would additionally bucket both sides by
    time-window (equi on (user, window) with adjacent-bucket probes);
    at this corpus's per-user volumes the plain equi-key plan is the
    right one."""
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    e = ev.select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.col("event_type").alias("e_type"),
        F.col("value").alias("e_value"),
    )
    j = p.join(
        e,
        (F.col("e_user") == F.col("user_id"))
        & (F.col("e_ts") >= F.col("ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("e_ts") < F.col("ts")),
        "left",
    )
    return j.groupBy("event_id", "user_id", "ts").agg(
        F.count(F.when(F.col("e_type") == "click", 1)).alias("n_prior_clicks"),
        F.count(F.when(F.col("e_type") == "view", 1)).alias("n_prior_views"),
        F.round(F.sum("e_value"), 4).alias("prior_window_value"),
    )


@query(
    "top_suppliers_per_nation",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey, s.s_suppkey, s.s_name,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT n.n_name AS nation, r.s_name, r.revenue,
             ROW_NUMBER() OVER (PARTITION BY r.s_nationkey
                                ORDER BY r.revenue DESC, r.s_suppkey ASC) AS rank
      FROM rev r JOIN nation n ON n.n_nationkey = r.s_nationkey
    )
    SELECT nation, s_name, revenue, rank FROM ranked WHERE rank <= 3
    """,
)
def top_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native (§2.6 top-k): top-3 suppliers by lineitem revenue
    per nation. Fact-side partial agg on l_suppkey BEFORE the
    broadcast dim joins (shuffle carries one row per supplier, never
    raw lineitems), then a per-nation ranking window over the already
    tiny aggregate — the canonical large-fact/small-dim top-k shape."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .join(
            F.broadcast(sup.select("s_suppkey", "s_name", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("revenue"), F.asc("s_suppkey")
    )
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(F.col("n_name").alias("nation"), "s_name", "revenue", "rank")
    )


@query(
    "events_salted_type_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value,
           ROUND(MAX(value), 4) AS max_value
    FROM events GROUP BY event_type
    """,
)
def events_salted_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation (SURVEY.md §4; operators/skew.py): five
    event types are five reduce keys — at cluster scale each hot key
    funnels through one task unless split. Two-phase salted aggregate:
    (key, hash-salt) partials spread each key over 16 tasks, then the
    algebraic partials (count->sum, sum->sum, max->max) combine on the
    key. The oracle is the plain GROUP BY, proving the decomposition
    exact."""
    from env_data_pipeline_spark.operators.skew import salted_aggregate

    ev = table(spark, sf_dir, "events")
    out = salted_aggregate(
        ev.select("event_type", "event_id", "value"),
        key="event_type",
        salt_source="event_id",
        partial_aggs=[
            F.count("*").alias("_n"),
            F.sum("value").alias("_v"),
            F.max("value").alias("_m"),
        ],
        final_aggs=[
            F.sum("_n").alias("n_events"),
            F.round(F.sum("_v"), 4).alias("total_value"),
            F.round(F.max("_m"), 4).alias("max_value"),
        ],
    )
    return out


@query(
    "events_skewed_tenant_profile",
    oracle="""
    WITH ev AS (
      SELECT CASE WHEN user_id % 10 = 0 THEN user_id ELSE 0 END AS tenant,
             event_type
      FROM events
    ),
    cust AS (
      SELECT c_custkey AS tenant,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
      FROM customer
    )
    SELECT ev.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(cust.bal_cents) AS BIGINT) AS n_identified,
           CAST(COALESCE(SUM(cust.bal_cents), 0) AS BIGINT)
               AS identified_bal_cents_total
    FROM ev LEFT JOIN cust USING (tenant)
    GROUP BY 1 ORDER BY 1
    """,
)
def events_skewed_tenant_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberately SKEWED fact-fact join (SURVEY.md §4's join-side
    skew story, complementing events_salted_type_stats' agg-side
    salting): events are attributed to an account — logged-out
    traffic (user_id % 10 != 0, ~90% of rows) lands on the shared
    anonymous pool, tenant 0 — and each event is left-joined to the
    customer table on that key to profile, per event type, how much
    of the traffic is identified and the average account balance
    behind it (the "which event types do signed-in, high-balance
    accounts drive" monitor; anonymous rows keep a NULL balance).

    The enrichment join shuffles the raw event stream on tenant, so
    ONE partition carries ~90% of the fact table — the textbook skew
    shape salting cannot fix on a JOIN (splitting the probe stream is
    the runtime's job). The plan relies on AQE's skew-join splitting:
    at 100 TB the tenant-0 partition blows past
    spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes
    (256 MB default) and factor 5x-median, and AQE splits it into
    advisory-sized chunks, replicating the matching build blocks
    (tests/test_physical_plans.py::test_skewed_tenant_join_aqe_split
    pins the skew=true marker on the executed SMJ with the thresholds
    scaled down to test SF). Three shape constraints make the split
    LEGAL, found the hard way and pinned here so they are not
    refactored away: (1) both SMJ children must be bare
    Sort(ShuffleQueryStage) with ENSURE_REQUIREMENTS shuffle origin —
    an aggregate or explicit repartition on either side disqualifies
    the rule, which is why the build side is a plain customer
    scan/projection; (2) LeftOuter lets AQE split the (skewed) left
    stream side; (3) the downstream aggregate keys on event_type —
    NOT on tenant — so the join's output partitioning is not reused
    downstream. Both legs merge-hinted: customer grows with SF,
    fact-fact, never broadcast (AQE hazard).

    Exactness: counts and the integer-cent balance total are exact
    BIGINTs (a total rather than a truncated integer-div "average",
    which misleads over negative balances)."""
    ev = table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 10 == 0, F.col("user_id"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("tenant"),
        "event_type",
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("tenant"),
        F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").alias(
            "bal_cents"
        ),
    )
    return (
        ev.hint("merge")
        .join(cust.hint("merge"), "tenant", "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count("bal_cents").cast("bigint").alias("n_identified"),
            # total, not avg: Spark div and DuckDB // BOTH truncate
            # toward zero (verified on negatives, see holt_report), so
            # an integer-div average would be parity-safe — the total
            # is simply the more useful exact statistic here (balances
            # can be negative, so a truncated "average" misleads)
            F.coalesce(F.sum("bal_cents"), F.lit(0))
            .cast("bigint")
            .alias("identified_bal_cents_total"),
        )
        .orderBy("event_type")
    )


@query(
    "revenue_rollup_region_nation",
    oracle="""
    SELECT coalesce(r.r_name, 'ALL') AS region,
           coalesce(n.n_name, 'ALL') AS nation,
           -- per-row revenue rounded HALF-UP to 1e-4 money units
           -- BEFORE the sum: grand totals reach ~1e10 where a double's
           -- ulp exceeds the 4th decimal, so ROUND(SUM(double)) flips
           -- between engines on summation order (observed at sf0.1).
           -- floor(x*1e4 + 0.5) instead of floor(x*1e4): the product's
           -- binary representation can sit a hair BELOW the decimal
           -- grid point (8.29*1e4 = 82899.999...), which plain floor
           -- systematically undercounts by one micro-unit (ADVICE r4);
           -- half-up recovers the decimal-exact value while staying
           -- bit-identical across engines
           ROUND(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                * 10000 + 0.5) AS BIGINT)) / 10000.0, 4) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def revenue_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native hierarchical aggregation: ROLLUP(region, nation)
    computes nation-level, region-level and grand totals in ONE pass
    (Catalyst expands the grouping sets; partial aggregation still
    applies). NULL grouping slots normalized to 'ALL' so the three
    levels are distinguishable and hash-comparable. Revenue sums in
    exact 1e-4 money units (per-row floor, integer sum) — the rollup's
    grand total is large enough that a raw double sum's rounding is
    summation-order-sensitive at sf>=0.1."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    rev_u = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("bigint")
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum(rev_u) / F.lit(10000.0), 4).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "revenue",
            "n_lineitems",
        )
    )


@query(
    "lineitem_price_quantiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def lineitem_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native distribution aggregate: exact interpolated
    percentiles per group (Spark `percentile` == DuckDB
    `quantile_cont`, both linear interpolation). At 100 TB the
    one-line swap is `approx_percentile` (t-digest, mergeable
    partials) — exact here so the oracle can hash-match."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


@query(
    "small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_size = 1 AND l.l_quantity < pa.qty_threshold
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style correlated scalar subquery, decorrelated the
    way Catalyst itself rewrites it: the per-part average joins back
    as an aggregate (the 'subquery' is computed once for all parts in
    one pass, not per outer row). The part filter broadcasts; the
    per-part agg shuffles only (partkey, avg)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") == 1).select("p_partkey")
    pa = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa.withColumnRenamed("l_partkey", "pa_partkey"),
              F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@query(
    "orders_status_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p,
           ROUND(SUM(o_totalprice), 4) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native pivot (the wide-merge form SURVEY §2.5 J3 cites as
    `groupBy().pivot("source")`): order counts per priority, one column
    per order status.

    Scale notes. (1) The value list is EXPLICIT — `pivot(col, values)`
    without it triggers an eager distinct-scan job over the pivot
    column before planning, a full extra pass at 100 TB. (2) The
    per-status counts AND the price total come out of the SAME pivot
    aggregation (multi-agg pivot: count + price sum per status; the
    row total is the sum of the pivoted sums), so the plan is one
    linear scan -> partial/final hash agg — no self-join, no second
    scan of the fact table (asserted in tests/test_physical_plans.py).
    (3) Missing combinations coalesce to 0 so both engines agree on
    empty cells at any SF."""
    piv = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("s"),
        )
    )
    zero = lambda c: F.coalesce(F.col(f"`{c}`"), F.lit(0))  # noqa: E731
    return piv.select(
        "o_orderpriority",
        *[zero(f"{s}_n").alias(f"status_{s.lower()}") for s in ("F", "O", "P")],
        F.round(zero("F_s") + zero("O_s") + zero("P_s"), 4).alias("total_price"),
    )


@query(
    "events_props_json_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS total_k,
           ROUND(AVG(k), 4) AS avg_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM (
      -- mirror Spark's lenient from_json('k BIGINT'): malformed JSON,
      -- a missing key, or a non-integral/string-typed k all yield
      -- NULL there — guard with json_valid + json_type + TRY_CAST so
      -- dirty rows agree instead of hard-erroring the oracle
      SELECT event_type,
             CASE WHEN json_valid(props)
                   AND json_type(json_extract(props, '$.k'))
                       IN ('BIGINT', 'UBIGINT')
                  THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k
      FROM events
    )
    GROUP BY event_type
    """,
)
def events_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON extraction (the props payload column):
    typed from_json parse -> per-type aggregate.

    Scale notes. from_json with an explicit schema parses ONCE into a
    typed struct inside the scan projection (get_json_object per field
    would re-parse the document per extraction); the agg is a plain
    two-phase hash aggregate on 5 keys. At 100 TB this is the
    schema-on-read pattern: parse early, carry typed columns, never
    re-parse downstream."""
    ev = table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT").getField("k")
    parsed = ev.select("event_type", k.alias("k"))
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("total_k"),
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.max("k").alias("max_k"),
    )


@query(
    "events_gap_fill_hourly",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, value FROM events WHERE user_id % 10 = 0
    ),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             COUNT(*) AS n, ROUND(AVG(value), 6) AS v
      FROM ev GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id,
             generate_series(date_trunc('hour', MIN(ts)),
                             date_trunc('hour', MAX(ts)),
                             INTERVAL 1 HOUR) AS hs
      FROM ev GROUP BY user_id
    ),
    scaffold AS (SELECT user_id, unnest(hs) AS hour FROM span),
    j AS (
      SELECT s.user_id, s.hour, h.n, h.v
      FROM scaffold s LEFT JOIN hourly h USING (user_id, hour)
    )
    SELECT user_id, hour,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           ROUND(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS filled_value,
           v IS NOT NULL AS is_observed
    FROM j
    """,
)
def events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill + forward interpolation: per-user hourly
    scaffold generated with sequence() over each user's observed span,
    left-joined to the hourly aggregate, missing hours carry the last
    observed value forward (last(ignorenulls) over an unbounded-
    preceding frame).

    Scale notes. The scaffold is generated map-side per user (array
    fan-out bounded by the user's own span — no global calendar cross
    join); one shuffle keys the hourly aggregate, one more the
    scaffold join, and the fill window re-uses the join's partitioning.
    The observed hourly value is rounded BEFORE the fill so both
    engines propagate bit-identical doubles through the window."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("v"))
    scaffold = (
        ev.groupBy("user_id")
        .agg(
            F.expr(
                "sequence(date_trunc('hour', min(ts)),"
                " date_trunc('hour', max(ts)), interval 1 hour)"
            ).alias("hs")
        )
        .select("user_id", F.explode("hs").alias("hour"))
    )
    j = scaffold.join(hourly, ["user_id", "hour"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "user_id",
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.round(F.last("v", ignorenulls=True).over(w), 4).alias("filled_value"),
        F.col("v").isNotNull().alias("is_observed"),
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    -- The |z| > 3 cliff is decided in EXACT INTEGER arithmetic: with
    -- qv = round-half-up micro-units of value, mu = s1/(n*g) and
    -- sigma^2 = (n*s2 - s1^2)/(n*g)^2, so
    --   |z| > 3  <=>  (qv*n - s1)^2 > 9*(n*s2 - s1^2)
    -- where every term is an exact integer (HUGEINT here,
    -- decimal(38,0) on the Spark side). No double ever feeds the
    -- discrete decision, so partial-agg summation order cannot flip
    -- it (the old ROUND(AVG)/ROUND(stddev) inputs could straddle a
    -- grid boundary). z itself is (qv*n - s1)/sqrt(r) — doubles only
    -- for the rounded continuous output.
    WITH q AS (
      SELECT event_type,
             CAST(floor(value * 1000000 + 0.5) AS HUGEINT) AS qv
      FROM events
    ),
    stats AS (
      SELECT event_type,
             COUNT(*) AS n_total,
             SUM(qv) AS s1,
             SUM(qv * qv) AS s2
      FROM q GROUP BY event_type
    ),
    st AS (
      SELECT event_type, n_total, s1,
             n_total * s2 - s1 * s1 AS r
      FROM stats
    ),
    scored AS (
      SELECT q.event_type, s.n_total, s.r,
             ABS(q.qv * s.n_total - s.s1) AS num
      FROM q JOIN st s USING (event_type)
    )
    SELECT event_type,
           CAST(MIN(n_total) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN r > 0 AND num * num > 9 * r
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           ROUND(SUM(CASE WHEN r > 0 AND num * num > 9 * r
                          THEN 1 ELSE 0 END)
                 / CAST(MIN(n_total) AS DOUBLE), 6) AS anomaly_rate,
           ROUND(CASE WHEN MIN(r) <= 0 THEN 0.0
                      ELSE CAST(MAX(num) AS DOUBLE)
                           / sqrt(CAST(MIN(r) AS DOUBLE)) END,
                 4) AS max_abs_z
    FROM scored GROUP BY event_type
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical anomaly detection: per-type z-score against the
    population mean/stddev, |z| > 3 flagged — the monitoring query an
    environmental-telemetry store runs continuously (the reference has
    no anomaly notion at all; its nearest analog is the hard-coded
    risk thresholds, weather_container.py:199-223).

    Float discipline (closes ADVICE r4 / VERDICT r5 item 3): the
    anomaly decision never touches a double. value is quantized
    per-row to round-half-up micro-units qv; with exact integer sums
    s1 = sum(qv), s2 = sum(qv^2), r = n*s2 - s1^2, the z-test
    rearranges to (qv*n - s1)^2 > 9*r — exact decimal(38,0)
    arithmetic, identical under any summation order and on any
    engine. Only the ROUNDED continuous outputs (max_abs_z =
    max|qv*n - s1|/sqrt(r)) pass through doubles. Headroom: at 100x
    this data (2e6 rows/group, value<=600) the largest term
    (qv*n - s1)^2 is ~1.3e30 against decimal(38)'s 1e38.

    Scale notes. Two passes over the same scan: a 5-row stats
    aggregate that BROADCASTS back onto the fact scan (the fact table
    never shuffles), then the flag summary re-aggregates map-side.
    The per-row test is a projection; the plan survives 100x because
    the only exchanges carry 5-row group states."""
    ev = table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("qv"),
    )
    stats = (
        q.groupBy("event_type")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("qv").alias("s1"),
            F.sum(F.col("qv") * F.col("qv")).alias("s2"),
        )
        .select(
            "event_type",
            "n_total",
            "s1",
            (
                F.col("n_total").cast("decimal(38,0)") * F.col("s2")
                - F.col("s1") * F.col("s1")
            ).alias("r"),
        )
    )
    scored = q.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "n_total",
        "r",
        F.abs(
            F.col("qv") * F.col("n_total").cast("decimal(38,0)") - F.col("s1")
        ).alias("num"),
    )
    is_anom = (F.col("r") > 0) & (
        F.col("num") * F.col("num") > F.lit(9).cast("decimal(38,0)") * F.col("r")
    )
    flagged = F.sum(F.when(is_anom, 1).otherwise(0))
    return scored.groupBy("event_type").agg(
        F.min("n_total").alias("n_total"),
        flagged.alias("n_anomalies"),
        F.round(flagged / F.min("n_total"), 6).alias("anomaly_rate"),
        F.round(
            F.when(F.min("r") <= 0, F.lit(0.0)).otherwise(
                F.max("num").cast("double") / F.sqrt(F.min("r").cast("double"))
            ),
            4,
        ).alias("max_abs_z"),
    )
