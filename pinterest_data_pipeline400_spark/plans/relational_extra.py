"""Relational surface beyond the eight reference analogs: the TPC-H
tables the analog set leaves cold (lineitem's measures, part, supplier)
plus grouping-sets, anti-join, and time-range window-frame coverage.

Why these exist: a user switching from the reference engine brings the
rest of their warehouse workload with them — pricing rollups over the
fact table, dimension-enriched revenue cuts, "who has NO activity"
anti-joins, multi-grain grouping-sets reports, and rolling-window spend
features. Each entry is the idiomatic Catalyst-friendly form of one of
those shapes, with the same determinism rules as ``tpch_queries``
(integer cents, exact integer sums before any division, explicit
tiebreaks).

Scale notes:
  * lineitem is the 100 TB fact; part (SF*2k rows) and supplier
    (SF*100) are broadcast dims — every join here is a broadcast hash
    join with the fact side never shuffled before aggregation.
  * The grouping-sets aggregate EXPANDs inside one hash aggregate
    (partial combine map-side), not one job per grain.
  * The rolling-spend window partitions by customer (high cardinality,
    bounded rows per key) — never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_parquet_table
from .registry import REGISTRY


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


#: Both engines compute the identical IEEE-double product before the
#: *100 round, so the per-row cents are bit-identical; integer sums are
#: then order-independent. Parenthesization matters and matches.
_REVENUE_CENTS_SQL = "CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)"


def _revenue_cents() -> F.Column:
    return F.round(
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))) * 100
    ).cast("long")


PRICING_CUTOFF = "2000-12-01"  # fixture shipdates span 1995..2001


@REGISTRY.register(
    "q_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_base_cents,
           CAST(sum({_REVENUE_CENTS_SQL}) AS BIGINT) AS sum_disc_cents,
           CAST(sum(CAST(round(((l_extendedprice * (1 - l_discount))
                                * (1 + l_tax)) * 100) AS BIGINT)) AS BIGINT)
             AS sum_charge_cents,
           CAST(count(*) AS BIGINT) AS count_order,
           round(CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
                 / count(*), 6) AS avg_qty,
           round(CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)) AS DOUBLE)
                 / (10000 * count(*)), 6) AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus""",
    doc="TPC-H Q1 pricing summary — the canonical fact-table rollup the "
    "analog set (q1..q8) never ran on lineitem's measures: per "
    "(returnflag, linestatus), exact integer-cent sums of base price, "
    "discounted price, and charge, plus averages derived from those "
    "exact integer sums (never a float mean, whose partial-aggregation "
    "order would differ between engines). Scale shape: single scan with "
    "the shipdate predicate pushed to parquet, one hash aggregate over "
    "a 6-group key — partial sums combine map-side, ~no shuffle volume.",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(f"{PRICING_CUTOFF} 00:00:00").cast("timestamp")
    )
    qty = F.round(F.col("l_quantity")).cast("long")
    base_cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_cents = _revenue_cents()
    charge_cents = F.round(
        (
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
            * (F.lit(1) + F.col("l_tax"))
        )
        * 100
    ).cast("long")
    disc_bp = F.round(F.col("l_discount") * 10000).cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("long").alias("sum_qty"),
            F.sum(base_cents).cast("long").alias("sum_base_cents"),
            F.sum(disc_cents).cast("long").alias("sum_disc_cents"),
            F.sum(charge_cents).cast("long").alias("sum_charge_cents"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
            F.round(
                F.sum(qty).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_qty"),
            F.round(
                F.sum(disc_bp).cast("double") / (F.count(F.lit(1)) * 10000), 6
            ).alias("avg_disc"),
        )
    )


@REGISTRY.register(
    "q_supplier_nation_revenue",
    oracle=f"""
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(sum({_REVENUE_CENTS_SQL}) AS BIGINT) AS revenue_cents
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name""",
    doc="Revenue by supplier nation (TPC-H Q5's supplier leg): the fact "
    "table enriched through the supplier -> nation dimension chain. "
    "Both dims are SF-bounded-tiny (supplier SF*100, nation 25) so "
    "Catalyst broadcasts them — the lineitem side streams through two "
    "map-side hash joins unshuffled, and the only exchange is the final "
    "25-group aggregate of already-partial sums. The distinct-supplier "
    "count rides the same aggregate (expand), no second scan.",
)
def q_supplier_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.count_distinct(F.col("l_suppkey")).cast("long").alias("n_suppliers"),
            F.sum(_revenue_cents()).cast("long").alias("revenue_cents"),
        )
    )


@REGISTRY.register(
    "q_part_brand_margins",
    oracle=f"""
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(sum({_REVENUE_CENTS_SQL}) AS BIGINT) AS revenue_cents,
           CAST(sum(CAST(round((l_extendedprice
                                - p_retailprice * l_quantity) * 100) AS BIGINT))
                AS BIGINT) AS margin_cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand""",
    doc="Per-brand realized margin: the fact table joined to the part "
    "dimension (first consumer of `part` in the suite), margin = "
    "extended price minus retail valuation of the quantity, summed as "
    "exact per-row integer cents. part is SF*2k rows — broadcast, so "
    "the plan is scan -> map-side hash join -> partial-combined "
    "aggregate on the small brand key. The per-row double products "
    "match the oracle bit-for-bit (identical parenthesization) before "
    "the integer round.",
)
def q_part_brand_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    margin_cents = F.round(
        (F.col("l_extendedprice") - F.col("p_retailprice") * F.col("l_quantity")) * 100
    ).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.count_distinct(F.col("l_partkey")).cast("long").alias("n_parts"),
            F.sum(_revenue_cents()).cast("long").alias("revenue_cents"),
            F.sum(margin_cents).cast("long").alias("margin_cents"),
        )
    )


@REGISTRY.register(
    "q_grouping_sets_region_segment",
    oracle="""
    SELECT coalesce(r_name, 'ALL') AS r_name,
           coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name),
                            (c_mktsegment), ())""",
    doc="GROUPING SETS — the general form rollup and cube are sugar "
    "over (ev_rollup_multigrain / ev_cube_day_type cover those): the "
    "four explicitly chosen grains of the region x segment customer "
    "report in ONE aggregate. Spark plans a single Expand + hash "
    "aggregate (each input row fans to its 4 grain rows map-side, "
    "partials combine before the shuffle) — never one job per grain. "
    "Grain labels are coalesced to 'ALL' so the driver hash never "
    "depends on engine NULL ordering.",
)
def q_grouping_sets_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
    ).join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    grains = joined.groupingSets(
        [["r_name", "c_mktsegment"], ["r_name"], ["c_mktsegment"], []],
        "r_name",
        "c_mktsegment",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
        .cast("long")
        .alias("acctbal_cents"),
    )
    return grains.select(
        F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
        F.coalesce("c_mktsegment", F.lit("ALL")).alias("c_mktsegment"),
        "n_customers",
        "acctbal_cents",
    )


@REGISTRY.register(
    "q_anti_join_customers",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)""",
    doc="Customers with zero orders — the DataFrame-API left-ANTI join "
    "(q_exists_customers is the SQL spelling Catalyst decorrelates to "
    "the same operator). Anti joins are the 'what is missing' half of "
    "every reconciliation: one hash join on the uniform customer key, "
    "the orders side reduced to its join column at the scan (column "
    "pruning), nothing retained but non-matches.",
)
def q_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
        )
    )


ROLLING_DAYS = 90  # inclusive window: today + the 89 preceding days


@REGISTRY.register(
    "orders_rolling_90d_spend",
    oracle=f"""
    WITH o AS (SELECT o_orderkey, o_custkey,
                      date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS day_num,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders)
    SELECT o_orderkey, o_custkey, CAST(day_num AS BIGINT) AS day_num,
           CAST(sum(cents) OVER w AS BIGINT) AS rolling_cents,
           CAST(count(*) OVER w AS BIGINT) AS n_orders_90d
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY day_num
                 RANGE BETWEEN {ROLLING_DAYS - 1} PRECEDING AND CURRENT ROW)""",
    doc="Per-customer rolling 90-day spend at every order — the classic "
    "time-RANGE window frame (a peer-inclusive value range over epoch "
    "days, not a ROWS frame: same-day orders are always all in or all "
    "out together, which makes the result deterministic under ties "
    "without any tiebreak column). Partitioned by the high-cardinality "
    "customer key with bounded rows per key — one shuffle, per-key "
    "sorts only, never a global sort. The feature-engineering shape "
    "behind every trailing-spend / trailing-activity model input.",
)
def orders_rolling_90d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day_num"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_num")
        .rangeBetween(-(ROLLING_DAYS - 1), 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "day_num",
        F.sum("cents").over(w).cast("long").alias("rolling_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_orders_90d"),
    )


RFM_ASOF = "2001-09-01"  # analysis date: just past the last fixture order


@REGISTRY.register(
    "orders_rfm_segments",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey,
             date_diff('day', CAST(max(o_orderdate) AS DATE),
                       DATE '{RFM_ASOF}') AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey),
    thr AS (SELECT round(quantile_cont(CAST(recency_days AS DOUBLE), 0.5), 6) AS r_med,
                   round(quantile_cont(CAST(frequency AS DOUBLE), 0.5), 6) AS f_med,
                   round(quantile_cont(CAST(monetary_cents AS DOUBLE), 0.5), 6) AS m_med
            FROM rfm),
    seg AS (SELECT r.*,
                   (CAST(r.recency_days AS DOUBLE) <= t.r_med) AS recent,
                   (CAST(r.frequency AS DOUBLE) > t.f_med) AS frequent,
                   (CAST(r.monetary_cents AS DOUBLE) > t.m_med) AS big_spender
            FROM rfm r CROSS JOIN thr t)
    SELECT CASE WHEN recent AND frequent AND big_spender THEN 'champion'
                WHEN recent AND (frequent OR big_spender) THEN 'loyal'
                WHEN NOT recent AND (frequent OR big_spender) THEN 'at_risk'
                WHEN recent THEN 'new'
                ELSE 'hibernating' END AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(monetary_cents) AS BIGINT) AS segment_cents,
           CAST(min(recency_days) AS BIGINT) AS min_recency_days,
           CAST(max(recency_days) AS BIGINT) AS max_recency_days
    FROM seg GROUP BY 1""",
    doc="RFM customer segmentation — the classic recency/frequency/"
    "monetary analysis, composed scale-first: per-customer RFM facts "
    "from ONE partial-combined aggregate over orders (exact integer "
    "cents, integer day recency against a fixed analysis date), the "
    "three median THRESHOLDS as one tiny exact-percentile aggregate "
    "broadcast back (the docs_quality_buckets pattern — never a "
    "global-sort ntile), segments by boolean comparison, and a "
    "5-group rollup. Two shuffles total at any scale: the customer "
    "aggregate and the bounded segment aggregate. Medians rounded to "
    "6 dp on both engines; all comparisons are against integers cast "
    "to double, so the knife edges are the rounded thresholds "
    "themselves, identical by construction.",
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_ASOF).cast("date"), F.max(F.col("o_orderdate").cast("date"))
        ).alias("recency_days"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("monetary_cents"),
    )
    thr = rfm.agg(
        F.round(F.expr("percentile(CAST(recency_days AS DOUBLE), 0.5)"), 6).alias("r_med"),
        F.round(F.expr("percentile(CAST(frequency AS DOUBLE), 0.5)"), 6).alias("f_med"),
        F.round(F.expr("percentile(CAST(monetary_cents AS DOUBLE), 0.5)"), 6).alias(
            "m_med"
        ),
    )
    seg = rfm.crossJoin(F.broadcast(thr)).select(
        "*",
        (F.col("recency_days").cast("double") <= F.col("r_med")).alias("recent"),
        (F.col("frequency").cast("double") > F.col("f_med")).alias("frequent"),
        (F.col("monetary_cents").cast("double") > F.col("m_med")).alias("big_spender"),
    )
    segment = (
        F.when(F.col("recent") & F.col("frequent") & F.col("big_spender"), "champion")
        .when(F.col("recent") & (F.col("frequent") | F.col("big_spender")), "loyal")
        .when(~F.col("recent") & (F.col("frequent") | F.col("big_spender")), "at_risk")
        .when(F.col("recent"), "new")
        .otherwise("hibernating")
    )
    return seg.groupBy(segment.alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("monetary_cents").cast("long").alias("segment_cents"),
        F.min("recency_days").cast("long").alias("min_recency_days"),
        F.max("recency_days").cast("long").alias("max_recency_days"),
    )
