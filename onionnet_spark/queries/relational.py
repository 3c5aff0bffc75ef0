"""Relational analytics queries (SURVEY §2 #34-40): TPC-H classics,
as-of join, rollup, top-k per group. These are the bench headliners.

Float policy: money sums ROUND(2), averages ROUND(6) on both sides;
raw column values pass through un-rounded (no arithmetic => exact).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from onionnet_spark.operators.joins import asof_join
from onionnet_spark.queries import register
from onionnet_spark.sources.tpch_graph import load_tables


@register(
    "tpch_q1",
    """SELECT l_returnflag, l_linestatus,
      ROUND(SUM(l_quantity), 2) AS sum_qty,
      ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      ROUND(AVG(l_quantity), 6) AS avg_qty,
      ROUND(AVG(l_extendedprice), 6) AS avg_price,
      ROUND(AVG(l_discount), 6) AS avg_disc,
      CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus""",
)
def tpch_q1(spark, sf_dir):
    li = load_tables(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q3",
    """SELECT o.o_orderkey,
      ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
      o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '2000-03-15'
      AND l.l_shipdate > TIMESTAMP '2000-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10""",
)
def tpch_q3(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("2000-03-15").cast("timestamp")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5",
    """SELECT n.n_name,
      ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name""",
)
def tpch_q5(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(
            F.broadcast(t["region"]).filter(F.col("r_name") == "ASIA"),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q6",
    """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24""",
)
def tpch_q6(spark, sf_dir):
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@register(
    "asof_join",
    """WITH p AS (
      SELECT user_id, ts, MAX(event_id) AS purchase_event_id
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    ),
    c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, c.ts,
           p.purchase_event_id, p.ts AS purchase_ts
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts""",
)
def asof_join_q(spark, sf_dir):
    ev = load_tables(spark, sf_dir)["events"]
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_event_id"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["purchase_event_id"],
        suffix="_p",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("purchase_event_id_p").alias("purchase_event_id"),
        F.col("ts_p").alias("purchase_ts"),
    )


@register(
    "rollup_revenue",
    """SELECT r.r_name, n.n_name,
      ROUND(SUM(o.o_totalprice), 2) AS revenue,
      CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)""",
)
def rollup_revenue(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(t["region"]), F.col("r_regionkey") == F.col("n_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "topk_per_group",
    """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INT) AS rank
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3""",
)
def topk_per_group(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rank")
    )


@register(
    "tpch_q10",
    """SELECT c.c_custkey, c.c_name,
      ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
      c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20""",
)
def tpch_q10(spark, sf_dir):
    """Returned-item reporting (TPC-H Q10 shape): big fact join,
    broadcast dims, top-20 by revenue."""
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"].filter(F.col("l_returnflag") == "R")
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@register(
    "tpch_q18",
    """WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice""",
)
def tpch_q18(spark, sf_dir):
    """Large-volume customers (TPC-H Q18 shape): semi-join against a
    HAVING-filtered aggregate of the same fact table."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big, on="l_orderkey", how="left_semi")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty",
        )
    )


@register(
    "tpch_q7",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
      CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(18, 4))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_name <> n2.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year""",
)
def tpch_q7(spark, sf_dir):
    """Volume shipping (TPC-H Q7 shape): cross-nation trade flows by
    ship year. The two nation lookups are independent broadcast joins
    (25 rows each); the only shuffles are the two fact-fact joins and
    the final aggregation.

    Revenue accumulates in DECIMAL(18,4): price/discount are 2-decimal,
    so the per-row product is exact at 4 decimals — decimal accumulation
    is order-independent and identical across engines, where double sums
    can land a cent apart on half-cent rounding boundaries."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("supp_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("cust_nationkey"),
        F.col("n_name").alias("cust_nation"),
    )
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("supp_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("cust_nationkey") == F.col("c_nationkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q14",
    """SELECT ROUND(
      100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                       THEN l.l_extendedprice * (1 - l.l_discount)
                       ELSE 0 END)
      / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'""",
)
def tpch_q14(spark, sf_dir):
    """Promotion effect (TPC-H Q14 shape): conditional aggregation over
    a fact-dim join. One month of lineitem is filtered before the join
    (pushdown), so the part join sees only the slice."""
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_revenue")
        )
    )


@register(
    "events_range_count",
    """WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_prior_10m
    FROM p LEFT JOIN events e
      ON e.user_id = p.user_id
     AND e.ts >= p.ts - INTERVAL 10 MINUTE
     AND e.ts < p.ts
    GROUP BY p.event_id, p.user_id, p.ts""",
)
def events_range_count(spark, sf_dir):
    """Banded range join: per purchase, same-user activity in the
    trailing 10 minutes (the interval/theta-join shape, planned as an
    equi-join on (key, time-bucket))."""
    from onionnet_spark.operators.joins import range_join_count

    ev = load_tables(spark, sf_dir)["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return range_join_count(
        purchases, ev, on=["user_id"], left_ts="ts", right_ts="ts",
        window_seconds=600, count_col="n_prior_10m",
    )


@register(
    "tpch_q4",
    """SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority""",
)
def tpch_q4(spark, sf_dir):
    """Order-priority checking (TPC-H Q4 shape): EXISTS subquery as a
    LEFT SEMI join — the semi side never multiplies rows, so the
    count is per-order regardless of lineitem fan-out. The slim test
    schema has no l_commitdate/l_receiptdate; l_returnflag = 'R'
    stands in as the EXISTS predicate (same plan shape: filtered
    semi-join into a single aggregation)."""
    t = load_tables(spark, sf_dir)
    flagged = t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(flagged, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q12",
    """SELECT l.l_linestatus,
      CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus""",
)
def tpch_q12(spark, sf_dir):
    """Shipping-priority split (TPC-H Q12 shape): fact-fact equi-join
    with a conditional two-way count. The slim schema has no
    l_shipmode, so l_linestatus is the grouping dimension; the
    conditional-aggregation plan shape (one join, CASE sums folded
    into a single agg) is identical."""
    t = load_tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "tpch_q13",
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count""",
)
def tpch_q13(spark, sf_dir):
    """Customer order-count distribution (TPC-H Q13): LEFT OUTER join
    with the filter INSIDE the join condition (a post-join filter
    would silently drop order-less customers), then a two-level
    aggregation. First agg shuffles on c_custkey, second on the tiny
    c_count domain."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q19",
    """SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 40)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 50)""",
)
def tpch_q19(spark, sf_dir):
    """Discounted revenue (TPC-H Q19 shape): disjunctive (OR-of-ANDs)
    predicates across a fact-dim join. Catalyst splits the
    conjunction-in-common (p_partkey equi-key) from the residual OR
    filter, broadcasts the part side, and pushes the single-table
    conjuncts (p_brand/p_size per branch) into the part scan. Slim
    schema: brand/size/quantity triples replace brand/container/
    quantity."""
    t = load_tables(spark, sf_dir)
    br = lambda b, s_lo, s_hi, q_lo, q_hi: (
        (F.col("p_brand") == b)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(br("Brand#1", 1, 15, 1, 30) | br("Brand#2", 10, 30, 10, 40) | br("Brand#3", 20, 50, 20, 50))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q2",
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
      FROM ps
      JOIN part p ON p.p_partkey = ps.l_partkey
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_size BETWEEN 10 AND 20
        AND p.p_type = 'STANDARD')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name FROM (
      SELECT *, MIN(s_acctbal) OVER (PARTITION BY p_partkey) AS mn FROM cand)
    WHERE s_acctbal = mn
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100""",
)
def tpch_q2(spark, sf_dir):
    """Minimum-cost supplier (TPC-H Q2 shape): the correlated MIN
    subquery becomes a window MIN over the candidate set — one
    shuffle on p_partkey instead of an aggregate + re-join. The slim
    schema has no partsupp, so distinct (partkey, suppkey) pairs
    observed in lineitem stand in for it and s_acctbal for
    ps_supplycost. Dimension joins (part/supplier/nation/region) all
    broadcast; only the window shuffles."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    pairs = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    cand = (
        pairs.join(
            F.broadcast(
                t["part"].filter(
                    F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("mn", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("mn"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "tpch_q8",
    """SELECT o_year,
      ROUND(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
            / SUM(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01')
    GROUP BY o_year""",
)
def tpch_q8(spark, sf_dir):
    """National market share (TPC-H Q8): NATION_5's share of ECONOMY-
    part revenue delivered into EUROPE-region customers, by order
    year. Seven-way star join — every dimension side broadcasts, the
    two fact tables (lineitem, orders) hash-join once, and the
    conditional share is one CASE-sum over the final two-row agg."""
    t = load_tables(spark, sf_dir)
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat = t["nation"]
    joined = (
        t["lineitem"]
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "ECONOMY")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey"))),
            F.col("cn_key") == F.col("c_nationkey"),
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("cn_rkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
            F.col("sn_key") == F.col("s_nationkey"),
        )
    )
    return (
        joined.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0.0)))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9",
    """SELECT n.n_name AS nation,
      CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
      CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                - 0.5 * p.p_retailprice * l.l_quantity
                AS DECIMAL(18, 4))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, o_year""",
)
def tpch_q9(spark, sf_dir):
    """Product-type profit (TPC-H Q9 shape): profit per supplier
    nation per order year over name-matched parts. The slim schema
    has no ps_supplycost, so cost is modeled as 0.5 * p_retailprice *
    quantity — same plan shape: LIKE-filtered part dim broadcast into
    the fact join, nation/supplier dims broadcast, one final agg on
    the small (nation, year) domain. Profit accumulates in
    DECIMAL(18,4) (exact per-row at 4 dp) so cent rounding cannot
    drift with engine summation order — same policy as q7/q14."""
    t = load_tables(spark, sf_dir)
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%widget%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q11",
    """WITH val AS (
      SELECT l.l_partkey AS part_key, SUM(l.l_extendedprice) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey)
    SELECT part_key, ROUND(value, 2) AS value
    FROM val
    WHERE value > (SELECT SUM(value) * 0.002 FROM val)""",
)
def tpch_q11(spark, sf_dir):
    """Important stock identification (TPC-H Q11 shape): per-part
    value restricted to one nation's suppliers, kept only where the
    part exceeds a fraction of the nation-wide total — the
    HAVING-vs-global-scalar-subquery shape. The scalar total is a
    1-row broadcast crossJoin, not a collect; the per-part agg
    shuffles once on l_partkey. partsupp is modeled by lineitem
    (value = extended price shipped)."""
    t = load_tables(spark, sf_dir)
    val = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_3")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .groupBy(F.col("l_partkey").alias("part_key"))
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    total = val.agg((F.sum("value") * 0.002).alias("threshold"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("part_key", F.round("value", 2).alias("value"))
    )


@register(
    "tpch_q15",
    """WITH rev AS (
      SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, ROUND(r.total_rev, 2) AS total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)""",
)
def tpch_q15(spark, sf_dir):
    """Top supplier (TPC-H Q15): quarterly revenue per supplier, keep
    the max — the reference view + scalar-MAX-subquery shape. The
    revenue agg shuffles once on l_suppkey; the scalar max is a 1-row
    broadcast; supplier names broadcast-join onto the (usually
    single-row) winner."""
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", F.round("total_rev", 2).alias("total_revenue"))
    )


@register(
    "tpch_q16",
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
      CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size""",
)
def tpch_q16(spark, sf_dir):
    """Parts/supplier relationship (TPC-H Q16 shape): distinct
    supplier count per (brand, type, size) bucket, excluding a
    NOT-IN supplier set (complaints in the reference; negative
    account balance here). NOT IN over a non-nullable key is a
    broadcast LEFT ANTI join; the part dim broadcasts; the count-
    distinct shuffles on the grouping key with partial aggregation."""
    t = load_tables(spark, sf_dir)
    pairs = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        pairs.join(
            F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti"
        )
        .join(
            F.broadcast(
                t["part"].filter(
                    (F.col("p_brand") != "Brand#1")
                    & (F.col("p_type") != "PROMO")
                    & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17",
    """WITH pq AS (
      SELECT l_partkey AS pq_key, AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.pq_key = l.l_partkey
    WHERE p.p_brand = 'Brand#7' AND l.l_quantity < 0.2 * pq.avg_qty""",
)
def tpch_q17(spark, sf_dir):
    """Small-quantity-order revenue (TPC-H Q17): the correlated
    per-part AVG subquery becomes an aggregate on l_partkey joined
    back to the fact — the agg output is part-cardinality (small) so
    it broadcasts; no window over the full fact needed. Brand filter
    pushes into the broadcast part dim."""
    t = load_tables(spark, sf_dir)
    pq = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pq_key"))
        .agg(F.avg("l_quantity").alias("avg_qty"))
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_brand") == "Brand#7")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(pq), F.col("pq_key") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "tpch_q20",
    """WITH red_qty AS (
      SELECT l.l_suppkey, SUM(l.l_quantity) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'red%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l.l_suppkey)
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_1'
      AND s.s_suppkey IN (SELECT l_suppkey FROM red_qty WHERE qty > 50)""",
)
def tpch_q20(spark, sf_dir):
    """Potential part promotion (TPC-H Q20 shape): suppliers in one
    nation who moved more than a threshold quantity of name-matched
    parts in a year — the nested-IN chain becomes a LEFT SEMI join
    onto a filtered aggregate. The part dim broadcasts into the fact
    scan; the per-supplier agg is 100 rows, so the semi side
    broadcasts too."""
    t = load_tables(spark, sf_dir)
    red_qty = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_1")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(
            F.broadcast(red_qty),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )


@register(
    "tpch_q21",
    """WITH per AS (
      SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS my_max
      FROM lineitem GROUP BY l_orderkey, l_suppkey),
    w AS (
      SELECT l_orderkey, l_suppkey, my_max,
        COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
        MAX(my_max) OVER (PARTITION BY l_orderkey) AS omax
      FROM per),
    w2 AS (
      SELECT *, SUM(CASE WHEN my_max = omax THEN 1 ELSE 0 END)
                  OVER (PARTITION BY l_orderkey) AS n_ach
      FROM w)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM w2 JOIN supplier s ON s.s_suppkey = w2.l_suppkey
    WHERE n_supp >= 2 AND my_max = omax AND n_ach = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20""",
)
def tpch_q21(spark, sf_dir):
    """Suppliers who kept orders waiting (TPC-H Q21 shape): in
    multi-supplier orders, the unique supplier whose latest line
    shipped last. The EXISTS (another supplier) and NOT EXISTS
    (another supplier shipping later) pair becomes two window
    aggregates over the same l_orderkey partition — one shuffle, no
    self-joins. The slim schema has no commit/receipt dates, so
    'kept waiting' = strictly-latest ship date."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    per = (
        t["lineitem"]
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("my_max"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        per.withColumn("n_supp", F.count("*").over(w))
        .withColumn("omax", F.max("my_max").over(w))
        .withColumn(
            "n_ach",
            F.sum(F.when(F.col("my_max") == F.col("omax"), 1).otherwise(0)).over(w),
        )
        .filter(
            (F.col("n_supp") >= 2)
            & (F.col("my_max") == F.col("omax"))
            & (F.col("n_ach") == 1)
        )
    )
    return (
        flagged.join(
            F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "tpch_q22",
    """WITH in_scope AS (
      SELECT c.c_custkey, c.c_acctbal,
        CAST(REPLACE(n.n_name, 'NATION_', '') AS INTEGER) AS cntrycode
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE CAST(REPLACE(n.n_name, 'NATION_', '') AS INTEGER)
            IN (1, 3, 5, 7, 9, 11, 13)),
    avg_bal AS (
      SELECT AVG(c_acctbal) AS ab FROM in_scope WHERE c_acctbal > 0)
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
      ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM in_scope, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = in_scope.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY cntrycode""",
)
def tpch_q22(spark, sf_dir):
    """Global sales opportunity (TPC-H Q22 shape): rich (above the
    positive-balance average) customers in selected countries with no
    recent orders. Country code = numeric nation suffix (the slim
    schema has no c_phone); 'no orders' is restricted to recent
    orders so the anti-join side is non-trivial. Scalar AVG is a
    1-row broadcast; NOT EXISTS is a LEFT ANTI join on o_custkey."""
    t = load_tables(spark, sf_dir)
    code = F.regexp_replace("n_name", "NATION_", "").cast("int")
    in_scope = (
        t["customer"]
        .join(
            F.broadcast(t["nation"].withColumn("cntrycode", code)),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .filter(F.col("cntrycode").isin(1, 3, 5, 7, 9, 11, 13))
        .select("c_custkey", "c_acctbal", "cntrycode")
    )
    avg_bal = in_scope.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        in_scope.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "cube_revenue",
    """SELECT o_orderpriority, o_orderstatus,
      ROUND(SUM(o_totalprice), 2) AS revenue,
      CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)""",
)
def cube_revenue(spark, sf_dir):
    """CUBE sibling of rollup_revenue: all 2^2 grouping sets in one
    Expand + one shuffled aggregation (no join: pure fact-side)."""
    return (
        load_tables(spark, sf_dir)["orders"]
        .cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "fuzzy_name_pairs",
    """WITH c AS (
      SELECT c_custkey AS id, c_name AS name,
             substring(c_name, 1, greatest(length(c_name) - 2, 1)) AS blk
      FROM customer
    )
    SELECT a.id AS id_a, b.id AS id_b,
           a.name AS val_a, b.name AS val_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS edit_dist
    FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
    WHERE levenshtein(a.name, b.name) <= 1""",
)
def fuzzy_name_pairs(spark, sf_dir):
    """Blocked fuzzy self-linkage over customer names: prefix block
    (all but the last 2 chars), exact Levenshtein <= 1 verify."""
    from onionnet_spark.operators.joins import fuzzy_self_pairs

    return fuzzy_self_pairs(
        load_tables(spark, sf_dir)["customer"],
        col="c_name",
        id_col="c_custkey",
        max_dist=1,
        block_suffix_len=2,
    )


@register(
    "sorted_neighborhood_pairs",
    # the oracle ranks with ONE window (fine at oracle scale); the
    # Spark side must reproduce the identical pair set from the
    # two-phase global_rank + bucket-adjacency join — the hash match
    # proves the distributed rank and the +/-1 bucket probe lossless
    """WITH c AS (
      SELECT c_custkey AS id, c_name AS val,
             ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS rnk
      FROM customer
    )
    SELECT a.id AS id_a, b.id AS id_b, a.val AS val_a, b.val AS val_b,
           CAST(ABS(a.rnk - b.rnk) AS INT) AS rank_gap,
           CAST(levenshtein(a.val, b.val) AS INT) AS edit_dist
    FROM c a JOIN c b
      ON b.rnk BETWEEN a.rnk - 5 AND a.rnk + 5 AND a.id < b.id
    WHERE levenshtein(a.val, b.val) <= 2""",
)
def sorted_neighborhood_q(spark, sf_dir):
    """Sorted-neighborhood entity resolution over customer names:
    rank-adjacent candidates (window 5) + Levenshtein <= 2 verify —
    the blocking strategy that catches prefix-divergent near-dups."""
    from onionnet_spark.operators.joins import sorted_neighborhood_pairs

    return sorted_neighborhood_pairs(
        load_tables(spark, sf_dir)["customer"],
        col="c_name",
        id_col="c_custkey",
        window=5,
        max_dist=2,
    )


def _baskets(spark, sf_dir):
    """Per-order sorted distinct item arrays in ONE exchange (r11,
    guide §2.3/§2.4): groupBy(ok) + collect_set dedups (ok, pk) inside
    the same aggregation that used to need a separate distinct
    exchange, and pair/triple candidates are then generated JOIN-FREE
    from array combinations — the within-order self-join (an exchange
    of the item table per side plus the join itself) disappears.
    TPC-H baskets are <= 7 items, so the per-row combination arrays
    are tiny; at corpus scale cap basket size upstream (the documented
    basket_pairs caveat) so one row's combinations stay bounded."""
    return (
        load_tables(spark, sf_dir)["lineitem"]
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .groupBy("ok")
        .agg(F.sort_array(F.collect_set("pk")).alias("items"))
    )


# ordered combinations from the sorted `items` array: transform index
# args are 0-based, slice() is 1-based, so slice(items, i + 2, ...)
# starts just past element i — every emitted struct has a < b (< c)
# by the array's ascending sort.
_BASKET_PAIR_EXPR = (
    "flatten(transform(items, (x, i) -> "
    "transform(slice(items, i + 2, size(items)), "
    "y -> struct(x AS pa, y AS pb))))"
)
_BASKET_TRIPLE_EXPR = (
    "flatten(flatten(transform(items, (x, i) -> "
    "transform(slice(items, i + 2, size(items)), (y, j) -> "
    "transform(slice(items, i + j + 3, size(items)), "
    "z -> struct(x AS a, y AS b, z AS c))))))"
)


@register(
    "basket_triples",
    # the oracle counts triples DIRECTLY from the definition; the
    # Spark side runs the real A-priori pruned plan (candidates only
    # from frequent sub-pairs) — the hash match proves the pruning
    # lossless, the same proof style as skjoin/skyline
    """WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    tri AS (
      SELECT a.pk AS part_a, b.pk AS part_b, c.pk AS part_c,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM items a
      JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      JOIN items c ON b.ok = c.ok AND b.pk < c.pk
      GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
    )
    SELECT part_a, part_b, part_c, support, CAST(rn AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY support DESC, part_a, part_b, part_c) AS rn
      FROM tri)
    WHERE rn <= 50""",
)
def basket_triples(spark, sf_dir):
    """A-priori level-3 frequent itemsets: candidate triples built
    ONLY from frequent sub-pairs (the classic downward-closure
    prune), then counted and ranked. The per-order pair table is
    semi-joined against the frequent-pair list BEFORE the triple
    join, so candidate volume is governed by frequent pairs, not
    basket-size cubed.

    Kept on the checkpointed-item self-join shape after an r11 A/B:
    both the pure array-combination rewrite (all C(n,3) candidates
    exploded, then pruned — med 1.0s vs 0.86s) and the hybrid
    (array-generated pair table feeding the same pruned chain)
    measured consistently SLOWER than this shape at sf0.1 — the
    checkpointed distinct item table amortizes across the two
    consumers while the collect_set basket build does not."""
    from pyspark.sql import Window

    items = (
        load_tables(spark, sf_dir)["lineitem"]
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
        .localCheckpoint()
    )
    op = (
        items.alias("a")
        .join(items.alias("b"), on="ok")
        .filter(F.col("a.pk") < F.col("b.pk"))
        .select("ok", F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
    )
    fp = (
        op.groupBy("pa", "pb")
        .agg(F.count("*").alias("s"))
        .filter(F.col("s") >= 2)
        .select("pa", "pb")
        .localCheckpoint()
    )
    fop = op.join(fp, on=["pa", "pb"], how="left_semi")
    tri = (
        fop.select("ok", F.col("pa").alias("a"), F.col("pb").alias("b"))
        .join(
            fop.select(
                "ok", F.col("pa").alias("b"), F.col("pb").alias("c")
            ),
            on=["ok", "b"],
        )
        .join(
            fp.select(F.col("pa").alias("a"), F.col("pb").alias("c")),
            on=["a", "c"],
            how="left_semi",
        )
        .groupBy(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            F.col("c").alias("part_c"),
        )
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= 2)
    )
    # unpartitioned Window is BOUNDED: ranks the post-limit(50) frame
    w = Window.orderBy(
        F.col("support").desc(), "part_a", "part_b", "part_c"
    )
    return (
        tri.orderBy(F.col("support").desc(), "part_a", "part_b", "part_c")
        .limit(50)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


@register(
    "basket_pairs",
    # market-basket co-occurrence: parts ordered together, support
    # >= 3, top-100 by support (deterministic tie-break)
    """WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
      HAVING COUNT(*) >= 3
    )
    SELECT part_a, part_b, support, CAST(rn AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY support DESC, part_a, part_b) AS rn
      FROM pairs)
    WHERE rn <= 100""",
)
def basket_pairs(spark, sf_dir):
    """A-priori level-2 co-occurrence: per-order item arrays, pair
    combinations exploded join-free (r11 — was a within-order
    self-join), support filter, global top-k. Scale: the combination
    fan-out is quadratic in BASKET size, not order count — cap basket
    size upstream for pathological carts; the support HAVING prunes
    before the top-k."""
    from pyspark.sql import Window

    pairs = (
        _baskets(spark, sf_dir)
        .select(F.explode(F.expr(_BASKET_PAIR_EXPR)).alias("p"))
        .groupBy(
            F.col("p.pa").alias("part_a"), F.col("p.pb").alias("part_b")
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 3)
    )
    # unpartitioned Window is BOUNDED: it ranks the post-limit(100)
    # frame, never the full pair table
    w = Window.orderBy(F.col("support").desc(), "part_a", "part_b")
    return (
        pairs.orderBy(F.col("support").desc(), "part_a", "part_b")
        .limit(100)
        .withColumn("rank", F.row_number().over(w))
    )


@register(
    "rfm_segments",
    """WITH rfm AS (
      SELECT c_custkey,
             MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             ROUND(SUM(o_totalprice), 2) AS monetary
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY 1
    ),
    cuts AS (
      SELECT quantile_cont(epoch(last_order), [0.2, 0.4, 0.6, 0.8]) AS rc,
             quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fc,
             quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mc
      FROM rfm
    )
    SELECT c_custkey, last_order, frequency, monetary,
      CAST(1 + (epoch(last_order) > rc[1])::INT + (epoch(last_order) > rc[2])::INT
             + (epoch(last_order) > rc[3])::INT + (epoch(last_order) > rc[4])::INT
           AS INT) AS r_score,
      CAST(1 + (frequency > fc[1])::INT + (frequency > fc[2])::INT
             + (frequency > fc[3])::INT + (frequency > fc[4])::INT AS INT) AS f_score,
      CAST(1 + (monetary > mc[1])::INT + (monetary > mc[2])::INT
             + (monetary > mc[3])::INT + (monetary > mc[4])::INT AS INT) AS m_score
    FROM rfm CROSS JOIN cuts""",
)
def rfm_segments(spark, sf_dir):
    """RFM customer segmentation via quintile CUT-POINTS: exact
    interpolated percentiles (one 1-row aggregate, broadcast back)
    bucket each metric by comparison — fully distributed, unlike the
    textbook NTILE formulation whose global window forces every row
    into a single task. Ties at a cut fall to the lower bucket on
    both engines; at 100 TB the drop-in is approx_percentile for the
    cut-point aggregate (same shape, sketch-merged)."""
    t = load_tables(spark, sf_dir)
    rfm = (
        t["orders"]
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .withColumn("rec", F.unix_timestamp("last_order").cast("double"))
    )
    cuts = rfm.agg(
        F.expr("percentile(rec, array(0.2, 0.4, 0.6, 0.8))").alias("rc"),
        F.expr("percentile(frequency, array(0.2, 0.4, 0.6, 0.8))").alias("fc"),
        F.expr("percentile(monetary, array(0.2, 0.4, 0.6, 0.8))").alias("mc"),
    )

    def score(v, cut_col):
        e = F.lit(1)
        for k in range(1, 5):
            e = e + F.when(v > F.element_at(F.col(cut_col), k), 1).otherwise(0)
        return e.cast("int")

    return (
        rfm.crossJoin(F.broadcast(cuts))
        .select(
            "c_custkey",
            "last_order",
            "frequency",
            "monetary",
            score(F.col("rec"), "rc").alias("r_score"),
            score(F.col("frequency").cast("double"), "fc").alias("f_score"),
            score(F.col("monetary"), "mc").alias("m_score"),
        )
    )


@register(
    "price_histogram",
    """WITH b AS (
      SELECT CAST(MIN(l_extendedprice) AS DOUBLE) AS lo,
             CAST(MAX(l_extendedprice) AS DOUBLE) AS hi
      FROM lineitem
    )
    SELECT bucket,
           ROUND(lo + bucket * (hi - lo) / 10, 6) AS bucket_lo,
           ROUND(lo + (bucket + 1) * (hi - lo) / 10, 6) AS bucket_hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT LEAST(CAST(floor((CAST(l_extendedprice AS DOUBLE) - lo)
                   / ((hi - lo) / 10)) AS INT), 9) AS bucket, lo, hi
      FROM lineitem CROSS JOIN b)
    GROUP BY bucket, lo, hi""",
)
def price_histogram(spark, sf_dir):
    from onionnet_spark.functions.corpus import numeric_histogram

    return numeric_histogram(
        load_tables(spark, sf_dir)["lineitem"], "l_extendedprice", n_buckets=10
    )


@register(
    "numeric_histogram_bounded",
    # explicit [10, 40] bounds on l_quantity (values run 1..50):
    # out-of-range rows are EXCLUDED (ADVICE r2 contract fix), value
    # 40 folds closed-right into the top bucket
    """SELECT bucket,
           ROUND(10 + bucket * 5.0, 6) AS bucket_lo,
           ROUND(10 + (bucket + 1) * 5.0, 6) AS bucket_hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT GREATEST(0, LEAST(CAST(floor(
               (CAST(l_quantity AS DOUBLE) - 10) / 5.0) AS INT), 5)) AS bucket
      FROM lineitem
      WHERE CAST(l_quantity AS DOUBLE) BETWEEN 10 AND 40)
    GROUP BY bucket""",
)
def numeric_histogram_bounded(spark, sf_dir):
    from onionnet_spark.functions.corpus import numeric_histogram

    return numeric_histogram(
        load_tables(spark, sf_dir)["lineitem"], "l_quantity",
        n_buckets=6, lo=10, hi=40,
    )


def _corr_nulls_oracle() -> str:
    """Pairwise-deletion Pearson over columns with injected NULLs:
    q = l_quantity (never NULL), p = l_extendedprice NULLed where
    l_partkey % 7 = 0, d = l_discount NULLed where l_orderkey % 5 = 0.
    Each pair's six statistics accumulate over ITS complete rows."""
    cols = {"q": "l_quantity", "p": "l_extendedprice", "d": "l_discount"}
    conds = {
        ("q", "p"): "l_partkey % 7 <> 0",
        ("q", "d"): "l_orderkey % 5 <> 0",
        ("p", "d"): "l_partkey % 7 <> 0 AND l_orderkey % 5 <> 0",
    }
    ctes, selects = [], []
    for (a, b), cond in conds.items():
        ca = f"CAST({cols[a]} AS DECIMAL(19,6))"
        cb = f"CAST({cols[b]} AS DECIMAL(19,6))"
        ctes.append(
            f"""s_{a}{b} AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM({ca}) AS DOUBLE) AS sa, CAST(SUM({cb}) AS DOUBLE) AS sb,
        CAST(SUM({ca} * {ca}) AS DOUBLE) AS qa,
        CAST(SUM({cb} * {cb}) AS DOUBLE) AS qb,
        CAST(SUM({ca} * {cb}) AS DOUBLE) AS x
      FROM lineitem WHERE {cond})"""
        )
        selects.append(
            f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
      CASE WHEN (n*qa - sa*sa) > 0 AND (n*qb - sb*sb) > 0
           THEN ROUND((n*x - sa*sb) / sqrt((n*qa - sa*sa) * (n*qb - sb*sb)), 6)
      END AS r FROM s_{a}{b}"""
        )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + "\n    UNION ALL ".join(selects)


@register("column_correlations_nulls", _corr_nulls_oracle())
def column_correlations_nulls(spark, sf_dir):
    from onionnet_spark.functions.corpus import column_correlations

    li = load_tables(spark, sf_dir)["lineitem"]
    df = li.select(
        F.col("l_quantity").alias("q"),
        F.when(F.col("l_partkey") % 7 != 0, F.col("l_extendedprice")).alias("p"),
        F.when(F.col("l_orderkey") % 5 != 0, F.col("l_discount")).alias("d"),
    )
    return column_correlations(df, ["q", "p", "d"])


@register(
    "lineitem_correlations",
    """WITH s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS s_q,
        CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
               * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS q_q,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS s_p,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))
               * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS q_p,
        CAST(SUM(CAST(l_discount AS DECIMAL(19,6))) AS DOUBLE) AS s_d,
        CAST(SUM(CAST(l_discount AS DECIMAL(19,6))
               * CAST(l_discount AS DECIMAL(19,6))) AS DOUBLE) AS q_d,
        CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
               * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS x_qp,
        CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
               * CAST(l_discount AS DECIMAL(19,6))) AS DOUBLE) AS x_qd,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))
               * CAST(l_discount AS DECIMAL(19,6))) AS DOUBLE) AS x_pd
      FROM lineitem
    )
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           CASE WHEN (n*q_q - s_q*s_q) > 0 AND (n*q_p - s_p*s_p) > 0
                THEN ROUND((n*x_qp - s_q*s_p)
                     / sqrt((n*q_q - s_q*s_q) * (n*q_p - s_p*s_p)), 6)
           END AS r
    FROM s
    UNION ALL
    SELECT 'l_quantity', 'l_discount',
           CASE WHEN (n*q_q - s_q*s_q) > 0 AND (n*q_d - s_d*s_d) > 0
                THEN ROUND((n*x_qd - s_q*s_d)
                     / sqrt((n*q_q - s_q*s_q) * (n*q_d - s_d*s_d)), 6)
           END
    FROM s
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount',
           CASE WHEN (n*q_p - s_p*s_p) > 0 AND (n*q_d - s_d*s_d) > 0
                THEN ROUND((n*x_pd - s_p*s_d)
                     / sqrt((n*q_p - s_p*s_p) * (n*q_d - s_d*s_d)), 6)
           END
    FROM s""",
)
def lineitem_correlations(spark, sf_dir):
    from onionnet_spark.functions.corpus import column_correlations

    return column_correlations(
        load_tables(spark, sf_dir)["lineitem"],
        ["l_quantity", "l_extendedprice", "l_discount"],
    )


@register(
    "revenue_gini",
    """WITH rev AS (
      SELECT o_custkey AS c, CAST(ROUND(SUM(o_totalprice), 2)
             AS DECIMAL(19,2)) AS x
      FROM orders GROUP BY 1
    ),
    rk AS (
      SELECT c, x, ROW_NUMBER() OVER (ORDER BY x, c) AS rn FROM rev
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(rn * x) AS DOUBLE) AS srx,
             CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM rk
    )
    SELECT n_customers,
           ROUND(2 * srx / (n * sx) - (n + 1) / n, 6) AS gini
    FROM s""",
)
def revenue_gini(spark, sf_dir):
    """Gini coefficient of per-customer revenue — revenue
    concentration. The rank comes from `global_rank` (bucketed
    two-phase), so no global window anywhere; all sums accumulate as
    exact DECIMAL before one double combination."""
    from onionnet_spark.functions.corpus import global_rank

    rev = (
        load_tables(spark, sf_dir)["orders"]
        .groupBy(F.col("o_custkey").alias("c"))
        .agg(F.round(F.sum("o_totalprice"), 2).cast("decimal(19,2)").alias("x"))
    )
    ranked = global_rank(rev, "x", "c", n_buckets=16, rank_col="rn")
    s = ranked.agg(
        F.count("*").alias("n_customers"),
        F.sum("x").alias("sx"),
        F.sum(F.col("rn") * F.col("x")).alias("srx"),
    )
    n = F.col("n_customers").cast("double")
    return s.select(
        F.col("n_customers").cast("bigint").alias("n_customers"),
        F.round(
            2.0 * F.col("srx").cast("double") / (n * F.col("sx").cast("double"))
            - (n + 1.0) / n,
            6,
        ).alias("gini"),
    )


@register(
    "revenue_lorenz",
    """WITH rev AS (
      SELECT o_custkey AS c,
             CAST(ROUND(SUM(o_totalprice), 2) AS DECIMAL(19,2)) AS x
      FROM orders GROUP BY 1
    ),
    rk AS (SELECT c, x, ROW_NUMBER() OVER (ORDER BY x, c) AS rn,
                  COUNT(*) OVER () AS n FROM rev),
    dec AS (
      SELECT CAST(ceil(rn * 10.0 / n) AS INT) AS decile,
             CAST(SUM(x) AS DECIMAL(28,2)) AS dx
      FROM rk GROUP BY 1
    )
    SELECT decile,
           ROUND(CAST(SUM(dx) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / CAST((SELECT SUM(x) FROM rev) AS DOUBLE), 6)
             AS cum_share
    FROM dec""",
)
def revenue_lorenz(spark, sf_dir):
    """Lorenz curve deciles of customer revenue (the curve whose
    area gap is `revenue_gini`): customers ranked by revenue via
    the distributed `global_rank`, bucketed into deciles, cumulative
    revenue share per decile from exact DECIMAL sums. The cumulative
    window runs over the 10-row decile table — never the data."""
    from pyspark.sql import Window

    from onionnet_spark.functions.corpus import global_rank

    rev = (
        load_tables(spark, sf_dir)["orders"]
        .groupBy(F.col("o_custkey").alias("c"))
        .agg(F.round(F.sum("o_totalprice"), 2).cast("decimal(19,2)").alias("x"))
    )
    ranked = global_rank(rev, "x", "c", n_buckets=16, rank_col="rn")
    n = ranked.count()
    dec = ranked.withColumn(
        "decile", F.ceil(F.col("rn") * 10.0 / n).cast("int")
    ).groupBy("decile").agg(F.sum("x").alias("dx"))
    total = dec.agg(F.sum("dx").alias("tot"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dec.crossJoin(F.broadcast(total))
        .withColumn(
            "cum_share",
            F.round(
                F.sum("dx").over(w).cast("double") / F.col("tot").cast("double"),
                6,
            ),
        )
        .select("decile", "cum_share")
    )


@register(
    "orders_custkey_skew",
    """WITH c AS (SELECT CAST(o_custkey AS VARCHAR) AS key,
                         COUNT(*) AS n_rows
                  FROM orders GROUP BY 1),
    t AS (SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM c)
    SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
           ROUND(n_rows * 1.0 / t.total, 6) AS share,
           ROUND(n_rows * 1.0 * t.n_keys / t.total, 6) AS skew_vs_mean
    FROM c, t ORDER BY n_rows DESC, key LIMIT 10""",
)
def orders_custkey_skew_q(spark, sf_dir):
    """Shuffle-key skew diagnostic over the orders->customer join
    key: top-10 hottest keys with share and multiple-of-even-spread.
    The pre-flight report for choosing salting / AQE skew handling."""
    from onionnet_spark.functions.corpus import key_skew_report

    return key_skew_report(
        load_tables(spark, sf_dir)["orders"], "o_custkey", top_n=10
    )


@register(
    "orders_custkey_cms",
    # FULLY-ORACLED sketch: the Count-Min hashes are deterministic
    # (md5 digit-fold, the translate trick — no hex cast in DuckDB),
    # so the oracle rebuilds the identical depth x width sketch and
    # the exact estimates, not just bounds. est >= exact is a CMS
    # invariant the pytest gate asserts on every key.
    """WITH rws AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders),
    ib AS (SELECT k, i.i AS i,
             CAST(translate(substr(md5(CAST(i.i AS VARCHAR) || '|' || k),
                                   1, 6), 'abcdef', '012345') AS INT)
               % 64 AS b
           FROM rws JOIN range(0, 4) i(i) ON true),
    sketch AS MATERIALIZED (
      SELECT i, b, COUNT(*) AS c FROM ib GROUP BY i, b),
    keys_ AS (SELECT k, COUNT(*) AS exact FROM rws GROUP BY k),
    kb AS (SELECT kk.k, kk.exact, i.i AS i,
             CAST(translate(substr(md5(CAST(i.i AS VARCHAR) || '|' || kk.k),
                                   1, 6), 'abcdef', '012345') AS INT)
               % 64 AS b
           FROM keys_ kk JOIN range(0, 4) i(i) ON true)
    SELECT k AS key, CAST(MIN(c) AS BIGINT) AS est,
           CAST(MIN(exact) AS BIGINT) AS exact
    FROM kb JOIN sketch s USING (i, b)
    GROUP BY k ORDER BY est DESC, k LIMIT 20""",
)
def orders_custkey_cms_q(spark, sf_dir):
    """Count-Min heavy hitters over the orders->customer join key:
    the bounded-memory scoreboard that replaces an exact groupBy
    when the key universe doesn't fit (top-20 by estimate, exact
    count alongside for the error audit)."""
    from onionnet_spark.functions.corpus import count_min_topk

    return count_min_topk(
        load_tables(spark, sf_dir)["orders"], "o_custkey",
        depth=4, width=64, k=20,
    )


@register(
    "parts_skyline",
    # The oracle is the DEFINITION (quadratic one-strict dominance);
    # the Spark side is the scale-shaped reduction (per-x min +
    # strictly-decreasing prefix of the bounded series + broadcast
    # frontier join) — the hash match proves the reduction correct.
    """SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_size <= p.p_size AND q.p_retailprice <= p.p_retailprice
        AND (q.p_size < p.p_size OR q.p_retailprice < p.p_retailprice))""",
)
def parts_skyline_q(spark, sf_dir):
    """Pareto frontier of parts minimizing (size, retail price) —
    the multi-criteria shortlist query."""
    from onionnet_spark.functions.corpus import skyline_2d

    return skyline_2d(
        load_tables(spark, sf_dir)["part"],
        "p_size",
        "p_retailprice",
        ["p_partkey", "p_size", "p_retailprice"],
    )


@register(
    "orders_fd_profile",
    # candidate classes: key-determined (o_orderkey -> o_custkey,
    # holds), a genuinely violated wide candidate (o_custkey ->
    # o_orderpriority), and a tiny-determinant violated candidate
    # (o_orderstatus -> o_orderpriority)
    """WITH a1 AS (SELECT o_orderkey AS det, COUNT(DISTINCT o_custkey) AS nd
                  FROM orders GROUP BY 1),
    a2 AS (SELECT o_custkey AS det, COUNT(DISTINCT o_orderpriority) AS nd
           FROM orders GROUP BY 1),
    a3 AS (SELECT o_orderstatus AS det, COUNT(DISTINCT o_orderpriority) AS nd
           FROM orders GROUP BY 1)
    SELECT 'o_orderkey' AS determinant, 'o_custkey' AS dependent,
           CAST(COUNT(*) AS BIGINT) AS n_det_values,
           CAST(SUM(nd) AS BIGINT) AS n_det_dep_pairs,
           CAST(MAX(nd) <= 1 AS BOOLEAN) AS fd_holds,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_values
    FROM a1
    UNION ALL
    SELECT 'o_custkey', 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(nd) AS BIGINT), CAST(MAX(nd) <= 1 AS BOOLEAN),
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
    FROM a2
    UNION ALL
    SELECT 'o_orderstatus', 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(nd) AS BIGINT), CAST(MAX(nd) <= 1 AS BOOLEAN),
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
    FROM a3""",
)
def orders_fd_profile_q(spark, sf_dir):
    """Functional-dependency discovery over orders column pairs —
    the schema-inference profiling primitive (holds / non-key holds /
    violated candidates all exercised)."""
    from onionnet_spark.functions.corpus import fd_profile

    return fd_profile(
        load_tables(spark, sf_dir)["orders"],
        [
            ("o_orderkey", "o_custkey"),
            ("o_custkey", "o_orderpriority"),
            ("o_orderstatus", "o_orderpriority"),
        ],
    )


@register(
    "fk_inclusion_profile",
    # two genuine FKs plus a candidate that genuinely FAILS (TPC-H
    # customers without orders), so both branches of inclusion_holds
    # are exercised
    """SELECT 'lineitem.l_orderkey' AS child, 'orders.o_orderkey' AS parent,
      CAST((SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS BIGINT)
        AS n_child_values,
      CAST((SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey AS v FROM lineitem)
            WHERE v NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT)
        AS n_missing,
      CAST((SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey AS v FROM lineitem)
            WHERE v NOT IN (SELECT o_orderkey FROM orders)) = 0 AS BOOLEAN)
        AS inclusion_holds
    UNION ALL
    SELECT 'orders.o_custkey', 'customer.c_custkey',
      CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT),
      CAST((SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey AS v FROM orders)
            WHERE v NOT IN (SELECT c_custkey FROM customer)) AS BIGINT),
      CAST((SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey AS v FROM orders)
            WHERE v NOT IN (SELECT c_custkey FROM customer)) = 0 AS BOOLEAN)
    UNION ALL
    SELECT 'customer.c_custkey', 'orders.o_custkey',
      CAST((SELECT COUNT(DISTINCT c_custkey) FROM customer) AS BIGINT),
      CAST((SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey AS v FROM customer)
            WHERE v NOT IN (SELECT o_custkey FROM orders)) AS BIGINT),
      CAST((SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey AS v FROM customer)
            WHERE v NOT IN (SELECT o_custkey FROM orders)) = 0 AS BOOLEAN)""",
)
def fk_inclusion_profile_q(spark, sf_dir):
    """Inclusion-dependency (foreign-key) discovery across tables:
    distinct-project + anti-join per candidate — two real FKs and
    one violated direction (customers without orders)."""
    from onionnet_spark.functions.corpus import inclusion_profile

    t = load_tables(spark, sf_dir)
    return inclusion_profile(
        t,
        [
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("customer", "c_custkey", "orders", "o_custkey"),
        ],
    )


@register(
    "lineitem_benford",
    # first digit from the DECIMAL string form (no log10 near a
    # boundary); expected shares are the same 6dp literals the Spark
    # side embeds
    """WITH c AS (
      SELECT CAST(substr(CAST(l_extendedprice AS VARCHAR), 1, 1) AS INT)
               AS digit,
             COUNT(*) AS n
      FROM lineitem WHERE l_extendedprice >= 1 GROUP BY 1),
    t AS (SELECT SUM(n) AS tot FROM c),
    e(digit, expected_share) AS (VALUES
      (1, 0.301030), (2, 0.176091), (3, 0.124939), (4, 0.096910),
      (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
      (9, 0.045757))
    SELECT c.digit, CAST(c.n AS BIGINT) AS n,
           c.n * 1.0 / t.tot AS share,
           CAST(e.expected_share AS DOUBLE) AS expected_share,
           c.n * 1.0 / t.tot - CAST(e.expected_share AS DOUBLE)
             AS deviation
    FROM c JOIN e USING (digit), t""",
)
def lineitem_benford_q(spark, sf_dir):
    """Benford first-digit audit over lineitem extended prices — the
    fraud / synthetic-data smell test (TPC-H prices are uniform-ish,
    so deviations are LARGE, which exercises the comparison)."""
    from onionnet_spark.functions.corpus import benford_profile

    return benford_profile(load_tables(spark, sf_dir)["lineitem"], "l_extendedprice")


@register(
    "orders_price_mad",
    """WITH m AS (SELECT o_orderpriority AS grp,
                        percentile_cont(0.5) WITHIN GROUP
                          (ORDER BY o_totalprice) AS med
                 FROM orders GROUP BY 1)
    SELECT o.o_orderpriority AS grp, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(m.med), 6) AS median,
           ROUND(percentile_cont(0.5) WITHIN GROUP
                   (ORDER BY ABS(o.o_totalprice - m.med)), 6) AS mad
    FROM orders o JOIN m ON m.grp = o.o_orderpriority
    GROUP BY 1""",
)
def orders_price_mad_q(spark, sf_dir):
    """Robust per-group spread: median absolute deviation of order
    totals per priority class."""
    from onionnet_spark.functions.corpus import grouped_mad

    return grouped_mad(
        load_tables(spark, sf_dir)["orders"], "o_orderpriority", "o_totalprice"
    ).withColumnRenamed("o_orderpriority", "grp")


@register(
    "orders_cdc_apply",
    # deterministic changelog derived from the table itself: deletes
    # (key % 10 = 7), updates (% 10 = 3, with a SECOND higher-seq
    # update for % 100 = 3 — last-wins must pick it), and inserts of
    # genuinely new keys; the oracle constructs the final state
    # directly
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderkey % 10 NOT IN (3, 7)
    UNION ALL
    SELECT o_orderkey, o_custkey,
           o_totalprice + CASE WHEN o_orderkey % 100 = 3 THEN 2 ELSE 1 END
    FROM orders WHERE o_orderkey % 10 = 3
    UNION ALL
    SELECT o_orderkey + 100000000, o_custkey, o_totalprice + 5
    FROM orders WHERE o_orderkey % 10 = 1""",
)
def orders_cdc_apply_q(spark, sf_dir):
    """CDC / MERGE INTO apply: fold an I/U/D changelog (with
    multiple changes per key — last sequence wins) onto the orders
    snapshot via one max_by aggregation, no window over the union."""
    from onionnet_spark.operators.timeseries import apply_cdc

    o = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    dels = o.filter(k % 10 == 7).withColumns(
        {"seq": k * 10 + 1, "op": F.lit("D")}
    )
    upd1 = (
        o.filter(k % 10 == 3)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .withColumns({"seq": k * 10 + 1, "op": F.lit("U")})
    )
    upd2 = (
        o.filter(k % 100 == 3)
        .withColumn("o_totalprice", F.col("o_totalprice") + 2)
        .withColumns({"seq": k * 10 + 2, "op": F.lit("U")})
    )
    ins = (
        o.filter(k % 10 == 1)
        .withColumn("o_orderkey", k + 100000000)
        .withColumn("o_totalprice", F.col("o_totalprice") + 5)
        .withColumns({"seq": F.col("o_orderkey") * 10 + 1, "op": F.lit("I")})
    )
    changes = dels.unionByName(upd1).unionByName(upd2).unionByName(ins)
    return apply_cdc(o, changes, "o_orderkey", "seq")


def _zorder_oracle(bits: int = 8) -> str:
    n = 1 << bits
    terms = []
    for j in range(bits):
        terms.append(f"((qx // {1 << j}) % 2) * {1 << (2 * j + 1)}")
        terms.append(f"((qy // {1 << j}) % 2) * {1 << (2 * j)}")
    interleave = " + ".join(terms)
    month = "l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-02-01'"

    def quant(col: str, lo: str, hi: str) -> str:
        return f"""CASE WHEN (b.{hi} - b.{lo}) > 0 THEN
        LEAST({n - 1}, GREATEST(0, CAST(FLOOR(
          (CAST({col} AS DOUBLE) - b.{lo}) / ((b.{hi} - b.{lo}) / {n})
        ) AS INT))) ELSE 0 END"""

    return f"""WITH li AS (SELECT * FROM lineitem WHERE {month}),
    b AS (SELECT MIN(CAST(l_extendedprice AS DOUBLE)) AS lox,
                 MAX(CAST(l_extendedprice AS DOUBLE)) AS hix,
                 MIN(CAST(l_quantity AS DOUBLE)) AS loy,
                 MAX(CAST(l_quantity AS DOUBLE)) AS hiy
          FROM li),
    q AS (SELECT l_orderkey, l_linenumber,
                 {quant("l_extendedprice", "lox", "hix")} AS qx,
                 {quant("l_quantity", "loy", "hiy")} AS qy
          FROM li, b)
    SELECT l_orderkey, l_linenumber,
           CAST({interleave} AS BIGINT) AS zval
    FROM q"""


def _hilbert_oracle(bits: int = 8) -> str:
    """Unrolls the identical rotate/flip rounds as layout.hilbert_key:
    per level, rx/ry are quotient-parity bit tests, the quadrant index
    is the branch-free 3*rx + ry - 2*rx*ry, and the x/y update is the
    arithmetic flip-then-swap — integer-exact in both engines."""
    n = 1 << bits
    month = "l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-02-01'"

    def quant(col: str, lo: str, hi: str) -> str:
        return f"""CASE WHEN (b.{hi} - b.{lo}) > 0 THEN
        LEAST({n - 1}, GREATEST(0, CAST(FLOOR(
          (CAST({col} AS DOUBLE) - b.{lo}) / ((b.{hi} - b.{lo}) / {n})
        ) AS INT))) ELSE 0 END"""

    ctes = [
        f"li AS (SELECT * FROM lineitem WHERE {month})",
        """b AS (SELECT MIN(CAST(l_extendedprice AS DOUBLE)) AS lox,
                 MAX(CAST(l_extendedprice AS DOUBLE)) AS hix,
                 MIN(CAST(l_quantity AS DOUBLE)) AS loy,
                 MAX(CAST(l_quantity AS DOUBLE)) AS hiy
          FROM li)""",
        f"""h{bits} AS (SELECT l_orderkey, l_linenumber,
                 CAST({quant("l_extendedprice", "lox", "hix")} AS BIGINT) AS x,
                 CAST({quant("l_quantity", "loy", "hiy")} AS BIGINT) AS y,
                 CAST(0 AS BIGINT) AS d
          FROM li, b)""",
    ]
    n_1 = n - 1  # grid-wide flip (Wikipedia rot) keeps x/y >= 0
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        ctes.append(
            f"""h{k} AS (SELECT l_orderkey, l_linenumber,
             ry * x + (1 - ry) * (rx * ({n_1} - y) + (1 - rx) * y) AS x,
             ry * y + (1 - ry) * (rx * ({n_1} - x) + (1 - rx) * x) AS y,
             d + {s * s} * (3 * rx + ry - 2 * rx * ry) AS d
       FROM (SELECT *, (x // {s}) % 2 AS rx, (y // {s}) % 2 AS ry
             FROM h{k + 1}))"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + "\n    SELECT l_orderkey, l_linenumber, CAST(d AS BIGINT) AS hval"
        "\n    FROM h0"
    )


@register("lineitem_hilbert_key", _hilbert_oracle())
def lineitem_hilbert_key_q(spark, sf_dir):
    """Hilbert-curve clustering key of (l_extendedprice, l_quantity)
    over the 1996-01 ship month — the jump-free alternative to the
    Morton z-key for 2-D data skipping (sources/layout.py)."""
    from onionnet_spark.sources.layout import hilbert_key

    li = load_tables(spark, sf_dir)["lineitem"].filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
    )
    return hilbert_key(li, "l_extendedprice", "l_quantity", bits=8).select(
        "l_orderkey", "l_linenumber", "hval"
    )


@register("lineitem_zorder_key", _zorder_oracle())
def lineitem_zorder_key_q(spark, sf_dir):
    """Morton z-key of (l_extendedprice, l_quantity) over the 1996-01 ship
    month — the clustering key behind `write_zordered`'s 2-D
    data-skipping layout (sources/layout.py)."""
    from onionnet_spark.sources.layout import zorder_key

    li = load_tables(spark, sf_dir)["lineitem"].filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
    )
    return zorder_key(li, "l_extendedprice", "l_quantity", bits=8).select(
        "l_orderkey", "l_linenumber", "zval"
    )


@register(
    "bloom_pruned_revenue",
    # the Bloom filter admits false positives and the exact join
    # removes them, so the ORACLE is simply the plain join — any
    # false NEGATIVE (a dropped matching row) hash-mismatches.
    """SELECT CAST(EXTRACT(month FROM o_orderdate) AS INT) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1997-01-01'
    GROUP BY 1""",
)
def bloom_pruned_revenue_q(spark, sf_dir):
    """Runtime Bloom-filter join pruning: the urgent-1996 order keys
    build a bitmap that drops non-matching lineitem rows BEFORE the
    join shuffle (codegen xxhash64+shift/and, no UDF); the exact
    join then yields the identical result to the plain join."""
    from onionnet_spark.operators.joins import bloom_pruned_join

    t = load_tables(spark, sf_dir)
    dim = (
        t["orders"]
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.month("o_orderdate").alias("month"),
        )
    )
    fact = t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount")
    joined = bloom_pruned_join(fact, dim, on="l_orderkey")
    return joined.groupBy("month").agg(
        F.count("*").cast("bigint").alias("n_items"),
        # DECIMAL(18,4) accumulation before ROUND: double summation is
        # order-dependent across engines (the tpch_q7/q9 lesson).
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ),
            2,
        # final surface is DOUBLE (the q7/q9 convention): the driver
        # canonicalizer hashes decimal.Decimal differently across
        # engines, so the gate output must never be decimal-typed.
        ).cast("double").alias("revenue"),
    )


@register(
    "asof_join_tolerance",
    """WITH p AS (
      SELECT user_id, ts, MAX(event_id) AS purchase_event_id
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    ),
    c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, c.ts,
           CASE WHEN epoch(c.ts) - epoch(p.ts) <= 86400
                THEN p.purchase_event_id END AS purchase_event_id,
           CASE WHEN epoch(c.ts) - epoch(p.ts) <= 86400
                THEN p.ts END AS purchase_ts
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts""",
)
def asof_join_tolerance_q(spark, sf_dir):
    """As-of join with a 1-day staleness tolerance (kdb/pandas
    merge_asof semantics): purchases older than the tolerance are
    nulled, not matched — the stale-quote guard."""
    ev = load_tables(spark, sf_dir)["events"]
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_event_id"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["purchase_event_id"],
        suffix="_p",
        tolerance=86400.0,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("purchase_event_id_p").alias("purchase_event_id"),
        F.col("ts_p").alias("purchase_ts"),
    )


@register(
    "orders_revenue_mom",
    """WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             ROUND(SUM(o_totalprice), 2) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1)
    SELECT month, revenue, n_orders,
           CAST(floor((revenue - LAG(revenue) OVER (ORDER BY month))
                      / LAG(revenue) OVER (ORDER BY month) * 1000000)
                AS BIGINT) / 1000000.0 AS mom_pct
    FROM m""",
)
def orders_revenue_mom(spark, sf_dir):
    """Month-over-month revenue growth — the calendar-series lag
    shape (one aggregation down to |months| rows, then a lag window
    over that bounded series; the unpartitioned window touches
    months, never orders). Growth is floor-quantized to 6dp — the
    cross-engine-stable rounding for continuous ratios."""
    from pyspark.sql import Window

    orders = load_tables(spark, sf_dir)["orders"]
    m = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    # unpartitioned Window is BOUNDED: it orders the per-month
    # aggregate (|months| rows), not the orders table
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        "n_orders",
        (
            F.floor((F.col("revenue") - prev) / prev * 1_000_000).cast("bigint")
            / 1_000_000.0
        ).alias("mom_pct"),
    )


@register(
    "parts_abc_classes",
    """WITH pr AS (
      SELECT l_partkey AS pk,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                      AS BIGINT)) AS rq
      FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT SUM(rq) AS tq FROM pr),
    c AS (
      SELECT pk, rq,
             SUM(rq) OVER (ORDER BY rq DESC, pk
                           ROWS UNBOUNDED PRECEDING) AS cum_q
      FROM pr),
    cls AS (
      SELECT pk, rq,
             CASE WHEN cum_q * 1.0 / tq <= 0.80 THEN 'A'
                  WHEN cum_q * 1.0 / tq <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM c CROSS JOIN tot)
    SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(rq) / 100.0, 2) AS revenue,
           ROUND(SUM(rq) * 1.0 / (SELECT tq FROM tot), 6) AS revenue_share
    FROM cls GROUP BY abc_class""",
)
def parts_abc_classes(spark, sf_dir):
    """ABC / Pareto inventory classes: parts ranked by revenue, the
    top cumulative-80% share is class A, the next 15% B, the tail C.

    Cumulation runs on integer CENTS (floor-quantized from the
    2dp-rounded per-part revenue), so partial sums are grouping- and
    order-independent — which is what lets the distributed two-phase
    prefix sum (percentile buckets + within-bucket running sums +
    bucket offsets) reproduce the oracle's single sequential window
    EXACTLY. No global window touches the parts table; only the
    bucket-count series (n_buckets rows) is windowed unpartitioned.
    """
    from pyspark.sql import Window

    li = load_tables(spark, sf_dir)["lineitem"]
    # quantize to cents PER LINE ITEM: the row-level IEEE product is
    # bit-identical in any engine, so the integer sums are exact and
    # order-independent — ROUND-after-SUM here would re-expose the
    # cross-engine decimal-rounding boundary (the repo's documented
    # floor-quantize learning)
    pr = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
            ).cast("bigint")
        ).alias("rq")
    )
    n_buckets = 32
    fracs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
    cuts = pr.agg(F.expr(f"percentile(rq, array({fracs}))").alias("_cuts"))
    b = F.lit(0)
    for i in range(1, n_buckets):
        b = b + F.when(
            F.col("rq") > F.element_at(F.col("_cuts"), i), 1
        ).otherwise(0)
    bucketed = pr.crossJoin(F.broadcast(cuts)).withColumn("_bkt", b.cast("int"))
    w_in = Window.partitionBy("_bkt").orderBy(
        F.col("rq").desc(), F.col("pk").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    ranked = bucketed.withColumn("_run", F.sum("rq").over(w_in))
    sizes = bucketed.groupBy("_bkt").agg(F.sum("rq").alias("_bq"))
    # bounded unpartitioned window: n_buckets rows only
    w_off = Window.orderBy(F.col("_bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sizes.withColumn(
        "_off", F.coalesce(F.sum("_bq").over(w_off), F.lit(0))
    ).select("_bkt", "_off")
    tot = pr.agg(F.sum("rq").alias("tq"))
    cls = (
        ranked.join(F.broadcast(offsets), on="_bkt")
        .crossJoin(F.broadcast(tot))
        .select(
            "pk",
            "rq",
            F.when((F.col("_off") + F.col("_run")) * 1.0 / F.col("tq") <= 0.80, "A")
            .when((F.col("_off") + F.col("_run")) * 1.0 / F.col("tq") <= 0.95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )
    return (
        cls.groupBy("abc_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(F.sum("rq") / 100.0, 2).alias("revenue"),
            F.sum("rq").alias("_sq"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "abc_class",
            "n_parts",
            "revenue",
            F.round(F.col("_sq") * 1.0 / F.col("tq"), 6).alias("revenue_share"),
        )
    )


@register(
    "orders_open_per_day",
    """WITH iv AS (
      SELECT o.o_orderkey,
             CAST(date_trunc('day', o.o_orderdate) AS TIMESTAMP) AS d0,
             CAST(date_trunc('day', MAX(l.l_shipdate)) AS TIMESTAMP) AS d1
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2),
    deltas AS (
      SELECT d0 AS day, 1 AS delta FROM iv
      UNION ALL
      SELECT CAST(d1 + INTERVAL 1 DAY AS TIMESTAMP), -1 FROM iv),
    byday AS (SELECT day, CAST(SUM(delta) AS BIGINT) AS net
              FROM deltas GROUP BY day)
    SELECT day,
           CAST(SUM(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS n_open
    FROM byday""",
)
def orders_open_per_day(spark, sf_dir):
    """Interval-concurrency counting — open orders per calendar day
    (open from order date until the last line item ships), the
    classic +1/-1 delta sweep: the fact tables reduce to per-order
    intervals, intervals to per-day net deltas, and only the BOUNDED
    calendar-day series (a few thousand rows) sees the running-sum
    window — integer deltas, so the cumulative is engine-exact at
    any grouping."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    iv = (
        t["orders"]
        .join(
            t["lineitem"].select("l_orderkey", "l_shipdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            "o_orderkey",
            F.date_trunc("day", F.col("o_orderdate")).alias("d0"),
        )
        .agg(F.date_trunc("day", F.max("l_shipdate")).alias("d1"))
    )
    deltas = iv.select(F.col("d0").alias("day"), F.lit(1).alias("delta")).unionByName(
        iv.select(
            F.date_add(F.col("d1").cast("date"), 1).cast("timestamp").alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    byday = deltas.groupBy("day").agg(F.sum("delta").cast("bigint").alias("net"))
    # bounded unpartitioned window: the calendar-day series only
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return byday.select(
        "day", F.sum("net").over(w).cast("bigint").alias("n_open")
    )


@register(
    "lineitem_monthly_trend",
    """WITH m AS (
      SELECT l_returnflag AS flag, date_trunc('month', l_shipdate) AS mo,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev
      FROM lineitem GROUP BY 1, 2),
    xy AS (SELECT flag,
             CAST((year(mo) - 1992) * 12 + month(mo) - 1 AS BIGINT) AS x,
             CAST(ROUND(rev * 100, 0) AS BIGINT) AS y
           FROM m),
    s AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
            SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy
          FROM xy GROUP BY flag),
    f AS (SELECT flag, n,
            CAST(n * sxy - sx * sy AS HUGEINT) AS num,
            CAST(n * sxx - sx * sx AS HUGEINT) AS den,
            CAST(sy AS HUGEINT) AS syh, CAST(sx AS HUGEINT) AS sxh
          FROM s)
    SELECT flag AS l_returnflag, CAST(n AS BIGINT) AS n_months,
           ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
             AS slope_cents_per_month,
           ROUND(CAST(syh * den - num * sxh AS DOUBLE)
                 / CAST(n * den AS DOUBLE), 6) AS intercept_cents
    FROM f""",
)
def lineitem_monthly_trend(spark, sf_dir):
    """Per-returnflag least-squares trend of monthly revenue —
    regression as pure aggregation (the 100-TB-safe way to fit a
    line: one pass building integer moment sums, closed-form
    slope/intercept from exact BIGINT/DECIMAL moments, one IEEE
    division at the very end). Monthly revenue is cent-quantized
    after the engine-stable ROUND(SUM,2), so every moment is
    integer-exact and the fit is engine-identical."""
    return monthly_revenue_trend(load_tables(spark, sf_dir)["lineitem"])


def monthly_revenue_trend(li):
    """Closed-form OLS over cent-quantized monthly revenue per
    returnflag; see lineitem_monthly_trend for the contract."""
    monthly = (
        li.groupBy(
            F.col("l_returnflag").alias("flag"),
            F.date_trunc("month", F.col("l_shipdate")).alias("mo"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("rev")
        )
        .select(
            "flag",
            ((F.year("mo") - 1992) * 12 + F.month("mo") - 1)
            .cast("bigint")
            .alias("x"),
            F.round(F.col("rev") * 100, 0).cast("bigint").alias("y"),
        )
    )
    s = monthly.groupBy("flag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    f = s.select(
        "flag",
        "n",
        (dec("n") * dec("sxy") - dec("sx") * dec("sy")).alias("num"),
        (dec("n") * dec("sxx") - dec("sx") * dec("sx")).alias("den"),
        dec("sy").alias("syh"),
        dec("sx").alias("sxh"),
        dec("n").alias("nh"),
    )
    return f.select(
        F.col("flag").alias("l_returnflag"),
        F.col("n").cast("bigint").alias("n_months"),
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double"), 6
        ).alias("slope_cents_per_month"),
        F.round(
            (F.col("syh") * F.col("den") - F.col("num") * F.col("sxh")).cast(
                "double"
            )
            / (F.col("nh") * F.col("den")).cast("double"),
            6,
        ).alias("intercept_cents"),
    )


_PIVOT_YEARS = list(range(1995, 2002))


@register(
    "orders_status_year_pivot",
    # the DataFrame pivot() surface: order-status x order-year
    # revenue matrix with a FIXED year list (explicit values make
    # the pivot a single pass and keep the column set deterministic)
    """SELECT o_orderstatus AS status, """
    + ", ".join(
        f"ROUND(SUM(CASE WHEN year(o_orderdate) = {y} "
        f"THEN o_totalprice ELSE 0 END), 2) AS y{y}"
        for y in _PIVOT_YEARS
    )
    + " FROM orders GROUP BY o_orderstatus",
)
def orders_status_year_pivot(spark, sf_dir):
    """Revenue matrix status x year via the DataFrame pivot()
    operator with an EXPLICIT value list — the single-pass form (a
    values-less pivot needs a distinct scan first and produces a
    data-dependent schema, which a 100 TB job should never do)."""
    o = load_tables(spark, sf_dir)["orders"]
    out = (
        o.select(
            F.col("o_orderstatus").alias("status"),
            F.year("o_orderdate").alias("yr"),
            "o_totalprice",
        )
        .groupBy("status")
        .pivot("yr", _PIVOT_YEARS)
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    cols = [F.col("status")] + [
        F.coalesce(F.col(str(y)), F.lit(0.0)).alias(f"y{y}") for y in _PIVOT_YEARS
    ]
    return out.select(*cols)


@register(
    "entity_clusters",
    # end-to-end entity resolution: the SN candidate pairs (identical
    # derivation to sorted_neighborhood_pairs) close transitively via
    # a recursive min-label closure; every customer appears (singletons
    # are their own entity) with the canonical record's name attached
    """WITH RECURSIVE c AS (
      SELECT c_custkey AS id, c_name AS val,
             ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS rnk
      FROM customer),
    p AS (
      SELECT a.id AS u, b.id AS v
      FROM c a JOIN c b
        ON b.rnk BETWEEN a.rnk - 5 AND a.rnk + 5 AND a.id < b.id
      WHERE levenshtein(a.val, b.val) <= 2),
    e AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
    reach(id, lbl) AS (
      SELECT c_custkey, c_custkey FROM customer
      UNION
      SELECT e.u, r.lbl FROM e JOIN reach r ON r.id = e.v),
    lab AS (SELECT id AS c_custkey, MIN(lbl) AS entity_id
            FROM reach GROUP BY id),
    sz AS (SELECT entity_id, COUNT(*) AS cluster_size FROM lab
           GROUP BY entity_id)
    SELECT l.c_custkey, l.entity_id,
           CAST(sz.cluster_size AS BIGINT) AS cluster_size,
           cn.c_name AS canonical_name
    FROM lab l
    JOIN sz ON sz.entity_id = l.entity_id
    JOIN customer cn ON cn.c_custkey = l.entity_id""",
)
def entity_clusters_q(spark, sf_dir):
    """End-to-end entity resolution: sorted-neighborhood blocking +
    Levenshtein verify -> large/small-star connected components over
    the match graph -> one canonical record per entity (NUMERIC min
    id — re-derived per component, since the star-CC label is the
    lexicographic min of stringified keys — with its name attached).
    The compose a real MDM/record-linkage pipeline runs; transitive
    chains (A~B~C without A~C) merge correctly."""
    from onionnet_spark.operators.joins import resolve_entities

    cust = load_tables(spark, sf_dir)["customer"]
    return resolve_entities(
        cust, col="c_name", id_col="c_custkey", window=5, max_dist=2
    ).withColumnRenamed("canonical_c_name", "canonical_name")


@register(
    "lineitem_wilson_returns",
    # Wilson 95% CI from integer counts: p-hat and the interval are
    # single closed-form double expressions written IDENTICALLY in
    # both engines (z^2 = 3.8416 as a shared literal), so the only
    # float ops are the same sqrt/divisions on the same inputs
    """WITH c AS (
      SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r
      FROM lineitem GROUP BY 1)
    SELECT ship_year, n, r,
           ROUND(r * 1.0 / n, 6) AS p_hat,
           ROUND(((r * 1.0 / n) + 3.8416 / (2 * n)
                  - 1.96 * sqrt((r * 1.0 / n) * (1 - r * 1.0 / n) / n
                                + 3.8416 / (4.0 * n * n)))
                 / (1 + 3.8416 / n), 6) AS wilson_lo,
           ROUND(((r * 1.0 / n) + 3.8416 / (2 * n)
                  + 1.96 * sqrt((r * 1.0 / n) * (1 - r * 1.0 / n) / n
                                + 3.8416 / (4.0 * n * n)))
                 / (1 + 3.8416 / n), 6) AS wilson_hi
    FROM c""",
)
def lineitem_wilson_returns(spark, sf_dir):
    """Returns-rate per ship year with Wilson 95% confidence bounds
    — the proportion CI that stays sane at small n (unlike the
    normal approximation). Integer counts in, one closed-form float
    expression out."""
    li = load_tables(spark, sf_dir)["lineitem"]
    c = li.groupBy(F.year("l_shipdate").cast("int").alias("ship_year")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("r"),
    )
    p = F.col("r") / F.col("n")
    z2 = F.lit(3.8416)
    half = z2 / (2 * F.col("n"))
    rad = F.lit(1.96) * F.sqrt(
        p * (1 - p) / F.col("n") + z2 / (4.0 * F.col("n") * F.col("n"))
    )
    denom = 1 + z2 / F.col("n")
    return c.select(
        "ship_year",
        "n",
        "r",
        F.round(p, 6).alias("p_hat"),
        F.round((p + half - rad) / denom, 6).alias("wilson_lo"),
        F.round((p + half + rad) / denom, 6).alias("wilson_hi"),
    )


@register(
    "customers_all_quarters",
    # relational DIVISION (the "FOR ALL" shape SQL lacks natively):
    # customers with at least one order in EVERY quarter of 1995 —
    # count-distinct equality against the divisor's cardinality
    """WITH o95 AS (
      SELECT o_custkey, CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS q,
             o_totalprice
      FROM orders
      WHERE o_orderdate >= DATE '1995-01-01'
        AND o_orderdate < DATE '1996-01-01'),
    agg AS (
      SELECT o_custkey AS c_custkey,
             COUNT(DISTINCT q) AS n_quarters,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                  AS DOUBLE) AS total_spend
      FROM o95 GROUP BY 1)
    SELECT a.c_custkey, c.c_name, a.n_orders, a.total_spend
    FROM agg a JOIN customer c ON c.c_custkey = a.c_custkey
    WHERE a.n_quarters = 4""",
)
def customers_all_quarters_q(spark, sf_dir):
    """Relational division: customers active in EVERY quarter of
    1995 (distinct-quarter count == divisor cardinality) — the
    classic FOR-ALL operator shape, one aggregation + one broadcast
    dim join; spend accumulates in DECIMAL(18,4) per the q7/q9
    convention."""
    t = load_tables(spark, sf_dir)
    o95 = t["orders"].filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1996-01-01")
    )
    agg = o95.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.countDistinct(F.quarter("o_orderdate")).alias("n_quarters"),
        F.count("*").cast("bigint").alias("n_orders"),
        # DECIMAL accumulation, DOUBLE gate surface (q7/q9 convention)
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total_spend"),
    )
    cust = t["customer"].select("c_custkey", "c_name")
    return (
        agg.filter(F.col("n_quarters") == 4)
        .join(F.broadcast(cust), on="c_custkey")
        .select("c_custkey", "c_name", "n_orders", "total_spend")
    )


@register(
    "customer_spend_percentile",
    # window-rank coverage: cume_dist within nation over exact
    # DECIMAL spend; ties share a value in both engines by definition
    """WITH spend AS (
      SELECT o_custkey AS c_custkey,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                  AS DOUBLE) AS total_spend
      FROM orders GROUP BY 1)
    SELECT s.c_custkey, n.n_name AS nation, s.total_spend,
           ROUND(CUME_DIST() OVER (PARTITION BY n.n_name
                                   ORDER BY s.total_spend), 6)
             AS spend_pctile
    FROM spend s
    JOIN customer c ON c.c_custkey = s.c_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey""",
)
def customer_spend_percentile_q(spark, sf_dir):
    """Per-nation customer spend percentile (cume_dist) — the
    window-rank surface over exact DECIMAL totals; the window
    partitions by nation (per-group data, never a global sort) and
    the nation lookup broadcasts."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    spend = t["orders"].groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        # DECIMAL accumulation, DOUBLE gate surface (q7/q9 convention);
        # both engines order the window by the identical double, so
        # cume_dist ties agree by construction.
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total_spend")
    )
    cust = t["customer"].select("c_custkey", "c_nationkey")
    nat = t["nation"].select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("nation")
    )
    w = Window.partitionBy("nation").orderBy("total_spend")
    return (
        spend.join(cust, on="c_custkey")
        .join(F.broadcast(nat), on="c_nationkey")
        .select(
            "c_custkey",
            "nation",
            "total_spend",
            F.round(F.cume_dist().over(w), 6).alias("spend_pctile"),
        )
    )


def _layout_skip_oracle(n_files: int = 16, bits: int = 8) -> str:
    """File-skipping audit: replay the three clustering strategies
    (single-column sort, Morton, Hilbert), deal rows into n_files
    rank ranges per strategy, and count how many files a mid-range
    2-D box predicate has to touch given footer min/max stats."""
    month = "l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-02-01'"
    n = 1 << bits

    def quant(col: str, lo: str, hi: str) -> str:
        return f"""CASE WHEN (b.{hi} - b.{lo}) > 0 THEN
        LEAST({n - 1}, GREATEST(0, CAST(FLOOR(
          (CAST({col} AS DOUBLE) - b.{lo}) / ((b.{hi} - b.{lo}) / {n})
        ) AS INT))) ELSE 0 END"""

    zterms = []
    for j in range(bits):
        zterms.append(f"((qx // {1 << j}) % 2) * {1 << (2 * j + 1)}")
        zterms.append(f"((qy // {1 << j}) % 2) * {1 << (2 * j)}")
    zval = " + ".join(zterms)

    hctes = []
    n_1 = n - 1
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        prev = f"hh{k + 1}" if k + 1 < bits else f"hh{bits}"
        hctes.append(
            f"""hh{k} AS (SELECT rid, px, qty,
             ry * x + (1 - ry) * (rx * ({n_1} - y) + (1 - rx) * y) AS x,
             ry * y + (1 - ry) * (rx * ({n_1} - x) + (1 - rx) * x) AS y,
             d + {s * s} * (3 * rx + ry - 2 * rx * ry) AS d
       FROM (SELECT *, (x // {s}) % 2 AS rx, (y // {s}) % 2 AS ry
             FROM {prev}))"""
        )
    hchain = ",\n    ".join(hctes)

    def audit(src: str, key: str, name: str) -> str:
        return f"""f_{name} AS (
      SELECT *, CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY {key}, rid) - 1)
                           * {n_files} / (SELECT COUNT(*) FROM {src}))
                 AS INT) AS fid
      FROM {src}),
    s_{name} AS (
      SELECT fid, MIN(px) AS lo_x, MAX(px) AS hi_x,
             MIN(qty) AS lo_y, MAX(qty) AS hi_y,
             COUNT(*) AS n_rows
      FROM f_{name} GROUP BY fid),
    r_{name} AS (
      SELECT '{name}' AS layout,
             CAST(COUNT(*) AS BIGINT) AS n_files,
             CAST(SUM(CASE WHEN lo_x <= bx.p_hi AND hi_x >= bx.p_lo
                            AND lo_y <= bx.q_hi AND hi_y >= bx.q_lo
                           THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
             CAST(SUM(CASE WHEN lo_x <= bx.p_hi AND hi_x >= bx.p_lo
                            AND lo_y <= bx.q_hi AND hi_y >= bx.q_lo
                           THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
      FROM s_{name}, bx)"""

    return f"""WITH li AS (
      SELECT l_orderkey * 10 + l_linenumber AS rid,
             CAST(l_extendedprice AS DOUBLE) AS px,
             CAST(l_quantity AS DOUBLE) AS qty
      FROM lineitem WHERE {month}),
    b AS (SELECT MIN(px) AS lox, MAX(px) AS hix,
                 MIN(qty) AS loy, MAX(qty) AS hiy FROM li),
    bx AS (SELECT lox + (hix - lox) * 0.40 AS p_lo,
                  lox + (hix - lox) * 0.60 AS p_hi,
                  loy + (hiy - loy) * 0.40 AS q_lo,
                  loy + (hiy - loy) * 0.60 AS q_hi
           FROM b),
    q AS (SELECT rid, px, qty,
                 {quant("px", "lox", "hix")} AS qx,
                 {quant("qty", "loy", "hiy")} AS qy
          FROM li, b),
    zk AS (SELECT rid, px, qty, CAST({zval} AS BIGINT) AS key FROM q),
    hh{bits} AS (SELECT rid, px, qty,
                 CAST(qx AS BIGINT) AS x, CAST(qy AS BIGINT) AS y,
                 CAST(0 AS BIGINT) AS d FROM q),
    {hchain},
    hk AS (SELECT rid, px, qty, d AS key FROM hh0),
    pk AS (SELECT rid, px, qty, px AS key FROM li),
    {audit("pk", "key", "price_sort")},
    {audit("zk", "key", "zorder")},
    {audit("hk", "key", "hilbert")},
    matching AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_match FROM li, bx
      WHERE px >= bx.p_lo AND px <= bx.p_hi
        AND qty >= bx.q_lo AND qty <= bx.q_hi)
    SELECT layout, n_files, files_hit, rows_scanned,
           (SELECT n_match FROM matching) AS rows_matching
    FROM (SELECT * FROM r_price_sort
          UNION ALL SELECT * FROM r_zorder
          UNION ALL SELECT * FROM r_hilbert)"""


@register("lineitem_layout_skipping", _layout_skip_oracle())
def lineitem_layout_skipping_q(spark, sf_dir):
    """File-skipping effectiveness audit: deal the 1996-01 ship month
    into 16 rank-range 'files' under three clustering strategies
    (price sort, Morton z-order, Hilbert) and count the files a
    mid-range 2-D box predicate must touch given footer min/max
    stats — the measurement that justifies the multi-dimensional
    layouts (1-D sort prunes one dimension only; the curves prune
    both). Rank ranges mirror write_zordered's repartitionByRange;
    at 100 TB this audit runs per partition directory as a layout
    health check. The per-layout rank is the range-partitioned
    two-phase `global_rank_range` (VERDICT r7 item 3) — no
    single-partition window even when the audited slice is 100× —
    and n_rows rides the bounds aggregate (one scalar fetch, not a
    second count job)."""
    from onionnet_spark.functions.corpus import global_rank_range
    from onionnet_spark.sources.layout import hilbert_key, zorder_key

    li = (
        load_tables(spark, sf_dir)["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-02-01")
        )
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
            F.col("l_extendedprice").cast("double").alias("px"),
            F.col("l_quantity").cast("double").alias("qty"),
        )
        .localCheckpoint()
    )
    # ONE bounds job feeds everything below (r10): the old shape
    # re-ran this aggregate inside zorder_key, hilbert_key and every
    # broadcast(box) build (~6 redundant jobs over the checkpointed
    # slice). The scalars go back in as literals; p_lo..q_hi are the
    # same IEEE double expressions evaluated driver-side, and the
    # quantizers consume the identical bounds — output unchanged.
    brow = li.agg(
        F.min("px").alias("lox"), F.max("px").alias("hix"),
        F.min("qty").alias("loy"), F.max("qty").alias("hiy"),
        F.count("*").alias("nr_all"),
    ).first()
    if not brow["nr_all"]:
        # ADVICE r10: on an empty/all-null slice the bounds are None
        # and the driver-side arithmetic below would raise a bare
        # TypeError; fail with the actual cause instead. (The fixed
        # 1996-01 slice is never empty on the shipped SFs.)
        raise ValueError(
            "lineitem_layout_skipping: the audited slice is empty — "
            "no rows in the 1996-01 shipdate window"
        )
    lox, hix, loy, hiy = brow["lox"], brow["hix"], brow["loy"], brow["hiy"]
    p_lo, p_hi = lox + (hix - lox) * 0.40, lox + (hix - lox) * 0.60
    q_lo, q_hi = loy + (hiy - loy) * 0.40, loy + (hiy - loy) * 0.60
    n_files = 16
    n_rows = brow["nr_all"]

    keyed = {
        "price_sort": li.withColumn("key", F.col("px")),
        "zorder": zorder_key(
            li, "px", "qty", bits=8, key_col="key",
            bounds=(lox, hix, loy, hiy),
        ),
        "hilbert": hilbert_key(
            li, "px", "qty", bits=8, key_col="key",
            bounds=(lox, hix, loy, hiy),
        ),
    }
    out = None
    for name, kdf in keyed.items():
        files = global_rank_range(
            kdf, [F.asc("key"), F.asc("rid")], rank_col="_grk"
        ).withColumn(
            "fid",
            F.floor((F.col("_grk") - 1) * n_files / n_rows).cast("int"),
        )
        stats = files.groupBy("fid").agg(
            F.min("px").alias("lo_x"), F.max("px").alias("hi_x"),
            F.min("qty").alias("lo_y"), F.max("qty").alias("hi_y"),
            F.count("*").alias("nr"),
        )
        hit = (
            (F.col("lo_x") <= F.lit(p_hi))
            & (F.col("hi_x") >= F.lit(p_lo))
            & (F.col("lo_y") <= F.lit(q_hi))
            & (F.col("hi_y") >= F.lit(q_lo))
        )
        row = stats.agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum(hit.cast("int")).cast("bigint").alias("files_hit"),
            F.sum(F.when(hit, F.col("nr")).otherwise(0))
            .cast("bigint")
            .alias("rows_scanned"),
        ).select(F.lit(name).alias("layout"), "*")
        out = row if out is None else out.unionByName(row)
    n_match = (
        li.filter(
            (F.col("px") >= F.lit(p_lo)) & (F.col("px") <= F.lit(p_hi))
            & (F.col("qty") >= F.lit(q_lo)) & (F.col("qty") <= F.lit(q_hi))
        )
        .agg(F.count("*").cast("bigint").alias("rows_matching"))
    )
    return out.crossJoin(F.broadcast(n_match))


@register(
    "brand_supplier_hhi",
    # Herfindahl-Hirschman concentration of supplier share per part
    # brand, EXACT: HHI = sum(cnt^2) / total^2 — two integer
    # aggregates and ONE final division (shares never materialize
    # as intermediate doubles)
    """WITH s AS (
      SELECT p.p_brand, l.l_suppkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2),
    agg AS (
      SELECT p_brand,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(SUM(cnt) AS BIGINT) AS total_items,
             CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq
      FROM s GROUP BY 1)
    SELECT p_brand, n_suppliers, total_items,
           ROUND(sum_sq * 1.0 / (total_items * total_items), 6) AS hhi
    FROM agg""",
)
def brand_supplier_hhi_q(spark, sf_dir):
    """Supplier-concentration HHI per part brand (the antitrust /
    supply-chain-risk metric): sum of squared supplier shares,
    computed as integer sum(cnt²)/total² with one final division —
    exact at any scale. Two aggregations; the part dim join
    broadcasts."""
    t = load_tables(spark, sf_dir)
    s = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand")),
            on=F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "l_suppkey")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    return s.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.sum("cnt").cast("bigint").alias("total_items"),
        F.round(
            F.sum(F.col("cnt") * F.col("cnt"))
            / (F.sum("cnt") * F.sum("cnt")),
            6,
        ).alias("hhi"),
    )


@register(
    "orders_integrity_audit",
    # referential-integrity intake audit: orphaned orders (no
    # lineitems), dangling lineitems (no order), and coverage rates
    """WITH o AS (SELECT COUNT(*) AS n_orders FROM orders),
    l AS (SELECT COUNT(*) AS n_lineitems FROM lineitem),
    orphans AS (
      SELECT COUNT(*) AS n FROM orders
      WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)),
    dangling AS (
      SELECT COUNT(*) AS n FROM lineitem
      WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
    SELECT CAST(o.n_orders AS BIGINT) AS n_orders,
           CAST(l.n_lineitems AS BIGINT) AS n_lineitems,
           CAST(orphans.n AS BIGINT) AS n_orphan_orders,
           CAST(dangling.n AS BIGINT) AS n_dangling_lineitems,
           ROUND(orphans.n * 1.0 / o.n_orders, 6) AS orphan_rate
    FROM o, l, orphans, dangling""",
)
def orders_integrity_audit_q(spark, sf_dir):
    """Referential-integrity audit: orders with no lineitems and
    lineitems with no parent order — the intake check every
    warehouse load runs. Both directions are LEFT ANTI joins (the
    NOT-IN shape without the null trap); one row out."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].select("o_orderkey")
    li = t["lineitem"].select("l_orderkey")
    orphans = o.join(
        li, on=F.col("o_orderkey") == F.col("l_orderkey"), how="left_anti"
    ).agg(F.count("*").alias("n_orphans"))
    dangling = li.join(
        o, on=F.col("l_orderkey") == F.col("o_orderkey"), how="left_anti"
    ).agg(F.count("*").alias("n_dangling"))
    totals = o.agg(F.count("*").alias("n_orders")).crossJoin(
        li.agg(F.count("*").alias("n_lineitems"))
    )
    return (
        totals.crossJoin(F.broadcast(orphans))
        .crossJoin(F.broadcast(dangling))
        .select(
            F.col("n_orders").cast("bigint").alias("n_orders"),
            F.col("n_lineitems").cast("bigint").alias("n_lineitems"),
            F.col("n_orphans").cast("bigint").alias("n_orphan_orders"),
            F.col("n_dangling").cast("bigint").alias("n_dangling_lineitems"),
            F.round(F.col("n_orphans") / F.col("n_orders"), 6).alias(
                "orphan_rate"
            ),
        )
    )


@register(
    "brand_dual_sourcing",
    # supply-chain resilience: per brand, how many parts have >= 2
    # suppliers / >= 2 supplier NATIONS (single-sourced parts are the
    # risk register); supply relation observed from lineitem
    """WITH sp AS (
      SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
    sn AS (
      SELECT sp.pk, sp.sk, s.s_nationkey AS nk
      FROM sp JOIN supplier s ON s.s_suppkey = sp.sk),
    per_part AS (
      SELECT p.p_brand, sn.pk,
             COUNT(DISTINCT sn.sk) AS n_supp,
             COUNT(DISTINCT sn.nk) AS n_nations
      FROM sn JOIN part p ON p.p_partkey = sn.pk
      GROUP BY 1, 2)
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CASE WHEN n_supp >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dual_sourced,
           CAST(SUM(CASE WHEN n_nations >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_multi_nation,
           ROUND(SUM(CASE WHEN n_supp >= 2 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS dual_rate
    FROM per_part GROUP BY p_brand""",
)
def brand_dual_sourcing_q(spark, sf_dir):
    """Supply-chain resilience audit: per brand, the fraction of
    parts with at least two suppliers (and two supplier NATIONS) —
    single-sourced parts are the procurement risk register. The
    supplier and part dims broadcast; the distinct and the two
    count-distincts key on the part."""
    t = load_tables(spark, sf_dir)
    sp = t["lineitem"].select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).distinct()
    sn = sp.join(
        F.broadcast(t["supplier"].select(
            F.col("s_suppkey").alias("sk"), F.col("s_nationkey").alias("nk")
        )),
        on="sk",
    )
    per_part = sn.join(
        F.broadcast(t["part"].select(
            F.col("p_partkey").alias("pk"), "p_brand"
        )),
        on="pk",
    ).groupBy("p_brand", "pk").agg(
        F.countDistinct("sk").alias("n_supp"),
        F.countDistinct("nk").alias("n_nations"),
    )
    return per_part.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.sum((F.col("n_supp") >= 2).cast("int")).cast("bigint").alias(
            "n_dual_sourced"
        ),
        F.sum((F.col("n_nations") >= 2).cast("int")).cast("bigint").alias(
            "n_multi_nation"
        ),
        F.round(
            F.sum((F.col("n_supp") >= 2).cast("int")) / F.count("*"), 6
        ).alias("dual_rate"),
    )


@register(
    "returnflag_year_chi2",
    # categorical mix-shift test: chi-square contingency of
    # l_returnflag x ship year (1995 vs 1996). Expected counts and
    # contributions are computed from integer marginals with the
    # identical expression tree on both engines, so the float chi2
    # agrees bit-for-bit; the PSI monitor's categorical sibling
    """WITH c AS (
      SELECT l_returnflag AS returnflag,
             SUM(CASE WHEN l_shipdate >= DATE '1995-01-01'
                       AND l_shipdate < DATE '1996-01-01'
                      THEN 1 ELSE 0 END) AS n_1995,
             SUM(CASE WHEN l_shipdate >= DATE '1996-01-01'
                       AND l_shipdate < DATE '1997-01-01'
                      THEN 1 ELSE 0 END) AS n_1996
      FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01'
        AND l_shipdate < DATE '1997-01-01'
      GROUP BY 1),
    t AS (SELECT SUM(n_1995) AS t95, SUM(n_1996) AS t96 FROM c)
    SELECT c.returnflag,
           CAST(c.n_1995 AS BIGINT) AS n_1995,
           CAST(c.n_1996 AS BIGINT) AS n_1996,
           ROUND((c.n_1995 + c.n_1996) * 1.0 * t.t95 / (t.t95 + t.t96), 6)
             AS exp_1995,
           ROUND(
             (c.n_1995 - (c.n_1995 + c.n_1996) * 1.0 * t.t95 / (t.t95 + t.t96))
             * (c.n_1995 - (c.n_1995 + c.n_1996) * 1.0 * t.t95 / (t.t95 + t.t96))
             / ((c.n_1995 + c.n_1996) * 1.0 * t.t95 / (t.t95 + t.t96))
             + (c.n_1996 - (c.n_1995 + c.n_1996) * 1.0 * t.t96 / (t.t95 + t.t96))
             * (c.n_1996 - (c.n_1995 + c.n_1996) * 1.0 * t.t96 / (t.t95 + t.t96))
             / ((c.n_1995 + c.n_1996) * 1.0 * t.t96 / (t.t95 + t.t96)),
             6) AS chi2_contrib
    FROM c CROSS JOIN t""",
)
def returnflag_year_chi2_q(spark, sf_dir):
    """Categorical drift test: chi-square contingency of return flag
    x ship year, per-flag contributions against the pooled-marginal
    expectation — the categorical sibling of the PSI monitor
    (length_psi_by_source). One conditional aggregation over the
    filtered fact scan + a broadcast 1-row marginal; all float math
    derives from integer marginals with an identical expression
    tree on both engines."""
    li = load_tables(spark, sf_dir)["lineitem"].filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    in95 = (F.col("l_shipdate") >= "1995-01-01") & (
        F.col("l_shipdate") < "1996-01-01"
    )
    c = li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.sum(F.when(in95, 1).otherwise(0)).alias("n_1995"),
        F.sum(F.when(~in95, 1).otherwise(0)).alias("n_1996"),
    )
    t = c.agg(F.sum("n_1995").alias("t95"), F.sum("n_1996").alias("t96"))
    row = F.col("n_1995") + F.col("n_1996")
    e95 = row * 1.0 * F.col("t95") / (F.col("t95") + F.col("t96"))
    e96 = row * 1.0 * F.col("t96") / (F.col("t95") + F.col("t96"))
    return c.crossJoin(F.broadcast(t)).select(
        "returnflag",
        F.col("n_1995").cast("bigint").alias("n_1995"),
        F.col("n_1996").cast("bigint").alias("n_1996"),
        F.round(e95, 6).alias("exp_1995"),
        F.round(
            (F.col("n_1995") - e95) * (F.col("n_1995") - e95) / e95
            + (F.col("n_1996") - e96) * (F.col("n_1996") - e96) / e96,
            6,
        ).alias("chi2_contrib"),
    )


@register(
    "orders_ship_latency",
    # fulfillment SLA readout: per order the FIRST ship date of any
    # of its line items, latency in whole days from order date;
    # per-priority exact integer-day percentiles (the discrete
    # lower-interpolation quantile both engines compute identically
    # on integers) plus the >30d SLA-breach rate
    """WITH fs AS (
      SELECT l_orderkey, MIN(l_shipdate) AS first_ship
      FROM lineitem GROUP BY 1),
    lat AS (
      SELECT o.o_orderpriority AS priority,
             CAST(date_diff('day', o.o_orderdate, fs.first_ship) AS BIGINT)
               AS days
      FROM orders o JOIN fs ON fs.l_orderkey = o.o_orderkey)
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(quantile_cont(days, 0.5), 6) AS p50_days,
           ROUND(quantile_cont(days, 0.9), 6) AS p90_days,
           CAST(MAX(days) AS BIGINT) AS max_days,
           CAST(SUM(CASE WHEN days > 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_breach_30d,
           ROUND(SUM(CASE WHEN days > 30 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS breach_rate
    FROM lat GROUP BY 1""",
)
def orders_ship_latency_q(spark, sf_dir):
    """Order-to-first-ship latency SLA: one fact aggregation for the
    first ship date per order (map-side combinable MIN), a key join
    back to orders, then per-priority exact interpolated percentiles
    (Spark percentile == DuckDB quantile_cont on integers — the
    grouped_percentiles convention) and the 30-day breach rate. Both the MIN and the final GROUP BY shuffle on
    their natural keys; nothing global."""
    t = load_tables(spark, sf_dir)
    fs = t["lineitem"].groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship")
    )
    lat = (
        t["orders"]
        .join(fs, t["orders"]["o_orderkey"] == fs["l_orderkey"])
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.col("first_ship"), F.col("o_orderdate"))
            .cast("bigint")
            .alias("days"),
        )
    )
    return lat.groupBy("priority").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.expr("percentile(days, 0.5)"), 6).alias("p50_days"),
        F.round(F.expr("percentile(days, 0.9)"), 6).alias("p90_days"),
        F.max("days").cast("bigint").alias("max_days"),
        F.sum(F.when(F.col("days") > 30, 1).otherwise(0))
        .cast("bigint")
        .alias("n_breach_30d"),
        F.round(
            F.sum(F.when(F.col("days") > 30, 1).otherwise(0)) * 1.0
            / F.count("*"),
            6,
        ).alias("breach_rate"),
    )


@register(
    "nation_trade_balance",
    # cross-nation trade balance: exports(n) = revenue on lineitems
    # whose SUPPLIER is in n and customer elsewhere; imports(n) =
    # the reverse; balance = exports - imports. DECIMAL(18,4)
    # accumulation, DOUBLE gate surface (q7/q9 convention)
    """WITH flows AS (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS rev
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation nc ON nc.n_nationkey = c_nationkey
      JOIN nation ns ON ns.n_nationkey = s_nationkey
      WHERE ns.n_name <> nc.n_name),
    ex AS (SELECT supp_nation AS nation, SUM(rev) AS exports
           FROM flows GROUP BY 1),
    im AS (SELECT cust_nation AS nation, SUM(rev) AS imports
           FROM flows GROUP BY 1)
    SELECT COALESCE(ex.nation, im.nation) AS nation,
           CAST(ROUND(COALESCE(ex.exports, 0), 2) AS DOUBLE) AS exports,
           CAST(ROUND(COALESCE(im.imports, 0), 2) AS DOUBLE) AS imports,
           CAST(ROUND(COALESCE(ex.exports, 0)
                      - COALESCE(im.imports, 0), 2) AS DOUBLE) AS balance
    FROM ex FULL OUTER JOIN im ON ex.nation = im.nation""",
)
def nation_trade_balance_q(spark, sf_dir):
    """Cross-nation trade balance: the q7 star-join shape folded to a
    per-nation export/import ledger. One pass over the fact builds
    the cross-nation flow table (both nation dims broadcast); exports
    and imports are two aggregations of it; balance joins the two
    25-row aggregates. DECIMAL accumulation throughout, DOUBLE out."""
    t = load_tables(spark, sf_dir)
    nc = t["nation"].select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("cust_nation"),
    )
    ns = t["nation"].select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    flows = (
        t["lineitem"]
        .join(t["orders"], t["lineitem"]["l_orderkey"] == t["orders"]["o_orderkey"])
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(F.broadcast(nc), on="c_nationkey")
        .join(F.broadcast(ns), on="s_nationkey")
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
            .alias("rev"),
        )
    )
    # one pass: each flow row contributes an export leg to its
    # supplier nation and an import leg to its customer nation, so a
    # single conditional aggregation replaces two fact scans + a
    # full-outer join of the aggregates
    legs = flows.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("export").alias("role"),
                    F.col("supp_nation").alias("nation"),
                ),
                F.struct(
                    F.lit("import").alias("role"),
                    F.col("cust_nation").alias("nation"),
                ),
            )
        ).alias("leg"),
        "rev",
    ).select(F.col("leg.role").alias("role"), F.col("leg.nation").alias("nation"), "rev")
    ex_sum = F.sum(F.when(F.col("role") == "export", F.col("rev")))
    im_sum = F.sum(F.when(F.col("role") == "import", F.col("rev")))
    return legs.groupBy("nation").agg(
        F.round(F.coalesce(ex_sum, F.lit(0)), 2).cast("double").alias("exports"),
        F.round(F.coalesce(im_sum, F.lit(0)), 2).cast("double").alias("imports"),
        F.round(
            F.coalesce(ex_sum, F.lit(0)) - F.coalesce(im_sum, F.lit(0)), 2
        )
        .cast("double")
        .alias("balance"),
    )


@register(
    "orders_reorder_interval",
    # per-customer reorder cadence: consecutive-order gaps in whole
    # days (lag window PARTITIONED BY customer — per-group data,
    # never a global sort); single-order customers have no gap and
    # are excluded on both sides
    """WITH g AS (
      SELECT o_custkey,
             CAST(date_diff('day',
               LAG(o_orderdate) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS BIGINT) AS gap
      FROM orders)
    SELECT o_custkey AS c_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(gap) AS BIGINT) AS sum_gap_days,
           ROUND(SUM(gap) * 1.0 / COUNT(*), 6) AS mean_gap_days,
           CAST(MAX(gap) AS BIGINT) AS max_gap_days
    FROM g WHERE gap IS NOT NULL
    GROUP BY 1""",
)
def orders_reorder_interval_q(spark, sf_dir):
    """Customer reorder cadence: whole-day gaps between consecutive
    orders via a customer-partitioned lag window, folded to per-
    customer count/sum/mean/max — the behavioral recency feature
    behind churn/LTV models (complements events_interarrival on the
    orders fact). Integer-day sums; one shuffle on the customer key."""
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("bigint").alias("gap"),
    ).filter(F.col("gap").isNotNull())
    return g.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.sum("gap").cast("bigint").alias("sum_gap_days"),
        F.round(F.sum("gap") * 1.0 / F.count("*"), 6).alias("mean_gap_days"),
        F.max("gap").cast("bigint").alias("max_gap_days"),
    )


# --------------------------------------------------------------------------
# Round-8 statistical monitors
# --------------------------------------------------------------------------


@register(
    "lineitem_ks_test",
    # two-sample Kolmogorov-Smirnov readout: ECDF of l_quantity for
    # returned ('R') vs delivered-ok ('N') line items over the
    # bounded integer support (50 distinct quantities -> the
    # cumulative window is a <=50-row single partition, bounded by
    # the value grid, never by |lineitem|). CDFs are integer
    # cumulative counts over integer totals -> one division each.
    """WITH c AS (
      SELECT CAST(l_quantity AS BIGINT) AS quantity,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_r,
             SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS n_n
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
      GROUP BY 1),
    cum AS (
      SELECT quantity,
             SUM(n_r) OVER (ORDER BY quantity) AS cum_r,
             SUM(n_n) OVER (ORDER BY quantity) AS cum_n,
             SUM(n_r) OVER () AS tot_r,
             SUM(n_n) OVER () AS tot_n
      FROM c)
    SELECT quantity,
           CAST(cum_r AS BIGINT) AS cum_r,
           CAST(cum_n AS BIGINT) AS cum_n,
           ROUND(cum_r * 1.0 / tot_r, 6) AS cdf_r,
           ROUND(cum_n * 1.0 / tot_n, 6) AS cdf_n,
           ROUND(ABS(cum_r * 1.0 / tot_r - cum_n * 1.0 / tot_n), 6)
             AS ks_diff
    FROM cum""",
)
def lineitem_ks_test_q(spark, sf_dir):
    """Two-sample KS distribution drift: per-quantity ECDF gap
    between returned and delivered line items; MAX(ks_diff) is the
    KS D statistic. One conditional aggregation over the fact scan
    collapses to <=50 rows (the integer quantity grid), then a
    cumulative window over that bounded series — the window input
    is value-grid-bounded, independent of |lineitem| (plan-guard
    whitelisted). Continuous twin of returnflag_year_chi2."""
    from pyspark.sql import Window

    li = load_tables(spark, sf_dir)["lineitem"].filter(
        F.col("l_returnflag").isin("R", "N")
    )
    c = li.groupBy(F.col("l_quantity").cast("bigint").alias("quantity")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_r"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0)).alias("n_n"),
    )
    # bounded: <=50 rows (distinct integer quantities), see docstring
    wcum = Window.orderBy("quantity").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = c.select(
        "quantity",
        F.sum("n_r").over(wcum).alias("cum_r"),
        F.sum("n_n").over(wcum).alias("cum_n"),
        F.sum("n_r").over(wall).alias("tot_r"),
        F.sum("n_n").over(wall).alias("tot_n"),
    )
    cdf_r = F.col("cum_r") * 1.0 / F.col("tot_r")
    cdf_n = F.col("cum_n") * 1.0 / F.col("tot_n")
    return cum.select(
        "quantity",
        F.col("cum_r").cast("bigint").alias("cum_r"),
        F.col("cum_n").cast("bigint").alias("cum_n"),
        F.round(cdf_r, 6).alias("cdf_r"),
        F.round(cdf_n, 6).alias("cdf_n"),
        F.round(F.abs(cdf_r - cdf_n), 6).alias("ks_diff"),
    )


@register(
    "orders_priority_drift",
    # categorical drift monitor: Jensen-Shannon divergence of the
    # order-priority mix between consecutive order years. Term
    # p*ln(2p/(p+q)) is zero-guarded; probabilities are integer
    # count / integer total with the identical expression tree on
    # both engines, ROUND 6dp at the end (ln precedent:
    # unigram_logprob). Grid is |years| x |priorities| = tiny.
    """WITH c AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             o_orderpriority AS priority, COUNT(*) AS n
      FROM orders GROUP BY 1, 2),
    t AS (SELECT yr, SUM(n) AS tot FROM c GROUP BY 1),
    p AS (SELECT c.yr, c.priority, c.n * 1.0 / t.tot AS p
          FROM c JOIN t ON t.yr = c.yr),
    j AS (
      SELECT a.yr AS year_a, b.yr AS year_b,
             SUM(CASE WHEN a.p > 0
                 THEN 0.5 * a.p * ln(2 * a.p / (a.p + b.p)) ELSE 0 END
               + CASE WHEN b.p > 0
                 THEN 0.5 * b.p * ln(2 * b.p / (a.p + b.p)) ELSE 0 END)
               AS jsd
      FROM p a JOIN p b ON b.yr = a.yr + 1 AND b.priority = a.priority
      GROUP BY 1, 2)
    SELECT year_a, year_b, ROUND(jsd, 6) AS jsd FROM j""",
)
def orders_priority_drift_q(spark, sf_dir):
    """Year-over-year Jensen-Shannon divergence of the order-priority
    mix — the distribution-shift alarm a training-data pipeline runs
    on every categorical feature. One aggregation of the fact scan
    to the |years| x |priorities| grid, a broadcast self-join on
    consecutive years, zero-guarded p*ln terms summed per year pair.
    All 5 priorities appear every year in this corpus; absent cells
    would drop out of the inner join identically on both engines."""
    o = load_tables(spark, sf_dir)["orders"]
    c = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").alias("n"))
    t = c.groupBy("yr").agg(F.sum("n").alias("tot"))
    p = c.join(t, "yr").select(
        "yr", "priority", (F.col("n") * 1.0 / F.col("tot")).alias("p")
    )
    a, b = p.alias("a"), p.alias("b")
    pa, pb = F.col("a.p"), F.col("b.p")
    term = F.when(
        pa > 0, 0.5 * pa * F.log(2 * pa / (pa + pb))
    ).otherwise(F.lit(0.0)) + F.when(
        pb > 0, 0.5 * pb * F.log(2 * pb / (pa + pb))
    ).otherwise(F.lit(0.0))
    return (
        a.join(
            F.broadcast(b),
            (F.col("b.yr") == F.col("a.yr") + 1)
            & (F.col("b.priority") == F.col("a.priority")),
        )
        .groupBy(
            F.col("a.yr").alias("year_a"), F.col("b.yr").alias("year_b")
        )
        .agg(F.round(F.sum(term), 6).alias("jsd"))
    )


@register(
    "brand_type_lift",
    # association-rule mining on the part dimension: lift of
    # (brand, type) co-occurrence vs independence, support-filtered
    # and top-20 by lift. Lift is a pure integer ratio
    # (c_bt * N) / (c_b * c_t) -> identical IEEE division on both
    # engines, so ORDER BY the unrounded value is deterministic
    # with the (brand, type) tie-break.
    """WITH bt AS (
      SELECT p_brand AS brand, p_type AS ptype, COUNT(*) AS c_bt
      FROM part GROUP BY 1, 2),
    b AS (SELECT p_brand AS brand, COUNT(*) AS c_b FROM part GROUP BY 1),
    t AS (SELECT p_type AS ptype, COUNT(*) AS c_t FROM part GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_total FROM part)
    SELECT bt.brand, bt.ptype,
           CAST(bt.c_bt AS BIGINT) AS support,
           ROUND(bt.c_bt * 1.0 * n.n_total / (b.c_b * t.c_t), 6) AS lift
    FROM bt JOIN b ON b.brand = bt.brand
            JOIN t ON t.ptype = bt.ptype
            CROSS JOIN n
    WHERE bt.c_bt >= 5
    ORDER BY bt.c_bt * 1.0 * n.n_total / (b.c_b * t.c_t) DESC,
             bt.brand, bt.ptype
    LIMIT 20""",
)
def brand_type_lift_q(spark, sf_dir):
    """Market-basket lift over the part dimension: observed
    (brand, type) frequency vs the independence expectation,
    support >= 5, top-20. Three aggregations of one dimension scan;
    the marginals and the 1-row total are broadcast back — no
    shuffle exceeds |brands| x |types|. The dimensional sibling of
    basket_pairs (which mines the order fact)."""
    part = load_tables(spark, sf_dir)["part"]
    bt = part.groupBy(
        F.col("p_brand").alias("brand"), F.col("p_type").alias("ptype")
    ).agg(F.count("*").alias("c_bt"))
    b = part.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count("*").alias("c_b")
    )
    t = part.groupBy(F.col("p_type").alias("ptype")).agg(
        F.count("*").alias("c_t")
    )
    n = part.agg(F.count("*").alias("n_total"))
    lift = F.col("c_bt") * 1.0 * F.col("n_total") / (F.col("c_b") * F.col("c_t"))
    return (
        bt.filter(F.col("c_bt") >= 5)
        .join(F.broadcast(b), "brand")
        .join(F.broadcast(t), "ptype")
        .crossJoin(F.broadcast(n))
        .select(
            "brand",
            "ptype",
            F.col("c_bt").cast("bigint").alias("support"),
            F.round(lift, 6).alias("lift"),
            lift.alias("_ord"),
        )
        .orderBy(F.col("_ord").desc(), "brand", "ptype")
        .limit(20)
        .drop("_ord")
    )


@register(
    "discount_qty_elasticity",
    # per-brand OLS of quantity on discount: both regressors live on
    # exact integer grids (qty 1..50, discount percent 0..10), so
    # Sx/Sy/Sxx/Syy/Sxy accumulate as BIGINTs — bit-stable under any
    # partition order — and the slope/correlation floats are single
    # divisions of integer expressions at the end. Slope is per unit
    # discount (the /100 percent unscale).
    """WITH d AS (
      SELECT p.p_brand AS brand,
             CAST(ROUND(l.l_discount * 100) AS BIGINT) AS x,
             CAST(l.l_quantity AS BIGINT) AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    s AS (
      SELECT brand, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM d GROUP BY 1)
    SELECT brand, CAST(n AS BIGINT) AS n_items,
           ROUND((n * sxy - sx * sy) * 100.0 / (n * sxx - sx * sx), 6)
             AS slope_per_discount,
           ROUND((n * sxy - sx * sy) /
                 SQRT((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)), 6)
             AS pearson_r
    FROM s""",
)
def discount_qty_elasticity_q(spark, sf_dir):
    """Per-brand discount elasticity: OLS slope (and Pearson r) of
    order quantity against discount across the lineitem-part join —
    the does-discounting-move-volume readout. The part dim
    broadcasts into the fact scan; per-brand integer moment sums
    (exact on the qty/discount-percent grids) make one shuffle of
    |brands| rows; floats appear only in the final divisions."""
    t = load_tables(spark, sf_dir)
    d = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey")
    ).select(
        F.col("p_brand").alias("brand"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x"),
        F.col("l_quantity").cast("bigint").alias("y"),
    )
    s = d.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_n = n * sxy - sx * sy
    return s.select(
        "brand",
        n.cast("bigint").alias("n_items"),
        F.round(cov_n * 100.0 / (n * sxx - sx * sx), 6).alias(
            "slope_per_discount"
        ),
        F.round(
            cov_n / F.sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)), 6
        ).alias("pearson_r"),
    )


@register(
    "customer_reorder_survival",
    # Kaplan-Meier estimator of time-to-second-order: event = the
    # reorder (gap days from first to second order), customers with
    # one order are right-censored at the corpus horizon. S(d) =
    # prod_{t<=d}(1 - d_t/n_t) evaluated as exp of the running sum
    # of ln((n_t-d_t)/n_t): every ln argument is an exact integer
    # ratio, and the cumulative sum runs in day order over the
    # BOUNDED distinct-gap-day series (<= horizon days), so both
    # engines accumulate identical doubles in identical order.
    """WITH o2 AS (
      SELECT o_custkey, MIN(o_orderdate) AS d1,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1),
    snd AS (
      SELECT o.o_custkey, MIN(o.o_orderdate) AS d2
      FROM orders o JOIN o2 ON o2.o_custkey = o.o_custkey
      WHERE o.o_orderdate > o2.d1
      GROUP BY 1),
    hz AS (SELECT MAX(o_orderdate) AS horizon FROM orders),
    dur AS (
      SELECT o2.o_custkey,
             CASE WHEN snd.d2 IS NOT NULL
                  THEN CAST(date_diff('day', o2.d1, snd.d2) AS BIGINT)
                  ELSE CAST(date_diff('day', o2.d1, hz.horizon) AS BIGINT)
             END AS dur,
             CASE WHEN snd.d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM o2 LEFT JOIN snd ON snd.o_custkey = o2.o_custkey
              CROSS JOIN hz),
    byday AS (
      SELECT dur AS day, SUM(ev) AS d_t, COUNT(*) AS leave_t
      FROM dur GROUP BY 1),
    km1 AS (
      SELECT day, d_t,
             (SELECT COUNT(*) FROM dur)
               - COALESCE(SUM(leave_t) OVER (
                   ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS n_t
      FROM byday),
    km AS (
      SELECT day, d_t, n_t,
             SUM(CASE WHEN d_t > 0 AND n_t > d_t
                 THEN ln((n_t - d_t) * 1.0 / n_t) ELSE 0 END)
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS lns,
             MAX(CASE WHEN d_t > 0 AND n_t = d_t THEN 1 ELSE 0 END)
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS hit_zero
      FROM km1)
    SELECT CAST(day AS BIGINT) AS gap_days,
           CAST(n_t AS BIGINT) AS n_at_risk,
           CAST(d_t AS BIGINT) AS n_reorders,
           CASE WHEN hit_zero = 1 THEN 0.0
                ELSE ROUND(exp(lns), 6) END AS survival
    FROM km WHERE d_t > 0""",
)
def customer_reorder_survival_q(spark, sf_dir):
    """Kaplan-Meier survival curve of time-to-reorder: at each gap
    day, the share of customers still without a second order,
    correctly handling one-order customers as right-censored at the
    corpus horizon — the churn-timing readout behind win-back
    campaign scheduling. Two customer-keyed MIN aggregations fold
    the fact table to one (duration, event) row per customer, then
    to the bounded distinct-day series; the KM product runs as a
    cumulative ln-sum window over that bounded series only."""
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir)["orders"]
    first = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("d1"))
    snd = (
        o.join(first, "o_custkey")
        .filter(F.col("o_orderdate") > F.col("d1"))
        .groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("d2"))
    )
    hz = o.agg(F.max("o_orderdate").alias("horizon"))
    dur = (
        first.join(snd, "o_custkey", "left")
        .crossJoin(F.broadcast(hz))
        .select(
            F.when(
                F.col("d2").isNotNull(), F.datediff("d2", "d1")
            )
            .otherwise(F.datediff("horizon", "d1"))
            .cast("bigint")
            .alias("dur"),
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    byday = dur.groupBy(F.col("dur").alias("day")).agg(
        F.sum("ev").alias("d_t"), F.count("*").alias("leave_t")
    )
    total = dur.agg(F.count("*").alias("n_total"))
    # bounded: the distinct gap-day series (<= horizon days), never
    # the customer table — see oracle comment
    w_prev = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    km = byday.crossJoin(F.broadcast(total)).withColumn(
        "n_t",
        F.col("n_total") - F.coalesce(F.sum("leave_t").over(w_prev), F.lit(0)),
    )
    km = km.withColumn(
        "lns",
        F.sum(
            F.when(
                (F.col("d_t") > 0) & (F.col("n_t") > F.col("d_t")),
                F.log(
                    (F.col("n_t") - F.col("d_t")) * 1.0 / F.col("n_t")
                ),
            ).otherwise(F.lit(0.0))
        ).over(w_cum),
    ).withColumn(
        # the day everyone still at risk reorders drives S to an
        # absorbing 0 (ln would blow up — flag it instead)
        "hit_zero",
        F.max(
            F.when(
                (F.col("d_t") > 0) & (F.col("n_t") == F.col("d_t")), 1
            ).otherwise(0)
        ).over(w_cum),
    )
    return km.filter(F.col("d_t") > 0).select(
        F.col("day").cast("bigint").alias("gap_days"),
        F.col("n_t").cast("bigint").alias("n_at_risk"),
        F.col("d_t").cast("bigint").alias("n_reorders"),
        F.when(F.col("hit_zero") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("lns"), 6))
        .alias("survival"),
    )


@register(
    "rfm_segment_migration",
    # customer-lifecycle flow: frequency-quintile segment in the
    # early half (1995-1997) vs the late half (1998+) of the order
    # history, as a segment x segment migration matrix over
    # customers active in BOTH periods. Cut points are exact
    # interpolated quintiles per period (the rfm_segments
    # convention: quantile_cont == Spark percentile on integers,
    # ties fall to the lower bucket); counts are integers and the
    # row share is one division.
    """WITH f AS (
      SELECT o_custkey,
             SUM(CASE WHEN o_orderdate < DATE '1998-01-01'
                      THEN 1 ELSE 0 END) AS f_early,
             SUM(CASE WHEN o_orderdate >= DATE '1998-01-01'
                      THEN 1 ELSE 0 END) AS f_late
      FROM orders GROUP BY 1),
    b AS (SELECT * FROM f WHERE f_early > 0 AND f_late > 0),
    cuts AS (
      SELECT quantile_cont(f_early, [0.2, 0.4, 0.6, 0.8]) AS ec,
             quantile_cont(f_late, [0.2, 0.4, 0.6, 0.8]) AS lc
      FROM b),
    seg AS (
      SELECT o_custkey,
             CAST(1 + (f_early > ec[1])::INT + (f_early > ec[2])::INT
                    + (f_early > ec[3])::INT + (f_early > ec[4])::INT
                  AS INT) AS seg_early,
             CAST(1 + (f_late > lc[1])::INT + (f_late > lc[2])::INT
                    + (f_late > lc[3])::INT + (f_late > lc[4])::INT
                  AS INT) AS seg_late
      FROM b CROSS JOIN cuts),
    m AS (SELECT seg_early, seg_late, CAST(COUNT(*) AS BIGINT) AS n
          FROM seg GROUP BY 1, 2),
    r AS (SELECT seg_early, SUM(n) AS row_n FROM m GROUP BY 1)
    SELECT m.seg_early, m.seg_late, m.n AS n_customers,
           ROUND(m.n * 1.0 / r.row_n, 6) AS share
    FROM m JOIN r ON r.seg_early = m.seg_early""",
)
def rfm_segment_migration_q(spark, sf_dir):
    """Segment migration matrix: which frequency quintile a customer
    lands in early (1995-97) vs late (1998+) — the upgrade/churn
    flow picture behind lifecycle marketing, built on rfm_segments'
    distributed cut-point bucketing (percentile aggregate broadcast
    back; no NTILE global window). One fact aggregation, a 1-row
    cuts broadcast, and a |5x5|-bounded matrix fold."""
    o = load_tables(spark, sf_dir)["orders"]
    f = o.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.col("o_orderdate") < "1998-01-01", 1).otherwise(0)
        ).alias("f_early"),
        F.sum(
            F.when(F.col("o_orderdate") >= "1998-01-01", 1).otherwise(0)
        ).alias("f_late"),
    ).filter((F.col("f_early") > 0) & (F.col("f_late") > 0))
    cuts = f.agg(
        F.expr("percentile(f_early, array(0.2, 0.4, 0.6, 0.8))").alias("ec"),
        F.expr("percentile(f_late, array(0.2, 0.4, 0.6, 0.8))").alias("lc"),
    )

    def seg(col, cut):
        s = F.lit(1)
        for i in range(4):
            s = s + F.when(F.col(col) > F.col(cut)[i], 1).otherwise(0)
        return s.cast("int")

    segd = f.crossJoin(F.broadcast(cuts)).select(
        seg("f_early", "ec").alias("seg_early"),
        seg("f_late", "lc").alias("seg_late"),
    )
    m = segd.groupBy("seg_early", "seg_late").agg(
        F.count("*").cast("bigint").alias("n_customers")
    )
    r = m.groupBy("seg_early").agg(F.sum("n_customers").alias("row_n"))
    return m.join(F.broadcast(r), "seg_early").select(
        "seg_early",
        "seg_late",
        "n_customers",
        F.round(F.col("n_customers") * 1.0 / F.col("row_n"), 6).alias("share"),
    )


@register(
    "orders_gap_burstiness",
    # Goh-Barabasi burstiness of each customer's inter-order gaps:
    # B = (sigma - mu) / (sigma + mu) in [-1, 1) — -1 is a perfect
    # metronome, 0 is Poisson, ->1 is bursty. Gap moments are exact
    # BIGINT day sums per customer (population sigma via
    # sqrt((n*ss - s*s)) / n); the single sqrt/division runs on
    # identical integers. Customers need >= 3 orders (>= 2 gaps) or
    # sigma is degenerate.
    """WITH g AS (
      SELECT o_custkey,
             CAST(date_diff('day',
                  lag(o_orderdate) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS BIGINT) AS gap
      FROM orders),
    m AS (
      SELECT o_custkey AS c_custkey, COUNT(*) AS n,
             SUM(gap) AS s, SUM(gap * gap) AS ss
      FROM g WHERE gap IS NOT NULL
      GROUP BY 1 HAVING COUNT(*) >= 2)
    SELECT c_custkey, CAST(n AS BIGINT) AS n_gaps,
           ROUND(s * 1.0 / n, 6) AS mean_gap_days,
           ROUND((SQRT(n * ss - s * s) - s) /
                 (SQRT(n * ss - s * s) + s), 6) AS burstiness
    FROM m WHERE s > 0""",
)
def orders_gap_burstiness_q(spark, sf_dir):
    """Burstiness coefficient (Goh & Barabasi 2008) of each
    customer's order cadence: separates metronome-regular buyers
    (B near -1) from bursty binge buyers (B > 0) where the plain
    mean gap (orders_reorder_interval) can't tell them apart. One
    customer-partitioned lag window over orders, BIGINT gap moments,
    one sqrt per customer. Note (sigma-mu)/(sigma+mu) =
    (sqrt(n*ss-s*s) - s)/(sqrt(n*ss-s*s) + s) after multiplying
    through by n — all-integer under the sqrt."""
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("gap"),
    ).filter(F.col("gap").isNotNull())
    m = (
        g.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count("*").alias("n"),
            F.sum("gap").alias("s"),
            F.sum(F.col("gap") * F.col("gap")).alias("ss"),
        )
        .filter((F.col("n") >= 2) & (F.col("s") > 0))
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    sig = F.sqrt(n * ss - s * s)
    return m.select(
        "c_custkey",
        n.cast("bigint").alias("n_gaps"),
        F.round(s * 1.0 / n, 6).alias("mean_gap_days"),
        F.round((sig - s) / (sig + s), 6).alias("burstiness"),
    )


@register(
    "lineitem_qty_price_mi",
    # mutual information between quantity band and price band on a
    # FIXED grid (qty deciles of the 1..50 grid; price in 20k-wide
    # bands) — how much knowing the order size tells you about the
    # price. I = sum p(x,y) ln(p(x,y) N / (c_x c_y)) from integer
    # cell counts; every log argument is an exact integer ratio.
    # floor() before the BIGINT cast: DuckDB's double->BIGINT cast
    # rounds-to-nearest while Spark's truncates — on boundary prices
    # the bands would shift and the marginals drift
    """WITH b AS (
      SELECT CAST(floor(l_quantity - 1) AS BIGINT) // 5 AS qb,
             CAST(floor(l_extendedprice) AS BIGINT) // 20000 AS pb
      FROM lineitem),
    c AS (SELECT qb, pb, COUNT(*) AS n_xy FROM b GROUP BY 1, 2),
    mx AS (SELECT qb, SUM(n_xy) AS n_x FROM c GROUP BY 1),
    my AS (SELECT pb, SUM(n_xy) AS n_y FROM c GROUP BY 1),
    t AS (SELECT SUM(n_xy) AS n FROM c)
    SELECT c.qb AS qty_band, c.pb AS price_band,
           CAST(c.n_xy AS BIGINT) AS n_items,
           ROUND(c.n_xy * 1.0 / t.n
                 * ln(c.n_xy * 1.0 * t.n / (mx.n_x * my.n_y)), 6)
             AS mi_contrib
    FROM c JOIN mx USING (qb) JOIN my USING (pb) CROSS JOIN t""",
)
def lineitem_qty_price_mi_q(spark, sf_dir):
    """Per-cell mutual-information contributions between quantity
    and price bands on a fixed grid — the dependence screen run
    before trusting a univariate histogram to model a 2-D
    distribution (complements lineitem_correlations' linear-only
    Pearson). One fact aggregation to the bounded band grid; the
    marginals broadcast back; all logs see exact integer ratios."""
    li = load_tables(spark, sf_dir)["lineitem"]
    b = li.select(
        ((F.col("l_quantity") - 1).cast("bigint") / 5)
        .cast("bigint")
        .alias("qb"),
        (F.col("l_extendedprice").cast("bigint") / 20000)
        .cast("bigint")
        .alias("pb"),
    )
    c = b.groupBy("qb", "pb").agg(F.count("*").alias("n_xy"))
    mx = c.groupBy("qb").agg(F.sum("n_xy").alias("n_x"))
    my = c.groupBy("pb").agg(F.sum("n_xy").alias("n_y"))
    t = c.agg(F.sum("n_xy").alias("n"))
    return (
        c.join(F.broadcast(mx), "qb")
        .join(F.broadcast(my), "pb")
        .crossJoin(F.broadcast(t))
        .select(
            F.col("qb").alias("qty_band"),
            F.col("pb").alias("price_band"),
            F.col("n_xy").cast("bigint").alias("n_items"),
            F.round(
                F.col("n_xy")
                * 1.0
                / F.col("n")
                * F.log(
                    F.col("n_xy") * 1.0 * F.col("n")
                    / (F.col("n_x") * F.col("n_y"))
                ),
                6,
            ).alias("mi_contrib"),
        )
    )


@register(
    "lineitem_theil_index",
    # Theil-T inequality decomposition of customer revenue by nation:
    # within-nation terms are nano-quantized per CUSTOMER before the
    # per-nation integer sum (engine-exact up to one ln per customer,
    # the vocab_kl_by_source convention); the between term is a pure
    # scalar expression of exact DECIMAL sums. Revenue and means come
    # from exact DECIMAL accumulation cast to DOUBLE once.
    """WITH cust AS (
      SELECT o.o_custkey, c.c_nationkey,
             CAST(SUM(o.o_totalprice) AS DOUBLE) AS x
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2),
    g AS (SELECT c_nationkey, COUNT(*) AS ng,
                 CAST(SUM(x) AS DOUBLE) AS tg
          FROM cust GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS DOUBLE) AS t FROM cust),
    terms AS (
      SELECT cu.c_nationkey,
             CAST(floor((cu.x / (g.tg / g.ng))
                        * ln(cu.x / (g.tg / g.ng)) * 1000000000)
                  AS BIGINT) AS w
      FROM cust cu JOIN g ON g.c_nationkey = cu.c_nationkey)
    SELECT n.n_name AS nation,
           CAST(g.ng AS BIGINT) AS n_cust,
           ROUND(g.tg / g.ng, 6) AS mean_rev,
           ROUND(SUM(te.w) / 1000000000.0 / g.ng, 6) AS theil_within,
           ROUND((g.ng * 1.0 / tot.n) * ((g.tg / g.ng) / (tot.t / tot.n))
                 * ln((g.tg / g.ng) / (tot.t / tot.n)), 6) AS between_term
    FROM terms te
    JOIN g ON g.c_nationkey = te.c_nationkey
    JOIN nation n ON n.n_nationkey = te.c_nationkey
    CROSS JOIN tot
    GROUP BY n.n_name, g.ng, g.tg, tot.n, tot.t""",
)
def lineitem_theil_index_q(spark, sf_dir):
    """Theil-T revenue inequality decomposed by nation — the
    between/within split Gini can't give (VERDICT r2-class stats
    family next to revenue_gini/revenue_lorenz): per nation the
    within-group Theil over its customers plus its between-group
    contribution; SUM(within_g * ng/n * mug/mu) + SUM(between) is
    the corpus Theil. One customer-revenue aggregation (DECIMAL
    exact), one tiny per-nation rollup broadcast back, per-customer
    ln terms nano-quantized before the integer sum — scan-bound, no
    windows, scales."""
    t = load_tables(spark, sf_dir)
    # checkpointed: three consumers (per-nation rollup, grand total,
    # per-customer terms) would otherwise each re-scan the orders
    # fact; the materialized frame is customer-dimension-sized
    cust = (
        t["orders"]
        .join(
            t["customer"].select(
                F.col("c_custkey").alias("o_custkey"), "c_nationkey"
            ),
            "o_custkey",
        )
        .groupBy("o_custkey", "c_nationkey")
        .agg(F.sum("o_totalprice").cast("double").alias("x"))
        .localCheckpoint()
    )
    g = cust.groupBy("c_nationkey").agg(
        F.count("*").alias("ng"), F.sum("x").cast("double").alias("tg")
    )
    tot = cust.agg(
        F.count("*").alias("n"), F.sum("x").cast("double").alias("t")
    )
    mug = F.col("tg") / F.col("ng")
    terms = cust.join(F.broadcast(g), "c_nationkey").select(
        "c_nationkey",
        F.floor((F.col("x") / mug) * F.log(F.col("x") / mug) * 1e9)
        .cast("bigint")
        .alias("w"),
    )
    mu = F.col("t") / F.col("n")
    return (
        terms.groupBy("c_nationkey")
        .agg(F.sum("w").alias("sw"))
        .join(F.broadcast(g), "c_nationkey")
        .join(
            F.broadcast(
                load_tables(spark, sf_dir)["nation"].select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_name"
                )
            ),
            "c_nationkey",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n_name").alias("nation"),
            F.col("ng").cast("bigint").alias("n_cust"),
            F.round(mug, 6).alias("mean_rev"),
            F.round(F.col("sw") / 1e9 / F.col("ng"), 6).alias("theil_within"),
            F.round(
                (F.col("ng") * 1.0 / F.col("n"))
                * (mug / mu)
                * F.log(mug / mu),
                6,
            ).alias("between_term"),
        )
    )


@register(
    "orders_fulfillment_curve",
    # order-to-ship fulfillment distribution: latency days are a
    # bounded integer value grid (TPC-H ship <= order + ~4 months),
    # so the cumulative window input is grid-bounded, never
    # |lineitem|-bounded. Counts exact BIGINT; one division per row.
    """WITH d AS (
      SELECT date_diff('day', o.o_orderdate, l.l_shipdate) AS days,
             COUNT(*) AS n
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1),
    c AS (SELECT days, n,
                 SUM(n) OVER (ORDER BY days) AS cum,
                 SUM(n) OVER () AS tot
          FROM d)
    SELECT CAST(days AS INT) AS days,
           CAST(n AS BIGINT) AS n_items,
           CAST(cum AS BIGINT) AS cum_items,
           ROUND(cum * 1.0 / tot, 6) AS cum_share
    FROM c""",
)
def orders_fulfillment_curve_q(spark, sf_dir):
    """Supply-chain fill-rate curve: share of line items SHIPPED
    (order-to-ship, l_shipdate — not receipt) within k days of the
    order date, for every observed k — the SLA readout next to
    orders_ship_latency's percentile view. One
    fact-scan aggregation collapses to the bounded integer latency
    grid (~130 distinct day values), then a cumulative window over
    that tiny series (plan-guard whitelisted like lineitem_ks_test)."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    d = (
        t["lineitem"]
        .join(
            t["orders"].select(
                F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
            ),
            "l_orderkey",
        )
        .groupBy(
            F.datediff("l_shipdate", "o_orderdate").alias("days")
        )
        .agg(F.count("*").alias("n"))
    )
    # bounded: the latency value grid (~130 distinct int days), never
    # |lineitem| — same class as lineitem_ks_test's quantity grid
    wcum = Window.orderBy("days").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return d.select(
        F.col("days").cast("int").alias("days"),
        F.col("n").cast("bigint").alias("n_items"),
        F.sum("n").over(wcum).cast("bigint").alias("cum_items"),
        F.round(
            F.sum("n").over(wcum) * 1.0 / F.sum("n").over(wall), 6
        ).alias("cum_share"),
    )


@register(
    "lineitem_trimmed_mean",
    # 5%-trimmed mean: robust location estimate per (returnflag,
    # linestatus) — drops the k = n*5//100 smallest and largest
    # cent values by EXACT rank under a total order (cents,
    # orderkey, linenumber), so the kept multiset is identical on
    # both engines; sums are exact BIGINT cents, one division per
    # group at the end. The robust companion to orders_price_mad's
    # spread view (r10).
    """WITH v AS (
      SELECT l_returnflag, l_linestatus,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
             l_orderkey, l_linenumber
      FROM lineitem),
    r AS (
      SELECT l_returnflag, l_linestatus, cents,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag, l_linestatus
               ORDER BY cents, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (
               PARTITION BY l_returnflag, l_linestatus) AS n
      FROM v),
    k AS (SELECT *, n * 5 // 100 AS cut FROM r)
    SELECT l_returnflag, l_linestatus,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(SUM(cents) / 100.0 / COUNT(*), 6) AS trimmed_mean
    FROM k WHERE rn > cut AND rn <= n - cut
    GROUP BY l_returnflag, l_linestatus""",
)
def lineitem_trimmed_mean_q(spark, sf_dir):
    """5%-trimmed mean of extended price per (returnflag,
    linestatus): rank-based trimming under a TOTAL order (cents,
    orderkey, linenumber breaks ties deterministically), so both
    engines keep the identical row multiset — no percentile
    interpolation to disagree on. Group-partitioned windows; exact
    BIGINT cent sums; the robust-location companion to
    orders_price_mad (r10)."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    # floor-quantize the IEEE product (NOT a bare cast: Spark's
    # double->bigint cast truncates while DuckDB's rounds — the
    # repo's documented floor-quantize learning)
    v = t["lineitem"].select(
        "l_returnflag",
        "l_linestatus",
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    grp = Window.partitionBy("l_returnflag", "l_linestatus")
    r = v.select(
        "l_returnflag",
        "l_linestatus",
        "cents",
        F.row_number()
        .over(grp.orderBy("cents", "l_orderkey", "l_linenumber"))
        .alias("rn"),
        F.count("*").over(grp).alias("n"),
    ).withColumn("cut", F.expr("div(n * 5, 100)"))
    return (
        r.filter((F.col("rn") > F.col("cut")) & (F.col("rn") <= F.col("n") - F.col("cut")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.max("n").cast("bigint").alias("n_rows"),
            F.count("*").cast("bigint").alias("n_kept"),
            F.round(F.sum("cents") / 100.0 / F.count("*"), 6).alias(
                "trimmed_mean"
            ),
        )
    )


@register(
    "lineitem_grubbs",
    # Grubbs' max-deviation outlier statistic per (returnflag,
    # linestatus): G = max|x - mean| / s over extended-price cents.
    # Single-pass algebra: max|n*x - S| = GREATEST(n*max - S,
    # S - n*min) because n*x - S is monotone in x — so ONE hash
    # aggregate per group, no second pass over rows. dev_max is an
    # exact integer; the variance term n*SS - S^2 accumulates in
    # 128-bit integers (HUGEINT here, DECIMAL(38,0) in Spark — cent
    # squares overflow BIGINT at corpus scale), and both engines
    # share the single final float expression. The tail-screening
    # companion to orders_price_mad (robust spread) and
    # lineitem_trimmed_mean (robust location) (r10).
    """WITH v AS (
      SELECT l_returnflag, l_linestatus,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem),
    a AS (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS s,
             SUM(CAST(cents AS HUGEINT) * cents) AS ss,
             MAX(cents) AS mx, MIN(cents) AS mn
      FROM v GROUP BY 1, 2)
    SELECT l_returnflag, l_linestatus,
           CAST(n AS BIGINT) AS n_rows,
           CAST(GREATEST(n * mx - s, s - n * mn) AS BIGINT) AS dev_max,
           CASE WHEN n > 1 AND n * ss - s * s > 0
           THEN ROUND(GREATEST(n * mx - s, s - n * mn)
                      * sqrt((n - 1) * 1.0
                             / (n * CAST(n * ss - s * s AS DOUBLE))), 6)
           END AS g_stat
    FROM a""",
)
def lineitem_grubbs_q(spark, sf_dir):
    """Grubbs' outlier statistic (max studentized deviation) of
    extended price per (returnflag, linestatus) — the is-the-max-
    an-outlier screen run before trusting group means. One hash
    aggregate per group: the max deviation folds to GREATEST(
    n*max - S, S - n*min) (monotone in x), cent moments stay exact
    integers (DECIMAL(38,0) for the squares — they pass BIGINT
    range at warehouse scale), one shared float expression (r10)."""
    t = load_tables(spark, sf_dir)
    v = t["lineitem"].select(
        "l_returnflag",
        "l_linestatus",
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    c = F.col("cents")
    a = v.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(c).alias("s"),
        F.sum(c.cast("decimal(38,0)") * c).alias("ss"),
        F.max(c).alias("mx"),
        F.min(c).alias("mn"),
    )
    n, s = F.col("n"), F.col("s")
    dev = F.greatest(n * F.col("mx") - s, s - n * F.col("mn"))
    den = n.cast("decimal(19,0)") * F.col("ss") - s.cast(
        "decimal(19,0)"
    ) * s.cast("decimal(19,0)")
    return a.select(
        "l_returnflag",
        "l_linestatus",
        n.cast("bigint").alias("n_rows"),
        dev.cast("bigint").alias("dev_max"),
        F.when(
            (n > 1) & (den > 0),
            F.round(
                dev
                * F.sqrt(
                    (n - 1) * F.lit(1.0) / (n * den.cast("double"))
                ),
                6,
            ),
        ).alias("g_stat"),
    )


@register(
    "basket_rules",
    # Association RULES on top of the basket_pairs co-occurrence
    # level: every surviving pair (support >= 3) emits both
    # directions A=>B and B=>A with support, confidence
    # supp(AB)/supp(A) and lift supp(AB)*N/(supp(A)*supp(B)) — the
    # Apriori rule-generation step that turns co-occurrence counts
    # into actionable implications. Integer-exact engine parity:
    # confidence and lift are ratios of exact counts, rounded once;
    # ordering is (lift DESC by the cross-multiplied integer
    # comparison via the rounded value, then the rule key) with a
    # top-100 cap.
    """WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM items),
    freq AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS c FROM items
             GROUP BY 1),
    pairs AS (
      SELECT a.pk AS pa, b.pk AS pb, CAST(COUNT(*) AS BIGINT) AS ab
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
      HAVING COUNT(*) >= 3
    ),
    rules AS (
      SELECT pa AS antecedent, pb AS consequent, ab,
             fa.c AS ca, fb.c AS cb
      FROM pairs JOIN freq fa ON fa.pk = pairs.pa
                 JOIN freq fb ON fb.pk = pairs.pb
      UNION ALL
      SELECT pb, pa, ab, fb.c, fa.c
      FROM pairs JOIN freq fa ON fa.pk = pairs.pa
                 JOIN freq fb ON fb.pk = pairs.pb
    ),
    scored AS (
      SELECT antecedent, consequent, ab AS pair_support,
             ROUND(ab * 1.0 / ca, 6) AS confidence,
             ROUND(ab * 1.0 * n.n / (ca * cb), 6) AS lift
      FROM rules CROSS JOIN n
    )
    SELECT antecedent, consequent, pair_support, confidence, lift,
           CAST(rn AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY lift DESC, antecedent, consequent) AS rn
      FROM scored)
    WHERE rn <= 100""",
)
def basket_rules_q(spark, sf_dir):
    """Apriori rule generation over the level-2 co-occurrence pairs:
    each surviving pair emits A=>B and B=>A with support, confidence
    and lift from exact integer counts (one distinct-items scan
    shared by the pair self-join and the item frequencies; the
    global top-100 is a TakeOrdered, bounded). The implication
    companion to basket_pairs / brand_type_lift (r10)."""
    from pyspark.sql import Window

    # one checkpointed basket-array build feeds n, the item
    # frequencies AND the pair counts (r11; was: a distinct item
    # table re-shuffled for the self-join plus a separate distinct
    # count for n)
    baskets = _baskets(spark, sf_dir).localCheckpoint()
    n = baskets.count()
    freq = (
        baskets.select(F.explode("items").alias("pk"))
        .groupBy("pk")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    pairs = (
        baskets.select(F.explode(F.expr(_BASKET_PAIR_EXPR)).alias("p"))
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count("*").cast("bigint").alias("ab"))
        .filter(F.col("ab") >= 3)
    )
    fa = freq.select(F.col("pk").alias("pa"), F.col("c").alias("ca"))
    fb = freq.select(F.col("pk").alias("pb"), F.col("c").alias("cb"))
    base = pairs.join(F.broadcast(fa), "pa").join(F.broadcast(fb), "pb")
    fwd = base.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        F.col("ab"),
        F.col("ca"),
        F.col("cb"),
    )
    rev = base.select(
        F.col("pb").alias("antecedent"),
        F.col("pa").alias("consequent"),
        F.col("ab"),
        F.col("cb").alias("ca"),
        F.col("ca").alias("cb"),
    )
    scored = fwd.unionByName(rev).select(
        "antecedent",
        "consequent",
        F.col("ab").alias("pair_support"),
        F.round(F.col("ab") * 1.0 / F.col("ca"), 6).alias("confidence"),
        F.round(
            F.col("ab") * F.lit(1.0) * F.lit(n) / (F.col("ca") * F.col("cb")),
            6,
        ).alias("lift"),
    )
    # unpartitioned Window is BOUNDED: it ranks the post-limit(100)
    # frame (orderBy+limit = distributed TakeOrdered), never the
    # full rule table — the basket_pairs pattern
    w = Window.orderBy(F.col("lift").desc(), "antecedent", "consequent")
    return (
        scored.orderBy(F.col("lift").desc(), "antecedent", "consequent")
        .limit(100)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )
