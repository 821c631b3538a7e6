"""TPC-H-shaped multi-join queries (VERDICT.md next-round #8): 3–6-table
plans that exercise join reordering, AQE, and broadcast of the small dims.
Filters are calibrated to the synthetic testdata's 1995–2001 date range.

Plan guards (tests/test_tpch_plans.py) assert the dims are broadcast and
no cartesian product sneaks in. Top-k outputs carry a deterministic
tiebreak so the LIMIT is stable across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import q, t


@q(
    "tpch_q3",
    """SELECT l_orderkey, o_orderdate,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM customer, orders, lineitem
       WHERE c_mktsegment = 'BUILDING'
         AND c_custkey = o_custkey
         AND l_orderkey = o_orderkey
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY revenue DESC, l_orderkey
       LIMIT 10""",
)
def tpch_q3(spark, sf):
    """Q3 shape: shipping-priority — customer ⋈ orders ⋈ lineitem with
    filters on both sides of the fact join, then top-k by revenue."""
    c = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "o_orderdate", "revenue")
    )


@q(
    "tpch_q5",
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM customer, orders, lineitem, supplier, nation, region
       WHERE c_custkey = o_custkey
         AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey
         AND c_nationkey = s_nationkey
         AND s_nationkey = n_nationkey
         AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY n_name""",
)
def tpch_q5(spark, sf):
    """Q5 shape: local-supplier revenue — the 6-table join. nation/region/
    supplier are dims (broadcast); lineitem ⋈ orders is the fact join."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@q(
    "tpch_q10",
    """SELECT c_custkey, c_name, n_name,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM customer, orders, lineitem, nation
       WHERE c_custkey = o_custkey
         AND l_orderkey = o_orderkey
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         AND l_returnflag = 'R'
         AND c_nationkey = n_nationkey
       GROUP BY c_custkey, c_name, n_name
       ORDER BY revenue DESC, c_custkey
       LIMIT 20""",
)
def tpch_q10(spark, sf):
    """Q10 shape: returned-item reporting — 4-table join, top-20 customers
    by lost revenue."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


# ---------------------------------------------------------------------------
# Subquery family (round 5): the canonical TPC-H subquery shapes adapted to
# the synthetic schema (no partsupp / commit / receipt columns in testdata).
# These exercise the Catalyst rewrites the multi-join family does not:
# correlated EXISTS -> left-semi with a non-equi conjunct (q4), IN over a
# grouped HAVING -> aggregate-then-semi (q18), EXISTS + NOT EXISTS self-joins
# on the fact table (q21), and a scalar subquery broadcast + anti join (q22).
# All are `extra=True`: full DuckDB parity via scripts/check_oracle.py
# without touching the frozen 50-entry driver gate.
# ---------------------------------------------------------------------------


@q(
    "tpch_q1",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
              round(avg(l_quantity), 4) AS avg_qty,
              round(avg(l_extendedprice), 4) AS avg_price,
              round(avg(l_discount), 4) AS avg_disc,
              count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
    extra=True,
)
def tpch_q1(spark, sf):
    """Q1 shape: the pricing-summary scan-heavy aggregate — one pass, eight
    aggregates, tiny group count. The plan to expect at 100 TB: partial
    hash-aggregate map-side (8 groups cross the exchange, not 6B rows)."""
    li = t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@q(
    "tpch_q4",
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority""",
    extra=True,
)
def tpch_q4(spark, sf):
    """Q4 shape: correlated EXISTS (order has a lineitem shipping >30 days
    after the order date — the testdata's analogue of receipt>commit).
    Expressed as a left-semi join whose condition carries the correlated
    non-equi conjunct; the equi part (orderkey) keys the shuffle, so the
    semi stays a hash/sort-merge join — never a nested loop."""
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@q(
    "tpch_q18",
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
              round(sum(l_quantity), 2) AS total_qty
       FROM customer, orders, lineitem
       WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                            GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
         AND c_custkey = o_custkey
         AND o_orderkey = l_orderkey
       GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
       ORDER BY o_totalprice DESC, o_orderkey
       LIMIT 20""",
    extra=True,
)
def tpch_q18(spark, sf):
    """Q18 shape: large-volume customers — IN over a grouped HAVING becomes
    aggregate-then-left-semi on the fact key. The aggregate runs FIRST so
    only qualifying orderkeys (p99 of the qty distribution) reach the
    3-table join; at 100 TB the semi's build side is ~1% of orders."""
    li = t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select("l_orderkey")
    )
    orders = t(spark, sf, "orders")
    o = orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
    c = t(spark, sf, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
    )


@q(
    "tpch_q21",
    """SELECT s_name, count(*) AS numwait
       FROM supplier, lineitem l1, orders, nation
       WHERE s_suppkey = l1.l_suppkey
         AND o_orderkey = l1.l_orderkey
         AND o_orderstatus = 'F'
         AND l1.l_returnflag = 'R'
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_returnflag = 'R')
         AND s_nationkey = n_nationkey
         AND n_name = 'NATION_3'
       GROUP BY s_name
       ORDER BY numwait DESC, s_name
       LIMIT 20""",
    extra=True,
)
def tpch_q21(spark, sf):
    """Q21 shape: suppliers-who-kept-orders-waiting — the sole supplier at
    fault on a multi-supplier order (returnflag='R' stands in for
    receipt>commit). EXISTS -> left-semi and NOT EXISTS -> left-anti
    against two aliases of the fact table, both keyed on l_orderkey with
    the <> conjunct riding the join condition; the `<>` never degrades
    the join to a nested loop because the equi key carries the shuffle."""
    li = t(spark, sf, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.alias("l2")
    l3 = li.filter(F.col("l_returnflag") == "R").alias("l3")
    o = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    waiting = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
        .select("s_name", "numwait")
    )


@q(
    "tpch_q22",
    """SELECT c_nationkey AS cntry, count(*) AS numcust,
              round(sum(c_acctbal), 2) AS totacctbal
       FROM customer
       WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                          WHERE c_acctbal > 0.0)
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
       GROUP BY c_nationkey
       ORDER BY cntry""",
    extra=True,
)
def tpch_q22(spark, sf):
    """Q22 shape: global-sales-opportunity — an uncorrelated scalar subquery
    (the positive-balance average) plus NOT EXISTS. The scalar aggregates
    to ONE row and is broadcast (BroadcastNestedLoopJoin over a 1-row build
    side — constant cost at any scale); the NOT EXISTS is a left-anti on
    the customer key. No customer-x-customer comparison ever happens."""
    c = t(spark, sf, "customer")
    threshold = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    o_f = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o_f, c.c_custkey == o_f.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntry")
    )
