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
    # r6: join orders to the BUILDING customers FIRST — the segment filter
    # keeps ~1/5 of customers, so the order set entering the fact join
    # shrinks 5x before lineitem probes it (one smaller broadcast build,
    # fewer probe hits). Inner-join reordering; result oracle-verified.
    oc = o.join(c, o.o_custkey == c.c_custkey)
    return (
        li.join(oc, li.l_orderkey == oc.o_orderkey)
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
    # r6: resolve the region->nation->supplier dim chain FIRST (suppliers in
    # ASIA = 1/5 of suppliers), so the very first probe over lineitem drops
    # 4/5 of the fact rows before the orders/customer joins — the canonical
    # Q5 shape. Inner-join reordering; result oracle-verified.
    sa = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        li.join(F.broadcast(sa), li.l_suppkey == sa.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, (o.o_custkey == c.c_custkey) & (sa.s_nationkey == c.c_nationkey))
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
    # r6: measured both orderings — pre-joining orders⋈customer⋈nation into
    # one build side is SLOWER here (0.85s vs 0.56s at sf1.0): customer is
    # unfiltered, so the pre-join pays a 378k-row shuffle the sequential
    # broadcast probes avoid. Kept the original chain deliberately.
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


# ---------------------------------------------------------------------------
# Full-suite completion (round 5): the 14 remaining TPC-H query shapes,
# adapted to the synthetic schema. partsupp does not exist in the testdata,
# so Q2/Q9/Q11/Q16/Q20 derive the part-supplier relation from DISTINCT
# (l_partkey, l_suppkey) pairs and stand in ps_supplycost/ps_availqty with
# p_retailprice / shipped-quantity aggregates; Q12's commit/receipt lateness
# becomes ship-lag vs the order date, and Q13/Q16's comment filters become
# o_orderpriority / s_acctbal predicates. Every query keeps its canonical
# Catalyst rewrite: Q2 correlated-scalar-max -> window/self-agg join, Q8's
# two nation roles, Q15's uncorrelated scalar max, Q17's per-part correlated
# average, Q19's disjunctive join predicate, Q20's doubly-nested IN. All are
# extra=True: full DuckDB parity via scripts/check_oracle.py.
# ---------------------------------------------------------------------------


@q(
    "tpch_q2",
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
            eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
                   FROM supplier, nation, region
                   WHERE s_nationkey = n_nationkey
                     AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
       SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
              p_partkey, p_name
       FROM part, ps, eu
       WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
         AND p_size <= 10 AND p_type = 'LARGE'
         AND s_acctbal = (SELECT max(eu2.s_acctbal)
                          FROM ps ps2, eu eu2
                          WHERE ps2.l_partkey = p_partkey
                            AND eu2.s_suppkey = ps2.l_suppkey)
       ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
       LIMIT 100""",
    extra=True,
)
def tpch_q2(spark, sf):
    """Q2 shape: minimum-cost supplier — the correlated scalar subquery
    (best account balance among a part's European suppliers, standing in
    for min ps_supplycost). Expressed as a window max over the part key on
    the already-joined candidates: ONE pass, no re-join of the subquery —
    the plan Catalyst would produce from the decorrelated form anyway."""
    from pyspark.sql import Window

    ps = t(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = t(spark, sf, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    cand = (
        ps.join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey)
        .join(p, ps.l_partkey == p.p_partkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("max_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("max_bal"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name", "n_name", "p_partkey", "p_name",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@q(
    "tpch_q6",
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
    extra=True,
)
def tpch_q6(spark, sf):
    """Q6 shape: forecasting-revenue-change — the pure scan+filter+agg
    query. At 100 TB all three predicates push into the parquet scan
    (PushedFilters) and ONE double crosses the exchange."""
    li = t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@q(
    "tpch_q7",
    """SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
       FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                    year(l_shipdate) AS l_year,
                    l_extendedprice * (1 - l_discount) AS volume
             FROM supplier, lineitem, orders, customer, nation n1, nation n2
             WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
               AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
               AND c_nationkey = n2.n_nationkey
               AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
               AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                  AND TIMESTAMP '1997-12-31 00:00:00') shipping
       GROUP BY supp_nation, cust_nation, l_year
       ORDER BY supp_nation, cust_nation, l_year""",
    extra=True,
)
def tpch_q7(spark, sf):
    """Q7 shape: volume shipping between two nations — nation joined TWICE
    in different roles (supplier side / customer side) with a disjunctive
    cross-role predicate. Both nation copies broadcast; the disjunction is
    a post-join filter over two broadcast attributes, never a cartesian."""
    s = t(spark, sf, "supplier")
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31 00:00:00").cast("timestamp"))
    )
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    n1 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@q(
    "tpch_q8",
    """SELECT o_year,
              round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                    / sum(volume), 6) AS mkt_share
       FROM (SELECT year(o_orderdate) AS o_year,
                    l_extendedprice * (1 - l_discount) AS volume,
                    n2.n_name AS nation
             FROM part, supplier, lineitem, orders, customer,
                  nation n1, nation n2, region
             WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
               AND l_orderkey = o_orderkey AND o_custkey = c_custkey
               AND c_nationkey = n1.n_nationkey
               AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
               AND s_nationkey = n2.n_nationkey
               AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                   AND TIMESTAMP '1997-12-31 00:00:00'
               AND p_type = 'ECONOMY') all_nations
       GROUP BY o_year
       ORDER BY o_year""",
    extra=True,
)
def tpch_q8(spark, sf):
    """Q8 shape: national market share — the 8-table join with nation in
    two roles (market region via customer, share nation via supplier) and
    a conditional-aggregate ratio. part/supplier/nation/region broadcast;
    the only shuffles are the two fact-side equi joins."""
    p = t(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
    s = t(spark, sf, "supplier")
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31 00:00:00").cast("timestamp"))
    )
    c = t(spark, sf, "customer")
    n1 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("volume", vol)
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(
                        0.0
                    )
                )
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@q(
    "tpch_q9",
    """SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
       FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
                    l_extendedprice * (1 - l_discount)
                      - 0.5 * p_retailprice * l_quantity AS amount
             FROM part, supplier, lineitem, orders, nation
             WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
               AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
               AND p_name LIKE '%red%') profit
       GROUP BY nation, o_year
       ORDER BY nation, o_year DESC""",
    extra=True,
)
def tpch_q9(spark, sf):
    """Q9 shape: product-type profit — 5-table join grouped by supplier
    nation and order year. ps_supplycost does not exist in the testdata;
    unit cost is stood in by 0.5 * p_retailprice, preserving the
    profit-expression shape (revenue minus quantity-scaled cost)."""
    p = t(spark, sf, "part").filter(F.col("p_name").like("%red%"))
    s = t(spark, sf, "supplier")
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    n = t(spark, sf, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@q(
    "tpch_q11",
    """SELECT l_partkey AS ps_partkey,
              round(sum(l_extendedprice * l_quantity), 2) AS part_value
       FROM lineitem, supplier, nation
       WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
         AND n_name = 'NATION_7'
       GROUP BY l_partkey
       HAVING sum(l_extendedprice * l_quantity) >
              (SELECT sum(l_extendedprice * l_quantity) * 0.001
               FROM lineitem, supplier, nation
               WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
                 AND n_name = 'NATION_7')
       ORDER BY part_value DESC, ps_partkey""",
    extra=True,
)
def tpch_q11(spark, sf):
    """Q11 shape: important stock — a grouped aggregate filtered by an
    uncorrelated scalar subquery over the SAME aggregate input (fraction of
    the national total). ps_supplycost*ps_availqty is stood in by shipped
    value sum(l_extendedprice*l_quantity). The base (nation-filtered
    lineitem) is computed once and reused for both the per-part aggregate
    and the 1-row global total, which broadcasts into the HAVING filter."""
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation").filter(F.col("n_name") == "NATION_7")
    base = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * F.col("l_quantity")).alias("value"),
        )
    )
    per_part = base.groupBy("l_partkey").agg(F.sum("value").alias("part_value_raw"))
    total = base.agg((F.sum("value") * 0.001).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value_raw") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.round("part_value_raw", 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


@q(
    "tpch_q12",
    """SELECT l_linestatus AS ship_class,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM orders, lineitem
       WHERE o_orderkey = l_orderkey
         AND l_shipdate > o_orderdate + INTERVAL 60 DAY
         AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       GROUP BY ship_class
       ORDER BY ship_class""",
    extra=True,
)
def tpch_q12(spark, sf):
    """Q12 shape: shipping-mode priority — join with a cross-table
    inequality (ship lag > 60 days stands in for receipt-after-commit) and
    the canonical CASE-pivot conditional counts. The inequality rides the
    equi join on orderkey, so it never degrades the join strategy."""
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@q(
    "tpch_q13",
    """SELECT c_count, count(*) AS custdist
       FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer LEFT OUTER JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
             GROUP BY c_custkey) c_orders
       GROUP BY c_count
       ORDER BY custdist DESC, c_count DESC""",
    extra=True,
)
def tpch_q13(spark, sf):
    """Q13 shape: customer order-count distribution — LEFT OUTER join with
    a predicate INSIDE the join condition (never a post-filter: customers
    with only '5-LOW' orders must still appear with count 0), then a
    double aggregate. count(o_orderkey) counts non-null keys only."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@q(
    "tpch_q14",
    """SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END)
                    / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
       FROM lineitem, part
       WHERE l_partkey = p_partkey
         AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""",
    extra=True,
)
def tpch_q14(spark, sf):
    """Q14 shape: promotion effect — broadcast dim join + conditional
    aggregate ratio collapsing to ONE row. The month filter pushes into
    the lineitem scan; part broadcasts."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    p = t(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@q(
    "tpch_q15",
    """WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, total_revenue
       FROM supplier, revenue
       WHERE s_suppkey = supplier_no
         AND total_revenue = (SELECT max(total_revenue) FROM revenue)
       ORDER BY s_suppkey""",
    extra=True,
)
def tpch_q15(spark, sf):
    """Q15 shape: top supplier — the view-then-scalar-max pattern. The
    quarterly revenue aggregate is computed ONCE and reused for both the
    max (1 row, broadcast) and the equality filter; ties all surface, as
    the spec requires."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = t(spark, sf, "supplier")
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@q(
    "tpch_q16",
    """SELECT p_brand, p_type, p_size,
              count(DISTINCT l_suppkey) AS supplier_cnt
       FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps, part
       WHERE p_partkey = l_partkey
         AND p_brand <> 'Brand#3'
         AND p_type <> 'PROMO'
         AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
         AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                               WHERE s_acctbal < 0)
       GROUP BY p_brand, p_type, p_size
       ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    extra=True,
)
def tpch_q16(spark, sf):
    """Q16 shape: parts/supplier relationship — the part-supplier relation
    is DISTINCT (l_partkey, l_suppkey) (no partsupp in the testdata), the
    complaint exclusion becomes a NOT IN over negative-balance suppliers
    (left-anti: supplier keys are never null, so NOT IN == anti here), and
    the headline aggregate is a count DISTINCT over the join key."""
    ps = t(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@q(
    "tpch_q17",
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
       FROM lineitem, part
       WHERE p_partkey = l_partkey
         AND p_brand = 'Brand#5' AND p_type = 'SMALL'
         AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                           FROM lineitem l2
                           WHERE l2.l_partkey = p_partkey)""",
    extra=True,
)
def tpch_q17(spark, sf):
    """Q17 shape: small-quantity-order revenue — the correlated average
    subquery. Decorrelated the way Catalyst would: per-part averages are
    a grouped aggregate over lineitem joined back on the part key; the
    brand/type filter broadcasts into BOTH sides so the average aggregate
    only runs over qualifying parts' rows."""
    p = t(spark, sf, "part").filter(
        (F.col("p_brand") == "Brand#5") & (F.col("p_type") == "SMALL")
    )
    li = t(spark, sf, "lineitem").join(
        F.broadcast(p.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    per_part = li.groupBy(F.col("l_partkey").alias("avg_key")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(per_part), F.col("l_partkey") == F.col("avg_key"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@q(
    "tpch_q19",
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM lineitem, part
       WHERE p_partkey = l_partkey
         AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30))""",
    extra=True,
)
def tpch_q19(spark, sf):
    """Q19 shape: discounted revenue — the disjunctive mixed predicate
    spanning both join sides. The equi key still drives a hash join; the
    OR-of-conjuncts lands as a post-join filter, and Catalyst derives the
    implied single-side prefilters (brand IN (...), quantity <= 30) that
    push into each scan."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@q(
    "tpch_q20",
    """SELECT s_name, round(s_acctbal, 2) AS s_acctbal
       FROM supplier, nation
       WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem
                           WHERE l_partkey IN (SELECT p_partkey FROM part
                                               WHERE p_name LIKE 'red%')
                             AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                             AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                           GROUP BY l_suppkey
                           HAVING sum(l_quantity) > 210)
         AND s_nationkey = n_nationkey AND n_name = 'NATION_4'
       ORDER BY s_name""",
    extra=True,
)
def tpch_q20(spark, sf):
    """Q20 shape: potential part promotion — the doubly-nested IN.
    Innermost: name-prefix part keys (broadcast semi). Middle: suppliers
    whose 1996 shipped quantity of those parts beats the availability
    threshold (grouped HAVING -> semi build side). Outermost: nation-
    filtered suppliers semi-joined against that set. At 100 TB each level
    shrinks the next's input — no inverted evaluation order is possible."""
    red_parts = (
        t(spark, sf, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    )
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 210)
        .select("l_suppkey")
    )
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation").filter(F.col("n_name") == "NATION_4")
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )
