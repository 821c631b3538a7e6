"""SURVEY.md §2.1–2.8 relational operator harness (scan/project/filter/
join/agg/window/sort/set/function families), each with a DuckDB oracle.

Float discipline: every double-valued aggregate/computed column is rounded
identically on both sides so the order-insensitive value hash is stable.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from forklift_spark.functions.mapping import compile_mapping
from forklift_spark.operators.asof import asof_join, range_join

from .queries import q, t

# --------------------------------------------------------------- 2.1 sources


@q(
    "scan_parquet",
    "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_quantity > 45",
)
def scan_parquet(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity")
        .filter(F.col("l_quantity") > 45)
    )


@q("scan_csv", "SELECT r_regionkey, r_name FROM region")
def scan_csv(spark, sf):
    """CSV round-trip: parquet -> csv -> explicit-schema csv scan (S2)."""
    out = os.path.join(tempfile.gettempdir(), f"fk_csv_{os.path.basename(sf)}")
    t(spark, sf, "region").select("r_regionkey", "r_name").coalesce(1).write.mode(
        "overwrite"
    ).option("header", True).csv(out)
    schema = T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    return spark.read.schema(schema).option("header", True).csv(out)


@q(
    "scan_json",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_json(spark, sf):
    """JSON-lines round-trip with explicit schema (S2)."""
    out = os.path.join(tempfile.gettempdir(), f"fk_json_{os.path.basename(sf)}")
    t(spark, sf, "nation").coalesce(1).write.mode("overwrite").json(out)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    return spark.read.schema(schema).json(out).select("n_nationkey", "n_name", "n_regionkey")


# ------------------------------------------------- 2.2 project/filter/case


@q(
    "project_map",
    """SELECT o_orderkey AS order_id,
              CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_cents,
              lower(o_orderstatus) AS status_lower,
              'forklift' AS src
       FROM orders""",
)
def project_map(spark, sf):
    """The declarative column-mapping spec compiler (P1+P2) — rename, cast,
    scalar transform, constant, all in ONE Catalyst select."""
    spec = {
        "order_id": "o_orderkey",
        "total_cents": F.round(F.col("o_totalprice") * 100, 0).cast("long"),
        "status_lower": "lower(o_orderstatus)",
        "src": ("const", "forklift"),
    }
    return compile_mapping(t(spark, sf, "orders"), spec)


@q(
    "filter_pred",
    """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
       WHERE o_totalprice BETWEEN 100000 AND 200000
         AND o_orderpriority IN ('1-URGENT', '2-HIGH')
         AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'""",
)
def filter_pred(spark, sf):
    return (
        t(spark, sf, "orders")
        .filter(
            F.col("o_totalprice").between(100000, 200000)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@q(
    "case_when",
    """SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                   WHEN c_acctbal < 5000 THEN 'mid'
                   ELSE 'high' END AS bal_class,
              count(*) AS n,
              round(sum(c_acctbal), 2) AS sum_bal
       FROM customer GROUP BY 1""",
)
def case_when(spark, sf):
    cls = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return (
        t(spark, sf, "customer")
        .groupBy(cls.alias("bal_class"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("sum_bal"))
    )


@q(
    "cast_types",
    """SELECT l_orderkey, l_linenumber,
              CAST(l_quantity AS INTEGER) AS qty_int,
              CAST(l_orderkey AS VARCHAR) AS okey_str,
              CAST(l_shipdate AS DATE) AS ship_date
       FROM lineitem""",
)
def cast_types(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("okey_str"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )


# ----------------------------------------------------------------- 2.3 joins


@q(
    "join_broadcast",
    """SELECT r_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
       FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                       JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY r_name""",
)
def join_broadcast(spark, sf):
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.round(F.sum("c_acctbal"), 2).alias("sum_bal"))
    )


@q(
    "join_sortmerge",
    """SELECT o_orderpriority, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       GROUP BY o_orderpriority""",
)
def join_sortmerge(spark, sf):
    li = t(spark, sf, "lineitem").hint("merge")
    o = t(spark, sf, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
    )


@q(
    "join_outer",
    """SELECT c.c_custkey, count(o.o_orderkey) AS n_open
       FROM customer c LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
         ON c.c_custkey = o.o_custkey
       GROUP BY c.c_custkey""",
)
def join_outer(spark, sf):
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("n_open"))
    )


@q(
    "join_semi",
    """SELECT c_custkey, c_name FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""",
)
def join_semi(spark, sf):
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@q(
    "join_anti",
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
)
def join_anti(spark, sf):
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@q(
    "join_theta",
    """SELECT n_nationkey, count(*) AS n_sup
       FROM supplier s JOIN nation n ON s.s_nationkey < n.n_nationkey
       GROUP BY n_nationkey""",
)
def join_theta(spark, sf):
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    return (
        s.crossJoin(n)
        .filter(F.col("s_nationkey") < F.col("n_nationkey"))
        .groupBy("n_nationkey")
        .agg(F.count(F.lit(1)).alias("n_sup"))
    )


@q(
    "join_range",
    """SELECT band, count(*) AS n, round(sum(p_retailprice), 2) AS sum_price
       FROM part p JOIN (VALUES ('small', 0, 10), ('medium', 10, 25), ('large', 25, 51))
            b(band, lo, hi)
         ON p.p_size >= b.lo AND p.p_size < b.hi
       GROUP BY band""",
)
def join_range(spark, sf):
    p = t(spark, sf, "part")
    bands = spark.createDataFrame(
        [("small", 0, 10), ("medium", 10, 25), ("large", 25, 51)], ["band", "lo", "hi"]
    )
    joined = range_join(p, bands, "p_size")
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("p_retailprice"), 2).alias("sum_price")
    )


@q(
    "join_asof",
    """SELECT a.event_id, a.user_id,
              (SELECT max(b.ts) FROM events b
               WHERE b.user_id = a.user_id AND b.event_type = 'click' AND b.ts <= a.ts)
              AS asof_ts
       FROM events a WHERE a.event_type = 'purchase'""",
)
def join_asof(spark, sf):
    """Backward as-of join: for each purchase, the latest click at or before
    it by the same user — union-tag-window plan (one shuffle, no pair blowup)."""
    ev = t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(purchases, clicks, ["user_id"], "ts", "ts", ["value"])
    return out.select("event_id", "user_id", "asof_ts")


# ------------------------------------------------------------------ 2.4 aggs


@q(
    "agg_basic",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(avg(l_quantity), 4) AS avg_qty,
              round(avg(l_discount), 6) AS avg_disc,
              count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus""",
)
def agg_basic(spark, sf):
    """TPC-H Q1 shape — partial+final hash aggregate."""
    li = t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@q(
    "agg_distinct",
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
       FROM orders GROUP BY o_orderpriority""",
)
def agg_distinct(spark, sf):
    return (
        t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@q("agg_approx")  # rows-only: sketch results are engine-specific by design
def agg_approx(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"))
    )


@q(
    "agg_quantile",
    """SELECT l_returnflag,
              round(quantile_cont(l_quantity, 0.25), 4) AS q25,
              round(quantile_cont(l_quantity, 0.5), 4) AS q50,
              round(quantile_cont(l_quantity, 0.75), 4) AS q75
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_quantile(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("q50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("q75"),
    )


@q(
    "agg_rollup",
    """SELECT l_returnflag, l_linestatus,
              grouping(l_returnflag, l_linestatus) AS gid,
              round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def agg_rollup(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


@q(
    "agg_cube",
    """SELECT l_returnflag, l_linestatus,
              grouping(l_returnflag, l_linestatus) AS gid,
              round(sum(l_extendedprice), 2) AS sum_price
       FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
)
def agg_cube(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_price")
    )


@q(
    "agg_pivot",
    """SELECT l_returnflag,
              round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
              round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_pivot(spark, sf):
    p = (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return p.select(
        "l_returnflag", F.col("F").alias("qty_f"), F.col("O").alias("qty_o")
    )


@q(
    "agg_unpivot",
    """SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
       UNION ALL
       SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part""",
)
def agg_unpivot(spark, sf):
    p = t(spark, sf, "part").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("double").alias("p_size")
    )
    return p.unpivot("p_partkey", ["p_retailprice", "p_size"], "metric", "value")


@q(
    "agg_collect",
    """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names,
              count(*) AS n
       FROM nation GROUP BY n_regionkey""",
)
def agg_collect(spark, sf):
    return (
        t(spark, sf, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("names"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@q(
    "agg_udaf",
    """SELECT p_brand,
              round(sum(p_retailprice * p_size) / sum(p_size), 4) AS w_avg_price
       FROM part GROUP BY p_brand""",
)
def agg_udaf(spark, sf):
    """Grouped-agg pandas UDAF (X2): size-weighted mean price, vectorized."""

    @F.pandas_udf("double")
    def w_avg(price: pd.Series, size: pd.Series) -> float:
        return float((price * size).sum() / size.sum())

    return (
        t(spark, sf, "part")
        .groupBy("p_brand")
        .agg(F.round(w_avg("p_retailprice", "p_size"), 4).alias("w_avg_price"))
    )


# --------------------------------------------------------------- 2.5 windows


@q(
    "win_rank",
    """SELECT c_custkey, c_mktsegment,
              row_number() OVER w AS rn,
              rank() OVER w AS rnk,
              dense_rank() OVER w AS drnk
       FROM customer
       WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)""",
)
def win_rank(spark, sf):
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return t(spark, sf, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@q(
    "win_offset",
    """SELECT o_orderkey, o_custkey,
              round(lag(o_totalprice) OVER w, 2) AS prev_price,
              round(lead(o_totalprice) OVER w, 2) AS next_price
       FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
)
def win_offset(spark, sf):
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
    )


@q(
    "win_frame",
    """SELECT o_orderkey, o_custkey,
              round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
              round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3
       FROM orders""",
)
def win_frame(spark, sf):
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    return t(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias(
            "running_total"
        ),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("avg3"),
    )


@q(
    "win_topk",
    """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
         SELECT o_orderpriority, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) WHERE rn <= 3""",
)
def win_topk(spark, sf):
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@q(
    "win_lww",
    """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
              round(value, 4) AS last_value
       FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
             FROM events) WHERE rn = 1""",
)
def win_lww(spark, sf):
    """W5 — the LWW argmax that powers the CDC dedupe, in its
    batch-expressible form (key=user_id, commit order=event_id)."""
    w = W.partitionBy("user_id").orderBy(F.desc("event_id"))
    return (
        t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            F.round("value", 4).alias("last_value"),
        )
    )


@q(
    "win_session",
    """WITH g AS (
         SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 3600 THEN 1 ELSE 0 END AS new_s
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ), s AS (
         SELECT user_id, ts,
                CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS session_id
         FROM g)
       SELECT user_id, session_id, count(*) AS n_events, min(ts) AS session_start
       FROM s GROUP BY user_id, session_id""",
)
def win_session(spark, sf):
    """W6 — batch sessionization: lag -> gap flag -> running sum (1h gap)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t(spark, sf, "events")
    flagged = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > 3600),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    w2 = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, 0)
    sess = flagged.withColumn("session_id", F.sum("new_s").over(w2))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("session_start")
    )


# ----------------------------------------------------------- 2.6 sort/limit


@q(
    "sort_global",
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber""",
)
def sort_global(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@q(
    "sort_limit",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
)
def sort_limit(spark, sf):
    return (
        t(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


# -------------------------------------------------------------- 2.7 set ops


@q(
    "set_union",
    """SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
       UNION ALL
       SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 300000""",
)
def set_union(spark, sf):
    o = t(spark, sf, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    b = o.filter(F.col("o_totalprice") > 300000).select("o_orderkey", "o_orderpriority")
    return a.unionByName(b)


@q(
    "set_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""",
)
def set_intersect(spark, sf):
    o = t(spark, sf, "orders")
    return o.filter(F.col("o_orderstatus") == "O").select("o_custkey").intersect(
        o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    )


@q(
    "set_except",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       EXCEPT ALL
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""",
)
def set_except(spark, sf):
    o = t(spark, sf, "orders")
    return o.filter(F.col("o_orderstatus") == "O").select("o_custkey").exceptAll(
        o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    )


@q(
    "set_distinct",
    "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def set_distinct(spark, sf):
    return t(spark, sf, "customer").select("c_nationkey", "c_mktsegment").distinct()


# --------------------------------------------------- 2.8 function families


@q(
    "fn_string",
    """SELECT p_partkey,
              upper(p_name) AS name_upper,
              substr(p_name, 1, 5) AS name_pfx,
              length(p_name) AS name_len,
              regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
              concat(p_brand, '#', p_type) AS brand_type
       FROM part""",
)
def fn_string(spark, sf):
    return t(spark, sf, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
    )


@q(
    "fn_hash",
    """SELECT c_custkey, md5(c_name) AS name_md5, sha256(c_name) AS name_sha256
       FROM customer""",
)
def fn_hash(spark, sf):
    """F2 — the content-sha invariant machinery (sha2 is what verify_state uses)."""
    return t(spark, sf, "customer").select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    )


@q(
    "fn_date",
    """SELECT o_orderkey,
              CAST(year(o_orderdate) AS INTEGER) AS y,
              CAST(month(o_orderdate) AS INTEGER) AS m,
              date_trunc('month', o_orderdate) AS month_start,
              CAST(datediff('day', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS INTEGER)
                AS days_to_98,
              CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
       FROM orders""",
)
def fn_date(spark, sf):
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_98"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@q(
    "fn_math",
    """SELECT l_orderkey, l_linenumber,
              round(l_extendedprice * l_discount, 6) AS disc_amt,
              abs(l_quantity - 25) AS dev_qty,
              CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k,
              round(sqrt(l_quantity), 6) AS sqrt_qty,
              round(ln(l_extendedprice), 6) AS ln_price,
              round(pow(l_discount, 2), 8) AS disc_sq
       FROM lineitem""",
)
def fn_math(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("disc_amt"),
        F.abs(F.col("l_quantity") - 25).alias("dev_qty"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.pow("l_discount", F.lit(2)), 8).alias("disc_sq"),
    )


@q(
    "fn_array",
    r"""SELECT doc_id,
              len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
              (regexp_split_to_array(trim(text), '\s+'))[1] AS first_word,
              (regexp_split_to_array(trim(text), '\s+'))[-1] AS last_word
       FROM documents""",
)
def fn_array(spark, sf):
    d = t(spark, sf, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
    )


@q("fn_array_hof")  # rows-only: higher-order array fns have no clean ANSI twin
def fn_array_hof(spark, sf):
    d = t(spark, sf, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.round(
            F.aggregate(
                F.transform(words, lambda w: F.length(w).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.size(words),
            4,
        ).alias("avg_word_len"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).alias("n_long_words"),
        F.array_distinct(F.slice(F.sort_array(words), 1, 3)).alias("top3_sorted"),
    )


@q("fn_map")  # rows-only: map type comparison across engines is unstable
def fn_map(spark, sf):
    ev = t(spark, sf, "events")
    m = F.create_map(F.lit("value"), F.col("value"), F.lit("uid"), F.col("user_id").cast("double"))
    return ev.select(
        "event_id",
        F.map_keys(m).alias("keys"),
        F.element_at(m, "value").alias("v"),
    )


@q(
    "fn_json",
    """SELECT event_id, CAST(props->>'k' AS BIGINT) AS k_val FROM events""",
)
def fn_json(spark, sf):
    return t(spark, sf, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


@q(
    "fn_struct",
    """SELECT o_orderkey, o_custkey AS cust, round(o_totalprice, 2) AS price
       FROM orders""",
)
def fn_struct(spark, sf):
    """Struct pack/unpack round-trip — net effect is a projection the oracle
    can state directly."""
    o = t(spark, sf, "orders")
    packed = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_custkey").alias("cust"), F.round("o_totalprice", 2).alias("price")
        ).alias("info"),
    )
    return packed.select("o_orderkey", "info.cust", "info.price")
