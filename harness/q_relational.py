"""SURVEY.md §2.1–2.8 relational operator harness (scan/project/filter/
join/agg/window/sort/set/function families), each with a DuckDB oracle.

Round 2: near-duplicate entries are merged so the WHOLE registry fits in
the driver's 50-query correctness window (VERDICT.md next-round #1) — each
merged query still exhibits every §2 op it absorbed, in one plan:

  scan_csv_json        = S2 csv + S2 json        filter_case   = P3 + P4
  project_map          = P1 + P2 + P5 (casts)    join_semi_anti = J4 + J5
  agg_basic            = A1 + A2 (distinct agg)  agg_rollup_cube = A5 both
  agg_pivot_unpivot    = A6 + A7 (round-trip)    set_union_distinct = U1+U3
  set_intersect_except = U2 both                 win_rank_topk = W1 + W4
  win_offset_frame     = W2 + W3                 fn_string_hash = F1 + F2
  fn_date_math         = F3 + F4                 fn_json_struct = F7 + F8
  fn_array             = F5 incl. higher-order fns (array outputs
                         stringified so the driver value-hash is scalar)

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


@q(
    "scan_csv_json",
    """SELECT n_nationkey, n_name, r_name FROM nation
       JOIN region ON n_regionkey = r_regionkey""",
)
def scan_csv_json(spark, sf):
    """S2 both formats in one plan: region round-trips through CSV, nation
    through JSON-lines (both with explicit schemas), then a broadcast join."""
    csv_out = os.path.join(tempfile.gettempdir(), f"fk_csv_{os.path.basename(sf)}")
    t(spark, sf, "region").select("r_regionkey", "r_name").coalesce(1).write.mode(
        "overwrite"
    ).option("header", True).csv(csv_out)
    region = spark.read.schema(
        T.StructType(
            [
                T.StructField("r_regionkey", T.IntegerType()),
                T.StructField("r_name", T.StringType()),
            ]
        )
    ).option("header", True).csv(csv_out)

    json_out = os.path.join(tempfile.gettempdir(), f"fk_json_{os.path.basename(sf)}")
    t(spark, sf, "nation").coalesce(1).write.mode("overwrite").json(json_out)
    nation = spark.read.schema(
        T.StructType(
            [
                T.StructField("n_nationkey", T.IntegerType()),
                T.StructField("n_name", T.StringType()),
                T.StructField("n_regionkey", T.IntegerType()),
            ]
        )
    ).json(json_out)
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name", "r_name")
    )


# ------------------------------------------------- 2.2 project/filter/case


@q(
    "project_map",
    """SELECT o_orderkey AS order_id,
              CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_cents,
              lower(o_orderstatus) AS status_lower,
              CAST(o_orderkey AS VARCHAR) AS okey_str,
              CAST(o_orderdate AS DATE) AS odate,
              'forklift' AS src
       FROM orders""",
)
def project_map(spark, sf):
    """The declarative column-mapping spec compiler (P1+P2) — rename, cast
    (P5), scalar transform, constant, all in ONE Catalyst select."""
    spec = {
        "order_id": "o_orderkey",
        "total_cents": F.round(F.col("o_totalprice") * 100, 0).cast("long"),
        "status_lower": "lower(o_orderstatus)",
        "okey_str": F.col("o_orderkey").cast("string"),
        "odate": F.col("o_orderdate").cast("date"),
        "src": ("const", "forklift"),
    }
    return compile_mapping(t(spark, sf, "orders"), spec)


@q(
    "filter_case",
    """SELECT o_orderpriority,
              CASE WHEN o_totalprice < 120000 THEN 'low'
                   WHEN o_totalprice < 160000 THEN 'mid'
                   ELSE 'high' END AS price_band,
              count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
       FROM orders
       WHERE o_totalprice BETWEEN 100000 AND 200000
         AND o_orderpriority IN ('1-URGENT', '2-HIGH')
         AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
       GROUP BY 1, 2""",
)
def filter_case(spark, sf):
    """P3 (compound predicate incl. BETWEEN/IN/timestamp) + P4 (CASE WHEN)."""
    band = (
        F.when(F.col("o_totalprice") < 120000, "low")
        .when(F.col("o_totalprice") < 160000, "mid")
        .otherwise("high")
    )
    return (
        t(spark, sf, "orders")
        .filter(
            F.col("o_totalprice").between(100000, 200000)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("o_orderpriority", band.alias("price_band"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
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
    "join_semi_anti",
    """SELECT 'semi' AS side, c_custkey, c_name FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
       UNION ALL
       SELECT 'anti' AS side, c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
)
def join_semi_anti(spark, sf):
    """J4 + J5 in one tagged result: big-spender customers via LEFT SEMI,
    order-less customers via LEFT ANTI."""
    c = t(spark, sf, "customer")
    big = t(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    o = t(spark, sf, "orders")
    semi = c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        F.lit("semi").alias("side"), "c_custkey", "c_name"
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("anti").alias("side"), "c_custkey", "c_name"
    )
    return semi.unionByName(anti)


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
              count(DISTINCT l_partkey) AS n_parts,
              count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus""",
)
def agg_basic(spark, sf):
    """TPC-H Q1 shape — partial+final hash aggregate, plus a distinct
    aggregate (A2) in the same groupBy."""
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
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("count_order"),
    )


@q(
    "agg_approx",
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
              TRUE AS within_tol
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_approx(spark, sf):
    """A3 — HLL++ sketch checked against the exact distinct count IN-QUERY:
    the sketch value itself is engine-specific, so the deterministic output
    is (exact count, |approx-exact|/exact < 3*rsd). The oracle asserts the
    tolerance flag is TRUE, i.e. the sketch really is within its error bound."""
    rsd = 0.02
    ex = F.countDistinct("l_partkey")
    ap = F.approx_count_distinct("l_partkey", rsd)
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            ex.alias("exact_parts"),
            (
                F.abs(ap.cast("double") - ex.cast("double")) / ex.cast("double")
                < 3 * rsd
            ).alias("within_tol"),
        )
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
    "agg_rollup_cube",
    """SELECT 'rollup' AS src, l_returnflag, l_linestatus,
              grouping(l_returnflag, l_linestatus) AS gid,
              round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       UNION ALL
       SELECT 'cube' AS src, l_returnflag, l_linestatus,
              grouping(l_returnflag, l_linestatus) AS gid,
              round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
       FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
)
def agg_rollup_cube(spark, sf):
    """A5 — ROLLUP and CUBE grouping sets with grouping_id, tagged union.

    r6: ONE cube aggregate serves both branches. For two grouping columns
    the rollup's grouping sets {(f,s),(f),()} are exactly the cube's sets
    minus the (s)-only one (gid==2), and a shared grouping set's aggregate
    values are computed identically — so the rollup branch is the cube
    result filtered to gid != 2. One lineitem scan and one Expand(x4)
    instead of two scans and Expand(x3)+Expand(x4); results unchanged
    (oracle-verified)."""
    li = t(spark, sf, "lineitem")
    c = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # each cube row fans out to its tags map-side (explode), so the cube
    # subtree exists ONCE in the plan — a union of two branches would
    # compute the whole aggregate twice (no exchange reuse across the
    # differing projections)
    tags = F.when(
        F.col("gid") != 2, F.array(F.lit("rollup"), F.lit("cube"))
    ).otherwise(F.array(F.lit("cube")))
    return c.select(
        F.explode(tags).alias("src"),
        "l_returnflag", "l_linestatus", "gid", "sum_qty", "n",
    )


@q(
    "agg_pivot_unpivot",
    """SELECT l_returnflag, 'qty_f' AS metric,
              round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS qty
       FROM lineitem GROUP BY l_returnflag
       UNION ALL
       SELECT l_returnflag, 'qty_o' AS metric,
              round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS qty
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_pivot_unpivot(spark, sf):
    """A6 + A7 round-trip: pivot to wide, then unpivot the pivoted frame
    back to long — both operators in one plan."""
    p = (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    p = p.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_f"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_o"),
    )
    return p.unpivot("l_returnflag", ["qty_f", "qty_o"], "metric", "qty")


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
    "win_rank_topk",
    """SELECT c_custkey, c_mktsegment, rn, rnk, drnk FROM (
         SELECT c_custkey, c_mktsegment,
                row_number() OVER w AS rn,
                rank() OVER w AS rnk,
                dense_rank() OVER w AS drnk
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
       ) WHERE rn <= 5""",
)
def win_rank_topk(spark, sf):
    """W1 (row_number/rank/dense_rank) + W4 (top-k per group) in one plan."""
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        t(spark, sf, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@q(
    "win_offset_frame",
    """SELECT o_orderkey, o_custkey,
              round(lag(o_totalprice) OVER w, 2) AS prev_price,
              round(lead(o_totalprice) OVER w, 2) AS next_price,
              round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
              round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3
       FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""",
)
def win_offset_frame(spark, sf):
    """W2 (lag/lead) + W3 (row frames) over the same partition spec — one
    shuffle, one sort."""
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    return t(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias(
            "running_total"
        ),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("avg3"),
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
    batch-expressible form (key=user_id, commit order=event_id).

    r6: runs through the engine's own lww_dedupe (max_by aggregate with
    map-side partial aggregation) instead of a row_number window — the
    window shuffled and sorted EVERY event row; the aggregate collapses to
    one row per key before the exchange (guide §2.3). event_id is unique
    (generator invariant), so the argmax is tie-free and the result is
    identical to the windowed form the oracle SQL still expresses."""
    from forklift_spark.operators.merge import lww_dedupe

    ev = t(spark, sf, "events").select("user_id", "event_id", "event_type", "value")
    return lww_dedupe(ev, ["user_id"], "event_id").select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.round("value", 4).alias("last_value"),
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
    "set_union_distinct",
    """SELECT DISTINCT o_orderkey, o_orderpriority FROM (
         SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
         UNION ALL
         SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 300000)""",
)
def set_union_distinct(spark, sf):
    """U1 (union by name) + U3 (distinct) in one plan."""
    o = t(spark, sf, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    b = o.filter(F.col("o_totalprice") > 300000).select("o_orderkey", "o_orderpriority")
    return a.unionByName(b).distinct()


@q(
    "set_intersect_except",
    """SELECT 'intersect' AS side, o_custkey FROM (
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
       UNION ALL
       SELECT 'except' AS side, o_custkey FROM (
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         EXCEPT ALL
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""",
)
def set_intersect_except(spark, sf):
    """U2 — INTERSECT and EXCEPT ALL, tagged union."""
    o = t(spark, sf, "orders")
    lhs = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    rhs = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    i = lhs.intersect(rhs).select(F.lit("intersect").alias("side"), "o_custkey")
    e = lhs.exceptAll(rhs).select(F.lit("except").alias("side"), "o_custkey")
    return i.unionByName(e)


# --------------------------------------------------- 2.8 function families


@q(
    "fn_string_hash",
    """SELECT p_partkey,
              upper(p_name) AS name_upper,
              substr(p_name, 1, 5) AS name_pfx,
              length(p_name) AS name_len,
              regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
              concat(p_brand, '#', p_type) AS brand_type,
              md5(p_name) AS name_md5,
              sha256(p_name) AS name_sha256
       FROM part""",
)
def fn_string_hash(spark, sf):
    """F1 string fns + F2 hash/checksum (sha2 is what verify_state uses)."""
    return t(spark, sf, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.md5("p_name").alias("name_md5"),
        F.sha2("p_name", 256).alias("name_sha256"),
    )


@q(
    "fn_date_math",
    """SELECT l_orderkey, l_linenumber,
              CAST(year(l_shipdate) AS INTEGER) AS y,
              CAST(month(l_shipdate) AS INTEGER) AS m,
              date_trunc('month', l_shipdate) AS month_start,
              CAST(epoch(l_shipdate) AS BIGINT) AS epoch_s,
              round(l_extendedprice * l_discount, 6) AS disc_amt,
              abs(l_quantity - 25) AS dev_qty,
              CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k,
              round(sqrt(l_quantity), 6) AS sqrt_qty,
              round(ln(l_extendedprice), 6) AS ln_price,
              round(pow(l_discount, 2), 8) AS disc_sq
       FROM lineitem""",
)
def fn_date_math(spark, sf):
    """F3 date/time + F4 math, one projection over lineitem."""
    li = t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.year("l_shipdate").alias("y"),
        F.month("l_shipdate").alias("m"),
        F.date_trunc("month", "l_shipdate").alias("month_start"),
        F.unix_timestamp("l_shipdate").alias("epoch_s"),
        F.round(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("disc_amt"),
        F.abs(F.col("l_quantity") - 25).alias("dev_qty"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.pow("l_discount", F.lit(2)), 8).alias("disc_sq"),
    )


@q(
    "fn_array",
    r"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                  FROM documents)
       SELECT doc_id,
              len(ws) AS n_words,
              ws[1] AS first_word,
              ws[-1] AS last_word,
              round(list_sum(list_transform(ws, x -> CAST(length(x) AS DOUBLE))) / len(ws), 4)
                AS avg_word_len,
              len(list_filter(ws, x -> length(x) > 4)) AS n_long_words,
              array_to_string(list_sort(list_distinct(list_sort(ws)[1:3])), '|') AS top3_sorted
       FROM w""",
)
def fn_array(spark, sf):
    """F5 — array fns INCLUDING higher-order transform/filter/aggregate.
    Array-valued outputs are stringified (array_join) so every output column
    is scalar and driver-hashable (VERDICT.md next-round #2)."""
    d = t(spark, sf, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
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
        F.array_join(
            F.sort_array(F.array_distinct(F.slice(F.sort_array(words), 1, 3))), "|"
        ).alias("top3_sorted"),
    )


@q(
    "fn_map",
    """SELECT event_id,
              event_type || ',uid' AS keys,
              2 AS n_keys,
              round(value, 4) AS v_self,
              CASE WHEN event_type = 'click' THEN round(value, 4) ELSE -1.0 END AS v_click
       FROM events""",
)
def fn_map(spark, sf):
    """F6 — map build/keys/size/lookup with SCALAR outputs (map_keys joined
    to a string; element_at lookups), so the driver value-hash works
    (VERDICT.md next-round #2)."""
    ev = t(spark, sf, "events")
    m = F.create_map(
        F.col("event_type"),
        F.col("value").cast("double"),
        F.lit("uid"),
        F.col("user_id").cast("double"),
    )
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("keys"),
        F.size(m).alias("n_keys"),
        F.round(F.element_at(m, F.col("event_type")), 4).alias("v_self"),
        F.round(F.coalesce(F.element_at(m, F.lit("click")), F.lit(-1.0)), 4).alias(
            "v_click"
        ),
    )


@q(
    "fn_json_struct",
    """SELECT event_id,
              CAST(props->>'k' AS BIGINT) AS k_val,
              user_id AS uid,
              round(value, 4) AS val
       FROM events""",
)
def fn_json_struct(spark, sf):
    """F7 JSON extraction + F8 struct pack/unpack round-trip in one query."""
    ev = t(spark, sf, "events")
    packed = ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.struct(
            F.col("user_id").alias("uid"), F.round("value", 4).alias("val")
        ).alias("info"),
    )
    return packed.select("event_id", "k_val", "info.uid", "info.val")
