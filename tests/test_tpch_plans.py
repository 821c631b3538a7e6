"""Plan guards for the TPC-H-shaped multi-join queries (VERDICT r1 #8):
dims must come in via broadcast, no cartesian product may appear, and the
date/segment filters must reach the parquet scans."""

import re

import pytest

from forklift_spark.plans.guards import (
    assert_broadcast_join,
    assert_pushed_filters,
    executed_plan,
)
from harness import QUERIES


@pytest.mark.parametrize("name", ["tpch_q3", "tpch_q5", "tpch_q10"])
def test_no_cartesian_product(spark, sf_small, name):
    plan = executed_plan(QUERIES[name](spark, sf_small))
    assert not re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan), (
        f"{name}: cartesian/nested-loop join in plan:\n{plan[:2000]}"
    )


@pytest.mark.parametrize("name", ["tpch_q5", "tpch_q10"])
def test_dims_are_broadcast(spark, sf_small, name):
    assert_broadcast_join(QUERIES[name](spark, sf_small))


def test_q3_filters_reach_scan(spark, sf_small):
    df = QUERIES["tpch_q3"](spark, sf_small)
    assert_pushed_filters(df, "l_shipdate")
    assert_pushed_filters(df, "o_orderdate")
    assert_pushed_filters(df, "c_mktsegment")


def test_q5_broadcast_count(spark, sf_small):
    """supplier/nation/region all arrive via BroadcastExchange; the only
    shuffle joins are the fact-side lineitem ⋈ orders ⋈ customer chain."""
    plan = executed_plan(QUERIES["tpch_q5"](spark, sf_small))
    n_broadcast = len(re.findall(r"BroadcastHashJoin", plan))
    assert n_broadcast >= 3, f"expected >=3 broadcast joins:\n{plan[:3000]}"


# ---- round-5 subquery family -------------------------------------------
# These guard the DECORRELATED shapes: EXISTS/IN must execute as semi
# joins, NOT EXISTS as anti joins, and the only nested-loop allowed is
# q22's 1-row scalar-subquery broadcast.

from harness.queries import EXTRA_QUERIES  # noqa: E402


@pytest.mark.parametrize("name", ["tpch_q1", "tpch_q4", "tpch_q18", "tpch_q21"])
def test_subquery_family_no_nested_loop(spark, sf_small, name):
    plan = executed_plan(EXTRA_QUERIES[name](spark, sf_small))
    assert not re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan), (
        f"{name}: cartesian/nested-loop join in plan:\n{plan[:2000]}"
    )


def test_q4_exists_is_semi_join(spark, sf_small):
    plan = executed_plan(EXTRA_QUERIES["tpch_q4"](spark, sf_small))
    assert "LeftSemi" in plan, plan[:2000]
    df = EXTRA_QUERIES["tpch_q4"](spark, sf_small)
    assert_pushed_filters(df, "o_orderdate")


def test_q18_having_filters_before_join(spark, sf_small):
    """The HAVING aggregate runs before the semi join: the semi's right
    side is the aggregated/filtered orderkey set, not raw lineitem."""
    plan = executed_plan(EXTRA_QUERIES["tpch_q18"](spark, sf_small))
    assert "LeftSemi" in plan, plan[:2000]
    semi_pos = plan.find("LeftSemi")
    agg_pos = plan.rfind("HashAggregate")
    assert agg_pos > semi_pos >= 0, "aggregate must feed the semi join"


def test_q21_semi_and_anti(spark, sf_small):
    plan = executed_plan(EXTRA_QUERIES["tpch_q21"](spark, sf_small))
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan[:2500]


def test_q22_scalar_broadcast_and_anti(spark, sf_small):
    """The scalar subquery arrives as a 1-row broadcast (the ONLY place a
    BroadcastNestedLoopJoin is the right plan) and the NOT EXISTS is an
    anti join — customers are never compared pairwise."""
    plan = executed_plan(EXTRA_QUERIES["tpch_q22"](spark, sf_small))
    assert "LeftAnti" in plan, plan[:2500]
    assert not re.search(r"CartesianProduct", plan), plan[:2000]


# ---- round-5 full-suite completion --------------------------------------
# Guards for the 14 remaining queries. q11/q15/q17 join a 1-row scalar
# aggregate with no condition — the BroadcastNestedLoopJoin over a 1-row
# build side is the CORRECT plan there (same as q22) — so they get the
# weaker no-CartesianProduct guard; everything else must be free of
# nested loops entirely.

_R5_STRICT = [
    "tpch_q2", "tpch_q6", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q12",
    "tpch_q13", "tpch_q14", "tpch_q16", "tpch_q19", "tpch_q20",
]
_R5_SCALAR = ["tpch_q11", "tpch_q15", "tpch_q17"]


@pytest.mark.parametrize("name", _R5_STRICT)
def test_r5_suite_no_nested_loop(spark, sf_small, name):
    plan = executed_plan(EXTRA_QUERIES[name](spark, sf_small))
    assert not re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan), (
        f"{name}: cartesian/nested-loop join in plan:\n{plan[:2000]}"
    )


@pytest.mark.parametrize("name", _R5_SCALAR)
def test_r5_scalar_subquery_no_cartesian(spark, sf_small, name):
    plan = executed_plan(EXTRA_QUERIES[name](spark, sf_small))
    assert not re.search(r"CartesianProduct", plan), plan[:2000]


def test_q6_filters_reach_scan(spark, sf_small):
    df = EXTRA_QUERIES["tpch_q6"](spark, sf_small)
    assert_pushed_filters(df, "l_shipdate")
    assert_pushed_filters(df, "l_discount")
    assert_pushed_filters(df, "l_quantity")


def test_q8_dims_all_broadcast(spark, sf_small):
    """part, supplier, region and both nation roles arrive via broadcast;
    the only shuffle joins are lineitem ⋈ orders ⋈ customer."""
    plan = executed_plan(EXTRA_QUERIES["tpch_q8"](spark, sf_small))
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 4, plan[:3000]


def test_q13_join_predicate_stays_in_join(spark, sf_small):
    """The o_orderpriority filter lives in the outer join (customers with
    zero qualifying orders must still appear), so the plan keeps LeftOuter
    and the row for every customer."""
    plan = executed_plan(EXTRA_QUERIES["tpch_q13"](spark, sf_small))
    assert "LeftOuter" in plan or "RightOuter" in plan, plan[:2000]


def test_q16_not_in_is_anti_join(spark, sf_small):
    plan = executed_plan(EXTRA_QUERIES["tpch_q16"](spark, sf_small))
    assert "LeftAnti" in plan, plan[:2000]


def test_q20_nested_in_is_semi_chain(spark, sf_small):
    """Both IN levels decorrelate to semi joins: parts into lineitem,
    qualifying suppliers into supplier."""
    plan = executed_plan(EXTRA_QUERIES["tpch_q20"](spark, sf_small))
    assert len(re.findall(r"LeftSemi", plan)) >= 2, plan[:2500]


def test_q2_correlated_max_is_window(spark, sf_small):
    """The correlated scalar max evaluates as ONE window over the joined
    candidates — the part-supplier relation is scanned once, not re-joined
    per subquery evaluation."""
    plan = executed_plan(EXTRA_QUERIES["tpch_q2"](spark, sf_small))
    assert "Window" in plan, plan[:2500]
