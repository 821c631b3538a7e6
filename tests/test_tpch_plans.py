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
