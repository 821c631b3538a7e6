"""Column profiling (operators/profile.py): hand-computed values including
null handling, one-job plan shape, approx mode, and guards."""

import pytest

from forklift_spark.operators.profile import column_profile
from forklift_spark.plans.guards import assert_no_row_python_udf, count_exchanges


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, None, 7.0), (4, "a", None)],
        "id long, s string, v double",
    )


def test_hand_computed(spark, df):
    got = {r["column_name"]: r.asDict() for r in column_profile(df).collect()}
    assert got["id"] == {
        "column_name": "id", "n_rows": 4, "n_nulls": 0, "n_distinct": 4,
        "min_str": "1", "max_str": "4",
    }
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_str"] == "a" and got["s"]["max_str"] == "b"
    assert got["v"]["n_nulls"] == 2 and got["v"]["n_distinct"] == 2
    assert got["v"]["min_str"] == "5.0"


def test_one_job_shape(spark, df):
    # exact mode: Expand-based multi-distinct is a two-phase aggregate
    # (2 exchanges of partial rows); approx mode collapses to ONE — the
    # documented trade in the module docstring. stack adds no exchange,
    # no Python anywhere.
    exact = column_profile(df, ["id", "s"])
    assert count_exchanges(exact) <= 2
    assert_no_row_python_udf(exact, "column_profile")
    approx = column_profile(df, ["id", "s"], approx=True)
    assert count_exchanges(approx) <= 1


def test_approx_mode(spark, df):
    got = {r["column_name"]: r for r in column_profile(df, approx=True).collect()}
    # HLL at this size is exact; the contract is "same shape, sketched"
    assert got["id"]["n_distinct"] == 4


def test_guards(spark, df):
    with pytest.raises(ValueError, match="no such columns"):
        column_profile(df, ["nope"])
    with pytest.raises(ValueError, match="at least one"):
        column_profile(df, [])
