"""Data-quality expectations: compile-to-codegen routing semantics
(operators/expectations.py) — three-valued logic, action routing, the
single-aggregate enforce, and the no-UDF plan guarantee."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.operators.expectations import (
    Expectation,
    ExpectationError,
    check,
    enforce,
    split,
    violation_counts,
)

RULES = [
    Expectation("v_pos", "v > 0", "quarantine"),
    Expectation("name_short", "length(name) <= 4", "drop"),
    Expectation("id_small", "id < 100", "warn"),
    Expectation("id_not_null", "id IS NOT NULL", "fail"),
]


@pytest.fixture(scope="module")
def frame(spark):
    # id=3 has NULL v (three-valued: must count as a v_pos violation)
    rows = [
        (1, "ok", 5.0),       # clean
        (2, "ok", -1.0),      # v_pos -> quarantine
        (3, "ok", None),      # v_pos (NULL) -> quarantine
        (4, "toolong", 2.0),  # name_short -> drop
        (150, "ok", 1.0),     # id_small -> warn only (stays good)
        (5, "toolong", -2.0), # drop AND quarantine -> quarantined, not good
    ]
    return spark.createDataFrame(rows, "id int, name string, v double")


def test_check_annotates_all_rules(frame):
    got = {
        r["id"]: r["dq_violations"]
        for r in check(frame, RULES).select("id", "dq_violations").collect()
    }
    assert got[1] == []
    assert got[2] == ["v_pos"]
    assert got[3] == ["v_pos"]  # NULL result counts as violation
    assert got[4] == ["name_short"]
    assert got[150] == ["id_small"]
    assert got[5] == ["name_short", "v_pos"]  # sorted tags


def test_split_routing(frame):
    good, bad = split(frame, RULES)
    assert sorted(r["id"] for r in good.select("id").collect()) == [1, 150]
    got = {
        r["id"]: r["dq_violations"]
        for r in bad.select("id", "dq_violations").collect()
    }
    # quarantine tags carry quarantine/fail rule names only (not the drop)
    assert got == {2: ["v_pos"], 3: ["v_pos"], 5: ["v_pos"]}
    # row 4 (drop-only) is on NEITHER side
    assert good.schema.fieldNames() == frame.schema.fieldNames()


def test_violation_counts_and_enforce_pass(frame):
    counts = violation_counts(frame, RULES)
    assert counts == {"v_pos": 3, "name_short": 2, "id_small": 1, "id_not_null": 0}
    # no fail-action rule violated -> enforce returns the audit record
    assert enforce(frame, RULES) == counts


def test_enforce_raises_on_fail_rule(spark):
    df = spark.createDataFrame([(None, "x", 1.0)], "id int, name string, v double")
    with pytest.raises(ExpectationError) as ei:
        enforce(df, RULES)
    assert ei.value.counts == {"id_not_null": 1}


def test_bad_action_rejected():
    with pytest.raises(ValueError):
        Expectation("x", "1=1", "explode")


def test_split_is_pure_codegen(frame):
    """The gate must stay JVM-side: no python UDF nodes in either plan."""
    good, bad = split(frame, RULES)
    for df in (good, bad):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
