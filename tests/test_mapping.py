"""P2/X1 — mapping-spec compiler: all entry kinds, vectorized-only rule."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from forklift_spark.functions.mapping import compile_mapping
from forklift_spark.plans.guards import assert_no_row_python_udf


def test_all_entry_kinds(spark):
    df = spark.createDataFrame(
        [(1, "Alice", "2.5"), (2, "bob", "4.0")], "id int, name string, amt string"
    )

    def double_len(s: pd.Series) -> pd.Series:
        return s.str.len() * 2.0

    double_len.input_cols = ["name"]

    out = compile_mapping(
        df,
        {
            "user_id": "id",                       # rename
            "upper_name": F.upper("name"),         # Column expr
            "amount": ("cast", "amt", "double"),   # cast
            "source": ("const", "crm"),            # constant
            "score": ("pandas", double_len, "double"),  # vectorized stage
            "derived": "id * 10",                  # SQL expression string
        },
    )
    rows = {r.user_id: r for r in out.collect()}
    assert rows[1].upper_name == "ALICE" and rows[1].amount == 2.5
    assert rows[2].source == "crm" and rows[2].derived == 20
    assert rows[1].score == 10.0  # len("Alice") * 2
    assert out.columns == ["user_id", "upper_name", "amount", "source", "score", "derived"]
    # the pandas stage must be ArrowEvalPython, never BatchEvalPython
    assert_no_row_python_udf(out, "mapping")


def test_bare_callable_rejected(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(TypeError, match="per-row"):
        compile_mapping(df, {"x": lambda v: v + 1})


def test_pandas_stage_requires_input_cols(spark):
    df = spark.createDataFrame([(1,)], "id int")

    def f(s: pd.Series) -> pd.Series:
        return s

    with pytest.raises(ValueError, match="input_cols"):
        compile_mapping(df, {"x": ("pandas", f, "int")})
