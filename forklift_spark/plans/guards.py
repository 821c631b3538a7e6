"""Physical-plan guards — the engine's performance contracts as assertions.

The scale story (SURVEY.md §4) leans on Catalyst doing predicate pushdown,
column pruning, broadcast selection and whole-stage codegen for us; these
helpers make that checkable in tests instead of hoped-for:

  * `assert_no_row_python_udf` — BASELINE.json:15 mandates "no per-row
    Python". A row `F.udf` shows up as a BatchEvalPython node; vectorized
    pandas/Arrow UDFs show up as ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas and are allowed.
  * `assert_pushed_filters` — the filter must reach the parquet scan
    (PushedFilters: [...]), not run post-scan only.
  * `assert_pruned_columns` — the scan's ReadSchema must not include the
    named (wide) columns; protects the "never read `content` on metadata
    paths" rule.
  * `assert_broadcast_join` — small-dim joins must be broadcast, not
    shuffled.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

#: plan-node regexes meaning "a Python process touches every row, row at a
#: time". `BatchEvalPythonUDTF` must NOT match (separate node; and the
#: session enables Arrow-optimized UDTFs anyway).
ROW_UDF_NODES = (r"BatchEvalPython(?!UDTF)",)

#: vectorized (Arrow-batched) Python nodes — allowed by BASELINE.json:15
VECTORIZED_NODES = (
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInArrow",
)


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def executed_plan(df: DataFrame) -> str:
    """String of the physical plan after optimization (pre-execution)."""
    return df._jdf.queryExecution().executedPlan().toString()


def assert_no_row_python_udf(df: DataFrame, name: str = "<df>") -> None:
    plan = executed_plan(df)
    for node in ROW_UDF_NODES:
        if re.search(node, plan):
            raise AssertionError(
                f"{name}: per-row Python UDF node {node} found in physical plan "
                f"(BASELINE.json:15 forbids row-at-a-time Python):\n{plan[:2000]}"
            )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = "\n".join(pushed)
    if not pushed or all(p.strip().endswith("[]") for p in pushed):
        raise AssertionError(f"no filters pushed to scan:\n{plan[:2000]}")
    for frag in fragments:
        if frag not in joined:
            raise AssertionError(f"filter {frag!r} not pushed; got: {joined}")


def assert_pruned_columns(df: DataFrame, *absent_cols: str) -> None:
    plan = formatted_plan(df)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    joined = "\n".join(read)
    for col in absent_cols:
        if f"{col}:" in joined:
            raise AssertionError(
                f"column {col!r} read from parquet but should be pruned: {joined}"
            )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = executed_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(f"expected a broadcast join:\n{plan[:2000]}")


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries in the physical plan (lower is better;
    reused exchanges counted once, as Spark prints them once)."""
    plan = executed_plan(df)
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln and "ReusedExchange" not in ln
    )
