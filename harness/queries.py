"""Operator harness — one (Spark callable, DuckDB oracle SQL) pair per
SURVEY.md §2 operator. Keys match the Harness column there.

Conventions (driver contract, __spark_entry__.py):
  * every callable: (spark, sf_dir) -> DataFrame
  * every computed column aliased IDENTICALLY in Spark and SQL
  * results must be order-insensitively comparable: no unstable floats —
    double aggregates are rounded the same way on both sides
  * ops with no faithful ANSI-SQL equivalent have oracle=None (driver
    records a rows-only check)

The registry is assembled by module import; individual query modules
register with the @q decorator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

#: oracle-checked queries BEYOND the driver's 50-entry gate: verified by
#: scripts/check_oracle.py and tests/ locally, not shipped in queries()
EXTRA_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
EXTRA_ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None, extra: bool = False):
    def deco(fn):
        (EXTRA_QUERIES if extra else QUERIES)[name] = fn
        if oracle is not None:
            (EXTRA_ORACLES if extra else ORACLES)[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# registration side effects. ORDER MATTERS: the driver's correctness gate
# checks the first 50 registered queries, so the engine-defining families
# (CDC, LLM-data-pipeline, UDTF, multi-join) register first and the whole
# registry is kept at <= 50 entries (VERDICT.md round-1 next-round #1).
from . import q_cdc  # noqa: E402,F401
from . import q_textdata  # noqa: E402,F401
from . import q_advanced  # noqa: E402,F401
from . import q_tpch  # noqa: E402,F401
from . import q_relational  # noqa: E402,F401

assert len(QUERIES) <= 50, f"driver checks only 50 queries; got {len(QUERIES)}"
