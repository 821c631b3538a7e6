"""Column profiling — the data-quality reconnaissance pass a pipeline runs
before writing expectations (operators/expectations.py): per-column null
counts, exact distinct cardinality, and min/max, in ONE aggregate job.

Scale shape: a single `df.agg(...)` carrying every column's aggregates —
one pass over the data, partial-aggregated map-side. Exact
count_distinct over several columns makes Catalyst plan an Expand (one
duplicated stream per distinct column); that is the documented price of
EXACT cardinality in one pass. For reconnaissance at 100 TB pass
`approx=True`: HLL sketches (approx_count_distinct) collapse the Expand
back to one stream. The harness oracle runs the exact mode; both are the
same one-job shape.

Output is LONG-form (one row per column: column_name, n_rows, n_nulls,
n_distinct, min_str, max_str) so the profile of a 2000-column table is
2000 rows, not a 10000-column row. min/max are computed in the column's
native type, then cast to string for the uniform schema."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame, cols: list[str] | None = None, *, approx: bool = False
) -> DataFrame:
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("column_profile needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"column_profile: no such columns {missing}")
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx else
        (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_n{i}"),
            distinct(c).alias(f"_d{i}"),
            F.min(F.col(c)).cast("string").alias(f"_lo{i}"),
            F.max(F.col(c)).cast("string").alias(f"_hi{i}"),
        ]
    one = df.agg(*aggs)
    # melt the single wide row into long form — stack() is a generator
    # expression, no extra job or exchange
    parts = ", ".join(
        f"'{c}', _n{i}, _d{i}, _lo{i}, _hi{i}" for i, c in enumerate(cols)
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {parts}) AS "
            "(column_name, n_nulls, n_distinct, min_str, max_str)"
        ),
        F.col("_rows").alias("n_rows"),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")
