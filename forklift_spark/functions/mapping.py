"""P2 — declarative column-mapping spec compiler.

The reference's central abstraction is the column-mapping spec: per
destination table, each output column is declared as a rename / cast /
scalar transform / constant over source columns (BASELINE.json:6 — the
reference tree itself is empty, see SURVEY.md §0). Here that becomes a
*compiler from a dict spec to a single Catalyst `select`*, so the whole
mapping stays inside whole-stage codegen. Entries may be:

  "out": "in_col"                      rename (or SQL expression string)
  "out": Column                        any pyspark Column expression
  "out": ("cast", "in_col", "type")    cast shorthand
  "out": ("const", value)              constant
  "out": ("pandas", fn, "type")        vectorized pandas UDF stage — the
                                       generalized "transform" slot; per-row
                                       Python is deliberately unsupported.

compile_mapping(df, spec) -> df.select(...) in spec order.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from typing import Any

import pandas as pd  # noqa: F401  (pandas UDF stages type against pd.Series)
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MappingSpec = Mapping[str, Any]


def _compile_entry(out_name: str, entry: Any) -> Column:
    if isinstance(entry, Column):
        return entry.alias(out_name)
    if isinstance(entry, str):
        # column name or SQL expression — F.expr handles both
        return F.expr(entry).alias(out_name)
    if isinstance(entry, tuple):
        kind = entry[0]
        if kind == "cast":
            _, col, typ = entry
            return F.col(col).cast(typ).alias(out_name)
        if kind == "const":
            return F.lit(entry[1]).alias(out_name)
        if kind == "pandas":
            _, fn, ret_type = entry
            if not callable(fn):
                raise TypeError(f"mapping {out_name!r}: pandas stage needs a callable")
            udf = F.pandas_udf(ret_type)(fn)
            # the callable declares its input columns via attribute or takes 1 col
            cols = getattr(fn, "input_cols", None)
            if not cols:
                raise ValueError(
                    f"mapping {out_name!r}: set fn.input_cols = ['col', ...]"
                )
            return udf(*[F.col(c) for c in cols]).alias(out_name)
        raise ValueError(f"mapping {out_name!r}: unknown kind {kind!r}")
    if callable(entry):
        raise TypeError(
            f"mapping {out_name!r}: bare Python callables are per-row UDFs and are "
            "prohibited (BASELINE.json:15) — use ('pandas', fn, type) instead"
        )
    raise TypeError(f"mapping {out_name!r}: unsupported spec entry {type(entry)}")


def compile_mapping(df: DataFrame, spec: MappingSpec) -> DataFrame:
    """Compile the spec into ONE select — a single Catalyst projection."""
    return df.select(*[_compile_entry(name, entry) for name, entry in spec.items()])
