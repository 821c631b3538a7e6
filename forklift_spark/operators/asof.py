"""J7/J8 — range join and as-of join (Spark has no native operator).

Both are built as compositions of DataFrame ops that scale:

  range_join   equi-join on a bucketized range key + residual filter — the
               join degenerates to broadcast when the band table is small,
               and to a co-partitioned equi-join (not a cross product) when
               it is not.
  asof_join    union-tag-window: tag both inputs, union by key/time, take
               `last(right_payload, ignorenulls=True)` over a key-partitioned
               time-ordered window. One shuffle, no per-row Python, no
               key×key join explosion — this is the plan that survives a
               100x scale-up (a naive join+argmax re-materializes every
               (left, right) pair per key first).

An `applyInPandas`+`pd.merge_asof` variant is provided for parity testing
and for semantics the window form can't express (nearest/backward tolerance).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int | None = None,
) -> DataFrame:
    """fact rows matched to band rows where lo <= value < hi.

    With bucket_width, both sides are exploded onto a shared bucket grid and
    equi-joined on bucket id before the residual range predicate — the
    scalable plan for large band tables. Without it, a plain (broadcastable)
    theta join is used — right when bands is a small dimension.
    """
    theta = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    if bucket_width is None:
        return fact.join(F.broadcast(bands), theta)
    b = bands.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                (F.col(lo_col) / bucket_width).cast("long"),
                ((F.col(hi_col) - 1) / bucket_width).cast("long"),
            )
        ),
    )
    f = fact.withColumn("_bk", (F.col(value_col) / bucket_width).cast("long"))
    return f.join(b, on=[f["_bk"] == b["_bk"]]).filter(theta).drop("_bk")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    right_ts <= left_ts within the same key (backward as-of)."""
    lt = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = right.select(
        *key_cols,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in right_payload],
    )
    l_cols = [c for c in left.columns]
    unioned = lt.select(
        *l_cols,
        "_t",
        "_side",
        *[F.lit(None).cast(rt.schema[c].dataType).alias(c) for c in right_payload],
    ).unionByName(
        rt.select(
            *[
                F.col(c) if c in key_cols else F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in l_cols
            ],
            "_t",
            "_side",
            *right_payload,
        )
    )
    # right rows sort before left rows at equal timestamps => `<=` semantics
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *l_cols,
        "_side",
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"asof_{c}")
            for c in right_payload
        ],
        F.max(F.when(F.col("_side") == 0, F.col("_t"))).over(w).alias("asof_ts"),
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """Cogrouped-map variant: per-key `pd.merge_asof` via
    cogroup(...).applyInPandas (Arrow-batched — the sanctioned slow path,
    never row-at-a-time; both sides shuffle once on the key, no pair
    materialization)."""
    out_schema = left.schema.add("asof_ts", right.schema[right_ts].dataType)
    for c in right_payload:
        out_schema = out_schema.add(f"asof_{c}", right.schema[c].dataType)
    out_cols = [f.name for f in out_schema.fields]
    r_sel = right.select(
        *key_cols, F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_payload]
    )

    def per_key(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts)
        rpdf = rpdf.sort_values("_rts")
        if rpdf.empty:
            out = lpdf.copy()
            out["asof_ts"] = pd.NaT
            for c in right_payload:
                out[f"asof_{c}"] = None
            return out[out_cols]
        m = pd.merge_asof(
            lpdf,
            rpdf.drop(columns=key_cols),
            left_on=left_ts,
            right_on="_rts",
            direction="backward",
        )
        m = m.rename(columns={"_rts": "asof_ts", **{c: f"asof_{c}" for c in right_payload}})
        return m[out_cols]

    return (
        left.groupBy(*key_cols)
        .cogroup(r_sel.groupBy(*key_cols))
        .applyInPandas(per_key, out_schema)
    )
