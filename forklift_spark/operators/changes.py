"""CDC-out: row-level changes between two committed table versions
(Iceberg changelog-scan parity, built on lakette time travel).

One full-outer join of the two snapshots — O(|old| + |new|), bucket-pruned
reads on both sides. Change taxonomy per logical key:

  old absent/tombstoned, new live            -> insert
  old live, new tombstoned                   -> delete
  old live, new live, seq changed            -> update
  anything else (same seq, both tombstoned,
  tombstone for a never-visible key)         -> not emitted

Emitted columns: change, key cols, seq (new side), content_sha (new side;
NULL for deletes). At 100 TB the join reads only the two metadata file
lists — no log replay — and prunes to buckets whose file sets differ
between the versions (changed_buckets_only=True, the default)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakette.table import LaketteTable


def snapshot_diff(
    spark: SparkSession,
    table: LaketteTable,
    from_version: int,
    to_version: int,
    *,
    changed_buckets_only: bool = True,
) -> DataFrame:
    """Changes that turn snapshot@from_version into snapshot@to_version."""
    meta_old = table.metadata_at(from_version)
    meta_new = table.metadata_at(to_version)
    buckets = None
    if changed_buckets_only and meta_old["n_buckets"] == meta_new["n_buckets"]:
        # a bucket can only differ if its file set changed (files are
        # immutable) — driver-side pruning straight from metadata
        def by_bucket(meta):
            d: dict[int, set[str]] = {}
            for f in meta["files"]:
                d.setdefault(f["bucket"], set()).add(f["path"])
            return d

        old_b, new_b = by_bucket(meta_old), by_bucket(meta_new)
        buckets = sorted(
            b
            for b in set(old_b) | set(new_b)
            if old_b.get(b, set()) != new_b.get(b, set())
        )

    key_cols = meta_new["key_cols"]
    old = table.snapshot(
        spark, include_deleted=True, metadata=meta_old, buckets=buckets
    ).alias("o")
    new = table.snapshot(
        spark, include_deleted=True, metadata=meta_new, buckets=buckets
    ).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_cols]
    j = old.join(new, cond, "full_outer")

    o_live = F.col("o.seq").isNotNull() & ~F.coalesce(F.col("o.deleted"), F.lit(False))
    n_live = F.col("n.seq").isNotNull() & ~F.coalesce(F.col("n.deleted"), F.lit(False))
    n_tomb = F.col("n.seq").isNotNull() & F.coalesce(F.col("n.deleted"), F.lit(False))
    change = (
        F.when(~o_live & n_live, F.lit("insert"))
        .when(o_live & n_tomb, F.lit("delete"))
        .when(o_live & n_live & (F.col("n.seq") != F.col("o.seq")), F.lit("update"))
    )
    return (
        j.select(
            change.alias("change"),
            *[F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in key_cols],
            F.col("n.seq").alias("seq"),
            F.when(n_live, F.col("n.content_sha")).alias("content_sha"),
        )
        .filter(F.col("change").isNotNull())
    )
