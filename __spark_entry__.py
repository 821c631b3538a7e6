"""Driver contract for the spark-graft builder (PySpark target).

`entry` runs the flagship path: a changelog derived from the sf0.001
documents table is replayed through the real CDC engine (LWW dedupe ->
copy-on-write merge -> lakette snapshot scan). `queries` / `oracle_sql`
expose every implemented operator from SURVEY.md §2 with DuckDB parity SQL
where the op is SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end CDC replay into a lakette table at sf0.001."""
    from harness import QUERIES

    return QUERIES["scan_snapshot"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from harness import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query. The 8 keys
    omitted are rows-only BY DESIGN: dedup_minhash_lsh / dedup_simhash /
    ann_lsh / embedding_dup_pairs_lsh / ann_ivf (probabilistic hash or
    trained-index families — recall is measured against exact baselines in
    tests instead), pack_greedy (sequential first-fit is not
    SQL-expressible; property-tested), and mm_features / mm_frames
    (stubbed media decode — no codec libs in this image)."""
    from harness import ORACLES

    return dict(ORACLES)
