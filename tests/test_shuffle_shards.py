"""Deterministic corpus shuffle/sharding (operators/sampling.py
shuffle_shards): permutation + density properties, partitioning
invariance, salt independence, hash-family consistency with sample_hash,
guards, and the one-exchange plan contract."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.operators.sampling import (
    sample_hash,
    shuffle_shards,
    shuffle_shards_sql,
)
from forklift_spark.plans.guards import assert_no_row_python_udf, count_exchanges

N = 400


def _corpus(spark, n=N, parts=None):
    df = spark.range(n).selectExpr("id AS doc_id", "concat('s', id % 3) AS source")
    return df.repartition(parts) if parts else df


def test_permutation_and_density(spark):
    rows = shuffle_shards(_corpus(spark), "doc_id", n_shards=8, salt=7).collect()
    assert sorted(r.doc_id for r in rows) == list(range(N))  # a permutation
    by_shard = {}
    for r in rows:
        assert 0 <= r.shard < 8
        by_shard.setdefault(r.shard, []).append(r.pos)
    # pos is dense 0..k-1 within every shard
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    # every shard is populated and roughly balanced at 400/8
    assert len(by_shard) == 8
    assert all(20 <= len(p) <= 80 for p in by_shard.values())
    # the global order (shard-major, pos-minor) is NOT the id order
    order = [r.doc_id for r in sorted(rows, key=lambda r: (r.shard, r.pos))]
    assert order != list(range(N))


def test_partitioning_invariance_and_salts(spark):
    base = {
        (r.doc_id): (r.shard, r.pos)
        for r in shuffle_shards(_corpus(spark), "doc_id", 8, salt=7).collect()
    }
    reparted = {
        (r.doc_id): (r.shard, r.pos)
        for r in shuffle_shards(_corpus(spark, parts=13), "doc_id", 8, salt=7).collect()
    }
    assert base == reparted  # identical on any partitioning
    other = {
        (r.doc_id): (r.shard, r.pos)
        for r in shuffle_shards(_corpus(spark), "doc_id", 8, salt=8).collect()
    }
    assert base != other  # a new salt is a new epoch order


def test_hash_family_consistency(spark):
    """shard derives from the SAME _mix32 sample_hash reduces from:
    mix % 10^4 == sample_hash at every id."""
    df = shuffle_shards(_corpus(spark), "doc_id", 8, salt=3).withColumn(
        "sh", sample_hash("doc_id", 3)
    )
    bad = df.filter(F.pmod(F.col("sort_key"), F.lit(10_000)) != F.col("sh")).count()
    assert bad == 0


def test_keep_cols_guard_and_plan(spark):
    out = shuffle_shards(_corpus(spark), "doc_id", 4, keep_cols=["source"])
    assert out.columns == ["doc_id", "source", "shard", "sort_key", "pos"]
    # exactly ONE exchange: the per-shard rank window
    assert count_exchanges(out) == 1
    assert_no_row_python_udf(out, "shuffle_shards")
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_shards(_corpus(spark), "doc_id", 0)


def test_cap_per_group(spark):
    from forklift_spark.operators.sampling import cap_per_group, cap_per_group_sql

    df = _corpus(spark)
    out = cap_per_group(df, "source", "doc_id", k=50, salt=3)
    assert out.columns == df.columns  # pass-through columns
    # plan contract BEFORE any action (a finalized AQE plan prints the
    # initial plan too, double-counting): one exchange (the rank window),
    # no Python on the data path
    assert count_exchanges(out) == 1
    assert_no_row_python_udf(out, "cap_per_group")
    # Catalyst compiles the rank filter to WindowGroupLimit with a PARTIAL
    # pass BEFORE the exchange: only <=k rows per group per input partition
    # cross the shuffle — the property that makes the cap map-side at 100 TB
    from forklift_spark.plans.guards import executed_plan

    plan = executed_plan(out)
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan[:1500]
    rows = out.collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.source, set()).add(r.doc_id)
    # every group capped at exactly k (each source has ~133 > 50 docs)
    assert set(by_g) == {"s0", "s1", "s2"}
    assert all(len(v) == 50 for v in by_g.values())
    # deterministic + partitioning-invariant survivors
    again = {
        (r.source, r.doc_id)
        for r in cap_per_group(_corpus(spark, parts=11), "source", "doc_id", 50, 3).collect()
    }
    assert again == {(r.source, r.doc_id) for r in rows}
    # k above the group size keeps everything
    assert cap_per_group(df, "source", "doc_id", k=10_000).count() == N
    with pytest.raises(ValueError, match="k must be"):
        cap_per_group(df, "source", "doc_id", k=0)
    # the SQL twin keeps the identical rows in the oracle engine
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE t AS SELECT range AS doc_id, "
        f"'s' || CAST(range % 3 AS VARCHAR) AS source FROM range({N})"
    )
    duck = {
        (r[1], r[0])
        for r in con.execute(
            "SELECT doc_id, source FROM t QUALIFY "
            + cap_per_group_sql("source", "doc_id", 50, salt=3)
        ).fetchall()
    }
    assert duck == {(r.source, r.doc_id) for r in rows}


def test_sql_twin_matches_duckdb(spark):
    """The oracle-SQL twin, run in the ORACLE ENGINE (DuckDB), computes
    the identical (shard, sort_key, pos) for every id — the exact
    cross-engine claim the harness oracle replays at sf scale."""
    import duckdb

    shard_sql, key_sql, over_sql = shuffle_shards_sql("doc_id", 8, salt=7)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t AS SELECT range AS doc_id FROM range({N})")
    duck = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"SELECT doc_id, {shard_sql} AS shard, {key_sql} AS sort_key, "
            f"row_number() OVER ({over_sql}) - 1 AS pos FROM t"
        ).fetchall()
    }
    col_rows = {
        r.doc_id: (r.shard, r.sort_key, r.pos)
        for r in shuffle_shards(_corpus(spark), "doc_id", 8, salt=7).collect()
    }
    assert duck == col_rows
