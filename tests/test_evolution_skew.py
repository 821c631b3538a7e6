"""M4 (additive schema evolution within an epoch) + M5 (hot-key skew salting)."""

import os

import pytest
from pyspark.sql import functions as F

from forklift_spark.changelog import ChangelogSpec, expected_final_state, generate_changelog
from forklift_spark.operators.merge import lww_dedupe, merge_into
from forklift_spark.streaming.ingest import (
    CHANGELOG_SCHEMA,
    CHANGELOG_SCHEMA_V2,
    create_entity_table,
    verify_state,
)

EVOLVE_SPEC = ChangelogSpec(
    n_events=3_000, n_repos=8, paths_per_repo=15, seed=13, evolve_at_fraction=0.5
)


def test_schema_evolution_mid_stream(spark, tmp_path):
    d = str(tmp_path / "log")
    generate_changelog(EVOLVE_SPEC, d)
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=8)

    # epoch 0: producer still on v1 — size_bytes not even projected
    full = spark.read.schema(CHANGELOG_SCHEMA_V2).parquet(f"{d}/seg-*.parquet")
    v1_events = full.filter(F.col("schema_ver") == 1).drop("size_bytes")
    merge_into(spark, table, v1_events, query_id="ev", epoch=0)
    assert "size_bytes" not in [f.name for f in table.schema().fields]

    # epoch 1: producer upgraded — additive ALTER + merge in the same commit
    v2_events = full.filter(F.col("schema_ver") == 2)
    stats = merge_into(spark, table, v2_events, query_id="ev", epoch=1)
    assert stats.evolved_columns == ["size_bytes"]
    assert "size_bytes" in [f.name for f in table.schema().fields]

    snap = table.snapshot(spark)
    # rows last written by a v1 event read as NULL; v2 rows are populated
    v2_rows = snap.filter(F.col("size_bytes").isNotNull())
    assert v2_rows.count() > 0
    bad = v2_rows.filter(F.col("size_bytes") != F.length("content")).count()
    assert bad == 0
    # and the evolved replay still matches the content oracle exactly
    exp = spark.createDataFrame(expected_final_state(EVOLVE_SPEC)[
        ["repo", "path", "commit", "lang", "content"]
    ])
    assert verify_state(spark, table, exp)["ok"]


def test_evolution_rejects_nothing_on_same_schema(spark, tmp_path):
    d = str(tmp_path / "log2")
    spec = ChangelogSpec(n_events=500, n_repos=4, paths_per_repo=5, seed=3)
    generate_changelog(spec, d)
    table = create_entity_table(str(tmp_path / "tbl2"), n_buckets=4)
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{d}/seg-*.parquet")
    s = merge_into(spark, table, df, query_id="q", epoch=0)
    assert s.evolved_columns == []


HOT_SPEC = ChangelogSpec(
    n_events=20_000,
    n_repos=50,
    paths_per_repo=2,  # few paths => (repo, path) keys genuinely hot
    hot_repo_fraction=0.5,
    seed=99,
)


@pytest.fixture(scope="module")
def hot_log(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hotlog"))
    generate_changelog(HOT_SPEC, d)
    return d


def test_skew_salted_replay_correct(spark, hot_log, tmp_path):
    """One repo holds ~50% of events over 2 paths — a single (repo, path)
    key carries ~25% of the batch. The salted two-phase dedupe must still be
    exactly correct."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=8)
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{hot_log}/seg-*.parquet")
    merge_into(spark, table, df, query_id="skew", epoch=0, salt_buckets=16)
    exp = spark.createDataFrame(expected_final_state(HOT_SPEC))
    assert verify_state(spark, table, exp)["ok"]


def test_salting_balances_first_shuffle(spark, hot_log):
    """Structural check: the salted phase-1 aggregate's grouping keys include
    the salt, so no single reducer key carries the hot key's full weight."""
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{hot_log}/seg-*.parquet")
    hot_key_share = (
        df.groupBy("repo", "path").count().orderBy(F.desc("count")).first()["count"]
        / df.count()
    )
    assert hot_key_share > 0.2  # fixture really is skewed
    salted = df.withColumn("_salt", F.pmod(F.xxhash64("seq"), F.lit(16)))
    per_group = salted.groupBy("repo", "path", "_salt").count()
    max_salted = per_group.orderBy(F.desc("count")).first()["count"]
    assert max_salted < hot_key_share * df.count() / 4  # hot key split >=4x
    # and the salted dedupe output matches the plain one
    a = lww_dedupe(df, ["repo", "path"], "seq").select("repo", "path", "seq")
    b = lww_dedupe(df, ["repo", "path"], "seq", salt_buckets=16).select(
        "repo", "path", "seq"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_schema_evolution_mor_mode(spark, tmp_path):
    """Additive evolution on the merge-on-read path: pre-evolution delta
    files read as NULL for the new column, post-evolution deltas populate
    it, and compaction folds both into one consistent base."""
    from forklift_spark.operators.merge import compact

    d = str(tmp_path / "log3")
    generate_changelog(EVOLVE_SPEC, d)
    table = create_entity_table(str(tmp_path / "tbl3"), n_buckets=8)

    full = spark.read.schema(CHANGELOG_SCHEMA_V2).parquet(f"{d}/seg-*.parquet")
    v1_events = full.filter(F.col("schema_ver") == 1).drop("size_bytes")
    merge_into(spark, table, v1_events, query_id="evm", epoch=0, mode="mor")
    v2_events = full.filter(F.col("schema_ver") == 2)
    stats = merge_into(spark, table, v2_events, query_id="evm", epoch=1, mode="mor",
                       dedupe_in_batch=False)
    assert stats.evolved_columns == ["size_bytes"]

    compact(spark, table)
    snap = table.snapshot(spark)
    bad = snap.filter(
        F.col("size_bytes").isNotNull() & (F.col("size_bytes") != F.length("content"))
    ).count()
    assert bad == 0
    exp = spark.createDataFrame(expected_final_state(EVOLVE_SPEC)[
        ["repo", "path", "commit", "lang", "content"]
    ])
    assert verify_state(spark, table, exp)["ok"]
