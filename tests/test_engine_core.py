"""M0–M3 engine-core tests: generator determinism, lakette commits,
LWW merge correctness (batch + streaming), exactly-once, verify_state."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from forklift_spark.changelog import ChangelogSpec, expected_final_state, generate_changelog
from forklift_spark.lakette import LaketteTable
from forklift_spark.operators.merge import lww_dedupe, merge_into
from forklift_spark.streaming.ingest import (
    CHANGELOG_SCHEMA,
    create_entity_table,
    replay_batch,
    run_ingest,
    verify_state,
)

SPEC = ChangelogSpec(n_events=4_000, n_repos=10, paths_per_repo=20, seed=7)


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("log")
    generate_changelog(SPEC, str(d))
    return str(d)


def test_generator_deterministic(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    ga = generate_changelog(SPEC, str(a))
    gb = generate_changelog(SPEC, str(b))
    assert [os.path.basename(p) for p in ga.segments] == [
        os.path.basename(p) for p in gb.segments
    ]
    pa = pd.read_parquet(str(a))
    pb = pd.read_parquet(str(b))
    pd.testing.assert_frame_equal(pa, pb)
    assert set(pa["op"].unique()) == {"I", "U", "D"}
    # out-of-order delivery actually happens
    assert not pa["seq"].is_monotonic_increasing


def test_oracle_shape():
    exp = expected_final_state(SPEC)
    assert exp.groupby(["repo", "path"]).size().max() == 1
    assert "op" not in exp.columns


def test_lww_dedupe_plain_vs_salted(spark, log_dir):
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-*.parquet")
    plain = lww_dedupe(df, ["repo", "path"], "seq")
    salted = lww_dedupe(df, ["repo", "path"], "seq", salt_buckets=8)
    assert plain.count() == plain.select("repo", "path").distinct().count()
    a = {tuple(r) for r in plain.select("repo", "path", "seq").collect()}
    b = {tuple(r) for r in salted.select("repo", "path", "seq").collect()}
    assert a == b


def test_batch_replay_sha_exact(spark, log_dir, tmp_path):
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=8)
    stats = replay_batch(spark, log_dir, table)
    assert stats.applied_rows > 0
    exp = spark.createDataFrame(expected_final_state(SPEC))
    res = verify_state(spark, table, exp)
    assert res["ok"], res
    # engine-managed columns present and consistent
    snap = table.snapshot(spark)
    bad = snap.filter(F.sha2("content", 256) != F.col("content_sha")).count()
    assert bad == 0


def test_multi_epoch_equals_single_epoch(spark, log_dir, tmp_path):
    segs = sorted(os.listdir(log_dir))
    table = create_entity_table(str(tmp_path / "tbl2"), n_buckets=8)
    half = len(segs) // 2
    for i, group in enumerate([segs[:half], segs[half:]]):
        df = spark.read.schema(CHANGELOG_SCHEMA).parquet(
            *[os.path.join(log_dir, s) for s in group]
        )
        merge_into(spark, table, df, query_id="multi", epoch=i)
    exp = spark.createDataFrame(expected_final_state(SPEC))
    assert verify_state(spark, table, exp)["ok"]


def test_epoch_idempotent(spark, log_dir, tmp_path):
    table = create_entity_table(str(tmp_path / "tbl3"), n_buckets=8)
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-00000.parquet")
    s1 = merge_into(spark, table, df, query_id="q", epoch=0)
    v1 = table.current_metadata()["version"]
    s2 = merge_into(spark, table, df, query_id="q", epoch=0)  # re-delivery
    assert not s1.skipped and s2.skipped
    assert table.current_metadata()["version"] == v1


def test_crash_between_commit_and_marker(spark, log_dir, tmp_path):
    table = create_entity_table(str(tmp_path / "tbl4"), n_buckets=8)
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-00000.parquet")
    merge_into(spark, table, df, query_id="q", epoch=0)
    # simulate crash: delete the marker but keep the committed metadata
    os.remove(table._marker_path("q", 0))
    v1 = table.current_metadata()["version"]
    s2 = merge_into(spark, table, df, query_id="q", epoch=0)
    assert s2.skipped  # detected via metadata writer — no double-apply
    assert table.current_metadata()["version"] == v1
    assert os.path.exists(table._marker_path("q", 0))  # marker healed


def test_streaming_replay_matches_batch(spark, log_dir, tmp_path):
    table = create_entity_table(str(tmp_path / "tbl5"), n_buckets=8)
    report = run_ingest(
        spark,
        log_dir,
        table,
        str(tmp_path / "ckpt"),
        query_id="stream",
        max_files_per_trigger=1,
    )
    assert len(report.epochs) >= 2  # genuinely rate-limited into micro-batches
    exp = spark.createDataFrame(expected_final_state(SPEC))
    assert verify_state(spark, table, exp)["ok"]
    # lineage rows written per epoch
    lineage = spark.read.parquet(os.path.join(table.lineage_dir))
    assert lineage.select("epoch").distinct().count() == len(
        [e for e in report.epochs if not e.skipped]
    )


def test_streaming_resume_from_checkpoint(spark, log_dir, tmp_path):
    """Stop after a prefix of the log, then resume with the same checkpoint:
    no events lost or double-applied."""
    table = create_entity_table(str(tmp_path / "tbl6"), n_buckets=8)
    ckpt = str(tmp_path / "ckpt6")
    # phase 1: feed only the first half of the segments
    import shutil

    feed = tmp_path / "feed"
    feed.mkdir()
    segs = sorted(os.listdir(log_dir))
    for s in segs[: len(segs) // 2]:
        shutil.copy(os.path.join(log_dir, s), feed / s)
    run_ingest(spark, str(feed), table, ckpt, query_id="resume")
    # phase 2: rest of the log arrives; resume from the same checkpoint
    for s in segs[len(segs) // 2 :]:
        shutil.copy(os.path.join(log_dir, s), feed / s)
    run_ingest(spark, str(feed), table, ckpt, query_id="resume")
    exp = spark.createDataFrame(expected_final_state(SPEC))
    assert verify_state(spark, table, exp)["ok"]


def test_duplicate_delivery_is_noop(spark, tmp_path):
    spec = ChangelogSpec(n_events=2_000, n_repos=6, paths_per_repo=10, seed=11,
                         duplicate_fraction=0.3)
    d = tmp_path / "duplog"
    generate_changelog(spec, str(d))
    table = create_entity_table(str(tmp_path / "tbl7"), n_buckets=8)
    run_ingest(spark, str(d), table, str(tmp_path / "ckpt7"), query_id="dup",
               max_files_per_trigger=1)
    exp = spark.createDataFrame(expected_final_state(spec))
    assert verify_state(spark, table, exp)["ok"]


def test_tombstone_blocks_resurrection(spark, tmp_path):
    """A delete at seq 10 followed (in arrival order) by an insert at seq 5
    for the same key must leave the key absent — tombstones make the merge
    order-insensitive across batches."""
    table = create_entity_table(str(tmp_path / "tbl8"), n_buckets=4)
    rows_d = [("D", 10, "r", "p", None, None, None, None, 1)]
    rows_i = [("I", 5, "r", "p", "c", "py", "old content", None, 1)]
    d1 = spark.createDataFrame(rows_d, CHANGELOG_SCHEMA)
    d2 = spark.createDataFrame(rows_i, CHANGELOG_SCHEMA)
    merge_into(spark, table, d1, query_id="t", epoch=0)
    merge_into(spark, table, d2, query_id="t", epoch=1)
    assert table.snapshot(spark).count() == 0
    assert table.snapshot(spark, include_deleted=True).count() == 1
