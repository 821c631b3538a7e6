"""Write-audit-publish staged commits (lakette stage_commit /
publish_staged / abort_staged, merge_into(publish=False), and the
expectations audit_and_publish composition)."""

import os

import pytest
from pyspark.sql import functions as F

from forklift_spark.lakette.table import CommitConflictError, LaketteTable
from forklift_spark.operators.expectations import (
    Expectation,
    ExpectationError,
    audit_and_publish,
)
from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import create_entity_table


def _events(spark, rows):
    return spark.createDataFrame(
        [("I", seq, repo, path, f"c{seq}", "py", content, None, 1)
         for (seq, repo, path, content) in rows],
        "op string, seq long, repo string, path string, commit string, "
        "lang string, content string, event_ts timestamp, schema_v int",
    )


def _state(table, spark):
    return sorted(
        (r["repo"], r["path"], r["seq"], r["content"])
        for r in table.snapshot(spark).collect()
    )


@pytest.fixture()
def seeded(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    merge_into(spark, table, _events(
        spark, [(i, f"r{i % 3}", f"p/{i}", f"body {i}") for i in range(12)]
    ), query_id="seed", epoch=0)
    return table


def test_stage_is_invisible_then_publish_equals_direct(spark, tmp_path, seeded):
    batch = _events(spark, [(100, "r0", "p/0", "NEW"), (101, "r9", "p/x", "ins")])
    before = _state(seeded, spark)
    v_before = seeded.current_metadata()["version"]

    stats = merge_into(spark, seeded, batch, query_id="wap", epoch=1, publish=False)
    assert stats.stage_id and stats.version is None
    # invisible to readers; epoch NOT marked committed (no exactly-once claim)
    assert _state(seeded, spark) == before
    assert seeded.current_metadata()["version"] == v_before
    assert not seeded.epoch_committed("wap", 1)
    # staged snapshot shows the audit view
    staged = {
        (r["repo"], r["path"]): (r["seq"], r["content"])
        for r in seeded.staged_snapshot(spark, stats.stage_id).collect()
    }
    assert staged[("r0", "p/0")] == (100, "NEW")
    assert staged[("r9", "p/x")] == (101, "ins")

    commit = seeded.publish_staged(stats.stage_id)
    assert commit.version == v_before + 1
    assert seeded.list_staged() == []

    # sha-exact vs the same merge committed directly on a twin table
    ref = create_entity_table(str(tmp_path / "ref"), n_buckets=4)
    merge_into(spark, ref, _events(
        spark, [(i, f"r{i % 3}", f"p/{i}", f"body {i}") for i in range(12)]
    ), query_id="seed", epoch=0)
    merge_into(spark, ref, batch, query_id="wap", epoch=1)
    assert _state(seeded, spark) == _state(ref, spark)


def test_abort_staged_removes_files_and_record(spark, seeded):
    stats = merge_into(
        spark, seeded, _events(spark, [(50, "r1", "p/1", "X")]),
        query_id="wap", epoch=1, publish=False,
    )
    rec = seeded.staged_record(stats.stage_id)
    paths = [os.path.join(seeded.root, f["path"]) for f in rec["new_files"]]
    assert paths and all(os.path.exists(p) for p in paths)
    before = _state(seeded, spark)
    removed = seeded.abort_staged(stats.stage_id)
    assert removed == len(paths)
    assert not any(os.path.exists(p) for p in paths)
    assert seeded.list_staged() == []
    assert _state(seeded, spark) == before


def test_publish_conflicts_with_overlapping_commit(spark, seeded):
    stats = merge_into(
        spark, seeded, _events(spark, [(60, "r0", "p/0", "staged-val")]),
        query_id="wap", epoch=1, publish=False,
    )
    # an overlapping commit lands while the audit runs (same key => same bucket)
    merge_into(spark, seeded, _events(spark, [(61, "r0", "p/0", "raced-val")]),
               query_id="racer", epoch=0)
    with pytest.raises(CommitConflictError):
        seeded.publish_staged(stats.stage_id)
    # the raced value survives; the stage is still listed for triage/abort
    assert dict(
        ((r["repo"], r["path"]), r["content"])
        for r in seeded.snapshot(spark).collect()
    )[("r0", "p/0")] == "raced-val"
    assert len(seeded.list_staged()) == 1
    seeded.abort_staged(stats.stage_id)


def test_publish_rebases_over_disjoint_commit(spark, seeded):
    # keys chosen to hash to different buckets: stage touches r9/p/x only
    stats = merge_into(
        spark, seeded, _events(spark, [(70, "r9", "p/x", "staged")]),
        query_id="wap", epoch=1, publish=False,
    )
    staged_buckets = {
        p[1] for p in seeded.staged_record(stats.stage_id)["replaced_buckets"]
    }
    # find a key hashing to a bucket the stage did NOT touch, then land a
    # provably-independent commit on it while the stage is pending
    cands = spark.createDataFrame(
        [(f"q{i}", f"z/{i}") for i in range(40)], "repo string, path string"
    ).withColumn("b", seeded.bucket_expr()).collect()
    repo, path = next(
        (r["repo"], r["path"]) for r in cands if r["b"] not in staged_buckets
    )
    seq = 71
    merge_into(spark, seeded, _events(spark, [(seq, repo, path, "independent")]),
               query_id="ind", epoch=0)
    commit = seeded.publish_staged(stats.stage_id)  # auto-rebase, no conflict
    state = dict(
        ((r["repo"], r["path"]), r["content"])
        for r in seeded.snapshot(spark).collect()
    )
    assert state[("r9", "p/x")] == "staged" and state[(repo, path)] == "independent"
    assert commit.version == seeded.current_metadata()["version"]


def test_vacuum_protects_staged_files(spark, seeded):
    stats = merge_into(
        spark, seeded, _events(spark, [(80, "r2", "p/2", "Y")]),
        query_id="wap", epoch=1, publish=False,
    )
    rec = seeded.staged_record(stats.stage_id)
    paths = [os.path.join(seeded.root, f["path"]) for f in rec["new_files"]]
    seeded.vacuum(keep_versions=1, grace_seconds=0.0)
    assert all(os.path.exists(p) for p in paths)
    seeded.publish_staged(stats.stage_id)


def test_audit_and_publish_pass_and_fail(spark, seeded):
    rules = [Expectation("content_nonnull",
                         "deleted OR content IS NOT NULL", "fail")]
    # pass: publish happens, counts returned
    stats = merge_into(
        spark, seeded, _events(spark, [(90, "r1", "p/4", "ok")]),
        query_id="wap", epoch=1, publish=False,
    )
    v0 = seeded.current_metadata()["version"]
    commit, counts = audit_and_publish(
        spark, seeded, stats.stage_id, rules, include_deleted=True
    )
    assert commit.version == v0 + 1 and counts == {"content_nonnull": 0}

    # fail: a NULL-content upsert violates the audit -> abort + raise
    stats = merge_into(
        spark, seeded, _events(spark, [(91, "r1", "p/5", None)]),
        query_id="wap", epoch=2, publish=False,
    )
    before = _state(seeded, spark)
    with pytest.raises(ExpectationError):
        audit_and_publish(
            spark, seeded, stats.stage_id, rules, include_deleted=True
        )
    assert seeded.list_staged() == [] and _state(seeded, spark) == before


def test_staged_mor_epoch(spark, seeded):
    stats = merge_into(
        spark, seeded, _events(spark, [(95, "r0", "p/0", "mor-val")]),
        query_id="wap", epoch=3, mode="mor", publish=False,
    )
    assert stats.stage_id is not None
    # audit view resolves LWW across base + staged delta
    staged = dict(
        ((r["repo"], r["path"]), (r["seq"], r["content"]))
        for r in seeded.staged_snapshot(spark, stats.stage_id).collect()
    )
    assert staged[("r0", "p/0")] == (95, "mor-val")
    seeded.publish_staged(stats.stage_id)
    assert dict(
        ((r["repo"], r["path"]), r["content"])
        for r in seeded.snapshot(spark).collect()
    )[("r0", "p/0")] == "mor-val"
