"""Integrity verification (lakette/fsck.py check_table): clean bills of
health on real tables (COW, MOR, renamed, cloned), and detection of every
injected corruption class — without ever repairing or deleting."""

import json
import os

import pytest

from forklift_spark.lakette.fsck import check_table
from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table


def _ev(op, seq, path, content="body"):
    return (op, seq, "r", path, f"c{seq}", "py", content, None, 1)


def _seed(spark, table, rows, epoch=0, mode="cow"):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    return merge_into(spark, table, df, query_id="seed", epoch=epoch, mode=mode)


@pytest.fixture()
def table(spark, tmp_path):
    t = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, t, [_ev("I", 1, "a"), _ev("I", 2, "b")])
    _seed(spark, t, [_ev("U", 3, "a", "v2")], epoch=1, mode="mor")
    return t


def test_healthy_tables_pass(spark, tmp_path, table):
    rep = check_table(table, spark=spark, deep=True)
    assert rep["ok"], rep["issues"]
    assert rep["checked"]["deep_files"] == rep["checked"]["files"]

    # renamed + cloned tables are healthy too (colmap checks run)
    table.rename_column("lang", "language")
    assert check_table(table)["ok"]
    clone, _pin = table.shallow_clone(str(tmp_path / "c"))
    rep = check_table(clone, spark=spark, deep=True)
    assert rep["ok"], rep["issues"]


def test_missing_referenced_file_detected(spark, table):
    victim = os.path.join(table.root, table.plan_files()[0]["path"])
    os.remove(victim)
    rep = check_table(table)
    assert not rep["ok"]
    assert any("missing" in i for i in rep["issues"])


def test_orphans_counted_not_flagged(spark, table):
    with open(os.path.join(table.data_dir, "snap9-zz-orphan.parquet"), "wb") as f:
        f.write(b"junk")
    rep = check_table(table)
    assert rep["ok"]  # orphans are debris, not corruption
    assert rep["checked"]["orphan_files"] == 1


def test_counter_drift_detected(spark, table):
    cur = table._raw_current()
    name = f"v{cur['version']}.json"
    cur["total_rows"] = cur["total_rows"] + 5
    with open(os.path.join(table.meta_dir, name), "w") as f:
        json.dump(cur, f)
    rep = check_table(table, files=False)
    assert not rep["ok"]
    assert any("counter total_rows" in i for i in rep["issues"])


def test_colmap_corruption_detected(spark, table):
    cur = table._raw_current()
    name = f"v{cur['version']}.json"
    cur["colmap"]["lang"] = "content"  # collide two logicals on one physical
    with open(os.path.join(table.meta_dir, name), "w") as f:
        json.dump(cur, f)
    rep = check_table(table, files=False)
    assert not rep["ok"]
    assert any("collide" in i for i in rep["issues"])


def test_deep_catches_lying_manifest(spark, table):
    # tamper a manifest shard's claimed row count: the file exists, the
    # metadata lies — only deep verification can see it
    cur = table._raw_current()
    ref = sorted(cur["manifests"].values())[0]
    full = os.path.join(table.root, ref)
    shard = json.load(open(full))
    shard["files"][0]["rows"] += 1
    with open(full, "w") as f:
        json.dump(shard, f)
    from forklift_spark.lakette import table as tmod
    tmod._MANIFEST_CACHE.clear()
    rep = check_table(table, spark=spark, files=False, deep=True)
    assert any("deep:" in i for i in rep["issues"])
