"""Round-5 regressions: ADVICE r4 fixes (orphan-reclaim twin safety,
dead-creator fallback, py-files freshness) and VERDICT r4 guard tasks."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from forklift_spark.lakette.table import CommitConflictError
from forklift_spark.operators.merge import compact, merge_into
from forklift_spark.streaming.ingest import create_entity_table


def _seed_rows(spark, table, n=40):
    rows = [
        ("I", i, f"r{i % 4}", f"p/{i}.py", f"c{i}", "py", f"body {i}", None, 1)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows,
        "op string, seq long, repo string, path string, commit string, "
        "lang string, content string, event_ts timestamp, schema_v int",
    )
    merge_into(spark, table, df, query_id="seed", epoch=0)


# ----------------------------------------------- ADVICE r4 #1: orphan reclaim


def test_twin_compacts_never_share_a_writer_stamp(spark, tmp_path):
    """Two compacts from the same base can commit DIFFERENT content
    (bucket subsets / output specs), so a paused twin's version file must
    never be silently replaced via stamp-match reclaim: the per-invocation
    nonce makes their stamps distinct, and the loser CONFLICTS instead."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    _seed_rows(spark, table)
    meta = table.current_metadata()

    # a "paused twin" compact: exclusive-created its version file (with a
    # compact stamp + its own nonce) but has not yet swapped CURRENT
    twin = {
        **table._raw_current(),
        "version": meta["version"] + 1,
        "parent_version": meta["version"],
        "writer": {"query_id": "__compact__", "epoch": meta["version"],
                   "nonce": "twin-nonce"},
        "twin_payload": True,  # must survive — proves no clobber
    }
    opath = os.path.join(table.meta_dir, f"v{meta['version'] + 1}.json")
    with open(opath, "w") as f:
        json.dump(twin, f)

    with pytest.raises(CommitConflictError):
        compact(spark, table)
    with open(opath) as f:
        assert json.load(f).get("twin_payload") is True  # twin file intact


def test_dead_creator_orphan_reclaimed_by_foreign_writer(spark, tmp_path, monkeypatch):
    """A writer that crashed between exclusive create and CURRENT swap must
    not wedge the version number for everyone until vacuum: once the orphan
    is older than the reclaim grace (LAKETTE_RECLAIM_GRACE) and CURRENT
    provably never advanced, ANY writer may reclaim it."""
    monkeypatch.setenv("LAKETTE_RECLAIM_GRACE", "5")
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=2)
    meta = table.current_metadata()
    orphan = {
        **table._raw_current(),
        "version": meta["version"] + 1,
        "parent_version": meta["version"],
        "writer": {"query_id": "someone_else", "epoch": 3, "nonce": "dead"},
    }
    opath = os.path.join(table.meta_dir, f"v{meta['version'] + 1}.json")
    with open(opath, "w") as f:
        json.dump(orphan, f)
    old = time.time() - 30
    os.utime(opath, (old, old))  # orphan is well past the grace window

    me = {"query_id": "me", "epoch": 1}
    commit = table.commit_version(new_files=[], replaced_buckets=set(), writer=me)
    assert commit.version == meta["version"] + 1
    assert table.current_metadata()["writer"] == me  # ours, not the corpse's


def test_young_foreign_orphan_still_conflicts(spark, tmp_path):
    """Inside the grace window a foreign orphan's creator may be alive and
    merely slow — the commit must conflict, never reclaim."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=2)
    meta = table.current_metadata()
    orphan = {
        **table._raw_current(),
        "version": meta["version"] + 1,
        "parent_version": meta["version"],
        "writer": {"query_id": "someone_else", "epoch": 3},
        "their_payload": True,
    }
    opath = os.path.join(table.meta_dir, f"v{meta['version'] + 1}.json")
    with open(opath, "w") as f:
        json.dump(orphan, f)  # fresh mtime: inside any sane grace

    with pytest.raises(CommitConflictError):
        table.commit_version(
            new_files=[], replaced_buckets=set(),
            writer={"query_id": "me", "epoch": 1},
        )
    with open(opath) as f:
        assert json.load(f).get("their_payload") is True


# -------------------------------------------- ADVICE r4 #3: py-files freshness


def test_pyfiles_zip_is_built_fresh_and_matches_source():
    """The committed stale artifact is gone; make_pyfiles_zip() must emit a
    zip whose every entry is byte-identical to the CURRENT source (executor
    workers import mapInPandas helpers by name from this zip — stale bytes
    mean driver/executor version skew)."""
    import zipfile

    from scripts.bench_scaling import make_pyfiles_zip

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = make_pyfiles_zip()
    pkg_root = os.path.join(repo, "forklift_spark")
    with zipfile.ZipFile(zip_path) as z:
        names = [n for n in z.namelist() if n.endswith(".py")]
        assert any(n.endswith("operators/merge.py") for n in names)
        for n in names:
            src = os.path.join(repo, n)
            assert os.path.exists(src), f"zip entry {n} has no source file"
            with open(src, "rb") as f:
                assert z.read(n) == f.read(), f"zip entry {n} differs from source"
    # and every source module made it into the zip (nothing silently missing)
    on_disk = set()
    for root, _dirs, files in os.walk(pkg_root):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith(".py"):
                on_disk.add(os.path.relpath(os.path.join(root, fn), repo))
    assert on_disk == {n for n in names}
