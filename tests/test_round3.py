"""Round-3 hardening (VERDICT r2 next-round #1,2,3,6,7 + ADVICE r2):

  * base-snapshot optimistic concurrency — a commit computed against a
    stale snapshot can never silently drop an interleaving writer's rows
    (ADVICE high); provably-independent commits (disjoint buckets) REBASE
    automatically (VERDICT #6)
  * executor-side data-file writer — zero per-file driver I/O per epoch
    (VERDICT #1), per-file min/max key stats + range pruning (VERDICT #7)
  * per-bucket manifest metadata — commit cost independent of total table
    file count (VERDICT #2)
  * legacy delta-tag classification + vacuum grace period (ADVICE medium)
"""

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from forklift_spark.lakette.table import CommitConflictError, LaketteTable
from forklift_spark.operators.merge import compact, merge_into
from forklift_spark.streaming.ingest import (
    CHANGELOG_SCHEMA,
    create_entity_table,
    verify_state,
)


def _rows(ops):
    """(op, seq, repo, path, content) -> full envelope tuples."""
    return [
        (op, seq, repo, path, f"c{seq}", "py", content, None, 1)
        for (op, seq, repo, path, content) in ops
    ]


def _mk(name, bucket, rows=1):
    return {"path": f"data/{name}.parquet", "bucket": bucket, "rows": rows,
            "delta": False, "kmin": None, "kmax": None}


# ----------------------------------- base-snapshot validation (ADVICE high)


def test_stale_base_overlapping_buckets_is_a_conflict(tmp_path):
    """The r2 lost-update: writer B's merge ran against v1, writer A commits
    v2 touching bucket 0 meanwhile; B's commit also touches bucket 0. B must
    FAIL with CommitConflictError, not silently drop A's bucket-0 rows."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    base = table.current_metadata()["version"]
    table.commit_version(
        new_files=[_mk("a", 0)], replaced_buckets={0},
        writer={"query_id": "A", "epoch": 0}, base_version=base,
    )
    with pytest.raises(CommitConflictError, match="lost update|touched buckets"):
        table.commit_version(
            new_files=[_mk("b", 0)], replaced_buckets={0},
            writer={"query_id": "B", "epoch": 0}, base_version=base,
        )
    # winner's state intact
    files = table.current_metadata()["files"]
    assert [f["path"] for f in files] == ["data/a.parquet"]


def test_stale_base_disjoint_buckets_rebases(tmp_path):
    """VERDICT r2 #6: interleaving commits on DISJOINT buckets are provably
    independent — the stale-base commit rebases and both land."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    base = table.current_metadata()["version"]
    table.commit_version(
        new_files=[_mk("a", 0)], replaced_buckets={0},
        writer={"query_id": "A", "epoch": 0}, base_version=base,
    )
    commit = table.commit_version(
        new_files=[_mk("b", 1)], replaced_buckets={1},
        writer={"query_id": "B", "epoch": 0}, base_version=base,
    )
    meta = table.current_metadata()
    assert meta["version"] == commit.version == base + 2
    assert {f["path"] for f in meta["files"]} == {"data/a.parquet", "data/b.parquet"}
    # MOR-style append (no replaced buckets) from the same stale base also
    # rebases — appends can never overwrite anyone
    table.commit_version(
        new_files=[_mk("c", 2)], replaced_buckets=set(),
        writer={"query_id": "C", "epoch": 0}, base_version=base,
    )
    assert len(table.current_metadata()["files"]) == 3


def test_stale_base_schema_change_is_a_conflict(tmp_path):
    """A concurrent schema evolution invalidates a stale writer's plan."""
    import pyspark.sql.types as T

    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    base = table.current_metadata()["version"]
    evolved = T.StructType(
        table.schema().fields + [T.StructField("extra", T.LongType(), True)]
    )
    table.commit_version(
        new_files=[_mk("a", 0)], replaced_buckets={0}, schema=evolved,
        writer={"query_id": "A", "epoch": 0}, base_version=base,
    )
    with pytest.raises(CommitConflictError, match="schema"):
        table.commit_version(
            new_files=[_mk("b", 1)], replaced_buckets={1},
            writer={"query_id": "B", "epoch": 0}, base_version=base,
        )


def test_racing_merges_disjoint_keys_both_commit(spark, tmp_path):
    """End-to-end VERDICT r2 #6: two real merge_into jobs racing on keys in
    different buckets both commit (loser rebases); final state has both."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=8)
    # pick two keys that land in different buckets (checked, not assumed)
    cands = [f"{c}.py" for c in "abcdefgh"]
    b = {
        r.path: r.b
        for r in spark.createDataFrame(
            [("r", p) for p in cands], "repo string, path string"
        ).select("path", table.bucket_expr().alias("b")).collect()
    }
    p1 = cands[0]
    p2 = next(p for p in cands[1:] if b[p] != b[p1])

    errs = []

    def _merge(qid, path, seq):
        try:
            df = spark.createDataFrame(
                _rows([("I", seq, "r", path, f"v{seq}")]), CHANGELOG_SCHEMA
            )
            merge_into(spark, table, df, query_id=qid, epoch=0)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=_merge, args=("w1", p1, 1))
    t2 = threading.Thread(target=_merge, args=("w2", p2, 2))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    snap = {r.path: r.content for r in table.snapshot(spark).collect()}
    assert snap == {p1: "v1", p2: "v2"}


# --------------------------- executor-side writer: no driver per-file I/O


def test_merge_epoch_does_zero_per_file_driver_io(spark, tmp_path, monkeypatch):
    """VERDICT r2 #1 'done' criterion: a merge epoch performs NO parquet
    footer reads and no per-file renames on the driver — metadata writes
    stay O(touched buckets). Executors (separate processes) are unaffected
    by these driver-side patches."""
    import pyarrow.parquet as pq

    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=16)

    def _no_footer(*a, **k):
        raise AssertionError("driver-side parquet footer read on the commit path")

    monkeypatch.setattr(pq, "read_metadata", _no_footer)
    replace_calls = []
    real_replace = os.replace
    monkeypatch.setattr(
        os, "replace", lambda *a: (replace_calls.append(a[0]), real_replace(*a))[1]
    )

    events = _rows(
        [("I", i, f"repo_{i % 11}", f"f{i}.py", f"v{i}") for i in range(300)]
    )
    stats = merge_into(
        spark, table,
        spark.createDataFrame(events, CHANGELOG_SCHEMA),
        query_id="noio", epoch=0, mode="mor",
    )
    assert stats.applied_rows == 300
    n_files = len(table.current_metadata()["files"])
    assert n_files >= 8  # many data files really were written...
    # ...but driver renames are only metadata-level: per-bucket manifests +
    # CURRENT swap + marker + metrics — bounded by touched buckets, with no
    # per-DATA-file term (every replaced path is json, never parquet)
    assert not any(p.endswith(".parquet") for p in replace_calls)
    assert len(replace_calls) <= stats.touched_buckets + 4


def test_datafiles_carry_key_stats_and_range_pruning_works(spark, tmp_path):
    """VERDICT r2 #7: manifest entries carry min/max of the first key col;
    a repo-prefix scan reads strictly fewer files with identical results."""
    # target_file_rows makes the sorted COW writer roll files: inside each
    # hash bucket, consecutive key-sorted files get tight disjoint ranges —
    # that is what range pruning needs (hash buckets alone mix all repos)
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4, target_file_rows=30)
    events = _rows(
        [("I", i, f"org/r{i % 5}", f"f{i}.py", f"v{i}") for i in range(100)]
        + [("I", 1000 + i, f"zz/r{i % 5}", f"g{i}.py", f"w{i}") for i in range(100)]
    )
    merge_into(spark, table, spark.createDataFrame(events, CHANGELOG_SCHEMA),
               query_id="mm", epoch=0)
    meta = table.current_metadata()
    assert all(f["kmin"] is not None and f["kmax"] is not None for f in meta["files"])

    rng = ("org/", "org/￿")
    pruned = table.plan_files(key_range=rng, metadata=meta)
    assert 0 < len(pruned) < len(meta["files"])
    got = sorted(
        (r.repo, r.path, r.content)
        for r in table.snapshot(spark, key_range=rng).collect()
    )
    want = sorted(
        (r.repo, r.path, r.content)
        for r in table.snapshot(spark).filter(F.col("repo").startswith("org/")).collect()
    )
    assert got == want and len(got) == 100


# ------------------------------------- per-bucket manifests (VERDICT #2)


def test_commit_cost_independent_of_table_file_count(spark, tmp_path):
    """A 1-bucket epoch on a table with many files writes only: ONE version
    file (no inline file list, small), the touched bucket's manifest, and
    the epoch bookkeeping — never O(total files) metadata bytes."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=16)
    seed = _rows([("I", i, f"repo_{i % 13}", f"f{i}.py", f"v{i}") for i in range(400)])
    merge_into(spark, table, spark.createDataFrame(seed, CHANGELOG_SCHEMA),
               query_id="seed", epoch=0, mode="mor")
    compact(spark, table)
    total_files = len(table.current_metadata()["files"])
    assert total_files >= 10

    manifests_before = set(os.listdir(table.manifests_dir))
    one = _rows([("U", 9999, "repo_0", "f0.py", "patched")])
    stats = merge_into(spark, table, spark.createDataFrame(one, CHANGELOG_SCHEMA),
                       query_id="one", epoch=0)
    assert stats.touched_buckets == 1
    new_manifests = set(os.listdir(table.manifests_dir)) - manifests_before
    assert len(new_manifests) == 1  # only the touched bucket was rewritten

    with open(os.path.join(table.meta_dir, "CURRENT")) as f:
        vname = f.read().strip()
    vpath = os.path.join(table.meta_dir, vname)
    with open(vpath) as f:
        raw = json.load(f)
    assert "files" not in raw  # never the flat list
    assert raw["total_files"] == len(table.current_metadata()["files"])
    assert os.path.getsize(vpath) < 4096  # summary + refs only

    # correctness untouched
    assert {
        r.content for r in table.snapshot(spark).filter(F.col("path") == "f0.py").collect()
    } == {"patched"}


def test_lakette1_metadata_still_reads_and_upgrades(spark, tmp_path):
    """Backward compat: a table whose CURRENT version carries an inline
    `files` list (lakette/1) reads fine and its next commit shards the
    untouched buckets into manifests."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    events = _rows([("I", i, f"repo_{i % 3}", f"f{i}.py", f"v{i}") for i in range(60)])
    merge_into(spark, table, spark.createDataFrame(events, CHANGELOG_SCHEMA),
               query_id="v1", epoch=0)
    # downgrade the current version file to the legacy inline format
    meta = table.current_metadata()
    legacy = {k: v for k, v in meta.items() if k not in ("manifests", "total_files", "total_rows")}
    legacy["format"] = "lakette/1"
    with open(os.path.join(table.meta_dir, f"v{meta['version']}.json"), "w") as f:
        json.dump(legacy, f)

    snap1 = sorted((r.repo, r.path) for r in table.snapshot(spark).collect())
    assert len(snap1) == 60
    upd = _rows([("U", 1000, "repo_0", "f0.py", "new")])
    merge_into(spark, table, spark.createDataFrame(upd, CHANGELOG_SCHEMA),
               query_id="v1", epoch=1)
    raw = table._raw_current()
    assert "files" not in raw and raw.get("manifests")
    snap2 = {(r.repo, r.path): r.content for r in table.snapshot(spark).collect()}
    assert snap2[("repo_0", "f0.py")] == "new" and len(snap2) == 60


# ------------------------------ legacy delta classification (ADVICE med)


def test_legacy_untagged_files_stay_dirty_under_requires_dedup(spark, tmp_path):
    """Metadata with requires_dedup set and SOME files missing the per-file
    delta tag (pre-upgrade deltas): untagged files must be treated dirty —
    LWW still resolves — even though tagged files exist (the r2 bug made
    `any('delta' in f)` flip legacy buckets to clean)."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=2)
    merge_into(spark, table, spark.createDataFrame(
        _rows([("I", 1, "r", "a.py", "old")]), CHANGELOG_SCHEMA),
        query_id="lg", epoch=0, mode="mor")
    merge_into(spark, table, spark.createDataFrame(
        _rows([("U", 2, "r", "a.py", "new")]), CHANGELOG_SCHEMA),
        query_id="lg", epoch=1, mode="mor")
    meta = table.current_metadata()
    # strip the delta tag from the FIRST delta file only (legacy mix);
    # leave at least one tagged file in place
    doctored = dict(meta)
    files = [dict(f) for f in meta["files"]]
    untagged = next(f for f in files if f.get("delta"))
    del untagged["delta"]
    assert any("delta" in f and f.get("delta") for f in files)
    doctored["files"] = files
    doctored["requires_dedup"] = True

    rows = table.snapshot(spark, metadata=doctored).collect()
    assert [(r.path, r.content) for r in rows] == [("a.py", "new")]  # LWW held


# ------------------------------ column-pruned snapshot reads (r3)


def test_snapshot_column_pruning_reaches_scan_through_lww(spark, tmp_path):
    """snapshot(columns=[...]): the MOR dirty-side LWW packs payload into
    one max_by(struct(...)) that Catalyst cannot prune INTO, so narrow
    reads of a wide dirty table must prune at the SCAN — content never
    read, never shuffled — while returning exactly the full read's values."""
    from forklift_spark.plans.guards import assert_pruned_columns

    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    events = _rows(
        [("I", i, f"repo_{i % 5}", f"f{i}.py", f"body-{i}" * 50) for i in range(80)]
    )
    merge_into(spark, table, spark.createDataFrame(events, CHANGELOG_SCHEMA),
               query_id="np", epoch=0, mode="mor")  # dirty: LWW on read

    narrow = table.snapshot(spark, columns=["lang"])
    assert_pruned_columns(narrow, "content", "commit")
    assert set(narrow.columns) == {"repo", "path", "lang", "seq", "content_sha"}

    full = {
        (r.repo, r.path, r.lang, r.seq)
        for r in table.snapshot(spark).select("repo", "path", "lang", "seq").collect()
    }
    got = {
        (r.repo, r.path, r.lang, r.seq)
        for r in narrow.select("repo", "path", "lang", "seq").collect()
    }
    assert got == full and len(got) == 80

    with pytest.raises(ValueError, match="unknown snapshot columns"):
        table.snapshot(spark, columns=["nope"])


def test_snapshot_diff_never_reads_payload_without_full_rows(spark, tmp_path):
    """cdc_changes-shape diffs only need keys + engine columns: both scan
    sides must prune content (a changelog over a wide table ships no
    bodies); full_rows=True keeps the new side wide, old side narrow."""
    from forklift_spark.operators.changes import snapshot_diff
    from forklift_spark.plans.guards import assert_pruned_columns

    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    ins = _rows([("I", i, "r", f"f{i}.py", f"v{i}") for i in range(40)])
    merge_into(spark, table, spark.createDataFrame(ins, CHANGELOG_SCHEMA),
               query_id="d", epoch=0)
    v1 = table.current_metadata()["version"]
    upd = _rows([("U", 1000 + i, "r", f"f{i}.py", f"w{i}") for i in range(10)])
    merge_into(spark, table, spark.createDataFrame(upd, CHANGELOG_SCHEMA),
               query_id="d", epoch=1)
    v2 = table.current_metadata()["version"]

    slim = snapshot_diff(spark, table, v1, v2)
    assert_pruned_columns(slim, "content")
    assert slim.filter("change = 'update'").count() == 10

    wide = snapshot_diff(spark, table, v1, v2, full_rows=True)
    rows = {r.path: r.content for r in wide.collect()}
    assert rows["f3.py"] == "w3"
