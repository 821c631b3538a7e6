"""Column mapping (lakette rename_column/drop_column): metadata-only
renames and drops over immutable data files — files written before and
after a rename read consistently, manifest stats/bloom pruning survives
the rename, dropped data never resurrects under a re-added name, restore
crosses a rename, and the changefeed refuses to diff across one."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.lakette.table import LaketteTable, _colmap
from forklift_spark.operators.changes import changes_since, snapshot_diff
from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import (
    CHANGELOG_SCHEMA,
    ENTITY_SCHEMA,
    KEY_COLS,
    create_entity_table,
)


def _ev(op, seq, path, commit=None, lang="py", content="body"):
    return (op, seq, "r", path, commit or f"c{seq}", lang, content, None, 1)


def _seed(spark, table, rows, epoch=0, renames=None, mode="cow"):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    for a, b in (renames or {}).items():
        df = df.withColumnRenamed(a, b)
    return merge_into(spark, table, df, query_id="seed", epoch=epoch, mode=mode)


def test_rename_is_metadata_only_and_reads_mixed_files(spark, tmp_path):
    t = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, t, [_ev("I", 1, "a", content="v1"), _ev("I", 2, "b", content="v2")])
    v_pre = t._raw_current()["version"]
    files_pre = {f["path"] for f in t.plan_files()}

    t.rename_column("lang", "language")
    meta = t._raw_current()
    # metadata-only: the live file set is byte-identical
    assert {f["path"] for f in t.plan_files()} == files_pre
    assert meta["colmap"]["language"] == "lang"  # physical stays put

    snap = t.snapshot(spark)
    assert "language" in snap.columns and "lang" not in snap.columns
    assert sorted((r.path, r.language) for r in snap.collect()) == [
        ("a", "py"), ("b", "py"),
    ]
    # time travel serves the pre-rename name with values
    old = t.snapshot(spark, version=v_pre)
    assert "lang" in old.columns and "language" not in old.columns

    # writes after the rename land under the stable physical name and read
    # back together with pre-rename files
    _seed(spark, t, [_ev("U", 3, "a", lang="rs", content="v1b")],
          epoch=1, renames={"lang": "language"})
    got = sorted((r.path, r.language, r.content)
                 for r in t.snapshot(spark).collect())
    assert got == [("a", "rs", "v1b"), ("b", "py", "v2")]


def test_pruning_survives_rename(spark, tmp_path):
    t = LaketteTable.create(
        str(tmp_path / "t"), ENTITY_SCHEMA, KEY_COLS, n_buckets=4,
        bloom_cols=["commit"], stats_cols=["lang"],
    )
    _seed(spark, t, [_ev("I", i, f"p{i}", commit=f"sha{i:03d}") for i in range(40)])
    t.rename_column("commit", "commit_sha")
    t.rename_column("lang", "language")
    meta = t._raw_current()
    assert meta["bloom_cols"] == ["commit_sha"]
    assert meta["stats_cols"] == ["language"]

    # bloom pruning under the NEW logical name: strictly fewer files, exact
    files = t.plan_files()
    kept = t._bloom_prune(files, {_colmap(meta)["commit_sha"]: "sha007"})
    assert 0 < len(kept) < len(files)
    got = t.snapshot(spark, col_eq={"commit_sha": "sha007"}).collect()
    assert [r.path for r in got] == ["p7"]
    # cstats pruning translates too (row-filter exactness regardless)
    rng = t.snapshot(spark, col_ranges={"language": ("py", "py")})
    assert rng.count() == 40

    # blooms/stats written AFTER the rename keep working (physical key
    # stays 'commit' inside new manifests)
    _seed(spark, t, [_ev("I", 100, "zz", commit="shaZZZ")],
          epoch=1, renames={"commit": "commit_sha", "lang": "language"})
    got = t.snapshot(spark, col_eq={"commit_sha": "shaZZZ"}).collect()
    assert [r.path for r in got] == ["zz"]


def test_drop_never_resurrects_and_retires_physical(spark, tmp_path):
    t = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, t, [_ev("I", 1, "a", lang="py"), _ev("I", 2, "b", lang="rs")])
    v_pre = t._raw_current()["version"]
    t.drop_column("lang")
    assert "lang" not in t.snapshot(spark).columns
    assert t._raw_current()["retired_cols"] == ["lang"]

    # re-add the SAME logical name via additive schema evolution: it must
    # get a FRESH physical id — pre-drop bytes stay invisible
    _seed(spark, t, [_ev("I", 3, "c", lang="go")], epoch=1)
    meta = t._raw_current()
    assert meta["colmap"]["lang"] == "lang__2"
    got = {r.path: r.lang for r in t.snapshot(spark).collect()}
    assert got == {"a": None, "b": None, "c": "go"}
    # time travel to the pre-drop version still serves the old values
    old = {r.path: r.lang
           for r in t.snapshot(spark, version=v_pre).collect() if r.path in "ab"}
    assert old == {"a": "py", "b": "rs"}


def test_add_columns_ddl_mints_fresh_physical_after_drop(spark, tmp_path):
    """Explicit ADD COLUMN (table.add_columns — the DDL twin of merge's
    implicit evolution) follows the same no-resurrection rule: re-adding
    a dropped logical name maps to a fresh physical id, and pre-existing
    rows read typed NULL."""
    t = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, t, [_ev("I", 1, "a", lang="py")])
    t.drop_column("lang")
    t.add_columns({"lang": "string", "stars": "bigint"})
    meta = t._raw_current()
    assert meta["colmap"]["lang"] == "lang__2"  # fresh physical id
    row = t.snapshot(spark).select("lang", "stars").collect()[0]
    assert row.lang is None and row.stars is None  # no resurrection


def test_restore_across_rename(spark, tmp_path):
    t = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, t, [_ev("I", 1, "a", lang="py")])
    v1 = t._raw_current()["version"]
    t.rename_column("lang", "language")
    _seed(spark, t, [_ev("I", 2, "b", lang="rs")], epoch=1,
          renames={"lang": "language"})
    t.restore(version=v1)
    snap = t.snapshot(spark)
    # the old schema AND its column mapping are restored: values intact
    assert sorted((r.path, r.lang) for r in snap.collect()) == [("a", "py")]


def test_key_column_rename(spark, tmp_path):
    t = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    _seed(spark, t, [_ev("I", 1, "a"), _ev("I", 2, "b")])
    t.rename_column("path", "file_path")
    assert t._raw_current()["key_cols"] == ["repo", "file_path"]
    # merges keyed by the new name hit the same buckets (hash on values)
    _seed(spark, t, [_ev("U", 3, "a", content="v2")], epoch=1,
          renames={"path": "file_path"})
    got = sorted((r.file_path, r.content) for r in t.snapshot(spark).collect())
    assert got == [("a", "v2"), ("b", "body")]


def test_guards(spark, tmp_path):
    t = LaketteTable.create(
        str(tmp_path / "t"), ENTITY_SCHEMA, KEY_COLS, n_buckets=2,
        cluster_by=["lang"],
    )
    _seed(spark, t, [_ev("I", 1, "a")])
    with pytest.raises(ValueError, match="no such user column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already in use"):
        t.rename_column("lang", "content")
    with pytest.raises(ValueError, match="already in use"):
        t.rename_column("lang", "seq")  # engine column
    with pytest.raises(ValueError, match="key column"):
        t.drop_column("path")
    with pytest.raises(ValueError, match="cluster_by"):
        t.drop_column("lang")

    lww = create_entity_table(str(tmp_path / "lww"), n_buckets=2, column_lww=True)
    with pytest.raises(ValueError, match="column_lww"):
        lww.rename_column("lang", "language")
    with pytest.raises(ValueError, match="column_lww"):
        lww.drop_column("lang")


def test_changefeed_refuses_to_span_a_rename(spark, tmp_path):
    t = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, t, [_ev("I", 1, "a")])
    v1 = t._raw_current()["version"]
    t.rename_column("lang", "language")
    _seed(spark, t, [_ev("I", 2, "b")], epoch=1, renames={"lang": "language"})
    # a span mixing the rename with data changes cannot align payloads
    with pytest.raises(ValueError, match="RENAMED inside the span"):
        changes_since(spark, t, v1)
    # but the rename commit ITSELF diffs as an empty span (metadata-only,
    # zero row changes by construction) in the NEW schema's shape...
    v_ren = v1 + 1
    ren_span = snapshot_diff(spark, t, v1, v_ren, full_rows=True)
    assert ren_span.count() == 0
    assert "language" in ren_span.columns
    # ...so a consumer advances its offset across it and resumes
    post = snapshot_diff(spark, t, v_ren, t._raw_current()["version"])
    assert [r.path for r in post.collect()] == ["b"]
