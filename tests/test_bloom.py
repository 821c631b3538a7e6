"""Per-file bloom pruning (lakette/bloom.py + snapshot(col_eq=)): filter
math, end-to-end reverse lookup with strictly fewer files read, dirty-group
exactness under merge-on-read, and composition with bucket pruning."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.lakette import bloom
from forklift_spark.lakette.table import LaketteTable
from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import (
    CHANGELOG_SCHEMA,
    ENTITY_SCHEMA,
    KEY_COLS,
)


def _ev(op, seq, path, commit=None, content="body"):
    return (op, seq, "r", path, commit or f"c{seq}", "py", content, None, 1)


def _table(root, **kw):
    return LaketteTable.create(
        root, ENTITY_SCHEMA, KEY_COLS, n_buckets=4,
        bloom_cols=["commit"], **kw,
    )


def _seed(spark, table, rows, epoch=0, mode="cow"):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    return merge_into(spark, table, df, query_id="seed", epoch=epoch, mode=mode)


def test_bloom_math():
    vals = [f"commit-{i}" for i in range(500)]
    spec = bloom.build({bloom.h64(v) for v in vals})
    assert all(bloom.might_contain(spec, v) for v in vals)  # no false negatives
    fp = sum(bloom.might_contain(spec, f"absent-{i}") for i in range(2000))
    assert fp / 2000 < 0.05  # ~1% design point, generous bound
    # malformed/missing specs are conservatively kept
    assert bloom.might_contain({}, "x")
    assert bloom.might_contain({"m": 8, "k": 2, "b": "!!!"}, "x")
    # sizing clamps
    assert bloom.size_for(1) == bloom.MIN_BITS
    assert bloom.size_for(10**9) == bloom.MAX_BITS


def test_reverse_lookup_prunes_files_and_is_exact(spark, tmp_path):
    table = _table(str(tmp_path / "t"), target_file_rows=10)
    rows = [_ev("I", i, f"p{i:03d}", commit=f"sha{i:03d}") for i in range(1, 81)]
    _seed(spark, table, rows)
    meta = table.current_metadata()
    files = meta["files"]
    assert all(f.get("bloom", {}).get("commit") for f in files)
    assert len(files) > 8  # target_file_rows forced multiple files per bucket

    # the planning decision: strictly fewer files for a point value
    kept = table._bloom_prune(files, {"commit": "sha042"})
    assert 1 <= len(kept) < len(files)
    # no false negatives on any stored value
    for i in range(1, 81):
        assert any(
            bloom.might_contain(f["bloom"]["commit"], f"sha{i:03d}")
            for f in files
        )

    # end-to-end: col_eq equals the plain filter, for hits and misses
    got = table.snapshot(spark, col_eq={"commit": "sha042"}).collect()
    assert [(r.path, r.commit) for r in got] == [("p042", "sha042")]
    assert table.snapshot(spark, col_eq={"commit": "absent"}).count() == 0

    with pytest.raises(ValueError, match="non-NULL"):
        table.snapshot(spark, col_eq={"commit": None})


def test_dirty_groups_read_whole_under_mor(spark, tmp_path):
    """A MOR delta rewrites a key's commit: looking up the NEW value must
    find it even though the base file's bloom predates it, and looking up
    the OLD value must NOT surface the superseded row."""
    table = _table(str(tmp_path / "t"))
    _seed(spark, table, [_ev("I", 1, "a", commit="old"), _ev("I", 2, "b", commit="keep")])
    _seed(spark, table, [_ev("U", 5, "a", commit="new")], epoch=1, mode="mor")

    got = table.snapshot(spark, col_eq={"commit": "new"}).collect()
    assert [(r.path, r.seq) for r in got] == [("a", 5)]
    assert table.snapshot(spark, col_eq={"commit": "old"}).count() == 0
    # compaction folds the delta; the rewritten file's bloom carries "new"
    from forklift_spark.operators.merge import compact

    compact(spark, table)
    fresh = [f for f in table.current_metadata()["files"]]
    assert all(not f.get("delta") for f in fresh)
    got = table.snapshot(spark, col_eq={"commit": "new"}).collect()
    assert [(r.path, r.seq) for r in got] == [("a", 5)]


def test_bloom_composes_with_bucket_pruning(spark, tmp_path):
    table = _table(str(tmp_path / "t"), target_file_rows=10)
    rows = [_ev("I", i, f"p{i:03d}", commit=f"sha{i:03d}") for i in range(1, 41)]
    _seed(spark, table, rows)
    # locate p007's bucket via the engine's own expression
    b = (
        spark.createDataFrame([("r", "p007")], "repo string, path string")
        .select(table.bucket_expr().alias("b")).collect()[0].b
    )
    got = table.snapshot(
        spark, buckets=[int(b)], col_eq={"commit": "sha007"}
    ).collect()
    assert [(r.path,) for r in got] == [("p007",)]


def test_tables_without_bloom_cols_unaffected(spark, tmp_path):
    plain = LaketteTable.create(
        str(tmp_path / "p"), ENTITY_SCHEMA, KEY_COLS, n_buckets=2
    )
    _seed(spark, plain, [_ev("I", 1, "a")])
    assert all("bloom" not in f for f in plain.current_metadata()["files"])
    # col_eq still works — pure row filter, zero pruning
    assert plain.snapshot(spark, col_eq={"commit": "c1"}).count() == 1


def test_col_eq_in_set_prunes_and_is_exact(spark, tmp_path):
    """List values (IN-set semantics, derive_join's reverse-lookup shape):
    a file survives if ANY member might be present; rows filter to
    membership; empty lists and NULL members are loud."""
    table = _table(str(tmp_path / "t"), target_file_rows=10)
    rows = [_ev("I", i, f"p{i:03d}", commit=f"sha{i:03d}") for i in range(1, 81)]
    _seed(spark, table, rows)
    meta = table.current_metadata()
    files = meta["files"]

    # planning: an IN-set keeps the union of the members' files — strictly
    # fewer than all, at least as many as each single member alone
    want = ["sha007", "sha042", "sha077"]
    kept = table._bloom_prune(files, {"commit": want})
    assert 1 <= len(kept) < len(files)
    for v in want:
        single = table._bloom_prune(files, {"commit": v})
        assert {f["path"] for f in single} <= {f["path"] for f in kept}

    # end-to-end: equals the plain isin filter, misses included
    got = sorted(
        (r.path, r.commit)
        for r in table.snapshot(
            spark, col_eq={"commit": want + ["absent"]}
        ).collect()
    )
    assert got == [("p007", "sha007"), ("p042", "sha042"), ("p077", "sha077")]

    with pytest.raises(ValueError, match="empty"):
        table.snapshot(spark, col_eq={"commit": []})
    with pytest.raises(ValueError, match="non-NULL"):
        table.snapshot(spark, col_eq={"commit": ["sha007", None]})


def test_type_mismatched_col_eq_does_not_misprune(spark, tmp_path):
    """col_eq={"commit": 123} on a STRING bloom column: the row filter
    compares numerically under Spark coercion ('0123' = 123 is true),
    but the stored bloom hashed str('0123') — probing str(123) would
    "prove" absence and prune the matching file. Type-mismatched lookups
    must skip bloom pruning and stay exact via the row filter."""
    table = _table(str(tmp_path / "t"))
    _seed(spark, table, [
        _ev("I", i, f"p{i:02d}", commit=f"{100 + i:04d}") for i in range(1, 25)
    ])
    got = table.snapshot(spark, col_eq={"commit": 107}).collect()
    assert [(r.path, r.commit) for r in got] == [("p07", "0107")]
    # IN-set with any non-string member takes the same gate
    got = table.snapshot(spark, col_eq={"commit": [103, 105]}).collect()
    assert sorted(r.commit for r in got) == ["0103", "0105"]
    # string lookups keep pruning and agree
    got = table.snapshot(spark, col_eq={"commit": "0107"}).collect()
    assert [(r.path, r.commit) for r in got] == [("p07", "0107")]
