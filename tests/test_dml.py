"""Predicate DML (operators/dml.py): delete_where tombstone semantics +
LWW confluence, update_where old-row SET semantics + sha invariant,
O(touched buckets) rewrite scoping, MOR delta fold-in, and the guards."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.operators.dml import delete_where, update_where
from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table


def _ev(op, seq, path, lang="py", content="body"):
    return (op, seq, "r", path, f"c{seq}", lang, content, None, 1)


def _seed(spark, table, rows, *, epoch=0, mode="cow"):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    return merge_into(spark, table, df, query_id="seed", epoch=epoch, mode=mode)


def _state(spark, table):
    return {
        r.path: (r.lang, r.content, r.seq)
        for r in table.snapshot(spark).select("path", "lang", "content", "seq").collect()
    }


def test_delete_where_tombstones_and_confluence(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    _seed(spark, table, [
        _ev("I", 1, "a", lang="de"), _ev("I", 2, "b", lang="py"),
        _ev("I", 3, "c", lang="de"), _ev("I", 4, "d", lang="go"),
    ])
    v0 = table.current_metadata()["version"]

    stats = delete_where(spark, table, "lang = 'de'")
    assert stats["rows_matched"] == 2
    assert stats["version"] == v0 + 1
    assert set(_state(spark, table)) == {"b", "d"}

    # confluence: duplicate delivery of a deleted row's ORIGINAL event
    # (same seq) must NOT resurrect — the tombstone kept the seq
    _seed(spark, table, [_ev("I", 1, "a", lang="de")], epoch=1)
    assert set(_state(spark, table)) == {"b", "d"}

    # ...but a genuinely NEWER event still wins over the DML tombstone:
    # seq-ordered LWW stays the single arbitration rule
    _seed(spark, table, [_ev("U", 9, "c", lang="de", content="new body")], epoch=2)
    assert _state(spark, table)["c"] == ("de", "new body", 9)


def test_update_where_old_row_semantics_and_sha(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    _seed(spark, table, [
        _ev("I", 1, "a", lang="py", content="alpha"),
        _ev("I", 2, "b", lang="go", content="beta"),
    ])
    # swap two columns in one SET: both assignments must read the OLD row
    stats = update_where(
        spark, table, {"commit": "content", "content": "commit"}, "lang = 'py'"
    )
    assert stats["rows_matched"] == 1
    row = {r.path: r for r in table.snapshot(spark).collect()}
    assert row["a"].content == "c1" and row["a"].commit == "alpha"
    # sha invariant recomputed for the new content; untouched row intact
    sha = table.snapshot(spark).filter(F.col("path") == "a").select(
        F.sha2("content", 256).alias("s"), "content_sha").collect()[0]
    assert sha.s == sha.content_sha
    assert row["b"].content == "beta" and row["b"].seq == 2
    assert row["a"].seq == 1  # DML preserves seq (LWW contract)


def test_rewrite_is_scoped_to_touched_buckets(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=8)
    _seed(spark, table, [_ev("I", i, f"p{i}") for i in range(1, 41)])
    before = {f["path"]: f["bucket"] for f in table.current_metadata()["files"]}

    stats = delete_where(spark, table, "path = 'p7'")
    assert stats["rows_matched"] == 1
    assert stats["touched_buckets"] == 1
    after = table.current_metadata()["files"]
    touched_bucket = next(
        b for p, b in before.items() if p not in {f["path"] for f in after}
    )
    # every untouched bucket's files are byte-identical (same paths)
    for f in after:
        if f["bucket"] != touched_bucket:
            assert f["path"] in before


def test_no_match_is_a_no_op(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    _seed(spark, table, [_ev("I", 1, "a")])
    v0 = table.current_metadata()["version"]
    stats = delete_where(spark, table, "lang = 'nope'")
    assert stats == {
        "version": v0, "touched_buckets": 0, "rows_scanned": 0, "rows_matched": 0,
    }
    assert table.current_metadata()["version"] == v0


def test_dml_folds_mor_deltas(spark, tmp_path):
    """DML over a table with pending merge-on-read deltas: the rewrite
    reads the RESOLVED state (the delta's update is what the predicate
    sees) and the touched bucket comes out clean base files."""
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a", lang="py"), _ev("I", 2, "b", lang="py")])
    _seed(spark, table, [_ev("U", 5, "a", lang="de", content="v2")],
          epoch=1, mode="mor")
    stats = delete_where(spark, table, "lang = 'de'")  # matches the DELTA value
    assert stats["rows_matched"] == 1
    assert set(_state(spark, table)) == {"b"}
    # the touched bucket's files are all base now (delta folded)
    for f in table.current_metadata()["files"]:
        assert not f.get("delta")


def test_guards(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a")])
    with pytest.raises(ValueError, match="key/engine"):
        update_where(spark, table, {"repo": "'x'"}, "true")
    with pytest.raises(ValueError, match="key/engine"):
        update_where(spark, table, {"seq": "99"}, "true")
    with pytest.raises(ValueError, match="unknown"):
        update_where(spark, table, {"nope": "'x'"}, "true")

    patch = create_entity_table(str(tmp_path / "p"), n_buckets=2, column_lww=True)
    with pytest.raises(ValueError, match="column_lww"):
        delete_where(spark, patch, "lang = 'py'")
