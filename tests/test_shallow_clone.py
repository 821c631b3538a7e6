"""Shallow clone (LaketteTable.shallow_clone): zero-copy birth, full
independence after divergence, vacuum safety in BOTH directions (pin on
the source, structural scoping in the clone), compact-to-self-contained,
and schema-surface fidelity (colmap/retired travel)."""

import os

import pytest
from pyspark.sql import functions as F

from forklift_spark.lakette.table import CommitConflictError, LaketteTable
from forklift_spark.operators.merge import compact, merge_into
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table


def _ev(op, seq, path, content="body", lang="py"):
    return (op, seq, "r", path, f"c{seq}", lang, content, None, 1)


def _seed(spark, table, rows, epoch=0, mode="cow", renames=None):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    for a, b in (renames or {}).items():
        df = df.withColumnRenamed(a, b)
    return merge_into(spark, table, df, query_id="seed", epoch=epoch, mode=mode)


def test_zero_copy_birth_and_divergence(spark, tmp_path):
    src = create_entity_table(str(tmp_path / "src"), n_buckets=2)
    _seed(spark, src, [_ev("I", 1, "a"), _ev("I", 2, "b")])
    dst, pin = src.shallow_clone(str(tmp_path / "dst"))

    # zero copy: the clone's data dir is empty, its manifests point at src
    assert os.listdir(dst.data_dir) == []
    assert all(f["path"].startswith(src.root) for f in dst.plan_files())
    assert sorted(r.path for r in dst.snapshot(spark).collect()) == ["a", "b"]

    # divergence: writes to one never show in the other
    _seed(spark, src, [_ev("U", 3, "a", "src-v2")], epoch=1)
    _seed(spark, dst, [_ev("U", 4, "b", "dst-v2")], epoch=1)
    assert {r.path: r.content for r in src.snapshot(spark).collect()} == {
        "a": "src-v2", "b": "body"}
    assert {r.path: r.content for r in dst.snapshot(spark).collect()} == {
        "a": "body", "b": "dst-v2"}


def test_vacuum_safety_both_directions(spark, tmp_path):
    src = create_entity_table(str(tmp_path / "src"), n_buckets=2)
    _seed(spark, src, [_ev("I", 1, "a"), _ev("I", 2, "b")])
    dst, pin = src.shallow_clone(str(tmp_path / "dst"))
    _seed(spark, src, [_ev("U", 3, "a", "src-v2")], epoch=1)
    _seed(spark, src, [_ev("U", 4, "a", "src-v3")], epoch=2)

    # aggressive source vacuum: the pin tag protects the cloned version's
    # files even though it fell out of retention
    src.vacuum(keep_versions=1, grace_seconds=0.0)
    assert {r.path: r.content for r in dst.snapshot(spark).collect()} == {
        "a": "body", "b": "body"}

    # the clone's vacuum is scoped to its OWN data dir: source untouched
    _seed(spark, dst, [_ev("U", 9, "b", "dst-v2")], epoch=1)
    dst.vacuum(keep_versions=1, grace_seconds=0.0)
    assert {r.path: r.content for r in src.snapshot(spark).collect()} == {
        "a": "src-v3", "b": "body"}

    # compact makes the clone self-contained; dropping the pin then frees
    # the source to collect the old files without breaking the clone
    compact(spark, dst)
    assert all(f["path"].startswith("data/") for f in dst.plan_files())
    src.drop_ref(pin)
    src.vacuum(keep_versions=1, grace_seconds=0.0)
    assert {r.path: r.content for r in dst.snapshot(spark).collect()} == {
        "a": "body", "b": "dst-v2"}


def test_clone_at_version_and_mor_deltas(spark, tmp_path):
    src = create_entity_table(str(tmp_path / "src"), n_buckets=2)
    _seed(spark, src, [_ev("I", 1, "a")])
    v1 = src._raw_current()["version"]
    _seed(spark, src, [_ev("U", 2, "a", "v2")], epoch=1, mode="mor")

    # clone at the CURRENT version inherits the MOR delta and resolves it
    cur, _ = src.shallow_clone(str(tmp_path / "cur"))
    assert [r.content for r in cur.snapshot(spark).collect()] == ["v2"]
    # clone pinned at the PAST version sees the past state
    past, _ = src.shallow_clone(str(tmp_path / "past"), version=v1)
    assert [r.content for r in past.snapshot(spark).collect()] == ["body"]


def test_schema_surface_travels(spark, tmp_path):
    src = create_entity_table(str(tmp_path / "src"), n_buckets=2)
    _seed(spark, src, [_ev("I", 1, "a", lang="py")])
    src.rename_column("lang", "language")
    src.drop_column("commit")
    dst, _ = src.shallow_clone(str(tmp_path / "dst"))

    # colmap travels: the clone reads the renamed column from src files
    snap = dst.snapshot(spark)
    assert "language" in snap.columns and "commit" not in snap.columns
    assert [r.language for r in snap.collect()] == ["py"]
    # retired travels: re-adding 'commit' in the CLONE gets a fresh
    # physical id — the dropped values in src-owned files stay invisible
    _seed(spark, dst, [_ev("I", 2, "b")], epoch=1,
          renames={"lang": "language"})
    assert dst._raw_current()["colmap"]["commit"] == "commit__2"
    got = {r.path: r.commit for r in dst.snapshot(spark).collect()}
    assert got["a"] is None and got["b"] == "c2"


def test_check_constraints_travel_with_clone(spark, tmp_path):
    """A clone must keep enforcing the source's CHECK constraints — losing
    them silently would let the clone accept rows the source's contract
    forbids (shallow_clone `carry` includes "constraints")."""
    from forklift_spark.operators.expectations import ExpectationError

    src = create_entity_table(str(tmp_path / "src"), n_buckets=2)
    _seed(spark, src, [_ev("I", 1, "a", content="ok")])
    src.add_constraint(spark, "content_nonempty",
                       "content IS NOT NULL AND length(content) > 0")
    dst, _ = src.shallow_clone(str(tmp_path / "dst"))

    assert dst._raw_current().get("constraints", {}).keys() == \
        {"content_nonempty"}
    with pytest.raises(ExpectationError, match="content_nonempty"):
        _seed(spark, dst, [_ev("I", 2, "b", content="")], epoch=1)
    # the rule exists independently in the clone: droppable there alone
    dst.drop_constraint("content_nonempty")
    _seed(spark, dst, [_ev("I", 3, "b", content="")], epoch=2)
    assert "content_nonempty" in src._raw_current()["constraints"]


def test_guards(spark, tmp_path):
    src = create_entity_table(str(tmp_path / "src"), n_buckets=2)
    _seed(spark, src, [_ev("I", 1, "a")])
    dst, pin = src.shallow_clone(str(tmp_path / "dst"))
    # cloning onto an existing table fails loudly and rolls the pin back
    refs_before = {r["name"] for r in src.list_refs()}
    with pytest.raises(CommitConflictError, match="already exists"):
        src.shallow_clone(str(tmp_path / "dst"))
    assert {r["name"] for r in src.list_refs()} == refs_before
    # mid-rescale clone rejected
    src.rescale(4)
    with pytest.raises(ValueError, match="mid-rescale"):
        src.shallow_clone(str(tmp_path / "dst2"))
    # pin=False: no ref created (the caller accepts the Delta caveat)
    src2 = create_entity_table(str(tmp_path / "src2"), n_buckets=2)
    _seed(spark, src2, [_ev("I", 1, "a")])
    d2, p2 = src2.shallow_clone(str(tmp_path / "d2"), pin=False)
    assert p2 is None and src2.list_refs() == []
