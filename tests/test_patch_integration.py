"""column_lww (patch) tables composed with the wider engine: CDC-out,
online rescale + compaction rewrites, time travel, and the SQL view
surface. The per-column state (`col_seqs`) is an engine META column, so
every whole-row machinery path must carry it through unchanged — these
tests pin that."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.lakette.table import LaketteTable
from forklift_spark.operators.changes import changes_since, snapshot_diff
from forklift_spark.operators.merge import compact, merge_into
from forklift_spark.streaming.ingest import create_entity_table

from test_patch_lww import _DDL, _apply, _engine_state, _ev, _fold, _random_log


def test_cdc_out_over_patch_table(spark, tmp_path):
    """snapshot_diff over a column_lww table: the change feed carries the
    per-column MERGED rows (a patch shows as an 'update' whose payload is
    the resolved full row, not the partial event)."""
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4, column_lww=True)
    _apply(spark, table, [
        _ev("I", 10, "r0", "a", "c10", "py", "body a"),
        _ev("I", 10, "r0", "b", "c10", "py", "body b"),
    ], 0)
    v1 = table.current_metadata()["version"]
    _apply(spark, table, [
        _ev("P", 20, "r0", "a", lang="js"),   # update via patch
        _ev("D", 20, "r0", "b"),              # delete
        _ev("P", 20, "r0", "c", content="new"),  # insert via patch
    ], 1)
    cur, diff = changes_since(spark, table, v1, full_rows=True)
    rows = {(r.path): r for r in diff.collect()}
    assert rows["a"].change == "update"
    assert rows["a"].lang == "js" and rows["a"].content == "body a"  # MERGED
    assert rows["b"].change == "delete"
    assert rows["c"].change == "insert" and rows["c"].content == "new"
    assert cur == table.current_metadata()["version"]


def test_rescale_and_compact_preserve_col_seqs(spark, tmp_path):
    """Online re-bucketing (compact(n_buckets=)) rewrites whole rows —
    col_seqs must survive so patches applied AFTER the rescale still drop
    late columns correctly; final state equals the fold."""
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2, column_lww=True)
    events1 = _random_log(3, n_events=80, n_keys=20)
    _apply(spark, table, events1, 0)
    compact(spark, table, n_buckets=4)  # atomic re-bucket, whole rewrite
    assert table.n_buckets() == 4
    # cross-rescale late patch: key 'f/0.txt' exists with some col history;
    # send one late patch + fresh events, then converge vs the full fold
    events2 = _random_log(4, n_events=80, n_keys=20)
    events2 = [(op, seq + 1000, *rest) for (op, seq, *rest) in events2]
    late = [_ev("P", 0, "r0", "f/0.txt", content="pre-everything")]
    _apply(spark, table, events2 + late, 1)
    assert _engine_state(spark, table) == _fold(events1 + events2 + late)
    # col_seqs really is populated on the rewritten files
    m = table.snapshot(spark).select(F.col("col_seqs")["content"]).collect()
    assert any(r[0] is not None for r in m)


def test_time_travel_and_view_over_patch_table(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4, column_lww=True)
    _apply(spark, table, [_ev("I", 10, "r0", "a", "c10", "py", "v1")], 0)
    v1 = table.current_metadata()["version"]
    _apply(spark, table, [_ev("P", 20, "r0", "a", content="v2")], 1)
    # time travel reads the pre-patch row
    old = table.snapshot(spark, version=v1).select("content").collect()
    assert old[0][0] == "v1"
    table.create_or_replace_view(spark, "patch_view")
    got = spark.sql("SELECT content, lang FROM patch_view").collect()[0]
    assert got.content == "v2" and got.lang == "py"
    spark.catalog.dropTempView("patch_view")


def test_exactly_once_replay_on_patch_table(spark, tmp_path):
    """Marker-gated idempotence holds on the patch path (same C6 contract
    as row-level merges): re-delivering an epoch is a no-op."""
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4, column_lww=True)
    rows = [_ev("I", 1, "r0", "a", "c", "py", "x"),
            _ev("P", 2, "r0", "a", lang="js")]
    s1 = _apply(spark, table, rows, 0)
    v1 = table.current_metadata()["version"]
    s2 = _apply(spark, table, rows, 0)  # duplicate delivery
    assert not s1.skipped and s2.skipped
    assert table.current_metadata()["version"] == v1
    assert _engine_state(spark, table)[("r0", "a")]["lang"] == "js"
