"""derive_agg() — incremental AGGREGATE derived tables (the silver -> gold
operator; the key-changing case derive() v1 loudly refuses). Binding
invariant: after derive_agg catches up, the gold table's live snapshot
equals the grouped aggregation applied to the FINAL source snapshot in one
shot (derived_agg_recompute), row-for-row — across group moves, predicate
flips, deletes, group death, spec drift, and the vacuum-broken-chain
resync. The delta strategy must additionally produce the IDENTICAL state
the groups strategy produces."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.lakette.table import LaketteTable
from forklift_spark.operators.derive_agg import (
    derive_agg,
    derived_agg_recompute,
)
from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import create_entity_table

GROUPS = {"repo": "repo", "lang": "lang"}
AGGS = {"n_docs": "count(content)", "total_chars": "sum(length(content))"}


def _ev(op, seq, repo, path, lang, content):
    return (op, seq, repo, path, f"c{seq}", lang, content, None, 1)


_DDL = (
    "op string, seq long, repo string, path string, commit string, "
    "lang string, content string, event_ts timestamp, schema_v int"
)


def _apply(spark, table, rows, epoch, query_id="src"):
    merge_into(
        spark, table, spark.createDataFrame(rows, _DDL),
        query_id=query_id, epoch=epoch,
    )


def _gold_state(spark, dst_root):
    df = LaketteTable(dst_root).snapshot(spark)
    cols = [c for c in df.columns if c not in ("seq", "content_sha", "deleted")]
    return sorted(tuple(r) for r in df.select(*sorted(cols)).collect())


def _recompute_state(spark, src, group_by, aggs, predicate=None, strategy="auto"):
    df = derived_agg_recompute(
        spark, src, group_by, aggs, predicate=predicate, strategy=strategy
    )
    return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())


@pytest.fixture()
def src(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    inserts = [
        _ev("I", i, f"r{i % 3}", f"f/{i}.txt", ["py", "js", "md"][i % 3],
            "x" * (10 + i))
        for i in range(30)
    ]
    _apply(spark, table, inserts, 0)
    return table


def test_initial_sync_matches_recompute_and_counts(spark, src, tmp_path):
    dst_root = str(tmp_path / "gold")
    r = derive_agg(spark, src, dst_root, GROUPS, AGGS, derive_id="g")
    assert r.initial_sync and r.strategy == "delta"
    snap = LaketteTable(dst_root).snapshot(spark)
    # 3 repos x 1 lang each (i%3 fixes both repo and lang) = 3 groups
    assert snap.count() == 3
    row = snap.filter("repo = 'r0' and lang = 'py'").collect()[0]
    assert row.n_docs == 10 and row.n_rows == 10
    assert row.total_chars == sum(10 + i for i in range(0, 30, 3))
    assert _gold_state(spark, dst_root) == _recompute_state(spark, src, GROUPS, AGGS)


def test_delta_incremental_updates_deletes_group_moves(spark, src, tmp_path):
    """One incremental span containing in-group updates, an update that
    MOVES a row between groups (lang change: retract old group, add new),
    and deletes — gold must equal the one-shot recompute, via exactly one
    applied epoch, with zero source-table scans (delta reads only the span
    and the touched gold buckets)."""
    dst_root = str(tmp_path / "gold")
    derive_agg(spark, src, dst_root, GROUPS, AGGS, derive_id="g")

    updates = [
        _ev("U", 100, "r0", "f/0.txt", "py", "y" * 50),       # in-group resize
        _ev("U", 101, "r1", "f/1.txt", "py", "moved"),        # js -> py group move
        _ev("U", 102, "r2", "f/2.txt", "md", "z" * 7),        # in-group resize
    ]
    _apply(spark, src, updates, 1)
    _apply(spark, src, [
        _ev("D", 200, "r0", "f/3.txt", None, None),
        _ev("D", 201, "r1", "f/4.txt", None, None),
    ], 2)

    r = derive_agg(spark, src, dst_root, GROUPS, AGGS, derive_id="g")
    assert not r.initial_sync and not r.resync and r.strategy == "delta"
    assert len([s for s in r.applied_epochs if not s.skipped]) == 1
    snap = LaketteTable(dst_root).snapshot(spark)
    # the group move created (r1, py) and shrank (r1, js)
    assert snap.filter("repo = 'r1' and lang = 'py'").collect()[0].n_rows == 1
    assert snap.filter("repo = 'r1' and lang = 'js'").collect()[0].n_rows == 8
    assert _gold_state(spark, dst_root) == _recompute_state(spark, src, GROUPS, AGGS)
    # idempotent catch-up: nothing new -> no epoch, state unchanged
    r2 = derive_agg(spark, src, dst_root, GROUPS, AGGS, derive_id="g")
    assert not r2.applied_epochs
    assert _gold_state(spark, dst_root) == _recompute_state(spark, src, GROUPS, AGGS)


def test_group_emptied_is_tombstoned(spark, src, tmp_path):
    """Deleting every contributing row of a group drives n_rows to 0 —
    the gold row must become a TOMBSTONE (gone from the live snapshot,
    visible with include_deleted), not a zero-valued live row."""
    dst_root = str(tmp_path / "gold")
    derive_agg(spark, src, dst_root, GROUPS, AGGS, derive_id="g")
    # group (r0, py) is keys 0,3,...,27
    _apply(spark, src, [
        _ev("D", 300 + i, "r0", f"f/{i}.txt", None, None) for i in range(0, 30, 3)
    ], 1)
    derive_agg(spark, src, dst_root, GROUPS, AGGS, derive_id="g")
    dst = LaketteTable(dst_root)
    assert dst.snapshot(spark).filter("repo = 'r0'").count() == 0
    dead = dst.snapshot(spark, include_deleted=True).filter("repo = 'r0'")
    assert dead.count() == 1 and dead.collect()[0].deleted is True
    assert _gold_state(spark, dst_root) == _recompute_state(spark, src, GROUPS, AGGS)
    # the group RESURRECTS from zero when rows return
    _apply(spark, src, [_ev("I", 400, "r0", "f/0.txt", "py", "back")], 2)
    derive_agg(spark, src, dst_root, GROUPS, AGGS, derive_id="g")
    row = dst.snapshot(spark).filter("repo = 'r0'").collect()[0]
    assert row.n_rows == 1 and row.total_chars == 4
    assert _gold_state(spark, dst_root) == _recompute_state(spark, src, GROUPS, AGGS)


def test_predicate_flips_retract_and_add(spark, src, tmp_path):
    """The predicate filters SOURCE rows on both retraction sides: a row
    updated OUT of the predicate set leaves its group's aggregates; a row
    updated INTO it joins."""
    dst_root = str(tmp_path / "gold")
    pred = "lang <> 'md'"
    derive_agg(spark, src, dst_root, GROUPS, AGGS, predicate=pred, derive_id="g")
    dst = LaketteTable(dst_root)
    assert dst.snapshot(spark).filter("lang = 'md'").count() == 0
    _apply(spark, src, [
        _ev("U", 500, "r0", "f/0.txt", "md", "left the set"),   # py -> md: retract
        _ev("U", 501, "r2", "f/2.txt", "js", "joined the set"), # md -> js: add
    ], 1)
    derive_agg(spark, src, dst_root, GROUPS, AGGS, predicate=pred, derive_id="g")
    snap = dst.snapshot(spark)
    assert snap.filter("repo = 'r0' and lang = 'py'").collect()[0].n_rows == 9
    assert snap.filter("repo = 'r2' and lang = 'js'").collect()[0].n_rows == 1
    assert snap.filter("lang = 'md'").count() == 0
    assert _gold_state(spark, dst_root) == _recompute_state(
        spark, src, GROUPS, AGGS, predicate=pred
    )


def test_groups_strategy_minmax_distinct_under_delete(spark, src, tmp_path):
    """min/max and count(distinct) are NOT self-maintainable (a retracted
    value may have been the extremum) — auto must resolve to the groups
    strategy, and deleting the max-holding row must recompute the true
    new max."""
    aggs = {
        "max_chars": "max(length(content))",
        "min_chars": "min(length(content))",
        "n_langs": "count(distinct lang)",
    }
    dst_root = str(tmp_path / "gold")
    r = derive_agg(spark, src, dst_root, {"repo": "repo"}, aggs, derive_id="g")
    assert r.strategy == "groups"
    dst = LaketteTable(dst_root)
    # r2 holds keys 2,5,...,29 with lengths 12..39 -> max 39 (key 29)
    assert dst.snapshot(spark).filter("repo = 'r2'").collect()[0].max_chars == 39
    _apply(spark, src, [_ev("D", 600, "r2", "f/29.txt", None, None)], 1)
    r2 = derive_agg(spark, src, dst_root, {"repo": "repo"}, aggs, derive_id="g")
    assert len(r2.applied_epochs) == 1 and not r2.resync
    assert dst.snapshot(spark).filter("repo = 'r2'").collect()[0].max_chars == 36
    assert _gold_state(spark, dst_root) == _recompute_state(
        spark, src, {"repo": "repo"}, aggs
    )


def test_delta_equals_groups_strategy(spark, src, tmp_path):
    """Both strategies maintain the SAME state for self-maintainable
    aggregates — run the identical spec through each into separate gold
    tables across an update/delete span and compare exactly."""
    roots = {}
    for st in ("delta", "groups"):
        roots[st] = str(tmp_path / f"gold_{st}")
        derive_agg(spark, src, roots[st], GROUPS, AGGS, strategy=st,
                   derive_id=f"g_{st}")
    _apply(spark, src, [
        _ev("U", 700, "r0", "f/0.txt", "js", "strategy parity"),
        _ev("D", 701, "r1", "f/1.txt", None, None),
        _ev("I", 702, "r9", "f/new.txt", "py", "fresh group"),
    ], 1)
    for st in ("delta", "groups"):
        r = derive_agg(spark, src, roots[st], GROUPS, AGGS, strategy=st,
                       derive_id=f"g_{st}")
        assert r.strategy == st
    assert _gold_state(spark, roots["delta"]) == _gold_state(spark, roots["groups"])


def test_null_sum_contract_stores_zero(spark, src, tmp_path):
    """A group whose every sum operand is NULL stores 0 (the documented
    COALESCE(SUM, 0) contract of the additive state) while count(e)=0 and
    n_rows counts the rows — identically in initial sync (recompute arm)
    and in an incremental delta epoch."""
    dst_root = str(tmp_path / "gold")
    _apply(spark, src, [
        _ev("I", 800, "rn", "f/n1.txt", "py", None),
        _ev("I", 801, "rn", "f/n2.txt", "py", None),
    ], 1)
    derive_agg(spark, src, dst_root, GROUPS, AGGS, derive_id="g")
    row = LaketteTable(dst_root).snapshot(spark).filter("repo = 'rn'").collect()[0]
    assert row.n_rows == 2 and row.n_docs == 0 and row.total_chars == 0
    # incrementally too: another NULL-content row arrives
    _apply(spark, src, [_ev("I", 802, "rn", "f/n3.txt", "py", None)], 2)
    derive_agg(spark, src, dst_root, GROUPS, AGGS, derive_id="g")
    row = LaketteTable(dst_root).snapshot(spark).filter("repo = 'rn'").collect()[0]
    assert row.n_rows == 3 and row.n_docs == 0 and row.total_chars == 0
    assert _gold_state(spark, dst_root) == _recompute_state(spark, src, GROUPS, AGGS)


def test_spec_drift_guard_and_resync(spark, src, tmp_path):
    dst_root = str(tmp_path / "gold")
    derive_agg(spark, src, dst_root, GROUPS, AGGS, derive_id="g")
    new_aggs = {"n_docs": "count(content)", "max_seq": "max(seq)"}
    with pytest.raises(ValueError, match="allow_spec_change"):
        derive_agg(spark, src, dst_root, GROUPS, new_aggs, derive_id="g")
    r = derive_agg(spark, src, dst_root, GROUPS, new_aggs, derive_id="g",
                   allow_spec_change=True)
    assert r.resync and r.strategy == "groups"
    assert _gold_state(spark, dst_root) == _recompute_state(
        spark, src, GROUPS, new_aggs
    )
    # incremental under the NEW spec keeps working from fresh offsets
    _apply(spark, src, [_ev("U", 900, "r0", "f/0.txt", "py", "post-drift")], 1)
    r2 = derive_agg(spark, src, dst_root, GROUPS, new_aggs, derive_id="g")
    assert len(r2.applied_epochs) == 1 and not r2.resync
    assert _gold_state(spark, dst_root) == _recompute_state(
        spark, src, GROUPS, new_aggs
    )


def test_vacuum_broken_chain_resyncs(spark, src, tmp_path):
    """Source vacuumed past the gold table's offset -> one repair epoch
    (recompute + state-diff + overwrite), including deleting groups that
    vanished while the chain was broken."""
    dst_root = str(tmp_path / "gold")
    derive_agg(spark, src, dst_root, GROUPS, AGGS, derive_id="g")
    for e in range(1, 4):
        _apply(spark, src, [
            _ev("U", 1000 * e + i, f"r{i % 3}", f"f/{i}.txt",
                ["py", "js"][(i + e) % 2], f"wave {e} body {i}")
            for i in range(0, 30, 5)
        ], e)
    src.vacuum(keep_versions=1, grace_seconds=0)
    r = derive_agg(spark, src, dst_root, GROUPS, AGGS, derive_id="g")
    assert r.resync
    assert _gold_state(spark, dst_root) == _recompute_state(spark, src, GROUPS, AGGS)


def test_validation_errors(spark, src, tmp_path):
    root = str(tmp_path / "gold")
    with pytest.raises(ValueError, match="auto-maintained"):
        derive_agg(spark, src, root, GROUPS, {"n_rows": "count(*)"})
    with pytest.raises(ValueError, match="shadows a source column"):
        derive_agg(spark, src, root, {"lang": "upper(lang)"}, AGGS)
    with pytest.raises(ValueError, match="not maintainable by addition"):
        derive_agg(spark, src, root, GROUPS, {"m": "max(seq)"}, strategy="delta")
    with pytest.raises(ValueError, match="at least one group"):
        derive_agg(spark, src, root, {}, AGGS)
    # count(distinct ...) silently downgrades auto -> groups, never delta
    r = derive_agg(spark, src, root, {"repo": "repo"},
                   {"nl": "count(distinct lang)"}, derive_id="g")
    assert r.strategy == "groups"


def test_computed_group_expression(spark, src, tmp_path):
    """Group keys may be computed SQL expressions (the rollup shape:
    bucketize a continuous column), maintained incrementally."""
    groups = {"size_band": "CASE WHEN length(content) < 20 THEN 'S' ELSE 'L' END"}
    aggs = {"n": "count(*)", "chars": "sum(length(content))"}
    dst_root = str(tmp_path / "gold")
    r = derive_agg(spark, src, dst_root, groups, aggs, derive_id="g")
    assert r.strategy == "delta"
    snap = {r_.size_band: r_ for r_ in LaketteTable(dst_root).snapshot(spark).collect()}
    assert snap["S"].n == 10 and snap["L"].n == 20  # lengths 10..39
    # an update moves a row across the band boundary (19 -> 25 chars)
    _apply(spark, src, [_ev("U", 1100, "r0", "f/9.txt", "py", "y" * 25)], 1)
    derive_agg(spark, src, dst_root, groups, aggs, derive_id="g")
    snap = {r_.size_band: r_ for r_ in LaketteTable(dst_root).snapshot(spark).collect()}
    assert snap["S"].n == 9 and snap["L"].n == 21
    assert _gold_state(spark, dst_root) == _recompute_state(spark, src, groups, aggs)


def test_chains_silver_to_gold(spark, src, tmp_path):
    """derive_agg composes with derive(): bronze -> silver (row transform)
    -> gold (aggregation over the SILVER table), each layer incremental
    and exactly-once, gold converging to agg . transform of the source."""
    from forklift_spark.operators.derive import derive

    silver_root = str(tmp_path / "silver")
    gold_root = str(tmp_path / "gold")
    mapping = {"lang": "lang", "n_chars": "length(content)"}
    groups = {"lang": "lang"}
    aggs = {"files": "count(*)", "chars": "sum(n_chars)"}

    def refresh():
        derive(spark, src, silver_root, mapping, predicate="lang <> 'md'",
               derive_id="s")
        derive_agg(spark, LaketteTable(silver_root), gold_root, groups, aggs,
                   derive_id="g")

    refresh()
    snap = {r.lang: r for r in LaketteTable(gold_root).snapshot(spark).collect()}
    assert set(snap) == {"py", "js"} and snap["py"].files == 10

    _apply(spark, src, [
        _ev("U", 1200, "r0", "f/0.txt", "js", "through two layers"),
        _ev("D", 1201, "r1", "f/1.txt", None, None),
    ], 1)
    refresh()
    snap = {r.lang: r for r in LaketteTable(gold_root).snapshot(spark).collect()}
    assert snap["py"].files == 9 and snap["js"].files == 10
    assert _gold_state(spark, gold_root) == _recompute_state(
        spark, LaketteTable(silver_root), groups, aggs
    )
