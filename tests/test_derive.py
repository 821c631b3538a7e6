"""derive() — incremental derived tables over the changefeed (VERDICT r4
next-round #1: the bronze -> silver operator). The binding invariant:
after derive() catches up, the derived table's snapshot equals the
transform applied to the FINAL source snapshot in one shot
(derived_state_recompute), sha-exact — across filter flips, deletes,
crash-resume, and the vacuum-broken-chain resync."""

import os

import pytest
from pyspark.sql import functions as F

from forklift_spark.lakette.table import LaketteTable
from forklift_spark.operators.derive import (
    derive,
    derived_state_recompute,
)
from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import create_entity_table

MAPPING = {
    "lang": "lang",
    "content": "upper(content)",
    "n_chars": "length(content)",
}
PRED = "lang <> 'md'"


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


def _state(spark, table_or_df):
    df = (
        table_or_df.snapshot(spark)
        if isinstance(table_or_df, LaketteTable)
        else table_or_df
    )
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture()
def src(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    inserts = [
        _ev("I", i, f"r{i % 3}", f"f/{i}.txt", ["py", "js", "md"][i % 3], f"body {i}")
        for i in range(30)
    ]
    _apply(spark, table, inserts, 0)
    return table


def test_derive_initial_sync_applies_transform_and_filter(spark, src, tmp_path):
    dst_root = str(tmp_path / "dst")
    r = derive(spark, src, dst_root, MAPPING, predicate=PRED, derive_id="d")
    assert r.initial_sync and not r.resync
    dst = LaketteTable(dst_root)
    got = dst.snapshot(spark)
    assert got.filter("lang = 'md'").count() == 0  # filtered out
    assert got.count() == 20  # 30 keys, 10 are md
    row = got.filter("path = 'f/4.txt'").collect()[0]
    assert row.content == "BODY 4" and row.n_chars == 6
    # content_sha is the sha of the MAPPED content (the per-row invariant)
    sha = got.select(
        (F.sha2("content", 256) == F.col("content_sha")).alias("ok")
    ).agg(F.min("ok")).collect()[0][0]
    assert sha is True
    assert _state(spark, dst) == _state(
        spark, derived_state_recompute(spark, src, MAPPING, predicate=PRED)
    )


def test_derive_incremental_with_filter_flips_converges(spark, src, tmp_path):
    """Updates that make rows LEAVE the filter (py -> md) must delete them
    from the derived table; rows ENTERING (md -> py) must appear; deletes
    propagate. Final state == one-shot recompute, and the catch-up call
    applies exactly one span epoch."""
    dst_root = str(tmp_path / "dst")
    derive(spark, src, dst_root, MAPPING, predicate=PRED, derive_id="d")

    updates = [
        _ev("U", 100 + i, f"r{i % 3}", f"f/{i}.txt", "md", f"left {i}")
        for i in range(0, 6, 3)  # py keys 0,3 -> md (leave the filter)
    ] + [
        _ev("U", 200 + i, f"r{i % 3}", f"f/{i}.txt", "py", f"joined {i}")
        for i in range(2, 8, 3)  # md keys 2,5 -> py (enter the filter)
    ] + [
        _ev("U", 300 + i, f"r{i % 3}", f"f/{i}.txt", "js", f"body {i} v2")
        for i in range(1, 7, 3)  # js keys 1,4: ordinary in-filter update
    ]
    _apply(spark, src, updates, 1)
    deletes = [_ev("D", 400 + i, f"r{i % 3}", f"f/{i}.txt", None, None)
               for i in (1, 2, 9)]  # delete one joined, one updated, one untouched
    _apply(spark, src, deletes, 2)

    r = derive(spark, src, dst_root, MAPPING, predicate=PRED, derive_id="d")
    assert not r.initial_sync and not r.resync
    assert len([s for s in r.applied_epochs if not s.skipped]) == 1  # one span
    dst = LaketteTable(dst_root)
    snap = dst.snapshot(spark)
    assert snap.filter("path = 'f/0.txt'").count() == 0  # left the filter
    assert snap.filter("path = 'f/5.txt'").collect()[0].content == "JOINED 5"
    assert snap.filter("path = 'f/2.txt'").count() == 0  # joined then deleted
    assert _state(spark, dst) == _state(
        spark, derived_state_recompute(spark, src, MAPPING, predicate=PRED)
    )
    # idempotent catch-up: nothing new -> no epoch applied, state unchanged
    r2 = derive(spark, src, dst_root, MAPPING, predicate=PRED, derive_id="d")
    assert not r2.applied_epochs
    assert _state(spark, dst) == _state(
        spark, derived_state_recompute(spark, src, MAPPING, predicate=PRED)
    )


def test_derive_crash_between_spans_resumes_exactly_once(spark, src, tmp_path, monkeypatch):
    """every_version=True applies one destination epoch per source version.
    A crash after the first span (simulated: snapshot_diff raises on the
    second call) leaves its marker behind; the re-run must SKIP the landed
    span (no double apply) and land the rest, converging sha-exact."""
    dst_root = str(tmp_path / "dst")
    derive(spark, src, dst_root, MAPPING, predicate=PRED, derive_id="d")

    _apply(spark, src, [_ev("U", 500, "r0", "f/0.txt", "py", "wave one")], 1)
    _apply(spark, src, [_ev("U", 501, "r1", "f/1.txt", "js", "wave two")], 2)
    _apply(spark, src, [_ev("D", 502, "r1", "f/4.txt", None, None)], 3)

    import forklift_spark.operators.derive as dv

    real = dv.snapshot_diff
    calls = {"n": 0}

    def crashy(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash between spans")
        return real(*a, **kw)

    monkeypatch.setattr(dv, "snapshot_diff", crashy)
    with pytest.raises(RuntimeError, match="simulated crash"):
        derive(spark, src, dst_root, MAPPING, predicate=PRED,
               derive_id="d", every_version=True)
    monkeypatch.setattr(dv, "snapshot_diff", real)

    dst = LaketteTable(dst_root)
    v_after_crash = dst.current_metadata()["version"]
    r = derive(spark, src, dst_root, MAPPING, predicate=PRED,
               derive_id="d", every_version=True)
    # the crashed run landed exactly one span; the resume lands the other
    # two and never re-applies the first (its marker gates it)
    assert len([s for s in r.applied_epochs if not s.skipped]) == 2
    assert dst.current_metadata()["version"] == v_after_crash + 2
    assert _state(spark, dst) == _state(
        spark, derived_state_recompute(spark, src, MAPPING, predicate=PRED)
    )


def test_derive_key_changing_spec_raises(spark, src, tmp_path):
    with pytest.raises(ValueError, match="KEY-PRESERVING"):
        derive(spark, src, str(tmp_path / "dst"),
               {"repo": "upper(repo)", "content": "content"})
    with pytest.raises(ValueError, match="engine columns"):
        derive(spark, src, str(tmp_path / "dst"),
               {"seq": "seq + 1", "content": "content"})


def test_derive_resync_after_source_vacuum(spark, src, tmp_path):
    """Source vacuumed past the derived table's offset -> one repair epoch:
    recompute expected = transform(source snapshot), state-diff vs the
    destination (extra keys deleted, divergent rows forced), overwrite
    semantics. An out-of-band rogue write to the destination is repaired
    too."""
    dst_root = str(tmp_path / "dst")
    derive(spark, src, dst_root, MAPPING, predicate=PRED, derive_id="d")
    dst = LaketteTable(dst_root)

    # rogue out-of-band write at a seq LWW could never beat
    rogue = spark.createDataFrame(
        [("I", 999_999_999, "rogue", "x.txt", "py", "oops", 3)],
        "op string, seq long, repo string, path string, lang string, "
        "content string, n_chars int",
    )
    merge_into(spark, dst, rogue, query_id="rogue", epoch=0)

    for e in range(1, 4):
        _apply(spark, src, [
            _ev("U", 1000 * e + i, f"r{i % 3}", f"f/{i}.txt",
                ["py", "js", "md"][(i + e) % 3], f"wave {e} body {i}")
            for i in range(0, 30, 5)
        ], e)
    src.vacuum(keep_versions=1, grace_seconds=0)

    r = derive(spark, src, dst_root, MAPPING, predicate=PRED, derive_id="d")
    assert r.resync
    assert dst.snapshot(spark).filter("repo = 'rogue'").count() == 0
    assert _state(spark, dst) == _state(
        spark, derived_state_recompute(spark, src, MAPPING, predicate=PRED)
    )


def test_derive_pure_projection_without_predicate(spark, src, tmp_path):
    """No predicate: the derived table is a straight projected mirror —
    every live source key present, payload mapped."""
    dst_root = str(tmp_path / "dst")
    derive(spark, src, dst_root, {"lang": "lang", "n_chars": "length(content)"},
           derive_id="d")
    dst = LaketteTable(dst_root)
    assert dst.snapshot(spark).count() == 30
    assert "content" not in dst.snapshot(spark).columns
    _apply(spark, src, [_ev("D", 600, "r0", "f/0.txt", None, None)], 1)
    derive(spark, src, dst_root, {"lang": "lang", "n_chars": "length(content)"},
           derive_id="d")
    assert dst.snapshot(spark).count() == 29


def test_derive_chains_bronze_silver_gold(spark, src, tmp_path):
    """A derived table is an ordinary lakette table, so derive composes:
    bronze -> silver (filter + map) -> gold (further map over silver's
    output schema), each layer incrementally exactly-once under its own
    derive_id, and gold converges to gold_spec . silver_spec of the source."""
    silver_root = str(tmp_path / "silver")
    gold_root = str(tmp_path / "gold")
    gold_map = {"n_chars": "n_chars", "shout": "content || '!'"}

    def refresh():
        derive(spark, src, silver_root, MAPPING, predicate=PRED, derive_id="s")
        derive(spark, LaketteTable(silver_root), gold_root, gold_map,
               derive_id="g")

    refresh()
    gold = LaketteTable(gold_root)
    row = gold.snapshot(spark).filter("path = 'f/4.txt'").collect()[0]
    assert row.shout == "BODY 4!" and row.n_chars == 6

    # a source change flows through BOTH layers incrementally
    _apply(spark, src, [_ev("U", 900, "r0", "f/3.txt", "py", "chained")], 1)
    _apply(spark, src, [_ev("D", 901, "r1", "f/4.txt", None, None)], 2)
    refresh()
    snap = {r.path: r for r in gold.snapshot(spark).collect()}
    assert snap["f/3.txt"].shout == "CHAINED!"
    assert "f/4.txt" not in snap  # delete propagated through two layers
    # gold == gold_spec applied to the (recomputed) silver state
    expected = _state(
        spark,
        derived_state_recompute(spark, LaketteTable(silver_root), gold_map),
    )
    assert _state(spark, gold) == expected


def test_derive_spec_change_guard_and_respec(spark, src, tmp_path):
    """Calling derive with a DIFFERENT spec against an existing destination
    must raise (silent old-spec/new-spec row mixing); with
    allow_spec_change=True it re-derives EVERY row via a resync epoch under
    the new spec (per-spec offsets: the old spec's markers cannot skip it),
    and incremental derivation continues under the new spec."""
    dst_root = str(tmp_path / "dst")
    derive(spark, src, dst_root, MAPPING, predicate=PRED, derive_id="d")

    new_map = {"lang": "lang", "content": "lower(content)",
               "n_chars": "length(content)"}
    with pytest.raises(ValueError, match="allow_spec_change"):
        derive(spark, src, dst_root, new_map, predicate=PRED, derive_id="d")

    r = derive(spark, src, dst_root, new_map, predicate=PRED, derive_id="d",
               allow_spec_change=True)
    assert r.resync
    dst = LaketteTable(dst_root)
    assert dst.snapshot(spark).filter("path = 'f/4.txt'").collect()[0].content \
        == "body 4"
    assert _state(spark, dst) == _state(
        spark, derived_state_recompute(spark, src, new_map, predicate=PRED)
    )

    # incremental under the NEW spec still works (fresh per-spec offsets)
    _apply(spark, src, [_ev("U", 950, "r0", "f/6.txt", "py", "RESPEC FLOW")], 1)
    r2 = derive(spark, src, dst_root, new_map, predicate=PRED, derive_id="d")
    assert not r2.resync and len(r2.applied_epochs) == 1
    assert dst.snapshot(spark).filter("path = 'f/6.txt'").collect()[0].content \
        == "respec flow"
    # and the accepted spec is now the stored one: same call is a no-op
    r3 = derive(spark, src, dst_root, new_map, predicate=PRED, derive_id="d")
    assert not r3.applied_epochs
