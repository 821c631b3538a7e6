"""Forced full resync (`force_resync=True` / SQL `REFRESH MATERIALIZED
VIEW x FULL`): the repair lever for OUT-OF-BAND destination drift at an
unchanged spec and source version. The binding invariants:

  * a plain incremental refresh at an unchanged source version is a no-op
    and therefore CANNOT repair drift (that is by design — it proves the
    forced path is doing something the cheap path does not);
  * the forced resync restores the destination to exactly
    derived-state-recompute (divergent payloads rewritten, injected extra
    keys deleted), sha/row-exact;
  * incremental maintenance continues cleanly AFTER a forced resync (the
    repair generation moves the marker namespace; later spans still apply
    exactly-once);
  * the A->B->A spec flip-flop lands correctly: returning to a
    previously-used spec at the same source version must re-derive, not
    get skipped by the first A-generation's epoch markers (regression —
    pre-repair-generation code reused the old per-spec qid, whose marker
    at that version silently swallowed the resync merge).
"""

import pytest

from forklift_spark.lakette.table import LaketteTable
from forklift_spark.operators.derive import derive, derived_state_recompute
from forklift_spark.operators.derive_agg import (
    derive_agg,
    derived_agg_recompute,
)
from forklift_spark.operators.merge import merge_into
from forklift_spark.sqlfront import SqlFrontend
from forklift_spark.streaming.ingest import create_entity_table

MAPPING = {"lang": "lang", "content": "upper(content)", "n_chars": "length(content)"}
PRED = "lang <> 'md'"
GROUPS = {"lang": "lang"}
AGGS = {"n_docs": "count(content)", "total_chars": "sum(length(content))"}

_DDL = (
    "op string, seq long, repo string, path string, commit string, "
    "lang string, content string, event_ts timestamp, schema_v int"
)


def _ev(op, seq, repo, path, lang, content):
    return (op, seq, repo, path, f"c{seq}", lang, content, None, 1)


def _apply(spark, table, rows, epoch, query_id="src"):
    merge_into(
        spark, table, spark.createDataFrame(rows, _DDL),
        query_id=query_id, epoch=epoch,
    )


def _state(spark, df):
    cols = [c for c in sorted(df.columns) if c not in ("seq", "content_sha", "deleted")]
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture()
def src(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    rows = [
        _ev("I", i, f"r{i % 3}", f"f/{i}.txt", ["py", "js", "md"][i % 3], f"body {i}")
        for i in range(30)
    ]
    _apply(spark, table, rows, 0)
    return table


def _tamper_derived(spark, dst: LaketteTable):
    """Out-of-band vandalism: mutate one row's payload and inject a key
    the transform never produces, straight through merge_into (exactly
    what a buggy side-writer would do)."""
    ddl = (
        "op string, seq long, repo string, path string, lang string, "
        "content string, n_chars int"
    )
    batch = spark.createDataFrame(
        [
            ("U", 999, "r1", "f/1.txt", "js", "VANDALIZED", -1),
            ("I", 999, "zz", "not/derived.txt", "xx", "INJECTED", -2),
        ],
        ddl,
    )
    merge_into(spark, dst, batch, query_id="vandal", epoch=0)


def test_force_resync_repairs_drift_then_incremental_continues(spark, src, tmp_path):
    dst_root = str(tmp_path / "dst")
    derive(spark, src, dst_root, MAPPING, predicate=PRED, derive_id="d")
    dst = LaketteTable(dst_root)

    _tamper_derived(spark, dst)
    drifted = _state(spark, dst.snapshot(spark))
    expected = _state(
        spark, derived_state_recompute(spark, src, MAPPING, predicate=PRED)
    )
    assert drifted != expected  # the vandalism is visible

    # plain incremental refresh at the unchanged source version: no-op —
    # it cannot see destination-side drift (and must not: that is the
    # O(changed) contract)
    r = derive(spark, src, dst_root, MAPPING, predicate=PRED, derive_id="d")
    assert not r.applied_epochs and not r.resync
    assert _state(spark, dst.snapshot(spark)) == drifted

    # forced full resync repairs: payload rewritten, injected key deleted
    r = derive(
        spark, src, dst_root, MAPPING, predicate=PRED, derive_id="d",
        force_resync=True,
    )
    assert r.resync and r.applied_epochs
    assert _state(spark, dst.snapshot(spark)) == expected

    # incremental maintenance still works after the repair generation bump
    _apply(spark, src, [_ev("U", 100, "r1", "f/1.txt", "js", "fresh body")], 1)
    r = derive(spark, src, dst_root, MAPPING, predicate=PRED, derive_id="d")
    assert not r.resync and not r.initial_sync and r.applied_epochs
    assert _state(spark, dst.snapshot(spark)) == _state(
        spark, derived_state_recompute(spark, src, MAPPING, predicate=PRED)
    )


def test_force_resync_twice_converges(spark, src, tmp_path):
    """A second FULL refresh at the same version finds nothing to repair
    (state-diff is empty) — forced resync is idempotent by construction."""
    dst_root = str(tmp_path / "dst")
    derive(spark, src, dst_root, MAPPING, predicate=PRED, derive_id="d")
    for _ in range(2):
        r = derive(
            spark, src, dst_root, MAPPING, predicate=PRED, derive_id="d",
            force_resync=True,
        )
        assert r.resync
    assert _state(spark, LaketteTable(dst_root).snapshot(spark)) == _state(
        spark, derived_state_recompute(spark, src, MAPPING, predicate=PRED)
    )


def test_spec_flip_flop_abab_rederives(spark, src, tmp_path):
    """A -> B -> A at the SAME source version: the second A must re-derive
    every row (regression: the first A-generation's epoch marker used to
    swallow the resync merge, leaving B-spec rows behind)."""
    dst_root = str(tmp_path / "dst")
    spec_a = {"lang": "lang", "content": "upper(content)"}
    spec_b = {"lang": "lang", "content": "lower(content)"}
    derive(spark, src, dst_root, spec_a, derive_id="d")
    derive(spark, src, dst_root, spec_b, derive_id="d", allow_spec_change=True)
    r = derive(spark, src, dst_root, spec_a, derive_id="d", allow_spec_change=True)
    assert r.resync
    got = _state(spark, LaketteTable(dst_root).snapshot(spark))
    assert got == _state(spark, derived_state_recompute(spark, src, spec_a))
    # concretely: contents are upper-case again, not lower-case leftovers
    assert all("VANDAL" not in t for t in map(str, got))
    assert any("BODY" in str(t) for t in got)


def test_force_resync_agg_repairs_gold(spark, src, tmp_path):
    dst_root = str(tmp_path / "gold")
    derive_agg(spark, src, dst_root, GROUPS, AGGS, derive_id="g")
    gold = LaketteTable(dst_root)

    batch = spark.createDataFrame(
        [("U", 999, "py", 1234, 5678), ("I", 999, "zz", 1, 1)],
        "op string, seq long, lang string, n_docs long, total_chars long",
    )
    # n_rows rides along as gold payload; match the stored schema
    batch = batch.withColumn("n_rows", batch.n_docs)
    merge_into(spark, gold, batch, query_id="vandal", epoch=0)

    expected = _state(spark, derived_agg_recompute(spark, src, GROUPS, AGGS))
    assert _state(spark, gold.snapshot(spark)) != expected

    r = derive_agg(
        spark, src, dst_root, GROUPS, AGGS, derive_id="g", force_resync=True
    )
    assert r.resync
    assert _state(spark, gold.snapshot(spark)) == expected


def test_sql_refresh_full(spark, src, tmp_path):
    fe = SqlFrontend(spark, {"repos": src})
    loc = tmp_path / "mv"
    fe.sql(
        f"CREATE MATERIALIZED VIEW mv LOCATION '{loc}' AS "
        "SELECT repo, path, upper(content) AS content, length(content) AS n_chars, "
        "lang FROM repos WHERE lang <> 'md'"
    )
    view = LaketteTable(str(loc))
    _tamper_derived(spark, view)
    drifted = _state(spark, view.snapshot(spark))

    rep = fe.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
    assert rep.epochs == "0"  # incremental: nothing changed upstream
    assert _state(spark, view.snapshot(spark)) == drifted  # drift survives

    rep = fe.sql("REFRESH MATERIALIZED VIEW mv FULL").collect()[0]
    assert rep.resync == "True"
    mapping = {
        "content": "upper(content)", "n_chars": "length(content)", "lang": "lang",
    }
    assert _state(spark, view.snapshot(spark)) == _state(
        spark, derived_state_recompute(spark, src, mapping, predicate=PRED)
    )
