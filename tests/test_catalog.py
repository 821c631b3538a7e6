"""Catalog (lakette/catalog.py): named tables + cross-table snapshot
isolation. The claims under test: (1) catalog readers step between
CONSISTENT multi-table sets — a publish that is torn at the table layer
is invisible at the catalog layer; (2) cataloged versions are pinned
against vacuum via mirrored branch refs; (3) the catalog CAS rebases
racers and rolls orphaned commits forward; (4) recover() finishes dead
transactions AND advances the map."""

import json
import os

import pytest

from forklift_spark.lakette.catalog import Catalog
from forklift_spark.lakette.table import CommitConflictError, LaketteTable
from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import create_entity_table

_DDL = (
    "op string, seq long, repo string, path string, commit string, "
    "lang string, content string, event_ts timestamp, schema_v int"
)


def _ev(op, seq, path, content="body"):
    return (op, seq, "r", path, f"c{seq}", "py", content, None, 1)


def _merge(spark, table, rows, epoch, qid="q", **kw):
    return merge_into(
        spark, table, spark.createDataFrame(rows, _DDL),
        query_id=qid, epoch=epoch, **kw,
    )


def _cat_two_tables(spark, tmp_path):
    cat = Catalog.create(str(tmp_path / "cat"))
    a = create_entity_table(str(tmp_path / "a"), n_buckets=2)
    b = create_entity_table(str(tmp_path / "b"), n_buckets=2)
    _merge(spark, a, [_ev("I", 1, "x", "a0")], 0, qid="seed")
    _merge(spark, b, [_ev("I", 1, "y", "b0")], 0, qid="seed")
    cat.register("ta", a.root)
    cat.register("tb", b.root)
    return cat, a, b


def test_namespace_lifecycle(spark, tmp_path):
    cat, a, b = _cat_two_tables(spark, tmp_path)
    assert cat.names() == ["ta", "tb"]
    assert cat.table("ta").root == a.root
    # guards: taken name, taken root, invalid name, nonexistent table
    with pytest.raises(ValueError, match="already registered"):
        cat.register("ta", str(tmp_path / "b"))
    with pytest.raises(ValueError, match="already registered as 'tb'"):
        cat.register("tb2", b.root)
    with pytest.raises(ValueError, match="invalid table name"):
        cat.register("no-dash", a.root)
    with pytest.raises(ValueError, match="no lakette table"):
        cat.register("ghost", str(tmp_path / "nope"))
    with pytest.raises(KeyError):
        cat.table("ghost")
    # drop: unregisters and releases the pin ref; table dir untouched
    ref = cat._ref_name()
    assert any(r["name"] == ref for r in a.list_refs())
    cat.drop("ta")
    assert cat.names() == ["tb"]
    assert not any(r["name"] == ref for r in a.list_refs())
    assert LaketteTable.exists(a.root)
    # create_table: creates + registers in one call
    t = cat.create_table(
        "tc", str(tmp_path / "c"),
        spark.createDataFrame([("k", 1)], "path string, n int").schema,
        ["path"], n_buckets=2,
    )
    assert cat.names() == ["tb", "tc"] and LaketteTable.exists(t.root)


def test_catalog_reader_never_sees_torn_set(spark, tmp_path):
    """The headline claim. A post-flip member conflict leaves the TABLES
    torn (A published, B staged — txn.py documents this honestly); the
    CATALOG does not advance, so catalog readers still get the old
    consistent set, and recover() moves them to the new one atomically."""
    cat, a, b = _cat_two_tables(spark, tmp_path)
    sa = _merge(spark, a, [_ev("U", 2, "x", "vA")], 1, publish=False).stage_id
    sb = _merge(spark, b, [_ev("U", 2, "y", "vB")], 1, publish=False).stage_id

    real = LaketteTable.publish_staged
    state = {"raced": False}

    def raced(self, stage_id):
        if self.root == b.root and not state["raced"]:
            state["raced"] = True
            _merge(spark, b, [_ev("U", 9, "y", "mid")], 7, qid="other")
        return real(self, stage_id)

    LaketteTable.publish_staged = raced
    try:
        with pytest.raises(CommitConflictError, match="recover_transactions"):
            cat.publish([("ta", sa), ("tb", sb)])
    finally:
        LaketteTable.publish_staged = real

    # table layer: torn (vA visible directly, vB not)
    assert a.snapshot(spark).filter("content = 'vA'").count() == 1
    assert b.snapshot(spark).filter("content = 'vB'").count() == 0
    # catalog layer: the OLD consistent set — neither vA nor mid
    assert cat.snapshot(spark, "ta").filter("content = 'vA'").count() == 0
    assert cat.snapshot(spark, "tb").filter("content = 'mid'").count() == 0
    views = cat.sql_views(spark, prefix="c_")
    assert set(views) == {"ta", "tb"}
    row = spark.sql(
        "SELECT (SELECT max(content) FROM c_ta) AS ca, "
        "(SELECT max(content) FROM c_tb) AS cb"
    ).collect()[0]
    assert (row.ca, row.cb) == ("a0", "b0")

    # resolve b's conflict (re-stage against the moved base) and recover:
    # ONE catalog commit moves readers to the complete new set
    rec = json.loads(open(
        os.path.join(cat.txn_dir, f"{_txn_id(cat)}.json")
    ).read())
    b.abort_staged(sb)
    sb2 = _merge(spark, b, [_ev("U", 10, "y", "vB")], 2, publish=False).stage_id
    rec["members"][1]["stage_id"] = sb2
    rec["members"][1]["writer"] = b.staged_record(sb2)["writer"]
    json.dump(rec, open(
        os.path.join(cat.txn_dir, f"{rec['txn_id']}.json"), "w"
    ))
    acted = cat.recover(grace_seconds=0)
    assert acted and acted[0]["state"] == "done"
    assert cat.snapshot(spark, "ta").filter("content = 'vA'").count() == 1
    assert cat.snapshot(spark, "tb").filter("content = 'vB'").count() == 1


def _txn_id(cat):
    live = [f for f in os.listdir(cat.txn_dir)
            if f.endswith(".json") and not f.endswith((".done.json", ".aborted.json"))]
    assert len(live) == 1
    return live[0].removesuffix(".json")


def test_publish_happy_path_one_commit(spark, tmp_path):
    cat, a, b = _cat_two_tables(spark, tmp_path)
    v0 = cat.version
    sa = _merge(spark, a, [_ev("U", 2, "x", "vA")], 1, publish=False).stage_id
    sb = _merge(spark, b, [_ev("U", 2, "y", "vB")], 1, publish=False).stage_id
    rec = cat.publish([("ta", sa), ("tb", sb)])
    assert rec["state"] == "done"
    # exactly ONE catalog commit for the pair, op tagged
    assert cat.version == v0 + 1
    assert cat._raw_current()["op"] == "publish"
    cat.sql_views(spark)
    both = spark.sql(
        "SELECT (SELECT max(content) FROM ta) AS ca, "
        "(SELECT max(content) FROM tb) AS cb"
    ).collect()[0]
    assert (both.ca, both.cb) == ("vA", "vB")
    # time travel to the pre-publish set still answers consistently
    old = cat.read_set(version=v0)
    assert all(int(e["version"]) >= 1 for e in old.values())
    assert cat.snapshot(spark, "ta", catalog_version=v0) \
        .filter("content = 'vA'").count() == 0


def test_vacuum_pinning_and_release(spark, tmp_path):
    cat, a, b = _cat_two_tables(spark, tmp_path)
    pinned = cat.read_set()["ta"]["version"]
    # table advances twice past the cataloged version, then vacuums hard
    _merge(spark, a, [_ev("U", 2, "x", "n1")], 1)
    _merge(spark, a, [_ev("U", 3, "x", "n2")], 2)
    a.vacuum(keep_versions=1, grace_seconds=0.0)
    # the cataloged version survives (ref pin) and still reads
    assert cat.snapshot(spark, "ta").filter("content = 'a0'").count() == 1
    assert cat.read_set()["ta"]["version"] == pinned
    # advance the catalog; the pin moves; vacuum now collects the old one
    cat.advance("ta")
    a.vacuum(keep_versions=1, grace_seconds=0.0)
    with pytest.raises(ValueError):
        a.metadata_at(pinned)
    assert cat.snapshot(spark, "ta").filter("content = 'n2'").count() == 1


def test_refresh_one_commit_and_strictly_forward(spark, tmp_path):
    cat, a, b = _cat_two_tables(spark, tmp_path)
    _merge(spark, a, [_ev("U", 2, "x", "n1")], 1)
    _merge(spark, b, [_ev("U", 2, "y", "m1")], 1)
    v0 = cat.version
    cat.refresh()
    assert cat.version == v0 + 1  # both entries moved in ONE commit
    rs = cat.read_set()
    assert rs["ta"]["version"] == a._raw_current()["version"]
    assert rs["tb"]["version"] == b._raw_current()["version"]
    # refresh with nothing to do is a no-op commit-wise
    cat.refresh()
    assert cat.version == v0 + 1
    # advance never rewinds
    head = rs["ta"]["version"]
    cat.advance("ta", head)  # idempotent no-op
    assert cat.version == v0 + 1 and cat.read_set()["ta"]["version"] == head


def test_cas_rebase_and_orphan_rollforward(spark, tmp_path):
    cat, a, b = _cat_two_tables(spark, tmp_path)
    # orphan: a writer committed v{K+1} but died before the CURRENT swap
    raw = cat._raw_current()
    orphan_v = raw["version"] + 1
    orphan = {**raw, "version": orphan_v, "parent": raw["version"],
              "op": "advance:ta(orphaned)"}
    cat.fs.put_json_exclusive(cat._vpath(orphan_v), orphan)
    assert cat.version == raw["version"]  # CURRENT untouched
    # the next commit adopts the orphan and lands on top of it
    _merge(spark, a, [_ev("U", 2, "x", "n1")], 1)
    cat.advance("ta")
    assert cat.version == orphan_v + 1
    assert cat.metadata_at(orphan_v)["op"] == "advance:ta(orphaned)"

    # rebase: a competing commit lands between our read and our CAS
    state = {"hit": False}
    real = cat._raw_current

    def with_racer():
        raw = real()
        if not state["hit"]:
            state["hit"] = True
            Catalog(cat.root).drop("tb")  # separate handle wins the race
        return raw

    cat._raw_current = with_racer
    try:
        _merge(spark, a, [_ev("U", 3, "x", "n2")], 2)
        cat.advance("ta")
    finally:
        cat._raw_current = real
    # both effects present: the racer's drop AND our advance
    assert cat.names() == ["ta"]
    assert cat.read_set()["ta"]["version"] == a._raw_current()["version"]


def test_recover_rolls_forward_and_advances_map(spark, tmp_path):
    """Publisher crashed right after the record flip (committed, nothing
    published). recover() publishes the members AND advances the catalog
    to the completed set."""
    cat, a, b = _cat_two_tables(spark, tmp_path)
    sa = _merge(spark, a, [_ev("U", 2, "x", "vA")], 1, publish=False).stage_id
    sb = _merge(spark, b, [_ev("U", 2, "y", "vB")], 1, publish=False).stage_id
    import time
    rec = {
        "txn_id": "tdead", "state": "committed", "created_at": time.time(),
        "members": [
            {"root": t.root, "stage_id": s,
             "writer": t.staged_record(s)["writer"],
             "base_version": t.staged_record(s)["base_version"],
             "published_version": None}
            for t, s in [(a, sa), (b, sb)]
        ],
    }
    os.makedirs(cat.txn_dir, exist_ok=True)
    json.dump(rec, open(os.path.join(cat.txn_dir, "tdead.json"), "w"))
    assert cat.snapshot(spark, "ta").filter("content = 'vA'").count() == 0
    acted = cat.recover(grace_seconds=0)
    assert len(acted) == 1 and acted[0]["state"] == "done"
    assert cat.snapshot(spark, "ta").filter("content = 'vA'").count() == 1
    assert cat.snapshot(spark, "tb").filter("content = 'vB'").count() == 1
    # pins followed the advance
    ref = cat._ref_name()
    assert any(r["name"] == ref and r["version"] == cat.read_set()["ta"]["version"]
               for r in a.list_refs())


def test_refresh_hook_keeps_catalog_consistent_in_loop(spark, tmp_path):
    """Medallion wiring: run_ingest maintains bronze + silver; the
    catalog's refresh_hook runs AFTER the derive hook, so at every
    cadence point the catalog pins a bronze/silver pair where
    silver == transform(bronze) EXACTLY — probed from inside the loop
    at the catalog-pinned versions, not just at the end."""
    from forklift_spark.changelog import ChangelogSpec, generate_changelog
    from forklift_spark.operators.derive import derive
    from forklift_spark.streaming.ingest import run_ingest

    spec = ChangelogSpec(
        n_events=2_000, n_repos=6, paths_per_repo=10, seed=31, segment_rows=400
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(spec, log_dir)
    bronze = create_entity_table(str(tmp_path / "bronze"), n_buckets=4)
    silver_root = str(tmp_path / "silver")
    cat = Catalog.create(str(tmp_path / "cat"))
    cat.register("bronze", bronze.root)
    mapping = {"lang": "lang", "content": "content", "n_chars": "length(content)"}
    checked = {"n": 0}

    def silver_hook(s):
        rep = derive(s, bronze, silver_root, mapping, derive_id="sv")
        if "silver" not in cat.names():
            cat.register("silver", silver_root)
        return rep

    def probe(s):
        if "silver" not in cat.read_set():
            return {"kind": "probe", "skipped": True}
        b = cat.snapshot(s, "bronze").selectExpr(
            "repo", "path", "lang", "content", "length(content) AS n_chars"
        )
        sv = cat.snapshot(s, "silver").select(
            "repo", "path", "lang", "content", "n_chars"
        )
        assert sorted(map(tuple, b.collect())) == sorted(map(tuple, sv.collect()))
        checked["n"] += 1
        return {"kind": "probe", "ok": True}

    report = run_ingest(
        spark, log_dir, bronze, str(tmp_path / "ckpt"), query_id="cathook",
        max_files_per_trigger=1,
        derived=[silver_hook, cat.refresh_hook(), probe],
    )
    applied = [e for e in report.epochs if not e.skipped]
    assert len(applied) >= 2 and checked["n"] >= 2  # probed MID-stream
    # the refresh hook's reports carry the advancing catalog versions
    cat_reports = [
        r for r in report.derived
        if isinstance(r, dict) and r.get("kind") == "catalog_refresh"
    ]
    assert len(cat_reports) == len(applied) + 1
    # final catalog head pins bronze's final version
    assert cat.read_set()["bronze"]["version"] == int(
        bronze._raw_current()["version"]
    )
