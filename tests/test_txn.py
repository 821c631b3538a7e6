"""Multi-table transactional publish (lakette/txn.py): a reader never
observes a torn subset across CRASHES — pending records roll back,
committed records roll forward, both idempotently (writer stamps prove
publication when the record update lost a race). Concurrency limits are
loud, never silent."""

import json
import os

import pytest

from forklift_spark.lakette.table import CommitConflictError, LaketteTable
from forklift_spark.lakette.txn import (
    publish_transaction,
    recover_transactions,
)
from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import create_entity_table

_DDL = (
    "op string, seq long, repo string, path string, commit string, "
    "lang string, content string, event_ts timestamp, schema_v int"
)


def _ev(op, seq, path, content="body"):
    return (op, seq, "r", path, f"c{seq}", "py", content, None, 1)


def _stage(spark, table, rows, epoch, qid="q"):
    stats = merge_into(
        spark, table, spark.createDataFrame(rows, _DDL),
        query_id=qid, epoch=epoch, publish=False,
    )
    return stats.stage_id


def _two_tables(spark, tmp_path):
    a = create_entity_table(str(tmp_path / "a"), n_buckets=2)
    b = create_entity_table(str(tmp_path / "b"), n_buckets=2)
    merge_into(spark, a, spark.createDataFrame([_ev("I", 1, "x")], _DDL),
               query_id="seed", epoch=0)
    merge_into(spark, b, spark.createDataFrame([_ev("I", 1, "y")], _DDL),
               query_id="seed", epoch=0)
    return a, b


def _record(txn_dir):
    fns = [f for f in os.listdir(txn_dir) if f.endswith(".json")]
    assert len(fns) == 1
    return json.loads(open(os.path.join(txn_dir, fns[0])).read())


def test_happy_path_publishes_all_members(spark, tmp_path):
    a, b = _two_tables(spark, tmp_path)
    sa = _stage(spark, a, [_ev("U", 2, "x", "vA")], 1)
    sb = _stage(spark, b, [_ev("U", 2, "y", "vB")], 1)
    # staged => invisible on both
    assert a.snapshot(spark).filter("content = 'vA'").count() == 0
    txn_dir = str(tmp_path / "txn")
    rec = publish_transaction([(a, sa), (b, sb)], txn_dir)
    assert rec["state"] == "done"
    assert all(m["published_version"] is not None for m in rec["members"])
    assert a.snapshot(spark).filter("content = 'vA'").count() == 1
    assert b.snapshot(spark).filter("content = 'vB'").count() == 1
    assert not a.list_staged() and not b.list_staged()
    # recovery finds nothing to do
    assert recover_transactions(txn_dir, grace_seconds=0) == []


def test_pre_flip_conflict_publishes_nothing(spark, tmp_path):
    a, b = _two_tables(spark, tmp_path)
    sa = _stage(spark, a, [_ev("U", 2, "x", "vA")], 1)
    sb = _stage(spark, b, [_ev("U", 2, "y", "vB")], 1)
    # an interleaving commit moves b's base BEFORE the flip
    merge_into(spark, b, spark.createDataFrame([_ev("U", 3, "y", "mid")], _DDL),
               query_id="other", epoch=7)
    txn_dir = str(tmp_path / "txn")
    with pytest.raises(CommitConflictError, match="nothing was published"):
        publish_transaction([(a, sa), (b, sb)], txn_dir)
    # NOTHING visible from the transaction, staged work intact
    assert a.snapshot(spark).filter("content = 'vA'").count() == 0
    assert len(a.list_staged()) == 1 and len(b.list_staged()) == 1
    assert _record(txn_dir)["state"] == "aborted"
    # recovery leaves an aborted record alone
    assert recover_transactions(txn_dir, grace_seconds=0) == []


def test_dead_pending_record_rolls_back(spark, tmp_path):
    """Publisher dies between record create and the commit-point flip:
    recovery aborts the staged members after the grace — no member was
    ever visible."""
    a, b = _two_tables(spark, tmp_path)
    sa = _stage(spark, a, [_ev("U", 2, "x", "vA")], 1)
    sb = _stage(spark, b, [_ev("U", 2, "y", "vB")], 1)
    txn_dir = str(tmp_path / "txn")
    os.makedirs(txn_dir)
    import time

    # simulate the crash: a pending record, publisher gone
    rec = {
        "txn_id": "t1", "state": "pending", "created_at": time.time(),
        "members": [
            {"root": t.root, "stage_id": s,
             "writer": t.staged_record(s)["writer"],
             "base_version": t.staged_record(s)["base_version"],
             "published_version": None}
            for t, s in [(a, sa), (b, sb)]
        ],
    }
    json.dump(rec, open(os.path.join(txn_dir, "t1.json"), "w"))

    # within the grace: untouched (a live publisher may be mid-flip)
    assert recover_transactions(txn_dir, grace_seconds=10**9) == []
    assert len(a.list_staged()) == 1

    acted = recover_transactions(txn_dir, grace_seconds=0,
                                 tables={a.root: a, b.root: b})
    assert len(acted) == 1 and acted[0]["state"] == "aborted"
    assert not a.list_staged() and not b.list_staged()
    assert a.snapshot(spark).filter("content = 'vA'").count() == 0


def test_committed_record_rolls_forward_idempotently(spark, tmp_path):
    """Publisher dies after the flip — worst case: member A's publish
    LANDED but the record update was lost (published_version still null).
    Recovery must prove A's publication from the writer stamp, not
    re-apply it, and finish B."""
    a, b = _two_tables(spark, tmp_path)
    sa = _stage(spark, a, [_ev("U", 2, "x", "vA")], 1)
    sb = _stage(spark, b, [_ev("U", 2, "y", "vB")], 1)
    members = [
        {"root": t.root, "stage_id": s,
         "writer": t.staged_record(s)["writer"],
         "base_version": t.staged_record(s)["base_version"],
         "published_version": None}
        for t, s in [(a, sa), (b, sb)]
    ]
    # member A's publish landed before the crash; record knows nothing
    a.publish_staged(sa)
    txn_dir = str(tmp_path / "txn")
    os.makedirs(txn_dir)
    rec = {"txn_id": "t2", "state": "committed", "created_at": 0,
           "members": members}
    json.dump(rec, open(os.path.join(txn_dir, "t2.json"), "w"))

    acted = recover_transactions(txn_dir, tables={a.root: a, b.root: b})
    assert len(acted) == 1 and acted[0]["state"] == "done"
    got = {m["root"]: m["published_version"] for m in acted[0]["members"]}
    assert got[a.root] == a.current_metadata()["version"]
    assert a.snapshot(spark).filter("content = 'vA'").count() == 1
    assert b.snapshot(spark).filter("content = 'vB'").count() == 1
    # A was published exactly once: one 'vA' row, version advanced by one
    assert a.snapshot(spark).count() == 1

    # idempotent: a second recovery pass is a no-op
    assert recover_transactions(txn_dir, tables={a.root: a, b.root: b}) == []


def test_post_flip_conflict_is_loud_and_recoverable(spark, tmp_path):
    """An interleaving SAME-BUCKET commit lands on member B after the
    flip: the publish conflicts, the transaction stays 'committed' with
    A visible, and the error names the remedy. After the conflicting
    stage is re-staged, recovery finishes the transaction."""
    a, b = _two_tables(spark, tmp_path)
    sa = _stage(spark, a, [_ev("U", 2, "x", "vA")], 1)
    sb = _stage(spark, b, [_ev("U", 2, "y", "vB")], 1)
    txn_dir = str(tmp_path / "txn")

    # race the window between pre-validation and b's publish: patch
    # publish_staged on b to inject the interleaving commit first
    real = LaketteTable.publish_staged
    state = {"raced": False}

    def raced(self, stage_id):
        if self.root == b.root and not state["raced"]:
            state["raced"] = True
            merge_into(
                spark, b,
                spark.createDataFrame([_ev("U", 9, "y", "mid")], _DDL),
                query_id="other", epoch=7,
            )
        return real(self, stage_id)

    LaketteTable.publish_staged = raced
    try:
        with pytest.raises(CommitConflictError, match="recover_transactions"):
            publish_transaction([(a, sa), (b, sb)], txn_dir)
    finally:
        LaketteTable.publish_staged = real

    rec = _record(txn_dir)
    assert rec["state"] == "committed" and "conflict" in rec
    assert a.snapshot(spark).filter("content = 'vA'").count() == 1  # visible
    assert b.snapshot(spark).filter("content = 'vB'").count() == 0  # staged

    # resolve: re-stage b's change against the moved base, fix the record
    b.abort_staged(sb)
    sb2 = _stage(spark, b, [_ev("U", 10, "y", "vB")], 2)
    rec["members"][1]["stage_id"] = sb2
    rec["members"][1]["writer"] = b.staged_record(sb2)["writer"]
    json.dump(rec, open(os.path.join(txn_dir, f"{rec['txn_id']}.json"), "w"))
    acted = recover_transactions(txn_dir, tables={a.root: a, b.root: b})
    assert acted and acted[0]["state"] == "done"
    assert b.snapshot(spark).filter("content = 'vB'").count() == 1


def test_writerless_stage_rejected(spark, tmp_path):
    a, _ = _two_tables(spark, tmp_path)
    sid = a.stage_commit(new_files=[], replaced_buckets=set(), writer=None)
    with pytest.raises(ValueError, match="writer stamp"):
        publish_transaction([(a, sid)], str(tmp_path / "txn"))


def test_disjoint_interleaving_rebases_through(spark, tmp_path):
    """Pre-flip validation uses the SAME independence rule as the publish
    CAS: a provably-disjoint interleaving commit (different bucket) must
    NOT abort the transaction — it rebases at publish, both members land."""
    a, b = _two_tables(spark, tmp_path)
    sa = _stage(spark, a, [_ev("U", 2, "x", "vA")], 1)
    sb = _stage(spark, b, [_ev("U", 2, "y", "vB")], 1)

    # find a path hashing to the OTHER bucket than 'x' on table a
    probe = spark.createDataFrame(
        [("r", f"p{i}") for i in range(16)], "repo string, path string"
    ).select("path", a.bucket_expr().alias("b")).collect()
    x_bucket = (
        spark.createDataFrame([("r", "x")], "repo string, path string")
        .select(a.bucket_expr().alias("b")).first().b
    )
    other = next(r.path for r in probe if r.b != x_bucket)
    merge_into(spark, a,
               spark.createDataFrame([_ev("I", 5, other, "bg")], _DDL),
               query_id="bg", epoch=0)

    rec = publish_transaction([(a, sa), (b, sb)], str(tmp_path / "txn"))
    assert rec["state"] == "done"
    assert a.snapshot(spark).filter("content = 'vA'").count() == 1
    assert a.snapshot(spark).filter("content = 'bg'").count() == 1  # both live
    assert b.snapshot(spark).filter("content = 'vB'").count() == 1


def test_review_hardenings(spark, tmp_path):
    """Round-5 self-review closures: (a) publish writes each member's
    epoch marker directly (the gate must not rest on the healing of the
    NEXT commit alone); (b) terminal records rename to
    {id}.{state}.json so the sweep skips them by filename; (c) two
    members on one table are rejected in the PRIMITIVE; (d) one poisoned
    record doesn't starve later records of their roll-forward — all are
    processed, then the aggregate raises loudly."""
    a, b = _two_tables(spark, tmp_path)
    sa = _stage(spark, a, [_ev("U", 2, "x", "vA")], 1)
    sb = _stage(spark, b, [_ev("U", 2, "y", "vB")], 1)
    txn_dir = str(tmp_path / "txn")
    publish_transaction([(a, sa), (b, sb)], txn_dir)
    # (a) markers written at publish, not deferred to the next commit
    assert a.fs.exists(a._marker_path("q", 1))
    assert b.fs.exists(b._marker_path("q", 1))
    # (b) the record finalized by filename; the sweep reads nothing
    fns = os.listdir(txn_dir)
    assert len(fns) == 1 and fns[0].endswith(".done.json")

    # (c) same-table members rejected by the primitive itself
    s1 = _stage(spark, a, [_ev("U", 3, "x", "v1")], 2)
    s2 = a.stage_commit(new_files=[], replaced_buckets=set(),
                        writer={"query_id": "q2", "epoch": 0})
    with pytest.raises(ValueError, match="share table"):
        publish_transaction([(a, s1), (a, s2)], txn_dir)
    a.abort_staged(s1), a.abort_staged(s2)

    # (d) poisoned record (stage vanished, no stamp) + healthy committed
    # record: the healthy one still rolls forward, then the sweep raises
    sc = _stage(spark, b, [_ev("U", 4, "y", "v4")], 3)
    healthy = {
        "txn_id": "zz-good", "state": "committed", "created_at": 0,
        "members": [{
            "root": b.root, "stage_id": sc,
            "writer": b.staged_record(sc)["writer"],
            "base_version": b.staged_record(sc)["base_version"],
            "published_version": None,
        }],
    }
    poison = {
        "txn_id": "aa-poison", "state": "committed", "created_at": 0,
        "members": [{
            "root": a.root, "stage_id": "deadbeef00000000",
            "writer": {"query_id": "ghost", "epoch": 99},
            "base_version": 1, "published_version": None,
        }],
    }
    json.dump(poison, open(os.path.join(txn_dir, "aa-poison.json"), "w"))
    json.dump(healthy, open(os.path.join(txn_dir, "zz-good.json"), "w"))
    with pytest.raises(RuntimeError, match="aa-poison"):
        recover_transactions(txn_dir, tables={a.root: a, b.root: b})
    # the healthy record (sorted AFTER the poison) was still settled
    assert b.snapshot(spark).filter("content = 'v4'").count() == 1
    assert os.path.exists(os.path.join(txn_dir, "zz-good.done.json"))
