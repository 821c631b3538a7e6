"""table.restore(): rollback-as-a-new-commit (Delta RESTORE analogue) —
state equality with the restored version, history preservation, tag
composition, schema restore, LWW interplay after a restore, and guards."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table


def _ev(op, seq, path, content="body"):
    return (op, seq, "r", path, f"c{seq}", "py", content, None, 1)


def _seed(spark, table, rows, epoch, **kw):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    return merge_into(spark, table, df, query_id="seed", epoch=epoch, **kw)


def _state(spark, table, **kw):
    return sorted(
        (r.path, r.content, r.seq)
        for r in table.snapshot(spark, **kw).select("path", "content", "seq").collect()
    )


def test_restore_is_a_new_commit_with_old_state(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    _seed(spark, table, [_ev("I", 1, "a", "v1"), _ev("I", 2, "b", "v1")], 0)
    v_good = table.current_metadata()["version"]
    good = _state(spark, table)
    _seed(spark, table, [_ev("U", 5, "a", "BAD"), _ev("I", 6, "c", "BAD")], 1)
    _seed(spark, table, [("D", 7, "r", "b", None, None, None, None, 1)], 2)
    v_bad = table.current_metadata()["version"]

    commit = table.restore(v_good)
    assert commit.version == v_bad + 1          # forward, never a rewind
    assert _state(spark, table) == good
    # history intact: the bad versions still time-travel
    assert _state(spark, table, version=v_bad) != good

    # LWW interplay: the restore does not erase seqs already consumed —
    # re-delivery of the bad events (same seqs) re-applies them (the
    # restore restored seq 1/2 rows, so 5/6 win again). The durable fix
    # is upstream; restore is the triage tool. This is the documented
    # contract, asserted so it never changes silently.
    _seed(spark, table, [_ev("U", 5, "a", "BAD")], 3)
    assert ("a", "BAD", 5) in _state(spark, table)


def test_restore_by_tag_and_guards(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    _seed(spark, table, [_ev("I", 1, "a", "v1")], 0)
    table.create_ref("known-good", kind="tag")
    _seed(spark, table, [_ev("U", 9, "a", "v2")], 1)

    table.restore(ref="known-good")
    assert _state(spark, table) == [("a", "v1", 1)]

    with pytest.raises(ValueError, match="exactly one"):
        table.restore()
    with pytest.raises(ValueError, match="exactly one"):
        table.restore(1, ref="known-good")
    with pytest.raises(ValueError, match="already at"):
        cur = table.current_metadata()["version"]
        table.restore(cur)

    # across a rescale: rejected loudly
    table.rescale(8)
    with pytest.raises(ValueError, match="rescale"):
        table.restore(ref="known-good")


def test_restore_restores_schema(spark, tmp_path):
    """Rows and columns that only exist after an additive evolution are
    gone after restoring to the pre-evolution version."""
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a")], 0)
    v0 = table.current_metadata()["version"]
    evolved = T.StructType(
        list(CHANGELOG_SCHEMA.fields)
        + [T.StructField("size_bytes", T.LongType(), True)]
    )
    df = spark.createDataFrame(
        [("U", 5, "r", "a", "c5", "py", "v2", None, 2, 123)], evolved
    )
    merge_into(spark, table, df, query_id="seed", epoch=1)
    assert "size_bytes" in table.snapshot(spark).columns

    table.restore(v0)
    snap = table.snapshot(spark)
    assert "size_bytes" not in snap.columns
    assert [(r.path, r.seq) for r in snap.collect()] == [("a", 1)]
