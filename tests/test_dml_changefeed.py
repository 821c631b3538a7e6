"""Out-of-band writes (predicate DML, restore) flow through the CDC-out
and derived-table surfaces: snapshot_diff emits their row-level effects
like any commit's (diffs are state-based, so HOW a version was produced
is invisible), and derive() propagates them downstream sha-exact."""

from pyspark.sql import functions as F

from forklift_spark.lakette.table import LaketteTable
from forklift_spark.operators.changes import snapshot_diff
from forklift_spark.operators.derive import derive, derived_state_recompute
from forklift_spark.operators.dml import delete_where, update_where
from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import create_entity_table

_DDL = (
    "op string, seq long, repo string, path string, commit string, "
    "lang string, content string, event_ts timestamp, schema_v int"
)

MAPPING = {"lang": "lang", "content": "upper(content)", "n_chars": "length(content)"}


def _ev(op, seq, path, lang="py", content="body"):
    return (op, seq, "r", path, f"c{seq}", lang, content, None, 1)


def _apply(spark, table, rows, epoch):
    merge_into(spark, table, spark.createDataFrame(rows, _DDL),
               query_id="src", epoch=epoch)


def _state(spark, table_or_df):
    df = (
        table_or_df.snapshot(spark)
        if isinstance(table_or_df, LaketteTable)
        else table_or_df
    )
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_dml_emits_row_level_changes(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, [
        _ev("I", 1, "a", lang="de"), _ev("I", 2, "b", lang="py"),
        _ev("I", 3, "c", lang="fr", content="salut"),
    ], 0)
    v_pre = table.current_metadata()["version"]

    delete_where(spark, table, "lang = 'de'")
    update_where(spark, table, {"content": "content || '!'"}, "lang = 'fr'")

    diff = snapshot_diff(spark, table, v_pre, table.current_metadata()["version"])
    changes = {(r.change, r.path) for r in diff.collect()}
    # exactly the DML's effects — untouched rows emit nothing
    assert changes == {("delete", "a"), ("update", "c")}


def test_dml_non_content_edit_is_visible(spark, tmp_path):
    """Regression (r5): a predicate-DML edit preserves seq AND may leave
    content (hence content_sha) untouched — e.g. fixing `lang`. The diff's
    comparison basis must cover every payload column, or the change is
    invisible to the CDC feed and derive() silently diverges. Also covers
    tables with NO content column at all (content_sha NULL everywhere)."""
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, [_ev("I", 1, "a", lang="de"), _ev("I", 2, "b")], 0)
    v_pre = table.current_metadata()["version"]
    dst_root = str(tmp_path / "dst")
    derive(spark, table, dst_root, MAPPING, derive_id="d")

    update_where(spark, table, {"lang": "'go'"}, "path = 'a'")
    v_post = table.current_metadata()["version"]

    # narrow feed sees it (same seq, same content_sha — payload compared)
    diff = snapshot_diff(spark, table, v_pre, v_post)
    assert [(r.change, r.path, r.seq) for r in diff.collect()] == [("update", "a", 1)]
    # full-row feed carries the new value
    full = snapshot_diff(spark, table, v_pre, v_post, full_rows=True)
    assert [(r.change, r.lang) for r in full.collect()] == [("update", "go")]
    # and derive converges to transform(final source) — not the stale row
    derive(spark, table, dst_root, MAPPING, derive_id="d")
    got = {r.path: r.lang
           for r in LaketteTable(dst_root).snapshot(spark).select("path", "lang").collect()}
    assert got["a"] == "go"

    # a table WITHOUT a content column: same contract
    from forklift_spark.lakette.table import LaketteTable as LT
    from pyspark.sql import types as T

    dim = LT.create(
        str(tmp_path / "dim"),
        T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("v", T.StringType()),
        ]),
        ["k"], n_buckets=4,
    )
    ev = spark.createDataFrame([("U", 1, "x", "old")], "op string, seq long, k string, v string")
    merge_into(spark, dim, ev, query_id="s", epoch=0)
    v1 = dim.current_metadata()["version"]
    update_where(spark, dim, {"v": "'new'"}, "k = 'x'")
    d2 = snapshot_diff(spark, dim, v1, dim.current_metadata()["version"], full_rows=True)
    assert [(r.change, r.k, r.v) for r in d2.collect()] == [("update", "x", "new")]


def test_derive_propagates_dml_and_restore(spark, tmp_path):
    """bronze -> silver across a span containing DML and a restore: the
    derived table must converge to transform(final source) sha-exact —
    out-of-band corrections need no special handling downstream because
    spans are state diffs."""
    src = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    _apply(spark, src, [
        _ev("I", i, f"f{i}", lang=["py", "js", "md"][i % 3], content=f"body {i}")
        for i in range(12)
    ], 0)
    dst_root = str(tmp_path / "dst")
    derive(spark, src, dst_root, MAPPING, predicate="lang <> 'md'", derive_id="d")
    v_tag = src.current_metadata()["version"]
    src.create_ref("pre-dml", kind="tag")

    # out-of-band corrections on the source
    delete_where(spark, src, "lang = 'js'")
    update_where(spark, src, {"content": "content || ' v2'"}, "lang = 'py'")
    derive(spark, src, dst_root, MAPPING, predicate="lang <> 'md'", derive_id="d")
    dst = LaketteTable(dst_root)
    assert _state(spark, dst) == _state(
        spark,
        derived_state_recompute(spark, src, MAPPING, predicate="lang <> 'md'"),
    )
    # the deleted js rows are gone downstream, updated py rows carry ' V2'
    got = dst.snapshot(spark)
    assert got.filter("lang = 'js'").count() == 0
    assert got.filter("lang = 'py'").count() > 0
    assert got.filter("lang = 'py' AND content NOT LIKE '% V2'").count() == 0

    # roll the source back; the next derive must converge to the restored
    # state (the span diff simply inverts the DML's effects)
    src.restore(ref="pre-dml")
    derive(spark, src, dst_root, MAPPING, predicate="lang <> 'md'", derive_id="d")
    assert _state(spark, dst) == _state(
        spark,
        derived_state_recompute(spark, src, MAPPING, predicate="lang <> 'md'"),
    )
    assert dst.snapshot(spark).filter("lang = 'js'").count() > 0  # resurrected
    assert src.current_metadata()["version"] > v_tag  # restore moved FORWARD

def test_mor_destination_raises_on_non_advancing_span(spark, tmp_path):
    """A MOR destination resolves reads by max(seq) and cannot express a
    non-seq-advancing change — the span application must raise LOUDLY
    (inside the merge job, zero extra jobs), never resolve an arbitrary
    same-seq tie or silently drop the row."""
    import pytest

    from forklift_spark.operators.replicate import replicate

    src = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    _apply(spark, src, [_ev("I", i, f"f{i}") for i in range(6)], 0)

    # normal event traffic flows into MOR destinations fine
    d_root = str(tmp_path / "d_mor")
    derive(spark, src, d_root, MAPPING, derive_id="d", mode="mor")
    r_root = str(tmp_path / "r_mor")
    replicate(spark, src, r_root, replication_id="r", mode="mor")
    _apply(spark, src, [_ev("U", 10, "f0", content="edit")], 1)
    derive(spark, src, d_root, MAPPING, derive_id="d", mode="mor")
    replicate(spark, src, r_root, replication_id="r", mode="mor")
    assert _state(spark, LaketteTable(r_root)) == _state(spark, src)

    # predicate DML preserves seq -> the next MOR span must raise
    update_where(spark, src, {"content": "content || '!'"}, "path = 'f1'")
    with pytest.raises(Exception, match="non-seq-advancing"):
        derive(spark, src, d_root, MAPPING, derive_id="d", mode="mor")
    with pytest.raises(Exception, match="non-seq-advancing"):
        replicate(spark, src, r_root, replication_id="r", mode="mor")

    # cow destinations absorb the same span (the documented remedy)
    c_root = str(tmp_path / "d_cow")
    derive(spark, src, c_root, MAPPING, derive_id="c", mode="cow")
    assert _state(spark, LaketteTable(c_root)) == _state(
        spark, derived_state_recompute(spark, src, MAPPING)
    )
