"""CDC-out export sink: committed change spans as parquet directories an
external consumer tails — marker-gated exactly-once (data first, marker
last, marker'd spans never rewritten), resumable from the markers."""

import json
import os

import pytest
from pyspark.sql import functions as F

from forklift_spark.operators.changes import (
    export_changes,
    read_exported_changes,
    snapshot_diff,
)
from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import create_entity_table

_DDL = (
    "op string, seq long, repo string, path string, commit string, "
    "lang string, content string, event_ts timestamp, schema_v int"
)


def _ev(op, seq, path, content="body"):
    return (op, seq, "r", path, f"c{seq}", "py", content, None, 1)


def _merge(spark, table, rows, epoch):
    merge_into(spark, table, spark.createDataFrame(rows, _DDL),
               query_id="q", epoch=epoch)


def _chg(df):
    return sorted((r.change, r.path, r.seq) for r in df.collect())


def test_export_spans_reconstruct_the_full_diff(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    _merge(spark, table, [_ev("I", i, f"p{i}") for i in range(1, 9)], 0)
    v0 = table.current_metadata()["version"]
    _merge(spark, table, [_ev("U", 10, "p1"), _ev("D", 11, "p2")], 1)
    _merge(spark, table, [_ev("I", 12, "p9"), _ev("U", 13, "p3")], 2)

    out = str(tmp_path / "out")
    rep = export_changes(
        spark, table, out, from_version=v0, every_version=True
    )
    assert len(rep["exported"]) == 2 and rep["rows"] == 4
    got = read_exported_changes(spark, out)
    want = snapshot_diff(spark, table, v0, table.current_metadata()["version"])
    assert _chg(got) == _chg(want)

    # markers carry lineage and match the data
    markers = sorted(os.listdir(os.path.join(out, "_spans")))
    assert len(markers) == 2
    m = json.loads(open(os.path.join(out, "_spans", markers[0])).read())
    assert m["rows"] == 2 and m["to_version"] == m["from_version"] + 1
    n_files = spark.read.parquet(os.path.join(out, m["path"])).count()
    assert n_files == m["rows"]

    # idempotent re-run: nothing new to export
    rep2 = export_changes(spark, table, out)
    assert rep2["exported"] == [] and rep2["skipped"] == []

    # new commits resume from the markers
    _merge(spark, table, [_ev("D", 14, "p3")], 3)
    rep3 = export_changes(spark, table, out)
    assert len(rep3["exported"]) == 1 and rep3["rows"] == 1
    assert ("delete", "p3", 14) in _chg(read_exported_changes(spark, out))


def test_export_crash_window_and_guards(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _merge(spark, table, [_ev("I", 1, "a"), _ev("I", 2, "b")], 0)
    v0 = table.current_metadata()["version"]
    _merge(spark, table, [_ev("U", 3, "a")], 1)

    out = str(tmp_path / "out")
    with pytest.raises(ValueError, match="from_version"):
        export_changes(spark, table, out)

    # simulate a crash AFTER data, BEFORE marker: partial span invisible
    span_dir = os.path.join(out, "spans", f"v{v0:09d}-v{v0 + 1:09d}")
    snapshot_diff(spark, table, v0, v0 + 1).write.mode("overwrite").parquet(
        span_dir
    )
    with pytest.raises(ValueError, match="no committed spans"):
        read_exported_changes(spark, out)
    # retry replaces the partial attempt wholesale and commits the marker
    rep = export_changes(spark, table, out, from_version=v0)
    assert rep["exported"] == [(v0, v0 + 1)] and rep["rows"] == 1
    assert _chg(read_exported_changes(spark, out)) == [("update", "a", 3)]

    # full_rows spans are merge-applyable envelopes: payload rides along
    out2 = str(tmp_path / "out2")
    export_changes(spark, table, out2, from_version=v0, full_rows=True)
    row = read_exported_changes(spark, out2).first()
    assert row.content == "body" and row.lang == "py"

def test_continuous_export_rides_the_ingest_loop(spark, tmp_path):
    """export_changes needs NO loop integration of its own: it is a valid
    `derived=` hook (any callable spark -> report), so one run_ingest call
    maintains the table AND a marker-gated external changelog drop —
    spans stay contiguous and resume from the markers across epochs."""
    from forklift_spark.changelog import ChangelogSpec, generate_changelog
    from forklift_spark.streaming.ingest import run_ingest

    spec = ChangelogSpec(
        n_events=2_000, n_repos=6, paths_per_repo=10, seed=31, segment_rows=400
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(spec, log_dir)
    bronze = create_entity_table(str(tmp_path / "bronze"), n_buckets=4)
    out = str(tmp_path / "out")

    report = run_ingest(
        spark, log_dir, bronze, str(tmp_path / "ckpt"), query_id="exp",
        max_files_per_trigger=1,
        derived=[lambda s: export_changes(s, bronze, out, from_version=1)],
    )
    applied = [e for e in report.epochs if not e.skipped]
    assert len(applied) >= 2  # genuinely multi-epoch

    markers = [
        json.loads(open(os.path.join(out, "_spans", fn)).read())
        for fn in sorted(os.listdir(os.path.join(out, "_spans")))
    ]
    assert len(markers) >= 2  # exported MID-STREAM, not one bulk drop
    # contiguous coverage 1 -> final version, no gaps or overlaps
    assert markers[0]["from_version"] == 1
    assert all(
        m["from_version"] == p["to_version"]
        for p, m in zip(markers, markers[1:])
    )
    assert markers[-1]["to_version"] == bronze.current_metadata()["version"]
    # each span dir is exactly snapshot_diff of its version range
    m = markers[len(markers) // 2]
    got = spark.read.parquet(os.path.join(out, m["path"]))
    want = snapshot_diff(spark, bronze, m["from_version"], m["to_version"])
    assert _chg(got) == _chg(want)
    assert read_exported_changes(spark, out).count() == sum(
        m["rows"] for m in markers
    )


def test_declared_clustering_applies_in_loop_maintenance(spark, tmp_path):
    """Incremental compaction inside run_ingest inherits the table's
    declared cluster_by — hot buckets come out lang-clustered with tight
    cstats, no per-call plumbing."""
    from forklift_spark.changelog import ChangelogSpec, generate_changelog
    from forklift_spark.streaming.ingest import run_ingest

    spec = ChangelogSpec(
        n_events=2_000, n_repos=6, paths_per_repo=10, seed=37, segment_rows=400
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(spec, log_dir)
    bronze = create_entity_table(
        str(tmp_path / "bronze"), n_buckets=4, target_file_rows=16,
        cluster_by=["lang"],
    )
    run_ingest(
        spark, log_dir, bronze, str(tmp_path / "ckpt"), query_id="clus",
        max_files_per_trigger=1, mode="mor", compact_every=1,
    )
    meta = bronze.current_metadata()
    base = [f for f in meta["files"] if not f.get("delta")]
    compacted = [f for f in base if (f.get("cstats") or {}).get("lang")]
    assert compacted, "maintenance compaction recorded no cluster cstats"
    # clustered files are genuinely tight: some file's lang range is a
    # strict subrange (a key-sorted layout spans the whole domain)
    langs = sorted({f["cstats"]["lang"][0] for f in compacted}
                   | {f["cstats"]["lang"][1] for f in compacted})
    assert any(f["cstats"]["lang"][0] == f["cstats"]["lang"][1]
               for f in compacted) or len(langs) > 1


def test_export_survives_schema_evolution_and_expires(spark, tmp_path):
    """Spans written before an additive source evolution lack the new
    column — read_exported_changes merges schemas so pre-evolution rows
    carry typed NULLs. expire_exported_spans bounds the drop's file
    population (span dir first, marker last)."""
    from forklift_spark.operators.changes import expire_exported_spans

    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _merge(spark, table, [_ev("I", 1, "a"), _ev("I", 2, "b")], 0)
    v0 = table.current_metadata()["version"]
    _merge(spark, table, [_ev("U", 3, "a")], 1)

    out = str(tmp_path / "out")
    export_changes(spark, table, out, from_version=v0, full_rows=True)

    # additive evolution upstream, then another span
    evolved = spark.createDataFrame(
        [("U", 4, "r", "b", "c4", "py", "body", None, 2, 9)],
        _DDL + ", stars int",
    )
    merge_into(spark, table, evolved, query_id="q", epoch=2)
    export_changes(spark, table, out, full_rows=True)

    got = read_exported_changes(spark, out)
    assert "stars" in got.columns
    rows = {r.path: r for r in got.collect()}
    assert rows["b"].stars == 9          # evolved span carries the column
    assert rows["a"].stars is None       # pre-evolution span: typed NULL

    # retention: keep only the newest span; its data stays readable
    rep = expire_exported_spans(out, keep_last=1)
    assert rep == {"expired": 1, "kept": 1}
    left = read_exported_changes(spark, out)
    assert _chg(left) == [("update", "b", 4)]
    assert len(os.listdir(os.path.join(out, "spans"))) == 1
