"""Metadata tables (Iceberg `table.files` / `table.history` analogues):
files_df parses manifest shards in EXECUTORS (driver touches only the
O(buckets) refs), history_df lists retained version files — both plain
DataFrames, registrable as views for the spark.sql surface."""

import json

from pyspark.sql import functions as F

from forklift_spark.operators.merge import compact, merge_into
from forklift_spark.streaming.ingest import create_entity_table

_DDL = (
    "op string, seq long, repo string, path string, commit string, "
    "lang string, content string, event_ts timestamp, schema_v int"
)


def _ev(op, seq, path, lang="py", content="body"):
    return (op, seq, "r", path, f"c{seq}", lang, content, None, 1)


def _merge(spark, table, rows, epoch, **kw):
    merge_into(spark, table, spark.createDataFrame(rows, _DDL),
               query_id="q", epoch=epoch, **kw)


def test_files_df_mirrors_manifests(spark, tmp_path):
    table = create_entity_table(
        str(tmp_path / "t"), n_buckets=4, target_file_rows=10,
        cluster_by=["lang"],
    )
    _merge(spark, table, [_ev("I", i, f"p{i:03d}") for i in range(1, 41)], 0)
    v_base = table.current_metadata()["version"]
    _merge(spark, table, [_ev("U", 100 + i, f"p{i:03d}") for i in range(1, 6)],
           1, mode="mor")

    meta = table.current_metadata()
    got = table.files_df(spark).orderBy("path").collect()
    want = sorted(meta["files"], key=lambda f: f["path"])
    assert [r.path for r in got] == [f["path"] for f in want]
    assert sum(r.rows for r in got) == meta["total_rows"]
    assert sum(r.delta for r in got) == meta["total_delta_files"]
    assert all(r.bucket == f["bucket"] and r.nb == f["nb"]
               for r, f in zip(got, want))
    assert all(r.kmin == f.get("kmin") and r.smax == f.get("smax")
               for r, f in zip(got, want))

    # time travel pins the older file set — no delta files existed then
    old = table.files_df(spark, version=v_base)
    assert old.count() == len(
        table._materialize(table._raw_metadata_at(v_base))["files"]
    )
    assert old.filter("delta").count() == 0

    # cstats ride as stable JSON text (compact records the cluster column)
    compact(spark, table)
    with_stats = table.files_df(spark).filter("cstats_json IS NOT NULL")
    assert with_stats.count() == table.files_df(spark).count()
    one = json.loads(with_stats.first().cstats_json)
    assert "lang" in one and len(one["lang"]) == 2

    # the SQL surface: a view over the metadata table
    table.files_df(spark, view="t_files")
    agg = spark.sql(
        "SELECT count(*) AS files, sum(rows) AS rows FROM t_files"
    ).first()
    meta2 = table.current_metadata()
    assert (agg.files, agg.rows) == (meta2["total_files"], meta2["total_rows"])


def test_history_df_tracks_the_version_chain(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _merge(spark, table, [_ev("I", 1, "a")], 0)
    _merge(spark, table, [_ev("U", 2, "a")], 1)
    compact(spark, table)

    hist = table.history_df(spark, view="t_hist").collect()
    cur = table.current_metadata()
    assert [r.version for r in hist] == list(range(1, cur["version"] + 1))
    assert [r.parent_version for r in hist] == [None, *range(1, cur["version"])]
    assert all(r.committed_at is not None for r in hist)
    assert hist[1].writer_query_id == "q" and hist[1].writer_epoch == 0
    assert hist[-1].writer_query_id == "__compact__"
    assert hist[-1].total_rows == cur["total_rows"]
    # wall-clock stamps are informational but should not regress here
    assert hist[0].committed_at <= hist[-1].committed_at
    top = spark.sql(
        "SELECT version FROM t_hist ORDER BY version DESC LIMIT 1"
    ).first()
    assert top.version == cur["version"]


def test_files_df_empty_table_has_full_surface(spark, tmp_path):
    """A freshly created table (zero manifests) must expose the SAME
    schema and view semantics as a populated one — a dashboard query
    written against cstats_json cannot break on an empty table."""
    t = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    df = t.files_df(spark, view="empty_files")
    assert df.count() == 0
    assert "cstats_json" in df.columns and "cstats" not in df.columns
    assert spark.sql("SELECT count(*) AS n FROM empty_files").first().n == 0
