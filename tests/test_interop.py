"""Engine-free manifest export (operators/interop.py): a DuckDB connection
with ZERO lakette code executes the exported view.sql and must read the
exact snapshot; Spark's read_manifest proves the same contract
engine-free on the Spark side; merge-on-read deltas refuse until
compacted; schema evolution and column renames survive the export;
marker-last atomicity gates readers."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from forklift_spark.operators.interop import export_manifest, read_manifest
from forklift_spark.operators.merge import compact, merge_into
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table

CMP = ["repo", "path", "seq", "lang", "content", "content_sha"]


def _ev(op, seq, path, content="body", lang="py"):
    return (op, seq, "r", path, f"c{seq}", lang, content, None, 1)


def _seed(spark, table, rows, epoch, **kw):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    return merge_into(spark, table, df, query_id="seed", epoch=epoch, **kw)


def _duck(out_dir, cols):
    con = duckdb.connect()
    con.execute(open(os.path.join(out_dir, "view.sql")).read())
    cols_sql = ", ".join(f'"{c}"' for c in cols)
    pdf = con.execute(f'SELECT {cols_sql} FROM "snapshot"').df()
    con.close()
    return pdf.sort_values(cols).reset_index(drop=True)


def _spark_pdf(df, cols):
    pdf = df.select(*cols).toPandas()
    return pdf.sort_values(cols).reset_index(drop=True)


def test_duckdb_reads_exported_snapshot(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    _seed(spark, table, [_ev("I", i, f"p{i}", f"v{i}") for i in range(20)], 0)
    _seed(spark, table, [_ev("U", 100 + i, f"p{i}", f"w{i}") for i in range(0, 20, 3)], 1)
    _seed(spark, table, [_ev("D", 200 + i, f"p{i}") for i in range(0, 20, 7)], 2)

    out = str(tmp_path / "drop")
    man = export_manifest(table, out)
    assert man["n_files"] > 0
    duck = _duck(out, CMP)
    snap = _spark_pdf(table.snapshot(spark), CMP)
    assert len(duck) == len(snap) > 0
    assert duck.astype(str).equals(snap.astype(str))
    # tombstoned keys are absent in BOTH readers
    assert "p0" not in set(duck["path"])


def test_mor_deltas_refuse_until_compacted(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    _seed(spark, table, [_ev("I", i, f"p{i}") for i in range(10)], 0)
    _seed(spark, table, [_ev("U", 50 + i, f"p{i}", "new") for i in range(5)], 1,
          mode="mor")
    out = str(tmp_path / "drop")
    with pytest.raises(ValueError, match="merge-on-read delta"):
        export_manifest(table, out)
    compact(spark, table)
    export_manifest(table, out)
    duck = _duck(out, CMP)
    snap = _spark_pdf(table.snapshot(spark), CMP)
    assert duck.astype(str).equals(snap.astype(str))


def test_schema_evolution_survives_export(spark, tmp_path):
    """Files written before an additive evolution lack the new column;
    union_by_name in the generated view (and mergeSchema in read_manifest)
    must surface typed NULLs for them, exactly like snapshot() does."""
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    _seed(spark, table, [_ev("I", i, f"p{i}") for i in range(12)], 0)
    df2 = spark.createDataFrame(
        [_ev("U", 100 + i, f"p{i}", "evolved") for i in range(3)], CHANGELOG_SCHEMA
    ).withColumn("size_bytes", F.length("content"))
    merge_into(spark, table, df2, query_id="seed", epoch=1)

    out = str(tmp_path / "drop")
    export_manifest(table, out)
    cols = CMP + ["size_bytes"]
    duck = _duck(out, cols)
    snap = _spark_pdf(table.snapshot(spark), cols)
    assert duck.astype(str).equals(snap.astype(str))
    assert duck["size_bytes"].notna().sum() == 3  # only the evolved rows

    # Spark-side engine-free reader agrees too
    rm = _spark_pdf(read_manifest(spark, out), cols)
    assert rm.astype(str).equals(snap.astype(str))


def test_rename_aliases_physical_to_logical(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a", "x", lang="py")], 0)
    table.rename_column("lang", "language")
    out = str(tmp_path / "drop")
    export_manifest(table, out)
    cols = ["repo", "path", "seq", "language", "content"]
    duck = _duck(out, cols)
    assert list(duck["language"]) == ["py"]
    rm = _spark_pdf(read_manifest(spark, out), cols)
    assert duck.astype(str).equals(rm.astype(str))


def test_version_pinning_and_read_manifest_parity(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a", "old")], 0)
    v_old = table.current_metadata()["version"]
    _seed(spark, table, [_ev("U", 2, "a", "new")], 1)

    out = str(tmp_path / "drop")
    man = export_manifest(table, out, version=v_old)
    assert man["version"] == v_old
    rm = _spark_pdf(read_manifest(spark, out), CMP)
    snap = _spark_pdf(table.snapshot(spark, version=v_old), CMP)
    assert rm.astype(str).equals(snap.astype(str))
    assert list(rm["content"]) == ["old"]
    with pytest.raises(ValueError, match="at most one of"):
        export_manifest(table, out, version=v_old, ref="x")


def test_marker_last_atomicity(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a")], 0)
    out = str(tmp_path / "drop")
    export_manifest(table, out)
    os.remove(os.path.join(out, "_MANIFEST.json"))
    with pytest.raises(ValueError, match="marker"):
        read_manifest(spark, out)
    # re-export restores the marker and the reader
    export_manifest(table, out)
    assert read_manifest(spark, out).count() == 1


def test_empty_snapshot_exports_zero_row_view(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    out = str(tmp_path / "drop")
    man = export_manifest(table, out)
    assert man["n_files"] == 0
    con = duckdb.connect()
    con.execute(open(os.path.join(out, "view.sql")).read())
    assert con.execute('SELECT count(*) FROM "snapshot"').fetchone()[0] == 0
    con.close()
    assert read_manifest(spark, out).count() == 0
