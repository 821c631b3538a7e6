"""Round-5 capstone: ONE flow composes the engine's operational surfaces
end-to-end — streaming ingest with the in-loop medallion refresh and
wall-clock retention, a reproducibility tag, wall-clock time travel, an
engine-free manifest export of the silver layer, and an external DuckDB
read — with the final hand-off checked against an INDEPENDENT pandas
recompute of the silver state (not against the engine itself)."""

import os
import time

import duckdb

from forklift_spark.changelog import (
    ChangelogSpec,
    expected_final_state,
    generate_changelog,
)
from forklift_spark.lakette import LaketteTable
from forklift_spark.operators.derive import derive
from forklift_spark.operators.interop import export_manifest, read_manifest
from forklift_spark.streaming.ingest import (
    create_entity_table,
    run_ingest,
    verify_state,
)

SPEC = ChangelogSpec(
    n_events=2_500, n_repos=6, paths_per_repo=12, seed=31, segment_rows=500
)
MAPPING = {"lang": "lang", "content": "content", "n_chars": "length(content)"}
PRED = "lang <> 'md'"
CMP = ["repo", "path", "lang", "content", "n_chars"]


def test_lakehouse_capstone(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    generate_changelog(SPEC, log_dir)
    bronze = create_entity_table(str(tmp_path / "bronze"), n_buckets=4)
    silver_root = str(tmp_path / "silver")

    # 1. stream the changelog in with the silver refresh INSIDE the loop
    #    and wall-clock retention active (as_of must survive the vacuums)
    report = run_ingest(
        spark, log_dir, bronze, str(tmp_path / "ckpt"),
        query_id="capstone", max_files_per_trigger=1,
        derived=[lambda s: derive(
            s, bronze, silver_root, MAPPING, predicate=PRED, derive_id="cap"
        )],
        vacuum_every=2, vacuum_keep_versions=1,
        vacuum_grace_seconds=0.0, vacuum_keep_hours=1.0,
    )
    assert sum(1 for e in report.epochs if not e.skipped) >= 2
    exp = spark.createDataFrame(expected_final_state(SPEC))
    assert verify_state(spark, bronze, exp)["ok"]

    # 2. pin the training cut: a tag AND a wall-clock instant
    silver = LaketteTable(silver_root)
    silver.create_ref("train-cut", kind="tag")
    t_cut = time.time()

    # 3. publish the cut engine-free, addressed BY TIME, and read it back
    #    with DuckDB executing only the exported view.sql
    out = str(tmp_path / "drop")
    man = export_manifest(silver, out, as_of=t_cut, view_name="train")
    assert man["version"] == silver.version_as_of(t_cut)
    con = duckdb.connect()
    con.execute(open(os.path.join(out, "view.sql")).read())
    cols_sql = ", ".join(f'"{c}"' for c in CMP)
    duck = (
        con.execute(f'SELECT {cols_sql} FROM "train"').df()
        .sort_values(CMP).reset_index(drop=True)
    )
    con.close()

    # 4. the INDEPENDENT oracle: filter-then-map of the pandas final state
    pdf = expected_final_state(SPEC)
    pdf = pdf[pdf["lang"] != "md"].copy()
    pdf["n_chars"] = pdf["content"].str.len()
    want = pdf[CMP].sort_values(CMP).reset_index(drop=True)
    assert len(duck) == len(want) > 0
    assert duck.astype(str).equals(want.astype(str))

    # 5. Spark's engine-free reader sees the identical cut
    rm = (
        read_manifest(spark, out).select(*CMP).toPandas()
        .sort_values(CMP).reset_index(drop=True)
    )
    assert rm.astype(str).equals(want.astype(str))

    # 6. the tag and the timestamp address the same snapshot
    assert silver.ref_version("train-cut") == man["version"]
