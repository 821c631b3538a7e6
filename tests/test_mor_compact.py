"""Merge-on-read mode + compaction: identical final semantics to COW,
delta-append writes, read-side LWW, compaction folds deltas into base."""

import os

import pytest
from pyspark.sql import functions as F

from forklift_spark.changelog import ChangelogSpec, expected_final_state, generate_changelog
from forklift_spark.operators.merge import compact, merge_into
from forklift_spark.streaming.ingest import (
    CHANGELOG_SCHEMA,
    create_entity_table,
    run_ingest,
    verify_state,
)

SPEC = ChangelogSpec(
    n_events=4_000, n_repos=10, paths_per_repo=20, seed=7, duplicate_fraction=0.1
)


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("morlog")
    generate_changelog(SPEC, str(d))
    return str(d)


def test_mor_replay_sha_exact(spark, log_dir, tmp_path):
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=8)
    report = run_ingest(
        spark, log_dir, table, str(tmp_path / "ckpt"),
        query_id="mor", max_files_per_trigger=1, mode="mor",
    )
    assert len(report.epochs) >= 2
    assert table.current_metadata()["requires_dedup"] is True
    exp = spark.createDataFrame(expected_final_state(SPEC))
    assert verify_state(spark, table, exp)["ok"]


def test_mor_then_compact(spark, log_dir, tmp_path):
    table = create_entity_table(str(tmp_path / "tbl2"), n_buckets=8)
    run_ingest(
        spark, log_dir, table, str(tmp_path / "ckpt2"),
        query_id="mor2", max_files_per_trigger=1, mode="mor",
    )
    before = table.current_metadata()
    res = compact(spark, table)
    after = table.current_metadata()
    assert after["requires_dedup"] is False
    assert res["files_after"] <= res["files_before"]
    exp = spark.createDataFrame(expected_final_state(SPEC))
    assert verify_state(spark, table, exp)["ok"]
    # snapshot row identity pre/post compact
    assert before["snapshot_id"] < after["snapshot_id"]


def test_mixed_modes_converge(spark, log_dir, tmp_path):
    """MOR epochs followed by a COW epoch (and vice versa) still converge:
    the COW merge reads the deduped view of the delta-bearing snapshot."""
    segs = sorted(os.listdir(log_dir))
    half = len(segs) // 2
    table = create_entity_table(str(tmp_path / "tbl3"), n_buckets=8)
    df1 = spark.read.schema(CHANGELOG_SCHEMA).parquet(
        *[os.path.join(log_dir, s) for s in segs[:half]]
    )
    df2 = spark.read.schema(CHANGELOG_SCHEMA).parquet(
        *[os.path.join(log_dir, s) for s in segs[half:]]
    )
    merge_into(spark, table, df1, query_id="mix", epoch=0, mode="mor")
    merge_into(spark, table, df2, query_id="mix", epoch=1, mode="cow")
    exp = spark.createDataFrame(expected_final_state(SPEC))
    assert verify_state(spark, table, exp)["ok"]


def test_mor_epoch_idempotent(spark, log_dir, tmp_path):
    table = create_entity_table(str(tmp_path / "tbl4"), n_buckets=8)
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-00000.parquet")
    s1 = merge_into(spark, table, df, query_id="q", epoch=0, mode="mor")
    rows1 = table.snapshot(spark).count()
    s2 = merge_into(spark, table, df, query_id="q", epoch=0, mode="mor")
    assert not s1.skipped and s2.skipped
    assert table.snapshot(spark).count() == rows1


def test_mor_delete_tombstone(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "tbl5"), n_buckets=4)
    rows_i = [("I", 5, "r", "p", "c", "py", "content x", None, 1)]
    rows_d = [("D", 10, "r", "p", None, None, None, None, 1)]
    merge_into(spark, table, spark.createDataFrame(rows_i, CHANGELOG_SCHEMA),
               query_id="t", epoch=0, mode="mor")
    assert table.snapshot(spark).count() == 1
    merge_into(spark, table, spark.createDataFrame(rows_d, CHANGELOG_SCHEMA),
               query_id="t", epoch=1, mode="mor")
    assert table.snapshot(spark).count() == 0
    assert table.snapshot(spark, include_deleted=True).filter(F.col("deleted")).count() == 1
    # compaction keeps the tombstone by default, drops it when told to
    compact(spark, table)
    assert table.snapshot(spark, include_deleted=True).count() == 1
    compact(spark, table, drop_tombstones=True)
    assert table.snapshot(spark, include_deleted=True).count() == 0


def test_compact_rebucket_grows_table(spark, tmp_path):
    """compact(n_buckets=4B) re-spreads keys atomically; subsequent merges
    use the new bucket function and the state stays sha-exact."""
    from forklift_spark.changelog import ChangelogSpec, expected_final_state, generate_changelog
    from forklift_spark.operators.merge import compact
    from forklift_spark.streaming.ingest import (
        create_entity_table,
        replay_batch,
        verify_state,
    )

    spec = ChangelogSpec(n_events=3_000, n_repos=8, paths_per_repo=15, seed=17)
    log = tmp_path / "log"
    generate_changelog(spec, str(log))
    segs = sorted(str(p) for p in log.glob("seg-*.parquet"))
    half = len(segs) // 2

    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    from forklift_spark.operators.merge import merge_into
    from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA

    df1 = spark.read.schema(CHANGELOG_SCHEMA).parquet(*segs[:half])
    merge_into(spark, table, df1, query_id="g", epoch=0, mode="mor")
    out = compact(spark, table, n_buckets=16)
    assert out["n_buckets"] == 16 and table.n_buckets() == 16

    df2 = spark.read.schema(CHANGELOG_SCHEMA).parquet(*segs[half:])
    merge_into(spark, table, df2, query_id="g", epoch=1)  # cow against new buckets
    exp = spark.createDataFrame(expected_final_state(spec))
    assert verify_state(spark, table, exp)["ok"]
    buckets = {f["bucket"] for f in table.current_metadata()["files"]}
    assert max(buckets) > 3  # keys actually spread into the new bucket space


def test_compact_writes_key_sorted_files(spark, log_dir, tmp_path):
    """O2 in the hot path: compacted base files are clustered by key within
    each bucket (partition-local sort, no extra exchange)."""
    import pyarrow.parquet as pq_

    table = create_entity_table(str(tmp_path / "tbl6"), n_buckets=4)
    run_ingest(spark, log_dir, table, str(tmp_path / "ckpt6"),
               query_id="sorted", max_files_per_trigger=2, mode="mor")
    compact(spark, table)
    files = [f for f in table.current_metadata()["files"]]
    assert files
    for f in files:
        pdf = pq_.read_table(
            os.path.join(table.root, f["path"]), columns=["repo", "path"]
        ).to_pandas()
        keys = list(zip(pdf["repo"], pdf["path"]))
        assert keys == sorted(keys), f["path"]


def test_tombstone_watermark_retention(spark, tmp_path):
    """drop_tombstones_below=W keeps the confluence contract exactly at the
    boundary: tombstones below the source's replay watermark are dropped
    (bounded tombstone population at 10^10 events), tombstones at/above it
    survive and still defeat late in-flight events."""
    from forklift_spark.operators.merge import compact, merge_into
    from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table

    def rows(tups):
        return [
            {"op": op, "seq": seq, "repo": "r", "path": p, "commit": None,
             "lang": "py", "content": c, "event_ts": None, "schema_ver": None}
            for op, seq, p, c in tups
        ]

    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=2)
    merge_into(spark, table, spark.createDataFrame(rows([
        ("I", 1, "old.py", "v1"),
        ("I", 2, "new.py", "v1"),
        ("I", 3, "live.py", "v1"),
    ]), CHANGELOG_SCHEMA), query_id="w", epoch=0, mode="mor")
    merge_into(spark, table, spark.createDataFrame(rows([
        ("D", 10, "old.py", None),   # tombstone below the watermark
        ("D", 100, "new.py", None),  # tombstone above it
    ]), CHANGELOG_SCHEMA), query_id="w", epoch=1, mode="mor")

    compact(spark, table, drop_tombstones_below=50)
    phys = {
        r.path: (r.seq, bool(r.deleted))
        for r in table.snapshot(spark, include_deleted=True).collect()
    }
    assert "old.py" not in phys            # sub-watermark tombstone dropped
    assert phys["new.py"] == (100, True)   # supra-watermark tombstone kept
    assert phys["live.py"] == (3, False)

    # a late event BELOW the kept tombstone's seq still loses (confluence);
    # one below the watermark for the dropped key is contract-forbidden —
    # the retention rule is exactly as strong as the source's promise
    merge_into(spark, table, spark.createDataFrame(rows([
        ("U", 60, "new.py", "late"),
    ]), CHANGELOG_SCHEMA), query_id="w", epoch=2, mode="mor")
    assert table.snapshot(spark).filter("path = 'new.py'").count() == 0
