"""S5 custom WAL source, T5 stateful op, X6 UDTF, and the physical-plan
guards (no row-UDF / pushdown / pruning / broadcast) — SURVEY.md §2.1, §2.9,
§2.11, §4."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from forklift_spark.changelog import ChangelogSpec, expected_final_state, generate_changelog
from forklift_spark.plans import (
    assert_broadcast_join,
    assert_no_row_python_udf,
    assert_pruned_columns,
    assert_pushed_filters,
    count_exchanges,
)
from forklift_spark.streaming.ingest import (
    CHANGELOG_SCHEMA,
    create_entity_table,
    run_ingest,
    verify_state,
)

SPEC = ChangelogSpec(n_events=3_000, n_repos=8, paths_per_repo=15, seed=13)


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wal_log")
    generate_changelog(SPEC, str(d))
    return str(d)


# ---------------------------------------------------------------- S5 source


def test_wal_source_replay_sha_exact(spark, log_dir, tmp_path):
    """Replay through the pure-Python offset-tracked source == batch oracle."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=8)
    report = run_ingest(
        spark,
        log_dir,
        table,
        str(tmp_path / "ckpt"),
        query_id="wal",
        max_files_per_trigger=1,
        source="wal_tail",
    )
    # rate limit respected: one segment per micro-batch
    n_segs = len([s for s in os.listdir(log_dir) if s.startswith("seg-")])
    assert len([e for e in report.epochs if e.batch_rows > 0]) == n_segs
    exp = spark.createDataFrame(expected_final_state(SPEC))
    assert verify_state(spark, table, exp)["ok"]


def test_wal_source_resume(spark, log_dir, tmp_path):
    """Feed half the segments, drain, deliver the rest, resume from the same
    checkpoint: converges with nothing lost or double-applied."""
    feed = tmp_path / "feed"
    feed.mkdir()
    segs = sorted(s for s in os.listdir(log_dir) if s.startswith("seg-"))
    for s in segs[: len(segs) // 2]:
        shutil.copy(os.path.join(log_dir, s), feed / s)
    table = create_entity_table(str(tmp_path / "tbl2"), n_buckets=8)
    ckpt = str(tmp_path / "ckpt2")
    run_ingest(spark, str(feed), table, ckpt, query_id="walres", source="wal_tail")
    for s in segs[len(segs) // 2 :]:
        shutil.copy(os.path.join(log_dir, s), feed / s)
    run_ingest(spark, str(feed), table, ckpt, query_id="walres", source="wal_tail")
    exp = spark.createDataFrame(expected_final_state(SPEC))
    assert verify_state(spark, table, exp)["ok"]


# ------------------------------------------------------------- T5 stateful


def test_stateful_running_max_seq(spark, log_dir, tmp_path):
    """Cross-batch per-key high-water mark: the last emitted max_seq per key
    equals the batch groupBy max."""
    from forklift_spark.streaming.stateful import running_max_seq

    src = (
        spark.readStream.schema(CHANGELOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{log_dir}/seg-*.parquet")
    )
    out = running_max_seq(src)
    q = (
        out.writeStream.format("memory")
        .queryName("hwm_feed")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.table("hwm_feed")
        .groupBy("repo", "path")
        .agg(F.max("max_seq").alias("max_seq"))
    )
    exp = (
        spark.read.schema(CHANGELOG_SCHEMA)
        .parquet(f"{log_dir}/seg-*.parquet")
        .groupBy("repo", "path")
        .agg(F.max("seq").alias("max_seq"))
    )
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


# ----------------------------------------------------------------- X6 UDTF


def test_udtf_unpack_commit(spark):
    from forklift_spark.functions.udtfs import UnpackCommit, pack_commit, register_udtfs

    payload = pack_commit([("a.py", "print(1)"), ("b/c.md", "# hi")])
    register_udtfs(spark)
    spark.createDataFrame([(1, payload)], "commit_id int, payload string").createOrReplaceTempView(
        "packed"
    )
    rows = spark.sql(
        "SELECT p.commit_id, u.path, u.content, u.file_index "
        "FROM packed p, LATERAL unpack_commit(p.payload) u ORDER BY u.file_index"
    ).collect()
    assert [(r.path, r.content, r.file_index) for r in rows] == [
        ("a.py", "print(1)", 0),
        ("b/c.md", "# hi", 1),
    ]


# ------------------------------------------------------------- plan guards


def test_no_row_python_udf_in_any_harness_query(spark, sf_tiny):
    """BASELINE.json:15: no per-row Python anywhere in the 50-query surface."""
    import __spark_entry__ as entry

    for name, fn in entry.queries().items():
        df = fn(spark, sf_tiny)
        assert_no_row_python_udf(df, name)


def test_no_row_python_udf_in_extra_queries(spark, sf_tiny):
    """Same guard over the locally-gated extra queries (range-pruned scan,
    replication, online rescale) — the r3 surface is held to the same bar."""
    from harness.queries import EXTRA_QUERIES

    assert EXTRA_QUERIES  # the extras exist
    for name, fn in EXTRA_QUERIES.items():
        df = fn(spark, sf_tiny)
        assert_no_row_python_udf(df, name)


def test_filter_pushdown_reaches_parquet(spark, sf_small):
    df = (
        spark.read.parquet(os.path.join(sf_small, "lineitem.parquet"))
        .filter(F.col("l_quantity") > 40)
        .select("l_orderkey", "l_quantity")
    )
    assert_pushed_filters(df, "l_quantity")


def test_column_pruning_skips_wide_content(spark, sf_small):
    """Metadata-style scans over documents must not read the wide content
    column (SURVEY.md §4 'critical for wide content column')."""
    df = (
        spark.read.parquet(os.path.join(sf_small, "documents.parquet"))
        .groupBy("lang")
        .count()
    )
    assert_pruned_columns(df, "content")


def test_broadcast_join_for_small_dim(spark, sf_small):
    import __spark_entry__ as entry

    df = entry.queries()["join_broadcast"](spark, sf_small)
    assert_broadcast_join(df)


def test_merge_shuffle_budget(spark, log_dir, tmp_path):
    """The MOR delta projection adds no extra exchange beyond the LWW
    dedupe aggregate and the bucket repartition (shuffle budget: 2)."""
    from forklift_spark.operators.merge import lww_dedupe

    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-*.parquet")
    deduped = lww_dedupe(df, ["repo", "path"], "seq")
    bucketed = deduped.withColumn(
        "_bucket", F.pmod(F.xxhash64("repo", "path"), F.lit(8)).cast("int")
    ).repartition(8, "_bucket")
    assert count_exchanges(bucketed) <= 2
