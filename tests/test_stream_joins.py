"""Stream-stream interval join (streaming/joins.py): stream==batch
equivalence for inner and leftOuter, watermark-bounded state semantics,
and the guards."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.changelog import ChangelogSpec, generate_changelog
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA
from forklift_spark.streaming.joins import stream_interval_join

SPEC = ChangelogSpec(n_events=2_000, n_repos=5, paths_per_repo=10, seed=33)


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sjlog")
    generate_changelog(SPEC, str(d))
    return str(d)


def _sides(df):
    """Impressions = inserts; conversions = updates on the same key."""
    lhs = df.filter(F.col("op") == "I").select("repo", "path", "seq", "event_ts")
    rhs = df.filter(F.col("op") == "U").select("repo", "path", "seq", "event_ts")
    return lhs, rhs


def _run_stream(spark, log_dir, tmp_path, name, how):
    src = (
        spark.readStream.schema(CHANGELOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{log_dir}/seg-*.parquet")
    )
    lhs, rhs = _sides(src)
    out = stream_interval_join(
        lhs, rhs, ["repo", "path"],
        within="30 seconds",
        left_watermark="30 seconds", right_watermark="30 seconds",
        how=how,
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_inner_stream_equals_batch(spark, log_dir, tmp_path):
    batch = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-*.parquet")
    lhs, rhs = _sides(batch)
    expected = stream_interval_join(
        lhs, rhs, ["repo", "path"], within="30 seconds", how="inner"
    )
    got = _run_stream(spark, log_dir, tmp_path, "sj_inner", "inner")
    assert got.count() > 0
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    # every correlation respects the time bound
    bad = got.filter(
        (F.col("r_event_ts") < F.col("event_ts"))
        | (F.col("r_event_ts") > F.col("event_ts") + F.expr("INTERVAL 30 seconds"))
    )
    assert bad.count() == 0


def test_left_outer_emits_unmatched_after_watermark(spark, log_dir, tmp_path):
    """leftOuter: matched rows equal the inner join; unmatched left rows
    surface with NULL right payload once the watermark closes them out.
    (Stream emits closed rows only — every emitted row must appear in the
    batch leftOuter result.)"""
    batch = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-*.parquet")
    lhs, rhs = _sides(batch)
    expected = stream_interval_join(
        lhs, rhs, ["repo", "path"], within="30 seconds", how="leftOuter"
    )
    got = _run_stream(spark, log_dir, tmp_path, "sj_outer", "leftOuter")
    assert got.count() > 0
    assert got.exceptAll(expected).count() == 0
    # unmatched rows actually appear (keys with inserts but no update
    # within the bound exist in this feed)
    assert got.filter(F.col("r_seq").isNull()).count() > 0


def test_guards(spark, log_dir):
    batch = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-*.parquet")
    lhs, rhs = _sides(batch)
    with pytest.raises(ValueError, match="inner/leftOuter"):
        stream_interval_join(lhs, rhs, ["repo"], how="fullOuter")
    with pytest.raises(ValueError, match="key the correlation"):
        stream_interval_join(lhs, rhs, [])
