"""T1/T2/T3 streaming metrics taps + S3/S6 gated connectors."""

import pytest

from forklift_spark.changelog import ChangelogSpec, generate_changelog
from forklift_spark.sources.external import ConnectorUnavailable, jdbc_scan, kafka_changefeed
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA
from forklift_spark.streaming.metrics import session_activity, windowed_event_counts

SPEC = ChangelogSpec(n_events=2_000, n_repos=5, paths_per_repo=10, seed=21)


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mlog")
    generate_changelog(SPEC, str(d))
    return str(d)


def test_windowed_counts_stream_equals_batch(spark, log_dir, tmp_path):
    """The watermarked windowed agg over the full stream equals the same agg
    run as a batch query (all events within watermark tolerance here)."""
    batch = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-*.parquet")
    expected = windowed_event_counts(batch, window="1 minute")

    src = (
        spark.readStream.schema(CHANGELOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{log_dir}/seg-*.parquet")
    )
    # watermark must exceed the feed's disorder bound (64 positions ~ 6.4 s)
    # but stay far below the event-time span (200 s) so windows can close
    # and be emitted in append mode before the backlog drains
    q = (
        windowed_event_counts(src, window="1 minute", watermark="30 seconds")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("win_counts")
    # append mode only emits *closed* windows (watermark passed); every
    # emitted row must match the batch result exactly
    assert got.count() > 0
    assert got.exceptAll(expected).count() == 0


def test_session_activity_shape(spark, log_dir):
    batch = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-*.parquet")
    out = session_activity(batch, gap="5 seconds")
    rows = out.collect()
    assert rows and all(r.session_end >= r.session_start and r.events > 0 for r in rows)


def test_jdbc_scan_gated(spark):
    with pytest.raises(ConnectorUnavailable, match="driver jar"):
        jdbc_scan(spark, "jdbc:postgresql://db:5432/x", "events")


def test_kafka_changefeed_gated(spark):
    with pytest.raises(ConnectorUnavailable, match="spark-sql-kafka"):
        kafka_changefeed(spark, "broker:9092", "changes")
