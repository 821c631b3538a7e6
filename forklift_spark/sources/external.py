"""S3/S6 — external connectors (JDBC extract, Kafka binlog tail).

This image ships no JDBC driver jars and no spark-sql-kafka package
(SURVEY.md §0 [V]), so these are *gated* builders: they construct the real
reader and fail with an actionable message offline. The call shapes are the
production ones — on a cluster with the jars present they work unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(RuntimeError):
    pass


def jdbc_scan(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Forklift-style RDBMS source extract. Parallel reads require a numeric
    partition column + bounds (one executor-side query per stride)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # no driver jar in this image
        raise ConnectorUnavailable(
            f"JDBC scan of {table} needs a driver jar on the classpath "
            f"(--jars/--packages); unavailable in this offline image: {e}"
        ) from e


def kafka_changefeed(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Binlog tail via Kafka (BASELINE.json:6 'file/Kafka source'). Returns
    the raw key/value stream; pipe through parse_events (C1) downstream."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    try:
        return reader.load()
    except Exception as e:  # spark-sql-kafka not on the classpath
        raise ConnectorUnavailable(
            "Kafka source needs org.apache.spark:spark-sql-kafka-0-10 on the "
            f"classpath (--packages); unavailable in this offline image: {e}"
        ) from e


def kafka_to_envelope(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Everything AFTER the Kafka reader, runnable offline: map the Kafka
    record shape (key/value binary, topic, partition, offset, timestamp)
    to the typed change-event envelope via parse_events (C1). The Kafka
    read position rides along as `_kafka_partition`/`_kafka_offset`
    (source-offset lineage for C7).

    Returns (events, dead_letters). This is the executable happy path of
    the S6 pipeline — only the socket read itself needs the jar; tests feed
    a fabricated Kafka-shaped frame through it (tests/test_round2.py)."""
    from pyspark.sql import functions as F

    from ..operators.parse import parse_events

    decoded = raw.select(
        F.col("value").cast("string").alias("value"),
        F.col("partition").cast("int").alias("_kafka_partition"),
        F.col("offset").cast("long").alias("_kafka_offset"),
    )
    events, dead = parse_events(
        decoded, "value", carry_cols=["_kafka_partition", "_kafka_offset"]
    )
    return events, dead
