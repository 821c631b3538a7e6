"""Debezium envelope adapter (S6 family): map the de-facto-standard CDC
wire format — Debezium's ``{before, after, op, ts_ms, source}`` JSON
envelope, as emitted by the Postgres / MySQL / Mongo connectors — onto the
engine's generic merge batch (key cols + payload + ``op`` + ``seq``), so
ANY lakette table can be fed from an existing Debezium topic with no
custom parsing code.

Same split as sources/external.py's Kafka path: the socket read needs the
Kafka jar (environment-gated), but everything AFTER the reader is plain
column expressions — runnable offline, testable, and identical for batch
and streaming DataFrames (pure select/filter, no action).

Semantics:
  * op 'c' (create), 'r' (snapshot read) -> 'I'; 'u' -> 'U'; 'd' -> 'D'.
  * Row payload comes from ``after``, except deletes, which carry only
    ``before`` (Debezium emits after=null on 'd').
  * ``seq`` — the LWW total order — defaults to the source's own log
    position: Postgres ``source.lsn``, else MySQL ``source.pos``, else
    ``ts_ms`` (millisecond event time). Override ``seq_expr`` when the
    connector needs a composite (e.g. binlog file+pos encoded by the
    producer); whatever is chosen must be monotone PER KEY, which every
    single-partition-per-key Debezium topic guarantees.
  * Kafka *tombstone* messages (null value after a delete, kept for topic
    compaction) are dropped silently — they are not change events.
  * Anything else unparseable goes to the dead-letter side with a reason,
    mirroring parse_events (C1): malformed JSON, unknown op, a delete
    with no ``before``, an upsert with no ``after``.

All JVM-side (from_json + conditionals inside whole-stage codegen): no
Python UDF, so the adapter adds zero serialization cost to the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Debezium op -> engine op (merge_into's I/U/D envelope)
DEBEZIUM_OPS = {"c": "I", "r": "I", "u": "U", "d": "D"}


def debezium_envelope_schema(payload_schema: T.StructType) -> T.StructType:
    """The subset of the Debezium envelope the adapter reads. from_json
    ignores JSON fields not declared here, so connector-specific extras
    (transaction block, schema block from non-schemaless topics) pass
    through harmlessly."""
    return T.StructType(
        [
            T.StructField("before", payload_schema, True),
            T.StructField("after", payload_schema, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("lsn", T.LongType(), True),
                        T.StructField("file", T.StringType(), True),
                        T.StructField("pos", T.LongType(), True),
                        T.StructField("ts_ms", T.LongType(), True),
                    ]
                ),
                True,
            ),
        ]
    )


def debezium_to_batch(
    df: DataFrame,
    value_col: str,
    *,
    payload_schema: T.StructType,
    seq_expr: str = "coalesce(source.lsn, source.pos, ts_ms)",
    carry_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(events, dead_letters): parse ``value_col`` (JSON string) as a
    Debezium envelope and emit merge_into's batch shape — payload columns
    + ``op`` ('I'/'U'/'D') + ``seq`` (long). ``carry_cols`` ride along
    unchanged (Kafka partition/offset lineage, ingest bookkeeping).

    dead_letters carries the ORIGINAL value plus ``_reason`` so a producer
    fix can replay it, exactly like the C1 dead-letter contract."""
    carry = list(carry_cols or [])
    env = debezium_envelope_schema(payload_schema)

    # Kafka tombstones (null value) are compaction markers, not events
    present = df.filter(F.col(value_col).isNotNull())
    parsed = present.withColumn("_dbz", F.from_json(F.col(value_col), env))

    flat = parsed.select(
        F.col(value_col).alias("_raw"),
        *[F.col(c) for c in carry],
        F.col("_dbz").alias("_dbz"),
        F.col("_dbz.before").alias("_before"),
        F.col("_dbz.after").alias("_after"),
        F.col("_dbz.op").alias("_op"),
        F.col("_dbz.ts_ms").alias("ts_ms"),
        F.col("_dbz.source").alias("source"),
    )

    reason = (
        F.when(F.col("_dbz").isNull() | F.col("_op").isNull(), "malformed envelope")
        .when(~F.col("_op").isin(*DEBEZIUM_OPS), F.concat(F.lit("unknown op "), F.col("_op")))
        .when((F.col("_op") == "d") & F.col("_before").isNull(), "delete without before")
        .when((F.col("_op") != "d") & F.col("_after").isNull(), "upsert without after")
        .otherwise(F.lit(None))
    )
    tagged = flat.withColumn("_reason", reason)

    dead = tagged.filter(F.col("_reason").isNotNull()).select(
        F.col("_raw").alias(value_col), *carry, "_reason"
    )

    op_map = F.create_map(
        *[F.lit(x) for kv in DEBEZIUM_OPS.items() for x in kv]
    )
    ok = tagged.filter(F.col("_reason").isNull())
    row = F.when(F.col("_op") == "d", F.col("_before")).otherwise(F.col("_after"))
    events = ok.select(
        row.alias("_row"),
        op_map[F.col("_op")].alias("op"),
        F.expr(seq_expr).cast("long").alias("seq"),
        *[F.col(c) for c in carry],
    ).select("_row.*", "op", "seq", *carry)
    return events, dead
