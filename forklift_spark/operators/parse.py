"""C1 — parse_events: raw change-feed lines -> typed envelope, with
malformed records routed to a dead-letter frame instead of failing the
stream (SURVEY.md §2.10 C1).

All parsing is JVM-side (`from_json` + casts inside whole-stage codegen);
the corrupt-record column is Spark's PERMISSIVE-mode channel, so one pass
both parses and classifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: envelope the wire format must produce (matches streaming/ingest.py)
WIRE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("schema_ver", T.IntegerType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)

VALID_OPS = ("I", "U", "D")


def parse_events(
    raw: DataFrame, json_col: str = "value", carry_cols: list[str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """Parse a raw JSON-lines feed column into the typed envelope.

    Returns (events, dead_letters):
      events       — rows that parsed AND satisfy the envelope invariants
                     (op in {I,U,D}, seq/repo/path present), plus any
                     `carry_cols` passed through from the wire frame
                     (e.g. Kafka partition/offset for source lineage)
      dead_letters — original raw line + a reason column, for reprocessing

    Both come from ONE projection over the input (no double scan): the
    split is two filters over the same cached plan, and Catalyst prunes the
    unused columns on each side.
    """
    parsed = raw.withColumn(
        "_e",
        F.from_json(
            F.col(json_col),
            WIRE_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    ok_pred = (
        F.col("_e").isNotNull()
        & F.col("_e._corrupt").isNull()
        & F.col("_e.op").isNotNull()
        & F.col("_e.op").isin(*VALID_OPS)
        & F.col("_e.seq").isNotNull()
        & F.col("_e.repo").isNotNull()
        & F.col("_e.path").isNotNull()
    )
    events = parsed.filter(ok_pred).select(
        *(F.col(f"_e.{f.name}").alias(f.name) for f in WIRE_SCHEMA.fields if f.name != "_corrupt"),
        *(F.col(c) for c in (carry_cols or [])),
    )
    # NULL-safe negation: a NULL op makes `isin` (and hence ok_pred) SQL
    # NULL, and filter(~NULL) would drop the record from BOTH outputs —
    # coalesce pins undecided rows to the dead-letter side.
    reason = (
        F.when(F.col("_e").isNull() | F.col("_e._corrupt").isNotNull(), F.lit("malformed_json"))
        .when(
            F.col("_e.op").isNull() | ~F.col("_e.op").isin(*VALID_OPS), F.lit("bad_op")
        )
        .otherwise(F.lit("missing_key_fields"))
    )
    dead_letters = parsed.filter(~F.coalesce(ok_pred, F.lit(False))).select(
        F.col(json_col).alias("raw"), reason.alias("reason")
    )
    return events, dead_letters
