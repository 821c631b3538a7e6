"""Debezium envelope adapter (sources/debezium.py): the standard CDC wire
format must land in ANY lakette table through the generic merge batch,
with dead-lettering for malformed envelopes and the connector's own log
position driving the LWW order."""

import json

import pytest
from pyspark.sql import types as T

from forklift_spark.lakette.table import LaketteTable
from forklift_spark.operators.merge import merge_into
from forklift_spark.sources.debezium import debezium_to_batch

PAYLOAD = T.StructType(
    [
        T.StructField("uid", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("bal", T.DoubleType(), True),
    ]
)


def _env(op, *, before=None, after=None, lsn=None, pos=None, file=None, ts_ms=None):
    src = {"connector": "postgresql", "txId": 77}  # extras must be ignored
    if lsn is not None:
        src["lsn"] = lsn
    if pos is not None:
        src["pos"] = pos
    if file is not None:
        src["file"] = file
    return json.dumps(
        {"before": before, "after": after, "op": op, "ts_ms": ts_ms, "source": src}
    )


def _values_df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "value string")


def _table(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("uid", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("bal", T.DoubleType(), True),
        ]
    )
    return LaketteTable.create(str(tmp_path / "dbz"), schema, ["uid"], n_buckets=2)


def test_debezium_end_to_end(spark, tmp_path):
    table = _table(spark, tmp_path)
    feed = [
        _env("c", after={"uid": 1, "name": "a", "bal": 1.5}, lsn=1),
        _env("u", after={"uid": 1, "name": "a2", "bal": 2.5}, lsn=3),
        _env("r", after={"uid": 2, "name": "b", "bal": 9.0}, lsn=2),
        _env("d", before={"uid": 2, "name": "b", "bal": 9.0}, lsn=5),
        _env("u", after=None, lsn=6),                 # upsert without after
        _env("d", before=None, lsn=7),                # delete without before
        _env("x", after={"uid": 9}, lsn=8),           # unknown op
        "definitely not json",                         # malformed
        None,                                          # Kafka tombstone: dropped
    ]
    events, dead = debezium_to_batch(
        _values_df(spark, feed), "value", payload_schema=PAYLOAD
    )
    reasons = sorted(r._reason for r in dead.collect())
    assert reasons == [
        "delete without before",
        "malformed envelope",
        "unknown op x",
        "upsert without after",
    ]
    got = {(r.op, r.seq, r.uid) for r in events.collect()}
    assert got == {("I", 1, 1), ("U", 3, 1), ("I", 2, 2), ("D", 5, 2)}

    merge_into(spark, table, events, query_id="dbz", epoch=0)
    state = {r.uid: (r.name, r.bal, r.seq) for r in table.snapshot(spark).collect()}
    assert state == {1: ("a2", 2.5, 3)}  # uid 2 deleted by lsn 5

    # a LATE event (lower lsn) replayed from the topic must lose LWW
    late, _ = debezium_to_batch(
        _values_df(spark, [_env("u", after={"uid": 1, "name": "stale", "bal": 0.0}, lsn=2)]),
        "value",
        payload_schema=PAYLOAD,
    )
    merge_into(spark, table, late, query_id="dbz", epoch=1)
    state = {r.uid: r.name for r in table.snapshot(spark).collect()}
    assert state == {1: "a2"}


def test_seq_falls_back_lsn_pos_ts(spark):
    feed = [
        _env("c", after={"uid": 1}, lsn=100, pos=5, ts_ms=1),   # lsn wins
        _env("c", after={"uid": 2}, pos=200, ts_ms=2),          # then pos
        _env("c", after={"uid": 3}, ts_ms=300),                 # then ts_ms
    ]
    events, dead = debezium_to_batch(
        _values_df(spark, feed), "value", payload_schema=PAYLOAD
    )
    assert dead.count() == 0
    assert {r.uid: r.seq for r in events.collect()} == {1: 100, 2: 200, 3: 300}


def test_carry_cols_ride_through_both_sides(spark):
    df = spark.createDataFrame(
        [
            (_env("c", after={"uid": 1}, lsn=1), 0, 11),
            ("broken", 0, 12),
        ],
        "value string, _kafka_partition int, _kafka_offset long",
    )
    events, dead = debezium_to_batch(
        df, "value", payload_schema=PAYLOAD,
        carry_cols=["_kafka_partition", "_kafka_offset"],
    )
    assert [(r.uid, r._kafka_offset) for r in events.collect()] == [(1, 11)]
    assert [(r._reason, r._kafka_offset) for r in dead.collect()] == [
        ("malformed envelope", 12)
    ]


def test_custom_seq_expr_composite_binlog(spark):
    """MySQL shape: a producer that needs file+pos encodes a composite;
    seq_expr accepts any SQL expression over the envelope columns."""
    feed = [
        _env("c", after={"uid": 1}, file="binlog.000002", pos=7),
        _env("u", after={"uid": 1}, file="binlog.000003", pos=1),
    ]
    events, _ = debezium_to_batch(
        _values_df(spark, feed),
        "value",
        payload_schema=PAYLOAD,
        seq_expr="cast(regexp_extract(source.file, '([0-9]+)$', 1) as long) "
                 "* 1000000000 + source.pos",
    )
    seqs = sorted(r.seq for r in events.collect())
    assert seqs == [2 * 10**9 + 7, 3 * 10**9 + 1]


def test_no_python_udf_in_adapter_plan(spark):
    from forklift_spark.plans.guards import assert_no_row_python_udf

    events, dead = debezium_to_batch(
        _values_df(spark, [_env("c", after={"uid": 1}, lsn=1)]),
        "value",
        payload_schema=PAYLOAD,
    )
    assert_no_row_python_udf(events)
    assert_no_row_python_udf(dead)
