"""C1 parse_events: typed envelope + dead-letter routing from one pass."""

import json

from pyspark.sql import functions as F

from forklift_spark.operators.parse import parse_events


def _raw(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


def test_parse_routes_good_and_bad(spark):
    good = {
        "op": "I", "seq": 7, "repo": "r1", "path": "a.py", "commit": "c",
        "lang": "py", "content": "x=1", "event_ts": "2024-01-01T00:00:00Z",
        "schema_ver": 1,
    }
    lines = [
        json.dumps(good),
        json.dumps({**good, "seq": 8, "op": "U"}),
        "{not json at all",                      # malformed_json
        json.dumps({**good, "op": "X"}),         # bad_op
        json.dumps({k: v for k, v in good.items() if k != "repo"}),  # missing key
    ]
    events, dead = parse_events(_raw(spark, lines))
    evs = events.collect()
    assert {(r.op, r.seq) for r in evs} == {("I", 7), ("U", 8)}
    assert all(r.event_ts is not None for r in evs)
    reasons = {r.reason for r in dead.collect()}
    assert reasons == {"malformed_json", "bad_op", "missing_key_fields"}
    assert dead.count() == 3


def test_parse_is_single_pass_jvm(spark):
    """Both outputs come from one projection — no Python on the row path."""
    from forklift_spark.plans.guards import assert_no_row_python_udf

    events, dead = parse_events(_raw(spark, ['{"op":"I"}']))
    assert_no_row_python_udf(events, "parse_events.events")
    assert_no_row_python_udf(dead, "parse_events.dead")


def test_parsed_events_feed_the_merge(spark, tmp_path):
    """Envelope from parse_events is directly mergeable (schema contract)."""
    from forklift_spark.operators.merge import merge_into
    from forklift_spark.streaming.ingest import create_entity_table

    lines = [
        json.dumps({"op": "I", "seq": 1, "repo": "r", "path": "p",
                    "commit": "c1", "lang": "py", "content": "v1",
                    "event_ts": "2024-01-01T00:00:00Z", "schema_ver": 1}),
        json.dumps({"op": "U", "seq": 2, "repo": "r", "path": "p",
                    "commit": "c2", "lang": "py", "content": "v2",
                    "event_ts": "2024-01-01T00:00:01Z", "schema_ver": 1}),
    ]
    events, _ = parse_events(_raw(spark, lines))
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=2)
    merge_into(spark, table, events, query_id="p", epoch=0)
    rows = table.snapshot(spark).collect()
    assert len(rows) == 1 and rows[0].content == "v2" and rows[0].seq == 2
