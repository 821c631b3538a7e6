"""Routed fan-out (streaming/routes.py): one change feed, N destination
tables, each with its own predicate + column-mapping spec, exactly-once
per route. Key-stable predicates (repo) commute with LWW, so each
destination must equal the pandas oracle filtered the same way."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.changelog import ChangelogSpec, expected_final_state, generate_changelog
from forklift_spark.lakette import LaketteTable
from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import (
    CHANGELOG_SCHEMA,
    create_entity_table,
    verify_state,
)
from forklift_spark.streaming.routes import Route, merge_routes, run_ingest_routed

SPEC = ChangelogSpec(n_events=3_000, n_repos=10, paths_per_repo=12, seed=41)
SPLIT = "repo < 'repo_0005'"  # key-stable: a key's events all share its repo


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("routelog")
    generate_changelog(SPEC, str(d))
    return str(d)


def _routes(tmp_path):
    lo = create_entity_table(str(tmp_path / "lo"), n_buckets=4)
    hi = create_entity_table(str(tmp_path / "hi"), n_buckets=4)
    return {
        "lo": Route(table=lo, predicate=SPLIT),
        "hi": Route(table=hi, predicate=f"NOT ({SPLIT})", mode="cow"),
    }


def _verify_split(spark, routes):
    exp = expected_final_state(SPEC)
    lo_exp = exp[exp["repo"] < "repo_0005"]
    hi_exp = exp[~(exp["repo"] < "repo_0005")]
    assert len(lo_exp) and len(hi_exp)  # the split actually splits
    r1 = verify_state(spark, routes["lo"].table, spark.createDataFrame(lo_exp))
    r2 = verify_state(spark, routes["hi"].table, spark.createDataFrame(hi_exp))
    assert r1["ok"] and r2["ok"], (r1, r2)


def test_batch_fanout_splits_exactly(spark, tmp_path, log_dir):
    routes = _routes(tmp_path)
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-*.parquet")
    stats = merge_routes(spark, routes, df, epoch=0)
    assert stats["lo"].applied_rows > 0 and stats["hi"].applied_rows > 0
    _verify_split(spark, routes)


def test_streaming_fanout_exactly_once(spark, tmp_path, log_dir):
    routes = _routes(tmp_path)
    report = run_ingest_routed(
        spark, log_dir, routes, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, compact_every=2,
    )
    assert len(report.epochs) >= 2  # really rate-limited into micro-batches
    _verify_split(spark, routes)
    # per-route epoch markers exist under the route-qualified query id
    import os

    assert os.path.isdir(os.path.join(routes["lo"].table.epochs_dir, "routed:lo"))
    assert os.path.isdir(os.path.join(routes["hi"].table.epochs_dir, "routed:hi"))


def test_crash_between_routes_replays_without_duplicates(spark, tmp_path, log_dir):
    """Epoch replay after a crash that landed route A but not route B:
    A must skip on its marker, B must apply — both end exact."""
    routes = _routes(tmp_path)
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-*.parquet")
    # simulate the partial epoch: route lo already committed epoch 0
    merge_into(spark, routes["lo"].table, df.filter(SPLIT),
               query_id="route:lo", epoch=0)
    v_lo = routes["lo"].table.current_metadata()["version"]

    stats = merge_routes(spark, routes, df, epoch=0)
    assert stats["lo"].skipped  # marker-gated, no duplicate application
    assert not stats["hi"].skipped and stats["hi"].applied_rows > 0
    assert routes["lo"].table.current_metadata()["version"] == v_lo
    _verify_split(spark, routes)


def test_mapping_route_reshapes_envelope(spark, tmp_path, log_dir):
    """A route's mapping spec is the forklift-style per-destination column
    spec: rename + computed column in one codegen projection, envelope
    preserved, merged exactly."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("content_chars", T.LongType()),
    ])
    dst = LaketteTable.create(str(tmp_path / "mapped"), schema, ["repo", "path"], n_buckets=4)
    routes = {
        "mapped": Route(
            table=dst,
            predicate=SPLIT,
            mapping={
                "op": "op",
                "seq": "seq",
                "repo": "repo",
                "path": "path",
                "content": "content",
                "content_chars": F.length("content").cast("long"),
            },
            mode="cow",
        )
    }
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-*.parquet")
    merge_routes(spark, routes, df, epoch=0)

    exp = expected_final_state(SPEC)
    exp = exp[exp["repo"] < "repo_0005"]
    assert verify_state(spark, dst, spark.createDataFrame(exp))["ok"]
    row = dst.snapshot(spark).select("content", "content_chars").first()
    assert row.content_chars == len(row.content)


def test_mapping_missing_envelope_rejected(spark, tmp_path):
    dst = create_entity_table(str(tmp_path / "bad"), n_buckets=2)
    routes = {"bad": Route(table=dst, mapping={"repo": "repo", "content": "content"})}
    with pytest.raises(ValueError, match="missing.*op.*seq|missing.*'op'"):
        merge_routes(
            spark, routes,
            spark.createDataFrame([], CHANGELOG_SCHEMA),
            epoch=0,
        )


def test_atomic_fanout_converges_and_records_txns(spark, tmp_path, log_dir):
    """atomic=True: the streaming fan-out lands every epoch as one
    multi-table transaction — destinations converge identically to the
    per-route mode, with a 'done' record per applied epoch."""
    import json
    import os

    routes = _routes(tmp_path)
    report = run_ingest_routed(
        spark, log_dir, routes, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, atomic=True,
    )
    assert len(report.epochs) >= 2
    _verify_split(spark, routes)
    txn_dir = str(tmp_path / "ckpt" / "txns")
    recs = [
        json.loads(open(os.path.join(txn_dir, f)).read())
        for f in sorted(os.listdir(txn_dir))
        if f.endswith(".json")
    ]
    applied = sum(
        1 for e in report.epochs if any(not s.skipped for s in e.values())
    )
    assert len(recs) == applied
    assert all(r["state"] == "done" for r in recs)
    # published versions reported back onto the per-route stats
    last = report.epochs[-1]
    assert all(s.version is not None for s in last.values() if not s.skipped)


def test_atomic_fanout_crash_replay_heals_torn_epoch(spark, tmp_path, log_dir):
    """Die after the commit point with only destination 'lo' published;
    the REPLAYED epoch must roll 'hi' forward through recovery before the
    epoch gate, then land subsequent epochs normally — no torn state, no
    double-apply."""
    import json
    import os

    from forklift_spark.lakette.table import LaketteTable as _LT

    routes = _routes(tmp_path)
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-*.parquet")
    txn_dir = str(tmp_path / "txns")

    class Boom(BaseException):
        pass

    real = _LT.publish_staged

    def dying(self, stage_id):
        if self.root == routes["hi"].table.root:
            raise Boom("simulated death between member publishes")
        return real(self, stage_id)

    _LT.publish_staged = dying
    try:
        with pytest.raises(BaseException, match="simulated death"):
            merge_routes(spark, routes, df, epoch=0, atomic=True,
                         txn_dir=txn_dir)
    finally:
        _LT.publish_staged = real

    # torn mid-crash: lo published, hi still staged+invisible
    assert routes["lo"].table.snapshot(spark).count() > 0
    assert routes["hi"].table.snapshot(spark).count() == 0
    rec = [json.loads(open(os.path.join(txn_dir, f)).read())
           for f in os.listdir(txn_dir) if f.endswith(".json")]
    assert len(rec) == 1 and rec[0]["state"] == "committed"

    # the replay: recovery rolls hi forward, both gates then skip
    stats = merge_routes(spark, routes, df, epoch=0, atomic=True,
                         txn_dir=txn_dir)
    assert all(s.skipped for s in stats.values())
    _verify_split(spark, routes)
    rec = [json.loads(open(os.path.join(txn_dir, f)).read())
           for f in os.listdir(txn_dir) if f.endswith(".json")]
    assert rec[0]["state"] == "done"


def test_atomic_fanout_rejects_shared_destination(spark, tmp_path):
    t = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    routes = {"a": Route(table=t), "b": Route(table=t)}
    df = spark.createDataFrame([], CHANGELOG_SCHEMA)
    with pytest.raises(ValueError, match="share destination"):
        merge_routes(spark, routes, df, epoch=0, atomic=True,
                     txn_dir=str(tmp_path / "txns"))
