"""Named refs (tags/branches) over the lakette chain: named time travel
via snapshot(ref=), vacuum pinning, tag immutability, branch
fast-forward discipline, and composition with WAP + views."""

import pytest

from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table


def _ev(op, seq, path, content="body"):
    return (op, seq, "r", path, f"c{seq}", "py", content, None, 1)


def _seed(spark, table, rows, epoch):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    return merge_into(spark, table, df, query_id="seed", epoch=epoch)


def test_tag_named_time_travel_and_vacuum_pin(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a", "v1")], 0)
    table.create_ref("trained-on", kind="tag")
    v_tag = table.ref_version("trained-on")
    for e in range(1, 6):  # advance the head well past the retention window
        _seed(spark, table, [_ev("U", 10 + e, "a", f"v{e + 1}")], e)

    # named time travel reads the pinned version
    got = table.snapshot(spark, ref="trained-on").select("content").collect()
    assert [r.content for r in got] == ["v1"]

    # aggressive retention: without the ref this version would be gone
    table.vacuum(keep_versions=1, grace_seconds=0.0)
    got = table.snapshot(spark, ref="trained-on").select("content").collect()
    assert [r.content for r in got] == ["v1"]

    # dropping the ref releases the pin — the next vacuum collects it
    table.drop_ref("trained-on")
    table.vacuum(keep_versions=1, grace_seconds=0.0)
    with pytest.raises(Exception):
        table.snapshot(spark, version=v_tag).collect()
    # head unaffected throughout
    assert [r.content for r in table.snapshot(spark).select("content").collect()] == ["v6"]


def test_tag_immutability_and_guards(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a")], 0)
    table.create_ref("rel", kind="tag")
    with pytest.raises(Exception):  # CAS: tag exists
        table.create_ref("rel", kind="tag")
    with pytest.raises(ValueError, match="never move"):
        table.fast_forward("rel")
    with pytest.raises(ValueError, match="unknown ref"):
        table.ref_version("nope")
    with pytest.raises(ValueError, match="invalid ref name"):
        table.create_ref("../escape")
    with pytest.raises(Exception):  # unreachable version fails fast
        table.create_ref("bad", version=999)
    with pytest.raises(ValueError, match="not both"):
        table.snapshot(spark, ref="rel", version=1)
    # replace=True is the explicit override
    _seed(spark, table, [_ev("U", 5, "a", "v2")], 1)
    table.create_ref("rel", kind="tag", replace=True)
    assert table.ref_version("rel") == table.current_metadata()["version"]


def test_branch_fast_forward(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a", "v1")], 0)
    table.create_ref("prod", kind="branch")
    v1 = table.ref_version("prod")
    _seed(spark, table, [_ev("U", 5, "a", "v2")], 1)
    # branch lags until promoted — the staged-read workflow
    assert [r.content for r in table.snapshot(spark, ref="prod").collect()] == ["v1"]
    table.fast_forward("prod")
    assert [r.content for r in table.snapshot(spark, ref="prod").collect()] == ["v2"]
    with pytest.raises(ValueError, match="behind the ref"):
        table.fast_forward("prod", version=v1)
    refs = table.list_refs()
    assert [(r["name"], r["kind"]) for r in refs] == [("prod", "branch")]


def test_refs_compose_with_wap_and_views(spark, tmp_path):
    """The promotion workflow: merge with publish=False, audit the staged
    state, publish, then fast-forward the consumer branch — consumers on
    the branch see nothing until the promotion lands."""
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a", "v1")], 0)
    table.create_ref("consumers", kind="branch")

    df = spark.createDataFrame([_ev("U", 9, "a", "v2")], CHANGELOG_SCHEMA)
    stats = merge_into(spark, table, df, query_id="wap", epoch=1, publish=False)
    assert stats.stage_id is not None
    # staged: neither head nor branch sees it
    assert [r.content for r in table.snapshot(spark, ref="consumers").collect()] == ["v1"]
    table.publish_staged(stats.stage_id)
    # published: head sees it, branch still lags
    assert [r.content for r in table.snapshot(spark).collect()] == ["v2"]
    assert [r.content for r in table.snapshot(spark, ref="consumers").collect()] == ["v1"]
    table.fast_forward("consumers")
    # ref= passes through the view surface too
    table.create_or_replace_view(spark, "consumers_view", ref="consumers")
    got = spark.sql("SELECT content FROM consumers_view").collect()
    assert [r.content for r in got] == ["v2"]
