"""Time travel by wall-clock timestamp: snapshot(as_of=) resolves the
newest commit stamped at or before the instant (the Iceberg `FOR TIMESTAMP
AS OF` analogue over the committed_at stamps every commit records),
composes with views, and fails loudly on unstamped / vacuumed / predating
targets."""

import json
import os
import time
from datetime import datetime, timezone

import pytest

from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table


def _ev(op, seq, path, content="body"):
    return (op, seq, "r", path, f"c{seq}", "py", content, None, 1)


def _seed(spark, table, rows, epoch):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    return merge_into(spark, table, df, query_id="seed", epoch=epoch)


def test_as_of_resolves_each_era(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a", "v1")], 0)
    time.sleep(0.02)
    t_after_v1 = time.time()
    time.sleep(0.02)
    _seed(spark, table, [_ev("U", 2, "a", "v2")], 1)
    time.sleep(0.02)
    t_after_v2 = time.time()
    time.sleep(0.02)
    _seed(spark, table, [_ev("U", 3, "a", "v3")], 2)

    def content_at(**kw):
        return [r.content for r in table.snapshot(spark, **kw).collect()]

    assert content_at(as_of=t_after_v1) == ["v1"]
    assert content_at(as_of=t_after_v2) == ["v2"]
    assert content_at(as_of=time.time()) == ["v3"]

    # stamp <= ts is inclusive: a commit's own stamp addresses that commit
    hist = {h["version"]: h["committed_at"] for h in table.history()}
    v_mid = table.version_as_of(t_after_v1)
    assert content_at(as_of=hist[v_mid]) == ["v1"]

    # datetime input (aware and naive-as-UTC) matches epoch-seconds input
    aware = datetime.fromtimestamp(t_after_v2, tz=timezone.utc)
    assert table.version_as_of(aware) == table.version_as_of(t_after_v2)
    naive = datetime.fromtimestamp(t_after_v2, tz=timezone.utc).replace(tzinfo=None)
    assert table.version_as_of(naive) == table.version_as_of(t_after_v2)

    # view pass-through: registration pins the as_of-resolved plan
    table.create_or_replace_view(spark, "as_of_view", as_of=t_after_v2)
    got = spark.sql("SELECT content FROM as_of_view").collect()
    assert [r.content for r in got] == ["v2"]


def test_as_of_guards(spark, tmp_path):
    t_before = time.time()
    time.sleep(0.02)
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a", "v1")], 0)
    table.create_ref("rel", kind="tag")

    # the creation commit itself is stamped: an as_of between creation and
    # the first data commit reads the EMPTY initial table, not an error
    v_init = table.history()[-1]
    assert table.version_as_of(v_init["committed_at"]) == v_init["version"]
    assert table.snapshot(spark, as_of=v_init["committed_at"]).count() == 0

    with pytest.raises(ValueError, match="predates the oldest"):
        table.version_as_of(t_before)
    with pytest.raises(ValueError, match="at most one of"):
        table.snapshot(spark, as_of=time.time(), version=0)
    with pytest.raises(ValueError, match="at most one of"):
        table.snapshot(spark, as_of=time.time(), ref="rel")
    # head still reads fine by time
    assert [r.content for r in table.snapshot(spark, as_of=time.time()).collect()] == ["v1"]


def test_as_of_prestamp_metadata_is_loud(spark, tmp_path):
    """Versions written before the stamp landed (committed_at absent) are
    addressable by version=, never silently by time: the walk raises the
    moment it crosses into the pre-stamp era."""
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a", "v1")], 0)
    time.sleep(0.02)
    t_after_v1 = time.time()
    time.sleep(0.02)
    _seed(spark, table, [_ev("U", 2, "a", "v2")], 1)

    # simulate legacy metadata: strip the stamp from the OLDER version file
    v_old = table.version_as_of(t_after_v1)
    vpath = os.path.join(table.meta_dir, f"v{v_old}.json")
    meta = json.load(open(vpath))
    meta.pop("committed_at", None)
    with open(vpath, "w") as f:
        json.dump(meta, f)

    # head (stamped) resolves; anything that must walk into the unstamped
    # version raises with the version= escape hatch named
    assert [r.content for r in table.snapshot(spark, as_of=time.time()).collect()] == ["v2"]
    with pytest.raises(ValueError, match="no committed_at stamp"):
        table.version_as_of(t_after_v1)


def test_restore_as_of_rolls_back_by_wall_clock(spark, tmp_path):
    """restore(as_of=) = 'roll back to how the table was at <instant>':
    the target resolves through version_as_of and the restore lands as a
    NEW commit (history intact, ordinary CAS)."""
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a", "good")], 0)
    time.sleep(0.02)
    t_good = time.time()
    time.sleep(0.02)
    _seed(spark, table, [_ev("U", 2, "a", "bad")], 1)

    v_before = table.history()[0]["version"]
    table.restore(as_of=t_good)
    assert [r.content for r in table.snapshot(spark).collect()] == ["good"]
    assert table.history()[0]["version"] == v_before + 1  # new commit, no rewind
    with pytest.raises(ValueError, match="exactly one"):
        table.restore(0, as_of=t_good)


def test_vacuum_keep_since_wall_clock_retention(spark, tmp_path):
    """vacuum(keep_since=) is expire_snapshots(older_than=): every commit
    stamped inside the window survives regardless of keep_versions, so
    as_of time travel keeps working across the whole retained window."""
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    stamps = []
    for e in range(4):
        _seed(spark, table, [_ev("I" if e == 0 else "U", e + 1, "a", f"v{e + 1}")], e)
        stamps.append(table.history()[0]["committed_at"])
        time.sleep(0.02)

    window_start = (stamps[1] + stamps[2]) / 2  # keeps commits 3 and 4
    rep = table.vacuum(keep_versions=1, grace_seconds=0.0, keep_since=window_start)
    assert rep["kept_versions"] == 2

    # inside the window: time travel still works beyond keep_versions=1
    t_at_v3 = stamps[2]
    assert [r.content for r in table.snapshot(spark, as_of=t_at_v3).collect()] == ["v3"]
    assert [r.content for r in table.snapshot(spark).collect()] == ["v4"]
    # outside the window: pruned, loud
    with pytest.raises(ValueError, match="pruned by vacuum|no committed_at"):
        table.version_as_of(stamps[0])


def test_ingest_loop_wall_clock_retention(spark, tmp_path):
    """run_ingest(vacuum_keep_hours=H): the in-loop vacuum keeps every
    commit of the last H hours even at vacuum_keep_versions=1, so
    snapshot(as_of=) time travel works across the whole streamed window."""
    from forklift_spark.changelog import ChangelogSpec, generate_changelog
    from forklift_spark.streaming.ingest import run_ingest

    spec = ChangelogSpec(
        n_events=600, n_repos=4, paths_per_repo=10, seed=7, segment_rows=100
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(spec, log_dir)
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    report = run_ingest(
        spark, log_dir, table, str(tmp_path / "ckpt"),
        query_id="wret", max_files_per_trigger=1,
        vacuum_every=2, vacuum_keep_versions=1,
        vacuum_grace_seconds=0.0,  # sole writer
        vacuum_keep_hours=1.0,     # the whole run is inside the window
    )
    applied = sum(1 for e in report.epochs if not e.skipped)
    assert applied >= 5
    hist = table.history()
    # nothing inside the wall-clock window was pruned, despite keep_versions=1
    assert len(hist) >= applied
    # time travel to the very first stamped commit still resolves and reads
    t_first = hist[-1]["committed_at"]
    assert table.version_as_of(t_first) == hist[-1]["version"]
    table.snapshot(spark, as_of=t_first).count()  # files intact too


def test_as_of_resolution_property(spark, tmp_path):
    """Property: for ANY timestamp inside the stamped range,
    version_as_of(ts) equals the independently-computed
    max(version whose stamp <= ts) — including exact stamp boundaries,
    midpoints, and timestamps beyond the head. Pure driver-side metadata,
    so the sweep costs no Spark jobs."""
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    for e in range(6):
        _seed(spark, table, [_ev("I" if e == 0 else "U", e + 1, "a", f"v{e}")], e)
        time.sleep(0.015)
    hist = {h["version"]: h["committed_at"] for h in table.history()}
    stamps = sorted(hist.items())  # (version, stamp) ascending

    def oracle(ts):
        ok = [v for v, s in stamps if s <= ts]
        return max(ok) if ok else None

    probes = []
    for v, s in stamps:
        probes += [s, s + 1e-4, s - 1e-4]  # boundary, just-after, just-before
    for (_, a), (_, b) in zip(stamps, stamps[1:]):
        probes.append((a + b) / 2)  # midpoints
    probes.append(stamps[-1][1] + 3600)  # far future -> head

    for ts in probes:
        want = oracle(ts)
        if want is None:
            with pytest.raises(ValueError, match="predates"):
                table.version_as_of(ts)
        else:
            assert table.version_as_of(ts) == want, ts


def test_as_of_vacuum_expired_is_loud(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a", "v1")], 0)
    time.sleep(0.02)
    t_old = time.time()
    time.sleep(0.02)
    for e in range(1, 4):
        _seed(spark, table, [_ev("U", 10 + e, "a", f"v{e + 1}")], e)
    table.vacuum(keep_versions=1, grace_seconds=0.0)
    with pytest.raises(ValueError, match="pruned by vacuum|no committed_at"):
        table.version_as_of(t_old)
    # the surviving head still resolves by time
    assert table.version_as_of(time.time()) == table.history()[0]["version"]
