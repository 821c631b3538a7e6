"""Lake-to-lake incremental replication (operators/replicate.py): the
committed-version chain as a change feed, applied exactly-once downstream.

Covers: initial sync + incremental catch-up equals the source sha-exactly,
idempotence/resume across the crash windows, per-version mirroring,
schema evolution flowing through, and the vacuum-broken-chain resync
repair path (including out-of-band destination keys deleted)."""

import os

from pyspark.sql import functions as F

from forklift_spark.changelog import ChangelogSpec, expected_final_state, generate_changelog
from forklift_spark.lakette import LaketteTable
from forklift_spark.operators.merge import merge_into
from forklift_spark.operators.replicate import last_replicated_version, replicate
from forklift_spark.streaming.ingest import (
    CHANGELOG_SCHEMA,
    create_entity_table,
    verify_state,
)

SPEC = ChangelogSpec(n_events=3_000, n_repos=8, paths_per_repo=15, seed=21)


def _build_src(spark, tmp_path, *, epochs=3, mode="cow", name="src"):
    """Source table fed in `epochs` merge epochs from a generated log."""
    log_dir = tmp_path / f"log_{name}"
    generate_changelog(SPEC, str(log_dir))
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-*.parquet")
    table = create_entity_table(str(tmp_path / name), n_buckets=8)
    for i in range(epochs):
        part = df.filter(F.pmod(F.col("seq"), F.lit(epochs)) == i)
        merge_into(spark, table, part, query_id="feed", epoch=i, mode=mode)
    return table


def _state(spark, table):
    return {
        tuple(r)
        for r in table.snapshot(spark)
        .select("repo", "path", "seq", "content_sha")
        .collect()
    }


def test_replicate_initial_then_incremental(spark, tmp_path):
    src = _build_src(spark, tmp_path, epochs=1)
    dst_root = str(tmp_path / "dst")

    r1 = replicate(spark, src, dst_root, replication_id="r")
    assert r1.initial_sync and not r1.resync
    dst = LaketteTable(dst_root)
    assert _state(spark, dst) == _state(spark, src)

    # two more source epochs -> one incremental span
    log2 = tmp_path / "log2"
    generate_changelog(ChangelogSpec(n_events=800, n_repos=8, paths_per_repo=15, seed=22, seq_start=1_000_000), str(log2))
    df2 = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log2}/seg-*.parquet")
    for i, m in enumerate([df2.filter("seq % 2 = 0"), df2.filter("seq % 2 = 1")]):
        merge_into(spark, src, m, query_id="feed2", epoch=i)
    r2 = replicate(spark, src, dst_root, replication_id="r")
    assert not r2.initial_sync and not r2.resync
    assert len(r2.applied_epochs) == 1  # one span covering both versions
    assert r2.applied_epochs[0].applied_rows > 0
    assert _state(spark, dst) == _state(spark, src)

    # no new source commits -> pure no-op
    r3 = replicate(spark, src, dst_root, replication_id="r")
    assert r3.applied_epochs == []
    assert last_replicated_version(dst, "r") == src.current_metadata()["version"]


def test_replicate_sha_exact_vs_log_oracle(spark, tmp_path):
    """End-to-end: src fed in 3 epochs, replicated, and the REPLICA checked
    sha-exact against the pandas final-state oracle of the source log."""
    src = _build_src(spark, tmp_path, epochs=3)
    dst_root = str(tmp_path / "dst")
    replicate(spark, src, dst_root, replication_id="r")
    exp = spark.createDataFrame(expected_final_state(SPEC))
    res = verify_state(spark, LaketteTable(dst_root), exp)
    assert res["ok"], res


def test_replicate_every_version_mirror(spark, tmp_path):
    src = _build_src(spark, tmp_path, epochs=3)
    dst_root = str(tmp_path / "dst")
    # initial sync first (v1 is the empty created table, feed epochs are 2..4)
    replicate(spark, src, dst_root, replication_id="m")
    v0 = src.current_metadata()["version"]
    log2 = tmp_path / "logm"
    generate_changelog(ChangelogSpec(n_events=600, n_repos=8, paths_per_repo=15, seed=23, seq_start=2_000_000), str(log2))
    df2 = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log2}/seg-*.parquet")
    for i in range(2):
        merge_into(spark, src, df2.filter(F.pmod("seq", F.lit(2)) == i), query_id="f2", epoch=i)
    r = replicate(spark, src, dst_root, replication_id="m", every_version=True)
    assert len(r.applied_epochs) == src.current_metadata()["version"] - v0 == 2
    dst = LaketteTable(dst_root)
    assert _state(spark, dst) == _state(spark, src)
    # one marker per mirrored version
    markers = sorted(
        int(f[:-5]) for f in os.listdir(os.path.join(dst.epochs_dir, "m"))
    )
    assert markers[-2:] == [v0 + 1, v0 + 2]


def test_replicate_resume_after_marker_crash(spark, tmp_path):
    """Crash between the destination commit and its epoch marker: the next
    replicate() must see the version as applied (writer stamp) and neither
    duplicate nor skip anything."""
    src = _build_src(spark, tmp_path, epochs=2)
    dst_root = str(tmp_path / "dst")
    replicate(spark, src, dst_root, replication_id="r")
    dst = LaketteTable(dst_root)
    v_before = dst.current_metadata()["version"]

    # simulate the crash window: destination committed, marker lost
    top = src.current_metadata()["version"]
    os.remove(os.path.join(dst.epochs_dir, "r", f"{top}.json"))
    r = replicate(spark, src, dst_root, replication_id="r")
    assert r.applied_epochs == []  # recovered from the writer stamp
    assert dst.current_metadata()["version"] == v_before
    assert _state(spark, dst) == _state(spark, src)


def test_replicate_schema_evolution_flows_through(spark, tmp_path):
    src = _build_src(spark, tmp_path, epochs=1)
    dst_root = str(tmp_path / "dst")
    replicate(spark, src, dst_root, replication_id="r")

    evolved = spark.createDataFrame(
        [("U", 10_000_000, "repo0", "brand/new.txt", None, "py", "hello", 123)],
        "op string, seq long, repo string, path string, commit string, "
        "lang string, content string, size_bytes long",
    )
    merge_into(spark, src, evolved, query_id="evo", epoch=0)
    replicate(spark, src, dst_root, replication_id="r")

    dst = LaketteTable(dst_root)
    assert "size_bytes" in [f.name for f in dst.user_schema().fields]
    row = (
        dst.snapshot(spark)
        .filter("path = 'brand/new.txt'")
        .select("size_bytes", "content_sha")
        .collect()[0]
    )
    assert row["size_bytes"] == 123
    assert _state(spark, dst) == _state(spark, src)


def test_replicate_resync_after_vacuum(spark, tmp_path):
    """Source vacuumed past the replica's offset -> resync repairs EVERY
    divergence mode: an out-of-band key the source never had, an existing
    key overwritten at a HIGHER seq than the source's (plain LWW could
    never win that back — the repair epoch applies with overwrite), and a
    rogue high-seq tombstone of a live source key."""
    src = _build_src(spark, tmp_path, epochs=1)
    dst_root = str(tmp_path / "dst")
    replicate(spark, src, dst_root, replication_id="r")
    dst = LaketteTable(dst_root)

    # out-of-band writes to the replica (operator error):
    victims = (
        dst.snapshot(spark).select("repo", "path").orderBy("repo", "path").take(2)
    )
    rogue = spark.createDataFrame(
        [
            ("I", 999_999_999, "rogue", "x.txt", None, "py", "oops"),  # extra key
            ("U", 999_999_998, victims[0].repo, victims[0].path, None, "py",
             "rogue-overwrite"),  # higher-seq payload divergence
            ("D", 999_999_997, victims[1].repo, victims[1].path, None, None,
             None),  # higher-seq rogue tombstone
        ],
        "op string, seq long, repo string, path string, commit string, "
        "lang string, content string",
    )
    merge_into(spark, dst, rogue, query_id="rogue", epoch=0)

    log2 = tmp_path / "logv"
    generate_changelog(ChangelogSpec(n_events=900, n_repos=8, paths_per_repo=15, seed=24, seq_start=3_000_000), str(log2))
    df2 = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log2}/seg-*.parquet")
    for i in range(3):
        merge_into(spark, src, df2.filter(F.pmod("seq", F.lit(3)) == i), query_id="f3", epoch=i)
    src.vacuum(keep_versions=1, grace_seconds=0)

    r = replicate(spark, src, dst_root, replication_id="r")
    assert r.resync
    assert _state(spark, dst) == _state(spark, src)
    assert dst.snapshot(spark).filter("repo = 'rogue'").count() == 0


def test_replicate_mor_destination(spark, tmp_path):
    """Replication through the merge-on-read fast path converges too."""
    src = _build_src(spark, tmp_path, epochs=2)
    dst_root = str(tmp_path / "dst")
    replicate(spark, src, dst_root, replication_id="r", mode="mor")
    assert _state(spark, LaketteTable(dst_root)) == _state(spark, src)


def test_merge_empty_batch_is_a_clean_noop_epoch(spark, tmp_path):
    """A zero-event epoch (quiet stream / no-change replication span) must
    commit cleanly: marker written, snapshot unchanged, stats all zero —
    not die in Observation.get when AQE collapses the empty plan."""
    src = _build_src(spark, tmp_path, epochs=1)
    before = _state(spark, src)
    empty = spark.createDataFrame([], CHANGELOG_SCHEMA)
    for mode, epoch in (("cow", 100), ("mor", 101)):
        stats = merge_into(spark, src, empty, query_id="quiet", epoch=epoch, mode=mode)
        assert (stats.batch_rows, stats.applied_rows) == (0, 0)
        assert src.epoch_committed("quiet", epoch)
    assert _state(spark, src) == before


def test_every_version_across_schema_evolution(spark, tmp_path):
    """Per-version mirroring across a source schema evolution: the span
    BEFORE the evolving commit is emitted under the pre-evolution schema
    (payload comes from the span's own columns, never the live schema)."""
    src = _build_src(spark, tmp_path, epochs=1)
    dst_root = str(tmp_path / "dst")
    replicate(spark, src, dst_root, replication_id="r")

    plain = spark.createDataFrame(
        [("U", 5_000_000, "repo0", "plain.txt", None, "py", "pre-evo")],
        "op string, seq long, repo string, path string, commit string, "
        "lang string, content string",
    )
    merge_into(spark, src, plain, query_id="pe", epoch=0)
    evolved = spark.createDataFrame(
        [("U", 6_000_000, "repo0", "evolved.txt", None, "py", "post-evo", 7)],
        "op string, seq long, repo string, path string, commit string, "
        "lang string, content string, size_bytes long",
    )
    merge_into(spark, src, evolved, query_id="pe", epoch=1)

    r = replicate(spark, src, dst_root, replication_id="r", every_version=True)
    assert len(r.applied_epochs) == 2
    dst = LaketteTable(dst_root)
    assert "size_bytes" in [f.name for f in dst.user_schema().fields]
    assert _state(spark, dst) == _state(spark, src)


def test_twin_replicators_race_gracefully(spark, tmp_path):
    """A double-fired mirror (two replicate() calls racing on the same
    span) must not surface CommitConflictError: the loser observes the
    twin's marker and treats the span as done. Final state exact either
    way, applied exactly once."""
    import threading

    src = _build_src(spark, tmp_path, epochs=1)
    dst_root = str(tmp_path / "dst")
    replicate(spark, src, dst_root, replication_id="tw")
    log2 = tmp_path / "logtw"
    generate_changelog(
        ChangelogSpec(n_events=700, n_repos=8, paths_per_repo=15, seed=25,
                      seq_start=4_000_000),
        str(log2),
    )
    df2 = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log2}/seg-*.parquet")
    merge_into(spark, src, df2, query_id="tw2", epoch=0)

    errs = []

    def _mirror():
        try:
            replicate(spark, src, dst_root, replication_id="tw")
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1, t2 = threading.Thread(target=_mirror), threading.Thread(target=_mirror)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    dst = LaketteTable(dst_root)
    assert _state(spark, dst) == _state(spark, src)
    assert last_replicated_version(dst, "tw") == src.current_metadata()["version"]


def test_replication_chain_bronze_silver_gold(spark, tmp_path):
    """A -> B -> C: a replica is itself a valid replication source (its
    version chain is a change feed like any other). Two rounds of source
    writes propagate through the chain; every hop stays sha-exact."""
    a = _build_src(spark, tmp_path, epochs=2, name="a")
    b_root, c_root = str(tmp_path / "b"), str(tmp_path / "c")

    replicate(spark, a, b_root, replication_id="ab")
    replicate(spark, LaketteTable(b_root), c_root, replication_id="bc")
    assert _state(spark, LaketteTable(c_root)) == _state(spark, a)

    log2 = tmp_path / "log_chain"
    generate_changelog(
        ChangelogSpec(n_events=500, n_repos=8, paths_per_repo=15, seed=26,
                      seq_start=5_000_000),
        str(log2),
    )
    df2 = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log2}/seg-*.parquet")
    merge_into(spark, a, df2, query_id="chain", epoch=0)
    replicate(spark, a, b_root, replication_id="ab")
    replicate(spark, LaketteTable(b_root), c_root, replication_id="bc")
    assert _state(spark, LaketteTable(b_root)) == _state(spark, a)
    assert _state(spark, LaketteTable(c_root)) == _state(spark, a)
