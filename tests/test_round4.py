"""Round-4 hardening (VERDICT r3 next-round #1,6,9 + ADVICE r3):

  * bucket-scoped metadata loading — the READ path (pruned snapshot, merge
    epoch, compaction planning) opens only the touched/requested buckets'
    manifest shards, mirroring the commit path's O(touched) guarantee
    (VERDICT r3 #1, the top item)
  * per-file max(seq) stats + snapshot(min_seq=...) — incremental/CDC
    readers skip files with no new data (VERDICT r3 #6)
  * non-string first key columns write without kmin/kmax stats instead of
    crashing in the Arrow manifest batch (ADVICE r3 medium)
  * _obs_count propagates genuine Observation failures (VERDICT r3 #9)
  * mid-rescale bucket pruning is row-exact for external snapshot readers
    (ADVICE r3 low)
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from forklift_spark.lakette.table import LaketteTable, _MANIFEST_CACHE
from forklift_spark.operators.merge import (
    _obs_count,
    compact,
    merge_into,
    select_compaction_candidates,
)
from forklift_spark.streaming.ingest import (
    CHANGELOG_SCHEMA,
    create_entity_table,
)


def _rows(ops):
    """(op, seq, repo, path, content) -> full envelope tuples."""
    return [
        (op, seq, repo, path, f"c{seq}", "py", content, None, 1)
        for (op, seq, repo, path, content) in ops
    ]


class _ManifestCounter:
    """Counts LaketteTable._read_manifest invocations (cache cleared so
    every logical open really hits the loader)."""

    def __init__(self, monkeypatch):
        self.opens = []
        real = LaketteTable._read_manifest

        def counting(tbl, rel):
            self.opens.append(rel)
            return real(tbl, rel)

        _MANIFEST_CACHE.clear()
        monkeypatch.setattr(LaketteTable, "_read_manifest", counting)

    def reset(self):
        self.opens.clear()
        _MANIFEST_CACHE.clear()


# --------------------- VERDICT r3 #1: O(touched) manifest loads on reads


def _seed_many_buckets(spark, tmp_path, n_buckets=16, n=400):
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=n_buckets)
    seed = _rows([("I", i, f"repo_{i % 13}", f"f{i}.py", f"v{i}") for i in range(n)])
    merge_into(spark, table, spark.createDataFrame(seed, CHANGELOG_SCHEMA),
               query_id="seed", epoch=0, mode="mor")
    compact(spark, table)
    return table


def test_pruned_snapshot_opens_only_requested_bucket_shards(
    spark, tmp_path, monkeypatch
):
    """snapshot(buckets=[b]) must prune at the manifest-REF level: only the
    requested buckets' shards are opened, not every shard of the table
    (the r3 read-path O(table) driver cost — VERDICT r3 #1)."""
    table = _seed_many_buckets(spark, tmp_path)
    raw = table._raw_current()
    n_refs = len(raw["manifests"])
    assert n_refs >= 10  # the table really is spread over many shards

    ctr = _ManifestCounter(monkeypatch)
    got = table.snapshot(spark, buckets=[3]).count()
    assert got > 0
    # planning + read opened ONLY bucket 3's shard(s) — never all shards
    assert 0 < len(set(ctr.opens)) <= 2 < n_refs


def test_merge_epoch_opens_o_touched_manifest_shards(spark, tmp_path, monkeypatch):
    """The COW epoch (gate -> pruned snapshot -> commit) opens manifest
    shards only for the buckets the batch touches — the read-path mirror of
    test_merge_epoch_does_zero_per_file_driver_io (VERDICT r3 #1 done
    criterion)."""
    table = _seed_many_buckets(spark, tmp_path)
    n_refs = len(table._raw_current()["manifests"])

    ctr = _ManifestCounter(monkeypatch)
    one = _rows([("U", 9999, "repo_0", "f0.py", "patched")])
    stats = merge_into(spark, table, spark.createDataFrame(one, CHANGELOG_SCHEMA),
                       query_id="one", epoch=0)
    assert stats.touched_buckets == 1
    # one bucket touched => its shard may be opened by the pruned snapshot
    # read and again by the commit's carry/removal accounting; shards of
    # the other ~15 buckets are never loaded
    assert 0 < len(set(ctr.opens)) <= 2 < n_refs
    assert {
        r.content
        for r in table.snapshot(spark).filter(F.col("path") == "f0.py").collect()
    } == {"patched"}


def test_compaction_planning_and_stats_open_zero_shards(
    spark, tmp_path, monkeypatch
):
    """select_compaction_candidates and stats() read the version file's
    maintained per-bucket counters — zero manifest shard loads, so calling
    them every epoch costs nothing at any table size (VERDICT r3 #1)."""
    table = _seed_many_buckets(spark, tmp_path)
    # add MOR deltas so some groups actually qualify
    more = _rows([("U", 10_000 + i, f"repo_{i % 13}", f"f{i}.py", f"w{i}")
                  for i in range(200)])
    merge_into(spark, table, spark.createDataFrame(more, CHANGELOG_SCHEMA),
               query_id="mor", epoch=0, mode="mor")

    ctr = _ManifestCounter(monkeypatch)
    cands = select_compaction_candidates(table, max_delta_files=0)
    st = table.stats()
    assert len(ctr.opens) == 0
    assert cands  # deltas exist => some group qualifies
    assert st["delta_files"] > 0
    # the maintained counters agree with a from-scratch materialize
    meta = table.current_metadata()
    assert st["total_files"] == len(meta["files"])
    assert st["total_rows"] == sum(f["rows"] for f in meta["files"])
    assert st["delta_files"] == sum(1 for f in meta["files"] if f.get("delta"))


def test_bucket_stats_match_files_across_lifecycle(spark, tmp_path):
    """The incrementally-maintained per-bucket stats stay exactly equal to
    a from-scratch recount over the manifest file lists through MOR
    appends, COW rewrites, incremental + full compaction."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=8)

    def check():
        raw = table._raw_current()
        maintained = table._bucket_stats(raw)
        rebuilt = table._bucket_stats(
            {k: v for k, v in raw.items() if k != "bucket_stats"}
        )
        assert maintained == rebuilt

    for epoch, mode in enumerate(["mor", "cow", "mor", "mor"]):
        ev = _rows([
            ("U" if epoch else "I", epoch * 1000 + i, f"r{i % 7}", f"f{i % 40}.py",
             f"e{epoch}v{i}")
            for i in range(120)
        ])
        merge_into(spark, table, spark.createDataFrame(ev, CHANGELOG_SCHEMA),
                   query_id="lc", epoch=epoch, mode=mode)
        check()
    compact(spark, table, buckets=select_compaction_candidates(
        table, max_delta_files=0))
    check()
    compact(spark, table)
    check()


# ----------------------- VERDICT r3 #6: per-file max(seq) + min_seq scans


def test_min_seq_pruned_scan_opens_fewer_files_same_result(spark, tmp_path):
    """A reader asking for seq >= watermark opens strictly fewer data files
    and manifest-planned entries, with a result identical to filtering the
    full snapshot (VERDICT r3 #6 done criterion)."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    old = _rows([("I", i, f"r{i % 5}", f"f{i}.py", f"v{i}") for i in range(200)])
    merge_into(spark, table, spark.createDataFrame(old, CHANGELOG_SCHEMA),
               query_id="old", epoch=0, mode="mor")
    new = _rows([("U", 10_000 + i, f"r{i % 5}", f"f{i}.py", f"n{i}")
                 for i in range(30)])
    merge_into(spark, table, spark.createDataFrame(new, CHANGELOG_SCHEMA),
               query_id="new", epoch=0, mode="mor")

    meta = table.current_metadata()
    assert all(f.get("smax") is not None for f in meta["files"])
    watermark = 10_000
    pruned = table.plan_files(min_seq=watermark, metadata=meta)
    assert 0 < len(pruned) < len(meta["files"])

    got = sorted(
        (r.repo, r.path, r.seq, r.content)
        for r in table.snapshot(spark, min_seq=watermark).collect()
    )
    want = sorted(
        (r.repo, r.path, r.seq, r.content)
        for r in table.snapshot(spark).filter(F.col("seq") >= watermark).collect()
    )
    assert got == want and len(got) == 30


def test_min_seq_never_surfaces_stale_versions(spark, tmp_path):
    """Exactness under smax pruning: when a key's WINNER predates the
    watermark but a stale version of it sits in a kept file, the stale row
    must not leak through (the row filter after LWW drops it)."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=1)
    # file A (delta): k1@seq1 (stale), k2@seq2 (stale)
    merge_into(spark, table, spark.createDataFrame(
        _rows([("I", 1, "r", "k1.py", "old1"), ("I", 2, "r", "k2.py", "old2")]),
        CHANGELOG_SCHEMA), query_id="a", epoch=0, mode="mor")
    # file B (delta): k1@seq3 (winner, below watermark), k3@seq50 (above)
    merge_into(spark, table, spark.createDataFrame(
        _rows([("U", 3, "r", "k1.py", "mid1"), ("I", 50, "r", "k3.py", "new3")]),
        CHANGELOG_SCHEMA), query_id="b", epoch=0, mode="mor")

    rows = {(r.path, r.seq, r.content)
            for r in table.snapshot(spark, min_seq=10).collect()}
    assert rows == {("k3.py", 50, "new3")}  # no stale k1/k2 leak


# ------------------- ADVICE r3 medium: non-string first key columns write


def test_non_string_key_table_writes_without_stats(spark, tmp_path):
    """A table whose first key column is a LongType (legal via create())
    must write cleanly — kmin/kmax stats are skipped, not crashed on, and
    plan_files keeps its files conservatively."""
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("body", T.StringType(), True),
    ])
    table = LaketteTable.create(str(tmp_path / "tbl"), schema, ["id"], n_buckets=4)
    batch = spark.createDataFrame(
        [(int(i), f"b{i}", "U", int(i)) for i in range(50)],
        "id long, body string, op string, seq long",
    )
    stats = merge_into(spark, table, batch, query_id="longkey", epoch=0)
    assert stats.applied_rows == 50
    meta = table.current_metadata()
    assert meta["files"]
    assert all(f["kmin"] is None and f["kmax"] is None for f in meta["files"])
    assert all(f.get("smax") is not None for f in meta["files"])  # seq stats still on
    assert table.snapshot(spark).count() == 50
    # range pruning silently keeps everything (no stats), never mis-prunes
    assert len(table.plan_files(key_range=("a", "z"), metadata=meta)) == len(
        meta["files"]
    )


# ------------------------- VERDICT r3 #9: _obs_count failure propagation


class _FakeObs:
    def __init__(self, exc):
        self._exc = exc

    @property
    def get(self):
        raise self._exc


def test_obs_count_propagates_genuine_failures():
    """A genuine Observation failure (anything but the AQE
    dropped-CollectMetrics AssertionError shape) must propagate, never be
    silently reported as 0 rows (ADVICE r3 / VERDICT r3 #9)."""
    with pytest.raises(RuntimeError, match="gateway"):
        _obs_count(_FakeObs(RuntimeError("py4j gateway is down")), "rows")

    class Py4JJavaError(Exception):  # same shape py4j raises
        pass

    with pytest.raises(Py4JJavaError):
        _obs_count(
            _FakeObs(Py4JJavaError("org.apache.spark.SparkException: boom")),
            "rows",
        )
    # ...while the documented empty-epoch edge still reads as zero
    assert _obs_count(
        _FakeObs(Py4JJavaError("java.lang.AssertionError: assertion failed")),
        "rows",
    ) == 0


# ---------------- ADVICE r3 low: mid-rescale row-exact bucket pruning


def test_mid_rescale_bucket_pruning_is_row_exact(spark, tmp_path):
    """During an online rescale, old-spec files span several current-spec
    buckets; snapshot(buckets=[b]) must return ONLY bucket b's rows (the
    row-level filter), not whole old-spec files (ADVICE r3). Internal
    rewriters keep whole-file semantics via exact_buckets=False."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=2)
    events = _rows([("I", i, f"r{i}", f"f{i}.py", f"v{i}") for i in range(80)])
    merge_into(spark, table, spark.createDataFrame(events, CHANGELOG_SCHEMA),
               query_id="seed", epoch=0)
    table.rescale(8)
    assert len(table._raw_current()["bucket_specs"]) > 1  # migration live

    bexpr = F.pmod(F.xxhash64(F.col("repo"), F.col("path")), F.lit(8)).cast("int")
    for b in (0, 3, 5):
        got = table.snapshot(spark, buckets=[b]).withColumn("_b", bexpr)
        rows = got.collect()
        assert rows, f"bucket {b} empty"
        assert all(r._b == b for r in rows)  # no sibling-bucket leakage
    # whole-file mode still returns the siblings (what merge/compact need)
    loose = table.snapshot(spark, buckets=[0], exact_buckets=False).withColumn(
        "_b", bexpr
    )
    assert {r._b for r in loose.collect()} > {0}

    # union over all current buckets == the full snapshot (completeness)
    full = table.snapshot(spark).count()
    per = sum(table.snapshot(spark, buckets=[b]).count() for b in range(8))
    assert per == full == 80


# ------------- VERDICT r3 #7: composed LSH embedding dedup, measured recall


def test_embedding_dup_pairs_lsh_recall_vs_exact_baseline(spark):
    """embedding_dup_pairs_lsh (lsh_buckets_arrow -> cosine_pairs blocked
    by bucket id) against the exact quadratic baseline on planted
    near-duplicate clusters: recall >= 0.9, precision 1.0 (candidates are
    exact-cosine verified). Mirrors the MinHash recall methodology
    (tests/test_dedup_ann.py)."""
    import numpy as np

    from forklift_spark.operators import similarity as sim

    rng = np.random.default_rng(7)
    dim, thr = 32, 0.95
    rows = []
    for i in range(50):
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
        if i < 20:  # planted near-duplicate: small perturbation
            # noise norm ~ 0.04*sqrt(32) ~ 0.23 => cos(v, w) ~ 0.975 > thr
            w = v + 0.04 * rng.standard_normal(dim)
            w /= np.linalg.norm(w)
            rows.append((1000 + i, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "id long, emb array<float>")

    exact = sim.cosine_pairs(df, "emb", "id", thr, allow_quadratic=True)
    truth = {(r.id_a, r.id_b) for r in exact.collect()}
    assert len(truth) >= 15  # the planted pairs really clear the threshold

    got = sim.embedding_dup_pairs_lsh(
        df, "emb", "id", thr, dim=dim, bits=8, n_tables=8, method="arrow"
    )
    found = {(r.id_a, r.id_b) for r in got.collect()}
    hit = truth & found
    recall = len(hit) / len(truth)
    precision = len(hit) / len(found) if found else 0.0
    assert recall >= 0.9, f"recall {recall:.3f} (precision {precision:.3f})"
    assert precision == 1.0, f"precision {precision:.3f}"
    # literal/arrow signature parity: same pairs either way
    lit = sim.embedding_dup_pairs_lsh(
        df, "emb", "id", thr, dim=dim, bits=8, n_tables=8, method="literal"
    )
    assert {(r.id_a, r.id_b) for r in lit.collect()} == found


# ---------------- VERDICT r3 missing #3: generic per-column file stats


def _stats_table(tmp_path, target_file_rows=None):
    from forklift_spark.streaming.ingest import ENTITY_SCHEMA, KEY_COLS

    return LaketteTable.create(
        str(tmp_path / "tbl"), ENTITY_SCHEMA, KEY_COLS,
        n_buckets=2, stats_cols=["lang"], target_file_rows=target_file_rows,
    )


def test_column_stats_prune_clean_files_same_result(spark, tmp_path):
    """A table with stats_cols=['lang']: after compaction (clean,
    key-sorted, size-rolled files — lang correlates with the repo prefix,
    the realistic monolingual-repo layout), snapshot(col_ranges={'lang':
    ...}) opens strictly fewer parquet files (asserted via inputFiles())
    with a result identical to filtering the full snapshot."""
    table = _stats_table(tmp_path, target_file_rows=24)
    go = [
        ("I", i, f"go/r{i % 5}", f"f{i}.go", f"c{i}", "go", f"w{i}", None, 1)
        for i in range(60)
    ]
    py = [
        ("I", 1000 + i, f"py/r{i % 5}", f"f{i}.py", f"c{i}", "py", f"v{i}", None, 1)
        for i in range(60)
    ]
    merge_into(spark, table, spark.createDataFrame(go, CHANGELOG_SCHEMA),
               query_id="a", epoch=0, mode="mor")
    merge_into(spark, table, spark.createDataFrame(py, CHANGELOG_SCHEMA),
               query_id="b", epoch=0, mode="mor")
    compact(spark, table)  # all groups clean; cstats recomputed by compact

    meta = table.current_metadata()
    assert all(f.get("cstats", {}).get("lang") for f in meta["files"])

    pruned = table.snapshot(spark, col_ranges={"lang": ("go", "go")})
    full = table.snapshot(spark)
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    got = sorted((r.repo, r.path, r.content) for r in pruned.collect())
    want = sorted(
        (r.repo, r.path, r.content)
        for r in full.filter(F.col("lang") == "go").collect()
    )
    assert got == want and len(got) == 60


def test_column_stats_never_prune_dirty_groups_no_stale_leak(spark, tmp_path):
    """The MOR exactness trap the clean-only rule exists for: key k's
    winner has lang='en' (outside the range) while a STALE version with
    lang='py' (inside) sits in an older delta file. Pruning the winner's
    file would surface the stale row through the range filter — dirty
    groups are exempt, so the scan returns nothing for k."""
    table = _stats_table(tmp_path)
    v1 = [("I", 1, "r", "k.py", "c1", "py", "old", None, 1)]
    v2 = [("U", 2, "r", "k.py", "c2", "en", "new", None, 1)]
    merge_into(spark, table, spark.createDataFrame(v1, CHANGELOG_SCHEMA),
               query_id="a", epoch=0, mode="mor")
    merge_into(spark, table, spark.createDataFrame(v2, CHANGELOG_SCHEMA),
               query_id="b", epoch=0, mode="mor")

    got = table.snapshot(spark, col_ranges={"lang": ("py", "py")}).collect()
    assert got == []  # the stale 'py' version must NOT leak
    # winner visible under its own range
    en = table.snapshot(spark, col_ranges={"lang": ("en", "en")}).collect()
    assert [(r.path, r.content) for r in en] == [("k.py", "new")]
    # after compaction the group is clean and pruning both engages and
    # stays exact
    compact(spark, table)
    assert table.snapshot(spark, col_ranges={"lang": ("py", "py")}).collect() == []
    en2 = table.snapshot(spark, col_ranges={"lang": ("en", "en")}).collect()
    assert [(r.path, r.content) for r in en2] == [("k.py", "new")]


# ----------------------------- raw metadata plumbing stays backward-compat


# ------------------- VERDICT r3 #8: retention wired into the ingest loop


def test_long_run_retention_bounds_all_file_populations(spark, tmp_path):
    """50+ streaming epochs with vacuum_every + expire_epochs_keep: data
    files, version files, manifest shards, and epoch markers all stay
    bounded — an unbounded run would hold >=55 version files and one
    marker per epoch — while the final state stays sha-exact."""
    from forklift_spark.changelog import (
        ChangelogSpec,
        expected_final_state,
        generate_changelog,
    )
    from forklift_spark.streaming.ingest import run_ingest, verify_state

    spec = ChangelogSpec(
        n_events=5_500, n_repos=8, paths_per_repo=20, seed=11,
        duplicate_fraction=0.05, segment_rows=100,  # 55 segments
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(spec, log_dir)
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    report = run_ingest(
        spark, log_dir, table, str(tmp_path / "ckpt"),
        query_id="retain", max_files_per_trigger=1, mode="mor",
        dedupe_in_batch=False,
        compact_every=8,
        vacuum_every=8, vacuum_keep_versions=2,
        vacuum_grace_seconds=0.0,  # this loop is the only writer
        expire_epochs_keep=10,
    )
    assert len(report.epochs) >= 50

    n_versions = sum(
        1 for f in os.listdir(table.meta_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    n_manifests = len(os.listdir(table.manifests_dir))
    n_data = len(os.listdir(table.data_dir))
    n_markers = len(os.listdir(os.path.join(table.epochs_dir, "retain")))
    n_lineage = len(os.listdir(table.lineage_dir))
    # unbounded would be ~55+ versions / 55 markers / ~60+ delta files
    assert n_versions <= 12, n_versions      # ~2 kept + post-vacuum commits
    assert n_markers <= 18, n_markers        # keep_last=10 + one cadence
    assert n_lineage <= 18, n_lineage
    # steady-state bound: ~1 compacted base set + up to one cadence of MOR
    # deltas (4 buckets x 8 epochs) + kept versions' files — an unbounded
    # run accumulates ~4/epoch => ~220 by epoch 55
    assert n_data <= 60, n_data
    assert n_manifests <= 30, n_manifests

    ver = verify_state(spark, table, spark.createDataFrame(expected_final_state(spec)))
    assert ver["ok"], ver


def test_version_file_carries_bucket_stats_and_no_files(spark, tmp_path):
    table = _seed_many_buckets(spark, tmp_path, n_buckets=8, n=100)
    with open(os.path.join(table.meta_dir, "CURRENT")) as f:
        vname = f.read().strip()
    with open(os.path.join(table.meta_dir, vname)) as f:
        raw = json.load(f)
    assert "files" not in raw
    assert raw["bucket_stats"]
    assert sum(v[0] for v in raw["bucket_stats"].values()) == raw["total_files"]
    assert sum(v[1] for v in raw["bucket_stats"].values()) == raw["total_rows"]
