"""mode="auto": per-epoch COW/MOR storage-layout decision from the
version file's maintained per-bucket counters (Hudi-style write-path
choice, zero extra I/O to decide). Confluence property tests already
guarantee any mode mix converges; these tests pin the DECISION and the
end-to-end equivalence."""

from pyspark.sql import functions as F

from forklift_spark.operators.merge import compact, merge_into
from forklift_spark.streaming.ingest import (
    CHANGELOG_SCHEMA,
    create_entity_table,
    run_ingest,
)


def _rows(ops):
    return [
        (op, seq, repo, path, f"c{seq}", "py", content, None, 1)
        for (op, seq, repo, path, content) in ops
    ]


def _df(spark, ops):
    return spark.createDataFrame(_rows(ops), CHANGELOG_SCHEMA)


def test_auto_picks_cow_on_young_table_then_mor_on_trickle(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    # epoch 0: empty table -> bulk load is COW (existing 0 <= 4x batch)
    s0 = merge_into(
        spark, table,
        _df(spark, [("I", i, f"r{i % 7}", f"f{i}.py", f"v{i}") for i in range(400)]),
        query_id="w", epoch=0, mode="auto",
    )
    assert s0.mode_used == "cow"
    # epoch 1: 3-row trickle against 400 existing rows -> MOR
    s1 = merge_into(
        spark, table,
        _df(spark, [("U", 1000 + i, f"r{i}", f"f{i}.py", f"u{i}") for i in range(3)]),
        query_id="w", epoch=1, mode="auto",
    )
    assert s1.mode_used == "mor"
    meta = table.current_metadata()
    assert any(f.get("delta") for f in meta["files"])  # deltas really appended
    # epoch 2: a batch commensurate with the touched groups -> COW again
    s2 = merge_into(
        spark, table,
        _df(spark, [("U", 2000 + i, f"r{i % 7}", f"f{i}.py", f"w{i}") for i in range(400)]),
        query_id="w", epoch=2, mode="auto",
    )
    assert s2.mode_used == "cow"
    # state correct through the mixed modes
    got = {r.path: r.content for r in table.snapshot(spark).collect()}
    want = {f"f{i}.py": f"w{i}" for i in range(400)}
    want.update({f"f{i}.py": f"w{i}" for i in range(3)})  # epoch-2 overwrote
    assert got == want


def test_auto_converges_identically_to_fixed_modes(spark, tmp_path):
    """Same three epochs replayed under mode=auto, mode=cow, and mode=mor
    (+compact) produce identical (key, seq, content_sha) states."""
    epochs = [
        [("I", i, f"r{i % 5}", f"f{i % 20}.py", f"v{i}") for i in range(60)],
        [("U", 100 + i, f"r{i % 5}", f"f{i % 20}.py", f"u{i}") for i in range(8)],
        [("D", 200 + i, f"r{i}", f"f{i}.py", None) for i in range(3)],
    ]

    def replay(mode, root):
        t = create_entity_table(root, n_buckets=4)
        for e, ops in enumerate(epochs):
            merge_into(spark, t, _df(spark, ops), query_id="x", epoch=e, mode=mode)
        if mode == "mor":
            compact(spark, t)
        return sorted(
            (r.repo, r.path, r.seq, r.content_sha)
            for r in t.snapshot(spark).collect()
        )

    a = replay("auto", str(tmp_path / "a"))
    c = replay("cow", str(tmp_path / "c"))
    m = replay("mor", str(tmp_path / "m"))
    assert a == c == m and a


def test_run_ingest_mode_auto_end_to_end(spark, tmp_path):
    from forklift_spark.changelog import (
        ChangelogSpec,
        expected_final_state,
        generate_changelog,
    )
    from forklift_spark.streaming.ingest import verify_state

    spec = ChangelogSpec(n_events=3_000, n_repos=6, paths_per_repo=12, seed=5,
                         duplicate_fraction=0.1, segment_rows=300)
    log_dir = str(tmp_path / "log")
    generate_changelog(spec, log_dir)
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    report = run_ingest(
        spark, log_dir, table, str(tmp_path / "ckpt"),
        query_id="auto", max_files_per_trigger=2, mode="auto",
    )
    assert len(report.epochs) >= 4
    modes = {s.mode_used for s in report.epochs if not s.skipped}
    assert "cow" in modes  # the early bulk epochs
    ver = verify_state(spark, table, spark.createDataFrame(expected_final_state(spec)))
    assert ver["ok"], ver


def test_auto_lagged_telemetry_decision(spark, tmp_path):
    """mode="auto" with auto_prev (the streaming-loop shape) decides from
    the PREVIOUS epoch's measured stats — zero decide jobs — and lags a
    workload shift by exactly one epoch, which confluence makes a cost
    blip, never a correctness event."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    s0 = merge_into(
        spark, table,
        _df(spark, [("I", i, f"r{i % 7}", f"f{i}.py", f"v{i}") for i in range(400)]),
        query_id="w", epoch=0, mode="auto",
    )
    assert s0.mode_used == "cow" and s0.touched  # touched recorded for feedback

    # trickle epoch decided from s0's telemetry: existing(400) >> s0... s0
    # was a bulk batch, so the LAGGED decision still says cow (the shift
    # lags one epoch); the exact decision would have said mor
    s1 = merge_into(
        spark, table,
        _df(spark, [("U", 1000, "r1", "f1.py", "u1")]),
        query_id="w", epoch=1, mode="auto", auto_prev=s0,
    )
    assert s1.mode_used == "cow"  # documented one-epoch lag
    assert s1.batch_rows == 1

    # next trickle epoch sees s1's telemetry (tiny batch) -> mor, no jobs
    s2 = merge_into(
        spark, table,
        _df(spark, [("U", 1001, "r2", "f2.py", "u2")]),
        query_id="w", epoch=2, mode="auto", auto_prev=s1,
    )
    assert s2.mode_used == "mor"

    # back to bulk: lags one epoch (mor), then flips to cow
    bulk = [("U", 2000 + i, f"r{i % 7}", f"f{i}.py", f"w{i}") for i in range(400)]
    s3 = merge_into(spark, table, _df(spark, bulk), query_id="w", epoch=3,
                    mode="auto", auto_prev=s2)
    assert s3.mode_used == "mor"  # lag
    s4 = merge_into(
        spark, table,
        _df(spark, [("U", 3000 + i, f"r{i % 7}", f"f{i}.py", f"x{i}") for i in range(400)]),
        query_id="w", epoch=4, mode="auto", auto_prev=s3,
    )
    assert s4.mode_used == "cow"  # caught up

    # converged state is exactly the LWW expectation regardless of the mix
    final = {r.path: r.content for r in table.snapshot(spark).collect()}
    for i in range(400):
        assert final[f"f{i}.py"] == f"x{i}"
