"""Incrementally-maintained dedup silver (operators/derive_dedup.py):
convergence to the batch GROUP BY at every applied version, survivor
promotion when a delete removes the current survivor (the min() repair
case the groups strategy exists for), normalization collapsing planted
variants, and exactly-once idempotence."""

from pyspark.sql import functions as F

from forklift_spark.lakette.table import LaketteTable
from forklift_spark.operators.derive_dedup import derive_dedup, fingerprint_sql
from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table


def _ev(op, seq, path, content, lang="py"):
    return (op, seq, "r", path, f"c{seq}", lang, content, None, 1)


def _seed(spark, table, rows, *, epoch=0):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    return merge_into(spark, table, df, query_id="seed", epoch=epoch)


def _gold_state(spark, dst_root):
    return {
        r.fp: (r.survivor, r.n_rows)
        for r in LaketteTable(dst_root).snapshot(spark)
        .select("fp", "survivor", "n_rows").collect()
    }


def _recompute(spark, table, normalize=True):
    """The batch answer derive_dedup must converge to."""
    snap = table.snapshot(spark)
    return {
        r.fp: (r.survivor, r.n_rows)
        for r in snap.selectExpr(
            f"{fingerprint_sql('content', normalize=normalize)} AS fp",
            "repo || '|' || path AS k",
        )
        .groupBy("fp")
        .agg(F.min("k").alias("survivor"), F.count("*").alias("n_rows"))
        .collect()
    }


def test_incremental_equals_recompute_across_epochs(spark, tmp_path):
    src = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    dst = str(tmp_path / "dedup")
    # epoch 0: three dup groups (A x3, B x2, C x1)
    _seed(spark, src, [
        _ev("I", 1, "a1", "Alpha body"), _ev("I", 2, "a2", "alpha BODY!"),
        _ev("I", 3, "a3", "alpha body"), _ev("I", 4, "b1", "beta"),
        _ev("I", 5, "b2", "beta"), _ev("I", 6, "c1", "gamma"),
    ])
    r = derive_dedup(spark, src, dst)
    assert r.initial_sync and r.strategy == "groups"
    assert _gold_state(spark, dst) == _recompute(spark, src)
    g = _gold_state(spark, dst)
    fa = [fp for fp, (s, n) in g.items() if n == 3]
    assert len(fa) == 1 and g[fa[0]][0] == "r|a1"  # normalization collapsed 3

    # epoch 1: update moves a2 out of group A into B; new doc d1 unique
    _seed(spark, src, [
        _ev("U", 7, "a2", "beta"), _ev("I", 8, "d1", "delta"),
    ], epoch=1)
    r = derive_dedup(spark, src, dst)
    assert not r.initial_sync and not r.resync
    assert _gold_state(spark, dst) == _recompute(spark, src)
    g = _gold_state(spark, dst)
    assert g[fa[0]] == ("r|a1", 2)  # A shrank
    fb = [fp for fp, (s, n) in g.items() if n == 3]
    assert len(fb) == 1 and g[fb[0]][0] == "r|a2"  # B grew, survivor re-min'd


def test_survivor_promotion_on_delete(spark, tmp_path):
    src = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    dst = str(tmp_path / "dedup")
    _seed(spark, src, [
        _ev("I", 1, "a1", "same"), _ev("I", 2, "a2", "same"),
        _ev("I", 3, "a3", "same"),
    ])
    derive_dedup(spark, src, dst)
    g = _gold_state(spark, dst)
    (fp,) = g
    assert g[fp] == ("r|a1", 3)
    # delete the CURRENT SURVIVOR: min() is not retractable — the groups
    # strategy must recompute the affected group and promote a2
    _seed(spark, src, [_ev("D", 4, "a1", None)], epoch=1)
    derive_dedup(spark, src, dst)
    assert _gold_state(spark, dst)[fp] == ("r|a2", 2)
    # delete the rest: the group must disappear (n_rows -> 0 tombstone)
    _seed(spark, src, [_ev("D", 5, "a2", None), _ev("D", 6, "a3", None)], epoch=2)
    derive_dedup(spark, src, dst)
    assert _gold_state(spark, dst) == {}


def test_idempotent_and_predicate(spark, tmp_path):
    src = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    dst = str(tmp_path / "dedup")
    _seed(spark, src, [
        _ev("I", 1, "a1", "x", lang="py"), _ev("I", 2, "a2", "x", lang="de"),
    ])
    r1 = derive_dedup(spark, src, dst, predicate="lang <> 'de'")
    g = _gold_state(spark, dst)
    (fp,) = g
    assert g[fp] == ("r|a1", 1)  # the de row is outside the predicate
    # second call with no new source version: exactly-once no-op
    v_before = LaketteTable(dst).current_metadata()["version"]
    r2 = derive_dedup(spark, src, dst, predicate="lang <> 'de'")
    assert r2.applied_epochs == [] and not r2.initial_sync
    assert LaketteTable(dst).current_metadata()["version"] == v_before
    assert _gold_state(spark, dst) == g
    assert r1.initial_sync  # and the first call really was the sync


def test_raw_mode_keeps_variants_distinct(spark, tmp_path):
    src = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    dst = str(tmp_path / "dedup")
    _seed(spark, src, [
        _ev("I", 1, "a1", "Alpha"), _ev("I", 2, "a2", "alpha"),
    ])
    derive_dedup(spark, src, dst, normalize=False)
    assert len(_gold_state(spark, dst)) == 2
    assert _gold_state(spark, dst) == _recompute(spark, src, normalize=False)


def test_dedup_and_simindex_ride_the_ingest_loop(spark, tmp_path):
    """The medallion hook contract (run_ingest derived=): BOTH new derived
    tables — the dedup silver and the similarity index — refresh inside
    the streaming loop and reflect the source's final version on return,
    each equal to its one-shot recompute of the final state."""
    from forklift_spark.changelog import ChangelogSpec, generate_changelog
    from forklift_spark.operators.simindex import derive_simindex, signature_sql
    from forklift_spark.streaming.ingest import run_ingest

    spec = ChangelogSpec(
        n_events=2_000, n_repos=6, paths_per_repo=12, seed=11, segment_rows=400
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(spec, log_dir)
    bronze = create_entity_table(str(tmp_path / "bronze"), n_buckets=4)
    dedup_root = str(tmp_path / "dedup")
    idx_root = str(tmp_path / "idx")

    report = run_ingest(
        spark, log_dir, bronze, str(tmp_path / "ckpt"),
        query_id="meddd", max_files_per_trigger=2,
        derived=[
            lambda s: derive_dedup(s, bronze, dedup_root),
            lambda s: derive_simindex(s, bronze, idx_root, n_hashes=16),
        ],
    )
    assert report.derived, "hooks should have produced refresh reports"
    src_v = bronze.current_metadata()["version"]
    assert LaketteTable(dedup_root).snapshot(spark).count() > 0
    # dedup silver == batch GROUP BY of the final state
    assert _gold_state(spark, dedup_root) == _recompute(spark, bronze)
    # similarity index == one-shot re-sign of the final state
    got = {
        r.path: tuple(r.sig)
        for r in LaketteTable(idx_root).snapshot(spark).select("path", "sig").collect()
    }
    expect = {
        r.path: tuple(r.s)
        for r in bronze.snapshot(spark)
        .selectExpr("path", f"{signature_sql('content', n_hashes=16)} AS s")
        .collect()
    }
    assert got == expect
    # both derived tables applied spans up to the source head, exactly-once
    for dst in (dedup_root, idx_root):
        assert LaketteTable(dst).current_metadata()["version"] >= 1
    assert src_v >= 2  # several epochs actually landed
