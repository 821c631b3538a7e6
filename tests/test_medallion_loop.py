"""Medallion loop inside run_ingest (round 5): the `derived=` hook list
wires bronze->silver->gold refresh into the streaming foreachBatch loop
itself, so one run_ingest call maintains the whole chain. Binding
invariants: (1) mid-stream refreshes actually happen (not one bulk sync
at the end); (2) after the drain the WHOLE chain equals the one-shot
recompute of the final bronze state, sha-exact; (3) `derived_every=N`
skips refreshes between cadence points but the final catch-up pass
always leaves every layer at the source's final version."""

import os

import pytest

from forklift_spark.changelog import (
    ChangelogSpec,
    expected_final_state,
    generate_changelog,
)
from forklift_spark.lakette import LaketteTable
from forklift_spark.operators.derive import derive, derived_state_recompute
from forklift_spark.operators.derive_agg import derive_agg, derived_agg_recompute
from forklift_spark.streaming.ingest import (
    create_entity_table,
    run_ingest,
    verify_state,
)

SPEC = ChangelogSpec(
    n_events=3_000, n_repos=8, paths_per_repo=15, seed=23, segment_rows=500
)

MAPPING = {"lang": "lang", "content": "content", "n_chars": "length(content)"}
PRED = "lang <> 'md'"
GROUPS = {"lang": "lang"}
AGGS = {"files": "count(*)", "chars": "sum(n_chars)"}


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("medlog")
    generate_changelog(SPEC, str(d))
    return str(d)


def _state(spark, df):
    cols = [c for c in df.columns if c not in ("seq", "content_sha", "deleted")]
    return sorted(tuple(r) for r in df.select(*sorted(cols)).collect())


def _hooks(spark, bronze, silver_root, gold_root):
    return [
        lambda s: derive(
            s, bronze, silver_root, MAPPING, predicate=PRED, derive_id="silver"
        ),
        lambda s: derive_agg(
            s, LaketteTable(silver_root), gold_root, GROUPS, AGGS, derive_id="gold"
        ),
    ]


def test_medallion_chain_refreshes_inside_the_loop(spark, log_dir, tmp_path):
    bronze = create_entity_table(str(tmp_path / "bronze"), n_buckets=8)
    silver_root = str(tmp_path / "silver")
    gold_root = str(tmp_path / "gold")

    report = run_ingest(
        spark,
        log_dir,
        bronze,
        str(tmp_path / "ckpt"),
        query_id="medallion",
        max_files_per_trigger=1,
        derived=_hooks(spark, bronze, silver_root, gold_root),
    )
    applied = [e for e in report.epochs if not e.skipped]
    assert len(applied) >= 2  # genuinely multi-epoch

    # bronze itself is sha-exact vs the oracle
    exp = spark.createDataFrame(expected_final_state(SPEC))
    assert verify_state(spark, bronze, exp)["ok"]

    # hooks ran per epoch (2 per applied epoch) + one final catch-up pair
    assert len(report.derived) == 2 * (len(applied) + 1)
    # refreshes happened MID-STREAM: the silver hook applied a span epoch
    # after its initial sync (i.e. more than one distinct refresh landed
    # rows), not one bulk sync at the end
    silver_reports = report.derived[0::2]
    landed = [r for r in silver_reports if r.applied_epochs]
    assert len(landed) >= 2 and silver_reports[0].initial_sync

    # chain convergence: silver == transform(final bronze),
    # gold == agg(final silver) — both row-for-row
    silver = LaketteTable(silver_root)
    assert _state(spark, silver.snapshot(spark)) == _state(
        spark, derived_state_recompute(spark, bronze, MAPPING, predicate=PRED)
    )
    gold = LaketteTable(gold_root).snapshot(spark)
    assert _state(spark, gold) == _state(
        spark, derived_agg_recompute(spark, silver, GROUPS, AGGS)
    )
    # the final catch-up pass is a cheap no-op when already current
    tail_silver, tail_gold = report.derived[-2], report.derived[-1]
    assert not tail_silver.applied_epochs and not tail_gold.applied_epochs


def test_derived_every_cadence_with_final_catchup(spark, log_dir, tmp_path):
    bronze = create_entity_table(str(tmp_path / "bronze"), n_buckets=8)
    silver_root = str(tmp_path / "silver")
    gold_root = str(tmp_path / "gold")

    report = run_ingest(
        spark,
        log_dir,
        bronze,
        str(tmp_path / "ckpt"),
        query_id="cadence",
        max_files_per_trigger=1,
        derived=_hooks(spark, bronze, silver_root, gold_root),
        derived_every=3,
    )
    applied = [e for e in report.epochs if not e.skipped]
    assert len(applied) >= 3
    # cadence: one refresh pair per 3 applied epochs, plus the catch-up
    assert len(report.derived) == 2 * (len(applied) // 3 + 1)

    # regardless of where the cadence landed, the catch-up leaves the
    # chain at the bronze table's FINAL version
    silver = LaketteTable(silver_root)
    assert _state(spark, silver.snapshot(spark)) == _state(
        spark, derived_state_recompute(spark, bronze, MAPPING, predicate=PRED)
    )
    assert _state(spark, LaketteTable(gold_root).snapshot(spark)) == _state(
        spark, derived_agg_recompute(spark, silver, GROUPS, AGGS)
    )


def test_medallion_survives_resume_and_vacuum(spark, log_dir, tmp_path):
    """Crash/resume shape: ingest a prefix of the log (with hooks + an
    aggressive vacuum cadence), then resume with the remainder on the same
    checkpoint. Exactly-once offsets on every layer mean no span is double
    applied, and retention running INSIDE the loop never breaks the chain
    (refresh runs before vacuum each epoch; resync would repair if it ever
    did)."""
    import shutil

    bronze = create_entity_table(str(tmp_path / "bronze"), n_buckets=8)
    silver_root = str(tmp_path / "silver")
    gold_root = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")
    feed = tmp_path / "feed"
    feed.mkdir()
    segs = sorted(os.listdir(log_dir))
    for s in segs[: len(segs) // 2]:
        shutil.copy(os.path.join(log_dir, s), feed / s)

    kw = dict(
        query_id="resume",
        max_files_per_trigger=1,
        derived=_hooks(spark, bronze, silver_root, gold_root),
        vacuum_every=2,
        vacuum_keep_versions=2,
        vacuum_grace_seconds=0.0,
    )
    run_ingest(spark, str(feed), bronze, ckpt, **kw)
    for s in segs[len(segs) // 2 :]:
        shutil.copy(os.path.join(log_dir, s), feed / s)
    run_ingest(spark, str(feed), bronze, ckpt, **kw)

    exp = spark.createDataFrame(expected_final_state(SPEC))
    assert verify_state(spark, bronze, exp)["ok"]
    silver = LaketteTable(silver_root)
    assert _state(spark, silver.snapshot(spark)) == _state(
        spark, derived_state_recompute(spark, bronze, MAPPING, predicate=PRED)
    )
    assert _state(spark, LaketteTable(gold_root).snapshot(spark)) == _state(
        spark, derived_agg_recompute(spark, silver, GROUPS, AGGS)
    )
