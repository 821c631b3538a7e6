"""Lifecycle fuzz: random interleavings of every table-state operator the
engine exposes — COW/MOR merges, incremental + full compaction, ONLINE
RESCALE, vacuum, duplicate redelivery of whole past batches — must all
converge to the same pandas LWW oracle state. This is the confluence
contract (SURVEY §7 hard-point 1) stress-tested across the round-3
surface: if any interleaving diverges, the seed reproduces it exactly."""

import random

import pytest
from pyspark.sql import functions as F

from forklift_spark.changelog import ChangelogSpec, expected_final_state, generate_changelog
from forklift_spark.operators.merge import (
    compact,
    merge_into,
    select_compaction_candidates,
)
from forklift_spark.streaming.ingest import (
    CHANGELOG_SCHEMA,
    create_entity_table,
    verify_state,
)


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_random_lifecycle_converges_to_oracle(spark, tmp_path, seed):
    rng = random.Random(seed)
    spec = ChangelogSpec(
        n_events=2_500,
        n_repos=10,
        paths_per_repo=8,
        seed=seed,
        duplicate_fraction=0.1,
        disorder_window=128,
        hot_repo_fraction=0.4,
    )
    log = tmp_path / "log"
    generate_changelog(spec, str(log))
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log}/seg-*.parquet")

    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    n_batches = 5
    batches = [df.filter(F.pmod("seq", F.lit(n_batches)) == i) for i in range(n_batches)]

    applied: list[int] = []
    for i, batch in enumerate(batches):
        mode = rng.choice(["cow", "mor"])
        merge_into(spark, table, batch, query_id="fuzz", epoch=i, mode=mode)
        applied.append(i)

        action = rng.random()
        if action < 0.25 and table.n_buckets() < 32:
            table.rescale(table.n_buckets() * rng.choice([2, 4]))
        elif action < 0.45:
            cands = select_compaction_candidates(table, max_delta_files=1)
            if cands:
                compact(spark, table, buckets=cands)
        elif action < 0.6:
            compact(spark, table)
        elif action < 0.7:
            table.vacuum(keep_versions=2, grace_seconds=0)

        if action > 0.8 and applied:
            # duplicate redelivery, two flavors: (a) same (query, epoch) —
            # the exactly-once marker must skip it; (b) a NEW query id —
            # LWW confluence must absorb the duplicate events
            j = rng.choice(applied)
            again = merge_into(spark, table, batches[j], query_id="fuzz", epoch=j)
            assert again.skipped
            merge_into(
                spark, table, batches[j],
                query_id=f"redeliver-{i}", epoch=0,
                mode=rng.choice(["cow", "mor"]),
            )

    # schema evolution joins the party: one deterministic evolved update
    # (new column, winning seq) lands after the random walk — it must
    # survive whatever compaction/rescale state the walk left behind
    exp = expected_final_state(spec)
    victim = exp.sort_values(["repo", "path"]).iloc[0]
    evolved = spark.createDataFrame(
        [("U", 10**9, victim["repo"], victim["path"], None, "py", "evolved!", 42)],
        "op string, seq long, repo string, path string, commit string, "
        "lang string, content string, size_bytes long",
    )
    merge_into(spark, table, evolved, query_id="fuzz-evo", epoch=0,
               mode=rng.choice(["cow", "mor"]))
    exp.loc[
        (exp["repo"] == victim["repo"]) & (exp["path"] == victim["path"]), "content"
    ] = "evolved!"

    # drain any in-flight migration and fold remaining deltas
    compact(spark, table)
    assert table.migration_status()["migrated"]

    res = verify_state(spark, table, spark.createDataFrame(exp))
    assert res["ok"], (seed, res, table.stats())
    row = (
        table.snapshot(spark)
        .filter(
            (F.col("repo") == victim["repo"]) & (F.col("path") == victim["path"])
        )
        .select("size_bytes")
        .collect()[0]
    )
    assert row["size_bytes"] == 42

    # metadata invariants held through the whole walk
    meta = table.current_metadata()
    assert meta["total_files"] == len(meta["files"])
    assert meta["total_rows"] == sum(f["rows"] for f in meta["files"])
    specs = meta["bucket_specs"]
    assert specs[-1] == meta["n_buckets"]
    assert all(b % a == 0 for a, b in zip(specs, specs[1:]))
