"""Online-rescale bench: what does growing n_buckets cost the ingest loop?

A LARGE seeded table (millions of keys) takes a stream of small update
epochs; halfway through operations, the table grows 8 -> 32 buckets by one
of two paths:

  online  — table.rescale(32): ONE metadata-only commit (round-3 growth
            path); old-spec files migrate as the ingest loop's normal
            incremental compaction touches their key groups, and a final
            drain compact folds the rest (schedulable, bounded)
  rewrite — compact(spark, table, n_buckets=32): the full-table rewrite
            (round-2 growth path) — correct, but its wall time is
            proportional to TABLE size, not to the change rate; at 100 TB
            that is a stop-the-world cluster job

Reported: the grow-step wall itself (the headline — O(metadata) vs
O(table)), per-epoch merge walls before/after (steady state must not
slow), migration drain cost, and sha-exact verification of BOTH final
states against the whole-log LWW oracle.

  python scripts/bench_rescale.py [--seed-events 4000000] [--upd-events 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_REPOS = 3_000
PATHS_PER_REPO = 500  # 1.5M distinct keys


def gen_log(workdir: str, seed_events: int, upd_events: int, upd_epochs: int) -> str:
    """One log dir: an insert-only seed wave, then `upd_epochs` update/delete
    waves with consecutive seq ranges (each wave = one ingest epoch)."""
    from forklift_spark.changelog import ChangelogSpec, generate_changelog_chunked

    log_dir = os.path.join(workdir, f"log-{seed_events}-{upd_events}x{upd_epochs}")
    if os.path.isdir(log_dir) and os.listdir(log_dir):
        return log_dir
    base = dict(
        n_repos=N_REPOS, paths_per_repo=PATHS_PER_REPO, hot_repo_fraction=0.1,
        duplicate_fraction=0.02, disorder_window=512, content_tokens_max=32,
        segment_rows=250_000,
    )
    seed_spec = ChangelogSpec(
        n_events=seed_events, op_mix=(1.0, 0.0, 0.0), seed=11, seq_start=1, **base
    )
    g = generate_changelog_chunked(seed_spec, log_dir)
    seg = len(g.segments)
    seq = 1 + seed_events
    for i in range(upd_epochs):
        spec = ChangelogSpec(
            n_events=upd_events, op_mix=(0.1, 0.8, 0.1), seed=100 + i,
            seq_start=seq, **base,
        )
        from forklift_spark.changelog import generate_changelog

        gi = generate_changelog(spec, log_dir, segment_start=seg)
        seg += len(gi.segments)
        seq += upd_events
    return log_dir


def run_case(spark, log_dir, tmp, name, grow, *, seed_events, upd_events, upd_epochs):
    from pyspark.sql import functions as F

    from forklift_spark.operators.merge import (
        compact,
        merge_into,
        select_compaction_candidates,
    )
    from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table

    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-*.parquet")
    root = os.path.join(tmp, f"tbl_{name}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(root, n_buckets=8)

    t0 = time.monotonic()
    merge_into(spark, table, df.filter(F.col("seq") <= seed_events),
               query_id=f"seed_{name}", epoch=0, mode="mor")
    compact(spark, table)
    seed_wall = round(time.monotonic() - t0, 3)

    walls, specs_series = [], []
    grow_wall = None
    grow_at = upd_epochs // 2 - 1
    for i in range(upd_epochs):
        lo = seed_events + i * upd_events
        hi = lo + upd_events
        batch = df.filter((F.col("seq") > lo) & (F.col("seq") <= hi))
        t0 = time.monotonic()
        merge_into(spark, table, batch, query_id=f"u_{name}", epoch=i, mode="mor")
        cands = select_compaction_candidates(table)
        if cands:
            compact(spark, table, buckets=cands)
        walls.append(round(time.monotonic() - t0, 3))
        if i == grow_at:
            t0 = time.monotonic()
            grow(table)
            grow_wall = round(time.monotonic() - t0, 3)
        specs_series.append(table.migration_status()["files_by_spec"])
    t0 = time.monotonic()
    if not table.migration_status()["migrated"]:
        compact(spark, table)
    drain_wall = round(time.monotonic() - t0, 3)
    return table, {
        "case": name,
        "seed_wall_sec": seed_wall,
        "epoch_wall_sec": walls,
        "grow_wall_sec": grow_wall,
        "drain_wall_sec": drain_wall,
        "grow_at_epoch": grow_at + 1,
        "final_n_buckets": table.n_buckets(),
        "migrated": table.migration_status()["migrated"],
        "files_by_spec_series": specs_series,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed-events", type=int, default=4_000_000)
    ap.add_argument("--upd-events", type=int, default=200_000)
    ap.add_argument("--upd-epochs", type=int, default=10)  # min 2 (grow happens mid-run)
    ap.add_argument("--workdir", default="/tmp/fk_rescale_bench")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    ap.add_argument("--out", default=os.path.join("BENCH", "RESCALE.md"))
    args = ap.parse_args()

    from forklift_spark.operators.merge import compact
    from forklift_spark.session import get_spark
    from forklift_spark.streaming.ingest import (
        expected_final_state_spark,
        verify_state,
    )

    if args.upd_epochs < 2:
        ap.error("--upd-epochs must be >= 2 (the grow step happens mid-run)")
    os.makedirs(args.workdir, exist_ok=True)
    log_dir = gen_log(args.workdir, args.seed_events, args.upd_events, args.upd_epochs)
    spark = get_spark(
        app_name="bench-rescale", cores=args.cpus,
        shuffle_partitions=max(8, args.cpus), driver_memory="24g",
    )

    results = []
    for name, grow in (
        ("online", lambda t: t.rescale(32)),
        ("rewrite", lambda t: compact(spark, t, n_buckets=32)),
    ):
        table, res = run_case(
            spark, log_dir, args.workdir, name, grow,
            seed_events=args.seed_events, upd_events=args.upd_events,
            upd_epochs=args.upd_epochs,
        )
        exp = expected_final_state_spark(spark, log_dir)
        res["sha_exact"] = verify_state(spark, table, exp)["ok"]
        res["final_rows"] = table.stats()["total_rows"]
        results.append(res)
        print(json.dumps(res))

    on, rw = results
    g = on["grow_at_epoch"]
    lines = [
        "# BENCH — online rescale vs full-rewrite re-bucket (8 -> 32)",
        "",
        f"Seeded table: {on['final_rows']:,} live rows ({args.seed_events:,} insert",
        f"events over {N_REPOS * PATHS_PER_REPO:,} keys, compacted). Then",
        f"{args.upd_epochs} merge-on-read update epochs of {args.upd_events:,} events",
        f"each with the ingest loop's normal incremental compaction; growth",
        f"happens after epoch {g}. Both cases end sha-exact vs the whole-log",
        f"LWW oracle: online={on['sha_exact']}, rewrite={rw['sha_exact']}.",
        "",
        "The headline is the GROW STEP itself — the online path is one",
        "metadata-only commit regardless of table size, while the rewrite",
        "path rewrites every live row (its wall scales with the table, not",
        "the change rate — at 100 TB it is a stop-the-world cluster job):",
        "",
        "| case | grow-step wall (s) | epoch wall before grow (mean s) | epoch wall after grow (mean s) | post-run migration drain (s) | migrated | sha-exact |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in (on, rw):
        pre = r["epoch_wall_sec"][:g]
        post = r["epoch_wall_sec"][g:]
        lines.append(
            f"| {r['case']} | **{r['grow_wall_sec']}** | "
            f"{sum(pre)/len(pre):.2f} | {sum(post)/len(post):.2f} | "
            f"{r['drain_wall_sec']} | {r['migrated']} | {r['sha_exact']} |"
        )
    lines += [
        "",
        "Per-epoch walls (s) — steady state does not slow through the",
        "mixed-spec window; the online case pays a bounded, schedulable",
        "drain at the end instead of a spike in the middle:",
        "",
        f"- online:  {on['epoch_wall_sec']}",
        f"- rewrite: {rw['epoch_wall_sec']}",
        "",
        "Live files per bucket spec after each online epoch (the old spec",
        "drains as incremental compaction touches its key groups):",
        "",
        f"- {on['files_by_spec_series']}",
        "",
        "Raw JSON:",
        "",
        "```json",
        json.dumps({"cases": results}),
        "```",
        "",
    ]
    out = os.path.join(REPO, args.out)
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({
        "metric": "rescale_grow_step_sec",
        "online": on["grow_wall_sec"],
        "rewrite": rw["grow_wall_sec"],
        "sha_exact": on["sha_exact"] and rw["sha_exact"],
    }))


if __name__ == "__main__":
    main()
