"""Online-rescale bench: what does growing n_buckets cost the ingest loop?

Two tables replay the SAME changelog in identical epochs; halfway through,
each grows 8 -> 32 buckets by a different path:

  online  — table.rescale(32): one metadata-only commit; migration rides
            the remaining COW epochs + the ingest loop's incremental
            compaction (the round-3 growth path)
  rewrite — compact(spark, table, n_buckets=32): the full-table rewrite
            (the round-2 growth path), correct but stop-the-world

Reported: per-epoch merge wall for both cases, the grow-step wall itself,
migration progress (live files per bucket spec), and sha-exact verification
of BOTH final states against the whole-log LWW oracle. The claim under
test: the online path removes the stop-the-world spike without slowing
steady-state epochs, at the price of bounded extra write amplification in
the epochs that migrate their key groups.

  python scripts/bench_rescale.py [--n-events 4000000] [--epochs 16]
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


def run_case(spark, df, tmp, name, grow, *, epochs, grow_at):
    from forklift_spark.operators.merge import (
        compact,
        merge_into,
        select_compaction_candidates,
    )
    from forklift_spark.streaming.ingest import create_entity_table

    from pyspark.sql import functions as F

    root = os.path.join(tmp, f"tbl_{name}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(root, n_buckets=8)
    walls, specs_series = [], []
    grow_wall = None
    for i in range(epochs):
        batch = df.filter(F.pmod("seq", F.lit(epochs)) == i)
        t0 = time.monotonic()
        merge_into(spark, table, batch, query_id=f"b_{name}", epoch=i, mode="cow")
        walls.append(round(time.monotonic() - t0, 3))
        if i == grow_at:
            t0 = time.monotonic()
            grow(table)
            grow_wall = round(time.monotonic() - t0, 3)
        # the ingest loop's normal incremental compaction keeps migrating
        cands = select_compaction_candidates(table)
        if cands:
            compact(spark, table, buckets=cands)
        ms = table.migration_status()
        specs_series.append(ms["files_by_spec"])
    # drain whatever migration remains, timed separately
    t0 = time.monotonic()
    if not table.migration_status()["migrated"]:
        compact(spark, table)
    drain_wall = round(time.monotonic() - t0, 3)
    return table, {
        "case": name,
        "epoch_wall_sec": walls,
        "grow_wall_sec": grow_wall,
        "drain_wall_sec": drain_wall,
        "final_n_buckets": table.n_buckets(),
        "migrated": table.migration_status()["migrated"],
        "files_by_spec_series": specs_series,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-events", type=int, default=4_000_000)
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--workdir", default="/tmp/fk_rescale_bench")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    ap.add_argument("--out", default=os.path.join("BENCH", "RESCALE.md"))
    args = ap.parse_args()

    from forklift_spark.changelog import ChangelogSpec, generate_changelog_chunked
    from forklift_spark.session import get_spark
    from forklift_spark.streaming.ingest import (
        CHANGELOG_SCHEMA,
        expected_final_state_spark,
        verify_state,
    )

    os.makedirs(args.workdir, exist_ok=True)
    log_dir = os.path.join(args.workdir, f"log-{args.n_events}")
    if not os.path.isdir(log_dir) or not os.listdir(log_dir):
        spec = ChangelogSpec(
            n_events=args.n_events, n_repos=200, paths_per_repo=120,
            hot_repo_fraction=0.2, duplicate_fraction=0.02,
            disorder_window=512, seed=11, content_tokens_max=48,
            segment_rows=250_000,
        )
        generate_changelog_chunked(spec, log_dir)

    spark = get_spark(
        app_name="bench-rescale", cores=args.cpus,
        shuffle_partitions=max(8, args.cpus), driver_memory="24g",
    )
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{log_dir}/seg-*.parquet")
    grow_at = args.epochs // 2 - 1

    results = []
    for name, grow in (
        ("online", lambda t: t.rescale(32)),
        ("rewrite", lambda t: __import__("forklift_spark.operators.merge", fromlist=["compact"]).compact(spark, t, n_buckets=32)),
    ):
        table, res = run_case(
            spark, df, args.workdir, name, grow,
            epochs=args.epochs, grow_at=grow_at,
        )
        exp = expected_final_state_spark(spark, log_dir)
        res["sha_exact"] = verify_state(spark, table, exp)["ok"]
        results.append(res)
        print(json.dumps(res))

    on, rw = results
    lines = [
        "# BENCH — online rescale vs full-rewrite re-bucket (8 -> 32)",
        "",
        f"Same {args.n_events:,}-event changelog, {args.epochs} identical COW",
        f"epochs per case, growth after epoch {grow_at + 1}; the ingest loop runs",
        "its normal incremental compaction every epoch. Both cases end",
        f"sha-exact vs the whole-log LWW oracle: online={on['sha_exact']},",
        f"rewrite={rw['sha_exact']}.",
        "",
        "| case | grow-step wall (s) | epoch wall before grow (mean s) | epoch wall after grow (mean s) | post-run drain (s) | migrated |",
        "|---|---|---|---|---|---|",
    ]
    for r in (on, rw):
        pre = r["epoch_wall_sec"][: grow_at + 1]
        post = r["epoch_wall_sec"][grow_at + 1 :]
        lines.append(
            f"| {r['case']} | {r['grow_wall_sec']} | "
            f"{sum(pre)/len(pre):.2f} | {sum(post)/len(post):.2f} | "
            f"{r['drain_wall_sec']} | {r['migrated']} |"
        )
    lines += [
        "",
        "Per-epoch merge wall (s):",
        "",
        f"- online:  {on['epoch_wall_sec']}",
        f"- rewrite: {rw['epoch_wall_sec']}",
        "",
        "Live files per bucket spec after each epoch (online case — the",
        "old spec drains as COW epochs + incremental compaction migrate the",
        "key groups they touch, then the post-run drain folds the rest):",
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
