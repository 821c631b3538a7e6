"""Incremental vs full compaction: the epoch-latency-spike bench
(VERDICT r1 next-round #4).

Fixture = the realistic 100 TB shape: a LARGE cold base table, then update
waves hammering a SMALL hot key set (few distinct (repo, path) keys ->
few hash buckets dirty per wave). Every Kth update epoch compacts either
FULL (round-1 behavior: rewrite the whole table) or INCREMENTAL
(candidate buckets only). Prints per-epoch wall times and writes
BENCH/COMPACTION.md.

  python scripts/bench_compaction.py [--base-events 2000000] [--n-buckets 64]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_log(spec_kwargs: dict, log_dir: str) -> None:
    from forklift_spark.changelog import ChangelogSpec, generate_changelog

    if os.path.exists(os.path.join(log_dir, "_DONE")):
        return
    shutil.rmtree(log_dir, ignore_errors=True)
    generate_changelog(ChangelogSpec(**spec_kwargs), log_dir)
    open(os.path.join(log_dir, "_DONE"), "w").write("ok")


def run_variant(spark, base_log, update_log, workdir, variant: str,
                n_buckets: int, compact_every: int, n_epochs: int) -> dict:
    from forklift_spark.operators.merge import (
        compact,
        merge_into,
        select_compaction_candidates,
    )
    from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table

    root = os.path.join(workdir, f"tbl-{variant}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(root, n_buckets=n_buckets)

    # cold base: one big MOR load + full fold (setup; not measured)
    base = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{base_log}/seg-*.parquet")
    merge_into(spark, table, base, query_id=variant, epoch=0, mode="mor")
    compact(spark, table)

    segs = sorted(
        os.path.join(update_log, s)
        for s in os.listdir(update_log)
        if s.startswith("seg-")
    )
    per_epoch = max(1, len(segs) // n_epochs)
    chunks = [segs[i : i + per_epoch] for i in range(0, len(segs), per_epoch)]

    epoch_walls, compact_walls, compacted_buckets = [], [], []
    for i, chunk in enumerate(chunks):
        df = spark.read.schema(CHANGELOG_SCHEMA).parquet(*chunk)
        t0 = time.monotonic()
        merge_into(spark, table, df, query_id=variant, epoch=i + 1, mode="mor")
        cwall, nb = 0.0, 0
        if (i + 1) % compact_every == 0:
            t1 = time.monotonic()
            if variant == "full":
                res = compact(spark, table)
                nb = n_buckets
            else:
                cands = select_compaction_candidates(table)
                res = compact(spark, table, buckets=cands) if cands else {}
                nb = res.get("compacted_buckets", 0)
            del res
            cwall = time.monotonic() - t1
        epoch_walls.append(round(time.monotonic() - t0, 2))
        compact_walls.append(round(cwall, 2))
        compacted_buckets.append(nb)
    return {
        "variant": variant,
        "epoch_walls": epoch_walls,
        "compact_walls": compact_walls,
        "compacted_buckets": compacted_buckets,
        "max_epoch_wall": max(epoch_walls),
        "median_epoch_wall": sorted(epoch_walls)[len(epoch_walls) // 2],
        "total_compact_sec": round(sum(compact_walls), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-events", type=int, default=2_000_000)
    ap.add_argument("--update-events", type=int, default=240_000)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--n-epochs", type=int, default=12)
    ap.add_argument("--compact-every", type=int, default=3)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--workdir", default="/tmp/fk_compact_bench")
    args = ap.parse_args()

    from forklift_spark.session import get_spark

    os.makedirs(args.workdir, exist_ok=True)
    base_log = os.path.join(args.workdir, f"base-{args.base_events}")
    update_log = os.path.join(args.workdir, f"upd-{args.update_events}")
    gen_log(
        dict(
            n_events=args.base_events,
            n_repos=max(50, args.base_events // 20_000),
            paths_per_repo=400,
            hot_repo_fraction=0.2,
            op_mix=(1.0, 0.0, 0.0),
            segment_rows=max(10_000, args.base_events // 64),
            seed=42,
        ),
        base_log,
    )
    # hot wave: 2 repos x 8 paths = <=16 distinct keys -> few dirty buckets,
    # seqs start above the base so the updates win LWW
    gen_log(
        dict(
            n_events=args.update_events,
            n_repos=2,
            paths_per_repo=8,
            hot_repo_fraction=0.5,
            op_mix=(0.2, 0.8, 0.0),
            segment_rows=max(2_000, args.update_events // 48),
            seed=43,
            seq_start=args.base_events + 1,
        ),
        update_log,
    )

    spark = get_spark(app_name="fk-compact-bench", cores=args.cores,
                      shuffle_partitions=2 * args.cores, driver_memory="12g")

    results = [
        run_variant(spark, base_log, update_log, args.workdir, v,
                    args.n_buckets, args.compact_every, args.n_epochs)
        for v in ("full", "incremental")
    ]
    print(json.dumps(results, indent=2))

    full, inc = results
    lines = [
        "# BENCH — incremental vs full compaction (epoch-latency spikes)",
        "",
        f"Setup: {args.base_events:,}-event cold base table ({args.n_buckets} "
        f"buckets, fully compacted), then {args.update_events:,} update events "
        f"over <=16 hot keys in {args.n_epochs} MOR epochs, compaction every "
        f"{args.compact_every} epochs, local[{args.cores}]. Epoch wall = merge "
        "+ (that epoch's) compaction. This is the 100 TB shape: the update "
        "wave is small and localized; the table is big.",
        "",
        "| variant | epoch walls (s) | compaction walls (s) | buckets rewritten per compaction | max epoch (s) | median epoch (s) | total compaction (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['variant']} | {r['epoch_walls']} | {r['compact_walls']} | "
            f"{r['compacted_buckets']} | {r['max_epoch_wall']} | "
            f"{r['median_epoch_wall']} | {r['total_compact_sec']} |"
        )
    spike_full = full["max_epoch_wall"] / max(full["median_epoch_wall"], 0.01)
    spike_inc = inc["max_epoch_wall"] / max(inc["median_epoch_wall"], 0.01)
    lines += [
        "",
        f"Latency-spike ratio (max/median epoch wall): full = {spike_full:.2f}x, "
        f"incremental = {spike_inc:.2f}x; total compaction I/O time "
        f"{full['total_compact_sec']}s -> {inc['total_compact_sec']}s.",
        "",
        "Full compaction rewrites every bucket on each trigger — its cost grows "
        "with TABLE size, so at 100 TB the Kth epoch stalls for a full-table "
        "rewrite. Incremental compaction (`select_compaction_candidates`: "
        ">4 delta files or deltas >= 20% of base rows, planned driver-side "
        "from file metadata alone) rewrites only the hot buckets, so the "
        "spike is bounded by the update wave's key locality regardless of "
        "table size. State equality of the two paths is pytest-enforced "
        "(tests/test_round2.py); this bench measures latency only.",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH", "COMPACTION.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
