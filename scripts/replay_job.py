"""spark-submit entry: replay a generated change log into a lakette table
and print ONE JSON line with sustained throughput.

Run (the cluster-size proxy — master comes from spark-submit, never set here).
The --py-files zip is BUILT AT USE TIME from the current source (ADVICE r4
#3: a committed artifact goes stale the moment source changes, silently
shipping outdated executor-side code — mapInPandas helpers are imported by
name inside Python workers):

  ZIP=$(python -c "from scripts.bench_scaling import make_pyfiles_zip; print(make_pyfiles_zip())")
  spark-submit --master local[8]  --py-files "$ZIP" \
      scripts/replay_job.py --log-dir /tmp/fk_scale/log --workdir /tmp/fk_scale/run8 \
      --cores 8 --mode mor --epochs 8

Timing covers the full streaming replay (availableNow micro-batches through
foreachBatch merge) plus compaction for merge-on-read; changelog generation
and sha256 verification are excluded (setup / check, not pipeline).

Throughput is reported two ways:
  events_per_sec            — whole replay wall (includes stream startup)
  sustained_events_per_sec  — excluding the warm-up epoch, per the protocol
                              in BASELINE.md ("sustained" is the metric)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_session(cores: int):
    """Session for spark-submit: the master is whatever --master said."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"forklift-replay-{cores}")
        # 2x cores: smooths straggler tails without flooding tiny tasks
        .config("spark.sql.shuffle.partitions", str(2 * cores))
        # bench segments are ~5 MB; keep scan splits ~ one file so scan
        # parallelism is file-count-, not 128MB-split-, bound
        .config("spark.sql.files.maxPartitionBytes", "16m")
        # keep file listing on the driver: with >32 files Spark otherwise
        # launches a cluster-wide listing job per source resolution/batch,
        # which serializes the whole replay behind tiny listing tasks
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "100000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-dir", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--mode", default="mor", choices=["mor", "cow"])
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--n-events", type=int, required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no-batch-dedupe", action="store_true",
                    help="MOR fast path: skip the in-batch dedupe shuffle")
    ap.add_argument("--dedupe-strategy", default="agg", choices=["agg", "prefilter"],
                    help="prefilter = argmax-by-reference: payload bytes never "
                         "shuffle for losing rows (wide-row COW optimization)")
    ap.add_argument("--no-compact", action="store_true",
                    help="skip the post-replay fold-compact: the SUSTAINED "
                         "metric (the scored basis) is computed from the "
                         "per-epoch ingest metrics and never included the "
                         "compact; skipping it only changes the secondary "
                         "whole-wall figure (disclosed where used)")
    ap.add_argument("--verify", default="spark",
                    choices=["spark", "cached", "pandas", "skip"])
    ap.add_argument("--expected-dir", default=None,
                    help="with --verify cached: parquet of the pre-computed "
                         "expected final state (bench_scaling computes it "
                         "once at full parallelism; sha verification is "
                         "still run per trial, just not the 24M-row oracle "
                         "argmax on this trial's core count)")
    args = ap.parse_args()

    from forklift_spark.changelog import expected_final_state_chunked
    from forklift_spark.operators.merge import compact, read_metrics
    from forklift_spark.streaming.ingest import (
        create_entity_table,
        expected_final_state_spark,
        run_ingest,
        verify_state,
    )
    from scripts.gen_scale_log import make_spec

    spark = build_session(args.cores)

    def read_steal() -> int:
        """Cumulative host-steal jiffies (VM noise evidence for the report)."""
        try:
            with open("/proc/stat") as f:
                return int(f.readline().split()[8])
        except (OSError, IndexError, ValueError):
            return -1

    steal0 = read_steal()
    n_segments = len([s for s in os.listdir(args.log_dir) if s.startswith("seg-")])
    table_root = os.path.join(args.workdir, "table")
    ckpt = os.path.join(args.workdir, "ckpt")
    shutil.rmtree(table_root, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    table = create_entity_table(table_root, n_buckets=2 * args.cores)

    files_per_trigger = max(1, n_segments // args.epochs)
    t0 = time.monotonic()
    report = run_ingest(
        spark,
        args.log_dir,
        table,
        ckpt,
        query_id="scale",
        max_files_per_trigger=files_per_trigger,
        mode=args.mode,
        dedupe_in_batch=not args.no_batch_dedupe,
        dedupe_strategy=args.dedupe_strategy,
    )
    if args.mode == "mor" and not args.no_compact:
        compact(spark, table)
    wall = time.monotonic() - t0

    metrics = [m for m in read_metrics(table) if m["query_id"] == "scale"]
    warm = metrics[0] if metrics else {"batch_rows": 0, "wall_sec": 0.0}
    sustained_events = sum(m["batch_rows"] for m in metrics[1:])
    sustained_wall = wall - warm["wall_sec"]
    result = {
        "cores": args.cores,
        "mode": args.mode,
        "batch_dedupe": not args.no_batch_dedupe,
        "dedupe_strategy": args.dedupe_strategy,
        "events": args.n_events,
        "replay_wall_sec": round(wall, 3),
        "events_per_sec": round(args.n_events / wall, 1),
        "sustained_events_per_sec": round(sustained_events / sustained_wall, 1)
        if sustained_wall > 0
        else 0.0,
        "epochs": len(report.epochs),
        "epoch_events_per_sec": [m["events_per_sec"] for m in metrics],
        "epoch_wall_sec": [m["wall_sec"] for m in metrics],
        "host_steal_jiffies": (read_steal() - steal0) if steal0 >= 0 else None,
    }
    if args.verify != "skip":
        if args.verify == "cached":
            exp = spark.read.parquet(args.expected_dir)
        elif args.verify == "spark":
            exp = expected_final_state_spark(spark, args.log_dir)
        else:
            # chunk-aware: the bench log comes from generate_changelog_chunked,
            # whose per-chunk reseeding a single-shot oracle would not match
            exp = spark.createDataFrame(
                expected_final_state_chunked(make_spec(args.n_events, seed=args.seed))
            )
        ver = verify_state(spark, table, exp)
        result["sha_exact"] = ver["ok"]
        result["final_rows"] = ver["total"]
    print("RESULT " + json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
