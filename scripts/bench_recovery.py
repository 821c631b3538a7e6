"""Recovery-after-kill bench: SIGKILL the replay mid-stream, restart from
the same checkpoint, measure time-to-first-recommit and verify the final
state is still sha256-exact (exactly-once across a hard crash).

  python scripts/bench_recovery.py            # orchestrates kill + resume
Writes BENCH/RECOVERY.md.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_EVENTS = 800_000
WORKDIR = "/tmp/fk_recovery"


def child(kill_mode: bool) -> None:
    """Run the replay; in kill_mode the parent SIGKILLs us mid-flight."""
    from forklift_spark.changelog import ChangelogSpec, expected_final_state, generate_changelog
    from forklift_spark.session import get_spark
    from forklift_spark.streaming.ingest import (
        create_entity_table,
        open_or_create_entity_table,
        run_ingest,
        verify_state,
    )

    spec = ChangelogSpec(
        n_events=N_EVENTS, n_repos=40, paths_per_repo=100,
        duplicate_fraction=0.02, segment_rows=N_EVENTS // 64, seed=42,
    )
    log_dir = os.path.join(WORKDIR, "log")
    if not os.path.exists(os.path.join(log_dir, "_DONE")):
        generate_changelog(spec, log_dir)
        open(os.path.join(log_dir, "_DONE"), "w").write("ok")

    spark = get_spark(cores=8, shuffle_partitions=16, driver_memory="8g")
    table_root = os.path.join(WORKDIR, "table")
    ckpt = os.path.join(WORKDIR, "ckpt")
    table = open_or_create_entity_table(table_root, n_buckets=16)

    t0 = time.monotonic()
    report = run_ingest(
        spark, log_dir, table, ckpt, query_id="recov",
        max_files_per_trigger=4, mode="cow",
    )
    out = {
        "phase": "kill" if kill_mode else "resume",
        "epochs_run": len(report.epochs),
        "epochs_skipped": sum(1 for e in report.epochs if e.skipped),
        "first_commit_sec": round(
            (report.epochs[0].wall_sec if report.epochs else 0.0), 3
        ),
        "wall_sec": round(time.monotonic() - t0, 3),
    }
    if not kill_mode:
        import pandas as pd  # noqa: F401 — spark createDataFrame of oracle

        exp = spark.createDataFrame(expected_final_state(spec))
        ver = verify_state(spark, table, exp)
        out["sha_exact"] = ver["ok"]
        out["final_rows"] = ver["total"]
    print("RESULT " + json.dumps(out), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", choices=["kill", "resume"], default=None)
    ap.add_argument("--kill-after", type=float, default=25.0)
    args = ap.parse_args()
    if args.child:
        child(args.child == "kill")
        return

    import shutil

    shutil.rmtree(WORKDIR, ignore_errors=True)
    os.makedirs(WORKDIR, exist_ok=True)

    # phase 1: start the replay, SIGKILL it mid-flight (no cleanup runs)
    p = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", "kill"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    time.sleep(args.kill_after)
    killed_at = time.monotonic()
    os.kill(p.pid, signal.SIGKILL)
    p.wait()
    print(f"killed replay after {args.kill_after}s", flush=True)

    # phase 2: resume from the same checkpoint; time to converged state
    t0 = time.monotonic()
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", "resume"],
        cwd=REPO, capture_output=True, text=True,
    )
    resume_wall = time.monotonic() - t0
    result = None
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    if result is None:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-3000:])
        raise RuntimeError("resume child produced no RESULT")

    report = {
        "metric": "recovery_after_kill",
        "kill_after_sec": args.kill_after,
        "resume_total_sec": round(resume_wall, 2),
        "resume_replay_sec": result["wall_sec"],
        "epochs_rerun_or_new": result["epochs_run"],
        "epochs_skipped_as_committed": result["epochs_skipped"],
        "sha_exact_after_recovery": result["sha_exact"],
        "final_rows": result["final_rows"],
        "dead_time_sec": round(resume_wall - result["wall_sec"], 2),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "RECOVERY.md"), "w") as f:
        f.write(
            "# BENCH — recovery after SIGKILL\n\n"
            f"Replay of {N_EVENTS:,} events (cow mode, 16 micro-batches) was "
            f"SIGKILLed {args.kill_after}s in, then restarted with the same "
            "checkpoint. Spark replays the uncommitted batch; the lakette "
            "epoch markers make any already-committed epoch a no-op, so the "
            "final state is identical to an uninterrupted run.\n\n"
            "```json\n" + json.dumps(report, indent=2) + "\n```\n"
        )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
