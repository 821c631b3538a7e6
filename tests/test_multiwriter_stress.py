"""VERDICT r3 #10: process-level multi-writer stress — the r3 threaded
race test promoted to real OS processes (separate interpreters / JVMs)
with SIGKILL fuzzing against the rebase + crash-orphan-reclaim loop.

The pytest gate runs a handful of seeds at each level; the full 20-seed
fuzz is scripts/stress_multiwriter.py (results recorded in
BENCH/STRESS_MULTIWRITER.md)."""

import sys

sys.path.insert(0, "/root/repo/scripts")

from stress_multiwriter import run_meta_seed, run_spark_seed  # noqa: E402


def test_two_process_metadata_commits_survive_sigkill_fuzzing(tmp_path):
    """Two worker PROCESSES append-committing to one 4-bucket table with
    overlapping buckets; worker A is SIGKILLed up to 3x mid-run and
    restarted. Every epoch of both writers lands exactly once (no lost
    update, no duplicate), markers close, counters stay exact."""
    for seed in range(4):
        r = run_meta_seed(seed, epochs=20, workdir=str(tmp_path / f"s{seed}"))
        assert r["ok"], r


def test_two_jvm_cow_replay_sigkill_converges_sha_exact(tmp_path):
    """Two Spark JVMs replay disjoint halves (seq parity) of one change
    log through contended COW merges; one JVM is SIGKILLed mid-replay and
    restarted. The converged table is sha-exact vs the whole-log LWW
    oracle — cross-process confluence, crash included."""
    r = run_spark_seed(0, n_events=20_000, workdir=str(tmp_path / "spark0"))
    assert r["ok"], r
