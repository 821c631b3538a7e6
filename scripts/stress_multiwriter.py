"""Process-level multi-writer stress (VERDICT r3 #10): two OS processes
(separate interpreters / separate JVMs) committing to ONE lakette table
with overlapping buckets, under SIGKILL fuzzing — promotes the r3
threaded race test to real process isolation against the rebase loop.

Two levels:

  --level meta   (default) N seeded runs of the pure METADATA protocol:
                 two worker processes each land `--epochs` append commits
                 (distinct query_ids, shared 4-bucket table, every commit
                 conflicts-and-rebases against the other writer), while
                 the parent SIGKILLs one worker mid-run and restarts it
                 (resume = epoch markers + writer-stamp gate + crash-
                 orphan reclaim). Milliseconds per run -> 20 seeds by
                 default, the fuzz coverage level.
  --level spark  full-engine runs: two spark-submit-style workers
                 (local[4] JVMs) replay DISJOINT HALVES of one change log
                 (split by seq parity -> every repo/path is contended)
                 through COW merge_into with conflict retry; the parent
                 SIGKILLs worker A mid-replay and restarts it. Final
                 state must be sha-exact vs the whole-log LWW oracle —
                 confluence across processes, crashes included.

Invariants checked per run (meta level):
  * every epoch of both writers committed EXACTLY once (file-entry count,
    version number arithmetic, no duplicate paths)
  * epoch markers / writer stamps closed for every epoch
  * maintained counters equal a from-scratch manifest recount
Spark level: verify_state(ok) — per-row sha256 equality vs the oracle.

Usage:
  python scripts/stress_multiwriter.py --level meta --seeds 20
  python scripts/stress_multiwriter.py --level spark --seeds 3
(worker modes --meta-worker / --spark-worker are internal.)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import random
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --------------------------------------------------------------- workers


def meta_worker(
    root: str, qid: str, epochs: int, seed: int, bucket_base: int | None = None
) -> None:
    """`bucket_base` pins this writer to buckets [base, base+2) — the txn
    stress uses it to keep background traffic provably disjoint from the
    transaction's footprint (so publishes rebase instead of conflicting)."""
    from forklift_spark.lakette.table import CommitConflictError, LaketteTable

    rng = random.Random(seed)
    t = LaketteTable(root)
    for e in range(epochs):
        if t.epoch_committed(qid, e):
            continue
        entry = {
            "path": f"data/{qid}-{e:04d}.parquet",
            "bucket": (
                bucket_base + rng.randrange(2)
                if bucket_base is not None
                else rng.randrange(4)
            ),
            "rows": 1,
            "delta": True,
            "kmin": None,
            "kmax": None,
            "smax": e,
        }
        for _attempt in range(200):
            base = t._raw_current()["version"]
            try:
                c = t.commit_version(
                    new_files=[entry],
                    replaced_buckets=set(),
                    writer={"query_id": qid, "epoch": e},
                    base_version=base,
                )
                t.write_epoch_marker(qid, e, c.snapshot_id)
                break
            except CommitConflictError:
                if t.epoch_committed(qid, e):
                    break  # our own crash-window stamp, or a twin landed it
                time.sleep(0.002 * rng.random())
        else:
            raise RuntimeError(f"{qid} epoch {e}: rebase never converged")


def txn_worker(workdir: str, epochs: int, seed: int) -> None:
    """Multi-table transaction publisher under SIGKILL fuzzing: per epoch,
    settle predecessors' debris (recover_transactions), assert NO TORN
    EPOCH survived recovery (the atomicity invariant this stress exists
    to check), drop own stale staged twins, stage one metadata entry per
    table (buckets 0-1 — a concurrent background writer owns 2-3, so
    publishes REBASE over its commits rather than conflict), publish
    transactionally."""
    from forklift_spark.lakette.table import LaketteTable
    from forklift_spark.lakette.txn import (
        _writer_published_version,
        publish_transaction,
        recover_transactions,
    )

    rng = random.Random(seed)
    tables = [LaketteTable(os.path.join(workdir, n)) for n in ("ta", "tb")]
    tmap = {t.root: t for t in tables}
    txn_dir = os.path.join(workdir, "txns")
    qid = "T"
    for e in range(epochs):
        recover_transactions(txn_dir, tables=tmap, grace_seconds=0)
        stamped = [
            _writer_published_version(t, {"query_id": qid, "epoch": e})
            is not None
            for t in tables
        ]
        if all(stamped):
            continue
        if any(stamped):
            raise RuntimeError(f"TORN epoch {e} survived recovery: {stamped}")
        members = []
        for t in tables:
            for rec in t.list_staged():
                w = rec.get("writer") or {}
                if w.get("query_id") == qid and w.get("epoch") == e:
                    t.abort_staged(rec["stage_id"])  # crashed attempt's twin
            sid = t.stage_commit(
                new_files=[{
                    "path": f"data/{qid}-{e:04d}.parquet",
                    "bucket": rng.randrange(2), "rows": 1, "delta": True,
                    "kmin": None, "kmax": None, "smax": e,
                }],
                replaced_buckets=set(),
                writer={"query_id": qid, "epoch": e},
            )
            members.append((t, sid))
        publish_transaction(members, txn_dir)


def vacuum_worker(root: str, duration: float) -> None:
    """Maintenance loop racing the writers: vacuum with the documented
    grace window (nothing younger than grace is ever collected, so live
    commits are safe BY CONTRACT) plus epoch-marker retention. The stress
    asserts this loop survives arbitrary interleavings with two committing
    writers without corrupting state or dying."""
    from forklift_spark.lakette.table import LaketteTable

    t = LaketteTable(root)
    end = time.monotonic() + duration
    while time.monotonic() < end:
        t.vacuum(keep_versions=2, grace_seconds=300)
        t.expire_epochs(keep_last=1000)
        time.sleep(0.05)


def spark_worker(root: str, log_dir: str, qid: str) -> None:
    from forklift_spark.lakette.table import CommitConflictError, LaketteTable
    from forklift_spark.operators.merge import merge_into
    from forklift_spark.session import get_spark
    from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA

    spark = get_spark(
        app_name=f"stress-{qid}", cores=4, shuffle_partitions=8,
        driver_memory="3g",
    )
    table = LaketteTable(root)
    segs = sorted(glob.glob(os.path.join(log_dir, "seg-*.parquet")))
    for e, seg in enumerate(segs):
        if table.epoch_committed(qid, e):
            continue
        df = spark.read.schema(CHANGELOG_SCHEMA).parquet(seg)
        for _attempt in range(60):
            try:
                merge_into(spark, table, df, query_id=qid, epoch=e, mode="cow")
                break
            except CommitConflictError:
                if table.epoch_committed(qid, e):
                    break
                time.sleep(0.05)
        else:
            raise RuntimeError(f"{qid} epoch {e}: merge never converged")


def run_memvac_seed(seed: int, epochs: int = 20, duration: float = 6.0) -> dict:
    """VERDICT r4 #7 — level `memvac`: the eventual-VISIBILITY race under
    MULTI-writer + concurrent-vacuum pressure, which posix cannot express.
    MemoryStorage is in-process, so this level is threaded (the metadata
    protocol has no JVM side): two writer threads land `epochs` commits
    each (shared 4-bucket table, every commit rebases against the other),
    a vacuum/retention thread runs continuously, and a chaos thread keeps
    arming `delay_visibility` on version files / CURRENT / markers and
    settling the store on a random cadence — so writers and vacuum keep
    observing a store where freshly-PUT objects are not yet listable.

    Contract under test: transient FileNotFoundError is the documented
    reader-side retry surface (a hidden CURRENT target); the GRACE window
    protects not-yet-referenced manifests/data from a racing vacuum; and
    once the store settles, the table must hold every epoch exactly once
    with counters equal to a from-scratch recount. Vacuum dying on any
    NON-transient error fails the seed."""
    import threading

    from pyspark.sql import types as T

    from forklift_spark.lakette.storage import MemoryStorage
    from forklift_spark.lakette.table import (
        CommitConflictError,
        LaketteTable,
        _MANIFEST_CACHE,
    )

    rng = random.Random(seed)
    _MANIFEST_CACHE.clear()
    fs = MemoryStorage()
    schema = T.StructType(
        [T.StructField("repo", T.StringType()), T.StructField("path", T.StringType())]
    )
    LaketteTable.create(f"/mem/{seed}/tbl", schema, ["repo", "path"],
                        n_buckets=4, storage=fs)
    root = f"/mem/{seed}/tbl"
    stop = threading.Event()
    errors: list[str] = []

    def writer(qid: str) -> None:
        t = LaketteTable(root, storage=fs)
        w_rng = random.Random((seed, qid).__hash__())
        try:
            for e in range(epochs):
                for _ in range(4000):
                    try:
                        if t.epoch_committed(qid, e):
                            break
                        base = t._raw_current()["version"]
                        c = t.commit_version(
                            new_files=[{
                                "path": f"data/{qid}-{e:04d}.parquet",
                                "bucket": w_rng.randrange(4), "rows": 1,
                                "delta": True, "kmin": None, "kmax": None,
                                "smax": e,
                            }],
                            replaced_buckets=set(),
                            writer={"query_id": qid, "epoch": e},
                            base_version=base,
                        )
                        t.write_epoch_marker(qid, e, c.snapshot_id)
                        break
                    except FileNotFoundError:
                        time.sleep(0.002)  # hidden CURRENT target: retry
                    except CommitConflictError:
                        if t.epoch_committed(qid, e):
                            break
                        time.sleep(0.002 * w_rng.random())
                else:
                    raise RuntimeError(f"{qid} epoch {e} never converged")
        except Exception as ex:  # noqa: BLE001
            errors.append(f"writer {qid}: {type(ex).__name__}: {ex}")

    def vacuum_loop() -> None:
        t = LaketteTable(root, storage=fs)
        try:
            while not stop.is_set():
                try:
                    t.vacuum(keep_versions=2, grace_seconds=300)
                    t.expire_epochs(keep_last=1000)
                except FileNotFoundError:
                    pass  # hidden object mid-walk: the documented retry surface
                time.sleep(0.003)
        except Exception as ex:  # noqa: BLE001
            errors.append(f"vacuum: {type(ex).__name__}: {ex}")

    def chaos_loop() -> None:
        while not stop.is_set():
            fs.delay_visibility(rng.choice(["v", "CURRENT", ".json", "_epochs"]))
            time.sleep(0.004 + 0.01 * rng.random())
            if rng.random() < 0.8:
                fs.settle()

    threads = [
        threading.Thread(target=writer, args=("A",)),
        threading.Thread(target=writer, args=("B",)),
        threading.Thread(target=vacuum_loop, daemon=True),
        threading.Thread(target=chaos_loop, daemon=True),
    ]
    for th in threads:
        th.start()
    threads[0].join(timeout=duration * 10)
    threads[1].join(timeout=duration * 10)
    stop.set()
    threads[2].join(timeout=10)
    fs.settle()  # the network heals; verify the settled state

    t = LaketteTable(root, storage=fs)
    raw = t._raw_current()
    meta = t.current_metadata()
    paths = [f["path"] for f in meta["files"]]
    expected = {f"data/{q}-{e:04d}.parquet" for q in "AB" for e in range(epochs)}
    ok = (
        not errors
        and sorted(paths) == sorted(expected)   # exactly once, none lost
        and raw["version"] == 1 + 2 * epochs
        and all(t.epoch_committed(q, e) for q in "AB" for e in range(epochs))
        and t._bucket_stats(raw)
        == t._bucket_stats({k: v for k, v in raw.items() if k != "bucket_stats"})
    )
    return {"seed": seed, "ok": ok, "version": raw["version"],
            "files": len(paths), "errors": errors[:3]}


# --------------------------------------------------------------- parents


def _spawn(args: list[str]) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), *args],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )


def run_meta_seed(seed: int, epochs: int = 25, workdir: str | None = None) -> dict:
    from pyspark.sql import types as T

    from forklift_spark.lakette.table import LaketteTable

    rng = random.Random(seed)
    tmp = workdir or tempfile.mkdtemp(prefix=f"fk_stress_meta_{seed}_")
    root = os.path.join(tmp, "tbl")
    schema = T.StructType(
        [T.StructField("repo", T.StringType()), T.StructField("path", T.StringType())]
    )
    LaketteTable.create(root, schema, ["repo", "path"], n_buckets=4)

    def worker(qid: str) -> subprocess.Popen:
        return _spawn(
            ["--meta-worker", "--root", root, "--qid", qid,
             "--epochs", str(epochs), "--seed", str(seed)]
        )

    a, b = worker("A"), worker("B")
    kills = 0
    # SIGKILL worker A mid-run (possibly several times), restart each time
    deadline = time.monotonic() + 120
    while a.poll() is None and time.monotonic() < deadline:
        time.sleep(0.02 + 0.2 * rng.random())
        if a.poll() is None and kills < 3 and rng.random() < 0.5:
            a.send_signal(signal.SIGKILL)
            a.wait()
            kills += 1
            a = worker("A")
    rc_a = a.wait(timeout=120)
    rc_b = b.wait(timeout=120)

    t = LaketteTable(root)
    raw = t._raw_current()
    meta = t.current_metadata()
    paths = [f["path"] for f in meta["files"]]
    expected = {f"data/{q}-{e:04d}.parquet" for q in "AB" for e in range(epochs)}
    ok = (
        rc_a == 0
        and rc_b == 0
        and sorted(paths) == sorted(expected)   # exactly once, none lost
        and raw["version"] == 1 + 2 * epochs    # one commit per epoch
        and all(t.epoch_committed(q, e) for q in "AB" for e in range(epochs))
        and t._bucket_stats(raw)
        == t._bucket_stats({k: v for k, v in raw.items() if k != "bucket_stats"})
    )
    return {"seed": seed, "ok": ok, "kills": kills, "rc": (rc_a, rc_b),
            "version": raw["version"], "files": len(paths)}


def run_txn_seed(seed: int, epochs: int = 15, workdir: str | None = None) -> dict:
    """Two tables, one transaction publisher SIGKILLed up to 3 times and
    restarted, a concurrent disjoint-bucket background writer on table A.
    Invariants at the end (after a final recovery sweep): every txn epoch's
    writer stamp is present on BOTH chains (no torn epoch, exactly once),
    the background writer landed every epoch, no staged leftovers, no
    live (pending/committed) txn records, maintained counters exact."""
    from pyspark.sql import types as T

    from forklift_spark.lakette.table import LaketteTable
    from forklift_spark.lakette.txn import (
        _writer_published_version,
        recover_transactions,
    )

    rng = random.Random(seed ^ 0x7A)
    tmp = workdir or tempfile.mkdtemp(prefix=f"fk_stress_txn_{seed}_")
    schema = T.StructType(
        [T.StructField("repo", T.StringType()), T.StructField("path", T.StringType())]
    )
    roots = [os.path.join(tmp, n) for n in ("ta", "tb")]
    for r in roots:
        LaketteTable.create(r, schema, ["repo", "path"], n_buckets=4)
    txn_dir = os.path.join(tmp, "txns")

    def worker() -> subprocess.Popen:
        return _spawn(
            ["--txn-worker", "--root", tmp, "--epochs", "15",
             "--seed", str(seed)]
        )

    bg = _spawn(
        ["--meta-worker", "--root", roots[0], "--qid", "BG",
         "--epochs", "15", "--seed", str(seed), "--bucket-base", "2"]
    )
    w = worker()
    kills = 0
    deadline = time.monotonic() + 180
    while w.poll() is None and time.monotonic() < deadline:
        time.sleep(0.05 + 0.3 * rng.random())
        if w.poll() is None and kills < 3 and rng.random() < 0.5:
            w.send_signal(signal.SIGKILL)
            w.wait()
            kills += 1
            w = worker()
    rc_w = w.wait(timeout=180)
    rc_bg = bg.wait(timeout=180)

    tables = [LaketteTable(r) for r in roots]
    recover_transactions(txn_dir, tables={t.root: t for t in tables},
                         grace_seconds=0)
    torn = exactly_once_ok = True
    for e in range(15):
        got = [
            _writer_published_version(t, {"query_id": "T", "epoch": e})
            for t in tables
        ]
        if (got[0] is None) != (got[1] is None):
            torn = False
        if got[0] is None:
            exactly_once_ok = False
    a_files = [f["path"] for f in tables[0].current_metadata()["files"]]
    bg_ok = all(f"data/BG-{e:04d}.parquet" in a_files for e in range(15))
    once_ok = all(
        a_files.count(f"data/T-{e:04d}.parquet") == 1 for e in range(15)
    )
    staged_left = sum(len(t.list_staged()) for t in tables)
    live_records = sum(
        1
        for fn in os.listdir(txn_dir)
        if fn.endswith(".json")
        and json.load(open(os.path.join(txn_dir, fn)))["state"]
        in ("pending", "committed")
    )
    raw = tables[0]._raw_current()
    counters_ok = tables[0]._bucket_stats(raw) == tables[0]._bucket_stats(
        {k: v for k, v in raw.items() if k != "bucket_stats"}
    )
    ok = (
        rc_w == 0 and rc_bg == 0 and torn and exactly_once_ok and bg_ok
        and once_ok and staged_left == 0 and live_records == 0 and counters_ok
    )
    return {
        "seed": seed, "ok": ok, "kills": kills, "rc": (rc_w, rc_bg),
        "torn_free": torn, "complete": exactly_once_ok, "bg_ok": bg_ok,
        "exactly_once": once_ok, "staged_left": staged_left,
        "live_records": live_records, "counters_ok": counters_ok,
        "versions": [int(t._raw_current()["version"]) for t in tables],
    }


def run_spark_seed(
    seed: int,
    n_events: int = 30_000,
    workdir: str | None = None,
    with_vacuum: bool = False,
) -> dict:
    import pandas as pd

    from forklift_spark.changelog import ChangelogSpec, expected_final_state, generate_changelog
    from forklift_spark.lakette.table import LaketteTable
    from forklift_spark.session import get_spark
    from forklift_spark.streaming.ingest import create_entity_table, verify_state

    rng = random.Random(seed)
    tmp = workdir or tempfile.mkdtemp(prefix=f"fk_stress_spark_{seed}_")
    spec = ChangelogSpec(
        n_events=n_events, n_repos=12, paths_per_repo=30, seed=seed,
        duplicate_fraction=0.02, segment_rows=n_events // 12,
    )
    log_all = os.path.join(tmp, "log_all")
    generate_changelog(spec, log_all)
    # split by seq parity: BOTH workers touch every hot key -> every COW
    # epoch contends on overlapping buckets across the two processes
    halves = {"A": os.path.join(tmp, "log_a"), "B": os.path.join(tmp, "log_b")}
    for d in halves.values():
        os.makedirs(d, exist_ok=True)
    segs = sorted(glob.glob(os.path.join(log_all, "seg-*.parquet")))
    for i, seg in enumerate(segs):
        pdf = pd.read_parquet(seg)
        for qid, frac in (("A", pdf[pdf["seq"] % 2 == 0]), ("B", pdf[pdf["seq"] % 2 == 1])):
            frac.to_parquet(
                os.path.join(halves[qid], f"seg-{i:04d}.parquet"), index=False
            )

    root = os.path.join(tmp, "tbl")
    create_entity_table(root, n_buckets=8)

    def worker(qid: str) -> subprocess.Popen:
        return _spawn(["--spark-worker", "--root", root,
                       "--log", halves[qid], "--qid", qid])

    a, b = worker("A"), worker("B")
    vac = (
        _spawn(["--vacuum-worker", "--root", root, "--duration", "240"])
        if with_vacuum
        else None
    )
    # one SIGKILL on A mid-replay (after JVM spin-up), then restart
    time.sleep(12 + 6 * rng.random())
    kills = 0
    if a.poll() is None:
        a.send_signal(signal.SIGKILL)
        a.wait()
        kills = 1
        a = worker("A")
    rc_a = a.wait(timeout=600)
    rc_b = b.wait(timeout=600)
    vac_alive = True
    if vac is not None:
        # the maintenance loop must still be healthy (it exits only on its
        # own timer); a crashed vacuum racing the writers is a failure
        vac_alive = vac.poll() is None
        vac.terminate()
        vac.wait(timeout=30)

    spark = get_spark(app_name="stress-verify", cores=4, shuffle_partitions=8,
                      driver_memory="4g")
    table = LaketteTable(root)
    exp = spark.createDataFrame(expected_final_state(spec))
    ver = verify_state(spark, table, exp)
    return {"seed": seed, "ok": bool(ver["ok"]) and rc_a == 0 and rc_b == 0 and vac_alive,
            "kills": kills, "rc": (rc_a, rc_b), "vacuum_alive": vac_alive,
            "verify": ver}


def copy_worker(root: str, land: str) -> None:
    """One COPY INTO twin: a separate JVM racing the identical statement
    against the same table — the per-file exactly-once contract must hold
    whoever wins each window (sqlfront.py _copy_into: intent record,
    batch-epoch twin adoption, idempotent markers)."""
    from forklift_spark.lakette.table import LaketteTable
    from forklift_spark.session import get_spark
    from forklift_spark.sqlfront import SqlFrontend

    spark = get_spark(app_name=f"copy-{os.getpid()}", cores=2,
                      shuffle_partitions=4, driver_memory="3g")
    fe = SqlFrontend(spark, {"t": LaketteTable(root)})
    fe.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET")


def run_copy_seed(seed: int, n_files: int = 6, rows_per_file: int = 400,
                  workdir: str | None = None) -> dict:
    """Two-JVM COPY INTO twins over one landing dir, one SIGKILL window:
    kill twin A inside a random early window (JVM spin-up / listing /
    merge / marker phases all land in it across seeds), restart it, and
    require the final table to hold EVERY landed row exactly once and a
    third COPY to load zero files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from forklift_spark.lakette.table import LaketteTable
    from forklift_spark.session import get_spark
    from forklift_spark.sqlfront import SqlFrontend
    from forklift_spark.streaming.ingest import create_entity_table

    rng = random.Random(seed)
    tmp = workdir or tempfile.mkdtemp(prefix=f"fk_stress_copy_{seed}_")
    land = os.path.join(tmp, "land")
    os.makedirs(land, exist_ok=True)
    for j in range(n_files):
        rows = {
            "repo": ["r"] * rows_per_file,
            "path": [f"f{j}_r{i}" for i in range(rows_per_file)],
            "commit": [f"c{j}_{i}" for i in range(rows_per_file)],
            "lang": ["py"] * rows_per_file,
            "content": [f"body {j} {i}" for i in range(rows_per_file)],
        }
        pq.write_table(pa.table(rows), os.path.join(land, f"part-{j:03d}.parquet"))
    root = os.path.join(tmp, "tbl")
    create_entity_table(root, n_buckets=4)

    def worker() -> subprocess.Popen:
        return _spawn(["--copy-worker", "--root", root, "--log", land])

    a, b = worker(), worker()
    time.sleep(6 + 10 * rng.random())
    kills = 0
    if a.poll() is None:
        a.send_signal(signal.SIGKILL)
        a.wait()
        kills = 1
        a = worker()
    rc_a = a.wait(timeout=600)
    rc_b = b.wait(timeout=600)

    spark = get_spark(app_name="stress-copy-verify", cores=4,
                      shuffle_partitions=8, driver_memory="4g")
    table = LaketteTable(root)
    got = {
        r.path: r.content
        for r in table.snapshot(spark).select("path", "content").collect()
    }
    want = {f"f{j}_r{i}": f"body {j} {i}"
            for j in range(n_files) for i in range(rows_per_file)}
    re_copy = SqlFrontend(spark, {"t": table}).sql(
        f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET"
    ).collect()[0]
    ok = got == want and rc_a == 0 and rc_b == 0 and re_copy.files_loaded == "0"
    return {"seed": seed, "ok": bool(ok), "kills": kills, "rc": (rc_a, rc_b),
            "rows": len(got), "re_copy_loaded": re_copy.files_loaded}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", choices=["meta", "spark", "memvac", "txn", "copy"],
                    default="meta")
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--events", type=int, default=30_000)
    # internal worker modes
    ap.add_argument("--meta-worker", action="store_true")
    ap.add_argument("--spark-worker", action="store_true")
    ap.add_argument("--vacuum-worker", action="store_true")
    ap.add_argument("--txn-worker", action="store_true")
    ap.add_argument("--copy-worker", action="store_true")
    ap.add_argument("--bucket-base", type=int, default=None)
    ap.add_argument("--duration", type=float, default=240.0)
    ap.add_argument("--with-vacuum", action="store_true",
                    help="spark level: run a concurrent vacuum/retention loop")
    ap.add_argument("--root")
    ap.add_argument("--log")
    ap.add_argument("--qid")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.meta_worker:
        meta_worker(args.root, args.qid, args.epochs, args.seed,
                    bucket_base=args.bucket_base)
        return
    if args.spark_worker:
        spark_worker(args.root, args.log, args.qid)
        return
    if args.vacuum_worker:
        vacuum_worker(args.root, args.duration)
        return
    if args.txn_worker:
        txn_worker(args.root, args.epochs, args.seed)
        return
    if args.copy_worker:
        copy_worker(args.root, args.log)
        return

    results = []
    for s in range(args.seeds):
        if args.level == "meta":
            r = run_meta_seed(s, epochs=args.epochs)
        elif args.level == "memvac":
            r = run_memvac_seed(s, epochs=args.epochs)
        elif args.level == "txn":
            r = run_txn_seed(s)
        elif args.level == "copy":
            r = run_copy_seed(s)
        else:
            r = run_spark_seed(s, n_events=args.events,
                               with_vacuum=args.with_vacuum)
        print(json.dumps(r))
        results.append(r)
    n_ok = sum(1 for r in results if r["ok"])
    print(json.dumps({"level": args.level, "seeds": len(results), "ok": n_ok,
                      "all_ok": n_ok == len(results)}))
    if n_ok != len(results):
        sys.exit(1)


if __name__ == "__main__":
    main()
