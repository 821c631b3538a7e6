"""Lake-to-lake incremental replication: CDC-out applied as CDC-in.

The committed-version chain of a lakette table IS a change feed — every
commit is one atomic batch of row-level changes, recoverable as a
bucket-pruned snapshot_diff with NO log replay. `replicate` tails that
feed and applies it to a destination table through the ordinary
exactly-once merge path, which makes bronze -> silver chaining (and
cross-region table mirroring) a first-class engine capability:

  * epoch = source version. The destination's idempotent epoch markers
    (query_id = replication_id) double as replication offsets, so the
    process is resumable from any crash with no extra state: the next run
    reads the last marker and continues. A crash between the destination's
    metadata commit and its marker is the same window merge_into already
    closes (lakette writer stamp).
  * each applied batch is `snapshot_diff(last, current, full_rows=True)` —
    one full-outer join over bucket-pruned reads of exactly the buckets
    whose file sets changed. Cost scales with the CHANGED data, never the
    table; at 100 TB a quiet table replicates for the price of two
    metadata reads.
  * LWW confluence means batching does not matter: replicating every
    version one-by-one, or a week of versions in one diff, converges to
    the same destination state (`every_version` chooses the granularity).
  * schema evolution flows through: the diff is emitted under the source's
    CURRENT schema, and merge_into's additive-evolution path alters the
    destination in the same epoch.
  * if the source vacuumed past the replica's last-applied version, the
    version chain is broken — `replicate` falls back to a full RESYNC
    diff (source snapshot vs destination snapshot, extra destination keys
    emitted as deletes), which repairs the replica in one epoch while
    still only shipping differing rows.

Design note — why this is a driver loop and not a custom streaming
DataSource: a Python DataSource's partition readers pull row data through
Python workers, which would drag every replicated byte off the JVM fast
path. Here the driver only sequences versions; all row movement is JVM
DataFrame jobs (parquet scan -> join -> merge). availableNow semantics =
one `replicate()` call; a live mirror is the same call in a poll loop.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakette.table import META_COL_NAMES, CommitConflictError, LaketteTable
from .changes import diff_frames, snapshot_diff
from .merge import MergeStats, merge_into


@dataclass
class ReplicationReport:
    src_version: int  # source version the destination now reflects
    applied_epochs: list[MergeStats] = field(default_factory=list)
    initial_sync: bool = False
    resync: bool = False

    @property
    def applied_rows(self) -> int:
        return sum(s.applied_rows for s in self.applied_epochs)


def last_replicated_version(dst: LaketteTable, replication_id: str) -> int | None:
    """Highest source version the destination durably applied — the max
    epoch marker, plus the marker-less crash window (current metadata
    written by this replication but marker missing)."""
    best = None
    d = os.path.join(dst.epochs_dir, replication_id)
    if os.path.isdir(d):
        for fn in os.listdir(d):
            if fn.endswith(".json") and fn[:-5].isdigit():
                v = int(fn[:-5])
                best = v if best is None else max(best, v)
    w = dst._raw_current().get("writer") or {}
    if w.get("query_id") == replication_id:
        e = int(w.get("epoch", -1))
        best = e if best is None else max(best, e)
    return best


def _payload_cols(meta: dict) -> list[str]:
    """Payload columns of a PINNED metadata dict — never the live table
    (the source can evolve between our snapshot read and this call, and
    selecting a column the pinned frame lacks is an analysis error)."""
    keys = set(meta["key_cols"])
    return [
        f["name"]
        for f in meta["schema"]["fields"]
        if f["name"] not in keys and f["name"] not in META_COL_NAMES
    ]


def _events_from_state(df: DataFrame, payload_cols: list[str], key_cols) -> DataFrame:
    """Snapshot rows (include_deleted=True) as a merge envelope — the
    initial-sync batch. Tombstones replicate as deletes so the replica
    inherits the source's LWW floor (a late event below a tombstone's seq
    can never resurrect the key on either side)."""
    return df.select(
        F.when(F.coalesce(F.col("deleted"), F.lit(False)), F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        *key_cols,
        *payload_cols,
        F.col("seq"),
    )


def _events_from_diff(
    diff: DataFrame,
    payload_cols: list[str],
    key_cols,
    *,
    mor_guard: bool = False,
) -> DataFrame:
    """`mor_guard=True` (diff must carry `_old_seq`) raises inside the
    merge job on any non-seq-advancing row — a MOR destination resolves by
    max(seq) and cannot express one; see derive._guarded_seq."""
    from .derive import _guarded_seq

    op = (
        F.when(F.col("change") == "insert", F.lit("I"))
        .when(F.col("change") == "update", F.lit("U"))
        .otherwise(F.lit("D"))
    )
    seq = _guarded_seq(list(key_cols)) if mor_guard else F.col("seq")
    return diff.select(op.alias("op"), *key_cols, *payload_cols, seq)


def replicate(
    spark: SparkSession,
    src: LaketteTable,
    dst_root: str,
    *,
    replication_id: str = "repl",
    mode: str = "cow",
    n_buckets: int | None = None,
    every_version: bool = False,
) -> ReplicationReport:
    """Bring the destination table at `dst_root` up to the source's current
    version. Creates the destination on first call (same key cols; bucket
    count defaults to the source's). Safe to call repeatedly / concurrently
    with source writes — each call lands whole source versions, atomically.

    `every_version=True` applies one destination epoch per source version
    (a faithful per-commit mirror, at one commit of overhead each);
    default is one epoch covering the whole span since the last call."""
    src_meta = src._raw_current()  # snapshot()/plan_files accept raw metadata
    target_v = int(src_meta["version"])
    key_cols = list(src_meta["key_cols"])

    if LaketteTable.exists(dst_root):
        dst = LaketteTable(dst_root)
    else:
        try:
            dst = LaketteTable.create(
                dst_root,
                src.user_schema(),
                key_cols,
                n_buckets=int(n_buckets or src_meta["n_buckets"]),
                target_file_rows=src_meta.get("target_file_rows"),
            )
        except CommitConflictError:
            dst = LaketteTable(dst_root)  # a twin mirror created it first
    payload = _payload_cols(src_meta)
    report = ReplicationReport(src_version=target_v)

    def _apply(batch: DataFrame, epoch: int, *, mode_: str, overwrite: bool = False):
        """merge_into with twin tolerance: if a TWIN replicator (double-
        fired cron, second mirror process) raced us past the marker check
        and won the commit, OUR application of the epoch is redundant —
        re-enter merge_into, which skips on the twin's marker. Anything
        else is a genuine conflict."""
        try:
            return merge_into(
                spark, dst, batch, query_id=replication_id, epoch=epoch,
                mode=mode_, overwrite=overwrite,
            )
        except CommitConflictError:
            if not dst.epoch_committed(replication_id, epoch):
                raise
            return merge_into(
                spark, dst, batch, query_id=replication_id, epoch=epoch,
                mode=mode_, overwrite=overwrite,
            )

    last = last_replicated_version(dst, replication_id)
    if last is None:
        # initial sync: the whole current snapshot as one idempotent epoch
        report.initial_sync = True
        batch = _events_from_state(
            src.snapshot(spark, include_deleted=True, metadata=src_meta),
            payload,
            key_cols,
        )
        report.applied_epochs.append(_apply(batch, target_v, mode_=mode))
        return report
    if last >= target_v:
        report.src_version = last
        return report  # already current

    try:
        src._raw_metadata_at(last)  # is the chain from `last` still readable?
        spans = (
            [(v - 1, v) for v in range(last + 1, target_v + 1)]
            if every_version
            else [(last, target_v)]
        )
    except ValueError:
        spans = None  # vacuumed past the replica — repair below

    if spans is None:
        # REPAIR epoch: state-based diff (catches same-seq payload
        # divergence and tombstone drift) applied with overwrite=True, so
        # the replica is forced to the source's exact rows AND seqs no
        # matter how high an out-of-band write's seq was. Overwrite
        # requires the COW path regardless of the steady-state mode.
        report.resync = True
        src_snap = src.snapshot(spark, include_deleted=True, metadata=src_meta)
        # replica side: keys + engine columns suffice ONLY when content_sha
        # witnesses the whole payload (payload == {content}); otherwise the
        # payload itself must be read so the repair diff can see same-seq
        # divergence in non-content columns (diff_frames repair basis)
        dst_snap = dst.snapshot(
            spark, include_deleted=True,
            columns=[] if set(payload) == {"content"} else None,
        )
        diff = diff_frames(
            dst_snap, src_snap, key_cols, payload,
            full_rows=True, repair=True,
        )
        report.applied_epochs.append(
            _apply(
                _events_from_diff(diff, payload, key_cols),
                target_v,
                mode_="cow",
                overwrite=True,
            )
        )
        return report

    for lo, hi in spans:
        if dst.epoch_committed(replication_id, hi):
            continue  # a crashed previous run already landed this span
        diff = snapshot_diff(
            spark, src, lo, hi, full_rows=True, old_seq=(mode == "mor")
        )
        # the span's diff is emitted under metadata_at(hi)'s schema, which
        # may predate later source evolutions — select what it carries
        span_payload = [
            c for c in diff.columns
            if c not in ("change", "seq", "content_sha", "_old_seq")
            and c not in key_cols
        ]
        # overwrite on COW destinations: spans are authoritative state
        # traffic, and source rows whose seq did NOT advance — predicate
        # DML (seq preserved) and restore (seq regressed) — must still
        # land; the LWW guard would silently drop them (derive() has the
        # full rationale). Event-driven spans are unaffected (seqs always
        # advance). MOR destinations cannot express non-advancing updates:
        # with mode='mor', such a row raises INSIDE the merge job
        # (derive._guarded_seq) — resync() or a cow destination is the
        # remedy, never an arbitrary same-seq tie.
        report.applied_epochs.append(
            _apply(
                _events_from_diff(
                    diff, span_payload, key_cols, mor_guard=(mode == "mor")
                ),
                hi, mode_=mode, overwrite=(mode == "cow"),
            )
        )
    return report
