"""M1 — "lakette": a minimal from-scratch Iceberg-semantics table format.

There is no Iceberg/Delta jar in this image, so the engine implements the
subset of Iceberg semantics the north star requires (BASELINE.json:6,14):

  * snapshot isolation + atomic commit — versioned metadata JSON files
    (`metadata/v{N}.json`) plus a `CURRENT` pointer file swapped with an
    atomic `os.replace` (single-writer; documented limitation),
  * additive schema evolution — the schema lives in metadata; data files
    written before an ALTER simply lack the new columns and are read with
    the current schema (missing parquet columns -> NULL),
  * file-level pruning metadata — every data file is tagged with its hash
    bucket of the logical key (repo, path), so a MERGE only reads and
    rewrites the buckets its batch touches (bounded write amplification;
    this replaces Iceberg manifest/partition pruning),
  * idempotent epoch markers — `_epochs/{query_id}/{epoch}.json` written
    *after* the metadata commit; metadata records its writer
    (query_id, epoch) so a crash between table-commit and marker-write is
    detected on replay (see operators/merge.py).

All of this is driver-side *planning* metadata — row data only ever moves
through Spark DataFrame jobs.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: engine-managed columns appended to the user schema
META_COLS = [
    ("seq", T.LongType()),  # commit sequence of the writing event (cross-batch LWW)
    ("content_sha", T.StringType()),  # sha2(content, 256) — the per-row invariant
    ("deleted", T.BooleanType()),  # tombstone flag (confluent deletes)
]
META_COL_NAMES = [c for c, _ in META_COLS]


class CommitConflictError(RuntimeError):
    """Another writer committed the same metadata version first — the
    optimistic-concurrency loser. The table state is untouched; the loser's
    data files are orphans (re-merge or garbage-collect them)."""


def _atomic_write_json(path: str, payload: dict, *, exclusive: bool = False) -> None:
    tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=None, separators=(",", ":"))
        f.flush()
        os.fsync(f.fileno())
    if exclusive:
        # atomic create-if-absent (POSIX hard link fails on existing target)
        # — the compare-and-swap that makes concurrent writers safe: two
        # committers racing from the same parent version both try to create
        # v{N+1}.json; exactly one succeeds, the other gets a clean conflict.
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise CommitConflictError(
                f"metadata version {os.path.basename(path)} already committed "
                "by a concurrent writer"
            ) from None
        finally:
            os.remove(tmp)
    else:
        os.replace(tmp, path)


@dataclass
class TableCommit:
    version: int
    snapshot_id: int


class LaketteTable:
    """Handle on a lakette table rooted at a local/posix directory."""

    def __init__(self, root: str):
        self.root = root
        self.meta_dir = os.path.join(root, "metadata")
        self.data_dir = os.path.join(root, "data")
        self.epochs_dir = os.path.join(root, "_epochs")
        self.lineage_dir = os.path.join(root, "_lineage")
        self.metrics_dir = os.path.join(root, "_metrics")

    # ------------------------------------------------------------------ setup

    @classmethod
    def create(
        cls,
        root: str,
        user_schema: T.StructType,
        key_cols: list[str],
        n_buckets: int = 16,
    ) -> "LaketteTable":
        t = cls(root)
        for d in (t.meta_dir, t.data_dir, t.epochs_dir, t.lineage_dir, t.metrics_dir):
            os.makedirs(d, exist_ok=True)
        full = T.StructType(
            list(user_schema.fields)
            + [T.StructField(c, typ, True) for c, typ in META_COLS]
        )
        meta = {
            "format": "lakette/1",
            "version": 1,
            "snapshot_id": 0,
            "key_cols": key_cols,
            "n_buckets": n_buckets,
            "schema": json.loads(full.json()),
            "files": [],  # [{"path": rel, "bucket": int, "rows": int}]
            "writer": None,  # {"query_id": str, "epoch": int} of the committing merge
            "parent_version": None,
        }
        _atomic_write_json(os.path.join(t.meta_dir, "v1.json"), meta)
        t._swap_current("v1.json")
        return t

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.exists(os.path.join(root, "metadata", "CURRENT"))

    # ------------------------------------------------------------ metadata io

    def _swap_current(self, meta_name: str) -> None:
        cur = os.path.join(self.meta_dir, "CURRENT")
        tmp = cur + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(meta_name)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, cur)  # atomic on POSIX — this IS the commit point

    def current_metadata(self) -> dict[str, Any]:
        with open(os.path.join(self.meta_dir, "CURRENT")) as f:
            name = f.read().strip()
        with open(os.path.join(self.meta_dir, name)) as f:
            return json.load(f)

    def metadata_at(self, version: int) -> dict[str, Any]:
        """Metadata of a specific committed version (time travel). Only
        versions reachable from CURRENT are valid — an orphaned loser of a
        commit race has a v{N}.json too, but it was never the table state,
        so walk the parent chain instead of trusting the file name."""
        meta = self.current_metadata()
        while meta["version"] != version:
            parent = meta.get("parent_version")
            if parent is None or parent < version:
                raise ValueError(f"version {version} not in this table's history")
            ppath = os.path.join(self.meta_dir, f"v{parent}.json")
            if not os.path.exists(ppath):
                raise ValueError(
                    f"version {version} expired (metadata pruned by vacuum)"
                )
            with open(ppath) as f:
                cand = json.load(f)
            if cand["version"] != parent:
                raise ValueError(f"corrupt history at v{parent}.json")
            meta = cand
        return meta

    def history(self) -> list[dict[str, Any]]:
        """Commit log, newest first: one row per reachable version (the
        chain ends early where vacuum() already expired old metadata)."""
        out = []
        meta = self.current_metadata()
        while True:
            out.append(
                {
                    "version": meta["version"],
                    "snapshot_id": meta["snapshot_id"],
                    "writer": meta.get("writer"),
                    "n_files": len(meta["files"]),
                    "rows": sum(f["rows"] for f in meta["files"]),
                    "n_buckets": meta["n_buckets"],
                }
            )
            parent = meta.get("parent_version")
            if parent is None:
                return out
            ppath = os.path.join(self.meta_dir, f"v{parent}.json")
            if not os.path.exists(ppath):
                return out  # expired by vacuum
            with open(ppath) as f:
                meta = json.load(f)

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.current_metadata()["schema"])

    def user_schema(self) -> T.StructType:
        return T.StructType(
            [f for f in self.schema().fields if f.name not in META_COL_NAMES]
        )

    def key_cols(self) -> list[str]:
        return list(self.current_metadata()["key_cols"])

    def n_buckets(self) -> int:
        return int(self.current_metadata()["n_buckets"])

    def bucket_expr(self, prefix: str = "", n_buckets: int | None = None):
        """Deterministic hash bucket of the logical key — recomputable
        anywhere, so it is never stored in row data. `n_buckets` overrides
        the table's current bucket count (compact()'s re-bucketing path
        MUST share this definition — a divergent inline copy would silently
        mis-route keys, see ADVICE.md)."""
        cols = [F.col(prefix + c) for c in self.key_cols()]
        n = self.n_buckets() if n_buckets is None else int(n_buckets)
        return F.pmod(F.xxhash64(*cols), F.lit(n)).cast("int")

    # ------------------------------------------------------------------- scan

    def snapshot(
        self,
        spark: SparkSession,
        *,
        include_deleted: bool = False,
        buckets: list[int] | None = None,
        metadata: dict | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Read the current committed snapshot (or, with `version`, a past
        one — time travel; fails if vacuum() already collected its files).

        `buckets` prunes to the given hash buckets using file-level metadata
        (driver-side planning — no Spark job needed to plan the scan).
        Reading with the *current* schema makes pre-evolution files surface
        NULL for later-added columns.
        """
        if version is not None and metadata is None:
            metadata = self.metadata_at(version)
        meta = metadata or self.current_metadata()
        schema = T.StructType.fromJson(meta["schema"])
        files = meta["files"]
        if buckets is not None:
            bset = set(buckets)
            files = [f for f in files if f["bucket"] in bset]
        # merge-on-read: buckets holding delta appends may carry several
        # versions of a key — resolve LWW (max seq) at read time, but ONLY
        # over the dirty buckets (a key lives in exactly one bucket, so the
        # per-bucket split loses nothing); clean buckets stream straight
        # through with no aggregate. compact() folds dirty buckets back to
        # clean, shrinking this path incrementally.
        dirty = {f["bucket"] for f in files if f.get("delta")}
        if meta.get("requires_dedup") and not any("delta" in f for f in files):
            dirty = {f["bucket"] for f in files}  # legacy flag-only metadata
        clean_files = [f for f in files if f["bucket"] not in dirty]
        dirty_files = [f for f in files if f["bucket"] in dirty]

        def _read(fs):
            return spark.read.schema(schema).parquet(
                *[os.path.join(self.root, f["path"]) for f in fs]
            )

        parts = []
        if clean_files:
            parts.append(_read(clean_files))
        if dirty_files:
            from ..operators.merge import lww_dedupe

            parts.append(lww_dedupe(_read(dirty_files), meta["key_cols"], "seq"))
        if not parts:
            df = spark.createDataFrame([], schema)
        elif len(parts) == 1:
            df = parts[0]
        else:
            df = parts[0].unionByName(parts[1])
        if not include_deleted:
            df = df.filter(~F.coalesce(F.col("deleted"), F.lit(False))).drop("deleted")
        return df

    # ----------------------------------------------------------------- commit

    def commit_version(
        self,
        *,
        new_files: list[dict],
        replaced_buckets: set[int],
        schema: T.StructType | None = None,
        writer: dict | None = None,
        requires_dedup: bool | None = None,
        n_buckets: int | None = None,
    ) -> TableCommit:
        """Write metadata v{N+1}: files of untouched buckets carry over,
        touched buckets are replaced by new_files (copy-on-write), the
        schema may evolve additively, and the writer (query_id, epoch) is
        recorded for exactly-once crash detection. Commit = CURRENT swap."""
        meta = self.current_metadata()
        kept = [f for f in meta["files"] if f["bucket"] not in replaced_buckets]
        new_meta = dict(meta)
        new_meta["parent_version"] = meta["version"]
        new_meta["version"] = meta["version"] + 1
        new_meta["snapshot_id"] = meta["snapshot_id"] + 1
        new_meta["files"] = kept + new_files
        if schema is not None:
            new_meta["schema"] = json.loads(schema.json())
        # derived, not declared: true iff any live file is a MOR delta —
        # kept for observability; the scan itself uses per-file tags
        new_meta["requires_dedup"] = (
            requires_dedup
            if requires_dedup is not None
            else any(f.get("delta") for f in new_meta["files"])
        )
        if n_buckets is not None:
            if kept and n_buckets != meta["n_buckets"]:
                raise ValueError(
                    "re-bucketing requires replacing every bucket in the same "
                    "commit (carried-over files would disagree with the new "
                    "bucket function)"
                )
            new_meta["n_buckets"] = n_buckets
        new_meta["writer"] = writer
        name = f"v{new_meta['version']}.json"
        path = os.path.join(self.meta_dir, name)
        # exclusive=True is the single-writer enforcement: a racing commit
        # from the same parent version loses with CommitConflictError
        # instead of silently clobbering the winner's metadata.
        try:
            _atomic_write_json(path, new_meta, exclusive=True)
        except CommitConflictError:
            # One benign case: OUR OWN orphan from a crash between the
            # version-file write and the CURRENT swap (CURRENT still points
            # at the parent, so epoch_committed didn't gate the retry). The
            # retry may reclaim it; the crashed attempt's data files become
            # unreferenced orphans (GC concern, not a correctness one).
            try:
                with open(path) as f:
                    orphan = json.load(f)
            except (OSError, json.JSONDecodeError):
                orphan = {}
            if (
                writer is not None
                and orphan.get("writer") == writer
                and orphan.get("parent_version") == meta["version"]
            ):
                _atomic_write_json(path, new_meta)
            else:
                raise
        self._swap_current(name)
        return TableCommit(new_meta["version"], new_meta["snapshot_id"])

    # ---------------------------------------------------------- epoch markers

    def _marker_path(self, query_id: str, epoch: int) -> str:
        return os.path.join(self.epochs_dir, query_id, f"{epoch}.json")

    def epoch_committed(self, query_id: str, epoch: int) -> bool:
        """Idempotence gate. True if the marker exists, OR the current
        metadata was written by exactly this (query_id, epoch) — the
        crash-between-commit-and-marker window (SURVEY.md §7 hard-point 2)."""
        if os.path.exists(self._marker_path(query_id, epoch)):
            return True
        w = self.current_metadata().get("writer")
        return bool(w and w.get("query_id") == query_id and w.get("epoch") == epoch)

    def write_epoch_marker(self, query_id: str, epoch: int, snapshot_id: int) -> None:
        os.makedirs(os.path.join(self.epochs_dir, query_id), exist_ok=True)
        _atomic_write_json(
            self._marker_path(query_id, epoch),
            {"query_id": query_id, "epoch": epoch, "snapshot_id": snapshot_id},
        )

    # ----------------------------------------------------------------- stats

    def stats(self) -> dict[str, Any]:
        """Operational table stats from metadata alone (no Spark job):
        per-bucket rows/files/delta backlog plus table-level skew — what an
        operator dashboards and what compaction planning reads."""
        meta = self.current_metadata()
        per: dict[int, dict[str, int]] = {}
        for f in meta["files"]:
            e = per.setdefault(
                f["bucket"], {"files": 0, "rows": 0, "delta_files": 0, "delta_rows": 0}
            )
            e["files"] += 1
            e["rows"] += f["rows"]
            if f.get("delta"):
                e["delta_files"] += 1
                e["delta_rows"] += f["rows"]
        counts = sorted(e["rows"] for e in per.values()) or [0]
        median = counts[len(counts) // 2] or 1
        return {
            "version": meta["version"],
            "snapshot_id": meta["snapshot_id"],
            "n_buckets": meta["n_buckets"],
            "total_rows": sum(counts),
            "total_files": sum(e["files"] for e in per.values()),
            "delta_files": sum(e["delta_files"] for e in per.values()),
            "delta_rows": sum(e["delta_rows"] for e in per.values()),
            "bucket_skew": round(counts[-1] / median, 2),
            "buckets": {b: per[b] for b in sorted(per)},
        }

    # ---------------------------------------------------------------- vacuum

    def vacuum(self, *, keep_versions: int = 1) -> dict[str, int]:
        """Garbage-collect data files not referenced by the newest
        `keep_versions` reachable versions, plus metadata files of pruned
        or orphaned versions (e.g. a CommitConflictError loser's v{N}.json
        and the data files it promoted before losing the CAS).

        Driver-side file ops only. At object-store scale this would be a
        manifest diff + batched deletes; the referenced-set computation is
        identical. Time travel beyond `keep_versions` stops working — same
        contract as Iceberg's expire_snapshots."""
        keep_versions = max(1, keep_versions)
        history = self.history()
        kept_meta = history[:keep_versions]
        kept_versions = {h["version"] for h in kept_meta}
        reachable = {h["version"] for h in history}
        referenced: set[str] = set()
        for h in kept_meta:
            meta = self.metadata_at(h["version"])
            referenced.update(f["path"] for f in meta["files"])

        removed_data = 0
        for fn in sorted(os.listdir(self.data_dir)):
            rel = os.path.join("data", fn)
            if fn.endswith(".parquet") and rel not in referenced:
                os.remove(os.path.join(self.data_dir, fn))
                removed_data += 1
        removed_meta = 0
        for fn in sorted(os.listdir(self.meta_dir)):
            m = fn.removeprefix("v").removesuffix(".json")
            if not fn.startswith("v") or not fn.endswith(".json") or not m.isdigit():
                continue
            v = int(m)
            if v not in kept_versions and (v not in reachable or v < min(kept_versions)):
                os.remove(os.path.join(self.meta_dir, fn))
                removed_meta += 1
        return {
            "removed_data_files": removed_data,
            "removed_metadata_files": removed_meta,
            "kept_versions": len(kept_versions),
        }
