"""Catalog: named tables + cross-table SNAPSHOT ISOLATION (the layer
txn.py names as out of its scope — "cross-table ISOLATION for
un-coordinated writers needs a catalog-level commit").

The catalog is a version chain of its own, committed with the exact CAS
discipline a table commit uses (exclusive-create ``v{K}.json`` is the
race arbiter, ``CURRENT`` swap is the visibility point): each catalog
version is a FULL map ``{name -> (root, pinned table version)}``.  That
one small file is what turns per-table atomicity into cross-table
isolation:

* a reader that resolves versions through the catalog
  (``read_set``/``snapshot``/``sql_views``) sees ONE committed map — a
  multi-table publish becomes visible to it in a single catalog CAS, so
  the torn window ``publish_transaction`` documents (member CAS flips
  land one at a time) does not exist for catalog readers;
* a reader that bypasses the catalog and opens tables directly keeps
  exactly the per-table guarantees it had before — the catalog adds a
  stronger read path, it does not weaken the old one.

Pinning: every cataloged version is mirrored onto the member table as a
BRANCH ref ``catalog-{id}`` (create_ref/fast_forward), so vacuum() never
collects a version the catalog still serves — the same mechanism that
makes a tag a durable reproducibility handle.  Refs are re-pointed
AFTER the catalog commit; a crash between the two leaves the ref one
catalog-op behind, which pins TOO MUCH (never too little: the newly
cataloged version is the table's recent head, inside both
``keep_versions >= 1`` and the 24 h vacuum grace) and self-heals on the
next advance of that entry.

Crash/concurrency posture:

* catalog commits are swap-last, so an orphaned ``v{K}.json`` whose
  writer died before the CURRENT swap is always safe to ROLL FORWARD
  (adopt-and-swap) — unlike a table commit there are no data files to
  reconcile, the orphan IS a complete committed state; the retry loop
  does exactly that, so a died-mid-commit writer never wedges the chain;
* concurrent catalog writers race through the CAS and rebase: the
  mutation is re-applied to the fresh map (register stays
  exclusive-loud; advance is strictly-forward and idempotent, an entry
  that already moved past the target is a no-op);
* ``publish`` = stage members normally -> ``publish_transaction``
  (crash atomicity at the table layer) -> ONE catalog commit advancing
  every member entry together (isolation at the read layer).  If a
  member conflicts post-flip, the tables may be torn for direct readers
  (txn.py documents this honestly) but the catalog DOES NOT advance —
  catalog readers keep the old consistent set until ``recover()``
  finishes the remainder and advances the map in one commit.

Scale: a catalog commit writes O(registered tables) of small JSON —
~100 bytes/entry, so a 10^4-table catalog pays ~1 MB per catalog commit
(shard the map by namespace past that; the CAS discipline is
unchanged).  Resolution is O(1) driver-side metadata reads.  The data
plane is untouched: the catalog adds zero per-row and zero per-epoch
work — it sits on the publish/refresh cadence, not the ingest hot path.
"""

from __future__ import annotations

import os
import re
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .storage import PosixStorage, Storage
from .table import CommitConflictError, LaketteTable
from .txn import publish_transaction, recover_transactions

_NAME = re.compile(r"[A-Za-z_][A-Za-z0-9_]*$")


class Catalog:
    """Handle on a catalog rooted at a directory (posix or any Storage
    backend — catalog state is pure metadata, so every backend works)."""

    def __init__(self, root: str, storage: Storage | None = None):
        self.root = root
        self.fs: Storage = storage or PosixStorage()
        self.meta_dir = os.path.join(root, "metadata")
        self.txn_dir = os.path.join(root, "txn")

    # ------------------------------------------------------------ lifecycle

    @classmethod
    def create(cls, root: str, storage: Storage | None = None) -> "Catalog":
        """Initialize an empty catalog (v0, no tables). Exclusive-create:
        two creators racing the same root — one wins, one gets a clean
        conflict (same contract as a table commit)."""
        cat = cls(root, storage=storage)
        cat.fs.makedirs(cat.meta_dir)
        cat.fs.makedirs(cat.txn_dir)
        payload = {
            "version": 0,
            "parent": None,
            "catalog_id": uuid.uuid4().hex,
            "op": "create",
            "committed_at": time.time(),
            "tables": {},
        }
        try:
            cat.fs.put_json_exclusive(
                os.path.join(cat.meta_dir, "v0.json"), payload
            )
        except FileExistsError:
            raise CommitConflictError(
                f"catalog already exists at {root}"
            ) from None
        cat.fs.write_text_atomic(
            os.path.join(cat.meta_dir, "CURRENT"), "v0.json"
        )
        return cat

    @classmethod
    def exists(cls, root: str, storage: Storage | None = None) -> bool:
        return (storage or PosixStorage()).exists(
            os.path.join(root, "metadata", "CURRENT")
        )

    # ------------------------------------------------------------ metadata

    def _vpath(self, v: int) -> str:
        return os.path.join(self.meta_dir, f"v{v}.json")

    def _raw_current(self) -> dict[str, Any]:
        name = self.fs.read_text(os.path.join(self.meta_dir, "CURRENT")).strip()
        return self.fs.read_json(os.path.join(self.meta_dir, name))

    @property
    def catalog_id(self) -> str:
        return self._raw_current()["catalog_id"]

    @property
    def version(self) -> int:
        return int(self._raw_current()["version"])

    def metadata_at(self, version: int) -> dict[str, Any]:
        p = self._vpath(int(version))
        if not self.fs.exists(p):
            raise ValueError(f"unknown catalog version {version}")
        return self.fs.read_json(p)

    def history(self) -> list[dict[str, Any]]:
        """Newest-first chain of catalog versions (walked by parent
        pointers — O(versions), all tiny driver-side reads)."""
        out = [self._raw_current()]
        while out[-1]["parent"] is not None:
            out.append(self.metadata_at(out[-1]["parent"]))
        return out

    def names(self) -> list[str]:
        return sorted(self._raw_current()["tables"])

    def read_set(self, version: int | None = None) -> dict[str, dict[str, Any]]:
        """The consistent ``{name: {root, version}}`` map of one catalog
        commit — THE unit of cross-table isolation. Default: current."""
        raw = (
            self._raw_current() if version is None else self.metadata_at(version)
        )
        return {k: dict(v) for k, v in raw["tables"].items()}

    # ------------------------------------------------------------- commits

    def _commit(self, op: str, mutate) -> dict[str, Any]:
        """CAS commit loop: re-read, re-apply ``mutate(tables)`` on the
        fresh map, exclusive-create the next version, swap CURRENT.
        Swap-last means a v{K}.json whose writer died pre-swap is a
        complete committed state — adopt it (roll FORWARD) and retry on
        top; completing a live writer's swap is idempotent (same file
        content), so adoption is unconditionally safe."""
        for _ in range(32):
            raw = self._raw_current()
            tables = {k: dict(v) for k, v in raw["tables"].items()}
            if mutate(tables) is False:  # no-op after rebase (e.g. advance
                return raw  # already covered by a racer)
            new_v = int(raw["version"]) + 1
            payload = {
                "version": new_v,
                "parent": int(raw["version"]),
                "catalog_id": raw["catalog_id"],
                "op": op,
                "committed_at": time.time(),
                "tables": tables,
            }
            try:
                self.fs.put_json_exclusive(self._vpath(new_v), payload)
            except FileExistsError:
                cur = self._raw_current()
                if int(cur["version"]) < new_v:
                    # orphan: committed but never swapped — roll it forward
                    self.fs.write_text_atomic(
                        os.path.join(self.meta_dir, "CURRENT"),
                        f"v{new_v}.json",
                    )
                continue
            self.fs.write_text_atomic(
                os.path.join(self.meta_dir, "CURRENT"), f"v{new_v}.json"
            )
            return payload
        raise CommitConflictError(
            f"catalog {self.root}: commit lost the CAS 32 times — "
            "pathological contention, back off and retry"
        )

    # --------------------------------------------------------- pinning refs

    def _ref_name(self) -> str:
        return f"catalog-{self.catalog_id[:8]}"

    def _pin(self, table: LaketteTable, version: int) -> None:
        """Mirror the cataloged version as a branch ref on the member so
        vacuum keeps serving it (module docstring: after-commit ordering,
        lag pins too much and self-heals)."""
        ref = self._ref_name()
        try:
            table.fast_forward(ref, int(version))
        except (OSError, ValueError):
            # unknown ref (first pin) or an explicit re-register rewind
            table.create_ref(
                ref, kind="branch", version=int(version), replace=True
            )

    # ------------------------------------------------------------- mutations

    def register(
        self, name: str, table_root: str, *, version: int | None = None
    ) -> dict[str, Any]:
        """Register an EXISTING table under ``name``, pinned at
        ``version`` (default: its current head). Loud on a taken name or
        an already-registered root (one entry per physical table — a
        double registration would double-pin and make drop ambiguous)."""
        if not _NAME.match(name or ""):
            raise ValueError(
                f"invalid table name {name!r} (need a SQL identifier — it "
                "becomes a view name)"
            )
        t = LaketteTable(table_root, storage=self.fs)
        if not LaketteTable.exists(table_root, storage=self.fs):
            raise ValueError(f"no lakette table at {table_root}")
        v = int(version) if version is not None else int(
            t._raw_current()["version"]
        )
        t.metadata_at(v)  # loud on vacuumed/nonexistent

        def _mut(tables: dict) -> None:
            if name in tables:
                raise ValueError(f"table name {name!r} already registered")
            for k, e in tables.items():
                if e["root"] == table_root:
                    raise ValueError(
                        f"root {table_root} already registered as {k!r}"
                    )
            tables[name] = {"root": table_root, "version": v}

        out = self._commit(f"register:{name}", _mut)
        self._pin(t, v)
        return out

    def create_table(
        self, name: str, table_root: str, *args, **kwargs
    ) -> LaketteTable:
        """Create a lakette table at ``table_root`` (same signature as
        ``LaketteTable.create`` past the root) and register it."""
        kwargs.setdefault("storage", self.fs)
        t = LaketteTable.create(table_root, *args, **kwargs)
        self.register(name, table_root)
        return t

    def table(self, name: str) -> LaketteTable:
        ent = self._raw_current()["tables"].get(name)
        if ent is None:
            raise KeyError(f"unknown table {name!r}")
        return LaketteTable(ent["root"], storage=self.fs)

    def advance(
        self, name: str, version: int | None = None
    ) -> dict[str, Any]:
        """Move one entry strictly forward to ``version`` (default: the
        table's current head). Idempotent under races — if a concurrent
        advance already covered the target, this is a no-op."""
        t = self.table(name)
        v = int(version) if version is not None else int(
            t._raw_current()["version"]
        )
        t.metadata_at(v)

        def _mut(tables: dict):
            ent = tables.get(name)
            if ent is None:
                raise KeyError(f"unknown table {name!r}")
            if int(ent["version"]) >= v:
                return False  # already there or past: no-op
            ent["version"] = v

        out = self._commit(f"advance:{name}", _mut)
        self._pin(t, v)
        return out

    def refresh(self, names: list[str] | None = None) -> dict[str, Any]:
        """Advance every named entry (default: all) to its table's current
        head in ONE catalog commit — one consistent cut for readers.  The
        cut is taken per-table at read time, so it is only as simultaneous
        as those reads; sets that must be transactionally consistent go
        through ``publish``, not refresh."""
        targets: dict[str, int] = {}
        for n in names if names is not None else self.names():
            targets[n] = int(self.table(n)._raw_current()["version"])

        def _mut(tables: dict):
            moved = False
            for n, v in targets.items():
                ent = tables.get(n)
                if ent is None:
                    raise KeyError(f"unknown table {n!r}")
                if int(ent["version"]) < v:
                    ent["version"] = v
                    moved = True
            if not moved:
                return False

        out = self._commit("refresh", _mut)
        for n, v in targets.items():
            self._pin(self.table(n), v)
        return out

    def refresh_hook(self, names: list[str] | None = None):
        """A ``run_ingest(derived=[...])`` hook that advances the named
        entries (default: all) to their table heads — LAST in the hook
        list, after the bronze->silver->gold refreshes, so each epoch's
        whole medallion set lands in the catalog as ONE commit.  Hooks
        run between epochs with no member writer active, so the cut the
        refresh takes is exact there, not merely near-simultaneous; a
        crash between the table commits and this hook leaves the catalog
        one epoch behind — stale but consistent, healed on the next
        applied epoch (or a manual refresh())."""

        def _hook(spark) -> dict[str, Any]:
            out = self.refresh(names)
            return {"kind": "catalog_refresh", "catalog_version": int(out["version"])}

        return _hook

    def drop(self, name: str) -> dict[str, Any]:
        """Unregister ``name`` and release its vacuum pin. Metadata-only:
        the table directory and its data are untouched (deleting a
        physical table is the owner's call, made outside the catalog)."""
        t = self.table(name)  # loud on unknown

        def _mut(tables: dict):
            if name not in tables:
                return False  # a racer already dropped it
            del tables[name]

        out = self._commit(f"drop:{name}", _mut)
        try:
            t.drop_ref(self._ref_name())
        except ValueError:
            pass  # never pinned (registered by a crashed writer)
        return out

    # ---------------------------------------------------------- read surface

    def resolve(
        self, name: str, *, catalog_version: int | None = None
    ) -> tuple[LaketteTable, int]:
        ent = self.read_set(catalog_version).get(name)
        if ent is None:
            raise KeyError(
                f"unknown table {name!r} at catalog version "
                f"{catalog_version if catalog_version is not None else 'HEAD'}"
            )
        return LaketteTable(ent["root"], storage=self.fs), int(ent["version"])

    def snapshot(
        self,
        spark: SparkSession,
        name: str,
        *,
        catalog_version: int | None = None,
        **snapshot_kwargs,
    ) -> DataFrame:
        """Read one table at its CATALOG-pinned version (every snapshot()
        pruning kwarg passes through). Two snapshot() calls against the
        same catalog_version are mutually consistent by construction."""
        t, v = self.resolve(name, catalog_version=catalog_version)
        return t.snapshot(spark, version=v, **snapshot_kwargs)

    def sql_views(
        self,
        spark: SparkSession,
        *,
        names: list[str] | None = None,
        catalog_version: int | None = None,
        prefix: str = "",
    ) -> dict[str, DataFrame]:
        """Register every named table (default: all) as a temp view at the
        pinned versions of ONE catalog commit, so a multi-table spark.sql
        join reads a transactionally consistent set."""
        rs = self.read_set(catalog_version)
        out = {}
        for n in names if names is not None else sorted(rs):
            if n not in rs:
                raise KeyError(f"unknown table {n!r}")
            t = LaketteTable(rs[n]["root"], storage=self.fs)
            out[n] = t.create_or_replace_view(
                spark, f"{prefix}{n}", version=int(rs[n]["version"])
            )
        return out

    # ------------------------------------------------- transactional publish

    def publish(
        self, members: list[tuple[str, str]], *, txn_id: str | None = None
    ) -> dict[str, Any]:
        """Atomically publish staged commits across REGISTERED tables:
        ``publish_transaction`` for crash atomicity at the table layer,
        then ONE catalog commit advancing every member entry — the CAS
        that makes the set visible to catalog readers all-or-nothing.
        ``members`` is ``[(name, stage_id), ...]``.  On a post-flip
        member conflict the catalog does NOT advance (old consistent set
        keeps serving); ``recover()`` finishes and advances."""
        resolved = [(n, self.table(n), sid) for n, sid in members]
        record = publish_transaction(
            [(t, sid) for _, t, sid in resolved],
            self.txn_dir,
            txn_id=txn_id,
            storage=self.fs,
        )
        self._advance_members(
            {m["root"]: int(m["published_version"]) for m in record["members"]}
        )
        return record

    def _advance_members(self, by_root: dict[str, int]) -> None:
        """One catalog commit moving every (root -> version) entry forward;
        entries a racer already advanced past are skipped."""
        if not by_root:
            return

        def _mut(tables: dict):
            moved = False
            for ent in tables.values():
                v = by_root.get(ent["root"])
                if v is not None and int(ent["version"]) < v:
                    ent["version"] = v
                    moved = True
            if not moved:
                return False

        self._commit("publish", _mut)
        for ent in self.read_set().values():
            if ent["root"] in by_root:
                self._pin(
                    LaketteTable(ent["root"], storage=self.fs), ent["version"]
                )

    def recover(self, *, grace_seconds: float = 60.0) -> list[dict[str, Any]]:
        """Settle dead transactions under this catalog's txn_dir
        (``recover_transactions``) and advance the catalog map for every
        record that rolled FORWARD — in one commit per record, so readers
        step between consistent sets, never through a torn one."""
        tables = {
            e["root"]: LaketteTable(e["root"], storage=self.fs)
            for e in self.read_set().values()
        }
        records = recover_transactions(
            self.txn_dir,
            storage=self.fs,
            tables=tables,
            grace_seconds=grace_seconds,
        )
        for rec in records:
            if rec.get("state") == "done":
                self._advance_members(
                    {
                        m["root"]: int(m["published_version"])
                        for m in rec["members"]
                        if m.get("published_version") is not None
                    }
                )
        return records
