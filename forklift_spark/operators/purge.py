"""Key purge across retained history — the right-to-be-forgotten surface
(SURVEY.md §2.10 lakehouse parity; GDPR Art. 17 erasure over a table that
keeps time travel).

An ordinary delete (event tombstone or `delete_where`) removes a key from
the CURRENT snapshot only: every retained historical version still serves
the old payload through time travel, and vacuum can only age those
versions out wholesale. `purge_keys` erases a key's PAYLOAD from every
retained version — history, refs/tags, staged (WAP) commits, and the
current head — while keeping time travel intact for all other data.

Semantics: REDACTION IN PLACE, not row removal.

Every matching row in every retained data file becomes a tombstone in the
exact shape `delete_where` writes (operators/dml.py `_to_tombstone`): all
payload columns nulled, `content_sha` nulled, `deleted=true`, `seq`
PRESERVED. Redaction — not physical row drop — is what keeps every stored
invariant true:

  * manifest `rows` counts stay exact -> fsck DEEP stays green and the
    maintained counters (`total_rows`, bucket stats) stay truthful;
  * `kmin`/`kmax`/bloom stats stay exact (the key value is kept), so
    file pruning never mis-plans;
  * per-file `smax` stays exact (seq preserved);
  * payload `cstats` become over-approximations of the remaining values —
    still SAFE for pruning (a pruned file can only be kept, never skipped
    wrongly);
  * LWW confluence holds: a replayed pre-purge event (same seq) can never
    resurrect the row, because the stored tombstone keeps the seq — the
    identical argument delete_where makes.

What remains after a purge, by design: the KEY VALUE itself and its seq
timeline (as tombstones). The key must survive — it is the arbitration
handle that blocks resurrection on duplicate delivery — so tables subject
to erasure requests should use non-personal surrogate keys. Upstream
retention (the ingest change log, dead-letter files, exports) is the
caller's jurisdiction: purge covers the TABLE and everything derived from
its files (time travel, snapshot_diff/changes spans, clones sharing these
files all serve redacted data immediately). DERIVED tables (derive /
derive_agg / materialized views) hold their own files with TRANSFORMED
copies of the payload — issue purge_keys on each derived table too
(key-preserving derives keep the source key, so the same key list works;
tests/test_purge.py::test_purge_applies_to_derived_tables). Secondary
INDEX tables derived from payload columns should be rebuilt or purged by
their own keys.

Cost shape at 100 TB: candidate files are planned from metadata alone via
hash-bucket pruning per retained version (a key lives in exactly one
bucket per spec; plan_files folds current-spec buckets onto older specs
exactly), plus first-key-range pruning for string keys — O(versions x
touched-bucket files), never O(table). The rewrite itself is one
distributed Spark job over the candidate file list (pyarrow read ->
redact -> atomic same-path replace on the shared data store).

Concurrency contract (same class as vacuum's grace reasoning): run purge
with no concurrent WRITERS. A COW/compact job that read a file before the
rewrite can re-commit pre-purge payload it already holds in memory; purge
is idempotent, so the remedy is re-running it once writers are quiesced —
`verify=True` (default) makes the post-condition a measured fact, not an
assumption. Readers are safe throughout: the replace is atomic, and both
the old and new file satisfy the manifest the reader planned from.

Shallow clones: a CLONE's metadata references the source's files by
absolute path — rewriting them would silently mutate the SOURCE table, so
purge on a clone refuses loudly (purge the source instead, which cleanses
every clone sharing the files). Column renames are transparent: physical
key/payload names are resolved per retained version through that
version's column mapping, and physical names never change after birth.

Patch (column_lww) tables are rejected for the same reason as predicate
DML: per-column writer seqs arbitrate each column independently, and an
out-of-band rewrite that preserves col_seqs would masquerade as the
writer it overwrote.
"""

from __future__ import annotations

import os
import uuid
from typing import Any, Iterable

from pyspark.sql import SparkSession

from ..lakette.table import META_COL_NAMES, LaketteTable, _colmap

__all__ = ["purge_keys"]

#: physical system columns a redaction must never null (seq arbitrates
#: LWW; deleted is the tombstone flag being set; col_seqs only exists on
#: patch tables, which purge rejects). content_sha IS nulled — it is a
#: digest of purged payload (mirrors delete_where's tombstone shape).
_KEEP_COLS = {"seq", "deleted", "col_seqs"}


def _normalize_keys(keys, key_cols: list[str]) -> list[tuple]:
    """Accept scalars (single-column key), tuples, or dicts keyed by the
    logical key-column names; return canonical tuples in key_cols order."""
    out = []
    for k in keys:
        if isinstance(k, dict):
            missing = [c for c in key_cols if c not in k]
            if missing:
                raise ValueError(f"key dict missing columns {missing}: {k!r}")
            out.append(tuple(k[c] for c in key_cols))
        elif isinstance(k, (tuple, list)):
            if len(k) != len(key_cols):
                raise ValueError(
                    f"key tuple arity {len(k)} != key columns {key_cols}"
                )
            out.append(tuple(k))
        else:
            if len(key_cols) != 1:
                raise ValueError(
                    f"scalar key {k!r} but table key is composite {key_cols}"
                )
            out.append((k,))
    if not out:
        raise ValueError("purge_keys: empty key list")
    return out


def _key_buckets(spark: SparkSession, table: LaketteTable,
                 key_tuples: list[tuple]) -> list[int]:
    """Current-spec bucket ids of the purge keys — ONE tiny Spark job
    (xxhash64 must match bucket_expr exactly; never re-implement it)."""
    from pyspark.sql import types as T

    schema = T.StructType([
        f for f in table.user_schema().fields if f.name in table.key_cols()
    ])
    # preserve key order
    schema = T.StructType(sorted(schema.fields,
                                 key=lambda f: table.key_cols().index(f.name)))
    df = spark.createDataFrame(key_tuples, schema)
    rows = df.select(table.bucket_expr().alias("b")).distinct().collect()
    return sorted(int(r.b) for r in rows)


def _redact_file(item: dict, key_set: frozenset, dry_run: bool) -> dict:
    """Executor-side: redact one parquet file in place. Returns
    {path, matched, redacted, rewritten}. `matched` counts rows whose key
    is in the purge set; `redacted` counts those NOT already in the
    redacted shape (payload all null + deleted) — the idempotence basis."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    path, phys_keys = item["abs_path"], item["phys_keys"]
    tbl = pq.read_table(path)
    n = tbl.num_rows
    if n == 0:
        return {"path": item["path"], "matched": 0, "redacted": 0,
                "rewritten": False}
    names = tbl.schema.names
    payload = [c for c in names if c not in phys_keys and c not in _KEEP_COLS]

    # match mask: key tuple membership. Single-column keys go through
    # vectorized is_in; composite keys zip driver-side (file rows are
    # bounded by target_file_rows, so the python pass is bounded too).
    if len(phys_keys) == 1:
        vals = pa.array([k[0] for k in key_set],
                        type=tbl.schema.field(phys_keys[0]).type)
        mask = pc.is_in(tbl.column(phys_keys[0]).combine_chunks(),
                        value_set=vals)
    else:
        cols = [tbl.column(c).to_pylist() for c in phys_keys]
        mask = pa.array([t in key_set for t in zip(*cols)], type=pa.bool_())
    mask = pc.fill_null(mask, False)
    matched = pc.sum(mask).as_py() or 0
    if not matched:
        return {"path": item["path"], "matched": 0, "redacted": 0,
                "rewritten": False}

    # needs-redaction = matched AND (any payload non-null OR not deleted):
    # already-redacted rows make a second purge a no-op (idempotence)
    dirty = pa.array([False] * n, type=pa.bool_())
    for c in payload:
        dirty = pc.or_kleene(dirty, pc.is_valid(tbl.column(c).combine_chunks()))
    if "deleted" in names:
        dead = pc.fill_null(tbl.column("deleted").combine_chunks(), False)
        dirty = pc.or_kleene(dirty, pc.invert(dead))
    needs = pc.and_(mask, pc.fill_null(dirty, False))
    redacted = pc.sum(needs).as_py() or 0
    if not redacted or dry_run:
        return {"path": item["path"], "matched": int(matched),
                "redacted": int(redacted), "rewritten": False}

    arrays, fields = [], []
    for c in names:
        col = tbl.column(c).combine_chunks()
        if c in payload:
            col = pc.if_else(mask, pa.nulls(n, type=col.type), col)
        elif c == "deleted":
            col = pc.if_else(mask, pa.scalar(True),
                             pc.fill_null(col, False))
        arrays.append(col)
        fields.append(tbl.schema.field(c))
    out = pa.table(arrays, schema=pa.schema(fields, tbl.schema.metadata))
    tmp = f"{path}.purge-{uuid.uuid4().hex}.tmp"
    pq.write_table(out, tmp, coerce_timestamps="us")
    os.replace(tmp, path)  # atomic: readers see old or new, never torn
    return {"path": item["path"], "matched": int(matched),
            "redacted": int(redacted), "rewritten": True}


def purge_keys(
    spark: SparkSession,
    table: LaketteTable,
    keys: Iterable,
    *,
    dry_run: bool = False,
    verify: bool = True,
) -> dict[str, Any]:
    """Erase the payload of `keys` from EVERY retained version of `table`
    (module docstring: redaction in place — tombstone shape, seq kept).

    keys: scalars (single-column key), tuples in key_cols order, or dicts
    keyed by the logical key-column names.

    dry_run=True plans candidates and COUNTS matching/needs-redaction rows
    without writing anything (the pre-flight before an erasure run).
    verify=True (default) re-plans and re-scans after the rewrite and
    asserts zero needs-redaction rows remain — the erasure post-condition
    as a measured fact.

    Concurrent commits: planning-then-rewriting races a writer that
    COMMITS new files mid-purge. The loop below closes that window —
    after each rewrite pass it re-reads the table version and re-plans if
    anything landed meanwhile (new files get their own pass), up to
    `max_rounds`. What no rewrite can fix is a writer that READ pre-purge
    payload into memory before the purge and commits it after the last
    round — that is what verify catches (module docstring: quiesce
    writers; purge is idempotent, re-run it). Returns the report dict.
    """
    raw = table._raw_current()
    if raw.get("column_lww"):
        raise ValueError(
            "purge_keys is not supported on column_lww (patch) tables: "
            "per-column writer seqs arbitrate each column independently — "
            "an out-of-band rewrite cannot be attributed"
        )
    key_cols = list(raw["key_cols"])
    key_tuples = _normalize_keys(keys, key_cols)
    key_set = frozenset(key_tuples)
    buckets_now = _key_buckets(spark, table, key_tuples)

    # string single-key tables additionally range-prune on [min, max]
    key_range = None
    if len(key_cols) == 1 and all(isinstance(k[0], str) for k in key_tuples):
        ks = sorted(k[0] for k in key_tuples)
        key_range = (ks[0], ks[-1])

    def _plan() -> tuple[list[dict], dict, list]:
        """Candidate files from metadata alone, bucket-pruned per retained
        version (+ staged WAP records), with per-version physical key
        names. Returns (work list, current raw metadata, history)."""
        cur = table._raw_current()
        n_now = int(cur["n_buckets"])
        history = table.history()
        items: dict[str, dict] = {}
        foreign: list[str] = []

        def _add(f: dict, phys_keys: list[str]) -> None:
            rel = f["path"]
            if os.path.isabs(rel):
                foreign.append(rel)
                return
            items.setdefault(rel, {
                "path": rel,
                "abs_path": os.path.join(table.root, rel),
                "phys_keys": phys_keys,
            })

        for h in history:
            vraw = table._raw_metadata_at(h["version"])
            cm = _colmap(vraw)
            phys_keys = [cm.get(c, c) for c in vraw["key_cols"]]
            nv = int(vraw["n_buckets"])
            bv = (sorted({b % nv for b in buckets_now})
                  if n_now % nv == 0 else None)
            for f in table.plan_files(buckets=bv, key_range=key_range,
                                      metadata=vraw):
                _add(f, phys_keys)
        cm_now = _colmap(cur)
        phys_now = [cm_now.get(c, c) for c in key_cols]
        for rec in table.list_staged():
            for f in rec["new_files"]:
                _add(f, phys_now)
        if foreign:
            raise ValueError(
                "purge_keys on a shallow clone would rewrite the SOURCE "
                f"table's files ({len(foreign)} absolute references, e.g. "
                f"{foreign[0]!r}) — purge the source table instead; clones "
                "sharing its files are cleansed by the same rewrite"
            )
        return sorted(items.values(), key=lambda d: d["path"]), cur, history

    sc = spark.sparkContext

    def _run(work: list[dict], counting_only: bool) -> list[dict]:
        par = min(len(work), sc.defaultParallelism)
        return (
            sc.parallelize(work, par)
            .map(lambda it: _redact_file(it, key_set, counting_only))
            .collect()
        )

    max_rounds = 3
    rounds = 0
    seen: set[str] = set()
    files_rewritten = rows_matched = rows_redacted = candidate_files = 0
    while True:
        work, cur, history = _plan()
        v0 = int(cur["version"])
        candidate_files = max(candidate_files, len(work))
        rounds += 1
        if work:
            results = _run(work, dry_run)
            files_rewritten += sum(1 for r in results if r["rewritten"])
            # matched/redacted counted once per file (later rounds re-scan
            # already-clean files and add zero redactions by idempotence)
            fresh = [r for r in results if r["path"] not in seen]
            rows_matched += sum(r["matched"] for r in fresh)
            rows_redacted += sum(r["redacted"] for r in results)
            seen.update(r["path"] for r in results)
        if dry_run:
            break
        if int(table._raw_current()["version"]) == v0 or rounds >= max_rounds:
            break

    report: dict[str, Any] = {
        "keys": len(key_set),
        "versions_scanned": len(history),
        "candidate_files": candidate_files,
        "buckets": buckets_now,
        "rounds": rounds,
        "dry_run": dry_run,
        "files_rewritten": files_rewritten,
        "rows_matched": rows_matched,
        "rows_redacted": rows_redacted,
    }

    if verify and not dry_run:
        work, _cur, _history = _plan()  # fresh plan: verify what IS retained
        remaining = (
            sum(r["redacted"] for r in _run(work, True)) if work else 0
        )
        report["verified_clean"] = remaining == 0
        if remaining:
            raise RuntimeError(
                f"purge verification failed: {remaining} rows still carry "
                "payload — a concurrent writer re-landed pre-purge data; "
                "quiesce writers and re-run purge_keys"
            )
    return report
