"""Incremental derived tables over the changefeed — the bronze -> silver
operator (VERDICT r4 next-round #1).

`derive` maintains a DESTINATION lakette table as a stateless row-level
transform (declarative mapping spec + optional predicate) of a SOURCE
lakette table, incrementally: each call consumes the committed-version
spans since the last applied one (`snapshot_diff`, bucket-pruned — cost
scales with CHANGED data, never table size), applies the transform to the
span's full-row change set, and merges exactly-once into the destination.
It composes the engine's three existing primitives into the pattern every
real lakehouse user builds next:

  * offsets  = the destination's idempotent epoch markers under
    `derive_id`, epoch = source version (operators/replicate.py pattern) —
    resumable from any crash with no extra state;
  * spans    = `snapshot_diff(last, current, full_rows=True)`
    (operators/changes.py) — one full-outer join over bucket-pruned reads;
  * transform = `compile_mapping` (functions/mapping.py) — ONE Catalyst
    projection (or vectorized pandas stages), no per-row Python — plus an
    optional row predicate, exactly the streaming routes shape
    (streaming/routes.py) applied to a table-to-table feed.

Transform contract (v1, enforced loudly): KEY-PRESERVING. The derived
table shares the source's key columns; the mapping spec may list a key
column only as an identity rename (``"repo": "repo"``) — anything else
raises, because a key-changing transform turns row-level CDC into an
aggregation problem (one source key's delete must know which derived keys
it contributed to), which is a different operator. The spec defines the
derived PAYLOAD; `op`/`seq`/engine columns are managed here.

Filter semantics (the part a naive compose gets wrong): the predicate is
evaluated on the SOURCE row, and the derived table must converge to
``filter . map`` of the source snapshot at every applied version —
  insert  & pass  -> upsert         insert  & fail -> skip
  update  & pass  -> upsert         update  & fail -> DELETE (the key may
                                    have passed before — it must leave)
  delete          -> DELETE
Deletes ride the source's seq, so the destination inherits the source's
LWW tombstone floor. Filter-failing inserts are skipped (not tombstoned):
a span classifies a change as `insert` only when the key was absent at the
span start, so the destination cannot be holding a live row for it —
skipping avoids materializing tombstones for the (at scale, vast) filtered
-out key space.

Schema evolution: a span's diff is emitted under the source schema at the
span END (added columns surface as typed NULLs for pre-evolution rows), so
a spec may reference an evolved column from the first span whose end is
past the evolution. The DERIVED schema itself is fixed by the spec at
create time — the spec IS the derived table's contract.

If the source vacuumed past the destination's last-applied version, the
span chain is broken: `derive` falls back to a one-epoch RESYNC — expected
state = transform of the current source snapshot, state-diffed against the
destination (extra destination keys emitted as deletes) and applied with
``overwrite=True`` — repairing the replica while shipping only differing
rows (same repair shape as operators/replicate.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.mapping import MappingSpec, compile_mapping
from ..lakette.table import CommitConflictError, LaketteTable, META_COL_NAMES
from .changes import diff_frames, snapshot_diff
from .merge import MergeStats, merge_into
from .replicate import last_replicated_version


@dataclass
class DeriveReport:
    src_version: int  # source version the derived table now reflects
    applied_epochs: list[MergeStats] = field(default_factory=list)
    initial_sync: bool = False
    resync: bool = False

    @property
    def applied_rows(self) -> int:
        return sum(s.applied_rows for s in self.applied_epochs)


_RESERVED = {"op", *META_COL_NAMES}


def _validate_spec(mapping: MappingSpec, key_cols: list[str]) -> None:
    for k in key_cols:
        if k in mapping and mapping[k] != k:
            raise ValueError(
                f"derive v1 is restricted to KEY-PRESERVING transforms: key "
                f"column {k!r} may only appear in the spec as an identity "
                f"rename ({k!r}: {k!r}) or be omitted (it is passed through "
                f"automatically). A key-changing transform makes one source "
                f"delete fan out to unknown derived keys — that is an "
                f"aggregation, not a row-level derivation."
            )
    bad = _RESERVED.intersection(mapping) - set(key_cols)
    if bad:
        raise ValueError(
            f"mapping spec must not emit engine columns {sorted(bad)} — "
            f"op/seq/deleted/content_sha are managed by derive itself"
        )


def _payload_spec(mapping: MappingSpec, key_cols: list[str]) -> dict:
    """The spec minus identity key entries — what the derived payload is."""
    return {k: v for k, v in mapping.items() if k not in key_cols}


def _derived_schema(
    spark: SparkSession, src: LaketteTable, mapping: MappingSpec, key_cols: list[str]
) -> T.StructType:
    """Derived USER schema = source key columns + the spec's output columns,
    typed by compiling the spec against a zero-row frame of the source's
    user schema (Catalyst does the type inference — no duplicate typing
    rules here)."""
    empty = spark.createDataFrame([], src.user_schema())
    mapped = compile_mapping(empty, _payload_spec(mapping, key_cols))
    src_fields = {f.name: f for f in src.user_schema().fields}
    return T.StructType(
        [src_fields[k] for k in key_cols] + list(mapped.schema.fields)
    )


def _spec_fingerprint(mapping: MappingSpec, predicate) -> dict:
    """Serializable identity of the transform, used to detect a CHANGED
    spec against an existing derived table (silent drift guard): string
    entries are captured verbatim; Column / pandas entries cannot be
    serialized, so they are captured as opaque markers — changing between
    two opaque entries is not detectable, which the docstring of derive()
    calls out (prefer string/SQL entries for drift protection)."""
    ent = {
        k: (v if isinstance(v, str) else f"<non-sql:{type(v).__name__}>")
        for k, v in mapping.items()
    }
    pred = predicate if isinstance(predicate, (str, type(None))) else "<non-sql>"
    return {"mapping": ent, "predicate": pred}


def _spec_guard(
    dst: LaketteTable, derive_id: str, fp: dict, allow_spec_change: bool,
    force_resync: bool = False,
) -> tuple[str, bool, "callable"]:
    """Shared drift guard for derive() and derive_agg(): persist the
    transform's fingerprint next to the destination; raise when a later
    call presents a DIFFERENT spec (incremental spans under a new spec
    would silently mix old- and new-spec rows) unless the caller opted
    into a resync. Returns (qid, spec_changed, store_fp):

      qid     epoch-marker namespace, keyed per SPEC (`derive_id@fp-hash`)
              so an accepted spec change starts from fresh offsets and its
              resync epoch can never be skipped by the old spec's markers;
              a crash between the resync commit and the fingerprint write
              re-enters and heals idempotently (the marker gates the merge)
      store_fp  call after the first successful apply under this spec.

    A persisted REPAIR GENERATION (`_repair_gen` alongside the
    fingerprint) is folded into the qid and bumped on every resync
    trigger — an accepted spec change or `force_resync=True`. This makes
    every resync epoch land in a marker namespace no previous epoch ever
    used, which (a) lets a caller force a full re-derivation at an
    UNCHANGED source version (repairing out-of-band destination drift —
    the old per-spec qid already holds a marker at that version and would
    skip the merge), and (b) closes the A->B->A spec flip-flop hole:
    returning to a previously-used spec used to resurrect its old qid
    whose markers claimed the resync version was already applied,
    silently leaving B-spec rows behind. The bump is crash-idempotent: a
    retry recomputes the same generation (stored gen never advanced) and
    re-enters the same fresh namespace, where the marker gates the merge."""
    import hashlib
    import json as _json

    fp_dir = os.path.join(dst.root, "_derive")
    fp_path = os.path.join(fp_dir, f"{derive_id}.json")
    spec_changed = False
    gen = 0
    if dst.fs.exists(fp_path):
        stored = dst.fs.read_json(fp_path)
        gen = int(stored.pop("_repair_gen", 0))
        if stored != fp:
            if not allow_spec_change:
                raise ValueError(
                    f"derive spec for {derive_id!r} differs from the one this "
                    f"destination was built with — incremental spans under a "
                    f"new spec would mix old- and new-spec rows. Pass "
                    f"allow_spec_change=True to re-derive every row via a "
                    f"resync epoch under the new spec."
                )
            spec_changed = True
    if spec_changed or force_resync:
        gen += 1

    qid = (
        derive_id + "@"
        + hashlib.sha256(_json.dumps(fp, sort_keys=True).encode()).hexdigest()[:8]
        + (f"+r{gen}" if gen else "")
    )

    def store_fp() -> None:
        dst.fs.makedirs(fp_dir)
        dst.fs.put_json(fp_path, {**fp, "_repair_gen": gen} if gen else fp)

    return qid, spec_changed, store_fp


def _keep_expr(predicate: Column | str | None) -> Column:
    if predicate is None:
        return F.lit(True)
    col = F.expr(predicate) if isinstance(predicate, str) else predicate
    return F.coalesce(col, F.lit(False))  # NULL predicate = fail, loudly false


def _events_from_span(
    diff: DataFrame,
    mapping: MappingSpec,
    key_cols: list[str],
    predicate: Column | str | None,
    *,
    mor_guard: bool = False,
) -> DataFrame:
    """Span change set -> merge envelope under the derive semantics table
    (module docstring). One Catalyst projection; D rows carry NULL payload
    (tombstones store no payload).

    `mor_guard=True` (the span must carry `_old_seq`) raises INSIDE the
    merge job — zero extra Spark jobs — on any row whose seq did not
    advance past the pre-span seq: a MOR destination resolves reads by
    max(seq), so a non-advancing change (source predicate DML preserves
    seq; restore regresses it) would either be silently lost or decay to
    an arbitrary same-seq tie. Loud beats either."""
    from ..functions.mapping import _compile_entry

    live = F.col("change").isin("insert", "update")
    keep = _keep_expr(predicate)
    kept = diff.filter(~((F.col("change") == "insert") & ~keep))
    payload = _payload_spec(mapping, key_cols)
    mapped = compile_mapping(kept, payload)  # type source for the NULL arms
    upsert = live & keep
    return kept.select(
        F.when(upsert, F.lit("U")).otherwise(F.lit("D")).alias("op"),
        *key_cols,
        *[
            F.when(upsert, _compile_entry(name, entry))
            .otherwise(F.lit(None).cast(fld.dataType))
            .alias(name)
            for (name, entry), fld in zip(payload.items(), mapped.schema.fields)
        ],
        _guarded_seq(key_cols) if mor_guard else F.col("seq"),
    )


def _guarded_seq(key_cols: list[str]) -> Column:
    """seq column that raises on a non-seq-advancing span row (requires
    `_old_seq` from diff_frames(old_seq=True)); see _events_from_span."""
    non_advancing = F.col("_old_seq").isNotNull() & (
        F.col("seq") <= F.col("_old_seq")
    )
    msg = F.concat_ws(
        "",
        F.lit("mor destination cannot express a non-seq-advancing source "
              "change (predicate DML preserves seq; restore regresses it): "
              "key=("),
        F.concat_ws(",", *[F.col(k).cast("string") for k in key_cols]),
        F.lit(") seq "),
        F.col("seq").cast("string"),
        F.lit(" <= prior "),
        F.col("_old_seq").cast("string"),
        F.lit(" — use a cow destination or resync"),
    )
    return (
        F.when(non_advancing, F.raise_error(msg).cast("long"))
        .otherwise(F.col("seq"))
        .alias("seq")
    )


def _expected_state(
    snap: DataFrame,
    mapping: MappingSpec,
    key_cols: list[str],
    predicate: Column | str | None,
) -> DataFrame:
    """Transform of a full source snapshot (include_deleted=True), shaped
    like a derived-table snapshot (keys + payload + seq/deleted/content_sha)
    — the resync comparison frame AND the recompute frame tests check
    convergence against. Source tombstones stay tombstones (the LWW floor
    transfers); live rows failing the filter are dropped."""
    from ..functions.mapping import _compile_entry

    keep = _keep_expr(predicate)
    tomb = F.coalesce(F.col("deleted"), F.lit(False))
    kept = snap.filter(tomb | keep)
    payload = _payload_spec(mapping, key_cols)
    mapped_cols = [
        F.when(~tomb, _compile_entry(name, entry)).alias(name)
        for name, entry in payload.items()
    ]
    out = kept.select(*key_cols, *mapped_cols, F.col("seq"), tomb.alias("deleted"))
    # content_sha is computed on the MAPPED content column (two-step select
    # so the mapped payload exists first), matching what merge_into stamps
    content_sha = (
        F.when(~F.col("deleted"), F.sha2(F.col("content"), 256))
        if "content" in payload
        else F.lit(None).cast("string")
    )
    return out.withColumn("content_sha", content_sha)


def derive(
    spark: SparkSession,
    src: LaketteTable,
    dst_root: str,
    mapping: MappingSpec,
    *,
    predicate: Column | str | None = None,
    derive_id: str = "derive",
    mode: str = "cow",
    n_buckets: int | None = None,
    every_version: bool = False,
    allow_spec_change: bool = False,
    force_resync: bool = False,
) -> DeriveReport:
    """Bring the derived table at `dst_root` up to the source's current
    version under the transform (mapping, predicate). Creates the
    destination on first call (schema inferred from the spec; source key
    columns). Safe to call repeatedly — whole source versions land
    atomically, exactly-once under `derive_id`; a poll loop over this call
    is a live derived view (availableNow semantics = one call).

    Spec drift guard: the transform's fingerprint is persisted next to the
    destination on first call; a later call with a DIFFERENT spec raises
    (incremental spans under a new spec would silently mix old-spec and
    new-spec rows). Pass `allow_spec_change=True` to accept the new spec —
    derive then runs a full RESYNC epoch (state-diff of new-spec expected
    state vs the destination, overwrite semantics) so every row is
    re-derived consistently, and updates the stored fingerprint. String/
    SQL spec entries get exact drift detection; Column/pandas entries are
    opaque (a swap between two opaque entries is not detectable).

    `force_resync=True` runs the same full resync epoch at an UNCHANGED
    spec — the repair lever for out-of-band destination drift (rows
    edited/merged into the derived table behind the deriver's back) or
    plain suspicion: expected state is recomputed from the current source
    snapshot, state-diffed against the destination (repair semantics:
    divergent payloads rewritten, extra keys deleted), and applied in a
    fresh marker namespace so it is never skipped as already-done. The
    SQL face is `REFRESH MATERIALIZED VIEW <name> FULL`."""
    src_meta = src._raw_current()
    target_v = int(src_meta["version"])
    key_cols = list(src_meta["key_cols"])
    _validate_spec(mapping, key_cols)

    if LaketteTable.exists(dst_root):
        dst = LaketteTable(dst_root)
    else:
        schema = _derived_schema(spark, src, mapping, key_cols)
        try:
            dst = LaketteTable.create(
                dst_root,
                schema,
                key_cols,
                n_buckets=int(n_buckets or src_meta["n_buckets"]),
                target_file_rows=src_meta.get("target_file_rows"),
            )
        except CommitConflictError:
            dst = LaketteTable(dst_root)  # a twin deriver created it first
    report = DeriveReport(src_version=target_v)

    # spec drift guard (see docstring / _spec_guard)
    qid, spec_changed, _store_fp = _spec_guard(
        dst, derive_id, _spec_fingerprint(mapping, predicate), allow_spec_change,
        force_resync=force_resync,
    )

    def _apply(batch: DataFrame, epoch: int, *, mode_: str, overwrite: bool = False):
        # twin tolerance (replicate pattern): a twin deriver that raced us
        # past the marker check and won makes OUR application redundant —
        # re-enter merge_into, which skips on the twin's marker.
        try:
            return merge_into(
                spark, dst, batch, query_id=qid, epoch=epoch,
                mode=mode_, overwrite=overwrite,
            )
        except CommitConflictError:
            if not dst.epoch_committed(qid, epoch):
                raise
            return merge_into(
                spark, dst, batch, query_id=qid, epoch=epoch,
                mode=mode_, overwrite=overwrite,
            )

    def _resync() -> DeriveReport:
        # expected = transform of the current source snapshot; state-diff
        # vs the destination (repair=True catches same-seq divergence and
        # emits deletes for extra dst keys), applied with overwrite=True
        # through the COW path.
        report.resync = True
        expected = _expected_state(
            src.snapshot(spark, include_deleted=True, metadata=src_meta),
            mapping, key_cols, predicate,
        )
        payload_names = set(_payload_spec(mapping, key_cols))
        # the repair diff compares every column BOTH scans carry: when
        # content_sha witnesses the whole payload (payload == {content})
        # a keys-only destination read suffices; any other payload must be
        # read so same-seq divergence in it (a spec-change resync's whole
        # point) is visible to the diff
        dst_snap = dst.snapshot(
            spark, include_deleted=True,
            columns=[] if payload_names == {"content"} else None,
        )
        payload_cols = [
            c for c in expected.columns
            if c not in key_cols and c not in ("seq", "deleted", "content_sha")
        ]
        diff = diff_frames(
            dst_snap, expected, key_cols, payload_cols,
            full_rows=True, repair=True,
        )
        op = (
            F.when(F.col("change") == "delete", F.lit("D")).otherwise(F.lit("U"))
        )
        batch = diff.select(op.alias("op"), *key_cols, *payload_cols, F.col("seq"))
        report.applied_epochs.append(
            _apply(batch, target_v, mode_="cow", overwrite=True)
        )
        _store_fp()
        return report

    if spec_changed or force_resync:
        # every row must be re-derived (fresh offsets: the gen-bumped qid
        # has no markers, so the resync epoch cannot be skipped)
        return _resync()

    last = last_replicated_version(dst, qid)
    if last is None:
        # initial sync: transform of the whole current snapshot, one epoch.
        # Source tombstones derive as deletes (LWW floor transfers).
        report.initial_sync = True
        snap = src.snapshot(spark, include_deleted=True, metadata=src_meta)
        state = _expected_state(snap, mapping, key_cols, predicate)
        batch = state.select(
            F.when(F.col("deleted"), F.lit("D")).otherwise(F.lit("U")).alias("op"),
            *key_cols,
            *[c for c in state.columns
              if c not in key_cols and c not in ("seq", "deleted", "content_sha")],
            F.col("seq"),
        )
        report.applied_epochs.append(_apply(batch, target_v, mode_=mode))
        _store_fp()
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
        return _resync()  # vacuumed past the derived table's offset — repair

    for lo, hi in spans:
        if dst.epoch_committed(qid, hi):
            continue  # a crashed previous run already landed this span
        span = snapshot_diff(
            spark, src, lo, hi, full_rows=True, old_seq=(mode == "mor")
        )
        events = _events_from_span(
            span, mapping, key_cols, predicate, mor_guard=(mode == "mor")
        )
        # overwrite on COW destinations: a span is AUTHORITATIVE state
        # traffic (computed between two pinned source versions, and this
        # deriver's markers guarantee dst sits exactly at `lo`), so rows
        # that do NOT advance seq — predicate-DML edits (seq preserved)
        # and restores (seq regressed) on the source — must still apply;
        # the LWW guard would silently drop them. For event-driven spans
        # overwrite and LWW agree (seqs always advance), so this changes
        # nothing there. MOR destinations resolve reads by max seq and
        # cannot express a non-advancing update — with mode='mor', such a
        # row raises INSIDE the merge job (_guarded_seq): resync or a cow
        # destination is the remedy, never an arbitrary same-seq tie.
        report.applied_epochs.append(
            _apply(events, hi, mode_=mode, overwrite=(mode == "cow"))
        )
    return report


def derived_state_recompute(
    spark: SparkSession,
    src: LaketteTable,
    mapping: MappingSpec,
    *,
    predicate: Column | str | None = None,
) -> DataFrame:
    """The transform applied to the CURRENT source snapshot in one shot —
    the convergence oracle: after derive() catches up, the derived table's
    live snapshot must equal this frame exactly (tests assert sha-equality
    row for row). Not an ingest path; a full recompute scans the whole
    source."""
    snap = src.snapshot(spark, include_deleted=True)
    state = _expected_state(snap, mapping, list(src.key_cols()), predicate)
    return state.filter(~F.col("deleted")).drop("deleted")
