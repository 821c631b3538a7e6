"""Multi-table transactional publish over the WAP primitives — the
medallion pipeline's missing piece: land bronze + silver + gold (or any
set of staged commits) so that a reader never observes a torn subset
across process CRASHES.

Protocol (one small JSON record under the caller's txn_dir is the
arbiter):

  1. callers stage each member with the ordinary machinery
     (merge_into(publish=False) / stage_commit) — nothing visible;
  2. publish_transaction writes the record (exclusive create,
     state="pending"), pre-validates every member with the SAME
     independence rule the publish CAS uses (provably-disjoint
     interleaving commits pass and rebase at publish; overlapping ones
     fail here with NOTHING published and the staged work intact);
  3. the record flips to state="committed" (atomic overwrite — THE
     transaction commit point);
  4. each member publishes through the ordinary CAS
     (publish_staged — full rebase/conflict validation), the record
     accumulating per-member published versions;
  5. state="done".

Crash atomicity: recover_transactions() rolls a dead "pending" record
BACK (abort the staged members — nothing was ever visible) and rolls a
dead "committed" record FORWARD (publish the remaining members). Both
directions are idempotent: a member whose publish landed but whose
record update was lost is recognized by its WRITER STAMP in the version
chain (bounded O(retained versions) metadata reads), skipped, and its
epoch marker written (publication IS epoch completion — without the
marker the exactly-once gate would rest on the current-writer stamp
alone, which the table's next commit overwrites). Roll-back is gated
behind a grace age; the grace must exceed the publisher's worst-case
pre-flip stall (validation I/O included) — the flip re-checks the
record state to shrink the race to one read-write window, and the
txn_dir single-owner contract is what closes it. Terminal records are
renamed {id}.{done|aborted}.json so the sweep skips them by FILENAME —
O(live records) per call however many epochs have run; the terminal
copies are the audit trail and can be deleted freely.

Concurrency limits, stated honestly: atomicity across tables holds
against crashes, not against arbitrary CONCURRENT writers — if an
interleaving commit conflicts with a member after the flip, that member's
publish raises and the transaction is left state="committed" with the
published subset visible and the remainder staged; recover_transactions
retries the remainder after the conflict is resolved (publish_staged
auto-rebases provably-independent commits, so disjoint-bucket traffic
never triggers this). Cross-table ISOLATION for un-coordinated writers
needs a catalog-level commit (out of scope). The intended user — one
pipeline owning its derived chain — gets full atomicity.
"""

from __future__ import annotations

import os
import re
import time
import uuid
from typing import Any

from .storage import PosixStorage, Storage
from .table import CommitConflictError, LaketteTable

_VFILE = re.compile(r"^v(\d+)\.json$")


def _writer_published_version(table: LaketteTable, writer: dict) -> int | None:
    """Version committed with this (query_id, epoch) writer stamp, or None.
    The idempotence probe for roll-forward: bounded by vacuum retention."""
    qid, ep = writer.get("query_id"), writer.get("epoch")
    for fn in sorted(table.fs.listdir(table.meta_dir), reverse=True):
        if not _VFILE.match(fn):
            continue
        w = table.fs.read_json(os.path.join(table.meta_dir, fn)).get("writer")
        if w and w.get("query_id") == qid and w.get("epoch") == ep:
            return int(_VFILE.match(fn).group(1))
    return None


def _record_path(txn_dir: str, txn_id: str) -> str:
    return os.path.join(txn_dir, f"{txn_id}.json")


def _finalize(fs: Storage, txn_dir: str, record: dict) -> None:
    """Move a terminal (done/aborted) record aside BY FILENAME
    ({id}.json -> {id}.{state}.json) so the recovery sweep skips it
    without a read — keeps the per-epoch sweep O(live records), not
    O(all epochs ever). Terminal copies are the audit trail; delete them
    freely. Crash between copy and remove leaves both files: recovery
    re-processes the live one (idempotent) and finalizes again."""
    fs.put_json(
        os.path.join(txn_dir, f"{record['txn_id']}.{record['state']}.json"),
        record,
    )
    try:
        fs.remove(_record_path(txn_dir, record["txn_id"]))
    except (OSError, FileNotFoundError):
        pass


def _publish_member(table: LaketteTable, m: dict) -> int:
    """Publish one member idempotently; returns the published version and
    writes the member's EPOCH MARKER — the staging merge could not (no
    commit existed yet), and without it the exactly-once gate degrades to
    the current-writer stamp alone, which the next commit on the table
    (e.g. a same-epoch compaction) overwrites."""

    def _mark(v: int) -> int:
        w = m["writer"]
        try:
            snap = int(table._raw_metadata_at(int(v))["snapshot_id"])
        except (ValueError, OSError, KeyError):
            snap = -1  # version already vacuumed; marker existence is what gates
        table.write_epoch_marker(w["query_id"], int(w["epoch"]), snap)
        return int(v)

    try:
        table.staged_record(m["stage_id"])
    except (OSError, FileNotFoundError):
        # staged record gone: either our own earlier publish landed, or a
        # crashed publish lost the record-update race — the writer stamp
        # in the chain disambiguates
        v = _writer_published_version(table, m["writer"])
        if v is not None:
            return _mark(v)
        raise ValueError(
            f"member {m['root']} stage {m['stage_id']} vanished without a "
            "matching writer stamp in the chain — aborted by someone else?"
        )
    try:
        return _mark(table.publish_staged(m["stage_id"]).version)
    except CommitConflictError:
        v = _writer_published_version(table, m["writer"])
        if v is not None:
            # crash window: the publish landed, the staged-record removal
            # or our record update did not — clean up and move on
            try:
                table.abort_staged(m["stage_id"], delete_files=False)
            except (OSError, FileNotFoundError):
                pass
            return _mark(v)
        raise


def publish_transaction(
    members: list[tuple[LaketteTable, str]],
    txn_dir: str,
    *,
    txn_id: str | None = None,
    storage: Storage | None = None,
) -> dict[str, Any]:
    """Publish every (table, stage_id) member atomically w.r.t. crashes
    (module docstring). Returns the final record."""
    fs = storage or PosixStorage()
    fs.makedirs(txn_dir)
    txn_id = txn_id or uuid.uuid4().hex[:16]
    roots: dict[str, int] = {}
    for i, (table, _) in enumerate(members):
        if table.root in roots:
            raise ValueError(
                f"members {roots[table.root]} and {i} share table "
                f"{table.root} — the second publish would conflict with the "
                "first INSIDE the transaction by construction (one staged "
                "commit per table per transaction; fold the changes into "
                "one stage instead)"
            )
        roots[table.root] = i
    recs = []
    for table, stage_id in members:
        rec = table.staged_record(stage_id)  # raises if missing
        if not rec.get("writer") or rec["writer"].get("query_id") is None:
            raise ValueError(
                f"transaction member {table.root} stage {stage_id} has no "
                "writer stamp — stage with writer={'query_id','epoch'} so "
                "crash recovery can prove publication"
            )
        recs.append((table, rec))
    record = {
        "txn_id": txn_id,
        "state": "pending",
        "created_at": time.time(),
        "members": [
            {
                "root": t.root,
                "stage_id": r["stage_id"],
                "writer": r["writer"],
                "base_version": r["base_version"],
                "published_version": None,
            }
            for t, r in recs
        ],
    }
    path = _record_path(txn_dir, txn_id)
    fs.put_json_exclusive(path, record)

    # pre-flip validation, SAME independence rule the publish CAS applies
    # (_validate_base): interleaving commits that are provably disjoint
    # from a member's footprint pass here and rebase at publish;
    # overlapping ones fail with NOTHING published, staged work intact,
    # record marked aborted so recovery never touches it. Best-effort
    # narrowing — the authoritative check is publish's own CAS.
    for t, r in recs:
        cur = t._raw_current()
        if int(cur["version"]) == int(r["base_version"]):
            continue
        cur_nb = int(cur["n_buckets"])
        pairs = {(int(p[0]), int(p[1])) for p in r["replaced_buckets"]}
        pairs |= {
            (int(f.get("nb", cur_nb)), int(f["bucket"])) for f in r["new_files"]
        }
        touched: set[int] = set()
        for nb, b in pairs:
            if cur_nb % nb == 0:
                touched.update(range(b, cur_nb, nb))
            else:
                touched.update(range(cur_nb))
        try:
            t._validate_base(int(r["base_version"]), cur, touched)
        except CommitConflictError as e:
            record["state"] = "aborted"
            record["abort_reason"] = f"{t.root}: {e}"
            _finalize(fs, txn_dir, record)
            raise CommitConflictError(
                f"txn {txn_id}: member {t.root} conflicts with a commit that "
                "landed since staging — nothing was published; re-stage "
                "against the current version (staged records left intact)"
            ) from e

    # THE commit point — but check first that a recovery sweep did not
    # roll this record back while validation ran (a slow pre-flip past the
    # recovery grace). The read-then-write still has a syscall-wide
    # window; the txn_dir ownership contract (one publisher, grace well
    # above its worst-case stall) is what actually closes it — documented,
    # not pretended away.
    live = fs.read_json(path) if fs.exists(path) else None
    if live is None or live.get("state") != "pending":
        raise CommitConflictError(
            f"txn {txn_id} was rolled back by a recovery sweep while "
            "validating (record state: "
            f"{live.get('state') if live else 'gone'}) — nothing was "
            "published by THIS publisher; its staged members were aborted "
            "by the sweep, so re-stage and retry (and raise the recovery "
            "grace above this publisher's worst-case stall)"
        )
    record["state"] = "committed"
    fs.put_json(path, record)

    for (table, _), m in zip(recs, record["members"]):
        try:
            m["published_version"] = _publish_member(table, m)
        except CommitConflictError as e:
            record["conflict"] = f"{m['root']}: {e}"
            fs.put_json(path, record)
            raise CommitConflictError(
                f"txn {txn_id} is COMMITTED but member {m['root']} conflicts "
                "with an interleaving commit — the published subset is "
                "visible; resolve the conflict and run "
                "recover_transactions() to finish the remainder"
            ) from e
        fs.put_json(path, record)
    record["state"] = "done"
    _finalize(fs, txn_dir, record)
    return record


def recover_transactions(
    txn_dir: str,
    *,
    storage: Storage | None = None,
    tables: dict[str, LaketteTable] | None = None,
    grace_seconds: float = 60.0,
) -> list[dict[str, Any]]:
    """Finish every dead transaction under txn_dir: committed records roll
    FORWARD (publish the remainder — idempotent via writer stamps),
    pending records older than `grace_seconds` roll BACK (abort the
    staged members — nothing was ever visible; the grace keeps recovery
    off a LIVE publisher still between create and flip). done/aborted
    records are left as the audit trail. Returns the records acted on."""
    fs = storage or PosixStorage()
    if not fs.isdir(txn_dir):
        return []
    out: list[dict[str, Any]] = []
    errors: list[str] = []
    for fn in sorted(fs.listdir(txn_dir)):
        # terminal records were renamed to {id}.{done|aborted}.json by
        # _finalize — skipped HERE BY FILENAME, no read, so the per-epoch
        # sweep in streaming loops stays O(live records) however many
        # epochs have ever run (the terminal copies are the audit trail)
        if not fn.endswith(".json") or fn.endswith(
            (".done.json", ".aborted.json")
        ):
            continue
        path = os.path.join(txn_dir, fn)
        try:
            record = fs.read_json(path)
            state = record.get("state")
            if state == "pending":
                age = time.time() - record.get("created_at", 0)
                if age <= grace_seconds:
                    continue  # possibly a live publisher pre-flip
                for m in record["members"]:
                    t = (tables or {}).get(m["root"]) or LaketteTable(m["root"])
                    try:
                        t.abort_staged(m["stage_id"])
                    except (OSError, FileNotFoundError):
                        pass  # already gone
                record["state"] = "aborted"
                record["abort_reason"] = "publisher died before the commit point"
                _finalize(fs, txn_dir, record)
                out.append(record)
            elif state in ("committed", "done"):
                # "done" in a LIVE file = crash between _finalize's copy
                # and remove — re-finalizing is the whole repair
                for m in record["members"]:
                    if m.get("published_version") is not None:
                        continue
                    t = (tables or {}).get(m["root"]) or LaketteTable(m["root"])
                    m["published_version"] = _publish_member(t, m)
                    fs.put_json(path, record)
                record["state"] = "done"
                _finalize(fs, txn_dir, record)
                out.append(record)
        except Exception as e:  # noqa: BLE001 — isolate per record
            # one poisoned record (persistent conflict, vanished stage)
            # must not starve the records after it of their roll-forward;
            # process everything, then raise the aggregate LOUDLY
            errors.append(f"{fn}: {type(e).__name__}: {e}")
    if errors:
        raise RuntimeError(
            f"recover_transactions: {len(errors)} record(s) could not be "
            f"settled (all others were processed): {'; '.join(errors)}"
        )
    return out
