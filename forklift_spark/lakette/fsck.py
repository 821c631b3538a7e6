"""Table integrity verification — the FSCK / `verify` maintenance surface
(Delta FSCK, Iceberg's verify/orphan tooling re-expressed on lakette).

`check_table` never repairs and never deletes: it REPORTS, so an operator
can decide (vacuum collects orphans; a missing referenced file means
restore-from-tag or upstream replay). Three cost tiers, pay only for what
you ask:

  metadata (always)  O(metadata): version chain, manifest refs, file-entry
                     invariants, counter sums, column-mapping coherence,
                     ref targets — driver-side JSON reads only.
  files=True         + one data-dir listing, set-compared against every
                     RETAINED version's references: missing referenced
                     files (corruption — a read of that version will fail)
                     and orphans (crash/CAS-loser debris — vacuum's job,
                     counted here, never deleted). Absolute-path
                     references (shallow clones) are existence-checked
                     individually.
  deep=True          + ONE distributed Spark job: per-file parquet row
                     counts (grouped by input file) compared to manifest
                     `rows` — catches truncated/swapped data files that
                     exist but lie. Requires `spark`.
"""

from __future__ import annotations

import os
from typing import Any

from .table import META_COL_NAMES, LaketteTable, _colmap, _specs


def check_table(
    table: LaketteTable,
    *,
    spark=None,
    files: bool = True,
    deep: bool = False,
) -> dict[str, Any]:
    """Returns {"ok": bool, "issues": [str...], "checked": {...}} — `ok`
    means zero issues; orphan files are reported in `checked` but are NOT
    issues (they are normal crash debris awaiting vacuum)."""
    issues: list[str] = []
    checked: dict[str, Any] = {}

    raw = table._raw_current()
    history = table.history()
    checked["versions"] = len(history)

    # --- version chain: parents link back through retained history
    by_v = {h["version"]: h for h in history}
    for h in history:
        p = h.get("parent_version")
        if p is not None and p not in by_v and p >= min(by_v):
            issues.append(f"v{h['version']}: parent v{p} missing from chain")

    # --- refs resolve to reachable versions
    for r in table.list_refs():
        if r["version"] not in by_v:
            issues.append(
                f"ref {r['name']!r} points at unreachable v{r['version']}"
            )

    # --- per-version structural checks on the CURRENT version
    meta = table.current_metadata()
    specs = set(_specs(meta))
    n_rows = n_files = n_delta = 0
    spec_files: dict[str, int] = {}
    seen_paths: set[str] = set()
    for f in meta["files"]:
        nb = int(f.get("nb"))
        if nb not in specs:
            issues.append(f"file {f['path']}: spec nb={nb} not in {sorted(specs)}")
        if not (0 <= int(f["bucket"]) < nb):
            issues.append(f"file {f['path']}: bucket {f['bucket']} out of range for nb={nb}")
        if f["path"] in seen_paths:
            issues.append(f"file {f['path']}: referenced twice in one version")
        seen_paths.add(f["path"])
        n_files += 1
        n_rows += int(f["rows"])
        n_delta += 1 if f.get("delta") else 0
        spec_files[str(nb)] = spec_files.get(str(nb), 0) + 1
    checked["files"] = n_files
    checked["rows"] = n_rows

    # --- maintained counters vs manifest truth
    for key, got in (
        ("total_files", n_files), ("total_rows", n_rows),
        ("total_delta_files", n_delta),
    ):
        if key in raw and int(raw[key]) != got:
            issues.append(f"counter {key}={raw[key]} but manifests sum to {got}")
    if "spec_files" in raw:
        declared = {k: v for k, v in raw["spec_files"].items() if v}
        if declared != spec_files:
            issues.append(f"spec_files counter {declared} != manifest truth {spec_files}")

    # --- column mapping coherence
    cm = _colmap(raw)
    user_fields = [
        f["name"] for f in raw["schema"]["fields"]
        if f["name"] not in META_COL_NAMES
    ]
    missing = [c for c in user_fields if c not in cm]
    if missing:
        issues.append(f"colmap missing logical columns {missing}")
    extra = [l for l in cm if l not in user_fields]
    if extra:
        issues.append(f"colmap maps non-schema logicals {extra}")
    phys = list(cm.values())
    if len(set(phys)) != len(phys):
        issues.append(f"colmap physical names collide: {sorted(phys)}")
    retired = set(raw.get("retired_cols") or [])
    clash = retired & set(phys)
    if clash:
        issues.append(f"retired physicals still live: {sorted(clash)}")

    # --- file-level: every retained version's references vs the data dir
    if files:
        on_disk = {
            os.path.join("data", fn)
            for fn in table.fs.listdir(table.data_dir)
            if fn.endswith(".parquet")
        } if table.fs.isdir(table.data_dir) else set()
        referenced: set[str] = set()
        for h in history:
            try:
                referenced.update(
                    f["path"] for f in table.metadata_at(h["version"])["files"]
                )
            except Exception as e:  # vacuumed mid-check: fine for old versions
                if h["version"] == raw["version"]:
                    issues.append(f"current version unreadable: {e}")
        for rec in table.list_staged():
            referenced.update(f["path"] for f in rec["new_files"])
        missing_files = sorted(
            p for p in referenced
            if (p not in on_disk if not os.path.isabs(p) else not table.fs.exists(p))
        )
        for p in missing_files:
            issues.append(f"referenced data file missing: {p}")
        checked["orphan_files"] = len(on_disk - referenced)
        checked["referenced_files"] = len(referenced)

    # --- deep: physical row counts vs manifest claims (one Spark job)
    if deep:
        if spark is None:
            raise ValueError("deep=True needs a SparkSession")
        from pyspark.sql import functions as F

        claim = {
            (f["path"] if os.path.isabs(f["path"])
             else os.path.join(table.root, f["path"])): int(f["rows"])
            for f in meta["files"]
        }
        existing = [p for p in claim if table.fs.exists(p)]
        checked["deep_files"] = len(existing)
        if existing:
            got = dict(
                spark.read.parquet(*existing)
                .groupBy(F.input_file_name().alias("f"))
                .count()
                .collect()
            )
            # input_file_name returns file:// URIs; normalize
            got = {k.removeprefix("file://"): v for k, v in got.items()}
            for p in existing:
                want, have = claim[p], int(got.get(p, 0))
                if want != have:
                    issues.append(
                        f"deep: {p} manifest claims {want} rows, file has {have}"
                    )

    return {"ok": not issues, "issues": issues, "checked": checked}
