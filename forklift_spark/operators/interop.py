"""Engine-free interop export: publish a lakette snapshot as a plain file
manifest any parquet-capable engine can read directly (SURVEY.md §2 —
r5 interop surface; the Delta `symlink_format_manifest` / Iceberg
metadata-table analogue for external readers).

`export_manifest` writes, for one pinned table version, a directory an
EXTERNAL system (DuckDB, Trino, another team without this engine) consumes
with zero lakette code:

    files.txt        absolute parquet paths, one per line
    manifest.json    version, snapshot_id, schema, column mapping, counters
    view.sql         a ready-to-run DuckDB CREATE VIEW implementing the
                     snapshot semantics (physical->logical column aliasing,
                     tombstone filter, union_by_name across schema
                     evolution) over read_parquet(files)
    _MANIFEST.json   commit marker, written LAST — a manifest directory is
                     valid iff the marker exists (data-first/marker-last,
                     the same exactly-once-by-contract rule as
                     operators/changes.py export_changes)

Correctness contract: only COPY-ON-WRITE state is exportable. Merge-on-read
delta files require the engine's LWW resolve at read time — an external
read_parquet over them would surface stale key versions — so the export
REFUSES while any delta file is live (compact() first), exactly like Delta
manifest generation refuses deletion vectors. Tombstone rows (confluent
deletes) DO live in COW files; the generated view filters them
(`NOT coalesce(deleted, false)`), and `read_manifest` applies the identical
filter on the Spark side.

Scale posture: export is driver-side metadata only — O(files) path strings,
zero data movement, zero Spark jobs; the data files are shared in place
(the manifest is a REFERENCE, so vacuum retention must outlive external
readers, same contract as any time-travel handle — pin a ref for
durability).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lakette.table import LaketteTable, _colmap

#: engine columns an external reader must never see as payload
_HIDDEN = ("deleted", "col_seqs")


def _resolve_version(table: LaketteTable, version, ref, as_of) -> int:
    n_addr = sum(x is not None for x in (version, ref, as_of))
    if n_addr > 1:
        raise ValueError("pass at most one of version=, ref=, as_of=")
    if ref is not None:
        return table.ref_version(ref)
    if as_of is not None:
        return table.version_as_of(as_of)
    if version is not None:
        return int(version)
    return int(table.current_metadata()["version"])


def _q(ident: str) -> str:
    """Double-quote a SQL identifier (DuckDB/ANSI)."""
    return '"' + ident.replace('"', '""') + '"'


def export_manifest(
    table: LaketteTable,
    out_dir: str,
    *,
    version: int | None = None,
    ref: str | None = None,
    as_of=None,
    view_name: str = "snapshot",
) -> dict:
    """Export one pinned snapshot as an engine-free parquet manifest.

    Returns the manifest dict (also persisted as manifest.json). Re-export
    to the same directory overwrites wholesale, marker last — a reader
    observing the marker always sees a complete, internally-consistent
    drop. Raises on merge-on-read deltas (compact() first) and on an
    unresolvable version (vacuumed / unknown ref / pre-stamp as_of)."""
    v = _resolve_version(table, version, ref, as_of)
    meta = table.metadata_at(v)
    files = table.plan_files(metadata=meta)
    legacy_default = bool(meta.get("requires_dedup", False))
    dirty = [f for f in files if f.get("delta", legacy_default)]
    if dirty:
        raise ValueError(
            f"version {v} holds {len(dirty)} merge-on-read delta file(s): "
            "external readers cannot resolve LWW — run compact() and "
            "export the compacted version"
        )
    schema = T.StructType.fromJson(meta["schema"])
    cmap = _colmap(meta)  # logical -> physical
    paths = sorted(os.path.abspath(os.path.join(table.root, f["path"])) for f in files)

    exposed = [f.name for f in schema.fields if f.name not in _HIDDEN]
    select_list = ",\n       ".join(
        f"{_q(cmap.get(c, c))} AS {_q(c)}" if cmap.get(c, c) != c else _q(c)
        for c in exposed
    )
    file_array = ", ".join("'" + p.replace("'", "''") + "'" for p in paths)
    if paths:
        view_sql = (
            f"CREATE OR REPLACE VIEW {_q(view_name)} AS\n"
            f"SELECT {select_list}\n"
            f"FROM read_parquet([{file_array}], union_by_name=true)\n"
            f"WHERE NOT coalesce(\"deleted\", false);\n"
        )
    else:
        # empty snapshot: a syntactically valid zero-row view with the right
        # column NAMES (types are engine-mapped on first data export)
        null_list = ",\n       ".join(f"NULL AS {_q(c)}" for c in exposed)
        view_sql = (
            f"CREATE OR REPLACE VIEW {_q(view_name)} AS\n"
            f"SELECT {null_list}\nWHERE false;\n"
        )

    manifest = {
        "format": "lakette-manifest/1",
        "table_root": os.path.abspath(table.root),
        "version": v,
        "snapshot_id": meta["snapshot_id"],
        "n_files": len(paths),
        "total_rows": sum(int(f.get("rows", 0)) for f in files),
        "schema": meta["schema"],
        "colmap": cmap,
        "hidden_cols": list(_HIDDEN),
        "key_cols": list(meta["key_cols"]),
        "view_name": view_name,
        "exported_at": time.time(),
    }

    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_MANIFEST.json")
    if os.path.exists(marker):
        os.remove(marker)  # invalidate FIRST: rewrite is atomic-by-marker
    with open(os.path.join(out_dir, "files.txt"), "w") as f:
        f.write("\n".join(paths) + ("\n" if paths else ""))
    with open(os.path.join(out_dir, "view.sql"), "w") as f:
        f.write(view_sql)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": v, "n_files": len(paths),
                   "exported_at": manifest["exported_at"]}, f)
    os.replace(tmp, marker)  # marker LAST, atomically
    return manifest


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read an exported manifest back WITHOUT the engine's metadata layer —
    the Spark-side proof of the external-reader contract: plan directly
    from files.txt, merge schemas across evolution, alias physical->logical
    from the recorded column mapping, surface typed NULLs for columns no
    exported file carries yet, filter tombstones. Must equal
    table.snapshot(version=manifest.version) exactly."""
    marker = os.path.join(out_dir, "_MANIFEST.json")
    if not os.path.exists(marker):
        raise ValueError(
            f"{out_dir} has no _MANIFEST.json marker — the export is "
            "incomplete or was invalidated mid-rewrite; not readable"
        )
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    schema = T.StructType.fromJson(manifest["schema"])
    cmap = manifest["colmap"]
    with open(os.path.join(out_dir, "files.txt")) as f:
        paths = [ln.strip() for ln in f if ln.strip()]

    exposed = [fld for fld in schema.fields if fld.name not in _HIDDEN]
    if not paths:
        return spark.createDataFrame([], T.StructType(exposed))
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    cols = []
    for fld in exposed:
        phys = cmap.get(fld.name, fld.name)
        if phys in df.columns:
            cols.append(F.col(phys).alias(fld.name))
        else:
            # schema-evolved column no exported file carries yet
            cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
    out = df.filter(~F.coalesce(F.col("deleted"), F.lit(False)))
    return out.select(*cols)
