"""CDC-engine harness entries (SURVEY.md §2.10) — the batch-expressible
faces of the engine. `scan_snapshot` runs the REAL pipeline (changelog ->
LWW dedupe -> copy-on-write merge -> lakette snapshot scan) over a change
log derived deterministically from the sf documents table.

`cdc_lww_batch` is the SQL-expressible core of the merge decision (argmax
per key, deletes drop the key) so the DuckDB oracle can check the exact
semantics the streaming engine applies.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import create_entity_table

from .queries import q, t


def _doc_changelog(spark, sf):
    """Deterministic changelog derived from documents: every doc is an
    insert; docs with doc_id % 3 == 0 get a later update (content + ' v2');
    docs with doc_id % 10 == 7 get a final delete."""
    d = t(spark, sf, "documents")
    base = d.select(
        F.lit("I").alias("op"),
        F.col("doc_id").alias("seq"),
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id"), F.lit(".txt")).alias("path"),
        F.md5("text").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    n = 10_000_000  # seq offset between waves (doc_id << n)
    updates = d.filter(F.col("doc_id") % 3 == 0).select(
        F.lit("U").alias("op"),
        (F.col("doc_id") + n).alias("seq"),
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id"), F.lit(".txt")).alias("path"),
        F.md5(F.concat(F.col("text"), F.lit(" v2"))).alias("commit"),
        F.col("lang"),
        F.concat(F.col("text"), F.lit(" v2")).alias("content"),
    )
    deletes = d.filter(F.col("doc_id") % 10 == 7).select(
        F.lit("D").alias("op"),
        (F.col("doc_id") + 2 * n).alias("seq"),
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id"), F.lit(".txt")).alias("path"),
        F.lit(None).cast("string").alias("commit"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("content"),
    )
    return base.unionByName(updates).unionByName(deletes)


#: the same final-state rule in pure SQL (for the DuckDB oracle):
#: last writer wins per key, delete removes the key
_CDC_LWW_SQL = """
WITH changelog AS (
  SELECT 'I' AS op, doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path, lang, text AS content
  FROM documents
  UNION ALL
  SELECT 'U', doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         lang, text || ' v2'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', doc_id + 20000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL, NULL
  FROM documents WHERE doc_id % 10 = 7
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
)
SELECT repo, path, seq, lang, sha256(content) AS content_sha
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


@q("cdc_lww_batch", _CDC_LWW_SQL)
def cdc_lww_batch(spark, sf):
    """The merge decision rule as one batch query — W5 argmax + delete drop,
    with the sha2(content,256) invariant in the output."""
    log = _doc_changelog(spark, sf)
    from forklift_spark.operators.merge import lww_dedupe

    final = lww_dedupe(log, ["repo", "path"], "seq").filter(F.col("op") != "D")
    return final.select(
        "repo", "path", "seq", "lang", F.sha2("content", 256).alias("content_sha")
    )


#: the diff the D+U epochs induce on the post-insert snapshot, in pure SQL
_CDC_CHANGES_SQL = """
WITH d AS (SELECT doc_id, source AS repo,
                  'docs/doc_' || doc_id || '.txt' AS path, text
           FROM documents)
SELECT 'update' AS change, repo, path,
       doc_id + 10000000 AS seq, sha256(text || ' v2') AS content_sha
FROM d WHERE doc_id % 3 = 0 AND doc_id % 10 <> 7
UNION ALL
SELECT 'delete' AS change, repo, path,
       doc_id + 20000000 AS seq, CAST(NULL AS VARCHAR) AS content_sha
FROM d WHERE doc_id % 10 = 7
"""


@q("cdc_changes", _CDC_CHANGES_SQL)
def cdc_changes(spark, sf):
    """CDC-out: replay the 3 epochs (I, U, D) through the real engine, then
    emit the row-level change set between the post-insert version and the
    final version via lakette time travel + snapshot_diff (one full-outer
    join over bucket-pruned reads)."""
    from forklift_spark.operators.changes import snapshot_diff

    root = os.path.join(tempfile.gettempdir(), f"fk_chg_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(root, n_buckets=8)
    log = _doc_changelog(spark, sf)
    versions = {}
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="chg",
            epoch=i,
        )
        versions[op] = table.current_metadata()["version"]
    return snapshot_diff(spark, table, versions["I"], versions["D"])


#: the metadata-table invariant an independent engine can check: after
#: replaying the whole changelog COW-style, the lake holds exactly one
#: physical row per key (winner or tombstone) — so the files_df row
#: counters must sum to the key count DuckDB derives from the raw data
_META_FILES_SQL = "SELECT count(*) AS total_rows FROM documents"


@q("meta_files", _META_FILES_SQL, extra=True)
def meta_files(spark, sf):
    """Metadata tables end-to-end (table.files_df): replay the 3 epochs,
    then aggregate the per-file row counters OF THE MANIFEST SHARDS
    (parsed by executors via spark.read.json — no driver file-list
    materialization) and check them against DuckDB's independent count of
    the keys the changelog must leave behind. Proves the manifest
    counters, the shard parsing, and the COW one-row-per-key invariant in
    one query."""
    from forklift_spark.streaming.ingest import create_entity_table as _cet

    root = os.path.join(tempfile.gettempdir(), f"fk_meta_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = _cet(root, n_buckets=8)
    log = _doc_changelog(spark, sf)
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="meta",
            epoch=i,
        )
    return table.files_df(spark).agg(F.sum("rows").alias("total_rows"))


@q("export_scan", _CDC_CHANGES_SQL, extra=True)
def export_scan(spark, sf):
    """CDC-out export sink end-to-end (operators/changes.py
    export_changes): replay the 3 epochs, export the I->D span as a
    marker-gated parquet drop, then READ THE EXPORTED FILES BACK — the
    external consumer's view must equal the same change-set oracle
    cdc_changes checks in-process. Data-first/marker-last makes the drop
    exactly-once by contract; per-span markers carry version range + row
    count (one Observation, zero extra jobs)."""
    from forklift_spark.operators.changes import (
        export_changes,
        read_exported_changes,
    )

    root = os.path.join(tempfile.gettempdir(), f"fk_exp_{os.path.basename(sf)}")
    out = os.path.join(root, "out")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(os.path.join(root, "t"), n_buckets=8)
    log = _doc_changelog(spark, sf)
    versions = {}
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="exp",
            epoch=i,
        )
        versions[op] = table.current_metadata()["version"]
    rep = export_changes(spark, table, out, from_version=versions["I"])
    assert rep["exported"], "export produced no spans"
    return read_exported_changes(spark, out).select(
        "change", "repo", "path", "seq", "content_sha"
    )


@q("scan_snapshot", _CDC_LWW_SQL)
def scan_snapshot(spark, sf):
    """End-to-end: replay the derived changelog through the REAL engine in
    three epochs (inserts, updates, deletes) into a lakette table, then
    snapshot-scan it. Must equal the pure-SQL LWW oracle exactly."""
    root = os.path.join(tempfile.gettempdir(), f"fk_snap_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(root, n_buckets=8)
    log = _doc_changelog(spark, sf)
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="harness",
            epoch=i,
        )
    snap = table.snapshot(spark)
    return snap.select("repo", "path", "seq", "lang", "content_sha")


@q(
    "scan_snapshot_pruned",
    "SELECT * FROM (" + _CDC_LWW_SQL + ") WHERE repo BETWEEN 'src0' AND 'src13'",
    extra=True,  # driver gate is capped at 50 queries; checked locally
)
def scan_snapshot_pruned(spark, sf):
    """File-level min/max range pruning (VERDICT r2 #7) through the REAL
    engine: replay into a lakette table whose target_file_rows makes the
    sorted COW writer roll multiple files per bucket (tight per-file repo
    ranges), then snapshot-scan a repo range — plan_files drops files whose
    [kmin, kmax] misses the range BEFORE spark.read, and the result must
    equal the oracle's WHERE-filtered LWW state exactly."""
    root = os.path.join(tempfile.gettempdir(), f"fk_prune_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(root, n_buckets=8, target_file_rows=64)
    log = _doc_changelog(spark, sf)
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="harness",
            epoch=i,
        )
    snap = table.snapshot(spark, key_range=("src0", "src13"))
    return snap.select("repo", "path", "seq", "lang", "content_sha")


@q(
    "scan_incremental",
    "SELECT * FROM (" + _CDC_LWW_SQL + ") WHERE seq >= 10000000",
    extra=True,  # driver gate is capped at 50 queries; checked locally
)
def scan_incremental(spark, sf):
    """Incremental/CDC reader path (VERDICT r3 #6) through the REAL
    engine: replay the 3 epochs, then snapshot(min_seq=W) — per-file
    max(seq) stats drop every file whose newest row predates the
    watermark BEFORE spark.read (asserted), and the result must equal the
    oracle's seq-filtered LWW state exactly (stale versions of keys whose
    winner predates W can never leak — the post-LWW row filter)."""
    root = os.path.join(tempfile.gettempdir(), f"fk_inc_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(root, n_buckets=8)
    log = _doc_changelog(spark, sf)
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="harness",
            epoch=i,
            mode="mor",  # deltas: each wave's files carry its seq range
        )
    watermark = 10_000_000  # everything after the insert wave
    pruned = table.plan_files(min_seq=watermark)
    assert len(pruned) < len(table.plan_files()), "smax pruning never engaged"
    snap = table.snapshot(spark, min_seq=watermark)
    return snap.select("repo", "path", "seq", "lang", "content_sha")


#: the LWW state right after the I+U epochs, before any delete landed —
#: what a wall-clock time travel to that instant must read
_ASOF_LWW_SQL = """
WITH changelog AS (
  SELECT doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path, lang, text AS content
  FROM documents
  UNION ALL
  SELECT doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         lang, text || ' v2'
  FROM documents WHERE doc_id % 3 = 0
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
)
SELECT repo, path, seq, lang, sha256(content) AS content_sha
FROM ranked WHERE rn = 1
"""


@q("scan_asof", _ASOF_LWW_SQL, extra=True)
def scan_asof(spark, sf):
    """Time travel by WALL CLOCK (table.snapshot(as_of=), the Iceberg
    `FOR TIMESTAMP AS OF` analogue): replay the 3 epochs capturing a
    timestamp between the update and delete waves, then read the table as
    of that instant — version_as_of resolves the stamp chain driver-side
    (zero manifest loads) and the result must equal the pure-SQL LWW
    state of the I+U events exactly (no delete visible)."""
    import time as _time

    root = os.path.join(tempfile.gettempdir(), f"fk_asof_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(root, n_buckets=8)
    log = _doc_changelog(spark, sf)
    t_mid = None
    for i, op in enumerate(["I", "U", "D"]):
        if op == "D":
            _time.sleep(0.02)
            t_mid = _time.time()
            _time.sleep(0.02)
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="harness",
            epoch=i,
        )
    snap = table.snapshot(spark, as_of=t_mid)
    return snap.select("repo", "path", "seq", "lang", "content_sha")


@q("manifest_scan", _CDC_LWW_SQL, extra=True)
def manifest_scan(spark, sf):
    """Engine-free interop export end-to-end (operators/interop.py): replay
    the 3 epochs, export the snapshot as a plain parquet manifest (the
    Delta symlink_format_manifest analogue — files.txt + a ready-to-run
    DuckDB view.sql, marker-last), then read it back through read_manifest,
    which plans from files.txt alone (no lakette metadata layer). The
    external reader's view must equal the same LWW oracle scan_snapshot
    checks — proving any parquet-capable engine can consume the table."""
    from forklift_spark.operators.interop import export_manifest, read_manifest

    root = os.path.join(tempfile.gettempdir(), f"fk_mfst_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(os.path.join(root, "t"), n_buckets=8)
    log = _doc_changelog(spark, sf)
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="harness",
            epoch=i,
        )
    out = os.path.join(root, "drop")
    export_manifest(table, out)
    ext = read_manifest(spark, out)
    return ext.select("repo", "path", "seq", "lang", "content_sha")


@q("replicate_scan", _CDC_LWW_SQL, extra=True)
def replicate_scan(spark, sf):
    """Lake-to-lake replication end-to-end: replay the derived changelog
    into table A through the real engine (3 epochs), replicate A -> B via
    the committed-version change feed (initial sync after the insert epoch,
    then one incremental span covering the update+delete epochs), and scan
    the REPLICA. Must equal the pure-SQL LWW oracle exactly — the replica
    is bit-for-bit the source's final state."""
    from forklift_spark.operators.replicate import replicate

    base = os.path.basename(sf)
    src_root = os.path.join(tempfile.gettempdir(), f"fk_repl_src_{base}")
    dst_root = os.path.join(tempfile.gettempdir(), f"fk_repl_dst_{base}")
    shutil.rmtree(src_root, ignore_errors=True)
    shutil.rmtree(dst_root, ignore_errors=True)
    table = create_entity_table(src_root, n_buckets=8)
    log = _doc_changelog(spark, sf)
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="repl_src",
            epoch=i,
        )
        if op == "I":  # initial sync from the post-insert snapshot
            replicate(spark, table, dst_root, replication_id="mirror")
    replicate(spark, table, dst_root, replication_id="mirror")  # U+D span
    from forklift_spark.lakette import LaketteTable

    snap = LaketteTable(dst_root).snapshot(spark)
    return snap.select("repo", "path", "seq", "lang", "content_sha")


#: derived table = filter(lang <> 'de') . map(content -> upper, + n_chars)
#: of the LWW final state — the bronze -> silver invariant in pure SQL
_DERIVE_SQL = """
WITH changelog AS (
  SELECT 'I' AS op, doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path, lang, text AS content
  FROM documents
  UNION ALL
  SELECT 'U', doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         lang, text || ' v2'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', doc_id + 20000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL, NULL
  FROM documents WHERE doc_id % 10 = 7
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
)
SELECT repo, path, seq, lang, CAST(length(content) AS BIGINT) AS n_chars,
       sha256(upper(content)) AS content_sha
FROM ranked WHERE rn = 1 AND op <> 'D' AND lang <> 'de'
"""


@q("derive_scan", _DERIVE_SQL, extra=True)
def derive_scan(spark, sf):
    """Incremental derived table end-to-end (VERDICT r4 #1): replay the
    insert epoch into a source lakette table, derive bronze -> silver
    (initial sync) with a mapping spec (upper(content) + n_chars) and a
    predicate (lang <> 'de'), then land the update+delete epochs in the
    source and derive AGAIN — one incremental span through changefeed
    diff -> transform -> exactly-once merge. The derived snapshot must
    equal filter.map of the source's final LWW state in pure SQL,
    content_sha computed over the MAPPED content."""
    from forklift_spark.operators.derive import derive

    base = os.path.basename(sf)
    src_root = os.path.join(tempfile.gettempdir(), f"fk_der_src_{base}")
    dst_root = os.path.join(tempfile.gettempdir(), f"fk_der_dst_{base}")
    shutil.rmtree(src_root, ignore_errors=True)
    shutil.rmtree(dst_root, ignore_errors=True)
    table = create_entity_table(src_root, n_buckets=8)
    log = _doc_changelog(spark, sf)
    mapping = {"lang": "lang", "n_chars": "CAST(length(content) AS LONG)",
               "content": "upper(content)"}
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="der_src",
            epoch=i,
        )
        if op == "I":  # initial sync from the post-insert snapshot
            derive(spark, table, dst_root, mapping,
                   predicate="lang <> 'de'", derive_id="silver")
    derive(spark, table, dst_root, mapping,
           predicate="lang <> 'de'", derive_id="silver")  # U+D span
    from forklift_spark.lakette import LaketteTable

    snap = LaketteTable(dst_root).snapshot(spark)
    return snap.select("repo", "path", "seq", "lang", "n_chars", "content_sha")


@q("scan_snapshot_rescaled", _CDC_LWW_SQL, extra=True)
def scan_snapshot_rescaled(spark, sf):
    """Online bucket rescale mid-replay: insert epoch at 4 buckets, ONE
    metadata-only rescale to 16, update epoch merge-on-read (LWW resolves
    across the mixed-spec window), delete epoch copy-on-write (migrates its
    touched key groups), incremental compaction finishes the migration —
    and the final scan must STILL equal the pure-SQL LWW oracle exactly."""
    from forklift_spark.operators.merge import compact, select_compaction_candidates

    root = os.path.join(tempfile.gettempdir(), f"fk_resc_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(root, n_buckets=4)
    log = _doc_changelog(spark, sf)
    for i, (op, mode) in enumerate([("I", "cow"), ("U", "mor"), ("D", "cow")]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="resc",
            epoch=i,
            mode=mode,
        )
        if op == "I":
            table.rescale(16)
    compact(spark, table, buckets=select_compaction_candidates(table, max_delta_files=0))
    compact(spark, table)  # drain the remainder; spec chain collapses
    assert table.migration_status()["migrated"], "rescale migration incomplete"
    snap = table.snapshot(spark)
    return snap.select("repo", "path", "seq", "lang", "content_sha")


#: gold table = group-by (repo, lang) aggregation of the LWW final state
#: under predicate lang <> 'de' — the silver -> gold invariant in pure SQL.
#: CASTs pin DuckDB's count/sum types to Spark's (both BIGINT here).
_DERIVE_AGG_SQL = """
WITH changelog AS (
  SELECT 'I' AS op, doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path, lang, text AS content
  FROM documents
  UNION ALL
  SELECT 'U', doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         lang, text || ' v2'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', doc_id + 20000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL, NULL
  FROM documents WHERE doc_id % 10 = 7
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
),
final AS (
  SELECT repo, lang, content FROM ranked WHERE rn = 1 AND op <> 'D'
)
SELECT repo, lang,
       CAST(count(content) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(length(content)), 0) AS BIGINT) AS total_chars,
       CAST(count(*) AS BIGINT) AS n_rows
FROM final WHERE lang <> 'de'
GROUP BY repo, lang
"""


@q("derive_agg_scan", _DERIVE_AGG_SQL, extra=True)
def derive_agg_scan(spark, sf):
    """Incremental AGGREGATE derived table end-to-end (the silver -> gold
    operator, operators/derive_agg.py): replay the insert epoch into a
    source lakette table, derive_agg the gold rollup (initial sync:
    group by repo+lang, count/sum aggregates, predicate lang <> 'de'),
    then land the update+delete epochs and derive_agg AGAIN — one
    incremental span through the RETRACTION feed (delta strategy: only
    span rows + touched gold buckets are read, never the source table).
    The gold snapshot must equal the grouped aggregation of the source's
    final LWW state in pure SQL."""
    from forklift_spark.lakette import LaketteTable
    from forklift_spark.operators.derive_agg import derive_agg

    base = os.path.basename(sf)
    src_root = os.path.join(tempfile.gettempdir(), f"fk_dagg_src_{base}")
    dst_root = os.path.join(tempfile.gettempdir(), f"fk_dagg_dst_{base}")
    shutil.rmtree(src_root, ignore_errors=True)
    shutil.rmtree(dst_root, ignore_errors=True)
    table = create_entity_table(src_root, n_buckets=8)
    log = _doc_changelog(spark, sf)
    groups = {"repo": "repo", "lang": "lang"}
    aggs = {"n_docs": "count(content)",
            "total_chars": "sum(length(content))"}
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="dagg_src",
            epoch=i,
        )
        if op == "I":  # initial sync from the post-insert snapshot
            r = derive_agg(spark, table, dst_root, groups, aggs,
                           predicate="lang <> 'de'", derive_id="gold")
            assert r.initial_sync and r.strategy == "delta"
    r = derive_agg(spark, table, dst_root, groups, aggs,
                   predicate="lang <> 'de'", derive_id="gold")  # U+D span
    assert not r.initial_sync and not r.resync, "span chain should be intact"
    snap = LaketteTable(dst_root).snapshot(spark)
    return snap.select("repo", "lang", "n_docs", "total_chars", "n_rows")


def _patch_changelog(spark, sf):
    """Deterministic PARTIAL-UPDATE changelog derived from documents
    (operators/patch.py semantics): wave 0 inserts every doc; later waves
    patch single columns, delete a stripe, and resurrect part of it via a
    patch above the tombstone; one wave is deliberately LATE (its seq sits
    between two earlier waves) so per-column drops are exercised."""
    d = t(spark, sf, "documents")
    key = F.concat(F.lit("docs/doc_"), F.col("doc_id"), F.lit(".txt"))
    n = 10_000_000

    def wave(wave_no, op, pred, seq_off, commit, lang, content):
        return d.filter(pred).select(
            F.lit(wave_no).alias("wave"),
            F.lit(op).alias("op"),
            (F.col("doc_id") + seq_off).alias("seq"),
            F.col("source").alias("repo"),
            key.alias("path"),
            commit.alias("commit"),
            lang.alias("lang"),
            content.alias("content"),
        )

    s = F.lit(None).cast("string")
    log = wave(0, "I", F.lit(True), 0, F.md5("text"), F.col("lang"), F.col("text"))
    log = log.unionByName(wave(  # patch content only
        1, "P", F.col("doc_id") % 3 == 0, n, s, s,
        F.concat(F.col("text"), F.lit(" patched")),
    ))
    log = log.unionByName(wave(  # LATE lang patch (seq below wave 2's)
        1, "P", F.col("doc_id") % 6 == 2, n // 2, s, F.lit("late"), s,
    ))
    log = log.unionByName(wave(  # patch lang only
        2, "P", F.col("doc_id") % 4 == 1, 2 * n, s, F.lit("xx"), s,
    ))
    log = log.unionByName(wave(3, "D", F.col("doc_id") % 10 == 7, 3 * n, s, s, s))
    log = log.unionByName(wave(  # patch ABOVE the tombstone: resurrect
        4, "P", F.col("doc_id") % 20 == 7, 4 * n, s, s,
        F.concat(F.lit("resurrected "), F.col("doc_id")),
    ))
    return log


#: the same per-column LWW rule in pure SQL: for each payload column, the
#: winner is the max-seq event that WROTE it (I/U/D write every column, D
#: writes NULL, P writes its non-NULL columns); presence is row-level LWW
_CDC_PATCH_SQL = """
WITH changelog AS (
  SELECT 'I' AS op, doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path, lang, text AS content
  FROM documents
  UNION ALL
  SELECT 'P', doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL, text || ' patched'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'P', doc_id + 5000000, source, 'docs/doc_' || doc_id || '.txt',
         'late', NULL
  FROM documents WHERE doc_id % 6 = 2
  UNION ALL
  SELECT 'P', doc_id + 20000000, source, 'docs/doc_' || doc_id || '.txt',
         'xx', NULL
  FROM documents WHERE doc_id % 4 = 1
  UNION ALL
  SELECT 'D', doc_id + 30000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL, NULL
  FROM documents WHERE doc_id % 10 = 7
  UNION ALL
  SELECT 'P', doc_id + 40000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL, 'resurrected ' || doc_id
  FROM documents WHERE doc_id % 20 = 7
),
pres AS (
  SELECT repo, path, seq, op,
         row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
),
lang_w AS (
  SELECT repo, path, CASE WHEN op = 'D' THEN NULL ELSE lang END AS v,
         row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog WHERE op IN ('I', 'U', 'D') OR lang IS NOT NULL
),
content_w AS (
  SELECT repo, path, CASE WHEN op = 'D' THEN NULL ELSE content END AS v,
         row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog WHERE op IN ('I', 'U', 'D') OR content IS NOT NULL
)
SELECT p.repo, p.path, p.seq, l.v AS lang, sha256(c.v) AS content_sha
FROM pres p
LEFT JOIN lang_w l ON l.repo = p.repo AND l.path = p.path AND l.rn = 1
LEFT JOIN content_w c ON c.repo = p.repo AND c.path = p.path AND c.rn = 1
WHERE p.rn = 1 AND p.op <> 'D'
"""


@q("cdc_patch_batch", _CDC_PATCH_SQL, extra=True)
def cdc_patch_batch(spark, sf):
    """Partial-update CDC end-to-end (operators/patch.py): replay the
    patch changelog through the REAL engine — a column_lww lakette table,
    one merge epoch per wave so the per-column writer seqs (col_seqs) do
    the cross-batch work — then snapshot-scan. Must equal the pure-SQL
    per-column LWW oracle exactly, content verified by sha."""
    root = os.path.join(tempfile.gettempdir(), f"fk_patch_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(root, n_buckets=8, column_lww=True)
    log = _patch_changelog(spark, sf)
    for w in range(5):
        merge_into(
            spark,
            table,
            log.filter(F.col("wave") == w).drop("wave")
            .withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="patch",
            epoch=w,
        )
    snap = table.snapshot(spark)
    return snap.select("repo", "path", "seq", "lang", "content_sha")


#: DML oracle: the LWW final state, then DELETE WHERE lang='de' and
#: UPDATE SET content = content || ' [dml]' WHERE lang='fr' applied in SQL
_DML_SQL = """
WITH changelog AS (
  SELECT 'I' AS op, doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path, lang, text AS content
  FROM documents
  UNION ALL
  SELECT 'U', doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         lang, text || ' v2'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', doc_id + 20000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL, NULL
  FROM documents WHERE doc_id % 10 = 7
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
),
final AS (
  SELECT repo, path, seq, lang, content
  FROM ranked WHERE rn = 1 AND op <> 'D'
)
SELECT repo, path, seq, lang,
       CASE WHEN lang = 'fr' THEN sha256(content || ' [dml]')
            ELSE sha256(content) END AS content_sha
FROM final
WHERE lang IS DISTINCT FROM 'de'
"""


@q("dml_delete_update", _DML_SQL, extra=True)
def dml_delete_update(spark, sf):
    """Predicate DML through the REAL engine (operators/dml.py): replay the
    changelog into a lakette table, then DELETE WHERE lang='de' (tombstone
    rewrite of only the touched buckets) and UPDATE content WHERE lang='fr'
    (old-row SET + content_sha recompute), then snapshot-scan. Must equal
    the pure-SQL oracle applying the same two statements to the LWW final
    state."""
    from forklift_spark.operators.dml import delete_where, update_where

    root = os.path.join(tempfile.gettempdir(), f"fk_dml_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(root, n_buckets=8)
    log = _doc_changelog(spark, sf)
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="dml",
            epoch=i,
        )
    delete_where(spark, table, "lang = 'de'")
    update_where(spark, table, {"content": "content || ' [dml]'"}, "lang = 'fr'")
    return table.snapshot(spark).select("repo", "path", "seq", "lang", "content_sha")


#: reverse lookup by commit digest: the LWW final state filtered to one
#: commit value, computed the same way on both engines (md5 of doc 41's
#: text — doc 41 is neither updated (41 % 3 != 0) nor deleted (41 % 10 != 7))
_BLOOM_LOOKUP_SQL = """
WITH changelog AS (
  SELECT 'I' AS op, doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path,
         md5(text) AS commit, lang, text AS content
  FROM documents
  UNION ALL
  SELECT 'U', doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         md5(text || ' v2'), lang, text || ' v2'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', doc_id + 20000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL, NULL, NULL
  FROM documents WHERE doc_id % 10 = 7
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
)
SELECT repo, path, seq, commit, lang
FROM ranked
WHERE rn = 1 AND op <> 'D'
  AND commit = (SELECT md5(text) FROM documents WHERE doc_id = 41)
"""


@q("scan_snapshot_bloom", _BLOOM_LOOKUP_SQL, extra=True)
def scan_snapshot_bloom(spark, sf):
    """Bloom-pruned reverse lookup (lakette/bloom.py, VERDICT r4 'what a
    100 TB operator hits first'): replay the changelog into a table with
    bloom_cols=["commit"] and small target files, then snapshot(col_eq=)
    a single commit digest — the driver prunes files whose stored bloom
    proves the value absent BEFORE spark.read, and the row filter makes
    the result exact. Must equal the oracle's filtered LWW final state."""
    from forklift_spark.lakette.table import LaketteTable
    from forklift_spark.streaming.ingest import ENTITY_SCHEMA, KEY_COLS

    root = os.path.join(tempfile.gettempdir(), f"fk_bloom_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = LaketteTable.create(
        root, ENTITY_SCHEMA, KEY_COLS, n_buckets=8,
        target_file_rows=64, bloom_cols=["commit"],
    )
    log = _doc_changelog(spark, sf)
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="bloom",
            epoch=i,
        )
    target = (
        t(spark, sf, "documents")
        .filter(F.col("doc_id") == 41)
        .select(F.md5("text").alias("c"))
        .collect()[0]
        .c
    )
    # planning guard, not just semantics: the bloom must actually prune
    meta = table.current_metadata()
    kept = table._bloom_prune(meta["files"], {"commit": target})
    assert len(kept) < len(meta["files"]), "bloom pruned nothing"
    snap = table.snapshot(spark, col_eq={"commit": target})
    return snap.select("repo", "path", "seq", "commit", "lang")


#: final LWW state restricted to a lang range — what a clustered layout
#: answers while scanning only the files whose cstats cover the range
_CLUSTERED_SCAN_SQL = """
WITH changelog AS (
  SELECT 'I' AS op, doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path,
         md5(text) AS commit, lang, text AS content
  FROM documents
  UNION ALL
  SELECT 'U', doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         md5(text || ' v2'), lang, text || ' v2'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', doc_id + 20000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL, NULL, NULL
  FROM documents WHERE doc_id % 10 = 7
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
)
SELECT repo, path, seq, commit, lang
FROM ranked
WHERE rn = 1 AND op <> 'D' AND lang BETWEEN 'de' AND 'es'
"""


@q("scan_clustered", _CLUSTERED_SCAN_SQL, extra=True)
def scan_clustered(spark, sf):
    """Clustered-layout range scan (compact(cluster_by=), the Iceberg
    sort-order analogue): replay the changelog into a table declared
    cluster_by=["lang"] with small target files, compact (which sorts each
    bucket's files by lang so their per-file cstats become tight), then
    snapshot(col_ranges=) a lang range — the planner prunes files whose
    recorded [min,max] misses the range BEFORE spark.read, and the row
    filter makes the result exact. A key-sorted layout records the same
    cstats but every file spans the whole lang domain, pruning nothing —
    the prune-effectiveness assert below is the point of the layout."""
    from forklift_spark.lakette.table import LaketteTable
    from forklift_spark.operators.merge import compact
    from forklift_spark.streaming.ingest import ENTITY_SCHEMA, KEY_COLS

    root = os.path.join(tempfile.gettempdir(), f"fk_clus_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = LaketteTable.create(
        root, ENTITY_SCHEMA, KEY_COLS, n_buckets=8,
        target_file_rows=64, cluster_by=["lang"],
    )
    log = _doc_changelog(spark, sf)
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="clus",
            epoch=i,
        )
    compact(spark, table)  # applies the declared cluster order
    lo, hi = "de", "es"
    meta = table.current_metadata()
    survivors = [
        f for f in meta["files"]
        if not (
            (rng := (f.get("cstats") or {}).get("lang")) is not None
            and rng[0] is not None and (rng[1] < lo or rng[0] > hi)
        )
    ]
    # planning guard, not just semantics: the layout must actually prune
    assert len(survivors) < len(meta["files"]), "clustering pruned nothing"
    snap = table.snapshot(spark, col_ranges={"lang": (lo, hi)})
    return snap.select("repo", "path", "seq", "commit", "lang")


#: final LWW state restricted in TWO dimensions — the scan shape a
#: Z-ordered layout serves with tight per-file ranges on BOTH columns
_ZORDER_SCAN_SQL = """
WITH changelog AS (
  SELECT 'I' AS op, doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path,
         md5(text) AS commit, lang, text AS content
  FROM documents
  UNION ALL
  SELECT 'U', doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         md5(text || ' v2'), lang, text || ' v2'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', doc_id + 20000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL, NULL, NULL
  FROM documents WHERE doc_id % 10 = 7
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
)
SELECT repo, path, seq, commit, lang
FROM ranked
WHERE rn = 1 AND op <> 'D'
  AND lang BETWEEN 'es' AND 'fr' AND commit BETWEEN '0' AND '8'
"""


@q("scan_zorder", _ZORDER_SCAN_SQL, extra=True)
def scan_zorder(spark, sf):
    """Z-ordered layout, two-dimension range scan (compact
    cluster_mode="zorder", merge._zorder_expr): the Morton interleave of
    per-bucket ranks gives every file a small hyper-rectangle of the
    (lang, commit) space, so col_ranges pruning bites on BOTH dimensions —
    a lexicographic layout serves only its first column. The prune assert
    is sf-gated: tight two-dimension ranges need enough files per bucket
    to split the curve (>=16 here); the lang (coarse-bit) dimension must
    prune at any sf. Exactness never depends on pruning (row filter)."""
    from forklift_spark.lakette.table import LaketteTable
    from forklift_spark.operators.merge import compact
    from forklift_spark.streaming.ingest import ENTITY_SCHEMA, KEY_COLS

    root = os.path.join(tempfile.gettempdir(), f"fk_zo_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = LaketteTable.create(
        root, ENTITY_SCHEMA, KEY_COLS, n_buckets=2, target_file_rows=8,
        cluster_by=["lang", "commit"], cluster_mode="zorder",
    )
    log = _doc_changelog(spark, sf)
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="zo",
            epoch=i,
        )
    compact(spark, table)
    ranges = {"lang": ("es", "fr"), "commit": ("0", "8")}
    meta = table.current_metadata()

    def survivors(col):
        lo, hi = ranges[col]
        return [
            f for f in meta["files"]
            if not (
                (rng := (f.get("cstats") or {}).get(col)) is not None
                and rng[0] is not None and (rng[1] < lo or rng[0] > hi)
            )
        ]

    n = len(meta["files"])
    assert len(survivors("lang")) < n, "zorder pruned nothing on dim 1"
    if n >= 32:  # enough files to split the curve in both dimensions
        assert len(survivors("commit")) < n, "zorder pruned nothing on dim 2"
    snap = table.snapshot(spark, col_ranges=ranges)
    return snap.select("repo", "path", "seq", "commit", "lang")


@q("catalog_scan", _CDC_LWW_SQL, extra=True)
def catalog_scan(spark, sf):
    """Catalog end-to-end (lakette/catalog.py): split the changelog by key
    hash into TWO catalog tables, land every epoch as ONE transactional
    catalog.publish (stage both halves -> publish_transaction -> a single
    catalog CAS makes the pair visible together), then read the pair back
    through catalog.sql_views at one catalog version and union them with
    spark.sql. Split+union is an identity over the key-hash partition, so
    the result must equal the one-table LWW oracle exactly — proving
    registration, transactional publish, consistent version resolution,
    and the SQL view surface in one query."""
    from forklift_spark.lakette.catalog import Catalog

    root = os.path.join(tempfile.gettempdir(), f"fk_cat_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog.create(os.path.join(root, "cat"))
    tabs = {}
    for half in (0, 1):
        tabs[half] = create_entity_table(
            os.path.join(root, f"t{half}"), n_buckets=4
        )
        cat.register(f"half{half}", tabs[half].root)
    log = _doc_changelog(spark, sf)
    # split on the KEY columns so per-table LWW == global LWW per subset
    split = F.crc32(F.concat_ws("\x00", "repo", "path")) % 2
    for i, op in enumerate(["I", "U", "D"]):
        ep = log.filter(F.col("op") == op).withColumn(
            "event_ts", F.lit(None).cast("timestamp")
        )
        members = []
        for half in (0, 1):
            st = merge_into(
                spark, tabs[half], ep.filter(split == half),
                query_id="cat", epoch=i, publish=False,
            )
            members.append((f"half{half}", st.stage_id))
        cat.publish(members)
    cat.sql_views(spark, prefix="cat_")
    return spark.sql(
        "SELECT repo, path, seq, lang, content_sha FROM cat_half0 "
        "UNION ALL "
        "SELECT repo, path, seq, lang, content_sha FROM cat_half1"
    )


#: final join state in pure SQL: LWW winners left-joined with the final
#: dimension state (langs < 'm' were updated to family 'f1' mid-stream)
_DERIVE_JOIN_SQL = """
WITH changelog AS (
  SELECT 'I' AS op, doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path, lang, text AS content
  FROM documents
  UNION ALL
  SELECT 'U', doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         lang, text || ' v2'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', doc_id + 20000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL, NULL
  FROM documents WHERE doc_id % 10 = 7
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
),
final AS (
  SELECT repo, path, seq, lang FROM ranked WHERE rn = 1 AND op <> 'D'
),
dim AS (
  SELECT DISTINCT lang,
         CASE WHEN lang < 'm' THEN 'f1' ELSE 'f0' END AS family
  FROM documents
)
SELECT f.repo, f.path, f.seq, f.lang, d.family
FROM final f LEFT JOIN dim d ON f.lang = d.lang
"""


@q("derive_join_scan", _DERIVE_JOIN_SQL, extra=True)
def derive_join_scan(spark, sf):
    """Incremental join maintenance end-to-end (operators/derive_join.py):
    replay the 3 changelog epochs into a FACT table with a per-lang
    DIMENSION table updated mid-stream, refreshing the derived join after
    EVERY source epoch — fact-driven spans, a dim-driven reverse-lookup
    refresh, and a combined refresh all land incrementally (asserted: no
    resync ever fires), and the final destination must equal the one-shot
    SQL join of both sources' final states exactly."""
    from pyspark.sql import types as T

    from forklift_spark.lakette.table import LaketteTable
    from forklift_spark.operators.derive_join import derive_join

    root = os.path.join(tempfile.gettempdir(), f"fk_dj_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    fact = create_entity_table(os.path.join(root, "fact"), n_buckets=8)
    dim = LaketteTable.create(
        os.path.join(root, "dim"),
        T.StructType([
            T.StructField("dlang", T.StringType()),
            T.StructField("family", T.StringType()),
        ]),
        ["dlang"], n_buckets=2,
    )
    log = _doc_changelog(spark, sf)
    langs = log.filter(F.col("op") == "I").select("lang").distinct()
    merge_into(
        spark, dim,
        langs.select(F.lit("I").alias("op"), F.col("lang").alias("dlang"),
                     F.lit("f0").alias("family"), F.lit(1).alias("seq").cast("long")),
        query_id="dim", epoch=0,
    )
    on = {"lang": "dlang"}
    mapping = {"lang": "lang", "family": "dim_family"}
    dst_root = os.path.join(root, "dst")

    def refresh():
        r = derive_join(spark, fact, dim, dst_root, on, mapping)
        assert not r.resync, "refresh must stay incremental"
        return r

    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark, fact,
            log.filter(F.col("op") == op).withColumn(
                "event_ts", F.lit(None).cast("timestamp")
            ),
            query_id="dj", epoch=i,
        )
        refresh()
        if i == 0:
            # mid-stream dimension update -> dim-driven reverse lookup
            merge_into(
                spark, dim,
                langs.filter(F.col("lang") < "m").select(
                    F.lit("U").alias("op"), F.col("lang").alias("dlang"),
                    F.lit("f1").alias("family"),
                    F.lit(2).alias("seq").cast("long"),
                ),
                query_id="dim", epoch=1,
            )
            r = refresh()
            assert r.dim_refresh_path in ("pruned", "scan")
    dst = LaketteTable(dst_root)
    return dst.snapshot(spark).select("repo", "path", "seq", "lang", "family")


#: the LWW oracle with the renamed output column: physical data written
#: before AND after the rename must resolve to the same final state
_RENAMED_SQL = """
WITH changelog AS (
  SELECT 'I' AS op, doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path, lang, text AS content
  FROM documents
  UNION ALL
  SELECT 'U', doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         lang, text || ' v2'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', doc_id + 20000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL, NULL
  FROM documents WHERE doc_id % 10 = 7
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
)
SELECT repo, path, seq, lang AS language, sha256(content) AS content_sha
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


@q("scan_renamed", _RENAMED_SQL, extra=True)
def scan_renamed(spark, sf):
    """Column mapping end-to-end (lakette rename_column): replay the I
    epoch, RENAME lang -> language (metadata-only — zero data files
    touched), then replay the U and D epochs under the new name. The final
    snapshot mixes files written before and after the rename (both store
    the stable physical name) and must equal the plain LWW oracle with the
    column served under its new logical name."""
    root = os.path.join(tempfile.gettempdir(), f"fk_ren_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(root, n_buckets=8)
    log = _doc_changelog(spark, sf)
    merge_into(
        spark, table,
        log.filter(F.col("op") == "I").withColumn("event_ts", F.lit(None).cast("timestamp")),
        query_id="ren", epoch=0,
    )
    table.rename_column("lang", "language")
    for i, op in enumerate(["U", "D"], start=1):
        merge_into(
            spark, table,
            log.filter(F.col("op") == op)
               .withColumnRenamed("lang", "language")
               .withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="ren", epoch=i,
        )
    return table.snapshot(spark).select(
        "repo", "path", "seq", "language", "content_sha"
    )


@q("clone_scan", _CDC_LWW_SQL, extra=True)
def clone_scan(spark, sf):
    """Shallow clone end-to-end (LaketteTable.shallow_clone): replay the I
    epoch into the SOURCE, zero-copy clone it, then replay U and D into
    the CLONE only. The clone's final state must equal the full LWW oracle
    (its scan mixes source-owned files it references by absolute path with
    its own COW rewrites), while the source is left at the insert-only
    state — divergence without interference."""
    root = os.path.join(tempfile.gettempdir(), f"fk_clone_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    src = create_entity_table(os.path.join(root, "src"), n_buckets=8)
    log = _doc_changelog(spark, sf)
    merge_into(
        spark, src,
        log.filter(F.col("op") == "I").withColumn("event_ts", F.lit(None).cast("timestamp")),
        query_id="clone", epoch=0,
    )
    dst, _pin = src.shallow_clone(os.path.join(root, "dst"))
    for i, op in enumerate(["U", "D"], start=1):
        merge_into(
            spark, dst,
            log.filter(F.col("op") == op).withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="clone", epoch=i,
        )
    return dst.snapshot(spark).select("repo", "path", "seq", "lang", "content_sha")


#: SQL front-end oracle: LWW final state, then the three statements the
#: frontend compiles — DELETE WHERE lang='de', UPDATE content WHERE
#: lang='fr', and a MERGE upserting a staged set (doc_id % 7 == 0) whose
#: minted seq outranks every prior event, so staged rows win even over
#: the DML'd/deleted state
_SQLFRONT_SQL = """
WITH changelog AS (
  SELECT 'I' AS op, doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path, lang, text AS content
  FROM documents
  UNION ALL
  SELECT 'U', doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         lang, text || ' v2'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', doc_id + 20000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL, NULL
  FROM documents WHERE doc_id % 10 = 7
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
),
final AS (
  SELECT repo, path, lang, content FROM ranked WHERE rn = 1 AND op <> 'D'
),
after_dml AS (
  SELECT repo, path, lang,
         CASE WHEN lang = 'fr' THEN content || ' [sql]' ELSE content END AS content
  FROM final WHERE lang IS DISTINCT FROM 'de'
),
staged AS (
  SELECT source AS repo, 'docs/doc_' || doc_id || '.txt' AS path,
         'xx' AS lang, 'merged ' || doc_id AS content
  FROM documents WHERE doc_id % 7 = 0
)
SELECT a.repo, a.path, a.lang, sha256(a.content) AS content_sha
FROM after_dml a LEFT JOIN staged s ON s.repo = a.repo AND s.path = a.path
WHERE s.repo IS NULL
UNION ALL
SELECT repo, path, lang, sha256(content) AS content_sha FROM staged
"""


@q("sql_statements", _SQLFRONT_SQL, extra=True)
def sql_statements(spark, sf):
    """SQL statement front-end end-to-end (forklift_spark/sqlfront.py):
    replay the changelog into a lakette table, then drive the engine ONLY
    through SQL text — DELETE, UPDATE, a conditional-free MERGE upserting
    a staged subquery (minted seq outranks all prior events), and a final
    SELECT over the registered snapshot. Every statement compiles onto
    the tested operators (dml.py, merge_into), so this query proves the
    statement grammar maps onto the same semantics the pure-SQL oracle
    computes."""
    from forklift_spark.sqlfront import SqlFrontend

    root = os.path.join(tempfile.gettempdir(), f"fk_sqlfe_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(root, n_buckets=8)
    log = _doc_changelog(spark, sf)
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark, table,
            log.filter(F.col("op") == op)
            .withColumn("event_ts", F.lit(None).cast("timestamp")),
            query_id="sqlfe", epoch=i,
        )
    fe = SqlFrontend(spark, {"repos": table})
    fe.sql("DELETE FROM repos WHERE lang = 'de'")
    fe.sql("UPDATE repos SET content = content || ' [sql]' WHERE lang = 'fr'")
    t(spark, sf, "documents").createOrReplaceTempView("docs_src")
    fe.sql(
        "MERGE INTO repos t USING ("
        "  SELECT source AS repo, 'docs/doc_' || doc_id || '.txt' AS path,"
        "         'xx' AS lang, 'merged ' || doc_id AS content"
        "  FROM docs_src WHERE doc_id % 7 = 0"
        ") s ON t.repo = s.repo AND t.path = s.path "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    return fe.sql("SELECT repo, path, lang, content_sha FROM repos")


#: full MERGE clause-matrix oracle (insert-only base, so the final state
#: is a pure CASE over documents): matched de-rows deleted, other matched
#: rows get content || ' +note' keeping their stored lang, never-matched
#: fr-rows flagged by the BY SOURCE branch, and a disjoint new-key set
#: arrives via INSERT (cols) VALUES
_SQL_MERGE_FULL_SQL = """
SELECT source AS repo, 'docs/doc_' || doc_id || '.txt' AS path,
       CASE WHEN doc_id % 5 <> 0 AND lang = 'fr' THEN 'fr-x' ELSE lang END AS lang,
       sha256(CASE WHEN doc_id % 5 = 0 THEN text || ' +n' || doc_id
                   ELSE text END) AS content_sha
FROM documents
WHERE NOT (doc_id % 5 = 0 AND lang = 'de')
UNION ALL
SELECT source, 'docs/new_' || doc_id, 'xx', sha256('ins n' || doc_id)
FROM documents WHERE doc_id % 11 = 3
"""


@q("sql_merge_full", _SQL_MERGE_FULL_SQL, extra=True)
def sql_merge_full(spark, sf):
    """The FULL Delta MERGE clause matrix through one SQL statement
    (forklift_spark/sqlfront.py): conditional DELETE with a target-alias
    condition, column-level UPDATE SET keeping unassigned stored columns,
    INSERT (cols) VALUES (exprs) for never-seen keys, and WHEN NOT MATCHED
    BY SOURCE flagging target rows absent from the source. Base table is
    the insert-only changelog so the DuckDB oracle is a pure CASE over
    documents; content_sha must stay engine-derived through every action."""
    from forklift_spark.sqlfront import SqlFrontend

    root = os.path.join(tempfile.gettempdir(), f"fk_sqlmg_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(root, n_buckets=8)
    log = _doc_changelog(spark, sf)
    merge_into(
        spark, table,
        log.filter(F.col("op") == "I").withColumn("event_ts", F.lit(None).cast("timestamp")),
        query_id="sqlmg", epoch=0,
    )
    fe = SqlFrontend(spark, {"repos": table})
    t(spark, sf, "documents").createOrReplaceTempView("docs_src")
    fe.sql(
        "MERGE INTO repos t USING ("
        "  SELECT source AS repo, 'docs/doc_' || doc_id || '.txt' AS path,"
        "         'n' || doc_id AS note"
        "  FROM docs_src WHERE doc_id % 5 = 0"
        "  UNION ALL"
        "  SELECT source, 'docs/new_' || doc_id, 'n' || doc_id"
        "  FROM docs_src WHERE doc_id % 11 = 3"
        ") s ON t.repo = s.repo AND t.path = s.path "
        "WHEN MATCHED AND t.lang = 'de' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET content = t.content || ' +' || s.note "
        "WHEN NOT MATCHED THEN INSERT (repo, path, lang, content) "
        "  VALUES (s.repo, s.path, 'xx', 'ins ' || s.note) "
        "WHEN NOT MATCHED BY SOURCE AND t.lang = 'fr' THEN UPDATE SET lang = 'fr-x'"
    )
    return fe.sql("SELECT repo, path, lang, content_sha FROM repos")


#: dedup-silver oracle: the normalized exact-dedup GROUP BY applied to
#: the changelog's final LWW state — fp is the sha256 of the identical
#: three-step normalization both engines replay byte-identically
#: (q_textdata.py's dedup_exact_norm proved the twins agree)
_DERIVE_DEDUP_SQL = """
WITH changelog AS (
  SELECT 'I' AS op, doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path,
         CASE WHEN doc_id % 5 = 0 THEN upper(text) || '!!'
              ELSE text END AS content
  FROM documents
  UNION ALL
  SELECT 'U', doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         text || ' v2'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', doc_id + 20000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL
  FROM documents WHERE doc_id % 10 = 7
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
),
final AS (
  SELECT repo, path, content FROM ranked WHERE rn = 1 AND op <> 'D'
)
SELECT sha256(trim(regexp_replace(regexp_replace(lower(coalesce(content, '')),
                                                 '[0-9]', '0', 'g'),
                                  '[^a-z0-9]+', ' ', 'g'))) AS fp,
       min(repo || '|' || path) AS survivor,
       count(*) AS n_rows
FROM final GROUP BY 1
"""


@q("derive_dedup_scan", _DERIVE_DEDUP_SQL, extra=True)
def derive_dedup_scan(spark, sf):
    """Incrementally-maintained dedup silver (operators/derive_dedup.py):
    replay the insert epoch (every doc_id % 5 == 0 planted as a CASE/punct
    variant of itself so normalization has real work), initial-sync the
    dedup gold, then land the update+delete epochs and derive AGAIN — one
    incremental span through the groups strategy (the span identifies
    affected fp groups; only those are recomputed, including survivor
    re-promotion where a delete removed the min member). The gold snapshot
    must equal the normalized GROUP BY of the final LWW state in pure
    SQL."""
    from forklift_spark.lakette import LaketteTable
    from forklift_spark.operators.derive_dedup import derive_dedup

    base = os.path.basename(sf)
    src_root = os.path.join(tempfile.gettempdir(), f"fk_ddup_src_{base}")
    dst_root = os.path.join(tempfile.gettempdir(), f"fk_ddup_dst_{base}")
    shutil.rmtree(src_root, ignore_errors=True)
    shutil.rmtree(dst_root, ignore_errors=True)
    table = create_entity_table(src_root, n_buckets=8)
    d = t(spark, sf, "documents")
    inserts = d.select(
        F.lit("I").alias("op"),
        F.col("doc_id").cast("long").alias("seq"),
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id"), F.lit(".txt")).alias("path"),
        F.lit(None).cast("string").alias("commit"),
        F.col("lang"),
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.upper("text"), F.lit("!!")))
        .otherwise(F.col("text")).alias("content"),
        F.lit(None).cast("timestamp").alias("event_ts"),
        F.lit(1).alias("schema_ver"),
    )
    updates = d.filter(F.col("doc_id") % 3 == 0).select(
        F.lit("U").alias("op"),
        (F.col("doc_id") + 10000000).cast("long").alias("seq"),
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id"), F.lit(".txt")).alias("path"),
        F.lit(None).cast("string").alias("commit"),
        F.col("lang"),
        F.concat(F.col("text"), F.lit(" v2")).alias("content"),
        F.lit(None).cast("timestamp").alias("event_ts"),
        F.lit(1).alias("schema_ver"),
    )
    deletes = d.filter(F.col("doc_id") % 10 == 7).select(
        F.lit("D").alias("op"),
        (F.col("doc_id") + 20000000).cast("long").alias("seq"),
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id"), F.lit(".txt")).alias("path"),
        F.lit(None).cast("string").alias("commit"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("content"),
        F.lit(None).cast("timestamp").alias("event_ts"),
        F.lit(1).alias("schema_ver"),
    )
    merge_into(spark, table, inserts, query_id="ddup", epoch=0)
    r = derive_dedup(spark, table, dst_root)
    assert r.initial_sync and r.strategy == "groups"
    merge_into(spark, table, updates, query_id="ddup", epoch=1)
    merge_into(spark, table, deletes, query_id="ddup", epoch=2)
    r = derive_dedup(spark, table, dst_root)
    assert not r.initial_sync and not r.resync, "span chain should be intact"
    return LaketteTable(dst_root).snapshot(spark).select("fp", "survivor", "n_rows")


#: similarity-index oracle: the EXACT-normalized-duplicate pairs of the
#: changelog's final LWW state. Identical normalized text => identical
#: MinHash signatures => collision in every LSH band => candidate with
#: est_jaccard == 1.0, and the exact-verify join makes the output
#: deterministic, so the probabilistic index admits a full oracle on
#: this subset (near-miss recall stays a measured number in
#: tests/test_simindex.py and BENCH/DEDUPE_STRATEGY.md).
_SIMINDEX_SQL = """
WITH changelog AS (
  SELECT 'I' AS op, doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path, text AS content
  FROM documents
  UNION ALL
  SELECT 'I', doc_id + 5000000, source, 'twin/doc_' || doc_id || '.txt',
         upper(text) || '!!'
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT 'U', doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         text || ' v2'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', doc_id + 20000000, source, 'docs/doc_' || doc_id || '.txt', NULL
  FROM documents WHERE doc_id % 10 = 7
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
),
norm AS (
  SELECT repo, path,
         trim(regexp_replace(regexp_replace(lower(coalesce(content, '')),
                                            '[0-9]', '0', 'g'),
                             '[^a-z0-9]+', ' ', 'g')) AS nt
  FROM ranked WHERE rn = 1 AND op <> 'D'
)
SELECT a.repo AS repo_a, a.path AS path_a, b.repo AS repo_b, b.path AS path_b
FROM norm a JOIN norm b
  ON a.nt = b.nt
 AND (a.repo || chr(31) || a.path) < (b.repo || chr(31) || b.path)
"""


@q("simindex_pairs", _SIMINDEX_SQL, extra=True)
def simindex_pairs(spark, sf):
    """Incremental similarity index end-to-end (operators/simindex.py):
    replay inserts (every doc_id % 5 == 0 planted with a case/punct twin
    under twin/), initial-sync the signature silver, land update+delete
    epochs, derive AGAIN (one incremental span — only changed rows are
    re-signed), then LSH-query the index at threshold 1.0 and exact-verify
    candidates against the normalized content. Must equal the pure-SQL
    normalized-duplicate self-join of the final LWW state."""
    from forklift_spark.lakette import LaketteTable
    from forklift_spark.operators.simindex import derive_simindex, near_dup_pairs
    from forklift_spark.operators.text import normalize_expr

    base = os.path.basename(sf)
    src_root = os.path.join(tempfile.gettempdir(), f"fk_simx_src_{base}")
    dst_root = os.path.join(tempfile.gettempdir(), f"fk_simx_dst_{base}")
    shutil.rmtree(src_root, ignore_errors=True)
    shutil.rmtree(dst_root, ignore_errors=True)
    table = create_entity_table(src_root, n_buckets=8)
    d = t(spark, sf, "documents")

    def _env(df):
        return df.select(
            "op", F.col("seq").cast("long").alias("seq"), "repo", "path",
            F.lit(None).cast("string").alias("commit"),
            F.lit(None).cast("string").alias("lang"),
            "content",
            F.lit(None).cast("timestamp").alias("event_ts"),
            F.lit(1).alias("schema_ver"),
        )

    inserts = _env(d.select(
        F.lit("I").alias("op"), F.col("doc_id").alias("seq"),
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id"), F.lit(".txt")).alias("path"),
        F.col("text").alias("content"),
    ).unionByName(d.filter(F.col("doc_id") % 5 == 0).select(
        F.lit("I").alias("op"), (F.col("doc_id") + 5000000).alias("seq"),
        F.col("source").alias("repo"),
        F.concat(F.lit("twin/doc_"), F.col("doc_id"), F.lit(".txt")).alias("path"),
        F.concat(F.upper("text"), F.lit("!!")).alias("content"),
    )))
    updates = _env(d.filter(F.col("doc_id") % 3 == 0).select(
        F.lit("U").alias("op"), (F.col("doc_id") + 10000000).alias("seq"),
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id"), F.lit(".txt")).alias("path"),
        F.concat(F.col("text"), F.lit(" v2")).alias("content"),
    ))
    deletes = _env(d.filter(F.col("doc_id") % 10 == 7).select(
        F.lit("D").alias("op"), (F.col("doc_id") + 20000000).alias("seq"),
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id"), F.lit(".txt")).alias("path"),
        F.lit(None).cast("string").alias("content"),
    ))
    merge_into(spark, table, inserts, query_id="simx", epoch=0)
    r = derive_simindex(spark, table, dst_root)
    assert r.initial_sync
    merge_into(spark, table, updates, query_id="simx", epoch=1)
    merge_into(spark, table, deletes, query_id="simx", epoch=2)
    r = derive_simindex(spark, table, dst_root)
    assert not r.initial_sync and not r.resync, "span chain should be intact"

    cand = near_dup_pairs(spark, LaketteTable(dst_root), bands=8, threshold=1.0)
    nt = table.snapshot(spark).select(
        "repo", "path", normalize_expr(F.col("content")).alias("nt")
    )
    nta = nt.select(F.col("repo").alias("repo_a"), F.col("path").alias("path_a"),
                    F.col("nt").alias("nt_a"))
    ntb = nt.select(F.col("repo").alias("repo_b"), F.col("path").alias("path_b"),
                    F.col("nt").alias("nt_b"))
    return (
        cand.join(nta, ["repo_a", "path_a"]).join(ntb, ["repo_b", "path_b"])
        .filter(F.col("nt_a") == F.col("nt_b"))
        .select("repo_a", "path_a", "repo_b", "path_b")
    )


#: table-lifecycle oracle: the CTAS filter applied directly to documents —
#: everything upstream (CREATE, two COPY INTO batches, the idempotent
#: re-COPY, DROP) must be state-neutral noise to the final relation
_SQL_LIFECYCLE_SQL = """
SELECT doc_id, lang, source, sha256(text) AS content_sha
FROM documents
WHERE lang IN ('en', 'de') AND n_chars > 200
"""


@q("sql_lifecycle", _SQL_LIFECYCLE_SQL, extra=True)
def sql_lifecycle(spark, sf):
    """The full SQL table lifecycle in one query
    (forklift_spark/sqlfront.py): CREATE TABLE with Spark-DDL types and
    PRIMARY KEY, two COPY INTO batches (parquet landing files split by
    doc_id parity), a deliberate re-COPY that must load ZERO files
    (per-file exactly-once markers), CTAS deriving a filtered table, and
    DROP of the staging table. The DuckDB oracle sees none of the
    lifecycle — only the final CTAS relation — so any statement leaking
    state (double-loaded file, lost batch, CTAS drift) breaks parity."""
    from forklift_spark.sqlfront import SqlFrontend

    base = os.path.join(tempfile.gettempdir(), f"fk_sqlddl_{os.path.basename(sf)}")
    shutil.rmtree(base, ignore_errors=True)
    landing = os.path.join(base, "landing")
    d = t(spark, sf, "documents")
    d.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(f"{landing}/even")
    d.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(f"{landing}/odd")

    fe = SqlFrontend(spark, {})
    fe.sql(
        "CREATE TABLE docs (doc_id BIGINT, text STRING, lang STRING, "
        "source STRING, n_chars BIGINT, PRIMARY KEY (doc_id)) "
        f"LOCATION '{base}/docs' TBLPROPERTIES ('n_buckets' = '8')"
    )
    fe.sql(f"COPY INTO docs FROM '{landing}/even' FILEFORMAT = PARQUET")
    fe.sql(f"COPY INTO docs FROM '{landing}/odd' FILEFORMAT = PARQUET")
    re_copy = fe.sql(
        f"COPY INTO docs FROM '{landing}/even' FILEFORMAT = PARQUET"
    ).collect()[0]
    if re_copy.files_loaded != "0":  # pragma: no cover - exactness guard
        raise AssertionError(f"re-COPY loaded {re_copy.files_loaded} files")
    fe.sql(
        "CREATE TABLE quality PRIMARY KEY (doc_id) "
        f"LOCATION '{base}/quality' AS "
        "SELECT doc_id, lang, source, text FROM docs "
        "WHERE lang IN ('en', 'de') AND n_chars > 200"
    )
    fe.sql("DROP TABLE docs")
    return fe.sql(
        "SELECT doc_id, lang, source, sha2(text, 256) AS content_sha FROM quality"
    )


#: INSERT OVERWRITE oracle: the replacement set IS the final relation —
#: the pre-overwrite changelog state must vanish (tombstoned keys) and
#: every surviving row is exactly the SELECT's output
_SQL_OVERWRITE_SQL = """
SELECT source AS repo, 'docs/doc_' || doc_id || '.txt' AS path,
       lang, sha256('ow ' || doc_id) AS content_sha
FROM documents
WHERE doc_id % 4 = 1
"""


@q("sql_overwrite", _SQL_OVERWRITE_SQL, extra=True)
def sql_overwrite(spark, sf):
    """INSERT OVERWRITE end-to-end (forklift_spark/sqlfront.py): replay
    the insert-only changelog, then atomically replace the table with a
    quarter-sized SELECT in ONE commit — upserts for surviving keys,
    tombstones for the rest. The oracle sees only the replacement set, so
    a leaked pre-overwrite row or a lost replacement row breaks parity."""
    from forklift_spark.sqlfront import SqlFrontend

    root = os.path.join(tempfile.gettempdir(), f"fk_sqlow_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = create_entity_table(root, n_buckets=8)
    log = _doc_changelog(spark, sf)
    merge_into(
        spark, table,
        log.filter(F.col("op") == "I")
        .withColumn("event_ts", F.lit(None).cast("timestamp")),
        query_id="sqlow", epoch=0,
    )
    fe = SqlFrontend(spark, {"repos": table})
    t(spark, sf, "documents").createOrReplaceTempView("docs_src")
    fe.sql(
        "INSERT OVERWRITE repos "
        "SELECT source AS repo, 'docs/doc_' || doc_id || '.txt' AS path, "
        "lang, 'ow ' || doc_id AS content "
        "FROM docs_src WHERE doc_id % 4 = 1"
    )
    return fe.sql("SELECT repo, path, lang, content_sha FROM repos")


#: two-table transaction oracle: disjoint halves of documents land in two
#: tables inside ONE BEGIN..COMMIT; the result is their union — if the
#: publish tore (one member visible, one lost), the union breaks parity
_SQL_TXN_SQL = """
SELECT source AS repo, 'docs/doc_' || doc_id || '.txt' AS path,
       CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS side,
       sha256(text) AS content_sha
FROM documents
"""


@q("sql_txn", _SQL_TXN_SQL, extra=True)
def sql_txn(spark, sf):
    """Multi-table SQL transaction end-to-end (forklift_spark/sqlfront.py
    BEGIN/COMMIT over lakette/txn.py): two INSERTs into two empty tables
    staged inside one transaction, published atomically, then read back
    as one union. Mid-transaction both SELECTs must still see zero rows
    (no dirty reads) — asserted inline before COMMIT."""
    from forklift_spark.sqlfront import SqlFrontend

    base = os.path.join(tempfile.gettempdir(), f"fk_sqltx_{os.path.basename(sf)}")
    shutil.rmtree(base, ignore_errors=True)
    even = create_entity_table(os.path.join(base, "even"), n_buckets=4)
    odd = create_entity_table(os.path.join(base, "odd"), n_buckets=4)
    fe = SqlFrontend(spark, {"t_even": even, "t_odd": odd})
    t(spark, sf, "documents").createOrReplaceTempView("docs_src")
    fe.sql("BEGIN")
    fe.sql(
        "INSERT INTO t_even SELECT source AS repo, "
        "'docs/doc_' || doc_id || '.txt' AS path, text AS content "
        "FROM docs_src WHERE doc_id % 2 = 0"
    )
    fe.sql(
        "INSERT INTO t_odd SELECT source AS repo, "
        "'docs/doc_' || doc_id || '.txt' AS path, text AS content "
        "FROM docs_src WHERE doc_id % 2 = 1"
    )
    staged_counts = (
        fe.sql("SELECT count(*) AS n FROM t_even").collect()[0].n,
        fe.sql("SELECT count(*) AS n FROM t_odd").collect()[0].n,
    )
    if staged_counts != (0, 0):  # pragma: no cover - isolation guard
        raise AssertionError(f"dirty read mid-transaction: {staged_counts}")
    fe.sql("COMMIT")
    return fe.sql(
        "SELECT repo, path, 'even' AS side, content_sha FROM t_even "
        "UNION ALL "
        "SELECT repo, path, 'odd' AS side, content_sha FROM t_odd"
    )


#: silver (map+filter mview) rows annotated with their gold (agg mview)
#: group — one result hashing BOTH derived tables of the SQL medallion
_SQL_MVIEW_SQL = """
WITH changelog AS (
  SELECT 'I' AS op, doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path, lang, text AS content
  FROM documents
  UNION ALL
  SELECT 'U', doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         lang, text || ' v2'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', doc_id + 20000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL, NULL
  FROM documents WHERE doc_id % 10 = 7
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
),
silver AS (
  SELECT repo, path, seq, lang, CAST(length(content) AS BIGINT) AS n_chars,
         sha256(upper(content)) AS content_sha
  FROM ranked WHERE rn = 1 AND op <> 'D' AND lang <> 'de'
),
gold AS (
  SELECT lang, count(*) AS lang_n, CAST(sum(n_chars) AS BIGINT) AS lang_sz
  FROM silver GROUP BY lang
)
SELECT s.repo, s.path, s.seq, s.lang, s.n_chars, s.content_sha,
       g.lang_n, g.lang_sz
FROM silver s JOIN gold g ON s.lang = g.lang
"""


@q("sql_mview", _SQL_MVIEW_SQL, extra=True)
def sql_mview(spark, sf):
    """SQL materialized-view medallion end-to-end (forklift_spark/
    sqlmview.py): CREATE MATERIALIZED VIEW silver (projection + WHERE ->
    derive) over the post-insert bronze, CREATE MATERIALIZED VIEW gold
    (GROUP BY -> derive_agg) CHAINED over silver, then land the update +
    delete epochs in bronze and REFRESH both — two incremental
    maintenance passes through changefeed spans, exactly-once. The result
    joins every silver row to its gold group, so one value-hash witnesses
    BOTH derived tables against the pure-SQL recompute."""
    from forklift_spark.sqlfront import SqlFrontend

    base = os.path.join(tempfile.gettempdir(), f"fk_mv_{os.path.basename(sf)}")
    shutil.rmtree(base, ignore_errors=True)
    table = create_entity_table(os.path.join(base, "bronze"), n_buckets=8)
    log = _doc_changelog(spark, sf)
    fe = SqlFrontend(spark, {"repos": table})

    def _epoch(i, op):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn(
                "event_ts", F.lit(None).cast("timestamp")
            ),
            query_id="mv_src",
            epoch=i,
        )

    _epoch(0, "I")
    fe.sql(
        f"CREATE MATERIALIZED VIEW silver LOCATION '{base}/silver' AS "
        "SELECT repo, path, lang, CAST(length(content) AS LONG) AS n_chars, "
        "upper(content) AS content FROM repos WHERE lang <> 'de'"
    )
    fe.sql(
        f"CREATE MATERIALIZED VIEW gold LOCATION '{base}/gold' AS "
        "SELECT lang, count(*) AS lang_n, sum(n_chars) AS lang_sz "
        "FROM silver GROUP BY lang"
    )
    _epoch(1, "U")
    _epoch(2, "D")
    fe.sql("REFRESH MATERIALIZED VIEW silver")
    fe.sql("REFRESH MATERIALIZED VIEW gold")
    return fe.sql(
        "SELECT s.repo, s.path, s.seq, s.lang, s.n_chars, s.content_sha, "
        "g.lang_n, g.lang_sz "
        "FROM silver s JOIN gold g ON s.lang = g.lang"
    )


#: record-level secondary index postings after the full I/U/D replay, in
#: pure SQL: the index must hold exactly one (term, repo, path) posting
#: per LIVE final-state row with term = its commit (md5 of the winning
#: content) — updates MOVED their term (old posting retracted), deletes
#: dropped theirs. The range restriction exercises the lookup face.
_IDX_SQL = """
WITH changelog AS (
  SELECT 'I' AS op, doc_id AS seq, source AS repo,
         'docs/doc_' || doc_id || '.txt' AS path, md5(text) AS commit
  FROM documents
  UNION ALL
  SELECT 'U', doc_id + 10000000, source, 'docs/doc_' || doc_id || '.txt',
         md5(text || ' v2')
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', doc_id + 20000000, source, 'docs/doc_' || doc_id || '.txt',
         NULL
  FROM documents WHERE doc_id % 10 = 7
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM changelog
)
SELECT commit AS term, repo, path
FROM ranked WHERE rn = 1 AND op <> 'D' AND commit >= '0' AND commit <= '3z'
"""


@q("idx_lookup", _IDX_SQL, extra=True)
def idx_lookup(spark, sf):
    """Record-level secondary index end-to-end (operators/derive_index.py):
    replay the insert epoch, build the index on `commit` (initial sync),
    land the update + delete epochs and derive AGAIN — one incremental
    span in which updates MOVE their term (the old posting must be
    retracted, the key-changing case derive() refuses) and deletes drop
    theirs. The returned range lookup runs through index_lookup's
    kmin/kmax file pruning; the postings must equal the pure-SQL LWW
    final state's (commit, repo, path) rows in the range."""
    from forklift_spark.lakette.table import LaketteTable
    from forklift_spark.operators.derive_index import derive_index, index_lookup

    base = os.path.basename(sf)
    src_root = os.path.join(tempfile.gettempdir(), f"fk_idx_src_{base}")
    idx_root = os.path.join(tempfile.gettempdir(), f"fk_idx_idx_{base}")
    shutil.rmtree(src_root, ignore_errors=True)
    shutil.rmtree(idx_root, ignore_errors=True)
    table = create_entity_table(src_root, n_buckets=8)
    log = _doc_changelog(spark, sf)
    for i, op in enumerate(["I", "U", "D"]):
        merge_into(
            spark,
            table,
            log.filter(F.col("op") == op).withColumn(
                "event_ts", F.lit(None).cast("timestamp")
            ),
            query_id="idx_src",
            epoch=i,
        )
        if op == "I":  # initial sync from the post-insert snapshot
            derive_index(spark, table, idx_root, "commit", derive_id="by_commit")
    derive_index(spark, table, idx_root, "commit", derive_id="by_commit")
    return index_lookup(spark, LaketteTable(idx_root), "0", hi="3z")


# ---------------------------------------------------------------------------
# S6 wire formats: Debezium envelope ingestion (round 5)
# ---------------------------------------------------------------------------

_DBZ_LWW_SQL = """
SELECT user_id, event_type, value
FROM (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) x
WHERE rn = 1 AND event_type <> 'error'
"""


@q("cdc_debezium", _DBZ_LWW_SQL, extra=True)
def cdc_debezium(spark, sf):
    """End-to-end Debezium wire-format ingestion: encode the events table
    as Debezium {before, after, op, source.lsn} JSON (errors become 'd'
    deletes carrying only `before`, everything else 'u' upserts), parse it
    back through sources.debezium.debezium_to_batch (lsn -> seq), merge
    into a fresh lakette table keyed on user_id, snapshot-scan. The DuckDB
    oracle computes the same final state as a plain argmax-by-event_id
    LWW with error-deletes dropped — so the adapter's envelope handling,
    seq derivation, and tombstone semantics are all checked against an
    independent SQL formulation, not the adapter's own code."""
    from pyspark.sql import types as T

    from forklift_spark.lakette.table import LaketteTable
    from forklift_spark.sources.debezium import debezium_to_batch

    ev = t(spark, sf, "events")
    payload = F.struct(F.col("user_id"), F.col("event_type"), F.col("value"))
    src = F.struct(F.col("event_id").alias("lsn"))
    upserts = ev.filter(F.col("event_type") != "error").select(
        F.to_json(
            F.struct(payload.alias("after"), F.lit("u").alias("op"), src.alias("source"))
        ).alias("value")
    )
    deletes = ev.filter(F.col("event_type") == "error").select(
        F.to_json(
            F.struct(payload.alias("before"), F.lit("d").alias("op"), src.alias("source"))
        ).alias("value")
    )
    feed = upserts.unionByName(deletes)

    payload_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    batch, dead = debezium_to_batch(feed, "value", payload_schema=payload_schema)

    root = os.path.join(tempfile.gettempdir(), f"fk_dbz_{os.path.basename(sf)}")
    shutil.rmtree(root, ignore_errors=True)
    table = LaketteTable.create(
        root,
        T.StructType(
            [
                T.StructField("user_id", T.LongType(), False),
                T.StructField("event_type", T.StringType(), True),
                T.StructField("value", T.DoubleType(), True),
            ]
        ),
        ["user_id"],
        n_buckets=8,
    )
    merge_into(spark, table, batch, query_id="dbz", epoch=0)
    return table.snapshot(spark).select("user_id", "event_type", "value")
