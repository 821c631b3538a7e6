"""Deterministic pruning evidence for the clustered/Z-ordered layouts
(SURVEY §2 'clustered compaction'): build the SAME table under three
compaction layouts — key sort, linear cluster, Z-order — and count the
files a col_ranges scan must read under each. File counts are a property
of the layout and the data, not the machine: unlike wall-clock numbers
they cannot be polluted by VM steal, so this is the honest benchmark for
a planning-level optimization. Writes BENCH/CLUSTERING.md.

Usage: python scripts/bench_clustering.py [sf_dir] [out_md]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from forklift_spark.operators.merge import compact, merge_into  # noqa: E402
from forklift_spark.session import get_spark  # noqa: E402
from forklift_spark.streaming.ingest import create_entity_table  # noqa: E402

SCANS = {
    # one-dimension: the declared first cluster column
    "lang point (lang='fr')": {"lang": ("fr", "fr")},
    # one-dimension on the SECOND cluster column — linear's blind spot
    "commit quarter (sha in [0,4))": {"commit": ("0", "4")},
    # two-dimension with a LOW-selectivity first dim (en is ~43% of rows):
    # the first column alone cannot prune much, so the second must — the
    # Z-order target shape
    "lang x commit (lang='en')": {"lang": ("en", "en"), "commit": ("0", "8")},
}


def survivors(meta, ranges):
    kept = 0
    for f in meta["files"]:
        cs = f.get("cstats") or {}
        hit = True
        for c, (lo, hi) in ranges.items():
            rng = cs.get(c)
            if rng is not None and rng[0] is not None and (rng[1] < lo or rng[0] > hi):
                hit = False
                break
        kept += hit
    return kept


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_md = sys.argv[2] if len(sys.argv) > 2 else "BENCH/CLUSTERING.md"
    spark = get_spark(cores=8, shuffle_partitions=16, driver_memory="8g")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    log = docs.select(
        F.lit("I").alias("op"),
        F.col("doc_id").cast("long").alias("seq"),
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id"), F.lit(".txt")).alias("path"),
        F.md5("text").alias("commit"),
        "lang",
        F.col("text").alias("content"),
        F.lit(None).cast("timestamp").alias("event_ts"),
        F.lit(1).alias("schema_v"),
    )
    n_docs = log.count()
    layouts = {
        "key sort (default)": {},
        "linear [lang, commit]": {"cluster_by": ["lang", "commit"]},
        "zorder [lang, commit]": {
            "cluster_by": ["lang", "commit"], "cluster_mode": "zorder",
        },
    }
    results = {}
    for name, kw in layouts.items():
        root = os.path.join(tempfile.gettempdir(), f"fk_benchclus_{hash(name) & 0xffff}")
        shutil.rmtree(root, ignore_errors=True)
        table = create_entity_table(
            root, n_buckets=8, target_file_rows=64, **kw
        )
        merge_into(spark, table, log, query_id="b", epoch=0)
        compact(spark, table)
        meta = table.current_metadata()
        results[name] = {
            "total": len(meta["files"]),
            **{k: survivors(meta, r) for k, r in SCANS.items()},
        }
        shutil.rmtree(root, ignore_errors=True)

    lines = [
        "# Clustered-layout pruning evidence",
        "",
        f"Input: `{sf}` documents changelog ({n_docs} rows), n_buckets=8, "
        "target_file_rows=64, one compact per layout. Numbers are FILES A "
        "SCAN MUST READ under snapshot(col_ranges=) planning — deterministic "
        "properties of the layout, immune to VM noise (results are exact "
        "under every layout; pruning is planning only).",
        "",
        "| layout | files | " + " | ".join(SCANS) + " |",
        "|---|---|" + "---|" * len(SCANS),
    ]
    for name, r in results.items():
        cells = " | ".join(
            f"{r[k]} ({100 * r[k] // r['total']}%)" for k in SCANS
        )
        lines.append(f"| {name} | {r['total']} | {cells} |")
    lines += [
        "",
        "Reading: the key-sorted default reads ~everything for any non-key "
        "predicate. Linear clustering is OPTIMAL for prefix-shaped "
        "predicates (leading column constrained — its files are "
        "commit-sub-sorted within each lang run, so the two-dimension scan "
        "prunes well too); its blind spot is any predicate that does NOT "
        "constrain the leading column (the commit-only scan reads 82%). "
        "Z-order trades a little prefix tightness for balanced pruning on "
        "EVERY cluster dimension — pick it when scans constrain varying "
        "dimension subsets, linear when one dimension always leads. At "
        "100 TB these percentages are the fraction of the table a scan "
        "touches.",
        "",
        "Regenerate: `python scripts/bench_clustering.py`.",
    ]
    os.makedirs(os.path.dirname(out_md) or ".", exist_ok=True)
    with open(out_md, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
