"""Raw JSON-lines binlog ingest: parse (C1) + dead-letter routing inside the
exactly-once epoch, converging sha-exact despite malformed lines."""

import json
import os

import pandas as pd

from forklift_spark.changelog import ChangelogSpec, expected_final_state, generate_changelog
from forklift_spark.streaming.ingest import create_entity_table, run_ingest, verify_state

SPEC = ChangelogSpec(n_events=2_000, n_repos=5, paths_per_repo=10, seed=23,
                     segment_rows=400)


def _to_jsonl(log_dir: str, out_dir: str, corrupt_every: int = 150) -> int:
    """Convert parquet segments to JSON-lines, injecting malformed lines."""
    os.makedirs(out_dir, exist_ok=True)
    n_bad = 0
    for seg in sorted(s for s in os.listdir(log_dir) if s.startswith("seg-")):
        pdf = pd.read_parquet(os.path.join(log_dir, seg))
        pdf["event_ts"] = pdf["event_ts"].astype(str)
        lines = []
        for i, rec in enumerate(pdf.to_dict("records")):
            lines.append(json.dumps(rec))
            if i % corrupt_every == corrupt_every - 1:
                lines.append("{broken json line")
                lines.append(json.dumps({**rec, "op": "Z"}))  # bad op
                n_bad += 2
        with open(os.path.join(out_dir, seg.replace(".parquet", ".jsonl")), "w") as f:
            f.write("\n".join(lines) + "\n")
    return n_bad


def test_jsonl_ingest_sha_exact_with_dead_letters(spark, tmp_path):
    plog = tmp_path / "plog"
    generate_changelog(SPEC, str(plog))
    jlog = tmp_path / "jlog"
    n_bad = _to_jsonl(str(plog), str(jlog))
    assert n_bad > 0

    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    run_ingest(
        spark,
        str(jlog),
        table,
        str(tmp_path / "ckpt"),
        query_id="jsonl",
        max_files_per_trigger=2,
        source="jsonl",
    )
    exp = spark.createDataFrame(expected_final_state(SPEC))
    assert verify_state(spark, table, exp)["ok"]

    dead = spark.read.parquet(os.path.join(table.root, "_dead_letters"))
    assert dead.count() == n_bad
    reasons = {r.reason for r in dead.select("reason").distinct().collect()}
    assert reasons == {"malformed_json", "bad_op"}


def test_dead_letter_reprocess_applies_corrected_lines(spark, tmp_path):
    """C1 closure: after the producer corrects a rejected payload (the
    corrected line lands in the dead-letter queue), reprocess_dead_letters
    merges the now-valid events idempotently; genuinely-broken lines stay
    dead."""
    from forklift_spark.streaming.ingest import reprocess_dead_letters

    plog = tmp_path / "plog"
    generate_changelog(SPEC, str(plog))
    jlog = tmp_path / "jlog"
    n_bad = _to_jsonl(str(plog), str(jlog))

    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    run_ingest(spark, str(jlog), table, str(tmp_path / "ckpt"),
               query_id="dlq", max_files_per_trigger=2, source="jsonl")
    exp = spark.createDataFrame(expected_final_state(SPEC))
    assert verify_state(spark, table, exp)["ok"]

    # the producer re-delivers one payload, corrected, into the DLQ
    some_key = exp.select("repo", "path").first()
    corrected = json.dumps({
        "op": "U", "seq": 10_000_000, "repo": some_key["repo"],
        "path": some_key["path"], "commit": "fixup", "lang": "py",
        "content": "corrected content", "event_ts": "2024-02-01T00:00:00Z",
        "schema_ver": 1,
    })
    fix_df = spark.createDataFrame([(corrected, "bad_op")], "raw string, reason string")
    fix_df.write.mode("overwrite").parquet(
        os.path.join(table.root, "_dead_letters", "epoch=9999")
    )

    stats, still_dead = reprocess_dead_letters(spark, table, epoch=0)
    assert stats.applied_rows == 1 and still_dead == n_bad
    row = (
        table.snapshot(spark)
        .where(f"repo = '{some_key['repo']}' and path = '{some_key['path']}'")
        .collect()[0]
    )
    assert row.content == "corrected content" and row.seq == 10_000_000
