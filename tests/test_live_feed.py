"""Live (non-replay) ingest: a continuously-fed change feed converges as
segments arrive, and periodic auto-compaction bounds MOR delta buildup."""

import os
import shutil
import time

from forklift_spark.changelog import ChangelogSpec, expected_final_state, generate_changelog
from forklift_spark.streaming.ingest import create_entity_table, run_ingest, verify_state

SPEC = ChangelogSpec(n_events=3_000, n_repos=6, paths_per_repo=12, seed=31,
                     segment_rows=500)


def test_live_feed_converges(spark, tmp_path):
    src_log = tmp_path / "full"
    generate_changelog(SPEC, str(src_log))
    segs = sorted(s for s in os.listdir(src_log) if s.startswith("seg-"))

    feed = tmp_path / "feed"
    feed.mkdir()
    shutil.copy(src_log / segs[0], feed / segs[0])  # stream needs >=1 file

    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    report, q = run_ingest(
        spark,
        str(feed),
        table,
        str(tmp_path / "ckpt"),
        query_id="live",
        max_files_per_trigger=2,
        available_now=False,
        mode="mor",
        compact_every=2,
    )
    try:
        # drip-feed the rest while the query is live
        for s in segs[1:]:
            shutil.copy(src_log / s, feed / s)
            time.sleep(0.05)
        deadline = time.monotonic() + 120
        want = SPEC.n_events  # delivered == generated (no duplicates in SPEC)
        while time.monotonic() < deadline:
            if sum(e.batch_rows for e in report.epochs) >= want:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(60)

    exp = spark.createDataFrame(expected_final_state(SPEC))
    assert verify_state(spark, table, exp)["ok"]
    # auto-compaction actually ran: the current snapshot no longer needs
    # read-time dedup right after a compact boundary, and file count is
    # bounded well below epochs x buckets
    meta = table.current_metadata()
    applied = sum(1 for e in report.epochs if not e.skipped and e.batch_rows)
    assert applied >= 3
    assert len(meta["files"]) < applied * 4
