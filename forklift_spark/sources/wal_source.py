"""S5 — custom pure-Python streaming source: a rate-limited WAL/binlog tail
with explicit, replayable offsets (SURVEY.md §2.1 S5; BASELINE.json:6
"tailed via a rate-limited file/Kafka source").

Built on the Python DataSource API (`pyspark.sql.datasource`, PySpark 4.x):
the driver tracks an offset = number of committed log segments; each
micro-batch covers a bounded range of segments (`maxFilesPerBatch`), one
input partition per segment, and executors read their segment with pyarrow
and yield Arrow record batches (columnar end-to-end — no per-row Python).

Offsets are plain dicts persisted by Spark's checkpoint WAL, which is what
makes the stream replayable/resumable: on restart Spark re-asks for the
exact same [start, end) segment range.

Usage:
    register_wal_source(spark)
    df = (spark.readStream.format("wal_tail")
          .option("path", log_dir)
          .option("maxFilesPerBatch", 8)
          .option("progressFile", ckpt + "/tail.hwm")  # offset mirror (required)
          .schema(CHANGELOG_SCHEMA)
          .load())
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class SegmentPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _seg_key(fn: str):
    """NUMERIC segment ordering: offsets are indices into this listing, so
    the order must stay stable when segment numbers outgrow the writer's
    zero padding (seg-100000 sorts lexicographically BEFORE seg-99999 —
    code-review r3). Non-numeric names sort after, lexicographically."""
    stem = fn[4:-8]  # between 'seg-' and '.parquet'
    return (0, int(stem), fn) if stem.isdigit() else (1, 0, fn)


def _list_segments(path: str) -> list[str]:
    """Committed log segments in commit order (numeric seg-N)."""
    return sorted(
        (fn for fn in os.listdir(path) if fn.startswith("seg-") and fn.endswith(".parquet")),
        key=_seg_key,
    )


class WalTailStreamReader(DataSourceStreamReader):
    """Driver-side offset planner. Offsets are monotone segment counts.

    `latestOffset()` is no-arg in this API and the reader object is fresh on
    every query (re)start, so the high-water mark is tracked in memory and —
    when `progressFile` is set — mirrored to a tiny file so a restarted
    query never plans a backward range. Either way `partitions()` clamps the
    mark to whatever checkpointed range Spark replays, so offsets can only
    move forward."""

    def __init__(self, schema, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wal_tail requires .option('path', <log dir>)")
        self.max_files = int(options.get("maxFilesPerBatch", 8))
        self.progress_file = options.get("progressFile")
        if not self.progress_file and not options.get("ephemeral"):
            # a restarted query's fresh reader would otherwise re-plan from
            # offset 0 and regress below the checkpoint (code-review r3) —
            # resumable streams MUST mirror the high-water mark to a file
            raise ValueError(
                "wal_tail requires .option('progressFile', <path>) so a "
                "restarted query cannot regress its offset; pass "
                ".option('ephemeral', 'true') only for throwaway streams "
                "that are never restarted from a checkpoint"
            )
        self._hwm = self._load_hwm()

    def _load_hwm(self) -> int:
        if self.progress_file and os.path.exists(self.progress_file):
            try:
                with open(self.progress_file) as f:
                    return int(f.read().strip() or 0)
            except (OSError, ValueError):
                return 0
        return 0

    def _save_hwm(self) -> None:
        if self.progress_file:
            tmp = self.progress_file + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(self._hwm))
            os.replace(tmp, self.progress_file)

    def initialOffset(self) -> dict:
        return {"segments": 0}

    def latestOffset(self) -> dict:
        """Advance by at most max_files segments per micro-batch — the rate
        limit. Spark persists the returned offset to the checkpoint WAL
        before the batch runs (replayable source ranges => exactly-once
        together with the sink's epoch markers)."""
        n = len(_list_segments(self.path))
        self._hwm = min(n, self._hwm + self.max_files) if n > self._hwm else self._hwm
        self._save_hwm()
        return {"segments": self._hwm}

    def partitions(self, start: dict, end: dict) -> list[SegmentPartition]:
        segs = _list_segments(self.path)
        lo, hi = start["segments"], end["segments"]
        if max(lo, hi) > self._hwm:
            self._hwm = max(lo, hi)
            self._save_hwm()
        return [
            SegmentPartition(os.path.join(self.path, s)) for s in segs[lo:hi]
        ] or [SegmentPartition("")]

    def read(self, partition: SegmentPartition):
        """Executor-side: stream the segment as Arrow record batches."""
        import pyarrow.parquet as pq

        if not partition.path:
            return
        pf = pq.ParquetFile(partition.path)
        yield from pf.iter_batches(batch_size=65536)

    def commit(self, end: dict) -> None:
        # Segments are immutable files — nothing to clean up; but persist
        # the completed batch's end offset as a second belt alongside
        # partitions()' clamp (the progress mirror can only move forward).
        if end.get("segments", 0) > self._hwm:
            self._hwm = int(end["segments"])
            self._save_hwm()


class WalTailDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wal_tail"

    def schema(self) -> str:
        # Caller should pass an explicit schema; this default matches the
        # changelog envelope (streaming/ingest.py CHANGELOG_SCHEMA).
        return (
            "op string, seq long, repo string, path string, commit string, "
            "lang string, content string, event_ts timestamp, schema_ver int"
        )

    def streamReader(self, schema) -> WalTailStreamReader:
        return WalTailStreamReader(schema, self.options)


def register_wal_source(spark) -> None:
    spark.dataSource.register(WalTailDataSource)
