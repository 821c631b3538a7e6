"""X6 — Python UDTF: unpack a multi-file commit event into per-file rows.

A repo-change feed often delivers one event per *commit* whose payload
lists every file the commit touched (`path_a\\x1fcontent_a\\x1e...`). The
UDTF expands that into the engine's one-row-per-(path) envelope, keeping
the expansion inside the query plan (parallel, no driver loop).

`pyspark.sql.functions.udtf` (PySpark 4.x). Registered per-session via
`register_udtfs(spark)` for SQL use: `SELECT * FROM unpack_commit(...)`.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

#: unit separators used by the packed payload
FILE_SEP = "\x1e"
FIELD_SEP = "\x1f"


@udtf(returnType="path: string, content: string, file_index: int")
class UnpackCommit:
    """Expand one packed commit payload into (path, content) rows."""

    def eval(self, payload: str):  # noqa: D102 — contract fixed by Spark
        if payload is None:
            return
        for i, entry in enumerate(p for p in payload.split(FILE_SEP) if p):
            path, _, content = entry.partition(FIELD_SEP)
            yield (path, content, i)


def pack_commit(files: list[tuple[str, str]]) -> str:
    """Inverse helper for fixtures/tests: [(path, content)] -> payload."""
    return FILE_SEP.join(f"{p}{FIELD_SEP}{c}" for p, c in files)


def register_udtfs(spark) -> None:
    spark.udtf.register("unpack_commit", UnpackCommit)
