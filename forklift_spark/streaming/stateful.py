"""T5/X5 — cross-batch per-key state via `applyInPandasWithState`.

The production merge keeps its authoritative per-key max `seq` *in the
table* (restart-safe by construction — SURVEY.md §2.9 T5), so the engine
does not need Spark state for correctness. This operator is the inventory
demo of the stateful path: a streaming per-(repo, path) high-water mark
that emits a row whenever a key's max seq advances — i.e. a change-data
feed of "new winner" events, useful as a cheap upstream filter that drops
stale events before they reach the merge.

Arrow-batched per group (pandas in, pandas out): no per-row Python
(BASELINE.json:15).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("max_seq", T.LongType()),
        T.StructField("events_seen", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("max_seq", T.LongType()),
        T.StructField("events_seen", T.LongType()),
    ]
)


def _advance_hwm(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        max_seq, seen = state.get
    else:
        max_seq, seen = -1, 0
    new_max = max_seq
    for pdf in pdfs:
        if len(pdf):
            seen += len(pdf)
            m = int(pdf["seq"].max())
            if m > new_max:
                new_max = m
    state.update((new_max, seen))
    if new_max > max_seq:
        repo, path = key
        yield pd.DataFrame(
            {"repo": [repo], "path": [path], "max_seq": [new_max], "events_seen": [seen]}
        )


def running_max_seq(events: DataFrame) -> DataFrame:
    """Streaming high-water-mark feed: one output row per key per batch in
    which that key's max seq advanced. Update-mode stateful operator."""
    return events.groupBy("repo", "path").applyInPandasWithState(
        _advance_hwm,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class StatefulApiUnavailable(RuntimeError):
    pass


def running_max_seq_tws(events: DataFrame) -> DataFrame:
    """The same high-water mark on Spark 4's newer `transformWithStateInPandas`
    API (typed per-key ValueState, RocksDB-backed). GATED in this sandbox:
    the TWS Python runner needs a working `google.protobuf` install, which
    this image lacks (probed: `ImportError: cannot import name 'descriptor'`)
    — on a normal cluster (`pip install protobuf`, RocksDB provider conf)
    the call shape below runs unchanged. `running_max_seq` (above) is the
    production T5 path either way."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise StatefulApiUnavailable(
            "transformWithStateInPandas needs the protobuf python package "
            "for its streaming runner; unavailable in this offline image "
            f"({e}). Use running_max_seq (applyInPandasWithState) instead."
        ) from e

    from pyspark.sql.streaming import StatefulProcessor

    class _RunningMax(StatefulProcessor):
        def init(self, handle) -> None:
            self._mx = handle.getValueState("mx", "max_seq BIGINT")

        def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
            new_max = max(
                (int(pdf["seq"].max()) for pdf in rows if len(pdf)),
                default=None,
            )
            if new_max is None:  # a key can arrive with only empty chunks
                return
            if self._mx.exists():
                prev = int(self._mx.get()[0])
                if new_max <= prev:
                    return
                new_max = max(new_max, prev)
            self._mx.update((new_max,))
            repo, path = key
            yield pd.DataFrame({"repo": [repo], "path": [path], "max_seq": [new_max]})

        def close(self) -> None:
            pass

    return events.groupBy("repo", "path").transformWithStateInPandas(
        statefulProcessor=_RunningMax(),
        outputStructType="repo string, path string, max_seq long",
        outputMode="Update",
        timeMode="None",
    )
