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
