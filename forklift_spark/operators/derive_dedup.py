"""Incrementally-maintained DEDUP silver — dedup as derived STATE, not a
batch job.

The batch dedup family (operators/dedup.py) answers "which rows of this
snapshot are copies" by rescanning the corpus; at a 10^10-event CDC
posture the question is asked after EVERY ingest epoch, and rescanning
100 TB per epoch is the wrong cost class. `derive_dedup` maintains the
answer as a derived lakette table over the changefeed:

    gold key  fp        = sha256 of the (optionally CCNet-normalized)
                          content — the exact-dedup group identity
    payload   survivor  = min over the group of the concatenated source
                          key (deterministic canonical pick: every engine,
                          every cluster size, every epoch order agrees)
              n_rows    = live member count (derive_agg's auto-maintained
                          liveness witness; 1 == unique, >1 == duplicated)

It is a thin, loudly-documented composition over `derive_agg`
(operators/derive_agg.py) with `group_by={"fp": <hash expr>}` — the
key-CHANGING transform `derive()` refuses is exactly an aggregation
problem, and derive_agg already solves its hard parts: exactly-once
span consumption, spec-drift guards, vacuum resync, and the
GROUPS strategy's affected-group recompute. That last part is the
non-obvious piece of incremental dedup: `min(...)` survivors are NOT
self-maintainable under deletes (removing the current survivor must
promote the next-smallest member, which the retraction feed cannot
know), so each span only IDENTIFIES the affected fp groups and those
groups are recomputed exactly from the source snapshot — O(span +
affected-group rows), never O(corpus). Per-epoch steady-state cost is
proportional to what changed, which is the entire point.

Normalization uses the same three regex steps as
operators/text.normalize_expr (lowercase, digits->0, non-alnum runs->
one space, trim) inlined as a SQL expression so the gold spec is
engine-portable and the DuckDB oracle can replay it byte-identically
(harness/q_textdata.py's dedup_exact_norm proved the twins agree).

Downstream composition: the gold table IS the dedup decision — a corpus
exporter keeps a row iff `concat_ws('|', keys...) == survivor` for its
fp (one equi-join on fp), and `n_rows > 1` rows are the duplicate-group
report. Both are ordinary snapshot queries, time-travellable and
taggable like any lakette table.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession

from ..lakette.table import LaketteTable
from .derive_agg import AggDeriveReport, derive_agg

#: SQL twin of operators/text.normalize_expr — keep the three steps in
#: lockstep with it (tests assert equality through the engine)
NORMALIZE_SQL = (
    "trim(regexp_replace(regexp_replace(lower(coalesce({col}, '')), "
    "'[0-9]', '0'), '[^a-z0-9]+', ' '))"
)


def fingerprint_sql(content_col: str, *, normalize: bool = True) -> str:
    """The gold group expression: sha256 hex of the (normalized) content.
    NULL content fingerprints as the empty string's digest so tombstone-
    adjacent states stay groupable rather than forming a NULL group."""
    inner = (
        NORMALIZE_SQL.format(col=content_col)
        if normalize
        else f"coalesce({content_col}, '')"
    )
    return f"sha2({inner}, 256)"


def derive_dedup(
    spark: SparkSession,
    src: LaketteTable,
    dst_root: str,
    *,
    content_col: str = "content",
    normalize: bool = True,
    predicate: Column | str | None = None,
    derive_id: str = "dedup",
    mode: str = "cow",
    n_buckets: int | None = None,
) -> AggDeriveReport:
    """Bring the dedup silver at `dst_root` up to the source's current
    version. Safe to call after every ingest epoch (streaming loops can
    hook it exactly like any derive_agg gold — run_ingest(derived=...));
    whole source versions land atomically, exactly-once under
    `derive_id`. `predicate` pre-filters source rows (e.g. scope the
    dedup state to one corpus split) with derive()'s documented
    out-of-predicate retraction semantics."""
    keys = src.key_cols()
    survivor = "min(" + " || '|' || ".join(keys) + ")"
    return derive_agg(
        spark,
        src,
        dst_root,
        {"fp": fingerprint_sql(content_col, normalize=normalize)},
        {"survivor": survivor},
        predicate=predicate,
        derive_id=derive_id,
        strategy="groups",  # min() under deletes: affected-group recompute
        mode=mode,
        n_buckets=n_buckets,
    )
