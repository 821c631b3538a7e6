"""Data-quality EXPECTATIONS — declarative row-level constraints compiled
to Catalyst predicates, with split/quarantine/fail routing (VERDICT r4
"what a 100 TB operator hits first": the bronze-ingest quality gate every
real lakehouse pipeline puts in front of merge).

Spec model (Delta Live Tables / Great Expectations shape, re-expressed
Spark-first): an `Expectation` is a NAME plus a SQL boolean expression
that must hold per row; NULL evaluates as a violation (three-valued logic
never silently passes). Actions:

  warn        annotate only — the row stays on the good path
  drop        violating rows vanish from the good path (not retained)
  quarantine  violating rows route to the bad path with their violation
              tags (ingest lands them under table/_quarantine/epoch=N)
  fail        any violation aborts the batch with per-rule counts

Everything is whole-stage codegen: each rule compiles to one boolean
column, the violation tag array is `array_sort(filter(array(...)))`, and
the split is two filters over the same cached-by-Catalyst projection —
no UDFs, no shuffle, no driver-side row iteration. `enforce` does ONE
bounded aggregate (a single output row of per-rule counts), never a
collect of violating rows. At 100 TB the gate therefore costs one extra
map-side projection on the ingest scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VIOLATIONS_COL = "dq_violations"

_ACTIONS = ("warn", "drop", "quarantine", "fail")


@dataclass(frozen=True)
class Expectation:
    """One named row-level constraint. `expr` is any SQL boolean
    expression over the frame's columns; a NULL result counts as a
    violation (e.g. `size_bytes > 0` fails on NULL size_bytes)."""

    name: str
    expr: str
    action: str = "quarantine"

    def __post_init__(self) -> None:
        if self.action not in _ACTIONS:
            raise ValueError(
                f"expectation {self.name!r}: action {self.action!r} "
                f"not in {_ACTIONS}"
            )


class ExpectationError(RuntimeError):
    """Raised by enforce()/ingest when a fail-action rule is violated."""

    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        super().__init__(
            "expectations failed: "
            + ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))
        )


def _violations_col(exps: list[Expectation], actions: tuple[str, ...]) -> Column:
    """Sorted array of names of the rules (with an action in `actions`)
    this row violates. NULL rule results count as violations."""
    parts = [
        F.when(~F.coalesce(F.expr(e.expr), F.lit(False)), F.lit(e.name))
        for e in exps
        if e.action in actions
    ]
    if not parts:
        return F.array().cast("array<string>")
    return F.array_sort(F.filter(F.array(*parts), lambda x: x.isNotNull()))


def check(df: DataFrame, exps: list[Expectation]) -> DataFrame:
    """Annotate every row with `dq_violations` (ALL rules, every action) —
    the observability shape: no routing, pure map-side projection."""
    return df.withColumn(VIOLATIONS_COL, _violations_col(exps, _ACTIONS))


def split(
    df: DataFrame, exps: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Route rows: (good, quarantined).

    good        = rows violating NO drop/quarantine/fail rule, original
                  schema (warn violations stay — they only annotate).
    quarantined = rows violating >= 1 quarantine/fail rule, original
                  schema + `dq_violations` tags (so a human can triage by
                  rule). Rows violating ONLY drop-action rules are
                  discarded entirely — present in neither frame.

    Both sides derive from one projection; Catalyst pushes each side's
    filter into the same scan, so the split costs one pass."""
    routing = ("drop", "quarantine", "fail")
    tagged = df.withColumn("_dq_route", _violations_col(exps, routing)).withColumn(
        "_dq_quar", _violations_col(exps, ("quarantine", "fail"))
    )
    good = tagged.filter(F.size("_dq_route") == 0).drop("_dq_route", "_dq_quar")
    bad = (
        tagged.filter(F.size("_dq_quar") > 0)
        .withColumn(VIOLATIONS_COL, F.col("_dq_quar"))
        .drop("_dq_route", "_dq_quar")
    )
    return good, bad


def gate_events(
    df: DataFrame,
    exps: list[Expectation],
    *,
    op_col: str = "op",
    delete_op: str = "D",
) -> tuple[DataFrame, DataFrame]:
    """split() specialized for CHANGE-EVENT batches (the ingest gate).

    Delete events carry NULL payload columns by design (the key + op IS the
    event), so any payload-column rule would three-valued-logic them into
    quarantine and the table would silently stop forgetting rows. Deletes
    therefore BYPASS the gate: they ride the good path untouched, and the
    rules judge only insert/update/patch events. A rule that must apply to
    deletes (e.g. key-shape checks) can be run via split() directly.

    Returns (good, quarantined) — same contract as split(): good keeps the
    batch schema; quarantined adds `dq_violations` tags; drop-only
    violators appear in neither."""
    is_del = F.col(op_col) == F.lit(delete_op)
    good, bad = split(df.filter(~is_del), exps)
    return good.unionByName(df.filter(is_del)), bad


def violation_counts(df: DataFrame, exps: list[Expectation]) -> dict[str, int]:
    """Per-rule violation counts in ONE aggregate job (single output row;
    conditional count per rule — map-side partials, no shuffle of rows)."""
    aggs = [
        F.count(F.when(~F.coalesce(F.expr(e.expr), F.lit(False)), 1)).alias(e.name)
        for e in exps
    ]
    row = df.agg(*aggs).collect()[0]
    return {e.name: int(row[e.name]) for e in exps}


def audit_and_publish(
    spark,
    table,
    stage_id: str,
    exps: list[Expectation],
    *,
    abort_on_failure: bool = True,
    **snapshot_kw,
):
    """Write-audit-publish, audit step: run the expectation suite against
    the STAGED table state (lakette stage_commit / merge_into(publish=
    False)); if every fail-action rule holds, publish the stage and return
    (TableCommit, per-rule counts) — otherwise abort the stage (unless
    abort_on_failure=False, which leaves it for triage via
    table.staged_snapshot) and re-raise ExpectationError.

    The audit reads base+staged through the ordinary pruned snapshot path,
    so at 100 TB it costs one scan of the staged state's touched columns —
    pass snapshot kwargs (columns=, buckets=, ...) to narrow it. The
    publish is the table's normal CAS commit, so a conflicting concurrent
    commit surfaces as CommitConflictError here, never a lost update."""
    audited = table.staged_snapshot(spark, stage_id, **snapshot_kw)
    try:
        counts = enforce(audited, exps)
    except ExpectationError:
        if abort_on_failure:
            table.abort_staged(stage_id)
        raise
    return table.publish_staged(stage_id), counts


def enforce(df: DataFrame, exps: list[Expectation]) -> dict[str, int]:
    """Audit `df` against ALL rules; raise ExpectationError if any
    fail-action rule is violated. Returns the full per-rule count map
    (the audit record WAP publishes alongside the commit)."""
    counts = violation_counts(df, exps)
    failed = {
        e.name: counts[e.name]
        for e in exps
        if e.action == "fail" and counts[e.name] > 0
    }
    if failed:
        raise ExpectationError(failed)
    return counts
