"""Token-budget mixture sampling (operators/sampling.py
sample_to_token_budget): exact selection vs an independent simulation,
equivalence of the bucket-decomposed algorithm with the naive whole-domain
window, partitioning invariance, guards, and the plan contract."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from forklift_spark.operators.sampling import sample_hash, sample_to_token_budget
from forklift_spark.plans.guards import assert_no_row_python_udf, executed_plan


def _h(doc_id, salt=0):
    return (doc_id + salt) * 2654435761 % 2**32 % 10_000


def _simulate(rows, budgets, salt=0):
    """Reference selection: per domain, hash-then-id order, include docs
    while cumulative-before < budget."""
    out = set()
    domains = {r[1] for r in rows}
    for d in domains:
        if d not in budgets:
            continue
        cum = 0
        for doc_id, _, tok in sorted(
            (r for r in rows if r[1] == d), key=lambda r: (_h(r[0], salt), r[0])
        ):
            if cum < budgets[d]:
                out.add(doc_id)
            cum += tok
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    # 3 domains x 40 docs, token counts 5..16 deterministic
    rows = [
        (i, f"d{i % 3}", 5 + (i * 7) % 12)
        for i in range(120)
    ]
    return rows, spark.createDataFrame(rows, ["doc_id", "domain", "tok"])


def test_exact_selection_vs_simulation(spark, corpus):
    rows, df = corpus
    budgets = {"d0": 100, "d1": 37, "d2": 10_000}  # d2 under-supplied
    got = {
        r["doc_id"]
        for r in sample_to_token_budget(
            df, "domain", "doc_id", "tok", budgets
        ).collect()
    }
    assert got == _simulate(rows, budgets)
    # d2's supply is below budget: every d2 doc selected
    assert {r[0] for r in rows if r[1] == "d2"} <= got
    # funded domains meet their budget: selected sum >= budget, and
    # removing the crossing doc drops below it
    for d, b in (("d0", 100), ("d1", 37)):
        toks = sorted(
            (_h(i), i, t) for i, dd, t in rows if dd == d and i in got
        )
        total = sum(t for _, _, t in toks)
        assert total >= b
        assert total - toks[-1][2] < b


def test_equals_naive_window_formulation(spark, corpus):
    """The bucket decomposition (bucket prefix sums + boundary-only doc
    window) is exactly the naive per-domain global cumsum — across several
    salts and budget shapes."""
    rows, df = corpus
    for salt in (0, 17):
        for budgets in ({"d0": 1, "d1": 250, "d2": 60},
                        {"d0": 999999, "d1": 5, "d2": 0}):
            got = {
                r["doc_id"]
                for r in sample_to_token_budget(
                    df, "domain", "doc_id", "tok", budgets, salt=salt
                ).collect()
            }
            w = (
                Window.partitionBy("domain")
                .orderBy(sample_hash("doc_id", salt), "doc_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            bmap = F.create_map(
                *[x for k, v in sorted(budgets.items())
                  for x in (F.lit(k), F.lit(v))]
            )
            naive = (
                df.filter(F.col("domain").isin(list(budgets)))
                .withColumn("_cum", F.sum("tok").over(w))
                .filter(F.col("_cum") - F.col("tok") < bmap[F.col("domain")])
            )
            assert got == {r["doc_id"] for r in naive.collect()}


def test_partitioning_invariance_and_columns(spark, corpus):
    rows, df = corpus
    budgets = {"d0": 80, "d1": 80}
    a = sample_to_token_budget(df, "domain", "doc_id", "tok", budgets)
    b = sample_to_token_budget(
        df.repartition(7, "tok"), "domain", "doc_id", "tok", budgets
    )
    assert {r["doc_id"] for r in a.collect()} == {r["doc_id"] for r in b.collect()}
    assert a.columns == df.columns  # helper columns never leak


def test_guards_and_edges(spark, corpus):
    rows, df = corpus
    with pytest.raises(ValueError, match="empty budget map"):
        sample_to_token_budget(df, "domain", "doc_id", "tok", {})
    with pytest.raises(ValueError, match="negative token budget"):
        sample_to_token_budget(df, "domain", "doc_id", "tok", {"d0": -1})
    # zero budget selects nothing from that domain; unnamed domains drop
    got = sample_to_token_budget(
        df, "domain", "doc_id", "tok", {"d0": 0, "d1": 40}
    ).collect()
    assert all(r["domain"] == "d1" for r in got)


def test_plan_contract(spark, corpus):
    """The boundary decision set (one row per domain) joins broadcast —
    the corpus side must never sort-merge; no row-at-a-time Python."""
    rows, df = corpus
    out = sample_to_token_budget(df, "domain", "doc_id", "tok", {"d0": 50})
    plan = executed_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert_no_row_python_udf(out, "sample_to_token_budget")
