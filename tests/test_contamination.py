"""Benchmark decontamination (operators/contamination.py): exact flagging
of planted leaks on a controlled vocabulary, threshold semantics, the
broadcast plan contract, and the degenerate inputs."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.operators.contamination import (
    contamination_report,
    decontaminate,
)
from forklift_spark.plans.guards import (
    assert_broadcast_join,
    assert_no_row_python_udf,
    executed_plan,
)


def _words(prefix, n, start=0):
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


@pytest.fixture(scope="module")
def corpora(spark):
    # benchmark: two docs of 12 distinct words each (5 8-grams apiece),
    # disjoint vocabularies so cross-hits are impossible by construction
    bench = spark.createDataFrame(
        [(1, _words("b", 12)), (2, _words("c", 12))], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            # clean: private vocabulary, long enough to produce grams
            (10, _words("t", 30)),
            # verbatim leak of bench 1 plus a tail -> all 5 grams shared
            (11, _words("b", 12) + " tail0 tail1 tail2"),
            # partial leak: first 8 words of bench 2 -> exactly 1 gram
            (12, _words("c", 8) + " " + _words("u", 10)),
            # shorter than n words: can never be flagged
            (13, _words("b", 5)),
        ],
        ["doc_id", "text"],
    )
    return train, bench


def test_planted_leaks_exact(spark, corpora):
    train, bench = corpora
    rep = {
        r["doc_id"]: r.asDict()
        for r in contamination_report(train, bench, "text", "doc_id", n=8).collect()
    }
    assert set(rep) == {11, 12}
    # bench doc 1 has 12 - 8 + 1 = 5 grams; doc 11 leaks all of them
    assert rep[11] == {
        "doc_id": 11,
        "n_hit_grams": 5,
        "n_bench_docs": 1,
        "max_bench_frac_e6": 1_000_000,
    }
    # doc 12 shares exactly the first 8-gram of bench doc 2: 1/5 grams
    assert rep[12] == {
        "doc_id": 12,
        "n_hit_grams": 1,
        "n_bench_docs": 1,
        "max_bench_frac_e6": 200_000,
    }


def test_decontaminate_threshold(spark, corpora):
    train, bench = corpora
    strict = decontaminate(train, bench, "text", "doc_id", n=8)
    assert {r["doc_id"] for r in strict.collect()} == {10, 13}
    # threshold at 20% keeps the partial leak, drops the verbatim one
    loose = decontaminate(train, bench, "text", "doc_id", n=8, min_frac_e6=200_000)
    assert {r["doc_id"] for r in loose.collect()} == {10, 12, 13}
    # columns preserved
    assert strict.columns == train.columns


def test_plan_broadcasts_bench_not_corpus(spark, corpora):
    """The performance contract: the gram join must broadcast the benchmark
    side — a sort-merge join there would shuffle the entire shingled corpus
    at 100 TB. No per-row Python anywhere."""
    train, bench = corpora
    rep = contamination_report(train, bench, "text", "doc_id", n=8)
    assert_broadcast_join(rep)
    assert_no_row_python_udf(rep, "contamination_report")
    plan = executed_plan(rep)
    # the only sort-merge-join-free formulation: every join in this plan is
    # broadcast (gram hits, bench sizes, per-doc distinct counts are all
    # leak-sized)
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_empty_and_disjoint_bench(spark, corpora):
    train, _ = corpora
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert contamination_report(train, empty, "text", "doc_id", n=8).count() == 0
    assert decontaminate(train, empty, "text", "doc_id", n=8).count() == train.count()
    disjoint = spark.createDataFrame([(9, _words("z", 40))], ["doc_id", "text"])
    assert contamination_report(train, disjoint, "text", "doc_id", n=8).count() == 0


def test_gram_shared_across_bench_docs_counted_once(spark):
    """A training gram leaked into SEVERAL bench docs counts once in
    n_hit_grams but each bench doc appears in n_bench_docs."""
    shared = _words("s", 8)
    bench = spark.createDataFrame(
        [(1, shared + " " + _words("b", 8)), (2, shared + " " + _words("c", 8))],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame([(10, shared)], ["doc_id", "text"])
    row = contamination_report(train, bench, "text", "doc_id", n=8).collect()
    assert len(row) == 1
    r = row[0].asDict()
    assert r["n_hit_grams"] == 1
    assert r["n_bench_docs"] == 2
    # each bench doc has 16 - 8 + 1 = 9 grams, 1 shared -> floor(1e6/9)
    assert r["max_bench_frac_e6"] == 111_111


def test_bench_ids_never_collide_with_train_output(spark, corpora):
    """Distinct id/text column names on the bench side are honored."""
    train, bench = corpora
    b2 = bench.select(
        F.col("doc_id").alias("bench_id"), F.col("text").alias("prompt")
    )
    rep = contamination_report(
        train, b2, "text", "doc_id",
        bench_text_col="prompt", bench_id_col="bench_id", n=8,
    )
    assert {r["doc_id"] for r in rep.collect()} == {11, 12}
