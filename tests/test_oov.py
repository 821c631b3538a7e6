"""OOV-rate quality signal (operators/text.py oov_rate): hand-computed
scores on a controlled corpus, deterministic vocabulary ties, and the
plan contract (broadcast vocab, no sort-merge on the scoring join)."""

from pyspark.sql import functions as F

from forklift_spark.operators.text import oov_rate
from forklift_spark.plans.guards import assert_no_row_python_udf, executed_plan


def test_hand_computed(spark):
    # corpus vocab by count: common x6, mid x3, rare x1, junk1 x1, junk2 x1
    df = spark.createDataFrame(
        [
            (1, "common common common mid"),
            (2, "common common mid mid rare"),
            (3, "common junk1 junk2"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in oov_rate(df, "text", "doc_id", top_v=2).collect()
    }
    # top-2 vocabulary = {common(6), mid(3)}
    assert got[1] == {"doc_id": 1, "n_words": 4, "n_oov": 0, "oov_rate_e6": 0}
    assert got[2] == {"doc_id": 2, "n_words": 5, "n_oov": 1,
                      "oov_rate_e6": 200_000}
    assert got[3] == {"doc_id": 3, "n_words": 3, "n_oov": 2,
                      "oov_rate_e6": 666_666}


def test_deterministic_tie_cut(spark):
    """Boundary ties resolve by word order (count desc, word asc): with
    every word at count 1 and top_v=2, vocabulary = alphabetical first 2."""
    df = spark.createDataFrame([(1, "delta alpha charlie bravo")], ["doc_id", "text"])
    r = oov_rate(df, "text", "doc_id", top_v=2).collect()[0]
    # vocab = {alpha, bravo}; charlie + delta are OOV
    assert r["n_oov"] == 2 and r["oov_rate_e6"] == 500_000


def test_plan_contract(spark):
    df = spark.createDataFrame([(i, "a b c") for i in range(10)], ["doc_id", "text"])
    out = oov_rate(df, "text", "doc_id", top_v=2)
    plan = executed_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert_no_row_python_udf(out, "oov_rate")


def test_composes_as_filter(spark):
    df = spark.createDataFrame(
        [(1, "x x x x"), (2, "zz1 zz2 zz3 zz4")], ["doc_id", "text"]
    )
    rep = oov_rate(df, "text", "doc_id", top_v=1)
    kept = rep.filter(F.col("oov_rate_e6") <= 500_000)
    assert [r["doc_id"] for r in kept.collect()] == [1]
