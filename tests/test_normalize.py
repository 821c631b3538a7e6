"""Text normalization for dedup keys (operators/text.py normalize_expr /
text_normalized): hand-computed foldings, idempotence, the
normalize->exact-dedup collapse property, and the zero-exchange plan
contract."""

import hashlib

from pyspark.sql import functions as F

from forklift_spark.operators.dedup import exact_dedup
from forklift_spark.operators.text import normalize_expr, text_normalized
from forklift_spark.plans.guards import assert_no_row_python_udf, count_exchanges


def _norm(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = text_normalized(df, "text", "doc_id").collect()
    return {r.doc_id: (r.norm_text, r.norm_sha) for r in rows}


def test_hand_computed_foldings(spark):
    out = _norm(
        spark,
        [
            "Hello,  WORLD!! 42",       # case + punct runs + digits
            "  spaced\tout\n lines ",   # whitespace runs + trim
            "a1b2c3",                    # digits inside a word
            "!!!",                       # punct-only -> empty
            "MiXeD-CASE_under.score",    # separators between words
        ],
    )
    assert out[0][0] == "hello world 00"
    assert out[1][0] == "spaced out lines"
    assert out[2][0] == "a0b0c0"
    assert out[3][0] == ""
    assert out[4][0] == "mixed case under score"
    # norm_sha is sha256 of the normalized text, hex lowercase
    assert out[0][1] == hashlib.sha256(b"hello world 00").hexdigest()


def test_idempotent(spark):
    texts = ["Hello,  WORLD!! 42", "a1b2c3", "plain words here"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    once = text_normalized(df, "text", "doc_id")
    twice = text_normalized(once, "norm_text", "doc_id")
    rows = once.alias("a").join(twice.alias("b"), "doc_id").select(
        (F.col("a.norm_text") == F.col("b.norm_text")).alias("same")
    ).collect()
    assert all(r.same for r in rows)


def test_collapse_under_exact_dedup(spark):
    base = "the quick brown fox jumps"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, "The  QUICK brown-fox jumps!!"),  # case/punct variant of 1
            (3, base + " 42"),                     # number variant A
            (4, base + " 97,"),                    # number variant B (== A)
            (5, "a genuinely different document"),
        ],
        ["doc_id", "text"],
    )
    n = text_normalized(df, "text", "doc_id")
    groups = {
        r.keep_id: r.n_copies
        for r in exact_dedup(n, "norm_text", "doc_id").collect()
    }
    assert groups == {1: 2, 3: 2, 5: 1}


def test_keep_cols_and_plan_contract(spark):
    df = spark.range(10).selectExpr(
        "id AS doc_id", "concat('Doc #', id) AS text", "concat('s', id % 2) AS source"
    )
    out = text_normalized(df, "text", "doc_id", keep_cols=["source"])
    assert out.columns == ["doc_id", "source", "norm_text", "norm_sha"]
    # pure codegen: zero exchanges, no Python on the data path
    assert count_exchanges(out) == 0
    assert_no_row_python_udf(out, "text_normalized")
    rows = out.collect()
    # digits fold to 0: every "Doc #<n>" normalizes to the same key
    assert all(r.norm_text == "doc 0" for r in rows)
