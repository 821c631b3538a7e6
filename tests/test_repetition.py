"""Repetition filters (operators/text.py repetition_stats): hand-computed
signal values, degenerate documents, and the zero-exchange plan contract."""

from pyspark.sql import functions as F

from forklift_spark.operators.text import repetition_stats
from forklift_spark.plans.guards import assert_no_row_python_udf, count_exchanges


def _stats(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(df, "text", "doc_id").collect()
    }


def test_hand_computed_signals(spark):
    s = _stats(
        spark,
        [
            # 8 words, 4 distinct; 'c' x3; 2-grams: 'a b'x2 + 'c c'x2 of 7
            (1, "a b a b c c c x"),
            # all distinct: every signal at its floor
            (2, "q w e r t y u i"),
            # one phrase repeated 3x: total repetition
            (3, "spam ham eggs spam ham eggs spam ham eggs"),
        ],
    )
    assert s[1]["n_words"] == 8
    assert s[1]["dup_word_frac_e6"] == 500_000         # 4/8
    assert s[1]["top_word_frac_e6"] == 375_000         # 3/8
    assert s[1]["dup_2gram_frac_e6"] == 571_428        # 4/7
    assert s[1]["dup_5gram_frac_e6"] == 0              # 4 x distinct 5-grams

    assert s[2]["dup_word_frac_e6"] == 0
    assert s[2]["top_word_frac_e6"] == 125_000         # 1/8
    assert s[2]["dup_2gram_frac_e6"] == 0
    assert s[2]["dup_5gram_frac_e6"] == 0

    # 9 words, 3 distinct, each x3; every 2-gram repeats (8/8); 5-grams:
    # positions 1..5 recur at +3 -> 'spam ham eggs spam ham' x2,
    # 'ham eggs spam ham eggs' x2, 'eggs spam ham eggs spam' x2 -> but of
    # the 5 positions, 4 are covered by a >=2 gram (the middle pattern
    # repeats with period 3: grams at i and i+3 are equal for i=1,2 ->
    # grams 1,2,4,5 repeated; gram 3 ('eggs spam ham eggs spam') also
    # equals gram... verify numerically: period-3 text means gram_i =
    # gram_{i+3}, so i in {1,2} pair with {4,5}; gram 3 has no partner
    # within range -> 4/5
    assert s[3]["dup_word_frac_e6"] == 666_666         # 6/9
    assert s[3]["top_word_frac_e6"] == 333_333         # 3/9
    assert s[3]["dup_2gram_frac_e6"] == 1_000_000
    assert s[3]["dup_5gram_frac_e6"] == 800_000        # 4/5


def test_degenerate_docs(spark):
    s = _stats(
        spark,
        [
            (1, "word"),                  # 1 word: no grams at all
            (2, "a a"),                   # 2 words: one 2-gram, no 5-gram
            (3, "  padded   whitespace  "),  # trim + \s+ collapse
        ],
    )
    assert s[1] == {
        "doc_id": 1, "n_words": 1, "dup_word_frac_e6": 0,
        "top_word_frac_e6": 1_000_000, "dup_2gram_frac_e6": 0,
        "dup_5gram_frac_e6": 0,
    }
    assert s[2]["dup_word_frac_e6"] == 500_000
    assert s[2]["dup_2gram_frac_e6"] == 0              # single 2-gram: no dup
    assert s[3]["n_words"] == 2


def test_zero_exchange_plan(spark):
    """The 100 TB contract: repetition is a per-row map — no shuffle, no
    Python on the row path."""
    df = spark.createDataFrame([(1, "a b c d e f g h")], ["doc_id", "text"])
    out = repetition_stats(df, "text", "doc_id")
    assert count_exchanges(out) == 0
    assert_no_row_python_udf(out, "repetition_stats")


def test_composes_with_quality_filter(spark):
    """The intended pipeline: drop docs above a repetition threshold."""
    df = spark.createDataFrame(
        [(1, "x y " * 30), (2, "fresh words only here today now")],
        ["doc_id", "text"],
    )
    rep = repetition_stats(df, "text", "doc_id")
    kept = rep.filter(F.col("dup_word_frac_e6") < 500_000)
    assert [r["doc_id"] for r in kept.collect()] == [2]
