"""Round-6 optimization guard: the prefix+positional-filtered exact Jaccard
join (operators/dedup.py shingle_jaccard_pairs) must return EXACTLY the same
pairs and jaccard values as the naive inverted-index enumeration it replaced,
at any threshold. The naive reference is rebuilt here from first principles
(explode -> distinct -> self-join -> count) so a regression in the filter
math (prefix length, positional bound, the hashed stage-1 screen, the
string-exact stage-2) cannot hide behind the production code path.
"""

import random

import pytest
from pyspark.sql import functions as F

from forklift_spark.operators import dedup as dd


def _naive_pairs(spark, df, threshold, shingle_kind, ngram_n, k):
    """The pre-r6 formulation: enumerate every co-occurring pair."""
    if shingle_kind == "word":
        sh = dd.word_shingles(df, "text", "doc_id", ngram_n)
    else:
        sh = dd.char_shingles(df, "text", "doc_id", k)
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def _random_corpus(seed, n_docs=120, vocab=40, doc_len=(3, 30)):
    """Small vocabulary on purpose: maximizes hot-shingle collisions, the
    regime where the prefix/positional filters actually prune."""
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = []
    for i in range(n_docs):
        n = rng.randint(*doc_len)
        docs.append((i, " ".join(rng.choice(words) for _ in range(n))))
        if i % 4 == 0:  # planted near-dup: append 1-2 words
            docs.append(
                (10_000 + i, docs[-1][1] + " " + rng.choice(words))
            )
    return docs


@pytest.mark.parametrize("seed", [7, 21])
@pytest.mark.parametrize("threshold", [0.3, 0.8, 1.0])
def test_prefix_filtered_equals_naive_word(spark, seed, threshold):
    df = spark.createDataFrame(_random_corpus(seed), "doc_id long, text string")
    fast = dd.shingle_jaccard_pairs(
        df, "text", "doc_id", threshold=threshold, shingle_kind="word", ngram_n=2
    )
    ref = _naive_pairs(spark, df, threshold, "word", 2, 5)
    got = {(r.id_a, r.id_b): r.jaccard for r in fast.collect()}
    want = {(r.id_a, r.id_b): r.jaccard for r in ref.collect()}
    assert got == want, (
        f"prefix-filtered result diverged at t={threshold}: "
        f"missing={set(want) - set(got)} extra={set(got) - set(want)}"
    )
    dd.release_caches()


def test_prefix_filtered_equals_naive_char(spark):
    df = spark.createDataFrame(
        _random_corpus(3, n_docs=60, vocab=12, doc_len=(1, 8)),
        "doc_id long, text string",
    )
    fast = dd.shingle_jaccard_pairs(df, "text", "doc_id", k=3, threshold=0.5)
    ref = _naive_pairs(spark, df, 0.5, "char", 3, 3)
    got = {(r.id_a, r.id_b): r.jaccard for r in fast.collect()}
    want = {(r.id_a, r.id_b): r.jaccard for r in ref.collect()}
    assert got == want
    dd.release_caches()


def test_shingle_df_cap_composes_with_prefix_filter(spark):
    """max_shingle_df cuts BEFORE ranking: the filtered result must equal
    the naive join computed over the same post-cut shingle sets."""
    rows = [
        (1, "the quick brown fox jumps high"),
        (2, "the quick brown fox jumps high"),
        (3, "the quick brown cat sits low today"),
        (4, "an entirely different document body"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dd.shingle_jaccard_pairs(
        df, "text", "doc_id", threshold=0.1, shingle_kind="word", ngram_n=3,
        max_shingle_df=2,
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in capped.collect()}
    assert got == {(1, 2): 1.0}
    dd.release_caches()
