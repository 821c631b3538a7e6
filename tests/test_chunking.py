"""Document chunking (operators/text.py text_chunks): hand-computed window
boundaries — short doc, exact-fit, one-past, overlap coverage, final
partial chunk, whitespace-only docs — plus guards and the zero-exchange
plan contract."""

import pytest

from forklift_spark.operators.text import text_chunks
from forklift_spark.plans.guards import assert_no_row_python_udf, count_exchanges


def _chunks(spark, text, *, ct, ov):
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = text_chunks(df, "text", "doc_id", chunk_tokens=ct, overlap=ov).collect()
    return [(r.chunk_id, r.n_tokens, r.chunk_text) for r in sorted(rows)]


def _words(n, start=0):
    return " ".join(f"w{i}" for i in range(start, start + n))


def test_hand_computed_boundaries(spark):
    # shorter than a window -> exactly one whole-doc chunk
    assert _chunks(spark, _words(3), ct=5, ov=2) == [(0, 3, "w0 w1 w2")]
    # exact fit -> still one chunk
    assert _chunks(spark, _words(5), ct=5, ov=2) == [(0, 5, _words(5))]
    # one past the window -> second chunk starts at stride, short tail
    got = _chunks(spark, _words(6), ct=5, ov=2)
    assert got == [(0, 5, _words(5)), (1, 3, "w3 w4 w5")]
    # overlap semantics: each chunk re-reads the previous `ov` tokens
    got = _chunks(spark, _words(9), ct=4, ov=1)
    assert got == [
        (0, 4, "w0 w1 w2 w3"),
        (1, 4, "w3 w4 w5 w6"),
        (2, 3, "w6 w7 w8"),
    ]


def test_every_token_covered_and_no_empty_chunks(spark):
    for n in (1, 7, 24, 25, 40, 41, 100):
        got = _chunks(spark, _words(n), ct=24, ov=6)
        assert all(nt > 0 for _, nt, _ in got)
        covered = set()
        for _, _, txt in got:
            covered.update(txt.split(" "))
        assert covered == set(_words(n).split(" ")), n
        # stride arithmetic: last chunk contains the final token exactly once
        assert got[-1][2].split(" ")[-1] == f"w{n - 1}"


def test_whitespace_only_docs_yield_zero_chunks(spark):
    df = spark.createDataFrame(
        [(1, "   "), (2, ""), (3, "one two")], "doc_id int, text string"
    )
    rows = text_chunks(df, "text", "doc_id", chunk_tokens=4, overlap=1).collect()
    assert {r.doc_id for r in rows} == {3}


def test_keep_cols_and_guards(spark):
    df = spark.createDataFrame(
        [(1, "hello world", "src0")], "doc_id int, text string, source string"
    )
    out = text_chunks(
        df, "text", "doc_id", chunk_tokens=4, overlap=1, keep_cols=["source"]
    )
    assert out.collect()[0].source == "src0"
    with pytest.raises(ValueError, match="overlap"):
        text_chunks(df, "text", "doc_id", chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="chunk_tokens"):
        text_chunks(df, "text", "doc_id", chunk_tokens=0, overlap=0)


def test_zero_exchange_plan(spark):
    df = spark.range(10).selectExpr(
        "id AS doc_id", "repeat('tok ', 50) AS text"
    )
    out = text_chunks(df, "text", "doc_id", chunk_tokens=8, overlap=2)
    assert count_exchanges(out) == 0
    assert_no_row_python_udf(out, "text_chunks")


def test_chunk_pack_composition_one_exchange(spark):
    """chunk -> pack as one plan pays exactly ONE exchange (the packing
    window's group key); the chunk fan-out stays in the scan stage."""
    from pyspark.sql import functions as F

    from forklift_spark.operators import sampling as sp

    df = spark.range(20).selectExpr(
        "id AS doc_id", "repeat('tok ', 40) AS text",
        "concat('s', id % 3) AS source",
    )
    chunks = text_chunks(
        df, "text", "doc_id", chunk_tokens=8, overlap=2, keep_cols=["source"]
    )
    stream = chunks.select(
        (F.col("doc_id") * 100000 + F.col("chunk_id")).alias("chunk_uid"),
        "source",
        F.col("n_tokens").alias("n_tok"),
    )
    out = sp.pack_concat_chunks(
        stream, "chunk_uid", "n_tok", max_tokens=16, group_col="source"
    )
    assert count_exchanges(out) == 1
    assert_no_row_python_udf(out, "chunk_pack")
    rows = out.collect()
    assert len(rows) == chunks.count()  # one packed row per chunk
    assert all(0 <= r.chunk_offset < 16 for r in rows)
