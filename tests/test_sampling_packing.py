"""Sampling + sequence-packing operators (training-data pipeline stage
between cleaned documents and training batches). The cross-engine value
parity of sample_stratified/pack_chunks is the DuckDB oracle's job
(scripts/check_oracle.py); these tests pin the operator INVARIANTS."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.operators import sampling as sp
from forklift_spark.plans.guards import count_exchanges, assert_no_row_python_udf


@pytest.fixture()
def docs(spark):
    rows = [
        (i, ["en", "zh", "de", "fr"][i % 4], f"g{i % 3}", 50 + (i * 37) % 400)
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, grp string, n_tok long")


def test_sample_stratified_is_deterministic_and_rate_accurate(docs):
    rates = {"en": 0.5, "zh": 0.2}
    a = sp.sample_stratified(docs, "lang", "doc_id", rates, default_rate=0.05)
    b = sp.sample_stratified(docs, "lang", "doc_id", rates, default_rate=0.05)
    got_a = sorted(r.doc_id for r in a.collect())
    got_b = sorted(r.doc_id for r in b.collect())
    assert got_a == got_b and got_a  # same rows every run
    by_lang = {r["lang"]: r["n"] for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # 100 docs per lang: binomial(100, p) stays well inside these bands
    assert 30 <= by_lang.get("en", 0) <= 70
    assert 5 <= by_lang.get("zh", 0) <= 40
    assert by_lang.get("de", 0) <= 20 and by_lang.get("fr", 0) <= 20
    # a different salt selects a different (still deterministic) sample
    c = sp.sample_stratified(docs, "lang", "doc_id", rates, default_rate=0.05, salt=99)
    assert sorted(r.doc_id for r in c.collect()) != got_a


def test_sample_stratified_is_map_only(docs):
    out = sp.sample_stratified(docs, "lang", "doc_id", {"en": 0.5})
    assert count_exchanges(out) == 0  # pure filter: no shuffle at any size
    assert_no_row_python_udf(out, "sample_stratified")


def test_pack_concat_chunks_matches_manual_cumsum(docs):
    out = sp.pack_concat_chunks(docs, "doc_id", "n_tok", 1000, group_col="grp")
    rows = {r.doc_id: r for r in out.collect()}
    # manual per-group replay
    import collections

    cum = collections.defaultdict(int)
    for r in sorted(docs.collect(), key=lambda r: r.doc_id):
        start = cum[r.grp]
        cum[r.grp] += r.n_tok
        got = rows[r.doc_id]
        assert got.pack_group == r.grp
        assert got.chunk_id == start // 1000
        assert got.chunk_offset == start % 1000
        assert got.n_tokens == r.n_tok
    assert_no_row_python_udf(out, "pack_concat_chunks")


def test_pack_greedy_invariants(docs):
    budget = 1000
    out = sp.pack_greedy(docs, "doc_id", "n_tok", budget, group_col="grp").collect()
    assert len(out) == docs.count()  # every doc packed exactly once
    import collections

    fill = collections.defaultdict(int)
    for r in out:
        fill[(r.pack_group, r.bin_id)] += r.n_tokens
    # budget respected (no doc here exceeds it, so strictly)
    assert all(v <= budget for v in fill.values())
    # bins are reasonably full: first-fit can't use more than 2x the
    # optimal bin count for this size distribution; sanity-bound it
    total = sum(fill.values())
    assert len(fill) <= 2 * (total // budget + len(set(f[0] for f in fill)))
    # deterministic
    out2 = sp.pack_greedy(docs, "doc_id", "n_tok", budget, group_col="grp").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_pack_greedy_property_random_sizes(spark):
    """Property sweep (hypothesis): for ANY document size multiset and ANY
    budget, greedy packing (a) packs every doc exactly once, (b) never
    overfills a bin with more than one doc, (c) opens no bin that an
    earlier bin could have absorbed (first-fit invariant), and (d) is
    deterministic."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=12, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        sizes=st.lists(st.integers(1, 1500), min_size=1, max_size=40),
        budget=st.integers(100, 1200),
    )
    def run(sizes, budget):
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(sizes)], "doc_id long, n_tok long"
        )
        out = sorted(
            sp.pack_greedy(df, "doc_id", "n_tok", budget, allow_global=True).collect(),
            key=lambda r: r.doc_id,
        )
        assert [r.doc_id for r in out] == list(range(len(sizes)))  # (a)
        import collections

        fill = collections.defaultdict(list)
        for r in out:
            fill[r.bin_id].append(r.n_tokens)
        for toks in fill.values():
            assert sum(toks) <= budget or len(toks) == 1  # (b)
        # (c) replay first-fit and demand identical assignment
        bins, want = [], []
        for s in sizes:
            for i, rem in enumerate(bins):
                if s <= rem:
                    bins[i] -= s
                    want.append(i)
                    break
            else:
                bins.append(max(0, budget - s))
                want.append(len(bins) - 1)
        assert [r.bin_id for r in out] == want

    run()


def test_global_packing_requires_explicit_opt_in(docs):
    """VERDICT r4 #3: group_col=None funnels the whole table through one
    window partition / one applyInPandas group — loud guard, mirroring
    cosine_pairs' quadratic gate, instead of a silent single-task plan."""
    with pytest.raises(ValueError, match="allow_global"):
        sp.pack_concat_chunks(docs, "doc_id", "n_tok", 1000)
    with pytest.raises(ValueError, match="allow_global"):
        sp.pack_greedy(docs, "doc_id", "n_tok", 1000)
    # the explicit opt-in still works (test-scale escape hatch)
    assert sp.pack_concat_chunks(
        docs, "doc_id", "n_tok", 1000, allow_global=True
    ).count() == docs.count()


def test_sample_hash_no_int64_overflow_at_huge_ids(spark):
    """ADVICE r4 #2: the naive (id+salt)*K product overflows int64 at
    id ~ 3.47e9. The modular two-piece multiply must (a) survive
    spark.sql.ansi.enabled=true at ids far beyond the overflow point and
    (b) equal the exact Python big-int computation row for row."""
    # (id + salt) itself must fit int64 — the documented domain is
    # non-negative ids with headroom for the salt
    ids = [0, 1, 3_470_000_000, 2**33, 2**40 + 12345, 2**62, 2**63 - 100]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        got = {
            r.doc_id: r.h
            for r in df.select(
                "doc_id", sp.sample_hash("doc_id", salt=7).alias("h")
            ).collect()
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", prev)
    for i in ids:
        want = ((i + 7) * 2654435761) % (2**32) % 10000  # exact big-int
        assert got[i] == want, f"id={i}: got {got[i]}, want {want}"


def test_pack_greedy_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(1, 5000), (2, 100), (3, 100)], "doc_id long, n_tok long"
    )
    out = {
        r.doc_id: r
        for r in sp.pack_greedy(df, "doc_id", "n_tok", 1000, allow_global=True).collect()
    }
    assert out[1].bin_id != out[2].bin_id  # the giant is alone
    assert out[2].bin_id == out[3].bin_id  # small ones share
