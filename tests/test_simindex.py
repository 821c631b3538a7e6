"""Incremental near-dup similarity index (operators/simindex.py):
signature parity with the batch minhash pipeline (bit-for-bit), O(changed)
incremental maintenance across update/delete epochs, LSH pair quality on
planted near-dup families, and the divisor guard."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.lakette.table import LaketteTable
from forklift_spark.operators.dedup import char_shingles, minhash_signatures
from forklift_spark.operators.merge import merge_into
from forklift_spark.operators.simindex import (
    derive_simindex,
    near_dup_pairs,
    signature_sql,
)
from forklift_spark.operators.text import normalize_expr
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table

BASE = (
    "The quick brown fox jumps over the lazy dog while seventeen "
    "sleepy penguins watch from a very comfortable icy ledge nearby"
)


def _ev(op, seq, path, content, lang="py"):
    return (op, seq, "r", path, f"c{seq}", lang, content, None, 1)


def _seed(spark, table, rows, *, epoch=0):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    return merge_into(spark, table, df, query_id="seed", epoch=epoch)


def _sigs(spark, dst_root):
    return {
        r.path: tuple(r.sig)
        for r in LaketteTable(dst_root).snapshot(spark).select("path", "sig").collect()
    }


def test_signature_parity_with_batch_pipeline(spark, tmp_path):
    src = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    dst = str(tmp_path / "idx")
    rows = [
        _ev("I", 1, "a", BASE),
        _ev("I", 2, "b", BASE.replace("fox", "cat")),
        _ev("I", 3, "c", "completely different tiny text"),
        _ev("I", 4, "d", ""),  # empty content edge
    ]
    _seed(spark, src, rows)
    r = derive_simindex(spark, src, dst, n_hashes=16, k=5)
    assert r.initial_sync
    got = _sigs(spark, dst)
    # batch twin: normalize -> char_shingles -> minhash_signatures
    norm = src.snapshot(spark).select(
        "path", normalize_expr(F.col("content")).alias("nt")
    )
    sh = char_shingles(norm, "nt", "path", k=5)
    batch = {
        row["_id"]: tuple(row[f"h{j}"] for j in range(16))
        for row in minhash_signatures(sh, 16).collect()
    }
    assert set(got) == set(batch)
    for p in batch:
        assert got[p] == batch[p], f"signature mismatch for {p}"


def test_incremental_maintenance_and_tombstones(spark, tmp_path):
    src = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    dst = str(tmp_path / "idx")
    _seed(spark, src, [
        _ev("I", 1, "a", BASE), _ev("I", 2, "b", BASE + " tail"),
        _ev("I", 3, "c", "short text"),
    ])
    derive_simindex(spark, src, dst, n_hashes=16)
    sig_a0 = _sigs(spark, dst)["a"]
    # update a's content, delete c — one incremental span
    _seed(spark, src, [
        _ev("U", 4, "a", "now something else entirely"),
        _ev("D", 5, "c", None),
    ], epoch=1)
    r = derive_simindex(spark, src, dst, n_hashes=16)
    assert not r.initial_sync and not r.resync
    got = _sigs(spark, dst)
    assert set(got) == {"a", "b"}          # c left the index with its delete
    assert got["a"] != sig_a0              # a was re-signed
    # convergence: maintained index == one-shot recompute of final state
    expect = {
        r2.path: tuple(r2.s)
        for r2 in src.snapshot(spark)
        .selectExpr("path", f"{signature_sql('content', n_hashes=16)} AS s")
        .collect()
    }
    assert got == expect


def test_near_dup_pairs_on_planted_families(spark, tmp_path):
    src = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    dst = str(tmp_path / "idx")
    fam2 = ("an unrelated second family about distributed query engines "
            "and their shuffle partitioning behavior at petabyte scale")
    _seed(spark, src, [
        _ev("I", 1, "a1", BASE),
        _ev("I", 2, "a2", BASE.replace("lazy", "LAZY!")),  # normalization-close
        _ev("I", 3, "b1", fam2),
        _ev("I", 4, "b2", fam2 + " indeed"),
        _ev("I", 5, "z", "nothing like the others at all, very short"),
    ])
    derive_simindex(spark, src, dst, n_hashes=32)
    pairs = near_dup_pairs(
        spark, LaketteTable(dst), bands=8, threshold=0.5
    ).collect()
    got = {tuple(sorted((r.path_a, r.path_b))) for r in pairs}
    assert ("a1", "a2") in got
    assert ("b1", "b2") in got
    assert all("z" not in p for p in got)
    for r in pairs:
        assert 0.5 <= r.est_jaccard <= 1.0
    # normalization-close pair should estimate VERY high
    est = {tuple(sorted((r.path_a, r.path_b))): r.est_jaccard for r in pairs}
    assert est[("a1", "a2")] == 1.0


def test_guards_and_empty_index(spark, tmp_path):
    src = create_entity_table(str(tmp_path / "src"), n_buckets=2)
    dst = str(tmp_path / "idx")
    _seed(spark, src, [_ev("I", 1, "a", "x")])
    derive_simindex(spark, src, dst, n_hashes=16)
    with pytest.raises(ValueError, match="divide"):
        near_dup_pairs(spark, LaketteTable(dst), bands=7)
    # empty index (all rows deleted) -> zero pairs, stable schema
    _seed(spark, src, [_ev("D", 2, "a", None)], epoch=1)
    derive_simindex(spark, src, dst, n_hashes=16)
    out = near_dup_pairs(spark, LaketteTable(dst), bands=8)
    assert out.count() == 0
    assert "est_jaccard" in out.columns


def test_near_dup_pairs_since_incremental_union(spark, tmp_path):
    """Per-epoch novelty query: pairs involving changed docs only, and
    full-pairs(head) == full-pairs(v1) UNION pairs-since(v1) — the union
    contract incremental consumers rely on."""
    from forklift_spark.operators.simindex import near_dup_pairs_since

    src = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    dst = str(tmp_path / "idx")
    fam2 = ("an unrelated second family about distributed query engines "
            "and their shuffle partitioning behavior at petabyte scale")
    _seed(spark, src, [
        _ev("I", 1, "a1", BASE), _ev("I", 2, "b1", fam2),
        _ev("I", 3, "b2", fam2 + " indeed"),
    ])
    derive_simindex(spark, src, dst, n_hashes=32)
    idx = LaketteTable(dst)
    v1 = idx.current_metadata()["version"]

    def _pairs(df):
        return {tuple(sorted((r.path_a, r.path_b))) for r in df.collect()}

    pairs_v1 = _pairs(near_dup_pairs(spark, idx, bands=8, threshold=0.5))
    assert pairs_v1 == {("b1", "b2")}

    # epoch 1: a near-dup of a1 arrives; b2 gets an unrelated rewrite
    _seed(spark, src, [
        _ev("I", 4, "a2", BASE.replace("dog", "dogs")),
        _ev("U", 5, "b2", "totally rewritten, unlike anything"),
    ], epoch=1)
    derive_simindex(spark, src, dst, n_hashes=32)

    since = near_dup_pairs_since(spark, idx, v1, bands=8, threshold=0.5)
    got = _pairs(since)
    assert ("a1", "a2") in got                 # the new near-dup is found
    assert all("b1" not in p or "b2" not in p for p in got)  # b-family broke up
    # union contract: old full + incremental == new full (minus pairs that
    # DISSOLVED when a member changed — consumers drop pairs whose member
    # appears in the span; here (b1, b2) dissolved)
    full_now = _pairs(near_dup_pairs(spark, idx, bands=8, threshold=0.5))
    assert full_now == got | (pairs_v1 - {("b1", "b2")})

    # boundary cases
    assert near_dup_pairs_since(spark, idx,
                                idx.current_metadata()["version"]).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="ahead of head"):
        near_dup_pairs_since(spark, idx, 999)


def test_boilerplate_bucket_cap(spark, tmp_path):
    """The boilerplate-collapse guard (max_bucket): a corpus where every
    document shares a large common template collapses signature
    components to corpus-wide constants — without the cap the banded
    join degenerates toward all-pairs; with it, oversized buckets are
    dropped while genuinely-near pairs (which also collide in DIVERSE
    bands) are still found."""
    boiler = " ".join(f"copyright header line {i} all rights reserved" for i in range(8))
    src = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    dst = str(tmp_path / "idx")
    rows = [
        _ev("I", i, f"d{i:03d}", f"{boiler} unique tail {i} " + "x" * (i % 7))
        for i in range(40)
    ]
    # a planted near-dup pair with DISTINCT tails longer than the boilerplate
    tail = ("completely distinctive shared ending about partition pruning "
            "strategies and manifest caching behavior in modern lakehouses")
    rows += [
        _ev("I", 100, "paira", f"{tail} alpha {tail}"),
        _ev("I", 101, "pairb", f"{tail} alpha! {tail}"),
    ]
    _seed(spark, src, rows)
    derive_simindex(spark, src, dst, n_hashes=32)
    idx = LaketteTable(dst)

    uncapped = near_dup_pairs(spark, idx, bands=8, threshold=0.5)
    capped = near_dup_pairs(spark, idx, bands=8, threshold=0.5, max_bucket=10)
    n_unc, n_cap = uncapped.count(), capped.count()
    assert n_cap <= n_unc  # the cap can only shrink the candidate set
    got = {tuple(sorted((r.path_a, r.path_b))) for r in capped.collect()}
    assert ("paira", "pairb") in got  # the real near-dup pair survives the cap
    # the boilerplate family produced oversized buckets: without the cap the
    # boiler docs pair up en masse; with cap=10 those pairs are gone
    boiler_pairs = [p for p in got if p[0].startswith("d") and p[1].startswith("d")]
    unc_boiler = [
        (r.path_a, r.path_b) for r in uncapped.collect()
        if r.path_a.startswith("d") and r.path_b.startswith("d")
    ]
    assert len(unc_boiler) > len(boiler_pairs)
