"""Round-3 dedup/ANN hardening (VERDICT r2 #3, #5, #8):

  * exact_dedup shuffles digests, never payload bytes (plan-asserted)
  * ann_lsh bucket signatures vectorize past the plan-literal budget
    (mapInArrow matmul), identical results to the literal path
  * MinHash-LSH recall is MEASURED against exact-Jaccard ground truth
"""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from forklift_spark.operators import dedup as dd
from forklift_spark.operators.similarity import _LITERAL_BUDGET, lsh_topk


# ------------------------------------ exact dedup: digest-keyed exchange


def test_exact_dedup_shuffles_digest_not_content(spark):
    rows = [(i, f"doc body number {i % 40} with shared text") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dd.exact_dedup(df, "text", "doc_id")

    got = {r.content_hash: (r.keep_id, r.n_copies) for r in out.collect()}
    assert len(got) == 40 and all(n == 5 for _, n in got.values())

    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "formatted"
    )
    # the digest is computed map-side (a Project under the partial
    # aggregate) and the exchange partitions on it — the raw payload column
    # is pruned before any shuffle, so no Exchange block may carry `text`
    assert "md5(cast(text" in plan  # digest evaluated pre-shuffle
    blocks = [b for b in plan.split("\n\n") if b.strip()]
    exchanges = [b for b in blocks if b.splitlines()[0].strip().endswith("Exchange")]
    assert exchanges, plan
    for b in exchanges:
        assert "hashpartitioning" in b and "text#" not in b, b


# --------------------------------------- ann_lsh: literal vs arrow parity


def _vec_df(spark, n, dim, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(float)
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "id long, emb array<float>",
    ), vecs


def test_lsh_topk_arrow_matches_literal_at_small_dim(spark):
    df, vecs = _vec_df(spark, 60, 8)
    q = [float(x) for x in vecs[0]]
    lit = lsh_topk(df, "emb", "id", q, k=5, bits=4, n_tables=2, method="literal")
    arw = lsh_topk(df, "emb", "id", q, k=5, bits=4, n_tables=2, method="arrow")
    assert [tuple(r) for r in lit.collect()] == [tuple(r) for r in arw.collect()]


def test_lsh_topk_high_dim_routes_to_arrow_and_stays_planar(spark):
    """VERDICT r2 #5 'done' criterion: ann_lsh at dim 768 runs green and the
    plan stays small — hyperplanes never become Catalyst literals."""
    dim, bits, n_tables = 768, 16, 8
    assert n_tables * bits * dim > _LITERAL_BUDGET  # auto-routing engages
    df, vecs = _vec_df(spark, 300, dim)
    q = [float(x) for x in vecs[3]]
    out = lsh_topk(df, "emb", "id", q, k=10, bits=bits, n_tables=n_tables)
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "formatted"
    )
    assert "MapInArrow" in plan
    # the literal path at this size would embed ~98k float literals (tens of
    # MB of plan text); the arrow plan stays a few KB
    assert len(plan) < 60_000
    rows = out.collect()
    assert rows and rows[0].id == 3 and rows[0].cos == 1.0  # self is its own NN


# ------------------------------------------- MinHash-LSH measured recall


def test_minhash_lsh_recall_against_exact_jaccard(spark):
    """VERDICT r2 #8: quantified LSH quality. Ground truth = exact shingle
    Jaccard (the full-oracle operator); assert recall >= 0.9 at threshold
    0.8 and report precision (verification makes it exact by construction)."""
    rng = random.Random(42)
    vocab = [f"w{j}" for j in range(500)]
    docs = []
    for i in range(60):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(40)]
        docs.append((i, " ".join(words)))
        if i < 10:  # exact copies (jaccard 1.0)
            docs.append((1000 + i, " ".join(words)))
        elif i < 20:  # one-word mutation (word-trigram jaccard ~0.85)
            m = list(words)
            m[20] = "MUTANT"
            docs.append((1000 + i, " ".join(m)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    exact = dd.shingle_jaccard_pairs(
        df, "text", "doc_id", threshold=0.8, shingle_kind="word", ngram_n=3
    )
    truth = {(r.id_a, r.id_b) for r in exact.collect()}
    assert len(truth) >= 18  # planted pairs really exceed the threshold

    lsh = dd.minhash_lsh_pairs(
        df, "text", "doc_id", n_hashes=64, bands=16, threshold=0.8,
        shingle_kind="word", ngram_n=3,
    )
    found = {(r.id_a, r.id_b) for r in lsh.collect()}
    hit = truth & found
    recall = len(hit) / len(truth)
    precision = len(hit) / len(found) if found else 0.0
    assert recall >= 0.9, f"LSH recall {recall:.3f} (precision {precision:.3f})"
    # candidates are verified with exact Jaccard at the same threshold, so
    # every reported pair is a true pair
    assert precision == 1.0, f"LSH precision {precision:.3f}"


# ---------------------------------------------------- IVF ANN (r4)


def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF (k-means inverted lists, n_probe nearest) against exact
    brute-force top-k on a clustered fixture: the query's own cluster is
    always probed, so recall@10 stays high; self is its own NN."""
    import numpy as np

    from forklift_spark.operators.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(3)
    dim, per = 16, 40
    rows = []
    for c in range(5):  # 5 well-separated clusters
        center = rng.standard_normal(dim) * 10
        for j in range(per):
            v = center + rng.standard_normal(dim)
            rows.append((c * 1000 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "id long, emb array<float>")
    q = rows[7][1]  # a member of cluster 0

    exact = [r.id for r in brute_force_topk(df, "emb", "id", q, k=10).collect()]
    got_rows = ivf_topk(df, "emb", "id", q, k=10, n_lists=8, n_probe=2).collect()
    got = [r.id for r in got_rows]
    assert got_rows[0].id == 7 and got_rows[0].cos == 1.0  # self is NN
    recall = len(set(exact) & set(got)) / 10
    assert recall >= 0.8, f"IVF recall@10 {recall}"
    # deterministic across invocations (fixed seed)
    again = [r.id for r in ivf_topk(df, "emb", "id", q, k=10, n_lists=8, n_probe=2).collect()]
    assert got == again
