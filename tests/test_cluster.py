"""Connected components + canonical dedup (operators/cluster.py): chain
transitivity, multi-component graphs, a randomized union-find oracle, the
non-convergence guard, and keep-canonical semantics (min-id and prefer_col).
"""

import random

import pytest
from pyspark.sql import functions as F

from forklift_spark.operators.cluster import (
    connected_components,
    dedup_keep_canonical,
)


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )


def _assign(spark, edges, **kw):
    got = connected_components(_pairs(spark, edges), **kw).collect()
    return {r["id"]: r["component"] for r in got}


def test_chain_transitivity(spark):
    # a 9-node path: label propagation would need 8 rounds; star contraction
    # must still land every node on the min — including ids never directly
    # paired with it
    chain = [(i, i + 1) for i in range(1, 9)]
    assert _assign(spark, chain) == {i: 1 for i in range(1, 10)}


def test_multiple_components_and_noise(spark):
    edges = [
        (5, 3), (3, 8),            # comp 3
        (20, 21),                  # comp 20
        (40, 41), (41, 40), (40, 40),  # comp 40: dupes + self-loop
    ]
    got = _assign(spark, edges)
    assert got == {3: 3, 5: 3, 8: 3, 20: 20, 21: 20, 40: 40, 41: 40}


def test_empty_pairs(spark):
    out = connected_components(_pairs(spark, []))
    assert out.columns == ["id", "component"] and out.count() == 0


def test_random_graph_vs_union_find(spark):
    rng = random.Random(7)
    n = 400
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    nodes = {v for e in edges for v in e}
    # canonical label = min node id per root
    roots = {}
    for v in nodes:
        roots.setdefault(find(v), []).append(v)
    expected = {v: min(vs) for r, vs in roots.items() for v in vs}

    assert _assign(spark, edges) == expected


def test_string_ids(spark):
    pairs = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "y")], "id_a string, id_b string"
    )
    got = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x"}


def test_max_rounds_guard(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, [(i, i + 1) for i in range(1, 40)]),
                             max_rounds=1)


def test_keep_canonical_min_id(spark):
    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in [1, 2, 3, 4, 10, 11]], "doc_id long, text string"
    )
    # cluster {1,2,3} (chain), cluster {10,11}; 4 is a singleton
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11)])
    kept = sorted(
        r["doc_id"]
        for r in dedup_keep_canonical(df, pairs, "doc_id").collect()
    )
    assert kept == [1, 4, 10]


def test_keep_canonical_prefer_col(spark):
    df = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5)], "doc_id long, quality double"
    )
    pairs = _pairs(spark, [(1, 2), (2, 3)])
    kept = sorted(
        r["doc_id"]
        for r in dedup_keep_canonical(
            df, pairs, "doc_id", prefer_col="quality"
        ).collect()
    )
    # cluster {1,2,3}: max quality ties 2 vs 3 -> min id 2 wins; 4 singleton
    assert kept == [2, 4]


def test_keep_canonical_precomputed_components(spark):
    df = spark.createDataFrame([(1,), (2,), (9,)], "doc_id long")
    pairs = _pairs(spark, [(1, 2)])
    cc = connected_components(pairs)
    kept = sorted(
        r["doc_id"]
        for r in dedup_keep_canonical(
            df, pairs, "doc_id", components=cc
        ).collect()
    )
    assert kept == [1, 9]
