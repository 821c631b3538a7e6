"""Connected components + canonical-document selection over dup pairs.

The pairwise dedup operators (operators/dedup.py) emit near-duplicate PAIRS;
a production corpus dedup needs the TRANSITIVE closure of those pairs — if
A~B and B~C, then {A, B, C} is one duplicate cluster and exactly one of the
three survives, even when A~C itself was never emitted (LSH misses it, or
the similarity genuinely decays along the chain). This module supplies that
last step (SURVEY §2 LLM-pipeline family; composes with every pair
producer: shingle_jaccard_pairs, minhash_lsh_pairs, simhash_pairs,
embedding_dup_pairs_lsh).

  connected_components   alternating large-star / small-star over the pair
                         graph (Kiveris et al., "Connected Components in
                         MapReduce and Beyond", ACM SoCC 2014) — O(log n)
                         rounds, each round two key-partitioned aggregates
                         over EDGES only (never corpus payloads)
  dedup_keep_canonical   corpus filtered to one survivor per cluster
                         (min-id, or argmax of a preference column)

Why not label propagation (component = min over neighbors, iterate)?  That
converges in O(graph diameter) rounds — a 10^6-doc chain of boilerplate
mutants is a 10^6-diameter path and would never finish. Star contraction
halves path lengths every alternation, so rounds stay logarithmic
regardless of cluster shape; each round's cost is the edge count, which
only shrinks (large-star never adds edges across components and small-star
collapses stars).

Scale posture: the data that iterates is the EDGE list — two longs per row
— not documents. At a 30% dup rate on 10^10 docs that is ~3·10^9 edge rows,
shuffled on the node id, with cluster-size skew absorbed by the star
contraction itself (a hot component's edges all point at its min and stop
moving). Lineage is truncated every round with localCheckpoint (eager), the
standard Spark idiom for iterative DataFrame algorithms: without it the
plan doubles per round and Catalyst analysis time explodes by round ~15.
localCheckpoint stores blocks on executors (lost blocks => recompute from
the truncated plan fails); on a production cluster prefer
``spark.sparkContext.setCheckpointDir`` + ``df.checkpoint()`` — the switch
is the ``reliable_checkpoint`` flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _canon_edges(pairs: DataFrame, left_col: str, right_col: str) -> DataFrame:
    """Distinct (src, dst) edges, self-loops and NULL endpoints dropped."""
    e = (
        pairs.select(F.col(left_col).alias("src"), F.col(right_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
    )
    return e


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u, connect every strictly-larger neighbor to
    min(Γ(u) ∪ {u}). Emitted edges always point from larger to smaller, so
    no self-loops are produced (m <= u < v)."""
    nb = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = (
        nb.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select("src", F.least(F.col("src"), F.col("_mn")).alias("_m"))
    )
    return (
        nb.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .dropDuplicates()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Direct each edge (greater -> smaller); for each node u connect every
    smaller neighbor AND u itself to min(Γ(u))."""
    g = edges.select(
        F.greatest(F.col("src"), F.col("dst")).alias("src"),
        F.least(F.col("src"), F.col("dst")).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    m = g.groupBy("src").agg(F.min("dst").alias("_m"))
    emitted = (
        g.join(m, "src")
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .union(m.select(F.col("src"), F.col("_m").alias("dst")))
    )
    return emitted.filter(F.col("src") != F.col("dst")).dropDuplicates()


def connected_components(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    *,
    max_rounds: int = 50,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Component assignment ``(id, component)`` for every node appearing in
    ``pairs``; ``component`` is the MINIMUM id in the node's component (so
    the assignment is deterministic and engine-independent).

    Alternates large-star / small-star until the edge set is a fixed point
    (then it IS the star graph: one edge per non-root node, pointing at the
    component min). Fixed point is detected with one aggregate per round —
    (count, xor-free sum of xxhash64(src, dst)) — an edge-set fingerprint;
    convergence is additionally bounded by ``max_rounds`` (raises loudly
    rather than looping: the SoCC-2014 bound is O(log^2 n) rounds, ~10 in
    practice, so 50 means something is genuinely wrong)."""
    edges = _canon_edges(pairs, left_col, right_col)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    if not edges.take(1):
        return nodes.select("id", F.col("id").alias("component"))

    def _fingerprint(e: DataFrame) -> tuple:
        # decimal(38,0) sum: exact and overflow-free at any edge count
        # (a LongType sum of uniform 64-bit hashes overflows — and raises —
        # under spark.sql.ansi.enabled, the Spark 4 default)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(F.col("src"), F.col("dst")).cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def _persist(e: DataFrame) -> DataFrame:
        if reliable_checkpoint:
            return e.checkpoint(eager=True)
        return e.localCheckpoint(eager=True)

    edges = _persist(edges)
    prev = _fingerprint(edges)
    for _ in range(max_rounds):
        edges = _persist(_small_star(_large_star(edges)))
        cur = _fingerprint(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(expected O(log^2 n)); the input pair graph is pathological or "
            "ids are not consistently orderable"
        )

    # fixed point = star graph: every non-root node appears exactly once as
    # src, pointing at its component min; roots map to themselves
    return nodes.join(
        edges.select(F.col("src").alias("id"), F.col("dst").alias("component")),
        "id",
        "left",
    ).select("id", F.coalesce("component", "id").alias("component"))


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    *,
    left_col: str = "id_a",
    right_col: str = "id_b",
    prefer_col: str | None = None,
    components: DataFrame | None = None,
) -> DataFrame:
    """``df`` filtered to one surviving row per duplicate cluster.

    Survivor = the cluster's min id (deterministic, matches the
    ``component`` label), or — with ``prefer_col`` — the cluster row with
    the greatest preference value (ties broken by min id), e.g. keep the
    highest-quality_score document rather than the oldest.

    Rows absent from the pair graph are singletons and always survive. The
    assignment join shuffles on the id — at a 30% dup rate the assignment
    side is the same order of magnitude as the corpus, so no broadcast is
    attempted (AQE may still choose one when the dup graph is small)."""
    cc = components if components is not None else connected_components(
        pairs, left_col, right_col
    )
    cc2 = cc.select(
        F.col("id").alias("__cc_id"), F.col("component").alias("__component")
    )
    j = df.join(cc2, df[id_col] == cc2["__cc_id"], "left").withColumn(
        "__component", F.coalesce(F.col("__component"), F.col(id_col))
    )
    if prefer_col is None:
        kept = j.filter(F.col(id_col) == F.col("__component"))
    else:
        w = Window.partitionBy("__component").orderBy(
            F.col(prefer_col).desc(), F.col(id_col).asc()
        )
        kept = (
            j.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return kept.drop("__cc_id", "__component")
