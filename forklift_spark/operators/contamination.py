"""Benchmark decontamination — the train/test-overlap scrub every serious
LLM training pipeline runs before a corpus ships (the published recipe:
flag any training document sharing a long word n-gram with a held-out
evaluation set, then drop or audit the hits).

Spark shape (the part that matters at 100 TB):

  * the BENCHMARK side is small by definition (eval sets are MBs, the
    corpus is TBs) — its distinct n-gram set is **broadcast**, so the
    training corpus is never shuffled: shingling is a map-side explode
    inside the scan's codegen stage, the overlap join is a
    BroadcastHashJoin emitting only matches, and the per-document
    aggregation shuffles just the matched subset (asserted in
    tests/test_contamination.py via plans/guards.py).
  * everything is a JVM column expression — no Python on the data path.
  * deterministic and engine-independent: grams are the literal
    space-joined word strings (no hashing), so the DuckDB oracle
    recomputes the identical report (harness/q_textdata.py
    `decontaminate`).

  contamination_report   per contaminated training doc: distinct leaked
                         grams, distinct benchmark docs hit, worst-case
                         benchmark coverage fraction
  decontaminate          the corpus minus flagged docs (left_anti)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _cached


def _distinct_grams(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(_id, shingle) with per-doc distinct word n-grams, deduped MAP-SIDE
    (array_distinct before the explode) — dedup.word_shingles' explode +
    .distinct() would shuffle every gram of the corpus, which is exactly
    the exchange this operator exists to avoid (its grams feed joins, so
    the shuffle is paid anyway there; here the corpus side must stay
    map-side)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    gram_expr = F.expr(
        "transform(sequence(0, size(_w) - %d), i -> %s)"
        % (n, " || ' ' || ".join(f"_w[i + {j}]" for j in range(n)))
    )
    gram = F.when(F.size(F.col("_w")) >= n, gram_expr).otherwise(
        F.array().cast("array<string>")
    )
    return (
        df.select(F.col(id_col).alias("_id"), words.alias("_w"))
        .select("_id", F.explode(F.array_distinct(gram)).alias("shingle"))
    )


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    *,
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    n: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """One row per CONTAMINATED training document (docs sharing no n-gram
    with the benchmark set do not appear):

      {id_col}         training doc id
      n_hit_grams      distinct training-side n-grams found anywhere in
                       the benchmark set
      n_bench_docs     distinct benchmark docs sharing >= 1 gram
      max_bench_frac_e6  max over hit benchmark docs of
                       floor(shared_grams / bench_doc_grams * 10^6) — 10^6
                       means some benchmark doc's ENTIRE gram set leaked
                       into this training doc (verbatim inclusion)

    `n` is the word n-gram length: published pipelines use 8-13 (long
    enough that natural recurrence is negligible, short enough to catch
    partial inclusion). Documents shorter than `n` words produce no grams
    and can never be flagged.

    `broadcast_bench=False` exists for the degenerate case of a benchmark
    set too large to broadcast — the join falls back to Catalyst's choice
    (sort-merge: the full training gram set shuffles). If you need that,
    your "benchmark" is a second corpus and you want the dedup family
    (dedup.py) instead; the flag is a loud escape hatch, not a mode.
    """
    bt = bench_text_col or text_col
    bi = bench_id_col or id_col

    tg = _distinct_grams(train, text_col, id_col, n)  # map-side distinct
    bg = _distinct_grams(bench, bt, bi, n).withColumnRenamed("_id", "_bid")
    if broadcast_bench:
        bg = F.broadcast(bg)

    # inner join emits ONLY leaked (train gram, bench doc) witnesses; both
    # sides are already distinct per doc, so count(*) per pair = shared
    # distinct grams. The witness set is referenced twice below (pair-level
    # coverage and doc-level distinct grams) — cached so the training
    # corpus is scanned ONCE; it is the leak set, small by construction
    # (call dedup.release_caches() between corpus slices).
    hits = _cached(tg.join(bg, "shingle"))
    pair = hits.groupBy("_id", "_bid").agg(
        F.count(F.lit(1)).alias("_shared")
    )

    bsz = bg.groupBy("_bid").agg(F.count(F.lit(1)).alias("_bn"))
    if broadcast_bench:
        bsz = F.broadcast(bsz)

    # a gram leaked into several bench docs must count ONCE in n_hit_grams
    # (count_distinct over witnesses) but each (train, bench) pair keeps
    # its own coverage fraction for the max
    per_doc = hits.groupBy("_id").agg(
        F.count_distinct("shingle").alias("n_hit_grams")
    )
    return (
        pair.join(bsz, "_bid")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_bench_docs"),
            F.max(
                F.floor(F.col("_shared") * F.lit(1_000_000) / F.col("_bn"))
                .cast("long")
            ).alias("max_bench_frac_e6"),
        )
        # leak-sized on both sides, but static size estimates derive from
        # the corpus: force the broadcast so the plan never degrades to a
        # sort-merge join on a big cluster's estimates
        .join(F.broadcast(per_doc), "_id")
        .select(
            F.col("_id").alias(id_col),
            "n_hit_grams",
            "n_bench_docs",
            "max_bench_frac_e6",
        )
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 8,
    min_frac_e6: int = 0,
    **kw,
) -> DataFrame:
    """The training corpus minus contaminated documents (all columns kept).

    `min_frac_e6` keeps docs whose worst-case benchmark coverage stays at
    or below the threshold (0 = drop on ANY shared n-gram, the strict
    published default). The flagged set is computed by
    `contamination_report` and removed with a left_anti join on the id —
    at scale the flagged set is small (it is the LEAK set), so Catalyst
    broadcasts it."""
    report = contamination_report(train, bench, text_col, id_col, n=n, **kw)
    flagged = report.filter(F.col("max_bench_frac_e6") > min_frac_e6).select(id_col)
    return train.join(F.broadcast(flagged), id_col, "left_anti")
