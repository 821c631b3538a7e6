"""Incrementally-maintained NEAR-DUP similarity index — MinHash
signatures as derived STATE over the changefeed.

`dedup_minhash_lsh` (operators/dedup.py) answers "which documents are
near-copies" by shingling and signing the WHOLE corpus per run —
explode to (doc, shingle) pairs, one groupBy for the signatures. At the
CDC posture the corpus changes by a trickle per epoch, and re-signing
100 TB per question is the wrong cost class. The observation that fixes
it: a document's MinHash signature is a PURE FUNCTION of its own
content — min over its shingles of xxhash64(shingle, j) — so it needs
no explode and no groupBy at all. Spark's higher-order functions
express it as ONE scalar projection:

    sig[j] = array_min(transform(<shingle array>, s -> xxhash64(s, j)))

which makes signature maintenance a KEY-PRESERVING row transform:
exactly the shape `derive()` (operators/derive.py) maintains
incrementally. `derive_simindex` keeps a silver table
(key cols..., sig: array<bigint>) fresh at O(changed rows) per epoch —
one codegen projection over each span, no corpus rescans, with
derive()'s exactly-once offsets, spec-drift guard, and vacuum resync
for free.

Signature parity is EXACT, not approximate: min over the multiset of
shingle hashes equals min over the distinct set, so the maintained
signatures are byte-identical to the batch `minhash_signatures ∘
char_shingles` pipeline on the same (normalized) text — asserted in
tests, which is what lets the batch path's measured recall numbers
(BENCH/DEDUPE_STRATEGY.md) carry over to the incremental index.

Query side, `near_dup_pairs`: banded LSH over the SILVER — slice each
stored signature into bands, hash each band to a bucket (a map-side
projection of the index, the corpus' content is never touched), and
self-join on (band, bucket) so candidates only meet inside buckets —
never all-pairs. Estimated Jaccard = matching fraction of the two full
signatures (zip_with + filter), computed on the candidate set only.
The same structure as the batch LSH, but over a table that was already
paid for by the changefeed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakette.table import LaketteTable
from .derive import DeriveReport, derive
from .derive_dedup import NORMALIZE_SQL


def shingles_sql(content_col: str, *, k: int = 5, normalize: bool = True) -> str:
    """Char k-gram shingle array as a SQL expression — the higher-order
    twin of dedup.char_shingles' explode (same windows over the same
    text; duplicates retained, which MinHash's min() ignores)."""
    src = (
        NORMALIZE_SQL.format(col=content_col)
        if normalize
        else f"coalesce({content_col}, '')"
    )
    # let-bind the (normalized) text once per row — inlining `src` into
    # the lambda would re-run the normalization regexes per SHINGLE
    # (see signature_sql's let-binding note)
    return (
        f"transform(array({src}), __nt -> "
        f"transform(sequence(1, greatest(1, length(__nt) - {k - 1})), "
        f"i -> substring(__nt, i, {k})))[0]"
    )


def signature_sql(
    content_col: str, *, n_hashes: int = 32, k: int = 5, normalize: bool = True
) -> str:
    """The whole MinHash signature as ONE scalar expression:
    array<bigint> of length n_hashes. xxhash64(s, j) hashes the PAIR
    (shingle, hash-index) exactly like minhash_signatures' per-seed
    columns, so signatures agree bit-for-bit with the batch path.

    LET-BINDING VIA SINGLE-ELEMENT transform (the load-bearing shape):
    Spark performs no common-subexpression elimination INSIDE lambda
    bodies, so naively nesting the shingle expression under the per-hash
    transform would re-run normalization + shingling n_hashes times per
    row (and the normalization regexes once per SHINGLE per hash — O(n
    x len) regex passes). `transform(array(x), v -> body)[0]` evaluates
    `x` exactly once and binds it as `v`, a poor man's LET: the
    normalized text and the shingle array are each materialized once per
    row, then the n_hashes min-scans run over the bound array."""
    sh = shingles_sql(content_col, k=k, normalize=normalize)
    return (
        f"transform(array({sh}), __sh -> "
        f"transform(sequence(0, {n_hashes - 1}), "
        f"j -> array_min(transform(__sh, s -> xxhash64(s, j)))))[0]"
    )


def derive_simindex(
    spark: SparkSession,
    src: LaketteTable,
    dst_root: str,
    *,
    content_col: str = "content",
    n_hashes: int = 32,
    k: int = 5,
    normalize: bool = True,
    predicate: Column | str | None = None,
    derive_id: str = "simindex",
    mode: str = "cow",
) -> DeriveReport:
    """Bring the signature silver at `dst_root` up to the source's
    current version — safe after every ingest epoch (a run_ingest
    `derived=` hook), exactly-once under `derive_id`. The silver's rows
    are (key cols..., sig) and inherit the source's tombstones: a
    deleted document leaves the index in the same span that removed
    it."""
    return derive(
        spark,
        src,
        dst_root,
        {"sig": signature_sql(content_col, n_hashes=n_hashes, k=k, normalize=normalize)},
        predicate=predicate,
        derive_id=derive_id,
        mode=mode,
    )


def _sig_len(snap: DataFrame) -> int | None:
    row = snap.select(F.size("sig").alias("n")).limit(1).collect()
    return row[0].n if row else None


def _check_bands(n_hashes: int, bands: int) -> int:
    if n_hashes % bands != 0:
        raise ValueError(
            f"bands must divide the signature length (got n_hashes={n_hashes}, "
            f"bands={bands}) — a non-divisor silently drops trailing hashes "
            "and changes the recall curve (same guard as minhash_lsh_pairs)"
        )
    return n_hashes // bands


def _empty_pairs(spark: SparkSession, keys: list[str]) -> DataFrame:
    empty = ", ".join(
        [f"CAST(NULL AS STRING) {c}_a" for c in keys]
        + [f"CAST(NULL AS STRING) {c}_b" for c in keys]
        + ["CAST(NULL AS DOUBLE) est_jaccard"]
    )
    return spark.sql(f"SELECT {empty}").limit(0)


def _banded(df: DataFrame, keys: list[str], bands: int, rows_per_band: int) -> DataFrame:
    """(_id, sig, band, bsig) — one row per (doc, band): each band's slice
    of the stored signature hashed to its bucket, a map-side projection."""
    doc = df.select(
        F.concat_ws("\x1f", *[F.col(c) for c in keys]).alias("_id"), "sig"
    )
    return doc.select(
        "_id",
        "sig",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> xxhash64(concat_ws(',', slice(sig, b * {rows_per_band} + 1, "
                f"{rows_per_band})), b))"
            )
        ).alias("band", "bsig"),
    )


def _oversized(banded: DataFrame, max_bucket: int) -> DataFrame:
    """(band, bsig) buckets holding more than max_bucket index rows."""
    return (
        banded.groupBy("band", "bsig")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_bucket)
        .select("band", "bsig")
    )


def _cap(banded: DataFrame, oversized: DataFrame | None) -> DataFrame:
    if oversized is None:
        return banded
    return banded.join(F.broadcast(oversized), ["band", "bsig"], "left_anti")


def _estimate_pairs(
    cand: DataFrame, keys: list[str], n_hashes: int, threshold: float
) -> DataFrame:
    est = cand.withColumn(
        "est_jaccard",
        F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), m -> m))")
        / F.lit(n_hashes),
    ).filter(F.col("est_jaccard") >= threshold)
    out_cols = []
    for side in ("a", "b"):
        split = F.split(F.col(f"_id_{side}"), "\x1f")
        for i, c in enumerate(keys):
            out_cols.append(split.getItem(i).alias(f"{c}_{side}"))
    return est.select(*out_cols, F.round("est_jaccard", 4).alias("est_jaccard"))


def near_dup_pairs(
    spark: SparkSession,
    index: LaketteTable,
    *,
    bands: int = 8,
    threshold: float = 0.5,
    version: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Banded-LSH near-dup candidates from a signature silver, verified
    by full-signature agreement. Returns one row per unordered pair
    (key_a..., key_b..., est_jaccard >= threshold); pairs colliding in
    several bands are emitted once. Never all-pairs BY STRUCTURE:
    candidates only meet inside a (band, bucket) equi-join, the batch
    LSH's shuffle shape over a pre-paid index.

    SCALE KNOB — `max_bucket` (same contract as shingle_jaccard_pairs'
    max_shingle_df): a (band, bucket) group of d rows contributes O(d^2)
    candidate pairs, and corpora with BOILERPLATE shared across most
    documents (headers, templates, license banners) collapse many
    signature components to corpus-wide constants — a handful of
    near-universal buckets then turns the equi-join quadratic. Pass
    max_bucket (e.g. 1000) to drop buckets above that size from the
    candidate join. Recall caveat, stated not hidden: members of a
    dropped bucket lose that band's collision chance; in particular an
    EXACT-duplicate group larger than max_bucket collides only in capped
    buckets and disappears from this query entirely — giant exact groups
    are derive_dedup's job (hash group-by, no candidate explosion), LSH
    is for NEAR duplicates. Default None keeps exact LSH semantics (the
    oracle query relies on guaranteed collisions)."""
    snap = index.snapshot(spark, version=version)
    keys = index.key_cols()
    n_hashes = _sig_len(snap)
    if n_hashes is None:
        return _empty_pairs(spark, keys)
    rows_per_band = _check_bands(n_hashes, bands)
    banded = _banded(snap, keys, bands, rows_per_band)
    if max_bucket is not None:
        banded = _cap(banded, _oversized(banded, max_bucket))
    a = banded.select(
        F.col("_id").alias("_id_a"), F.col("sig").alias("sig_a"), "band", "bsig"
    )
    b = banded.select(
        F.col("_id").alias("_id_b"), F.col("sig").alias("sig_b"), "band", "bsig"
    )
    cand = (
        a.join(b, ["band", "bsig"])
        .filter(F.col("_id_a") < F.col("_id_b"))
        .select("_id_a", "_id_b", "sig_a", "sig_b")
        .dropDuplicates(["_id_a", "_id_b"])
    )
    return _estimate_pairs(cand, keys, n_hashes, threshold)


def near_dup_pairs_since(
    spark: SparkSession,
    index: LaketteTable,
    since_version: int,
    *,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """The per-epoch novelty query — near-dup pairs INVOLVING a document
    whose signature changed since `since_version` (inserted or updated in
    the span; deleted rows left the index already). This is the query an
    ingest loop actually asks after every epoch ("what did this batch
    duplicate?"), and its cost follows the CHANGED set, not the corpus:
    the changed side is read bucket-pruned from the index's own
    changefeed (snapshot_diff), banded map-side, BROADCAST (changed <<
    index), and hash-joined against the banded full index — the full
    index is scanned once, exchanged never. Pairs between two unchanged
    documents are by definition already known to the consumer (they were
    emitted when one of them last changed), so they are not re-emitted.
    Pair columns are normalized (a < b by concatenated key) exactly like
    near_dup_pairs, so incremental consumers can union/dedupe spans."""
    from .changes import snapshot_diff

    head = int(index.current_metadata()["version"])
    if since_version > head:
        raise ValueError(f"since_version {since_version} is ahead of head {head}")
    keys = index.key_cols()
    snap = index.snapshot(spark)
    n_hashes = _sig_len(snap)
    if n_hashes is None or since_version == head:
        return _empty_pairs(spark, keys)
    rows_per_band = _check_bands(n_hashes, bands)
    changed = (
        snapshot_diff(spark, index, since_version, head, full_rows=True)
        .filter(F.col("change") != "delete")
        .select(*keys, "sig")
    )
    c_banded = _banded(changed, keys, bands, rows_per_band)
    full_banded = _banded(snap, keys, bands, rows_per_band)
    if max_bucket is not None:
        # bucket size is defined by the INDEX side (the boilerplate-collapse
        # guard, see near_dup_pairs) and applied to both sides
        over = _oversized(full_banded, max_bucket)
        c_banded = _cap(c_banded, over)
        full_banded = _cap(full_banded, over)
    c = c_banded.select(
        F.col("_id").alias("_id_a"), F.col("sig").alias("sig_a"), "band", "bsig"
    )
    full = full_banded.select(
        F.col("_id").alias("_id_b"), F.col("sig").alias("sig_b"), "band", "bsig"
    )
    cand = (
        full.join(F.broadcast(c), ["band", "bsig"])
        .filter(F.col("_id_a") != F.col("_id_b"))
        # normalize unordered pairs: both-changed pairs arrive twice
        .select(
            F.least("_id_a", "_id_b").alias("_id_a"),
            F.greatest("_id_a", "_id_b").alias("_id_b"),
            F.when(F.col("_id_a") < F.col("_id_b"), F.col("sig_a"))
            .otherwise(F.col("sig_b")).alias("sig_a"),
            F.when(F.col("_id_a") < F.col("_id_b"), F.col("sig_b"))
            .otherwise(F.col("sig_a")).alias("sig_b"),
        )
        .dropDuplicates(["_id_a", "_id_b"])
    )
    return _estimate_pairs(cand, keys, n_hashes, threshold)
