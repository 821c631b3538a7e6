"""Training-data pipeline harness: dedup family, similarity search, text
analysis, multimodal plumbing — over the documents/embeddings tables.

Thresholds are calibrated against the seed-fixed testdata so the operators
return non-trivial results at sf0.01 (the synthetic corpus has no true
near-dups; thresholds sit just inside the observed similarity tail).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from forklift_spark.operators import dedup as dd
from forklift_spark.operators import multimodal as mm
from forklift_spark.operators import similarity as sim
from forklift_spark.operators.text import fingerprint, lang_id, quality_score, token_stats

from .queries import q, t

# ------------------------------------------------------------------- dedup

#: documents plus deterministic planted near-duplicates (suffix mutation) —
#: the synthetic corpus has no natural near-dups, so the dedup operators are
#: exercised against known-similar pairs (id + 1000000 marks the mutant)
_DUP_CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' zzz aaa qqq' FROM documents WHERE doc_id % 7 = 0
)
"""

_SHINGLE_IDX_SQL = (
    "WITH "
    + _DUP_CORPUS_SQL
    + r""",
w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM corpus),
sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       FROM (SELECT doc_id, ws, unnest(generate_series(1, greatest(1, len(ws) - 2))) AS i
             FROM w)),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b, round(inter * 1.0 / (x.n + y.n - inter), 4) AS jaccard
FROM pairs JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
WHERE inter * 1.0 / (x.n + y.n - inter) >= 0.8
"""
)


def _dup_corpus(spark, sf):
    d = t(spark, sf, "documents").select("doc_id", "text")
    mutants = (
        d.filter(F.col("doc_id") % 7 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzz aaa qqq")).alias("text"),
        )
    )
    return d.unionByName(mutants)


@q(
    "dedup_exact",
    "WITH " + _DUP_CORPUS_SQL.replace("text || ' zzz aaa qqq'", "text")
    + "SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies "
      "FROM corpus GROUP BY text",
)
def dedup_exact(spark, sf):
    """Exact dedup over a corpus with planted EXACT duplicates (the mutants
    here copy the text verbatim), so n_copies=2 groups exist."""
    d = t(spark, sf, "documents").select("doc_id", "text")
    dups = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return dd.exact_dedup(d.unionByName(dups), "text", "doc_id")


#: normalization -> exact dedup: the planted variants differ ONLY by case+
#: punctuation (collapse with their base doc) or by trailing numbers
#: (collapse with each other under digits->0), so every normalization rule
#: is what makes its group form — raw hashing would see 4 distinct texts
_NORM_DEDUP_SQL = r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, upper(text) || '!!' FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 3000000, text || ' 42' FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 4000000, text || ' 97,' FROM documents WHERE doc_id % 5 = 0
),
norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[0-9]', '0', 'g'),
                             '[^a-z0-9]+', ' ', 'g')) AS nt
  FROM corpus
)
SELECT md5(nt) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
FROM norm GROUP BY nt"""


@q("dedup_exact_norm", _NORM_DEDUP_SQL, extra=True)
def dedup_exact_norm(spark, sf):
    """CCNet-style normalized exact dedup: normalize_expr (lowercase,
    digits->0, punct runs->space — zero exchanges) feeds exact_dedup's
    digest-only aggregate. The planted case/punct variants collapse with
    their base docs and the two number variants collapse with each other;
    the DuckDB oracle replays the identical three regex steps."""
    from forklift_spark.operators.text import text_normalized

    d = t(spark, sf, "documents").select("doc_id", "text")
    f = d.filter(F.col("doc_id") % 5 == 0)
    variants = [
        f.select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.upper("text"), F.lit("!!")).alias("text"),
        ),
        f.select(
            (F.col("doc_id") + 3000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" 42")).alias("text"),
        ),
        f.select(
            (F.col("doc_id") + 4000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" 97,")).alias("text"),
        ),
    ]
    corpus = d
    for v in variants:
        corpus = corpus.unionByName(v)
    n = text_normalized(corpus, "text", "doc_id")
    return dd.exact_dedup(n, "norm_text", "doc_id")


@q("dedup_ngram_jaccard", _SHINGLE_IDX_SQL)
def dedup_ngram_jaccard(spark, sf):
    """Exact word-trigram Jaccard near-dup pairs via shingle inverted index
    (word shingles keep the index sparse => join stays ~linear)."""
    return dd.shingle_jaccard_pairs(
        _dup_corpus(spark, sf), "text", "doc_id",
        threshold=0.8, shingle_kind="word", ngram_n=3,
    )


@q("dedup_minhash_lsh")  # rows-only: LSH recall is probabilistic by design
def dedup_minhash_lsh(spark, sf):
    """MinHash(32) + 8-band LSH candidates, exact-Jaccard verified >= 0.8."""
    return dd.minhash_lsh_pairs(
        _dup_corpus(spark, sf), "text", "doc_id",
        n_hashes=32, bands=8, threshold=0.8, shingle_kind="word", ngram_n=3,
    )


@q("dedup_simhash")  # rows-only: simhash is hash-family specific
def dedup_simhash(spark, sf):
    return dd.simhash_pairs(_dup_corpus(spark, sf), "text", "doc_id", max_hamming=8)


@q(
    "dedup_embed_cosine",
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4) AS cos
       FROM embeddings a JOIN embeddings b
         ON a.vec_id < b.vec_id AND a.label = b.label
       WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) >= 0.4""",
)
def dedup_embed_cosine(spark, sf):
    """Embedding near-dup pairs, blocked by label (the blocking column keeps
    the self-join off the all-pairs path)."""
    return sim.cosine_pairs(
        t(spark, sf, "embeddings"), "embedding", "vec_id", threshold=0.4, block_col="label"
    )


# extra (the driver gate is capped at 50 entries); rows-only: LSH
# candidate recall is probabilistic by design
@q("embedding_dup_pairs_lsh", extra=True)
def embedding_dup_pairs_lsh(spark, sf):
    """Corpus-scale near-dup pairs WITHOUT a label column (VERDICT r3 #7):
    lsh_buckets_arrow signatures feed cosine_pairs as the blocking column,
    exact-cosine verified — measured recall >=0.9 vs the exact blocked
    baseline in tests/test_round4.py."""
    emb = t(spark, sf, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    return sim.embedding_dup_pairs_lsh(
        emb, "embedding", "vec_id", threshold=0.4, dim=dim, bits=8, n_tables=6
    )


# ------------------------------------------ sampling / packing (extras)

from forklift_spark.operators.sampling import (
    cap_per_group_sql,
    sample_hash_sql,
    shuffle_shards_sql,
)

#: the oracle runs the engine's EXACT overflow-safe modular-multiply hash
#: (sample_hash_sql is the Column expression's SQL twin — ADVICE r4 #2)
_SAMPLE_SQL = f"""
SELECT doc_id, lang FROM documents
WHERE {sample_hash_sql('doc_id')} <
      CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 2500 ELSE 1000 END
"""


@q("sample_stratified", _SAMPLE_SQL, extra=True)
def sample_stratified(spark, sf):
    """Deterministic per-stratum Bernoulli sampling (training-data mix
    control): keep 50% of English, 25% of Chinese, 10% of the rest — the
    keep/drop decision is pure integer arithmetic on doc_id, so the DuckDB
    oracle runs the SAME expression and must select the SAME rows. Map-only
    (no exchange; plan-guarded in tests)."""
    from forklift_spark.operators import sampling as sp

    return sp.sample_stratified(
        t(spark, sf, "documents"), "lang", "doc_id",
        rates={"en": 0.5, "zh": 0.25}, default_rate=0.1,
    ).select("doc_id", "lang")


#: the oracle replays the identical mix/shard/rank expressions — any
#: engine reproduces the SAME global training order
_SHUF_SHARD, _SHUF_KEY, _SHUF_OVER = shuffle_shards_sql("doc_id", 8, salt=7)
_SHUFFLE_SQL = f"""
SELECT doc_id, {_SHUF_SHARD} AS shard, {_SHUF_KEY} AS sort_key,
       row_number() OVER ({_SHUF_OVER}) - 1 AS pos
FROM documents
"""


#: the oracle replays the identical hash-ranked keep decision via QUALIFY
#: (k=10 BINDS at sf0.01's 25 docs/source: 500 docs -> 200 survivors)
_CAP_SQL = f"""
SELECT doc_id, source FROM documents
QUALIFY {cap_per_group_sql('source', 'doc_id', 10, salt=3)}
"""


@q("cap_per_domain", _CAP_SQL, extra=True)
def cap_per_domain(spark, sf):
    """Deterministic per-domain cap (anti-spam / domain balance, the
    C4/RefinedWeb host-cap step): at most 10 docs per source, survivors a
    pure function of (ids, source, k, salt) — the DuckDB oracle replays
    the same hash-ranked QUALIFY and must keep the same rows."""
    from forklift_spark.operators import sampling as sp

    return sp.cap_per_group(
        t(spark, sf, "documents").select("doc_id", "source"),
        "source", "doc_id", k=10, salt=3,
    )


#: length-bucketed packing: docs classed by integer token-length classes
#: (<16 / <64 / <256 / rest — integer thresholds, never float log2, so
#: every engine agrees exactly), then packed per (source, class)
_LENBUCKET_SQL = r"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
), classed AS (
  SELECT doc_id, n_tokens,
         source || '#' || CASE WHEN n_tokens < 16 THEN 0
                               WHEN n_tokens < 64 THEN 1
                               WHEN n_tokens < 256 THEN 2
                               ELSE 3 END AS pack_group
  FROM toks
), cum AS (
  SELECT pack_group, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS s
  FROM classed
)
SELECT pack_group, doc_id, n_tokens,
       CAST(floor(s / 256) AS BIGINT) AS chunk_id,
       CAST(s % 256 AS BIGINT) AS chunk_offset
FROM cum"""


@q("pipeline_lenbucket_pack", _LENBUCKET_SQL, extra=True)
def pipeline_lenbucket_pack(spark, sf):
    """Sequence-length-bucketed packing — the padding-efficiency step:
    docs are classed into integer token-length classes (comparisons on
    exact integers, never float log2, so any engine reproduces the same
    classes), then packed into 256-token sequences per (source, class);
    same-length-class sequences batch with minimal padding waste. One
    exchange (the packing window's composed group key)."""
    from forklift_spark.operators import sampling as sp
    from forklift_spark.operators.text import token_stats

    toks = token_stats(
        t(spark, sf, "documents"), "text", "doc_id", keep_cols=["source"]
    )
    cls = (
        F.when(F.col("n_ws_tokens") < 16, F.lit(0))
        .when(F.col("n_ws_tokens") < 64, F.lit(1))
        .when(F.col("n_ws_tokens") < 256, F.lit(2))
        .otherwise(F.lit(3))
    )
    classed = toks.select(
        "doc_id",
        F.col("n_ws_tokens").cast("long").alias("n_tokens"),
        F.concat(F.col("source"), F.lit("#"), cls.cast("string")).alias("pack_group"),
    )
    return sp.pack_concat_chunks(
        classed, "doc_id", "n_tokens", max_tokens=256, group_col="pack_group"
    )


@q("corpus_shuffle", _SHUFFLE_SQL, extra=True)
def corpus_shuffle(spark, sf):
    """Deterministic corpus shuffle + sharding (training reproducibility):
    every doc gets an engine/partitioning/cluster-size-invariant
    (shard, pos) — shard-major, pos-minor IS the shuffled training order,
    and a salt change is an epoch reshuffle. One exchange (the per-shard
    rank window); the DuckDB oracle replays the same expressions."""
    from forklift_spark.operators import sampling as sp

    return sp.shuffle_shards(
        t(spark, sf, "documents").select("doc_id"), "doc_id", n_shards=8, salt=7
    )


_PACK_SQL = r"""
WITH toks AS (
  SELECT source AS pack_group, doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
), cum AS (
  SELECT pack_group, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS s
  FROM toks
)
SELECT pack_group, doc_id, n_tokens,
       CAST(floor(s / 2048) AS BIGINT) AS chunk_id,
       CAST(s % 2048 AS BIGINT) AS chunk_offset
FROM cum
"""


@q("pack_chunks", _PACK_SQL, extra=True)
def pack_chunks(spark, sf):
    """GPT-style sequence packing (concat-and-chunk at a 2048-token
    budget, whitespace tokens, packed per source shard): one window
    cumulative sum, fully SQL-expressible — the oracle checks chunk ids
    and offsets row-for-row."""
    from forklift_spark.operators import sampling as sp

    d = t(spark, sf, "documents").withColumn(
        "n_tok", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    return sp.pack_concat_chunks(
        d, "doc_id", "n_tok", max_tokens=2048, group_col="source"
    )


#: sampling -> oracle-checked token counts -> packing, as ONE pipeline
#: (VERDICT r4 #8) — each stage's expression identical on both engines
_PIPELINE_PACK_SQL = r"""
WITH sampled AS (
  SELECT doc_id, source, text FROM documents
  WHERE {hash} <
        CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 2500 ELSE 1000 END
), toks AS (
  SELECT source AS pack_group, doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM sampled
), cum AS (
  SELECT pack_group, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS s
  FROM toks
)
SELECT pack_group, doc_id, n_tokens,
       CAST(floor(s / 1024) AS BIGINT) AS chunk_id,
       CAST(s % 1024 AS BIGINT) AS chunk_offset
FROM cum
""".format(hash=sample_hash_sql("doc_id"))


@q("pipeline_pack", _PIPELINE_PACK_SQL, extra=True)
def pipeline_pack(spark, sf):
    """The training-data pipeline composed end-to-end (VERDICT r4 #8):
    deterministic stratified sampling (map-only hash filter) -> the
    oracle-checked whitespace token counts (token_stats, carrying the
    packing group through — no re-join) -> GPT-style concat-and-chunk
    packing at a 1024-token budget per source shard. One exchange total
    (the packing window's group key); the oracle replays every stage's
    exact expression in SQL."""
    from forklift_spark.operators import sampling as sp

    sampled = sp.sample_stratified(
        t(spark, sf, "documents"), "lang", "doc_id",
        rates={"en": 0.5, "zh": 0.25}, default_rate=0.1,
    )
    toks = token_stats(sampled, "text", "doc_id", keep_cols=["source"])
    return sp.pack_concat_chunks(
        toks.select("doc_id", "source", F.col("n_ws_tokens").alias("n_tok")),
        "doc_id", "n_tok", max_tokens=1024, group_col="source",
    )


#: chunking -> packing composed: 24/6 token windows per doc, then the
#: chunk stream packed into 256-token training sequences per source shard
_PIPELINE_CHUNK_PACK_SQL = r"""
WITH toks AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
),
meta AS (
  SELECT doc_id, source, t,
         CASE WHEN len(t) <= 24 THEN 1
              ELSE CAST(ceil((len(t) - 24) * 1.0 / 18) AS BIGINT) + 1 END AS nc
  FROM toks
),
chunks AS (
  SELECT m.doc_id * 100000 + g.i AS chunk_uid,
         m.source,
         CAST(len(m.t[g.i*18 + 1 : g.i*18 + 24]) AS BIGINT) AS n_tokens
  FROM meta m, UNNEST(generate_series(0, m.nc - 1)) AS g(i)
),
cum AS (
  SELECT source AS pack_group, chunk_uid, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY chunk_uid
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS s
  FROM chunks
)
SELECT pack_group, chunk_uid, n_tokens,
       CAST(floor(s / 256) AS BIGINT) AS chunk_id,
       CAST(s % 256 AS BIGINT) AS chunk_offset
FROM cum"""


@q("pipeline_chunk_pack", _PIPELINE_CHUNK_PACK_SQL, extra=True)
def pipeline_chunk_pack(spark, sf):
    """Chunk -> pack composed as ONE plan: every document split into 24/6
    overlapping token windows (text_chunks, zero-exchange explode in the
    scan stage), each chunk given a deterministic uid, then the chunk
    stream packed into 256-token training sequences per source shard
    (pack_concat_chunks, ONE exchange total — the packing window's group
    key). The oracle replays both stages' exact expressions in SQL."""
    from forklift_spark.operators import sampling as sp
    from forklift_spark.operators.text import text_chunks

    chunks = text_chunks(
        t(spark, sf, "documents"), "text", "doc_id",
        chunk_tokens=24, overlap=6, keep_cols=["source"],
    )
    stream = chunks.select(
        (F.col("doc_id").cast("long") * 100000 + F.col("chunk_id")).alias("chunk_uid"),
        "source",
        F.col("n_tokens").cast("long").alias("n_tok"),
    )
    return sp.pack_concat_chunks(
        stream, "chunk_uid", "n_tok", max_tokens=256, group_col="source"
    )


@q("pack_greedy", extra=True)  # rows-only: first-fit is not SQL-expressible
def pack_greedy(spark, sf):
    """No-split packing: whole documents first-fit into 2048-token bins
    per source shard (applyInPandas sequential scan per group; invariants
    — budget respected, deterministic — asserted in tests)."""
    from forklift_spark.operators import sampling as sp

    d = t(spark, sf, "documents").withColumn(
        "n_tok", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    return sp.pack_greedy(d, "doc_id", "n_tok", max_tokens=2048, group_col="source")


# -------------------------------------------------------------- similarity


@q(
    "ann_cosine_topk",
    """WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0)
       SELECT vec_id,
              round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT v FROM qv)), 4)
                AS cos
       FROM embeddings
       ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT v FROM qv)) DESC,
                vec_id
       LIMIT 10""",
)
def ann_cosine_topk(spark, sf):
    """Brute-force exact cosine top-k (the correctness baseline for ANN).

    r6: the query vector rides the plan as a broadcast 1-row join instead
    of a driver .first() round trip — one Spark job instead of two; the
    float->double cast is exact, so scores (and the rounded output) are
    bit-identical to the literal-vector form."""
    emb = t(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_q"))
    scored = emb.join(F.broadcast(q)).select(
        "vec_id", sim.cosine(F.col("embedding"), F.col("_q")).alias("cos")
    )
    return (
        scored.orderBy(F.desc("cos"), "vec_id")
        .limit(10)
        .select("vec_id", F.round("cos", 4).alias("cos"))
    )


@q("ann_lsh")  # rows-only: ANN recall is approximate by design
def ann_lsh(spark, sf):
    """Random-hyperplane LSH ANN (the scale path; re-ranked exactly)."""
    emb = t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return sim.lsh_topk(emb, "embedding", "vec_id", qvec, k=10, bits=6, n_tables=4)


# extra (driver gate capped at 50); rows-only: k-means lists are
# hash-family/init specific by design
@q("ann_ivf", extra=True)
def ann_ivf(spark, sf):
    """IVF ANN against a PERSISTED index (VERDICT r4 #2): k-means inverted
    lists are trained + materialized as a parquet partition column ONCE
    (ivf_build, reused across calls); the query itself does ZERO model
    fits — centroid scoring on the driver, partition-pruned candidate
    read, exact re-rank. Measured recall vs brute force in tests."""
    import os
    import tempfile

    emb = t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    root = os.path.join(tempfile.gettempdir(), f"fk_ivf_{os.path.basename(sf)}")
    if not os.path.exists(os.path.join(root, "centroids.json")):
        sim.ivf_build(spark, emb, "embedding", "vec_id", root, n_lists=8)
    return sim.ivf_query(spark, root, qvec, k=10, n_probe=3)


# ------------------------------------------------------------ text analysis


@q(
    "text_tokens",
    r"""SELECT doc_id,
              len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
              len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_alnum_tokens,
              length(text) AS len_chars
       FROM documents""",
)
def text_tokens(spark, sf):
    return token_stats(t(spark, sf, "documents"), "text", "doc_id")


#: chunking at chunk_tokens=24 / overlap=6 (stride 18): chunk i covers
#: tokens [i*18+1, i*18+24] (1-based inclusive slices in both engines);
#: the last chunk is the first containing the final token
_CHUNK_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
),
meta AS (
  SELECT doc_id, t,
         CASE WHEN len(t) <= 24 THEN 1
              ELSE CAST(ceil((len(t) - 24) * 1.0 / 18) AS BIGINT) + 1 END AS nc
  FROM toks
)
SELECT m.doc_id,
       g.i AS chunk_id,
       len(m.t[g.i*18 + 1 : g.i*18 + 24]) AS n_tokens,
       array_to_string(m.t[g.i*18 + 1 : g.i*18 + 24], ' ') AS chunk_text
FROM meta m, UNNEST(generate_series(0, m.nc - 1)) AS g(i)"""


@q("text_chunk", _CHUNK_SQL, extra=True)
def text_chunk(spark, sf):
    """Training/RAG chunking (operators/text.py text_chunks): fixed 24-token
    windows with 6-token overlap over every document — split + sequence +
    slice + explode entirely inside the scan's codegen stage (zero
    exchanges), matching DuckDB's generate_series + list-slicing
    recomputation token-for-token including the short-doc single-chunk and
    final-partial-chunk boundaries."""
    from forklift_spark.operators.text import text_chunks

    out = text_chunks(
        t(spark, sf, "documents"), "text", "doc_id", chunk_tokens=24, overlap=6
    )
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "chunk_text",
    )


_QUALITY_SQL = r"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
         CAST(floor((length(' ' || text || ' ')
               - length(replace(' ' || text || ' ', ' the ', ''))) / 5) AS BIGINT)
         + CAST(floor((length(' ' || text || ' ')
               - length(replace(' ' || text || ' ', ' a ', ''))) / 3) AS BIGINT) AS stop_hits
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(floor(n_chars * 10000 / n_tokens) AS BIGINT) AS avg_tok_len_e4,
       CAST(floor(n_punct * 1000000 / n_chars) AS BIGINT) AS punct_ratio_e6,
       CAST(floor(stop_hits * 1000000 / n_tokens) AS BIGINT) AS stop_ratio_e6,
       CAST(floor((
         least(CAST(1.0 AS DOUBLE), n_tokens / CAST(64.0 AS DOUBLE)) * 0.5
         + least(CAST(1.0 AS DOUBLE), stop_hits / CAST(4.0 AS DOUBLE)) * 0.3
         + (1 - least(CAST(1.0 AS DOUBLE), (n_punct / n_chars) * 10)) * 0.2
       ) * 1000000) AS BIGINT) AS quality_e6
FROM base"""


@q("text_quality", _QUALITY_SQL)
def text_quality(spark, sf):
    return quality_score(t(spark, sf, "documents"), "text", "doc_id")


def _hits_sql(words: list[str]) -> str:
    terms = [
        f"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' {w} ', '')))"
        f" / {len(w) + 2} AS BIGINT)"
        for w in words
    ]
    return " + ".join(terms)


_LANGID_SQL = None  # assembled below from the same marker lists the engine uses


def _build_langid_sql():
    from forklift_spark.operators.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    score_cols = ",\n".join(
        f"  {_hits_sql(LANG_MARKERS[lang])} AS score_{lang}" for lang in langs
    )
    greatest = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lang} = {greatest} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""WITH s AS (SELECT doc_id,\n{score_cols}\nFROM documents)
SELECT doc_id, {', '.join('score_' + lang for lang in langs)}, {case} AS pred_lang FROM s"""


@q("text_langid", _build_langid_sql())
def text_langid(spark, sf):
    return lang_id(t(spark, sf, "documents"), "text", "doc_id")


@q(
    "text_fingerprint",
    """WITH idx AS (SELECT unnest(generate_series(1, (SELECT max(length(text)) FROM documents))) AS i)
       SELECT d.doc_id, min(md5(substr(d.text, idx.i, 8))) AS fingerprint
       FROM documents d JOIN idx ON idx.i <= greatest(1, length(d.text) - 7)
       GROUP BY d.doc_id""",
)
def text_fingerprint(spark, sf):
    return fingerprint(t(spark, sf, "documents"), "text", "doc_id", k=8)


# -------------------------------------------------------------- multimodal


# extra; rows-only: synthetic media, stubbed frame decode (no codec libs)
@q("mm_frames", extra=True)
def mm_frames(spark, sf):
    """Video frame sampling 1->N fan-out (mapInPandas, partition-
    preserving, fan-out bounded per row) — kernel stubbed, plumbing real."""
    import forklift_spark.operators.multimodal as mm

    media = mm.synth_media(spark, n=96)
    return mm.sample_frames(media, every_ms=1000, max_frames=16)


@q("mm_features")  # rows-only: synthetic media, stubbed decode (no codec libs)
def mm_features(spark, sf):
    """Binary-column plumbing: synthetic media table -> mapInPandas feature
    extraction (real schema/batching; decode dims stubbed deterministically)."""
    media = mm.synth_media(spark, n=96)
    return mm.extract_media_features(media)


# ------------------------------------------------------------ PII redaction

_PII_SQL = r"""
WITH pii AS (
  SELECT doc_id,
         text || ' contact: user' || doc_id::VARCHAR || '@example.com via 10.0.'
              || (doc_id % 256)::VARCHAR || '.1 call 555-867-5309' AS text
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
  len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ipv4,
  len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b'))::BIGINT AS n_phone,
  regexp_replace(regexp_replace(regexp_replace(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g'),
      '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
FROM pii
"""


@q("text_pii_redact", _PII_SQL, extra=True)
def text_pii_redact(spark, sf):
    """Training-data PII scrub (operators/text.py pii_redact): documents get
    deterministic synthetic PII appended (email + IPv4 + phone), then the
    engine's pure-codegen regexp redaction must match DuckDB's RE2 replay
    exactly — counts and redacted text both (the patterns are restricted to
    the Java-regex/RE2 common subset on purpose)."""
    from forklift_spark.operators.text import pii_redact

    d = t(spark, sf, "documents")
    pii = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact: user"), F.col("doc_id").cast("string"),
            F.lit("@example.com via 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1 call 555-867-5309"),
        ).alias("text"),
    )
    return pii_redact(pii, "text", "doc_id")


# ------------------------------------------------- data-quality expectations

#: ingest-gate rule set over documents, calibrated so every action fires
#: (or provably doesn't) at sf0.01: chars_consistent holds everywhere
#: (fail never aborts), lang_allowed quarantines zh/es, len_floor drops
#: the sub-60-char tail, min_len200 only annotates
_DQ_RULES = None  # built lazily — Expectation import stays module-local


def _dq_rules():
    global _DQ_RULES
    if _DQ_RULES is None:
        from forklift_spark.operators.expectations import Expectation

        _DQ_RULES = [
            Expectation("chars_consistent", "n_chars = length(text)", "fail"),
            Expectation("lang_allowed", "lang IN ('en','de','fr')", "quarantine"),
            Expectation("len_floor", "n_chars >= 60", "drop"),
            Expectation("min_len200", "n_chars >= 200", "warn"),
        ]
    return _DQ_RULES


_DQ_SQL = """
WITH flags AS (
  SELECT doc_id,
    (NOT coalesce(n_chars = length(text), false)) AS v_chars,
    (NOT coalesce(lang IN ('en','de','fr'), false)) AS v_lang,
    (NOT coalesce(n_chars >= 60, false)) AS v_len
  FROM documents)
SELECT doc_id, 'good' AS dq_route, '' AS dq_violations
FROM flags WHERE NOT v_chars AND NOT v_lang AND NOT v_len
UNION ALL
SELECT doc_id, 'quarantine' AS dq_route,
  concat_ws(',',
    CASE WHEN v_chars THEN 'chars_consistent' END,
    CASE WHEN v_lang THEN 'lang_allowed' END) AS dq_violations
FROM flags WHERE v_chars OR v_lang
"""


@q("dq_split", _DQ_SQL, extra=True)
def dq_split(spark, sf):
    """Data-quality expectations gate (operators/expectations.py): split()
    routes documents into good / quarantined under a four-rule spec with
    every action represented. Rows failing only the drop rule appear on
    NEITHER side; warn violations stay on the good path; quarantine tags
    are the sorted violated-rule names. Pure codegen — the oracle replays
    the identical three-valued-logic semantics in ANSI SQL."""
    from forklift_spark.operators import expectations as xp

    good, bad = xp.split(t(spark, sf, "documents"), _dq_rules())
    return good.select(
        "doc_id",
        F.lit("good").alias("dq_route"),
        F.lit("").alias("dq_violations"),
    ).unionAll(
        bad.select(
            "doc_id",
            F.lit("quarantine").alias("dq_route"),
            F.array_join("dq_violations", ",").alias("dq_violations"),
        )
    )


# ------------------------------------------------------ decontamination

#: benchmark = every 97th doc; training corpus = documents (the benchmark
#: docs themselves are self-leaks) + planted FULL leaks (verbatim benchmark
#: text with a mutated tail -> coverage 10^6) + planted PARTIAL leaks
#: (first 20 words only -> coverage strictly between 0 and 10^6)
_DECON_SQL = r"""
WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 13),
train AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 5000000, text || ' ztail zmut zq' FROM bench
  UNION ALL
  SELECT doc_id + 6000000,
         array_to_string(regexp_split_to_array(trim(text), '\s+')[1:20], ' ')
           || ' znew zwords zhere'
  FROM bench
),
tw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM train),
tg AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS g
       FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i
             FROM tw WHERE len(ws) >= 8)),
bw AS (SELECT doc_id AS bid, regexp_split_to_array(trim(text), '\s+') AS ws
       FROM bench),
bg AS (SELECT DISTINCT bid, array_to_string(ws[i:i+7], ' ') AS g
       FROM (SELECT bid, ws, unnest(generate_series(1, len(ws) - 7)) AS i
             FROM bw WHERE len(ws) >= 8)),
bsz AS (SELECT bid, count(*) AS bn FROM bg GROUP BY bid),
hits AS (SELECT tg.doc_id, bg.bid, bg.g FROM tg JOIN bg USING (g)),
pair AS (SELECT doc_id, bid, count(*) AS shared FROM hits GROUP BY 1, 2),
perdoc AS (SELECT doc_id, count(DISTINCT g) AS n_hit_grams FROM hits GROUP BY 1),
agg AS (SELECT p.doc_id, count(*) AS n_bench_docs,
               max(CAST(floor(p.shared * 1000000.0 / s.bn) AS BIGINT))
                 AS max_bench_frac_e6
        FROM pair p JOIN bsz s USING (bid) GROUP BY 1)
SELECT a.doc_id, d.n_hit_grams, a.n_bench_docs, a.max_bench_frac_e6
FROM agg a JOIN perdoc d USING (doc_id)
"""


@q("decontaminate", _DECON_SQL, extra=True)
def decontaminate_q(spark, sf):
    """Benchmark decontamination (operators/contamination.py): flag every
    training doc sharing a word 8-gram with the held-out benchmark set —
    self-leaks, planted verbatim leaks (coverage 10^6) and planted partial
    leaks (20-word prefix; coverage strictly inside (0, 10^6)) must all
    surface with exact distinct-gram counts and coverage fractions. The
    benchmark gram set is broadcast; the corpus is never shuffled
    (asserted in tests/test_contamination.py)."""
    from forklift_spark.operators.contamination import contamination_report

    d = t(spark, sf, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 97 == 13)
    full = bench.select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" ztail zmut zq")).alias("text"),
    )
    part = bench.select(
        (F.col("doc_id") + 6000000).alias("doc_id"),
        F.concat(
            F.array_join(F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 20), " "),
            F.lit(" znew zwords zhere"),
        ).alias("text"),
    )
    train = d.unionByName(full).unionByName(part)
    return contamination_report(train, bench, "text", "doc_id", n=8)


# --------------------------------------------------- repetition filters

#: corpus with planted repetition: every 13th doc's text is replaced by a
#: 6-word phrase repeated 12 times (boilerplate shape) so all four signals
#: fire; the rest keep their natural (low) repetition
_REPETITION_SQL = r"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 5
              THEN trim(repeat('spam ham boiler plate row noise ', 12))
              ELSE text END AS text
  FROM documents
),
w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM corpus),
g AS (SELECT doc_id, ws,
        CASE WHEN len(ws) >= 2
             THEN list_transform(generate_series(1, len(ws)-1),
                                 i -> ws[i] || ' ' || ws[i+1])
             ELSE [] END AS g2,
        CASE WHEN len(ws) >= 5
             THEN list_transform(generate_series(1, len(ws)-4),
                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                       || ws[i+3] || ' ' || ws[i+4])
             ELSE [] END AS g5
      FROM w),
c AS (SELECT doc_id,
        len(ws) AS n,
        len(list_distinct(ws)) AS nd,
        list_max(list_transform(list_distinct(ws),
                 x -> len(list_filter(ws, y -> y = x)))) AS top,
        coalesce(list_sum(list_transform(
          list_transform(list_distinct(g2), x -> len(list_filter(g2, y -> y = x))),
          c2 -> CASE WHEN c2 >= 2 THEN c2 ELSE 0 END)), 0) AS dup2,
        len(g2) AS n2,
        coalesce(list_sum(list_transform(
          list_transform(list_distinct(g5), x -> len(list_filter(g5, y -> y = x))),
          c5 -> CASE WHEN c5 >= 2 THEN c5 ELSE 0 END)), 0) AS dup5,
        len(g5) AS n5
      FROM g)
SELECT doc_id,
  n AS n_words,
  CAST(floor((n - nd) * 1000000.0 / n) AS BIGINT) AS dup_word_frac_e6,
  CAST(floor(top * 1000000.0 / n) AS BIGINT) AS top_word_frac_e6,
  CASE WHEN n2 > 0 THEN CAST(floor(dup2 * 1000000.0 / n2) AS BIGINT) ELSE 0 END
    AS dup_2gram_frac_e6,
  CASE WHEN n5 > 0 THEN CAST(floor(dup5 * 1000000.0 / n5) AS BIGINT) ELSE 0 END
    AS dup_5gram_frac_e6
FROM c
"""


@q("text_repetition", _REPETITION_SQL, extra=True)
def text_repetition(spark, sf):
    """Gopher/Dolma repetition filters (operators/text.py repetition_stats)
    over the corpus with planted boilerplate docs (a 6-word phrase repeated
    12x on every 13th doc): dup/top word fractions and repeated 2/5-gram
    position fractions, all zero-exchange HOF expressions, bit-exact vs the
    DuckDB list-lambda recomputation."""
    from forklift_spark.operators.text import repetition_stats

    d = t(spark, sf, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 5,
            F.trim(F.repeat(F.lit("spam ham boiler plate row noise "), 12)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return repetition_stats(d, "text", "doc_id")


# --------------------------------------------- mixture sampling to budget

#: src2 is funded far over its supply (all-in path), the others cross
#: their budget mid-domain (boundary-bucket path); unnamed sources drop
_BUDGET_SQL = rf"""
WITH tok AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens
  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src4')
),
b(source, budget) AS (
  VALUES ('src0', 700), ('src1', 400), ('src2', 5000), ('src4', 900)
),
sel AS (
  SELECT t.*, b.budget,
         sum(n_ws_tokens) OVER (
           PARTITION BY t.source
           ORDER BY ({sample_hash_sql('doc_id')}), doc_id
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM tok t JOIN b USING (source)
)
SELECT doc_id, source, n_ws_tokens FROM sel WHERE cum - n_ws_tokens < budget
"""


@q("mixture_budget", _BUDGET_SQL, extra=True)
def mixture_budget(spark, sf):
    """Domain-mixture sampling to exact token budgets
    (operators/sampling.py sample_to_token_budget): deterministic
    hash-ordered selection per domain until the budget is crossed — the
    engine's bucket-decomposed algorithm (boundary bucket resolved alone;
    the corpus never globally sorts) must equal the oracle's
    straightforward whole-domain window cumsum row-for-row."""
    from forklift_spark.operators.sampling import sample_to_token_budget

    d = t(spark, sf, "documents")
    tok = token_stats(d, "text", "doc_id", keep_cols=["source"]).select(
        "doc_id", "source", "n_ws_tokens"
    )
    return sample_to_token_budget(
        tok, "source", "doc_id", "n_ws_tokens",
        {"src0": 700, "src1": 400, "src2": 5000, "src4": 900},
    )


# ------------------------------------------- full corpus-curation pipeline

def _build_pipeline_corpus_sql() -> str:
    """The whole curation pipeline in one DuckDB query, assembled from the
    per-operator oracle fragments already proven above: quality +
    repetition gates, language id, benchmark decontamination, then
    token-budget mixture sampling."""
    from forklift_spark.operators.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    scores = ",\n".join(
        f"    {_hits_sql(LANG_MARKERS[lang])} AS score_{lang}" for lang in langs
    )
    greatest = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lang} = {greatest} THEN '{lang}'" for lang in langs
    ) + " END"
    return rf"""
WITH sig AS (
  SELECT doc_id,
    CAST(floor((
      least(CAST(1.0 AS DOUBLE),
            len(regexp_split_to_array(trim(text), '\s+')) / CAST(64.0 AS DOUBLE)) * 0.5
      + least(CAST(1.0 AS DOUBLE), (
          CAST(floor((length(' ' || text || ' ')
                - length(replace(' ' || text || ' ', ' the ', ''))) / 5) AS BIGINT)
          + CAST(floor((length(' ' || text || ' ')
                - length(replace(' ' || text || ' ', ' a ', ''))) / 3) AS BIGINT)
        ) / CAST(4.0 AS DOUBLE)) * 0.3
      + (1 - least(CAST(1.0 AS DOUBLE),
          ((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
           / length(text)) * 10)) * 0.2
    ) * 1000000) AS BIGINT) AS quality_e6,
    CAST(floor(
      (len(regexp_split_to_array(trim(text), '\s+'))
       - len(list_distinct(regexp_split_to_array(trim(text), '\s+'))))
      * 1000000.0 / len(regexp_split_to_array(trim(text), '\s+'))
    ) AS BIGINT) AS dup_word_frac_e6,
{scores}
  FROM documents
),
gated AS (
  SELECT d.doc_id, d.source, d.text
  FROM documents d JOIN sig USING (doc_id)
  WHERE sig.quality_e6 >= 500000 AND sig.dup_word_frac_e6 <= 600000
    AND ({case}) = 'en'
),
bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 13),
bw AS (SELECT doc_id AS bid, regexp_split_to_array(trim(text), '\s+') AS ws
       FROM bench),
bg AS (SELECT DISTINCT bid, array_to_string(ws[i:i+7], ' ') AS g
       FROM (SELECT bid, ws, unnest(generate_series(1, len(ws) - 7)) AS i
             FROM bw WHERE len(ws) >= 8)),
tw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM gated),
tg AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS g
       FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i
             FROM tw WHERE len(ws) >= 8)),
contaminated AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (g)),
clean AS (
  SELECT * FROM gated
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
tok AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens
  FROM clean WHERE source IN ('src0', 'src1', 'src2', 'src4')
),
b(source, budget) AS (
  VALUES ('src0', 500), ('src1', 300), ('src2', 9999), ('src4', 400)
),
selw AS (
  SELECT t.*, b.budget,
         sum(n_ws_tokens) OVER (
           PARTITION BY t.source
           ORDER BY ({sample_hash_sql('doc_id')}), doc_id
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM tok t JOIN b USING (source)
)
SELECT doc_id, source, n_ws_tokens FROM selw WHERE cum - n_ws_tokens < budget
"""


@q("pipeline_corpus", _build_pipeline_corpus_sql(), extra=True)
def pipeline_corpus(spark, sf):
    """The C4/Dolma-style curation pipeline END TO END as one Spark plan,
    composing five oracle-checked operators: quality gate (quality_score)
    + repetition gate (repetition_stats) + language id (lang_id) +
    benchmark decontamination (contamination_report via decontaminate) +
    token-budget mixture sampling (sample_to_token_budget). Every stage is
    the operator the harness checks in isolation — this entry proves they
    COMPOSE, with the whole pipeline matching one independent SQL
    recomputation row-for-row. (A production pipeline would fuse the three
    map-only signal computations into one projection; the composition here
    deliberately goes through the public operator surface.)"""
    from forklift_spark.operators.contamination import decontaminate
    from forklift_spark.operators.sampling import sample_to_token_budget
    from forklift_spark.operators.text import repetition_stats

    d = t(spark, sf, "documents").select("doc_id", "source", "text")
    q_ok = quality_score(d, "text", "doc_id").filter(
        F.col("quality_e6") >= 500_000
    ).select("doc_id")
    r_ok = repetition_stats(d, "text", "doc_id").filter(
        F.col("dup_word_frac_e6") <= 600_000
    ).select("doc_id")
    l_ok = lang_id(d, "text", "doc_id").filter(
        F.col("pred_lang") == "en"
    ).select("doc_id")
    gated = d.join(q_ok, "doc_id").join(r_ok, "doc_id").join(l_ok, "doc_id")

    bench = d.filter(F.col("doc_id") % 97 == 13).select("doc_id", "text")
    clean = decontaminate(gated, bench, "text", "doc_id", n=8)

    tok = token_stats(clean, "text", "doc_id", keep_cols=["source"]).select(
        "doc_id", "source", "n_ws_tokens"
    )
    return sample_to_token_budget(
        tok, "source", "doc_id", "n_ws_tokens",
        {"src0": 500, "src1": 300, "src2": 9999, "src4": 400},
    )


# ------------------------------------------------- stream-stream interval

#: view -> click funnel per user within 2 hours, both sides' payloads
_STREAM_JOIN_SQL = """
SELECT v.user_id, v.event_id, v.ts, c.event_id AS r_event_id, c.ts AS r_ts,
       CAST(floor(c.value * 1000000) AS BIGINT) AS r_value_e6
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON v.user_id = c.user_id
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
"""


@q("stream_join_batch", _STREAM_JOIN_SQL, extra=True)
def stream_join_batch(spark, sf):
    """Stream-stream interval join semantics (streaming/joins.py
    stream_interval_join) proven on batch frames — by design the operator
    computes the identical relation on batch and streaming inputs (the
    stream==batch equivalence tests in tests/test_stream_joins.py run the
    real streaming engine); the oracle is the plain SQL interval join.
    View -> click funnel per user within 2 hours."""
    from forklift_spark.streaming.joins import stream_interval_join

    ev = t(spark, sf, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", F.col("ts").alias("ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    j = stream_interval_join(
        views, clicks, ["user_id"],
        left_ts="ts", right_ts="ts", within="2 hours", how="inner",
    )
    return j.select(
        "user_id", "event_id", "ts",
        F.col("r_event_id"), F.col("r_ts"),
        F.floor(F.col("r_value") * 1_000_000).cast("long").alias("r_value_e6"),
    )


# ------------------------------------------------------------- OOV rate

#: garbled mutants (3 junk words appended to every 17th doc) against the
#: corpus's own top-16 vocabulary: junk + tail words fall out of vocab
_OOV_SQL = r"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 17 = 3 THEN text || ' qq7x zx9y vv3z'
              ELSE text END AS text
  FROM documents
),
w AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS wd
      FROM corpus),
vocab AS (
  SELECT wd FROM (
    SELECT wd, count(*) AS n FROM w GROUP BY 1
    ORDER BY n DESC, wd LIMIT 16
  )
)
SELECT w.doc_id,
       count(*) AS n_words,
       CAST(sum(CASE WHEN v.wd IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(floor(sum(CASE WHEN v.wd IS NULL THEN 1 ELSE 0 END)
                  * 1000000.0 / count(*)) AS BIGINT) AS oov_rate_e6
FROM w LEFT JOIN vocab v USING (wd)
GROUP BY w.doc_id
"""


@q("text_oov", _OOV_SQL, extra=True)
def text_oov(spark, sf):
    """OOV-rate quality signal (operators/text.py oov_rate): score every
    doc against the corpus's own top-16 vocabulary (deterministic
    count-desc/word-asc cut), with planted garble docs scoring strictly
    higher. The vocabulary pass is one map-side-combining aggregate + a
    V-row TakeOrdered; scoring is a broadcast left join whose per-doc
    aggregate collapses map-side — the shuffle is O(docs), not O(tokens)."""
    from forklift_spark.operators.text import oov_rate

    d = t(spark, sf, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 17 == 3,
            F.concat(F.col("text"), F.lit(" qq7x zx9y vv3z")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return oov_rate(d, "text", "doc_id", top_v=16)


# -------------------------------------------------------- column profile

_PROFILE_SQL = """
SELECT 'doc_id' AS column_name, count(*) AS n_rows,
       CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
       CAST(min(doc_id) AS VARCHAR) AS min_str, CAST(max(doc_id) AS VARCHAR) AS max_str
FROM documents
UNION ALL
SELECT 'lang', count(*),
       CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT lang) AS BIGINT),
       CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
FROM documents
UNION ALL
SELECT 'source', count(*),
       CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT source) AS BIGINT),
       CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
FROM documents
UNION ALL
SELECT 'n_chars', count(*),
       CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT n_chars) AS BIGINT),
       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
FROM documents
"""


@q("profile_columns", _PROFILE_SQL, extra=True)
def profile_columns(spark, sf):
    """Column profiling (operators/profile.py column_profile): per-column
    nulls / exact distincts / min-max over documents in ONE aggregate job
    (stack-melted to long form), equal to four independent SQL profiles."""
    from forklift_spark.operators.profile import column_profile

    return column_profile(
        t(spark, sf, "documents"), ["doc_id", "lang", "source", "n_chars"]
    )


# ------------------------------------------------- dedup cluster closure

#: three mutation generations => clusters of size 3 whose base<->m2 edge is
#: MISSING for shorter docs at threshold 0.8 (jaccard (W-2)/(W+3) < 0.8 for
#: word counts W < 22 while both chain links clear it for W >= 13), so the
#: oracle genuinely exercises transitive closure, not just pair grouping
_CLUSTER_CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' zzz aaa qqq' FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 2000000, text || ' zzz aaa qqq rrr sss' FROM documents WHERE doc_id % 7 = 0
)
"""

#: shingle pairs (identical to _SHINGLE_IDX_SQL's machinery) + recursive-CTE
#: transitive closure: component = min reachable id (DuckDB's UNION-dedup
#: recursion terminates; clusters here are <= 3 nodes)
_CLUSTER_BODY_SQL = r""",
w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM corpus),
sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       FROM (SELECT doc_id, ws, unnest(generate_series(1, greatest(1, len(ws) - 2))) AS i
             FROM w)),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
ip AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       GROUP BY 1, 2),
jp AS (SELECT id_a, id_b
       FROM ip JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
       WHERE inter * 1.0 / (x.n + y.n - inter) >= 0.8),
edges AS (SELECT id_a AS a, id_b AS b FROM jp UNION SELECT id_b, id_a FROM jp),
gnodes AS (SELECT DISTINCT a AS id FROM edges),
reach(id, node) AS (
  SELECT id, id FROM gnodes
  UNION
  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.node
),
asg AS (SELECT id AS doc_id, min(node) AS component FROM reach GROUP BY id)
"""

_CLUSTER_SQL = (
    "WITH RECURSIVE " + _CLUSTER_CORPUS_SQL + _CLUSTER_BODY_SQL
    + """
SELECT a.doc_id, a.component, s.cluster_size
FROM asg a JOIN (SELECT component, count(*) AS cluster_size
                 FROM asg GROUP BY component) s
  ON s.component = a.component
"""
)

_CANONICAL_SQL = (
    "WITH RECURSIVE " + _CLUSTER_CORPUS_SQL + _CLUSTER_BODY_SQL
    + """
SELECT c.doc_id FROM corpus c LEFT JOIN asg ON asg.doc_id = c.doc_id
WHERE asg.component IS NULL OR asg.component = c.doc_id
"""
)


def _cluster_corpus(spark, sf):
    d = t(spark, sf, "documents").select("doc_id", "text")
    m = d.filter(F.col("doc_id") % 7 == 0)
    m1 = m.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz aaa qqq")).alias("text"),
    )
    m2 = m.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz aaa qqq rrr sss")).alias("text"),
    )
    return d.unionByName(m1).unionByName(m2)


@q("dedup_clusters", _CLUSTER_SQL, extra=True)
def dedup_clusters(spark, sf):
    """Transitive closure of near-dup pairs (operators/cluster.py
    connected_components, alternating large-star/small-star): component
    label = min doc_id per cluster, vs a DuckDB recursive-CTE closure."""
    from forklift_spark.operators.cluster import connected_components

    pairs = dd.shingle_jaccard_pairs(
        _cluster_corpus(spark, sf), "text", "doc_id",
        threshold=0.8, shingle_kind="word", ngram_n=3,
    )
    cc = connected_components(pairs)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "component").select(
        F.col("id").alias("doc_id"), "component", "cluster_size"
    )


@q("dedup_canonical", _CANONICAL_SQL, extra=True)
def dedup_canonical(spark, sf):
    """Corpus after cluster-dedup (operators/cluster.py
    dedup_keep_canonical): one min-id survivor per near-dup cluster,
    singletons untouched."""
    from forklift_spark.operators.cluster import dedup_keep_canonical

    corpus = _cluster_corpus(spark, sf)
    pairs = dd.shingle_jaccard_pairs(
        corpus, "text", "doc_id",
        threshold=0.8, shingle_kind="word", ngram_n=3,
    )
    return dedup_keep_canonical(corpus, pairs, "doc_id").select("doc_id")


#: int8 quantization oracle: the IDENTICAL floor-based arithmetic replayed
#: in DuckDB (floor over IEEE doubles is bit-deterministic across engines;
#: round() half-cases are not — operators/quantize.py module docstring).
#: q is cast to int for the comparison only; storage stays tinyint.
_QUANTIZE_SQL = """
WITH scaled AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s
  FROM embeddings
)
SELECT vec_id,
       round(s, 12) AS scale_r,
       CASE WHEN s = 0
            THEN list_transform(embedding, x -> 0)
            ELSE list_transform(embedding,
                                x -> CAST(floor(CAST(x AS DOUBLE) / s + 0.5)
                                          AS INTEGER)) END AS q
FROM scaled
"""


@q("embed_quantize", _QUANTIZE_SQL, extra=True)
def embed_quantize(spark, sf):
    """Symmetric int8 embedding quantization (operators/quantize.py): the
    4x ANN scan-byte lever. One map-only HOF projection (scale let-bound
    per vector, zero exchanges — plan-asserted in tests/test_quantize.py);
    the emitted int8 arrays must be BIT-IDENTICAL to DuckDB replaying the
    same floor-based expression, which is the engine-portability contract
    the floor(x/s + 0.5) form exists for."""
    from forklift_spark.operators.quantize import quantize

    e = t(spark, sf, "embeddings")
    return quantize(e, "embedding").selectExpr(
        "vec_id",
        "round(qvec.scale, 12) AS scale_r",
        "transform(qvec.q, v -> CAST(v AS INT)) AS q",
    )
