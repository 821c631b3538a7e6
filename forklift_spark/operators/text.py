"""Text-analysis operators for training-data pipelines — all JVM column
expressions (whole-stage codegen; no Python on the data path), each designed
to be independently recomputable in ANSI SQL for the DuckDB oracle.

  token_stats     whitespace tokens + alnum-run ("BPE-ish") tokens
  quality_score   length / punctuation / stopword-ratio quality heuristics
  lang_id         n-gram/stopword-hit language heuristic
  fingerprint     document fingerprint: min-of-k-gram rolling hashes
                  (winnowing-style min selection over md5 of char 8-grams)
  repetition_stats  Gopher/Dolma within-doc repetition filters (dup word /
                  top word / repeated n-gram fractions) — zero-exchange HOFs
  text_chunks     fixed-size overlapping token windows (training/RAG
                  chunking) — split+sequence+slice+explode, zero exchanges
  normalize_expr / text_normalized  CCNet/Dolma-style normalization for
                  dedup keys (lowercase, digits->0, punctuation runs->one
                  space) — the step that makes exact dedup catch the
                  case/punctuation/number near-copies raw hashing misses
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PUNCT_RE = r"[.,;:!?]"

#: tiny deterministic stopword lists per language for the heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "une"],
    "de": ["der", "die", "das", "und", "ein"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


def token_stats(
    df: DataFrame, text_col: str, id_col: str, keep_cols: list[str] | None = None
) -> DataFrame:
    """Whitespace/alnum token counts + char length per document.
    `keep_cols` carries named columns (e.g. the packing group) through, so
    sampling -> token counting -> packing composes as ONE pipeline without
    a re-join (VERDICT r4 #8)."""
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[A-Za-z0-9]+"), F.lit(0))).alias(
            "n_alnum_tokens"
        ),
        F.length(text_col).alias("len_chars"),
    )


def text_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_tokens: int = 128,
    overlap: int = 16,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Split documents into fixed-size overlapping token windows — the
    training/RAG chunking step: chunk i covers whitespace tokens
    [i*stride, i*stride + chunk_tokens) with stride = chunk_tokens -
    overlap; the last chunk is the first one containing the final token
    (so every token is covered exactly once past the overlap, and a doc
    shorter than chunk_tokens yields exactly one chunk). Whitespace-only
    docs yield zero chunks. Output: (id, chunk_id, n_tokens, chunk_text)
    plus keep_cols carried through.

    100 TB posture: pure column expressions — split + sequence + slice +
    explode inside the scan's codegen stage, ZERO exchanges (the fan-out
    is bounded by ~n_tokens/stride per row and stays in the row's own
    task); no Python on the data path. The identical arithmetic is
    ANSI-SQL-expressible (string_split_regex + generate_series + list
    slicing), so the op is full-oracle-checkable."""
    if chunk_tokens <= 0 or overlap < 0 or overlap >= chunk_tokens:
        raise ValueError(
            f"need chunk_tokens > 0 and 0 <= overlap < chunk_tokens, got "
            f"chunk_tokens={chunk_tokens} overlap={overlap}"
        )
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # number of chunks: 1 while n <= chunk_tokens, else 1 + ceil((n-CT)/ST)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("long") + 1
    )
    base = df.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        toks.alias("__toks"),
        F.posexplode(
            F.sequence(F.lit(0).cast("long"), (n_chunks - 1).cast("long"))
        ).alias("chunk_id", "__start_i"),
    )
    piece = F.slice(
        F.col("__toks"), F.col("__start_i").cast("int") * stride + 1, chunk_tokens
    )
    return base.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.col("chunk_id"),
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring — (len - len(removed)) / len(needle),
    identical arithmetic in Spark and ANSI SQL."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Ratio outputs are emitted as floor(x * 10^d) integers: the doubles are
    computed by the identical IEEE op tree in Spark and the SQL oracle, and
    floor (unlike round) has no half-tie rule, so the results are
    bit-for-bit comparable across engines."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(F.split(F.trim(t), r"\s+"))
    n_punct = n_chars - F.length(F.regexp_replace(t, PUNCT_RE, ""))
    stop_hits = _count_occurrences(F.concat(F.lit(" "), t, F.lit(" ")), " the ") + \
        _count_occurrences(F.concat(F.lit(" "), t, F.lit(" ")), " a ")
    punct_ratio = n_punct / n_chars
    score = (
        F.least(F.lit(1.0), n_tokens / F.lit(64.0)) * 0.5
        + F.least(F.lit(1.0), stop_hits / F.lit(4.0)) * 0.3
        + (1 - F.least(F.lit(1.0), punct_ratio * 10)) * 0.2
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.floor(n_chars * F.lit(10_000) / n_tokens).cast("long").alias("avg_tok_len_e4"),
        F.floor(n_punct * F.lit(1_000_000) / n_chars).cast("long").alias("punct_ratio_e6"),
        F.floor(stop_hits * F.lit(1_000_000) / n_tokens).cast("long").alias("stop_ratio_e6"),
        F.floor(score * F.lit(1_000_000)).cast("long").alias("quality_e6"),
    )


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Predict language by stopword hits; deterministic tie-break by
    language code order. A real system uses char-n-gram models; the shape
    (per-language score columns -> argmax) is the same."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    scores = {
        lang: sum(
            (_count_occurrences(padded, f" {w} ") for w in words), F.lit(0).cast("long")
        )
        for lang, words in LANG_MARKERS.items()
    }
    langs = sorted(LANG_MARKERS)  # deterministic tie-break: alphabetical
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):  # first (alphabetically) winner sticks
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    out_scores = [scores[lang].alias(f"score_{lang}") for lang in langs]
    return df.select(F.col(id_col), *out_scores, pred.alias("pred_lang"))


def fingerprint(df: DataFrame, text_col: str, id_col: str, k: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: the minimum hash over all
    character k-gram rolling windows (md5 so the oracle can recompute it)."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(text_col).alias("_c"),
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(text_col) - (k - 1)))
            ).alias("_i"),
        )
        .select("_id", F.md5(F.expr(f"substring(_c, _i, {k})")).alias("h"))
        .groupBy("_id")
        .agg(F.min("h").alias("fingerprint"))
        .select(F.col("_id").alias(id_col), "fingerprint")
    )


def normalize_expr(col: Column) -> Column:
    """CCNet/Dolma-style text normalization for DEDUP KEYS: lowercase,
    every digit folded to ``0``, every non-alphanumeric run collapsed to
    one space, trimmed. Raw exact dedup misses the most common web
    near-copies — the same article re-encoded with different casing,
    punctuation, timestamps or counters; hashing the NORMALIZED text
    collapses those while leaving genuinely different words distinct.

    Three codegen regex steps, zero exchanges, and deliberately
    engine-portable: lower / regexp_replace / trim evaluate byte-identically
    in Spark and the DuckDB oracle (non-ASCII letters fall outside
    ``[a-z0-9]`` in both and become separators — the folding is
    ASCII-faithful, which is the CCNet recipe's behavior too).
    Idempotent: normalize(normalize(x)) == normalize(x)."""
    x = F.lower(col)
    x = F.regexp_replace(x, "[0-9]", "0")
    x = F.regexp_replace(x, "[^a-z0-9]+", " ")
    return F.trim(x)


def text_normalized(
    df: DataFrame, text_col: str, id_col: str, keep_cols: list[str] | None = None
) -> DataFrame:
    """Per-document normalized text + its sha256 — the dedup-key view:
    (id, norm_text, norm_sha). Feed `norm_text` to exact_dedup (digest-only
    exchange) or the shingle/minhash family to make any of them
    normalization-aware; `norm_sha` alone is the join-free exact key.
    Pure codegen — zero exchanges (plan-asserted in tests)."""
    nt = normalize_expr(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        nt.alias("norm_text"),
        F.sha2(nt, 256).alias("norm_sha"),
    )


def _word_grams(w: Column, n: int) -> Column:
    """Word n-gram array from a word array (ANSI-safe: empty when the doc
    has fewer than n words)."""
    e = F.expr(
        "transform(sequence(0, size(_w) - %d), i -> %s)"
        % (n, " || ' ' || ".join(f"_w[i + {j}]" for j in range(n)))
    )
    return F.when(w.isNotNull() & (F.size(w) >= n), e).otherwise(
        F.array().cast("array<string>")
    )


def _dup_positions(g: Column) -> Column:
    """Number of gram POSITIONS covered by grams occurring >= 2 times."""
    counts = F.transform(
        F.array_distinct(g), lambda x: F.size(F.filter(g, lambda y: y == x))
    )
    return F.aggregate(
        counts, F.lit(0), lambda a, c: a + F.when(c >= 2, c).otherwise(F.lit(0))
    )


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Within-document repetition signals — the Gopher/Dolma repetition
    filters (docs dominated by one phrase or by repeated n-gram runs are
    boilerplate/spam and get dropped before training):

      n_words             whitespace tokens
      dup_word_frac_e6    fraction of word positions beyond the first
                          occurrence of their word (1 - distinct/total)
      top_word_frac_e6    occurrences of the most frequent word / total
      dup_2gram_frac_e6   fraction of 2-gram positions covered by 2-grams
                          occurring >= 2 times
      dup_5gram_frac_e6   same for 5-grams (long verbatim run detector)

    Scale shape: everything is a per-row higher-order-function expression —
    ZERO exchanges (plan-asserted in tests), the correct 100 TB posture vs
    exploding (doc, gram) pairs into a corpus-wide shuffle. Per-row cost is
    O(distinct_grams x doc_len) inside one task: fine for real web docs
    (10^3-10^4 words); a pathological single document costs quadratic time
    in its own task but never destabilizes the stage. Ratios use the
    floor(x * 10^6) discipline (see quality_score) so the DuckDB oracle is
    bit-exact."""
    w = F.split(F.trim(F.col(text_col)), r"\s+")

    def frac_e6(num: Column, den: Column) -> Column:
        return (
            F.when(den > 0, F.floor(num * F.lit(1_000_000) / den))
            .otherwise(F.lit(0))
            .cast("long")
        )

    d = df.select(
        F.col(id_col),
        w.alias("_w"),
        _word_grams(w, 2).alias("_g2"),
        _word_grams(w, 5).alias("_g5"),
    )
    n = F.size("_w")
    top = F.array_max(
        F.transform(
            F.array_distinct("_w"),
            lambda x: F.size(F.filter(F.col("_w"), lambda y: y == x)),
        )
    )
    return d.select(
        F.col(id_col),
        n.alias("n_words"),
        frac_e6(n - F.size(F.array_distinct("_w")), n).alias("dup_word_frac_e6"),
        frac_e6(top, n).alias("top_word_frac_e6"),
        frac_e6(_dup_positions(F.col("_g2")), F.size("_g2")).alias(
            "dup_2gram_frac_e6"
        ),
        frac_e6(_dup_positions(F.col("_g5")), F.size("_g5")).alias(
            "dup_5gram_frac_e6"
        ),
    )


def oov_rate(
    df: DataFrame, text_col: str, id_col: str, *, top_v: int = 100
) -> DataFrame:
    """Out-of-vocabulary rate against the CORPUS's own top-`top_v`
    vocabulary — the integer-exact cousin of perplexity-based quality
    filtering (a doc mostly made of words the corpus has never seen is
    noise/garble; published pipelines threshold an LM score, whose float
    log-sums don't replay bit-identically across engines — OOV counting
    does).

    Two passes, both scale-shaped:
      1. vocabulary: explode words -> count — ONE aggregate whose partial
         (map-side) combine reduces each task to its distinct words; the
         top-V cut is a TakeOrdered (count desc, word asc — total order,
         deterministic ties), V rows on the driver, broadcast back.
      2. scoring: explode + broadcast LEFT join + per-doc aggregate. Each
         input doc's words live in one partition, so the partial aggregate
         collapses them to one row BEFORE the exchange — the shuffle is
         O(docs), never O(tokens).

    Returns (id, n_words, n_oov, oov_rate_e6)."""
    words = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_w"),
    )
    vocab = (
        words.groupBy("_w").agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("_w"))
        .limit(int(top_v))
        .select("_w", F.lit(True).alias("_in_vocab"))
    )
    scored = words.join(F.broadcast(vocab), "_w", "left")
    return (
        scored.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_words",
            "n_oov",
            F.floor(F.col("n_oov") * F.lit(1_000_000) / F.col("n_words"))
            .cast("long")
            .alias("oov_rate_e6"),
        )
    )


#: PII patterns — deliberately restricted to syntax with IDENTICAL semantics
#: in Java regex (Spark) and RE2 (DuckDB), so the oracle can replay the
#: redaction: character classes, bounded repetition, \b word boundaries.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}


def pii_redact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Training-data PII scrub: replace emails / IPv4s / phone-shaped
    numbers with typed placeholders and count each redaction — pure JVM
    `regexp_replace` / `regexp_extract_all` column expressions (no Python
    on the row path; at 100 TB this is a map-only stage, no shuffle).
    Patterns are a deterministic, oracle-replayable baseline — a
    production scrub would layer ML NER behind the same interface."""
    redacted = F.col(text_col)
    counts = []
    for kind, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{kind}"),
        )
        redacted = F.regexp_replace(redacted, pat, f"<{kind.upper()}>")
    return df.select(
        F.col(id_col),
        *counts,
        redacted.alias("redacted"),
    )
