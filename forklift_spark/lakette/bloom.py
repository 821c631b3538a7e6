"""Per-file bloom filters for equality pruning on NON-key columns
(Iceberg/Parquet bloom analogue, re-homed at the FILE level so the
driver can skip whole files without opening them).

Why this exists: the engine already prunes by hash bucket (key
equality), kmin/kmax (key ranges), smax (CDC floors) and per-column
min/max (range predicates). The remaining gap is equality lookup on a
HIGH-CARDINALITY non-key column — "find the row with this commit /
content_sha" — where min/max stats are useless (every file spans nearly
the full value space). A small per-file bloom answers "definitely not in
this file" and the scan skips it.

Placement: the bloom rides the file's MANIFEST ROW (like cstats), so it
costs zero extra I/O on both sides — the writer already collects one
manifest row per file, and the reader already opens the touched buckets'
manifest shards to plan the scan. Size is bounded: ~10 bits per distinct
value, capped at 2^17 bits (16 KiB raw, ~22 KiB base64) per file per
column; above the cap the false-positive rate degrades gracefully
(pruning weakens, correctness never depends on it). Opt-in per table via
`bloom_cols` — tables that never do reverse lookups pay nothing.

Hashing is engine-independent (blake2b-64 of the value's canonical
string form), so any writer — Spark executor, repair tool, future
backfill job — produces byte-identical filters for identical values.
"""

from __future__ import annotations

import base64
import hashlib

#: target bits per distinct value (fp ~1% at k=7)
BITS_PER_VALUE = 10
#: hash probes per value
K = 7
#: never smaller (tiny files), never larger (manifest row budget)
MIN_BITS = 1024
MAX_BITS = 1 << 17


def h64(value) -> int:
    """64-bit stable hash of a value's canonical string form. MUST match
    between writer and reader forever — changing it invalidates every
    stored filter (treat like a storage format change)."""
    return int.from_bytes(
        hashlib.blake2b(str(value).encode("utf-8"), digest_size=8).digest(),
        "big",
    )


def _positions(h: int, m: int):
    # Kirsch–Mitzenmacher double hashing: two 32-bit halves drive all K
    # probes (h2 forced odd so it cycles the whole table)
    h1 = h >> 32
    h2 = (h & 0xFFFFFFFF) | 1
    for i in range(K):
        yield (h1 + i * h2) % m


def size_for(n_distinct: int) -> int:
    m = 1
    target = max(MIN_BITS, BITS_PER_VALUE * max(1, n_distinct))
    while m < target:
        m <<= 1
    return min(m, MAX_BITS)


def build(hashes: set[int]) -> dict:
    """Bloom spec {"m", "k", "b"} from pre-hashed values (h64). The caller
    accumulates hashes in a set while streaming, so sizing sees the true
    distinct count."""
    m = size_for(len(hashes))
    bits = 0
    for h in hashes:
        for pos in _positions(h, m):
            bits |= 1 << pos
    return {
        "m": m,
        "k": K,
        "b": base64.b64encode(bits.to_bytes(m // 8, "little")).decode("ascii"),
    }


def might_contain(spec: dict, value) -> bool:
    """False = the value is DEFINITELY absent from the file (safe to
    prune). True = present or false positive (must read). A malformed or
    missing spec is conservatively True."""
    try:
        m, k = int(spec["m"]), int(spec["k"])
        raw = base64.b64decode(spec["b"], validate=True)
        if m <= 0 or k <= 0 or len(raw) != m // 8:
            return True  # truncated/corrupt payload: never prune on it
        bits = int.from_bytes(raw, "little")
    except Exception:
        return True
    h = h64(value)
    h1, h2 = h >> 32, (h & 0xFFFFFFFF) | 1
    return all(bits >> ((h1 + i * h2) % m) & 1 for i in range(k))
