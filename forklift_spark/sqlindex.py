"""SQL-declared record-level secondary indexes, and the transparent
point-lookup rewrite they power (SURVEY §2 lookup face; the SQL surface
over operators/derive_index.py).

    CREATE INDEX by_commit ON repos (commit)
    SELECT * FROM repos WHERE commit = 'abc123'   -- index-pruned read

An index is derive_index's derived lakette table — keyed
``(term, *source_keys)``, zero payload, maintained incrementally from
changefeed spans — plus a small registration json under the SOURCE
table's root (``_indexes/<name>.json``), so the index travels with the
table: any SqlFrontend over any catalog sees it, no session state. The
index table itself lives under ``_indexes/<name>.idx`` by default (or a
caller-given LOCATION) on the same storage backend as the source.

Transparent acceleration (``accelerate``): when a SELECT's top-level
WHERE carries a conjunct of the shape

    <term_expr> =  <literal>
    <term_expr> IN (<literals>)
    <term_expr> BETWEEN <literal> AND <literal>

over an indexed table read at its CURRENT version, the table's temp
view is rewritten to

    source.snapshot(buckets=<matched keys' hash buckets>)
          .join(broadcast(<index-matched keys>), keys, "left_semi")

— a SUPERSET of the rows the conjunct keeps (the full WHERE still runs
on top), so the rewrite can never change results; it only changes which
files open. The lookup side is file-pruned by the index's (kmin, kmax)
stats on the term key; the source side by hash-bucket pruning. At 10^10
rows a point lookup opens ~1 index file per index bucket plus the
matched keys' source buckets instead of scanning the table.

Safety gates (each one falls back to the unaccelerated full plan, never
errors):

* FRESHNESS — the index must reflect exactly the source version being
  read (``index_version == version``); a stale or mid-refresh index is
  skipped. DML between REFRESH INDEX calls therefore disables the fast
  path rather than serving stale postings.
* TOP-LEVEL CONJUNCT ONLY — a term predicate under an OR (or in a
  subquery / other branch of a set operation) is never used for
  pruning; the conjunct must be ANDed at the top of the single query
  block (pushing a null-rejecting single-table predicate below any
  join, including outer joins on the null-supplying side, is the
  standard sound rewrite).
* QUALIFICATION — in a multi-relation query block the conjunct must be
  alias-qualified (``r.commit = 'x'``) so a same-named column on
  another relation can never prune the wrong table; single-relation
  blocks accept the bare form.
* TOTAL INDEXES ONLY — a partial index (CREATE INDEX ... WHERE pred)
  indexes only pred-passing rows, so it cannot serve a query that
  doesn't also assert pred; partial indexes are lookup-API-only.
* STRING TERMS get (kmin, kmax) file pruning on the index (the stats
  are lexicographic); other atomic terms read the index unpruned (it
  is small) and still bucket-prune the source.
"""

from __future__ import annotations

import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .lakette.table import LaketteTable
from .operators.derive_index import derive_index, index_version


class SqlIndexError(ValueError):
    pass


#: derive_id namespace for SQL-declared indexes (epoch markers, spec
#: fingerprint); keeps them disjoint from hand-rolled derive_index uses
#: on the same destination root.
DERIVE_PREFIX = "sqlidx_"

#: acceleration refuses to broadcast more matched keys than this — a
#: range that wide isn't a point lookup; bucket pruning alone (when it
#: prunes) or the plain full plan serve it better.
MAX_BROADCAST_KEYS = 100_000


def reg_dir(root: str) -> str:
    return os.path.join(root, "_indexes")


def reg_path(root: str, name: str) -> str:
    return os.path.join(reg_dir(root), f"{name.lower()}.json")


def read_indexes(src: LaketteTable) -> dict[str, dict[str, Any]]:
    """All registered index definitions on `src`, name -> definition."""
    d = reg_dir(src.root)
    if not src.fs.isdir(d):
        return {}
    out = {}
    for fn in sorted(src.fs.listdir(d)):
        if fn.endswith(".json"):
            defn = src.fs.read_json(os.path.join(d, fn))
            out[defn["name"]] = defn
    return out


def index_table(src: LaketteTable, defn: dict) -> LaketteTable:
    return LaketteTable(defn["root"], storage=src.fs)


def create_index(
    spark: SparkSession,
    src: LaketteTable,
    name: str,
    term_expr: str,
    *,
    predicate: str | None = None,
    location: str | None = None,
    original_sql: str | None = None,
):
    """Build the index (initial sync at the source's current version) and
    register it on the source. Returns (index_table, definition, report)."""
    if name.lower() in {n.lower() for n in read_indexes(src)}:
        raise SqlIndexError(f"index {name!r} already exists on {src.root}")
    root = location or os.path.join(reg_dir(src.root), f"{name.lower()}.idx")
    defn = {
        "name": name,
        "root": root,
        "term": term_expr,
        "predicate": predicate,
        "derive_id": DERIVE_PREFIX + name.lower(),
        "sql": original_sql,
    }
    report = derive_index(
        spark, src, root, term_expr,
        predicate=predicate, derive_id=defn["derive_id"],
    )
    src.fs.makedirs(reg_dir(src.root))
    src.fs.put_json(reg_path(src.root, name), defn)
    return index_table(src, defn), defn, report


def refresh_index(
    spark: SparkSession, src: LaketteTable, name: str, *, full: bool = False
):
    """One incremental maintenance pass (O(changed rows) via the source
    changefeed span); `full=True` forces a complete re-derivation (the
    REFRESH ... FULL drift-repair contract). Returns (definition, report)."""
    defn = read_indexes(src).get(name) or _ci_get(src, name)
    if defn is None:
        raise SqlIndexError(
            f"no index {name!r} on {src.root}; "
            f"registered: {sorted(read_indexes(src))}"
        )
    report = derive_index(
        spark, src, defn["root"], defn["term"],
        predicate=defn["predicate"], derive_id=defn["derive_id"],
        force_resync=full,
    )
    return defn, report


def _ci_get(src: LaketteTable, name: str) -> dict | None:
    for n, d in read_indexes(src).items():
        if n.lower() == name.lower():
            return d
    return None


def drop_index(src: LaketteTable, name: str) -> dict:
    """Unregister (metadata-only, DROP TABLE's contract: the index data
    stays on disk for the owner to reclaim). Returns the definition."""
    defn = _ci_get(src, name)
    if defn is None:
        raise SqlIndexError(
            f"no index {name!r} on {src.root}; "
            f"registered: {sorted(read_indexes(src))}"
        )
    src.fs.remove(reg_path(src.root, defn["name"]))
    return defn


def refresh_hook(src: LaketteTable, name: str):
    """A `run_ingest(derived=[...])` hook keeping this index fresh from
    inside the streaming loop (same contract as sqlmview.refresh_hook):
    the definition is re-read per refresh, a dropped index fails loudly."""
    root, fs = src.root, src.fs

    def _hook(spark):
        return refresh_index(spark, LaketteTable(root, storage=fs), name)[1]

    return _hook


# ------------------------------------------------- predicate matching

_NUM = r"[-+]?\d+(?:\.\d+)?"
_STR = r"'(?:[^']|'')*'"
_LIT = rf"(?:{_STR}|{_NUM})"


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip()).lower()


def _parse_lit(text: str):
    text = text.strip()
    if text.startswith("'"):
        return text[1:-1].replace("''", "'")
    return float(text) if re.search(r"[.eE]", text) else int(text)


def _lhs_matches(
    lhs: str, term_expr: str, aliases: list[str], multi: bool
) -> bool:
    n, t = _norm(lhs), _norm(term_expr)
    if re.fullmatch(r"[a-z_]\w*", t):
        # bare-column term: accept any of this reference's aliases as a
        # qualifier; the unqualified form only in a single-relation block
        if any(n == f"{_norm(a)}.{t}" for a in aliases):
            return True
    return (not multi) and n == t


def match_conjunct(
    conj: str, conj_masked: str, term_expr: str, aliases: list[str],
    multi: bool,
) -> tuple | None:
    """None, or ("eq", [terms...]) / ("range", lo, hi). `conj` must be ONE
    top-level AND-conjunct (the caller's splitter keeps a BETWEEN's AND
    inside its conjunct). Matching is whole-conjunct: any extra text (an
    OR arm, a NOT, a trailing expression) fails the literal tail or the
    lhs identity check, so a partial match can never be accepted."""
    m = re.fullmatch(rf"(?s)\s*(.*?)\s*=\s*({_LIT})\s*", conj_masked)
    if m and _lhs_matches(conj[m.start(1):m.end(1)], term_expr, aliases, multi):
        return ("eq", [_parse_lit(conj[m.start(2):m.end(2)])])
    m = re.fullmatch(rf"(?s)\s*({_LIT})\s*=\s*(.*?)\s*", conj_masked)
    if m and _lhs_matches(conj[m.start(2):m.end(2)], term_expr, aliases, multi):
        return ("eq", [_parse_lit(conj[m.start(1):m.end(1)])])
    m = re.fullmatch(r"(?si)\s*(.*?)\s+IN\s*\((.*)\)\s*", conj_masked)
    if m and _lhs_matches(conj[m.start(1):m.end(1)], term_expr, aliases, multi):
        inner, inner_masked = conj[m.start(2):m.end(2)], conj_masked[m.start(2):m.end(2)]
        lits, pos = [], 0
        for part in inner_masked.split(","):
            if not re.fullmatch(rf"\s*{_LIT}\s*", part):
                lits = None
                break
            lits.append(_parse_lit(inner[pos:pos + len(part)]))
            pos += len(part) + 1
        if lits:
            return ("eq", lits)
    m = re.fullmatch(
        rf"(?si)\s*(.*?)\s+BETWEEN\s+({_LIT})\s+AND\s+({_LIT})\s*", conj_masked
    )
    if m and _lhs_matches(conj[m.start(1):m.end(1)], term_expr, aliases, multi):
        return (
            "range",
            _parse_lit(conj[m.start(2):m.end(2)]),
            _parse_lit(conj[m.start(3):m.end(3)]),
        )
    return None


# ------------------------------------------------------- acceleration

def accelerate(
    spark: SparkSession,
    src: LaketteTable,
    version: int,
    conjuncts: list[tuple[str, str]],
    aliases: list[str],
    multi: bool,
    *,
    max_keys: int = MAX_BROADCAST_KEYS,
) -> tuple[DataFrame, dict] | None:
    """The transparent rewrite: try every registered (total, fresh)
    index on `src` against the block's top-level conjuncts; on the first
    hit return (pruned superset frame, info). None = serve the full plan."""
    indexes = read_indexes(src)
    if not indexes:
        return None
    for name, defn in indexes.items():
        if defn.get("predicate"):
            continue  # partial index: lookup-API-only (see module doc)
        hit = None
        for conj, conj_masked in conjuncts:
            hit = match_conjunct(conj, conj_masked, defn["term"], aliases, multi)
            if hit:
                break
        if not hit:
            continue
        idx = index_table(src, defn)
        if not LaketteTable.exists(idx.root, storage=src.fs):
            continue
        if index_version(idx, defn["derive_id"]) != version:
            continue  # stale (or mid-refresh ahead): full plan stays correct
        term_col = idx.key_cols()[0]
        tfield = next(f for f in idx.user_schema().fields if f.name == term_col)
        is_str = isinstance(tfield.dataType, T.StringType)
        # (kmin, kmax) file pruning is LEXICOGRAPHIC — sound only when the
        # comparison itself is a string comparison, i.e. a string term
        # column matched against STRING literals. A numeric literal on a
        # string column compares numerically in Spark ('0123' = 123 is
        # true), so a string-range prune there could skip the very file
        # holding a matching row; such lookups keep the unpruned index
        # scan (it is small) and still bucket-prune the source.
        if hit[0] == "eq":
            terms = hit[1]
            all_str = all(isinstance(t, str) for t in terms)
            kr = (min(terms), max(terms)) if is_str and all_str else None
            cond = F.col(term_col).isin(terms)
        else:
            lo, hi = hit[1], hit[2]
            all_str = isinstance(lo, str) and isinstance(hi, str)
            kr = (lo, hi) if is_str and all_str else None
            cond = F.col(term_col).between(F.lit(lo), F.lit(hi))
        snap = idx.snapshot(spark, key_range=kr) if kr else idx.snapshot(spark)
        src_keys = src.key_cols()
        keys = snap.filter(cond).select(*src_keys)
        n_keys = keys.count()  # file-pruned index scan: cheap
        if n_keys > max_keys:
            continue  # not a point lookup; the full plan serves it better
        buckets = sorted(
            r[0]
            for r in keys.select(src.bucket_expr().alias("b")).distinct().collect()
        ) or [0]  # no match: one bucket + empty semi join = empty, cheap
        df = (
            src.snapshot(spark, version=version, buckets=buckets)
            .join(F.broadcast(keys), on=src_keys, how="left_semi")
        )
        return df, {
            "index": name,
            "kind": hit[0],
            "keys": n_keys,
            "buckets": len(buckets),
            "n_buckets": int(src.current_metadata()["n_buckets"]),
        }
    return None
