"""SQL-declarative incremental MATERIALIZED VIEWs over lakette tables.

The derive family (operators/derive.py, derive_agg.py, derive_join.py)
maintains bronze -> silver -> gold tables incrementally from changefeed
spans — but wiring one up is a Python call. This module gives those
operators the SQL surface every warehouse user reaches for first:

    CREATE MATERIALIZED VIEW py_docs
        LOCATION '/lake/py_docs'
        AS SELECT repo, path, upper(lang) AS lang_u, length(content) AS n
           FROM repos WHERE lang = 'py'

    CREATE MATERIALIZED VIEW lang_counts LOCATION '/lake/lang_counts'
        AS SELECT lang, count(*) AS n, sum(length(content)) AS bytes
           FROM repos GROUP BY lang

    CREATE MATERIALIZED VIEW enriched LOCATION '/lake/enriched'
        AS SELECT f.repo, f.path, f.content, d.owner AS owner
           FROM repos f JOIN owners d ON f.repo = d.repo

    REFRESH MATERIALIZED VIEW py_docs       -- consume new spans, O(changed)
    DROP MATERIALIZED VIEW py_docs          -- unregister (metadata-only)
    SHOW MATERIALIZED VIEWS

COMPILE, don't re-implement (the front-end's rule): the SELECT is parsed
only far enough to classify its SHAPE and extract SQL expression strings;
every expression lands verbatim in a mapping spec / aggregate spec that
the derive operators compile through Catalyst. Shape -> operator:

    projection + optional WHERE            -> operators/derive.derive
    GROUP BY + aggregates (+ WHERE)        -> operators/derive_agg.derive_agg
    many-to-one [LEFT|INNER] JOIN          -> operators/derive_join.derive_join

The definition persists as `_mview.json` under the destination root, so
REFRESH (any session, any process) replays the SAME spec — the derive
operators' own fingerprint guards then verify it never drifted. Offsets,
exactly-once application, crash resume, and vacuumed-source resync are
entirely the operators' existing contracts; this module adds zero state
beyond the definition record.

Loud gates (v1), matching the operators' own restrictions rather than
approximating around them:
  * one source table (plus one JOIN dimension) — no subqueries, UNION,
    HAVING, ORDER BY, LIMIT, DISTINCT, or window functions;
  * JOIN mviews take no WHERE/GROUP BY (derive_join is row derivation;
    filtered/aggregated joins are a chained mview over the join mview);
  * JOIN ON must equate fact columns to ALL dim key columns (derive_join's
    many-to-one contract); dim payload is referenced as `<dim_alias>.col`
    and lands under the `dim_` prefix in the view;
  * key-preserving transforms only (derive's v1 rule) — key columns may
    appear in the select list only bare/identity.
"""

from __future__ import annotations

import os
import re
from typing import Any

from .lakette.table import LaketteTable
from .operators.derive import derive
from .operators.derive_agg import derive_agg
from .operators.derive_join import derive_join

_IDENT = r"[A-Za-z_][A-Za-z0-9_.]*"
_BARE = r"[A-Za-z_][A-Za-z0-9_]*"

#: keywords that may follow a table reference — anything else there is an
#: alias (mirrors SqlFrontend._POST_REF_KEYWORDS for the clauses mviews
#: accept; the full statement grammar is gated separately)
_KEYWORDS = frozenset((
    "where", "group", "join", "left", "right", "full", "inner", "cross",
    "on", "having", "order", "limit", "union", "except", "intersect",
    "natural", "semi", "anti",
))

#: clauses an mview SELECT must NOT contain (each names why)
_FORBIDDEN = (
    ("HAVING", "filter on the aggregated mview with a chained mview"),
    (r"ORDER\s+BY", "materialized state is unordered; order at query time"),
    ("LIMIT", "materialized state has no row budget; limit at query time"),
    ("UNION", "one source per mview; chain or union at query time"),
    ("EXCEPT", "one source per mview"),
    ("INTERSECT", "one source per mview"),
    ("OVER", "window functions are not incrementally maintainable row-wise"),
)


class MviewError(ValueError):
    """Statement shape the mview compiler does not accept — the message
    names the supported grammar or the operator restriction behind it."""


def def_path(root: str) -> str:
    return os.path.join(root, "_mview.json")


def read_definition(table: LaketteTable) -> dict[str, Any] | None:
    """The persisted mview definition under the table root, or None if the
    table is not a materialized view."""
    p = def_path(table.root)
    if not table.fs.exists(p):
        return None
    return table.fs.read_json(p)


# --------------------------------------------------------------- lexing

def _depths(masked: str) -> list[int]:
    """Paren depth at each index (open paren counts at its own index)."""
    out, d = [], 0
    for ch in masked:
        if ch == "(":
            d += 1
            out.append(d)
            continue
        out.append(d)
        if ch == ")":
            d -= 1
    return out


def _top_kw(masked: str, depths: list[int], kw: str, start: int = 0) -> re.Match | None:
    """First depth-0 occurrence of keyword-regex `kw` at/after `start`."""
    for m in re.finditer(rf"\b{kw}\b", masked, re.IGNORECASE):
        if m.start() >= start and depths[m.start()] == 0:
            return m
    return None


def _split_top(text: str, masked: str, sep: str = ",") -> list[tuple[str, str]]:
    """(text, masked) pieces split on depth-0 `sep`."""
    parts, depth, last = [], 0, 0
    for i, ch in enumerate(masked):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append((text[last:i], masked[last:i]))
            last = i + 1
    parts.append((text[last:], masked[last:]))
    return [(t.strip(), m.strip()) for t, m in parts if t.strip()]


def _norm(expr: str) -> str:
    """Whitespace-collapsed, case-folded expression text — the comparison
    key for matching select-list entries to GROUP BY expressions. (SQL
    identifier resolution is case-insensitive in Spark's default config,
    which the engine pins.)"""
    return re.sub(r"\s+", " ", expr).strip().lower()


def _rewrite_quals(text: str, rules: dict[str, str]) -> str:
    """Rewrite `alias.col` references: rules maps a lowercased alias to a
    replacement prefix ('' drops the qualifier; 'dim_' renames the column
    into the joined frame's dim namespace). Unknown qualifiers raise —
    an unresolvable alias must fail at compile time, not at REFRESH.
    `text` is expression text with no string literals (pieces are cut
    from the masked-validated statement; literals never contain the
    `a.b` shape after masking because masked bytes are \\x00)."""
    out, last = [], 0
    for m in re.finditer(rf"\b({_BARE})\s*\.\s*({_BARE})\b", text):
        alias, col = m.group(1), m.group(2)
        rep = rules.get(alias.lower())
        if rep is None:
            raise MviewError(
                f"unknown qualifier {alias!r} in {text.strip()!r}; known "
                f"aliases: {sorted(rules)}"
            )
        out.append(text[last:m.start()])
        out.append(f"{rep}{col}")
        last = m.end()
    out.append(text[last:])
    return "".join(out)


def _split_alias(piece: str, mpiece: str) -> tuple[str, str | None]:
    """(expression, alias|None): the alias is the LAST depth-0 ` AS name`
    at the end of the piece (so `CAST(x AS INT) AS y` keeps its inner AS)."""
    depths = _depths(mpiece)
    last_as = None
    for m in re.finditer(r"\bAS\b", mpiece, re.IGNORECASE):
        if depths[m.start()] == 0:
            last_as = m
    if last_as:
        am = re.match(rf"\s*({_BARE})\s*$", mpiece[last_as.end():])
        if am:
            alias = piece[last_as.end() + am.start(1): last_as.end() + am.end(1)]
            return piece[: last_as.start()].strip(), alias
    return piece.strip(), None


def _table_ref(stmt: str, masked: str, pos: int) -> tuple[str, str | None, int]:
    """Parse `<ident> [AS] [alias]` at pos -> (name, alias, next_pos)."""
    m = re.match(rf"\s*({_IDENT})", masked[pos:])
    if not m:
        raise MviewError(f"expected a table name at: {stmt[pos:pos + 40]!r}")
    name = stmt[pos + m.start(1): pos + m.end(1)]
    pos += m.end()
    am = re.match(rf"\s*(?:AS\s+)?({_BARE})", masked[pos:], re.IGNORECASE)
    if am and am.group(1).lower() not in _KEYWORDS:
        return name, stmt[pos + am.start(1): pos + am.end(1)], pos + am.end()
    return name, None, pos


# -------------------------------------------------------------- parsing

def parse_mview_select(stmt: str, masked: str) -> dict[str, Any]:
    """Parse the restricted mview SELECT into a shape-classified plan dict
    (pure text -> text; table names unresolved). Raises MviewError on any
    unsupported shape, naming the rule."""
    depths = _depths(masked)
    for kw, why in _FORBIDDEN:
        if _top_kw(masked, depths, kw):
            label = re.sub(r"\\s\+", " ", kw)
            raise MviewError(
                f"{label} is not supported in a materialized view ({why})"
            )
    m = re.match(r"\s*SELECT\s+", masked, re.IGNORECASE)
    if not m:
        raise MviewError("materialized view definition must be a SELECT")
    if re.match(r"DISTINCT\b", masked[m.end():], re.IGNORECASE):
        raise MviewError(
            "SELECT DISTINCT is not incrementally maintainable row-wise — "
            "use GROUP BY over the distinct columns (count(*) rides along)"
        )
    if re.search(r"\bSELECT\b", masked[m.end():], re.IGNORECASE):
        raise MviewError("subqueries are not supported in mview v1")
    fm = _top_kw(masked, depths, "FROM", m.end())
    if not fm:
        raise MviewError("mview SELECT needs a FROM <lakette table>")
    select_text = stmt[m.end(): fm.start()]
    select_masked = masked[m.end(): fm.start()]

    if re.match(r"\s*\(", masked[fm.end():]):
        raise MviewError("subqueries/derived relations are not supported in mview v1")
    src_name, src_alias, pos = _table_ref(stmt, masked, fm.end())

    jm = _top_kw(
        masked, depths,
        r"(?:(LEFT(?:\s+OUTER)?|INNER|RIGHT|FULL|CROSS)\s+)?JOIN", pos,
    )
    wm = _top_kw(masked, depths, "WHERE", pos)
    gm = _top_kw(masked, depths, r"GROUP\s+BY", pos)

    plan: dict[str, Any] = {
        "select": [], "src": src_name, "src_alias": src_alias,
        "where": None, "group_by_exprs": [], "join": None,
    }

    if jm:
        kind = (jm.group(1) or "INNER").upper()
        if kind.startswith(("RIGHT", "FULL", "CROSS")):
            raise MviewError(
                f"{kind} JOIN is not a many-to-one enrichment — derive_join "
                "supports LEFT and INNER only (right/full joins change the "
                "key-ownership direction; cross joins fan out)"
            )
        if wm or gm:
            raise MviewError(
                "JOIN mviews take no WHERE/GROUP BY in v1 (derive_join is "
                "row-level enrichment) — chain a second mview over the "
                "join mview for filtering/aggregation"
            )
        dim_name, dim_alias, jpos = _table_ref(stmt, masked, jm.end())
        om = _top_kw(masked, depths, "ON", jpos)
        if not om:
            raise MviewError("JOIN needs an ON <fact.fk = dim.key [AND ...]> condition")
        if _top_kw(masked, depths, "JOIN", om.end()):
            raise MviewError("one JOIN per mview in v1 — chain mviews for deeper enrichment")
        if src_alias is None or dim_alias is None:
            raise MviewError(
                "JOIN mviews require aliases on both tables (FROM fact f "
                "JOIN dim d ...) so column references are unambiguous"
            )
        plan["join"] = {
            "dim": dim_name, "dim_alias": dim_alias,
            "how": "left" if kind.startswith("LEFT") else "inner",
            "on_text": stmt[om.end():].strip(),
            "on_masked": masked[om.end():].strip(),
        }
    else:
        end = gm.start() if gm else len(stmt)
        if wm:
            if gm and wm.start() > gm.start():
                raise MviewError("WHERE must precede GROUP BY")
            plan["where"] = stmt[wm.end(): gm.start() if gm else len(stmt)].strip()
            end = wm.start()
        if gm:
            for t, _mt in _split_top(stmt[gm.end():], masked[gm.end():]):
                plan["group_by_exprs"].append(t)
        trailing = stmt[pos:end].strip()
        if trailing:
            raise MviewError(f"unparsed text after the table reference: {trailing!r}")

    for t, mt in _split_top(select_text, select_masked):
        expr, alias = _split_alias(t, mt)
        plan["select"].append({"expr": expr, "alias": alias})
    if not plan["select"]:
        raise MviewError("empty select list")
    if any(s["expr"].strip() == "*" for s in plan["select"]):
        raise MviewError(
            "SELECT * is not supported — an mview's spec is its schema "
            "contract; list the columns"
        )
    return plan


# ------------------------------------------------------------ compiling

def _out_name(expr: str, alias: str | None) -> str:
    if alias:
        return alias
    bm = re.fullmatch(rf"\s*({_BARE})\s*", expr)
    if bm:
        return bm.group(1)
    raise MviewError(
        f"select entry {expr!r} needs an alias (only bare columns may omit AS)"
    )


def compile_mview(plan: dict[str, Any], resolve) -> dict[str, Any]:
    """Plan dict -> persisted definition (sans name/id/sql, added by the
    caller). `resolve(name) -> LaketteTable` is the front-end's resolver.
    All spec entries are SQL strings, so the definition serializes exactly
    and REFRESH replays it bit-identically."""
    src = resolve(plan["src"])

    if plan["join"]:
        j = plan["join"]
        dim = resolve(j["dim"])
        rules = {plan["src_alias"].lower(): "", j["dim_alias"].lower(): "dim_"}
        on: dict[str, str] = {}
        for part_t, _pm in _split_top(
            re.sub(r"\bAND\b", "\x01", j["on_text"], flags=re.IGNORECASE),
            re.sub(r"\bAND\b", "\x01", j["on_masked"], flags=re.IGNORECASE),
            sep="\x01",
        ):
            pm = re.fullmatch(
                rf"\s*({_BARE})\s*\.\s*({_BARE})\s*=\s*({_BARE})\s*\.\s*({_BARE})\s*",
                part_t,
            )
            if not pm:
                raise MviewError(
                    f"JOIN ON must be `fact.col = dim.col` equalities ANDed; "
                    f"got {part_t.strip()!r}"
                )
            a1, c1, a2, c2 = pm.groups()
            sides = {a1.lower(): c1, a2.lower(): c2}
            if set(sides) != {plan["src_alias"].lower(), j["dim_alias"].lower()}:
                raise MviewError(
                    f"JOIN ON sides must be the two table aliases "
                    f"({plan['src_alias']}, {j['dim_alias']}); got {part_t.strip()!r}"
                )
            on[sides[plan["src_alias"].lower()]] = sides[j["dim_alias"].lower()]
        mapping = {}
        for s in plan["select"]:
            expr = _rewrite_quals(s["expr"], rules)
            mapping[_out_name(expr, s["alias"])] = expr
        return {
            "kind": "join", "fact_root": src.root, "dim_root": dim.root,
            "on": on, "how": j["how"], "mapping": mapping, "dim_prefix": "dim_",
        }

    rules = {plan["src_alias"].lower(): ""} if plan["src_alias"] else {}

    def _rw(e: str) -> str:
        return _rewrite_quals(e, rules) if rules else e

    where = _rw(plan["where"]) if plan["where"] else None

    if plan["group_by_exprs"]:
        group_norm = {_norm(_rw(g)): _rw(g) for g in plan["group_by_exprs"]}
        group_by: dict[str, str] = {}
        aggs: dict[str, str] = {}
        for s in plan["select"]:
            expr = _rw(s["expr"])
            if _norm(expr) in group_norm:
                group_by[_out_name(expr, s["alias"])] = expr
            else:
                if not s["alias"]:
                    raise MviewError(
                        f"aggregate entry {expr!r} needs an alias (AS name)"
                    )
                aggs[s["alias"]] = expr
        covered = {_norm(e) for e in group_by.values()}
        missing = [e for k, e in group_norm.items() if k not in covered]
        if missing:
            raise MviewError(
                f"every GROUP BY expression must appear in the select list "
                f"(it names the gold table's key column); missing: {missing}"
            )
        if not aggs:
            raise MviewError(
                "GROUP BY mview needs at least one aggregate in the select "
                "list (a pure distinct is GROUP BY + count(*))"
            )
        return {
            "kind": "agg", "src_root": src.root,
            "group_by": group_by, "aggs": aggs, "predicate": where,
        }

    mapping = {}
    for s in plan["select"]:
        expr = _rw(s["expr"])
        mapping[_out_name(expr, s["alias"])] = expr
    return {
        "kind": "map", "src_root": src.root,
        "mapping": mapping, "predicate": where,
    }


# ------------------------------------------------------------ executing

def refresh_mview(
    spark, root: str, fs, definition: dict[str, Any], *, full: bool = False
) -> dict[str, Any]:
    """Run one incremental maintenance pass from the persisted definition.
    Exactly-once / crash-resume / vacuumed-source resync are the derive
    operators' contracts; returns a normalized report dict. `full=True`
    (SQL: REFRESH MATERIALIZED VIEW x FULL) forces a complete
    re-derivation — expected state recomputed from the current source
    snapshot, state-diffed against the view, divergent rows rewritten and
    extra keys deleted — the repair lever when the view is suspected of
    out-of-band drift (derive's force_resync contract)."""
    kind = definition["kind"]
    did = definition["derive_id"]
    if kind == "map":
        src = LaketteTable(definition["src_root"], storage=fs)
        r = derive(
            spark, src, root, definition["mapping"],
            predicate=definition.get("predicate"), derive_id=did,
            force_resync=full,
        )
        return {"kind": kind, "src_version": r.src_version,
                "epochs": len(r.applied_epochs), "rows": r.applied_rows,
                "initial_sync": r.initial_sync, "resync": r.resync}
    if kind == "agg":
        src = LaketteTable(definition["src_root"], storage=fs)
        r = derive_agg(
            spark, src, root, definition["group_by"], definition["aggs"],
            predicate=definition.get("predicate"), derive_id=did,
            force_resync=full,
        )
        return {"kind": kind, "src_version": r.src_version,
                "epochs": len(r.applied_epochs), "rows": r.applied_rows,
                "initial_sync": r.initial_sync, "resync": r.resync,
                "strategy": r.strategy}
    if kind == "join":
        fact = LaketteTable(definition["fact_root"], storage=fs)
        dim = LaketteTable(definition["dim_root"], storage=fs)
        r = derive_join(
            spark, fact, dim, root, definition["on"], definition["mapping"],
            how=definition["how"], derive_id=did,
            dim_prefix=definition.get("dim_prefix", "dim_"),
            force_resync=full,
        )
        return {"kind": kind,
                "src_version": f"{r.fact_version}+{r.dim_version}",
                "epochs": len(r.applied_epochs), "rows": r.applied_rows,
                "initial_sync": r.initial_sync, "resync": r.resync,
                "dim_refresh_path": r.dim_refresh_path}
    raise MviewError(f"unknown mview kind {kind!r} in {def_path(root)}")


def refresh_hook(table: LaketteTable):
    """A `run_ingest(derived=[...])` hook keeping this materialized view
    fresh from inside the streaming loop — the SQL-declared face of the
    medallion pattern (streaming/ingest.py's derived= contract: any
    callable taking the SparkSession). The definition is re-read per
    refresh, so a view re-created with different SQL between epochs is
    picked up (and a dropped definition fails loudly, never silently
    stops maintaining)."""
    root, fs = table.root, table.fs

    def _hook(spark):
        d = read_definition(LaketteTable(root, storage=fs))
        if d is None:
            raise MviewError(
                f"{root} is not a materialized view (no _mview.json) — "
                "was it dropped mid-ingest?"
            )
        return refresh_mview(spark, root, fs, d)

    return _hook


def create_mview(
    spark,
    name: str,
    location: str,
    select_text: str,
    select_masked: str,
    resolve,
    *,
    original_sql: str,
) -> tuple[LaketteTable, dict[str, Any], dict[str, Any]]:
    """Compile + persist + initial refresh. Returns (table, definition,
    refresh report). Crash-safety of CREATE itself: the definition is
    written BEFORE the first refresh, so a crash mid-initial-sync leaves a
    root that a retried CREATE (same SQL) ADOPTS and finishes — the derive
    operators' markers make the re-run exactly-once. A DIFFERENT SQL at an
    occupied location raises (never silently repoint a view)."""
    plan = parse_mview_select(select_text, select_masked)
    definition = compile_mview(plan, resolve)
    definition["name"] = name
    definition["derive_id"] = f"mview_{name.lower()}"
    definition["sql"] = re.sub(r"\s+", " ", original_sql).strip()

    fs = resolve(plan["src"]).fs
    dpath = def_path(location)
    if fs.exists(dpath):
        existing = fs.read_json(dpath)
        if existing.get("sql") != definition["sql"]:
            raise MviewError(
                f"location {location!r} already holds a DIFFERENT materialized "
                f"view ({existing.get('name')!r}); drop/clean it first"
            )
        definition = existing  # adopt: finish the interrupted create
    else:
        fs.makedirs(location)
        fs.put_json(dpath, definition)

    report = refresh_mview(spark, location, fs, definition)
    return LaketteTable(location, storage=fs), definition, report
