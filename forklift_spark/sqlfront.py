"""SQL statement front-end over lakette tables — the Delta-/Iceberg-SQL
parity surface (closes VERDICT r4 "What's missing" #3 beyond views: not
just `SELECT` over a registered snapshot, but the DML and utility
STATEMENTS an analyst types, compiled onto the engine's existing
operators; SURVEY.md §2.10 lakehouse parity).

    fe = SqlFrontend(spark, {"repos": table})        # or a Catalog
    fe.sql("SELECT lang, count(*) AS n FROM repos GROUP BY lang")
    fe.sql("SELECT * FROM repos VERSION AS OF 3")
    fe.sql("UPDATE repos SET lang = 'py' WHERE path LIKE '%.py'")
    fe.sql("DELETE FROM repos WHERE lang = 'de'")
    fe.sql("MERGE INTO repos t USING staged s ON t.repo = s.repo "
           "AND t.path = s.path WHEN MATCHED THEN UPDATE SET * "
           "WHEN NOT MATCHED THEN INSERT *")
    fe.sql("INSERT INTO repos SELECT ... ")
    fe.sql("OPTIMIZE repos")
    fe.sql("VACUUM repos RETAIN 168 HOURS")
    fe.sql("RESTORE TABLE repos TO VERSION AS OF 2")
    fe.sql("DESCRIBE HISTORY repos")
    fe.sql("ALTER TABLE repos RENAME COLUMN lang TO language")
    fe.sql("ALTER TABLE repos CREATE TAG trained VERSION AS OF 5")
    fe.sql("CREATE TABLE docs (id BIGINT, body STRING, PRIMARY KEY (id)) "
           "LOCATION '/lake/docs' TBLPROPERTIES ('n_buckets' = '8')")
    fe.sql("CREATE TABLE py_repos PRIMARY KEY (path) AS "
           "SELECT path, content FROM repos WHERE lang = 'py'")
    fe.sql("DROP TABLE IF EXISTS py_repos")
    fe.sql("COPY INTO docs FROM '/landing/docs' FILEFORMAT = PARQUET")
    fe.sql("SHOW TABLES")
    fe.sql("SHOW CREATE TABLE repos")
    fe.sql("TRUNCATE TABLE docs")
    fe.sql("OPTIMIZE repos ZORDER BY (lang, commit)")
    fe.sql("ANALYZE TABLE repos COMPUTE STATISTICS FOR COLUMNS lang")
    fe.sql("BEGIN")                      # stage writes, publish atomically
    fe.sql("INSERT INTO repos SELECT ...")
    fe.sql("MERGE INTO docs USING ... ")
    fe.sql("COMMIT")                     # both visible in one crash-atomic publish
    fe.sql("SELECT * FROM repos.changes VERSION AS OF 7")   # CDC feed
    fe.sql("SELECT * FROM repos VERSION AS OF 'trained'")   # ref time travel
    fe.sql("VACUUM repos RETAIN 24 HOURS DRY RUN")
    fe.sql("FSCK TABLE repos DEEP")
    fe.sql("EXPORT TABLE repos VERSION AS OF 'trained' TO '/drops/repos'")
    fe.sql("PURGE TABLE repos KEYS (('r1', 'a.py'), ('r2', 'b.py')) DRY RUN")
    fe.sql("ALTER TABLE repos ADD COLUMNS (stars BIGINT)")
    fe.sql("SELECT * FROM repos.changes VERSION AS OF 3 TO 7")  # bounded span
    fe.sql("CREATE MATERIALIZED VIEW py_docs LOCATION '/lake/py' AS "
           "SELECT repo, path, content FROM repos WHERE lang = 'py'")
    fe.sql("REFRESH MATERIALIZED VIEW py_docs")    # incremental, O(changed)
    fe.sql("SHOW MATERIALIZED VIEWS")

Every statement returns a DataFrame (queries: the result; DML/utility: a
one-row report), so `fe.sql` composes like `spark.sql`.

Design rules, in the engine's established discipline:

  * COMPILE, don't re-implement. Each statement lowers onto the existing
    operator with its tested semantics: UPDATE/DELETE -> operators/dml.py
    (tombstone + old-row-SET contracts), MERGE/INSERT ->
    operators/merge.py `merge_into` (seq-LWW, confluent), OPTIMIZE ->
    `compact`, VACUUM/RESTORE/HISTORY/ALTER -> lakette/table.py. SELECT
    registers (time-travelled) snapshots as temp views and delegates the
    untouched statement text to Catalyst — the front-end never interprets
    relational SQL itself.
  * LOUD GATES over silent approximation. Unsupported shapes raise
    SqlFrontendError naming the supported form and the operator to use
    instead (column-level `MERGE ... UPDATE SET c = e` -> `UPDATE` /
    patch tables; target-column references in MERGE conditions -> not
    expressible without the old row, use WHEN MATCHED THEN DELETE +
    predicate DML; key assignment -> delete+insert events).
  * SEQ MINTING (INSERT/MERGE): out-of-band statements enter the table's
    single arbitration order by taking seq = (live max seq) + 1, read
    from per-file `smax` manifest stats (driver-side metadata,
    O(live files) — fine for a human-initiated statement, documented).
    The LWW interplay contract is dml.py's: a later change event with a
    higher seq still wins over the statement's rows.

MERGE carries the full Delta clause matrix: `WHEN MATCHED [AND cond]
THEN UPDATE SET * | UPDATE SET c = e, ... | DELETE` (conditions and
assignments may reference BOTH aliases — a column-level SET keeps
unassigned columns at their stored values, read through one inner key
join), `WHEN NOT MATCHED [BY TARGET] [AND cond] THEN INSERT * | INSERT
(cols) VALUES (exprs)` (source row only), and `WHEN NOT MATCHED BY
SOURCE [AND cond] THEN DELETE | UPDATE SET c = e, ...` (stored row only;
the one branch whose cost is O(live table) — an anti-join over the
snapshot, exactly as in Delta).

Divergence from Delta, stated rather than hidden: lakette tables are
KEYED CDC tables, so `INSERT` of an existing key is an upsert (the merge
arbitration makes append-duplicates meaningless), and every MERGE action
compiles to whole-row EVENTS sharing the statement's minted seq — true
per-column arbitration belongs to column-LWW patch tables
(operators/patch.py).
"""

from __future__ import annotations

import os
import re
import uuid
from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .lakette.table import LaketteTable
from .operators.dml import delete_where, update_where
from .operators.merge import compact, merge_into


class SqlFrontendError(ValueError):
    """Statement shape the front-end does not compile — the message names
    the supported grammar and the operator to use instead."""


_IDENT = r"[A-Za-z_][A-Za-z0-9_.]*"


def _mask_strings(stmt: str) -> str:
    """Same-length copy of `stmt` with every character inside a
    single-quoted SQL string (including '' escapes) replaced by \\x00, so
    keyword/identifier regexes can run without misfiring on string
    contents while every match index maps back into the original text."""
    out = list(stmt)
    i, n = 0, len(stmt)
    while i < n:
        if stmt[i] == "'":
            j = i + 1
            while j < n:
                if stmt[j] == "'":
                    if j + 1 < n and stmt[j + 1] == "'":  # '' escape
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = "\x00"
            i = j + 1
        else:
            i += 1
    return "".join(out)


def _strip_comments(stmt: str) -> str:
    """Remove `--` line comments OUTSIDE strings. Operates on the whole
    text by index against the string-masked twin (same length by
    construction), so a newline INSIDE a string literal — which makes the
    raw and masked line lists diverge — cannot truncate the statement."""
    masked = _mask_strings(stmt)
    out, i = [], 0
    while i < len(stmt):
        cut = masked.find("--", i)
        if cut < 0:
            out.append(stmt[i:])
            break
        out.append(stmt[i:cut])
        nl = masked.find("\n", cut)
        i = len(stmt) if nl < 0 else nl
    return "".join(out)


def _split_top(text: str, masked: str, sep: str = ",") -> list[str]:
    """Split `text` on `sep` at paren depth 0 (using the string-masked
    twin for depth/sep detection)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(masked):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return [p.strip() for p in parts if p.strip()]


def _unquote(s: str) -> str:
    return s[1:-1].replace("''", "'")


class SqlFrontend:
    """Statement executor over a set of named lakette tables.

    `tables` is a name -> LaketteTable mapping or a lakette Catalog
    (anything with .names() and .table(name)). Names resolve
    case-insensitively, SQL-style. Identifiers that do not resolve are
    left for Spark (temp views, functions), so lakette tables and
    ordinary Spark relations mix freely in one SELECT."""

    def __init__(self, spark: SparkSession, tables, *, txn_dir: str | None = None) -> None:
        self.spark = spark
        self._catalog = tables
        #: active BEGIN..COMMIT transaction: {"id", "members": [(table,
        #: stage_id)], "roots": {table root}} — None outside a transaction
        self._txn: dict | None = None
        #: where COMMIT writes its transaction record; default: the
        #: Catalog's txn_dir, else _txn_sql under the first member's root
        self._txn_dir = txn_dir
        #: per-statement record of secondary-index point-lookup rewrites
        #: applied by the last _select (observability + tests)
        self.last_index_accel: list[dict] = []

    # ------------------------------------------------------------ resolve

    def _names(self) -> dict[str, str]:
        if isinstance(self._catalog, Mapping):
            names = self._catalog.keys()
        else:
            names = self._catalog.names()
        return {n.lower(): n for n in names}

    def _table(self, ident: str) -> LaketteTable:
        canon = self._names().get(ident.lower())
        if canon is None:
            raise SqlFrontendError(
                f"unknown table {ident!r}; registered: {sorted(self._names().values())}"
            )
        if isinstance(self._catalog, Mapping):
            return self._catalog[canon]
        return self._catalog.table(canon)

    def _is_table(self, ident: str) -> bool:
        return ident.lower() in self._names()

    # ------------------------------------------------------------ dispatch

    def sql(self, statement: str) -> DataFrame:
        stmt = _strip_comments(statement).strip().rstrip(";").strip()
        masked = _mask_strings(stmt)
        head = re.match(rf"({_IDENT})(?:\s+({_IDENT}))?", masked)
        if not head:
            raise SqlFrontendError(f"cannot parse statement: {statement!r}")
        k1 = head.group(1).upper()
        k2 = (head.group(2) or "").upper()
        if k1 == "BEGIN":
            return self._begin(stmt, masked)
        if k1 == "COMMIT":
            return self._commit_txn(stmt, masked)
        if k1 == "ROLLBACK":
            return self._rollback(stmt, masked)
        if self._txn is not None and k1 not in (
            "SELECT", "WITH", "EXPLAIN", "INSERT", "MERGE", "SHOW", "DESCRIBE",
        ):
            raise SqlFrontendError(
                f"{k1} is not allowed inside a transaction; transactions "
                "stage INSERT/MERGE (the statements that compile onto "
                "merge_into's write-audit-publish path) — COMMIT or "
                "ROLLBACK first"
            )
        if k1 in ("SELECT", "WITH", "EXPLAIN"):
            # EXPLAIN passes through: views splice in, Catalyst explains
            return self._select(stmt, masked)
        if k1 == "INSERT":
            return self._insert(stmt, masked)
        if k1 == "UPDATE":
            return self._update(stmt, masked)
        if k1 == "DELETE":
            return self._delete(stmt, masked)
        if k1 == "MERGE":
            return self._merge(stmt, masked)
        if k1 == "OPTIMIZE":
            return self._optimize(stmt, masked)
        if k1 == "VACUUM":
            return self._vacuum(stmt, masked)
        if k1 == "RESTORE":
            return self._restore(stmt, masked)
        if k1 == "DESCRIBE" and k2 == "HISTORY":
            return self._table(self._one_ident(stmt, masked, "DESCRIBE HISTORY")).history_df(self.spark)
        if k1 == "DESCRIBE" and k2 == "DETAIL":
            return self._detail(self._one_ident(stmt, masked, "DESCRIBE DETAIL"))
        if k1 == "DESCRIBE":
            return self._describe(self._one_ident(
                stmt, masked, "DESCRIBE TABLE" if k2 == "TABLE" else "DESCRIBE"
            ))
        if k1 == "ALTER" and k2 == "TABLE":
            return self._alter(stmt, masked)
        if k1 == "CREATE" and k2 == "TABLE":
            return self._create(stmt, masked)
        if k1 == "CREATE" and k2 == "MATERIALIZED":
            return self._create_mview(stmt, masked)
        if k1 == "CREATE" and k2 == "INDEX":
            return self._create_index(stmt, masked)
        if k1 == "REFRESH" and k2 == "INDEX":
            return self._refresh_index(stmt, masked)
        if k1 == "REFRESH":
            return self._refresh_mview(stmt, masked)
        if k1 == "DROP" and k2 == "INDEX":
            return self._drop_index(stmt, masked)
        if k1 == "DROP" and k2 == "MATERIALIZED":
            return self._drop_mview(stmt, masked)
        if k1 == "DROP" and k2 == "TABLE":
            return self._drop(stmt, masked)
        if k1 == "COPY" and k2 == "INTO":
            return self._copy_into(stmt, masked)
        if k1 == "SHOW":
            return self._show(stmt, masked)
        if k1 == "TRUNCATE":
            return self._truncate(stmt, masked)
        if k1 == "ANALYZE":
            return self._analyze(stmt, masked)
        if k1 == "FSCK":
            return self._fsck(stmt, masked)
        if k1 == "EXPORT":
            return self._export(stmt, masked)
        if k1 == "PURGE":
            return self._purge(stmt, masked)
        raise SqlFrontendError(
            f"unsupported statement {k1 + (' ' + k2 if k2 else '')!r}; supported: "
            "SELECT/WITH, INSERT INTO, UPDATE, DELETE FROM, MERGE INTO, "
            "CREATE TABLE [AS SELECT | SHALLOW CLONE], DROP TABLE, COPY "
            "INTO, TRUNCATE TABLE, "
            "CREATE/REFRESH/DROP MATERIALIZED VIEW, CREATE/REFRESH/DROP "
            "INDEX, SHOW TABLES, SHOW CREATE "
            "TABLE, SHOW MATERIALIZED VIEWS, SHOW INDEXES ON <t>, "
            "OPTIMIZE [ZORDER BY], ANALYZE "
            "TABLE, VACUUM, RESTORE, DESCRIBE [TABLE]/HISTORY/DETAIL, ALTER TABLE, "
            "PURGE TABLE ... KEYS, BEGIN/COMMIT/ROLLBACK"
        )

    # --------------------------------------------------------- transactions

    def _begin(self, stmt: str, masked: str) -> DataFrame:
        """BEGIN [TRANSACTION] — subsequent INSERT/MERGE statements STAGE
        their commits (merge_into publish=False: data files durable,
        version chain untouched, readers see nothing) until COMMIT
        publishes every member atomically w.r.t. crashes through
        lakette/txn.py's publish_transaction, or ROLLBACK discards them.

        Scope, stated plainly (v1):
          * INSERT and MERGE only — the statements that already compile
            onto merge_into's write-audit-publish path. UPDATE/DELETE/
            COPY/DDL inside a transaction raise, naming this rule.
          * ONE write statement per table per transaction
            (publish_transaction's own invariant — a second staged commit
            on the same table would conflict with the first at publish).
          * reads inside the transaction see the PRE-transaction state
            (no dirty reads — staged work is invisible by design; audit
            a staged member via table.staged_snapshot if needed).
          * atomicity is against CRASHES, exactly txn.py's contract: a
            conflicting concurrent writer after the commit flip leaves
            the published subset visible and recover_transactions
            retries the rest."""
        if not re.match(r"BEGIN(\s+TRANSACTION)?\s*$", masked, re.IGNORECASE):
            raise SqlFrontendError("supported: BEGIN [TRANSACTION]")
        if self._txn is not None:
            raise SqlFrontendError(
                f"transaction {self._txn['id']} already open (no nesting); "
                "COMMIT or ROLLBACK first"
            )
        self._txn = {"id": uuid.uuid4().hex[:16], "members": [], "roots": set()}
        return self._report("BEGIN", "", {"txn_id": self._txn["id"]})

    def _merge_call(self, table: LaketteTable, events: DataFrame, *,
                    query_id: str):
        """All statement writes funnel here: direct merge_into outside a
        transaction, staged (publish=False) inside one."""
        if self._txn is None:
            return merge_into(self.spark, table, events, query_id=query_id)
        if table.root in self._txn["roots"]:
            raise SqlFrontendError(
                f"transaction {self._txn['id']} already staged a write to "
                f"{table.root!r} — one write statement per table per "
                "transaction (fold the changes into one statement)"
            )
        stats = merge_into(
            self.spark, table, events,
            query_id=f"sql_txn_{self._txn['id']}",
            epoch=len(self._txn["members"]),
            publish=False,
        )
        self._txn["members"].append((table, stats.stage_id))
        self._txn["roots"].add(table.root)
        return stats

    def _commit_txn(self, stmt: str, masked: str) -> DataFrame:
        if not re.match(r"COMMIT(\s+TRANSACTION)?\s*$", masked, re.IGNORECASE):
            raise SqlFrontendError("supported: COMMIT [TRANSACTION]")
        if self._txn is None:
            raise SqlFrontendError("COMMIT without BEGIN")
        txn, self._txn = self._txn, None
        if not txn["members"]:
            return self._report("COMMIT", "", {
                "txn_id": txn["id"], "members": 0,
            })
        from .lakette.txn import publish_transaction

        first = txn["members"][0][0]
        txn_dir = self._txn_dir
        if txn_dir is None:
            txn_dir = (
                self._catalog.txn_dir
                if not isinstance(self._catalog, Mapping)
                else os.path.join(first.root, "_txn_sql")
            )
        # on failure, publish_transaction's own contract governs partial
        # states (pre-flip: nothing published, staged intact, record
        # aborted; post-flip: recover_transactions retries the rest) —
        # the front-end adds nothing; the transaction is no longer open
        record = publish_transaction(
            txn["members"], txn_dir, txn_id=txn["id"], storage=first.fs
        )
        return self._report("COMMIT", "", {
            "txn_id": txn["id"], "members": len(record["members"]),
            "versions": ",".join(
                f"{os.path.basename(m['root'])}:v{m['published_version']}"
                for m in record["members"]
            ),
        })

    def _rollback(self, stmt: str, masked: str) -> DataFrame:
        if not re.match(r"ROLLBACK(\s+TRANSACTION)?\s*$", masked, re.IGNORECASE):
            raise SqlFrontendError("supported: ROLLBACK [TRANSACTION]")
        if self._txn is None:
            raise SqlFrontendError("ROLLBACK without BEGIN")
        txn, self._txn = self._txn, None
        for table, stage_id in txn["members"]:
            table.abort_staged(stage_id)
        return self._report("ROLLBACK", "", {
            "txn_id": txn["id"], "aborted_members": len(txn["members"]),
        })

    # -------------------------------------------------------------- scripts

    def run_script(self, script: str) -> DataFrame:
        """Execute a multi-statement SQL script (statements separated by
        top-level `;` — semicolons inside strings or parens never split)
        and return the LAST statement's result. Statements run strictly
        in order through sql(), so a script mixes DDL, DML, transactions
        and queries exactly as the statements would interactively; the
        first error aborts the remainder (an open BEGIN stays open —
        ROLLBACK explicitly, same as an interactive session)."""
        body = _strip_comments(script)
        parts = _split_top(body, _mask_strings(body), sep=";")
        if not parts:
            raise SqlFrontendError("empty script")
        result: DataFrame | None = None
        for part in parts:
            result = self.sql(part)
        return result

    # ------------------------------------------------------------- reports

    def _report(self, op: str, table: str, fields: dict[str, Any]) -> DataFrame:
        rows = [(op, table) + tuple(str(v) for v in fields.values())]
        schema = T.StructType(
            [T.StructField("statement", T.StringType()), T.StructField("table", T.StringType())]
            + [T.StructField(k, T.StringType()) for k in fields]
        )
        return self.spark.createDataFrame(rows, schema)

    # -------------------------------------------------------------- SELECT

    #: FROM/JOIN <ident> [VERSION AS OF <n>|'<tag-or-branch>' |
    #: TIMESTAMP AS OF '<ts>']; a leading "," continues a comma-separated
    #: FROM list (matched only when chained directly off a previous table
    #: reference — see _select)
    _REF = re.compile(
        rf"\b(FROM|JOIN)\s+({_IDENT})"
        r"(\s+VERSION\s+AS\s+OF\s+(\d+|'[^']*')|\s+TIMESTAMP\s+AS\s+OF\s+('[^']*'))?",
        re.IGNORECASE,
    )
    _REF_COMMA = re.compile(
        rf"\s*,\s*({_IDENT})"
        r"(\s+VERSION\s+AS\s+OF\s+(\d+|'[^']*')|\s+TIMESTAMP\s+AS\s+OF\s+('[^']*'))?",
        re.IGNORECASE,
    )
    #: names bound by a WITH clause (CTEs) — `x AS (` can only be a CTE
    #: head or a window/alias-with-parens position, never a column alias,
    #: so treating every such name as a potential CTE is safe: the worst
    #: case is leaving an identifier for Spark to resolve loudly
    _CTE = re.compile(rf"\b({_IDENT})\s+AS\s*\(", re.IGNORECASE)

    #: tokens that can directly follow a table reference — anything else
    #: in that position is a user table alias
    _POST_REF_KEYWORDS = frozenset((
        "where", "join", "on", "group", "order", "limit", "union", "except",
        "intersect", "having", "window", "left", "right", "full", "inner",
        "cross", "natural", "semi", "anti", "lateral", "tablesample",
        "pivot", "unpivot", "qualify", "when", "using", "distribute",
        "cluster", "sort", "values", "matched", "set", "then",
    ))

    @classmethod
    def _cte_scopes(cls, masked: str) -> list[tuple[str, int]]:
        """(name, in-scope-from-position) for each CTE-shaped definition:
        a CTE shadows references AFTER its own body's closing paren
        (standard non-recursive scoping — inside its own body the name
        still means the base table; chained CTEs see earlier ones)."""
        scopes = []
        for m in cls._CTE.finditer(masked):
            depth, j = 0, m.end() - 1  # position of the '('
            while j < len(masked):
                if masked[j] == "(":
                    depth += 1
                elif masked[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            scopes.append((m.group(1).lower(), j))
        return scopes

    _BLOCK_TOKENS = re.compile(
        r"[()]|\b(?:WHERE|GROUP|HAVING|QUALIFY|WINDOW|ORDER|LIMIT|"
        r"DISTRIBUTE|CLUSTER|SORT|UNION|INTERSECT|EXCEPT)\b",
        re.IGNORECASE,
    )

    @classmethod
    def _top_conjuncts(cls, stmt: str, masked: str) -> list[tuple[str, str]] | None:
        """The top-level WHERE's AND-conjuncts [(text, masked)], or None
        when the statement has no top-level WHERE or has a top-level set
        operation (each branch owns its own WHERE, so no conjunct is
        statement-global). Conjuncts inside parens — subqueries, OR
        groups, CTE bodies — never surface here, which is exactly the
        soundness boundary index acceleration needs: only a predicate
        that EVERY result row must satisfy may prune a table's scan. A
        BETWEEN's own AND stays inside its conjunct."""
        depth, start, end = 0, None, len(masked)
        for m in cls._BLOCK_TOKENS.finditer(masked):
            tok = m.group(0)
            if tok == "(":
                depth += 1
                continue
            if tok == ")":
                depth -= 1
                continue
            if depth:
                continue
            up = tok.upper()
            if up in ("UNION", "INTERSECT", "EXCEPT"):
                return None
            if up == "WHERE":
                if start is None:
                    start = m.end()
            elif start is not None and end == len(masked):
                end = m.start()
        if start is None:
            return None
        body, mbody = stmt[start:end], masked[start:end]
        parts, d, seg, pending = [], 0, 0, 0
        for m in re.finditer(r"[()]|\b(?:AND|BETWEEN)\b", mbody, re.IGNORECASE):
            t = m.group(0)
            if t == "(":
                d += 1
            elif t == ")":
                d -= 1
            elif d == 0:
                if t.upper() == "BETWEEN":
                    pending += 1
                elif pending:
                    pending -= 1
                else:
                    parts.append((body[seg:m.start()], mbody[seg:m.start()]))
                    seg = m.end()
        parts.append((body[seg:], mbody[seg:]))
        return [(a.strip(), b.strip()) for a, b in parts if a.strip()]

    def _multi_relation(self, masked: str) -> bool:
        """True when the statement can reference more than one relation —
        the gate that makes index acceleration require an alias-QUALIFIED
        conjunct (an unqualified column in a join could belong to either
        side). Conservative by design: a false positive only forgoes the
        optimization, never changes results."""
        if len(self._REF.findall(masked)) > 1:
            return True
        if re.search(r"\bJOIN\b|\b(?:FROM|JOIN)\s*\(", masked, re.IGNORECASE):
            return True
        # FROM-list commas: `FROM a, b` / `FROM a AS x, b`, also after a
        # time-travel clause
        return bool(re.search(
            rf"\bFROM\s+{_IDENT}(?:\s+VERSION\s+AS\s+OF\s+(?:\d+|'[^']*')"
            rf"|\s+TIMESTAMP\s+AS\s+OF\s+'[^']*')?"
            rf"(?:\s+(?:AS\s+)?[A-Za-z_]\w*)?\s*,",
            masked, re.IGNORECASE,
        ))

    def _select(self, stmt: str, masked: str) -> DataFrame:
        """Register each referenced lakette table (at its requested
        version) as a temp view, splice the view name into the statement,
        and hand the result to Catalyst. The snapshot is a lazy plan —
        filter/column pushdown into the parquet scan happens exactly as on
        the DataFrame path. View names are deterministic per (table,
        version), so repeated statements re-register (picking up new
        commits) instead of leaking one view per call. CTE names shadow
        lakette tables, per SQL scoping.

        Point-lookup acceleration: a table read at its CURRENT version
        whose registered secondary index (CREATE INDEX) matches a
        top-level WHERE conjunct gets an index-pruned view instead — a
        superset frame (index-matched keys' buckets, semi-joined to the
        matched keys), so the statement's own WHERE still decides the
        rows; only the files opened change. `last_index_accel` records
        each rewrite for observability/tests; every safety gate falls
        back to the full snapshot view (sqlindex.accelerate)."""
        scopes = self._cte_scopes(masked)
        self.last_index_accel = []
        conjuncts = self._top_conjuncts(stmt, masked)
        multi = self._multi_relation(masked)
        out, last = [], 0

        def _shadowed(name: str, pos: int) -> bool:
            return any(n == name.lower() and pos > body_end for n, body_end in scopes)

        def _splice(ident_span, tt_groups, end):
            nonlocal last
            ident = stmt[ident_span[0]:ident_span[1]]
            # Iceberg-style metadata tables: <table>.files / .history /
            # .refs — plus .changes, the CDC feed (Delta table_changes):
            # FROM t.changes VERSION AS OF <n>|'<tag>' reads the span
            # turning snapshot@n into the CURRENT snapshot through
            # changes_since (change/keys/payload/seq columns, full rows)
            base, dot, suffix = ident.rpartition(".")
            if (dot and suffix.lower() in ("files", "history", "refs", "changes")
                    and self._is_table(base) and not _shadowed(base, ident_span[0])):
                if suffix.lower() == "changes":
                    table = self._table(base)
                    version_span, ts_span = tt_groups
                    if ts_span is not None:
                        from_v = table.version_as_of(
                            _unquote(stmt[ts_span[0]:ts_span[1]])
                        )
                    elif version_span is not None:
                        vtext = stmt[version_span[0]:version_span[1]]
                        from_v = (
                            table.ref_version(_unquote(vtext))
                            if vtext.startswith("'") else int(vtext)
                        )
                    else:
                        raise SqlFrontendError(
                            f"{ident}: the change feed needs its starting "
                            "offset — FROM <t>.changes VERSION AS OF "
                            "<n>|'<tag>' [TO <m>|'<tag>'] (or TIMESTAMP "
                            "AS OF '<ts>')"
                        )
                    from .operators.changes import changes_since, snapshot_diff

                    # optional bounded span (Delta table_changes(start, end)
                    # parity): ... VERSION AS OF <n> TO <m>|'<tag>'
                    to_m = re.match(
                        r"\s*TO\s+(\d+|'[^']*')", masked[end:], re.IGNORECASE
                    )
                    if to_m:
                        vtext2 = stmt[end + to_m.start(1): end + to_m.end(1)]
                        to_v = (
                            table.ref_version(_unquote(vtext2))
                            if vtext2.startswith("'") else int(vtext2)
                        )
                        end += to_m.end()
                        cur_v = to_v
                        diff = snapshot_diff(
                            self.spark, table, from_v, to_v, full_rows=True
                        )
                    else:
                        cur_v, diff = changes_since(
                            self.spark, table, from_v, full_rows=True
                        )
                    view = f"__lakette_{base.lower()}__changes_{from_v}_{cur_v}"
                    diff.createOrReplaceTempView(view)
                    out.append(stmt[last:ident_span[0]])
                    out.append(view)
                    nxt = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)",
                                   masked[end:], re.IGNORECASE)
                    if not (nxt and nxt.group(1).lower() not in self._POST_REF_KEYWORDS):
                        out.append(" AS changes")
                    last = end
                    return True
                view = f"__lakette_{base.lower()}__{suffix.lower()}"
                self._meta_df(self._table(base), suffix.lower()) \
                    .createOrReplaceTempView(view)
                out.append(stmt[last:ident_span[0]])
                out.append(view)
                nxt = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)",
                               masked[end:], re.IGNORECASE)
                if not (nxt and nxt.group(1).lower() not in self._POST_REF_KEYWORDS):
                    out.append(f" AS {suffix.lower()}")
                last = end
                return True
            if not self._is_table(ident) or _shadowed(ident, ident_span[0]):
                return False
            version_span, ts_span = tt_groups
            table = self._table(ident)
            if ts_span is not None:
                version = table.version_as_of(_unquote(stmt[ts_span[0]:ts_span[1]]))
            elif version_span is not None:
                vtext = stmt[version_span[0]:version_span[1]]
                # quoted: a named tag/branch (Iceberg-style ref time travel)
                version = (
                    table.ref_version(_unquote(vtext))
                    if vtext.startswith("'") else int(vtext)
                )
            else:
                version = int(table.current_metadata()["version"])
            # keep qualified column refs (`repos.path`) resolving: alias
            # the view back to the original name — unless the user wrote
            # their own alias right after the reference
            nxt = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)", masked[end:], re.IGNORECASE)
            user_alias = (
                nxt.group(1)
                if nxt and nxt.group(1).lower() not in self._POST_REF_KEYWORDS
                else None
            )
            alias = user_alias or ident.split(".")[-1]
            accel = None
            if conjuncts and version_span is None and ts_span is None:
                from . import sqlindex

                accel = sqlindex.accelerate(
                    self.spark, table, version, conjuncts, [alias], multi
                )
            if accel is not None:
                df, info = accel
                # the counter keeps a self-join's two rewrites (different
                # aliases, different conjuncts) from sharing one view
                view = (
                    f"__lakette_{ident.lower().replace('.', '_')}_v{version}"
                    f"_ix{len(self.last_index_accel)}"
                )
                df.createOrReplaceTempView(view)
                self.last_index_accel.append({"table": ident, **info})
            else:
                view = f"__lakette_{ident.lower().replace('.', '_')}_v{version}"
                table.create_or_replace_view(self.spark, view, version=version)
            out.append(stmt[last:ident_span[0]])
            out.append(view)
            if user_alias is None:
                out.append(f" AS {ident.split('.')[-1]}")
            last = end
            return True

        pos = 0
        while True:
            m = self._REF.search(masked, pos)
            if not m:
                break
            hit = _splice(
                (m.start(2), m.end(2)),
                ((m.start(4), m.end(4)) if m.group(4) else None,
                 (m.start(5), m.end(5)) if m.group(5) else None),
                m.end(0),
            )
            pos = m.end(0)
            # comma-separated FROM list: "FROM a, b, c" — keep consuming
            # only while chained directly off this reference (commas in
            # select lists / function args never sit at this position)
            while hit or m.group(1).upper() == "FROM":
                cm = self._REF_COMMA.match(masked, pos)
                if not cm:
                    break
                _splice(
                    (cm.start(1), cm.end(1)),
                    ((cm.start(3), cm.end(3)) if cm.group(3) else None,
                     (cm.start(4), cm.end(4)) if cm.group(4) else None),
                    cm.end(0),
                )
                pos = cm.end(0)
        out.append(stmt[last:])
        return self.spark.sql("".join(out))

    def _meta_df(self, table: LaketteTable, kind: str) -> DataFrame:
        """Metadata tables behind the `<name>.files/.history/.refs` SQL
        suffixes — each a driver-side metadata read, no data scan."""
        if kind == "files":
            return table.files_df(self.spark)
        if kind == "history":
            return table.history_df(self.spark)
        refs = table.list_refs()
        return self.spark.createDataFrame(
            [(r["name"], r["kind"], int(r["version"])) for r in refs],
            "name string, kind string, version long",
        )

    # -------------------------------------------------------------- INSERT

    def _next_seq(self, table: LaketteTable) -> int:
        """Mint the next LWW seq: live max(seq) + 1 from per-file smax
        manifest stats when every live file carries them; files written
        before smax stats existed (pre-r4 metadata) force the exact
        fallback — one narrow max(seq) aggregate over the snapshot —
        because treating a stats-less file as seq 0 could mint a seq the
        statement's rows silently LOSE arbitration with."""
        files = table.plan_files()
        if not files:
            return 1
        if all(f.get("smax") is not None for f in files):
            return max(f["smax"] for f in files) + 1
        row = (
            table.snapshot(self.spark, include_deleted=True)  # tombstone seqs count
            .agg(F.max("seq").alias("m")).collect()[0]
        )
        return int(row.m or 0) + 1

    def _events_from(self, table: LaketteTable, df: DataFrame, op: str, seq: int,
                     *, strict: bool = True) -> DataFrame:
        """Shape an arbitrary relation into the table's event envelope:
        key cols required, payload cols by name, absent payload -> typed
        NULL. `strict` rejects unknown columns (INSERT); MERGE passes
        strict=False because its source legitimately carries
        condition-only columns, which are simply not written."""
        user = table.user_schema()
        allowed = {f.name: f.dataType for f in user.fields}
        unknown = [c for c in df.columns if c not in allowed]
        if unknown and strict:
            raise SqlFrontendError(
                f"columns {unknown} not in table schema {sorted(allowed)}"
            )
        missing_keys = [k for k in table.key_cols() if k not in df.columns]
        if missing_keys:
            raise SqlFrontendError(f"statement must supply key columns {missing_keys}")
        cols = [
            (F.col(f.name) if f.name in df.columns else F.lit(None))
            .cast(f.dataType).alias(f.name)
            for f in user.fields
        ]
        return df.select(
            F.lit(op).alias("op"), F.lit(seq).cast("long").alias("seq"), *cols
        )

    def _insert(self, stmt: str, masked: str) -> DataFrame:
        m = re.match(
            rf"INSERT\s+(INTO|OVERWRITE)\s+({_IDENT})\s*(\(([^)]*)\))?\s*"
            r"(VALUES\b|SELECT\b|WITH\b)",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError(
                "supported: INSERT INTO|OVERWRITE <t> [(cols)] SELECT ... | "
                "INSERT INTO <t> (cols) VALUES (...), (...)"
            )
        overwrite = m.group(1).upper() == "OVERWRITE"
        table = self._table(stmt[m.start(2):m.end(2)])
        tail = stmt[m.start(5):]
        kw = m.group(5).upper()
        if kw == "VALUES":
            if overwrite:
                raise SqlFrontendError(
                    "INSERT OVERWRITE takes a SELECT (replacing a table "
                    "with literals is almost always a mistake — spell it "
                    "as INSERT OVERWRITE t SELECT ... FROM VALUES ...)"
                )
            collist = stmt[m.start(4):m.end(4)] if m.group(4) else None
            if not collist:
                raise SqlFrontendError(
                    "INSERT ... VALUES requires an explicit column list: "
                    "INSERT INTO t (c1, c2) VALUES (...)"
                )
            src = self.spark.sql(f"SELECT * FROM {tail} AS __v({collist})")
        else:
            if m.group(4):
                raise SqlFrontendError(
                    "column list is only supported with VALUES; alias the "
                    "SELECT's output columns instead"
                )
            src = self._select(tail, _mask_strings(tail))
        if all(k in src.columns for k in table.key_cols()):  # else _events_from raises
            dup = (
                src.groupBy(*table.key_cols()).count()
                .filter(F.col("count") > 1).limit(1).collect()
            )
            if dup:
                k = {c: dup[0][c] for c in table.key_cols()}
                raise SqlFrontendError(
                    f"INSERT source contains duplicate key rows (e.g. {k}); "
                    "the statement's rows share one minted seq, so the "
                    "survivor would be arbitrary — deduplicate first"
                )
        seq = self._next_seq(table)
        events = self._events_from(table, src, "U", seq)
        if overwrite:
            # INSERT OVERWRITE on a keyed CDC table: the new rows upsert
            # AND every stored key absent from the source is tombstoned —
            # one event frame, ONE commit, so the replacement is atomic
            # and versioned (time travel / RESTORE see the old state).
            # Cost: one anti-join over the live snapshot, the same
            # O(live table) price MERGE's NOT MATCHED BY SOURCE pays.
            key_cols = table.key_cols()
            gone = table.snapshot(self.spark).join(
                src.select(*key_cols), on=key_cols, how="left_anti"
            )
            events = events.unionByName(
                self._events_from(table, gone.select(*key_cols), "D", seq)
            )
        stats = self._merge_call(table, events,
                                 query_id=f"sql_insert_{uuid.uuid4().hex[:8]}")
        return self._report(
            "INSERT OVERWRITE" if overwrite else "INSERT", table.root, {
                "version": stats.version, "rows": stats.batch_rows, "seq": seq,
                **({"staged": stats.stage_id} if stats.stage_id else {}),
            })

    # ------------------------------------------------------- UPDATE/DELETE

    def _update(self, stmt: str, masked: str) -> DataFrame:
        m = re.match(
            rf"UPDATE\s+({_IDENT})\s+SET\s+", masked, re.IGNORECASE
        )
        if not m:
            raise SqlFrontendError("supported: UPDATE <t> SET c = expr, ... [WHERE pred]")
        table = self._table(stmt[m.start(1):m.end(1)])
        rest, mrest = stmt[m.end(0):], masked[m.end(0):]
        w = re.search(r"\bWHERE\b", mrest, re.IGNORECASE)
        set_part = rest[: w.start()] if w else rest
        pred = rest[w.end():].strip() if w else "true"
        sets: dict[str, str] = {}
        for piece in _split_top(set_part, _mask_strings(set_part)):
            pm = re.match(rf"({_IDENT})\s*=\s*(.+)$", piece, re.DOTALL)
            if not pm:
                raise SqlFrontendError(f"cannot parse SET assignment {piece!r}")
            sets[pm.group(1)] = pm.group(2).strip()
        report = update_where(self.spark, table, sets, pred)
        return self._report("UPDATE", table.root, report)

    def _delete(self, stmt: str, masked: str) -> DataFrame:
        # anchor strictly: anything between the table name and WHERE (or
        # end) is a parse error, NOT an implicit full-table delete — a
        # typo'd WHERE must never silently tombstone the whole table
        m = re.match(
            rf"DELETE\s+FROM\s+({_IDENT})\s*(?:$|WHERE\b(.*))",
            masked, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise SqlFrontendError(
                "supported: DELETE FROM <t> [WHERE pred] — unparsed text "
                "after the table name (a full-table delete must spell out "
                "WHERE true)"
            )
        table = self._table(stmt[m.start(1):m.end(1)])
        pred = stmt[m.start(2):m.end(2)].strip() if m.group(2) is not None else "true"
        if m.group(2) is not None and not pred:
            raise SqlFrontendError("DELETE: empty WHERE predicate")
        report = delete_where(self.spark, table, pred)
        return self._report("DELETE", table.root, report)

    # --------------------------------------------------------------- MERGE

    _WHEN = re.compile(
        r"\bWHEN\s+(NOT\s+)?MATCHED(?:\s+BY\s+(SOURCE|TARGET))?\b(\s+AND\b)?",
        re.IGNORECASE,
    )
    _ACTION = re.compile(
        r"\bTHEN\s+(UPDATE\s+SET\s+\*|DELETE|INSERT\s+\*|UPDATE\s+SET\b|INSERT\b)",
        re.IGNORECASE,
    )

    #: columns a MERGE assignment may never target (same set as dml.py —
    #: seq is minted per statement, content_sha derived by merge_into)
    _MERGE_ENGINE_COLS = frozenset(("seq", "content_sha", "deleted", "col_seqs"))

    def _merge(self, stmt: str, masked: str) -> DataFrame:
        m = re.match(
            rf"MERGE\s+INTO\s+({_IDENT})(?:\s+(?:AS\s+)?({_IDENT}))?\s+USING\s+",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError(
                "supported: MERGE INTO <t> [alias] USING <src|(subquery)> [alias] "
                "ON <key equalities> WHEN MATCHED [AND cond] THEN UPDATE SET "
                "*|c=e,... | DELETE / WHEN NOT MATCHED [AND cond] THEN INSERT "
                "*|(cols) VALUES (exprs) / WHEN NOT MATCHED BY SOURCE [AND "
                "cond] THEN DELETE | UPDATE SET c=e,..."
            )
        table = self._table(stmt[m.start(1):m.end(1)])
        t_alias = stmt[m.start(2):m.end(2)] if m.group(2) else stmt[m.start(1):m.end(1)]
        pos = m.end(0)
        # source: parenthesized subquery or identifier
        if masked[pos] == "(":
            depth, j = 0, pos
            while j < len(masked):
                if masked[j] == "(":
                    depth += 1
                elif masked[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            sub = stmt[pos + 1:j]
            src = self._select(sub, _mask_strings(sub))
            pos = j + 1
            src_ident = None
        else:
            sm = re.match(rf"({_IDENT})", masked[pos:])
            src_ident = stmt[pos + sm.start(1):pos + sm.end(1)]
            if self._is_table(src_ident):
                src = self._table(src_ident).snapshot(self.spark)
            else:
                src = self.spark.table(src_ident)
            pos += sm.end(1)
        am = re.match(rf"\s*(?:AS\s+)?({_IDENT})?\s*\bON\b", masked[pos:], re.IGNORECASE)
        if not am:
            raise SqlFrontendError("MERGE: expected [alias] ON <condition> after USING source")
        if am.group(1) and am.group(1).upper() != "ON":
            s_alias = stmt[pos + am.start(1):pos + am.end(1)]
        else:
            # standard SQL: an unaliased named source is referenced by its
            # own name in ON/conditions; only a subquery needs the fallback
            s_alias = src_ident if src_ident else "__src"
        pos += am.end(0)
        first_when = self._WHEN.search(masked, pos)
        if not first_when:
            raise SqlFrontendError("MERGE: at least one WHEN clause is required")
        on_sql = stmt[pos:first_when.start()].strip()
        self._check_on(on_sql, _mask_strings(on_sql), table, t_alias, s_alias)
        clauses = self._parse_when(stmt, masked, first_when.start(), table, t_alias)

        src = src.alias(s_alias)
        key_cols = table.key_cols()
        # all events of one statement share one minted seq, so duplicate
        # source keys would tie in LWW arbitration and survive arbitrarily
        # — Delta raises here ("multiple source rows matched") and so do we
        if all(k in src.columns for k in key_cols):  # else _events_from raises
            dup = (
                src.groupBy(*key_cols).count()
                .filter(F.col("count") > 1).limit(1).collect()
            )
            if dup:
                k = {c: dup[0][c] for c in key_cols}
                raise SqlFrontendError(
                    f"MERGE source contains duplicate key rows (e.g. {k}); "
                    "deduplicate the source (the statement's rows share one "
                    "minted seq, so the survivor would be arbitrary)"
                )
        seq = self._next_seq(table)

        plain_upsert = (
            len(clauses) == 2
            and {(c["branch"], c["action"]) for c in clauses}
            == {("matched", "update_star"), ("insert", "insert_star")}
            and all(c["cond"] is None for c in clauses)
        )
        if plain_upsert:
            # canonical upsert: matched-ness is irrelevant (merge_into's
            # own key join decides insert-vs-update) — ZERO extra joins
            events = self._events_from(table, src, "U", seq, strict=False)
        else:
            events = self._merge_events(table, src, t_alias, s_alias, clauses, seq)
        stats = self._merge_call(table, events,
                                 query_id=f"sql_merge_{uuid.uuid4().hex[:8]}")
        return self._report("MERGE", table.root, {
            "version": stats.version, "rows": stats.batch_rows, "seq": seq,
            **({"staged": stats.stage_id} if stats.stage_id else {}),
        })

    @staticmethod
    def _refs_alias(sql: str | None, alias: str) -> bool:
        return bool(sql) and bool(
            re.search(rf"\b{re.escape(alias)}\s*\.", _mask_strings(sql), re.IGNORECASE)
        )

    def _merge_events(
        self,
        table: LaketteTable,
        src: DataFrame,
        t_alias: str,
        s_alias: str,
        clauses: list[dict],
        seq: int,
    ) -> DataFrame:
        """Compile the general WHEN-clause matrix to one event frame.

        Three branches, each classified with ONE key join (bucket
        co-partitioned, key-only or payload scan as needed):

          matched            source ∩ target. A cheap LEFT SEMI join
                             suffices unless some clause needs the STORED
                             row (a column-level UPDATE SET keeps
                             unassigned columns, or a condition/assignment
                             references the target alias) — then the
                             branch joins the full target payload INNER on
                             the keys, and expressions see both aliases.
          insert             source ∖ target (LEFT ANTI on keys): INSERT *
                             or INSERT (cols) VALUES (exprs) over the
                             source row only.
          by_source          target ∖ source (LEFT ANTI on keys — the one
                             branch whose cost is O(live table), exactly
                             as in Delta): DELETE or column-level UPDATE
                             over the stored row only.

        Clause order is preserved per branch with NULL-condition
        fall-through; rows claiming no clause are no-ops. Every action
        compiles to whole-row events sharing the statement's minted seq —
        merge_into's LWW arbitration applies them exactly like any other
        batch."""
        key_cols = table.key_cols()
        user = table.user_schema()

        def _q(alias: str, col: str):
            return F.col(f"{alias}.{col}")

        def _field_exprs(c: dict, joined: bool) -> dict:
            """user-field name -> Column for one clause's event rows."""
            action = c["action"]
            out: dict = {}
            for f in user.fields:
                n = f.name
                if action == "insert_cols":
                    # every listed column (keys included) takes its VALUES
                    # expression; unlisted payload columns are NULL
                    out[n] = (
                        F.expr(c["assignments"][n])
                        if n in c["assignments"] else F.lit(None)
                    )
                elif n in key_cols:
                    # keys come from whichever side the branch carries
                    out[n] = _q(t_alias, n) if c["branch"] == "by_source" or (
                        c["branch"] == "matched" and joined
                    ) else _q(s_alias, n)
                elif action == "delete":
                    out[n] = F.lit(None)
                elif action in ("update_star", "insert_star"):
                    out[n] = (
                        _q(s_alias, n) if n in src.columns else F.lit(None)
                    )
                elif n in c["assignments"]:
                    out[n] = F.expr(c["assignments"][n])
                else:  # update_cols: unassigned columns keep STORED values
                    out[n] = _q(t_alias, n)
            return out

        def _envelope(frame: DataFrame, op: str, fields: dict) -> DataFrame:
            cols = [fields[f.name].cast(f.dataType).alias(f.name) for f in user.fields]
            return frame.select(
                F.lit(op).alias("op"), F.lit(seq).cast("long").alias("seq"), *cols
            )

        # does any matched clause need the stored row?
        needs_target = any(
            c["branch"] == "matched"
            and (
                c["action"] == "update_cols"
                or self._refs_alias(c["cond"], t_alias)
                or any(self._refs_alias(e, t_alias) for e in c.get("assignments", {}).values())
            )
            for c in clauses
        )
        branches: dict[str, DataFrame | None] = {}
        tgt = table.snapshot(self.spark).alias(t_alias)
        if any(c["branch"] == "matched" for c in clauses):
            if needs_target:
                on = [
                    _q(s_alias, k).eqNullSafe(_q(t_alias, k)) for k in key_cols
                ]
                branches["matched"] = src.join(tgt, on, "inner")
            else:
                branches["matched"] = src.join(
                    tgt.select(*key_cols), on=key_cols, how="left_semi"
                ).alias(s_alias)
        if any(c["branch"] == "insert" for c in clauses):
            branches["insert"] = src.join(
                tgt.select(*key_cols), on=key_cols, how="left_anti"
            ).alias(s_alias)
        if any(c["branch"] == "by_source" for c in clauses):
            if not all(k in src.columns for k in key_cols):
                raise SqlFrontendError(
                    "WHEN NOT MATCHED BY SOURCE needs the source to carry the "
                    f"key columns {key_cols} for the anti-join"
                )
            branches["by_source"] = tgt.join(
                src.select(*key_cols), on=key_cols, how="left_anti"
            ).alias(t_alias)

        parts: list[DataFrame] = []
        for branch, frame in branches.items():
            remaining = frame
            joined = branch == "matched" and needs_target
            for c in clauses:
                if c["branch"] != branch:
                    continue
                if branch in ("insert",) and (
                    self._refs_alias(c["cond"], t_alias)
                    or any(self._refs_alias(e, t_alias) for e in c.get("assignments", {}).values())
                ):
                    raise SqlFrontendError(
                        "WHEN NOT MATCHED clauses see the SOURCE row only "
                        f"(found target alias {t_alias!r})"
                    )
                if branch == "by_source" and (
                    self._refs_alias(c["cond"], s_alias)
                    or any(self._refs_alias(e, s_alias) for e in c.get("assignments", {}).values())
                ):
                    raise SqlFrontendError(
                        "WHEN NOT MATCHED BY SOURCE clauses see the TARGET row "
                        f"only (found source alias {s_alias!r})"
                    )
                hit = remaining.filter(F.expr(c["cond"])) if c["cond"] else remaining
                if c["cond"]:
                    # complement of "cond IS TRUE": a NULL condition does
                    # not claim the row, so it must FALL THROUGH to the
                    # next clause (standard MERGE clause ordering) —
                    # ~expr alone would drop NULL rows from `remaining`
                    remaining = remaining.filter(
                        ~F.coalesce(F.expr(c["cond"]), F.lit(False))
                    )
                else:
                    remaining = remaining.limit(0)
                op = "D" if c["action"] == "delete" else "U"
                if branch == "matched" and not joined:
                    # semi-joined frame: source columns only, by name
                    parts.append(
                        self._events_from(table, hit, op, seq, strict=False)
                    )
                else:
                    parts.append(_envelope(hit, op, _field_exprs(c, joined)))
            # rows matching no clause: no-op (dropped)
        if not parts:
            raise SqlFrontendError("MERGE: no WHEN clause produced any action")
        events = parts[0]
        for p in parts[1:]:
            events = events.unionByName(p)
        return events

    def _check_on(self, on_sql: str, on_masked: str, table: LaketteTable,
                  t_alias: str, s_alias: str) -> None:
        """The ON condition must be the conjunction of `t.k = s.k` over
        exactly the table's key columns — anything else is not a keyed
        upsert and the engine refuses to guess."""
        covered: set[str] = set()
        for part in _split_top(
            re.sub(r"\bAND\b", "\x01", on_masked, flags=re.IGNORECASE),
            re.sub(r"\bAND\b", "\x01", on_masked, flags=re.IGNORECASE),
            sep="\x01",
        ):
            pm = re.match(
                rf"\s*({_IDENT})\s*\.\s*({_IDENT})\s*=\s*({_IDENT})\s*\.\s*({_IDENT})\s*$",
                part,
            )
            ok = False
            if pm:
                a1, c1, a2, c2 = pm.groups()
                # columns compare case-insensitively (SQL identifiers);
                # covered records the table's canonical key-column casing
                canon = {k.lower(): k for k in table.key_cols()}
                pair = {a1.lower(): c1.lower(), a2.lower(): c2.lower()}
                if (set(pair) == {t_alias.lower(), s_alias.lower()}
                        and pair[t_alias.lower()] == pair[s_alias.lower()]
                        and pair[t_alias.lower()] in canon):
                    covered.add(canon[pair[t_alias.lower()]])
                    ok = True
            if not ok:
                raise SqlFrontendError(
                    f"MERGE ON must be key equalities `{t_alias}.k = {s_alias}.k` "
                    f"ANDed over the key columns {table.key_cols()}; got {part.strip()!r}"
                )
        if set(covered) != set(table.key_cols()):
            raise SqlFrontendError(
                f"MERGE ON must cover exactly the key columns {table.key_cols()}; "
                f"got {sorted(covered)}"
            )

    def _parse_assignments(
        self, table: LaketteTable, t_alias: str, text: str
    ) -> dict[str, str]:
        """`c = expr, ...` -> {column: expr-SQL}; names may carry the
        target alias (Delta style `t.c = ...`); key/engine columns are
        not assignable (a key-changing update is a delete+insert: send
        events; seq/content_sha are engine-derived)."""
        sets: dict[str, str] = {}
        allowed = {f.name for f in table.user_schema().fields}
        for piece in _split_top(text, _mask_strings(text)):
            pm = re.match(rf"({_IDENT})\s*=\s*(.+)$", piece, re.DOTALL)
            if not pm:
                raise SqlFrontendError(f"cannot parse SET assignment {piece!r}")
            name = pm.group(1)
            if "." in name:
                qual, _, bare = name.rpartition(".")
                if qual.lower() != t_alias.lower():
                    raise SqlFrontendError(
                        f"SET target {name!r} must be a target column "
                        f"(optionally qualified with {t_alias!r})"
                    )
                name = bare
            if name in sets:
                raise SqlFrontendError(f"duplicate SET assignment for {name!r}")
            if name.lower() in self._MERGE_ENGINE_COLS:
                raise SqlFrontendError(
                    f"cannot assign engine column {name!r} (seq is minted per "
                    "statement, content_sha derived from content)"
                )
            if name in table.key_cols():
                raise SqlFrontendError(
                    f"cannot assign key column {name!r} — a key-changing "
                    "update is a delete+insert (send events)"
                )
            if name not in allowed:
                raise SqlFrontendError(
                    f"unknown SET column {name!r}; table columns: {sorted(allowed)}"
                )
            sets[name] = pm.group(2).strip()
        if not sets:
            raise SqlFrontendError("UPDATE SET requires at least one assignment")
        return sets

    def _parse_insert_cols(
        self, table: LaketteTable, body: str, mbody: str
    ) -> dict[str, str]:
        """`(c1, c2, ...) VALUES (e1, e2, ...)` -> {column: expr-SQL};
        the key columns must all be listed (they identify the new row)."""
        m = re.match(r"\s*\(([^)]*)\)\s*VALUES\s*\(", mbody, re.IGNORECASE)
        if not m:
            raise SqlFrontendError(
                "supported INSERT actions: INSERT * | INSERT (cols) VALUES (exprs)"
            )
        cols = [c.strip() for c in body[m.start(1):m.end(1)].split(",") if c.strip()]
        depth, j = 1, m.end()
        while j < len(mbody) and depth:
            if mbody[j] == "(":
                depth += 1
            elif mbody[j] == ")":
                depth -= 1
            j += 1
        if depth:
            raise SqlFrontendError("INSERT ... VALUES: unbalanced parentheses")
        vals_text, vals_masked = body[m.end():j - 1], mbody[m.end():j - 1]
        if body[j:].strip():
            raise SqlFrontendError(
                f"INSERT ... VALUES: unparsed trailing text {body[j:].strip()!r}"
            )
        exprs = _split_top(vals_text, vals_masked)
        if len(cols) != len(exprs):
            raise SqlFrontendError(
                f"INSERT column/value count mismatch ({len(cols)} vs {len(exprs)})"
            )
        allowed = {f.name for f in table.user_schema().fields}
        spec: dict[str, str] = {}
        for c, e in zip(cols, exprs):
            if c.lower() in self._MERGE_ENGINE_COLS:
                raise SqlFrontendError(f"cannot assign engine column {c!r}")
            if c not in allowed:
                raise SqlFrontendError(
                    f"unknown INSERT column {c!r}; table columns: {sorted(allowed)}"
                )
            if c in spec:
                raise SqlFrontendError(f"duplicate INSERT column {c!r}")
            spec[c] = e
        missing = [k for k in table.key_cols() if k not in spec]
        if missing:
            raise SqlFrontendError(
                f"INSERT (cols) VALUES must cover the key columns; missing {missing}"
            )
        return spec

    def _parse_when(
        self, stmt: str, masked: str, start: int, table: LaketteTable, t_alias: str
    ) -> list[dict]:
        """The WHEN-clause matrix (full Delta grammar):

            WHEN MATCHED [AND cond] THEN UPDATE SET * | UPDATE SET c=e,... | DELETE
            WHEN NOT MATCHED [BY TARGET] [AND cond] THEN INSERT * | INSERT (c,...) VALUES (e,...)
            WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE | UPDATE SET c=e,...

        -> [{branch: matched|insert|by_source, cond, action, assignments}]."""
        clauses = []
        whens = list(self._WHEN.finditer(masked, start))
        for i, w in enumerate(whens):
            end = whens[i + 1].start() if i + 1 < len(whens) else len(stmt)
            body = stmt[w.end():end]
            mbody = masked[w.end():end]
            act = self._ACTION.search(mbody)
            if not act:
                raise SqlFrontendError(f"MERGE: WHEN clause without THEN action: {body.strip()!r}")
            action_kw = re.sub(r"\s+", " ", act.group(1).upper())
            cond = body[: act.start()].strip() or None
            has_and = bool(w.group(3))
            if cond and not has_and:
                raise SqlFrontendError(f"MERGE: unparsed text before THEN: {cond!r}")
            is_not = w.group(1) is not None
            by = (w.group(2) or "").upper()
            if not is_not and by:
                raise SqlFrontendError(
                    f"WHEN MATCHED takes no BY {by} qualifier (BY SOURCE/TARGET "
                    "belongs to WHEN NOT MATCHED)"
                )
            branch = (
                "matched" if not is_not
                else ("by_source" if by == "SOURCE" else "insert")
            )
            tail = body[act.end():]
            assignments: dict[str, str] = {}
            if action_kw == "UPDATE SET *":
                action = "update_star"
                trailing = tail
            elif action_kw == "DELETE":
                action = "delete"
                trailing = tail
            elif action_kw == "INSERT *":
                action = "insert_star"
                trailing = tail
            elif action_kw == "UPDATE SET":
                action = "update_cols"
                assignments = self._parse_assignments(table, t_alias, tail)
                trailing = ""
            else:  # INSERT (cols) VALUES (exprs)
                action = "insert_cols"
                assignments = self._parse_insert_cols(table, tail, mbody[act.end():])
                trailing = ""
            if trailing.strip():
                raise SqlFrontendError(
                    f"MERGE: unparsed text after action: {trailing.strip()!r}"
                )
            legal = {
                "matched": ("update_star", "update_cols", "delete"),
                "insert": ("insert_star", "insert_cols"),
                "by_source": ("delete", "update_cols"),
            }[branch]
            if action not in legal:
                name = {"matched": "WHEN MATCHED", "insert": "WHEN NOT MATCHED",
                        "by_source": "WHEN NOT MATCHED BY SOURCE"}[branch]
                raise SqlFrontendError(
                    f"{name} supports {', '.join(legal)}; got {action}"
                )
            clauses.append({
                "branch": branch, "cond": cond, "action": action,
                "assignments": assignments,
            })
        return clauses

    # ---------------------------------------------------- CREATE/DROP TABLE

    #: TBLPROPERTIES the front-end compiles onto LaketteTable.create kwargs
    #: (value parser per key); anything else is a loud error, not a silent
    #: carry-along — lakette has no free-form property bag to stash it in
    _TBLPROPS = {
        "n_buckets": int,
        "target_file_rows": int,
        "column_lww": lambda v: {"true": True, "false": False}[v.lower()],
        "cluster_mode": str,
        "cluster_by": lambda v: [c.strip() for c in v.split(",") if c.strip()],
        "bloom_cols": lambda v: [c.strip() for c in v.split(",") if c.strip()],
        "stats_cols": lambda v: [c.strip() for c in v.split(",") if c.strip()],
    }

    @staticmethod
    def _paren_span(masked: str, pos: int) -> int:
        """Index one past the ')' closing the '(' at `pos`."""
        depth, j = 0, pos
        while j < len(masked):
            if masked[j] == "(":
                depth += 1
            elif masked[j] == ")":
                depth -= 1
                if depth == 0:
                    return j + 1
            j += 1
        raise SqlFrontendError("unbalanced parentheses")

    def _parse_tblprops(self, text: str, masked: str) -> dict:
        kwargs: dict = {}
        for piece in _split_top(text, masked):
            pm = re.match(r"\s*'([^']*)'\s*=\s*'", _mask_strings(piece))
            raw = re.match(r"\s*'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'\s*$", piece)
            if not (pm and raw):
                raise SqlFrontendError(
                    f"cannot parse TBLPROPERTIES entry {piece.strip()!r}; "
                    "expected 'key' = 'value'"
                )
            key = raw.group(1).lower()
            parse = self._TBLPROPS.get(key)
            if parse is None:
                raise SqlFrontendError(
                    f"unknown table property {key!r}; supported: "
                    f"{sorted(self._TBLPROPS)}"
                )
            try:
                kwargs[key] = parse(raw.group(2).replace("''", "'"))
            except (ValueError, KeyError):
                raise SqlFrontendError(
                    f"bad value {raw.group(2)!r} for table property {key!r}"
                ) from None
        return kwargs

    def _create(self, stmt: str, masked: str) -> DataFrame:
        """CREATE TABLE — explicit schema or CTAS, Delta-parity modifiers:

            CREATE TABLE [IF NOT EXISTS] <name>
                ( col TYPE, ..., PRIMARY KEY (k, ...) )
                [USING LAKETTE] [LOCATION '<path>'] [TBLPROPERTIES (...)]

            CREATE TABLE [IF NOT EXISTS] <name> PRIMARY KEY (k, ...)
                [USING LAKETTE] [LOCATION '<path>'] [TBLPROPERTIES (...)]
                AS SELECT ...

            CREATE TABLE [IF NOT EXISTS] <name> SHALLOW CLONE <src>
                [VERSION AS OF <n>|'<tag>' | TIMESTAMP AS OF '<ts>']
                [LOCATION '<path>']

        Divergence from Delta, stated: lakette tables are KEYED CDC
        tables, so PRIMARY KEY is REQUIRED (Delta OSS has no PK; here it
        is the merge arbitration identity). Column types parse through
        Spark's own DDL parser (`StructType.fromDDL`), so every Spark
        type — nested included — is accepted. LOCATION '<path>' makes an
        external table at that root; without it the table is MANAGED
        under `<catalog_root>/tables/<name>`, which requires the resolver
        to be a lakette Catalog (a plain dict has no root to manage
        under). CTAS seeds the new table through the same INSERT path
        (minted seq, duplicate-key check), so `CREATE ... AS SELECT`
        is exactly CREATE + INSERT INTO ... SELECT."""
        m = re.match(
            rf"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s*",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError(
                "supported: CREATE TABLE [IF NOT EXISTS] <name> (cols..., "
                "PRIMARY KEY (k,...)) [LOCATION '<path>'] [TBLPROPERTIES (...)]"
                " | CREATE TABLE <name> PRIMARY KEY (k,...) ... AS SELECT ..."
                " | CREATE TABLE <name> SHALLOW CLONE <src> [VERSION AS OF "
                "<n>|'<tag>' | TIMESTAMP AS OF '<ts>'] [LOCATION '<path>']"
            )
        name = stmt[m.start(2):m.end(2)]
        if_not_exists = m.group(1) is not None
        pos = m.end(0)

        clone_m = re.match(
            rf"SHALLOW\s+CLONE\s+({_IDENT})", masked[pos:], re.IGNORECASE
        )
        if clone_m:
            return self._create_clone(stmt, masked, name, if_not_exists,
                                      pos, clone_m)

        # ---- optional "( column defs )" (never the PRIMARY KEY clause)
        schema = None
        key_cols: list[str] | None = None
        if pos < len(masked) and masked[pos] == "(" and not re.match(
            r"\(\s*PRIMARY\b", masked[pos:], re.IGNORECASE
        ):
            end = self._paren_span(masked, pos)
            body, mbody = stmt[pos + 1:end - 1], masked[pos + 1:end - 1]
            schema, key_cols = self._parse_coldefs(body, mbody)
            pos = end

        # ---- modifiers, any order: PRIMARY KEY / USING / LOCATION / TBLPROPERTIES
        location = None
        props: dict = {}
        while True:
            ws = re.match(r"\s*", masked[pos:])
            pos += ws.end()
            if pos >= len(masked):
                break
            pk = re.match(r"PRIMARY\s+KEY\s*\(", masked[pos:], re.IGNORECASE)
            us = re.match(rf"USING\s+({_IDENT})", masked[pos:], re.IGNORECASE)
            loc = re.match(r"LOCATION\s+('(?:[^']|'')*')", masked[pos:], re.IGNORECASE)
            tp = re.match(r"TBLPROPERTIES\s*\(", masked[pos:], re.IGNORECASE)
            asq = re.match(r"AS\b", masked[pos:], re.IGNORECASE)
            if pk:
                if key_cols is not None:
                    raise SqlFrontendError("duplicate PRIMARY KEY clause")
                end = self._paren_span(masked, pos + pk.end() - 1)
                key_cols = [
                    c.strip() for c in stmt[pos + pk.end():end - 1].split(",")
                    if c.strip()
                ]
                pos = end
            elif us:
                fmt = stmt[pos + us.start(1):pos + us.end(1)]
                if fmt.lower() != "lakette":
                    raise SqlFrontendError(
                        f"USING {fmt} is not this engine; only USING LAKETTE "
                        "(or omit the clause)"
                    )
                pos += us.end()
            elif loc:
                if location is not None:
                    raise SqlFrontendError("duplicate LOCATION clause")
                location = _unquote(stmt[pos + loc.start(1):pos + loc.end(1)])
                pos += loc.end()
            elif tp:
                end = self._paren_span(masked, pos + tp.end() - 1)
                props = self._parse_tblprops(
                    stmt[pos + tp.end():end - 1], masked[pos + tp.end():end - 1]
                )
                pos = end
            elif asq:
                break
            else:
                raise SqlFrontendError(
                    f"CREATE TABLE: unparsed clause {stmt[pos:pos + 40].strip()!r}"
                )

        ctas_sql = None
        if pos < len(masked):
            am = re.match(r"AS\s+(SELECT|WITH)\b", masked[pos:], re.IGNORECASE)
            if not am:
                raise SqlFrontendError(
                    f"CREATE TABLE: unparsed trailing text {stmt[pos:pos + 40].strip()!r}"
                )
            if schema is not None:
                raise SqlFrontendError(
                    "CREATE TABLE AS SELECT takes its schema from the SELECT; "
                    "drop the column list (or create then INSERT)"
                )
            ctas_sql = stmt[pos + am.start(1):]

        if self._is_table(name):
            if if_not_exists:
                return self._report("CREATE TABLE", name, {
                    "created": False, "reason": "exists",
                })
            raise SqlFrontendError(
                f"table {name!r} already registered (use IF NOT EXISTS)"
            )

        src = None
        if ctas_sql is not None:
            src = self._select(ctas_sql, _mask_strings(ctas_sql))
            bad = [c for c in src.columns if c.lower() in self._MERGE_ENGINE_COLS
                   or c.lower() == "op"]
            if bad:
                raise SqlFrontendError(
                    f"CTAS SELECT output collides with engine columns {bad}; "
                    "alias them away"
                )
            schema = T.StructType([
                T.StructField(f.name, f.dataType, True) for f in src.schema.fields
            ])
        if schema is None:
            raise SqlFrontendError(
                "CREATE TABLE needs a column list or AS SELECT"
            )
        if not key_cols:
            raise SqlFrontendError(
                "lakette tables are keyed: declare PRIMARY KEY (cols) — it is "
                "the merge arbitration identity (Delta-divergence, documented)"
            )
        declared = {f.name.lower(): f.name for f in schema.fields}
        canon_keys = []
        for k in key_cols:
            if k.lower() not in declared:
                raise SqlFrontendError(
                    f"PRIMARY KEY column {k!r} is not a declared column "
                    f"({sorted(declared.values())})"
                )
            canon_keys.append(declared[k.lower()])

        # ---- resolve the root and create + register
        is_catalog = not isinstance(self._catalog, Mapping)
        if location is None:
            if not is_catalog:
                raise SqlFrontendError(
                    "managed tables need a lakette Catalog resolver; with a "
                    "plain table dict, give LOCATION '<path>'"
                )
            location = os.path.join(self._catalog.root, "tables", name.lower())
        if is_catalog:
            table = self._catalog.create_table(
                name, location, schema, canon_keys, **props
            )
        else:
            table = LaketteTable.create(location, schema, canon_keys, **props)
            try:
                self._catalog[name] = table
            except TypeError:
                raise SqlFrontendError(
                    f"created table at {location!r} but the resolver mapping "
                    "is read-only; register it yourself"
                ) from None

        fields: dict[str, Any] = {"created": True, "location": location,
                                  "key_cols": ",".join(canon_keys)}
        if src is not None:
            if all(k in src.columns for k in canon_keys):
                dup = (
                    src.groupBy(*canon_keys).count()
                    .filter(F.col("count") > 1).limit(1).collect()
                )
                if dup:
                    k = {c: dup[0][c] for c in canon_keys}
                    raise SqlFrontendError(
                        f"CTAS source contains duplicate key rows (e.g. {k}); "
                        "deduplicate first (rows share one minted seq)"
                    )
            events = self._events_from(table, src, "U", 1)
            stats = merge_into(self.spark, table, events,
                               query_id=f"sql_ctas_{uuid.uuid4().hex[:8]}")
            fields["rows"] = stats.batch_rows
            fields["version"] = stats.version
        return self._report("CREATE TABLE", name, fields)

    def _create_clone(
        self, stmt: str, masked: str, name: str, if_not_exists: bool,
        pos: int, clone_m,
    ) -> DataFrame:
        """CREATE TABLE [IF NOT EXISTS] <name> SHALLOW CLONE <src>
        [VERSION AS OF <n>|'<tag>' | TIMESTAMP AS OF '<ts>'] [LOCATION '<p>']

        Zero-copy clone (Delta SHALLOW CLONE syntax): compiles onto
        LaketteTable.shallow_clone — the clone's manifests reference the
        source's data files, no bytes move, and the cloned source version
        is PINNED with a tag so source vacuum can never eat the clone's
        files (the Delta hazard, closed by default; see shallow_clone's
        docstring). The clone registers under <name> like any other
        table; it is fully independent after birth (writes/compaction
        land in its own data/ dir)."""
        src = self._table(stmt[pos + clone_m.start(1):pos + clone_m.end(1)])
        pos += clone_m.end()
        version: int | None = None
        location = None
        while True:
            ws = re.match(r"\s*", masked[pos:])
            pos += ws.end()
            if pos >= len(masked):
                break
            vm = re.match(r"VERSION\s+AS\s+OF\s+(\d+|'[^']*')",
                          masked[pos:], re.IGNORECASE)
            tsm = re.match(r"TIMESTAMP\s+AS\s+OF\s+('[^']*')",
                           masked[pos:], re.IGNORECASE)
            loc = re.match(r"LOCATION\s+('(?:[^']|'')*')",
                           masked[pos:], re.IGNORECASE)
            if vm:
                if version is not None:
                    raise SqlFrontendError("duplicate AS OF clause")
                vtext = stmt[pos + vm.start(1):pos + vm.end(1)]
                version = (src.ref_version(_unquote(vtext))
                           if vtext.startswith("'") else int(vtext))
                pos += vm.end()
            elif tsm:
                if version is not None:
                    raise SqlFrontendError("duplicate AS OF clause")
                version = src.version_as_of(
                    _unquote(stmt[pos + tsm.start(1):pos + tsm.end(1)])
                )
                pos += tsm.end()
            elif loc:
                if location is not None:
                    raise SqlFrontendError("duplicate LOCATION clause")
                location = _unquote(stmt[pos + loc.start(1):pos + loc.end(1)])
                pos += loc.end()
            else:
                raise SqlFrontendError(
                    "SHALLOW CLONE: unparsed clause "
                    f"{stmt[pos:pos + 40].strip()!r}; supported: VERSION AS "
                    "OF <n>|'<tag>', TIMESTAMP AS OF '<ts>', LOCATION '<p>'"
                )
        if self._is_table(name):
            if if_not_exists:
                return self._report("CREATE TABLE", name, {
                    "created": False, "reason": "exists",
                })
            raise SqlFrontendError(
                f"table {name!r} already registered (use IF NOT EXISTS)"
            )
        is_catalog = not isinstance(self._catalog, Mapping)
        if location is None:
            if not is_catalog:
                raise SqlFrontendError(
                    "managed clones need a lakette Catalog resolver; with a "
                    "plain table dict, give LOCATION '<path>'"
                )
            location = os.path.join(self._catalog.root, "tables", name.lower())
        clone, pin = src.shallow_clone(
            location, version=version, storage=src.fs
        )
        if is_catalog:
            self._catalog.register(name, location)
        else:
            try:
                self._catalog[name] = clone
            except TypeError:
                raise SqlFrontendError(
                    f"cloned table at {location!r} but the resolver mapping "
                    "is read-only; register it yourself"
                ) from None
        meta = clone.current_metadata()
        return self._report("CREATE TABLE", name, {
            "created": True, "location": location,
            "cloned_from": src.root,
            "source_version": int(meta["clone_of"]["version"]),
            "pin": pin or "",
        })

    def _parse_coldefs(self, body: str, mbody: str) -> tuple[T.StructType, list[str] | None]:
        """`col TYPE, ..., PRIMARY KEY (k, ...)` -> (user schema, keys).
        Types go through Spark's own DDL parser, so anything Spark's
        `fromDDL` accepts (nested structs, arrays, maps, decimals) is a
        valid lakette column type."""
        key_cols: list[str] | None = None
        ddl_parts: list[str] = []
        for piece, mpiece in zip(
            _split_top(body, mbody),
            _split_top(mbody, mbody),
        ):
            pk = re.match(r"PRIMARY\s+KEY\s*\(([^)]*)\)\s*$", mpiece, re.IGNORECASE)
            if pk:
                if key_cols is not None:
                    raise SqlFrontendError("duplicate PRIMARY KEY clause")
                key_cols = [
                    c.strip() for c in piece[pk.start(1):pk.end(1)].split(",")
                    if c.strip()
                ]
                continue
            cm = re.match(rf"({_IDENT})\s+\S", mpiece)
            if not cm:
                raise SqlFrontendError(f"cannot parse column definition {piece.strip()!r}")
            colname = piece[cm.start(1):cm.end(1)]
            if colname.lower() in self._MERGE_ENGINE_COLS or colname.lower() == "op":
                raise SqlFrontendError(
                    f"column name {colname!r} is reserved for the engine "
                    "(op/seq/content_sha/deleted/col_seqs)"
                )
            ddl_parts.append(piece.strip())
        if not ddl_parts:
            raise SqlFrontendError("CREATE TABLE: empty column list")
        try:
            schema = T.StructType.fromDDL(", ".join(ddl_parts))
        except Exception as e:
            raise SqlFrontendError(f"cannot parse column types: {e}") from None
        return schema, key_cols

    def _drop(self, stmt: str, masked: str) -> DataFrame:
        """DROP TABLE [IF EXISTS] <name> — unregisters the name from the
        resolver (and, for a Catalog, releases its vacuum pin via
        Catalog.drop). METADATA-ONLY, exactly Catalog.drop's contract:
        the table directory and its data are untouched — deleting a
        physical table is the owner's call, made outside SQL."""
        m = re.match(
            rf"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?({_IDENT})\s*$",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError("supported: DROP TABLE [IF EXISTS] <name>")
        name = stmt[m.start(2):m.end(2)]
        canon = self._names().get(name.lower())
        if canon is None:
            if m.group(1):
                return self._report("DROP TABLE", name, {
                    "dropped": False, "reason": "not registered",
                })
            raise SqlFrontendError(
                f"unknown table {name!r} (use IF EXISTS); registered: "
                f"{sorted(self._names().values())}"
            )
        if isinstance(self._catalog, Mapping):
            try:
                del self._catalog[canon]
            except TypeError:
                raise SqlFrontendError(
                    "resolver mapping is read-only; drop the entry yourself"
                ) from None
        else:
            self._catalog.drop(canon)
        return self._report("DROP TABLE", canon, {"dropped": True})

    # ---------------------------------------------------- MATERIALIZED VIEW

    def _create_mview(self, stmt: str, masked: str) -> DataFrame:
        """CREATE MATERIALIZED VIEW [IF NOT EXISTS] <name>
        [LOCATION '<path>'] AS SELECT ... — an incrementally-maintained
        derived lakette table (sqlmview.py): the SELECT's shape picks the
        maintenance operator (derive / derive_agg / derive_join), the
        definition persists under the view's root, and REFRESH consumes
        changefeed spans exactly-once at O(changed) cost. The view IS a
        lakette table: SELECT, time travel, .files/.history, EXPORT all
        work on it; DML/INSERT into it is refused only by convention (the
        deriver's fingerprint guard catches a drifted state on refresh)."""
        m = re.match(
            rf"CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s*",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError(
                "supported: CREATE MATERIALIZED VIEW [IF NOT EXISTS] <name> "
                "[LOCATION '<path>'] AS SELECT ..."
            )
        name = stmt[m.start(2):m.end(2)]
        pos = m.end(0)
        location = None
        loc = re.match(r"LOCATION\s+('(?:[^']|'')*')\s*", masked[pos:], re.IGNORECASE)
        if loc:
            location = _unquote(stmt[pos + loc.start(1):pos + loc.end(1)])
            pos += loc.end()
        am = re.match(r"AS\s+(SELECT)\b", masked[pos:], re.IGNORECASE)
        if not am:
            raise SqlFrontendError(
                "CREATE MATERIALIZED VIEW needs AS SELECT ... "
                f"(unparsed: {stmt[pos:pos + 40].strip()!r})"
            )
        select_text = stmt[pos + am.start(1):]
        select_masked = masked[pos + am.start(1):]
        if self._is_table(name):
            if m.group(1):
                return self._report("CREATE MATERIALIZED VIEW", name, {
                    "created": False, "reason": "exists",
                })
            raise SqlFrontendError(
                f"name {name!r} already registered (use IF NOT EXISTS)"
            )
        is_catalog = not isinstance(self._catalog, Mapping)
        if location is None:
            if not is_catalog:
                raise SqlFrontendError(
                    "managed materialized views need a lakette Catalog "
                    "resolver; with a plain table dict, give LOCATION '<path>'"
                )
            location = os.path.join(self._catalog.root, "tables", name.lower())
        from . import sqlmview

        try:
            table, definition, report = sqlmview.create_mview(
                self.spark, name, location, select_text, select_masked,
                self._table, original_sql=stmt,
            )
        except sqlmview.MviewError as e:
            raise SqlFrontendError(f"CREATE MATERIALIZED VIEW: {e}") from None
        if is_catalog:
            self._catalog.register(name, location)
        else:
            try:
                self._catalog[name] = table
            except TypeError:
                raise SqlFrontendError(
                    f"created materialized view at {location!r} but the "
                    "resolver mapping is read-only; register it yourself"
                ) from None
        return self._report("CREATE MATERIALIZED VIEW", name, {
            "created": True, "location": location, "kind": definition["kind"],
            "rows": report["rows"], "src_version": report["src_version"],
        })

    def _refresh_mview(self, stmt: str, masked: str) -> DataFrame:
        """REFRESH MATERIALIZED VIEW <name> [FULL] — one incremental
        maintenance pass: consume the source changefeed spans since the
        last applied version and merge exactly-once (the derive operators'
        offsets and markers). Cost scales with CHANGED data; a
        vacuumed-past-offset source degrades to one resync epoch,
        reported, never corruption. The FULL variant forces a complete
        re-derivation (state-diff repair of out-of-band view drift) even
        when the view looks current — O(table), the explicit exception."""
        m = re.match(
            rf"REFRESH\s+MATERIALIZED\s+VIEW\s+({_IDENT})(\s+FULL)?\s*$",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError(
                "supported: REFRESH MATERIALIZED VIEW <name> [FULL]"
            )
        full = bool(m.group(2))
        name = stmt[m.start(1):m.end(1)]
        table = self._table(name)
        from . import sqlmview

        definition = sqlmview.read_definition(table)
        if definition is None:
            raise SqlFrontendError(
                f"{name!r} is not a materialized view (no _mview.json under "
                f"{table.root}) — REFRESH applies to CREATE MATERIALIZED "
                "VIEW tables only"
            )
        try:
            report = sqlmview.refresh_mview(
                self.spark, table.root, table.fs, definition, full=full
            )
        except sqlmview.MviewError as e:
            raise SqlFrontendError(f"REFRESH: {e}") from None
        if not isinstance(self._catalog, Mapping):
            # move the catalog pin forward so vacuum pinning tracks the
            # refreshed head (idempotent; no-op for dict resolvers)
            self._catalog.advance(self._names()[name.lower()])
        return self._report("REFRESH MATERIALIZED VIEW", table.root, report)

    def _drop_mview(self, stmt: str, masked: str) -> DataFrame:
        """DROP MATERIALIZED VIEW [IF EXISTS] <name> — unregisters the
        name (metadata-only, DROP TABLE's contract); the view's data and
        definition stay on disk for the owner to reclaim. Refuses plain
        tables (use DROP TABLE) so the two namespaces don't blur."""
        m = re.match(
            rf"DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?({_IDENT})\s*$",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError(
                "supported: DROP MATERIALIZED VIEW [IF EXISTS] <name>"
            )
        name = stmt[m.start(2):m.end(2)]
        canon = self._names().get(name.lower())
        if canon is None:
            if m.group(1):
                return self._report("DROP MATERIALIZED VIEW", name, {
                    "dropped": False, "reason": "not registered",
                })
            raise SqlFrontendError(
                f"unknown materialized view {name!r} (use IF EXISTS); "
                f"registered: {sorted(self._names().values())}"
            )
        from . import sqlmview

        if sqlmview.read_definition(self._table(canon)) is None:
            raise SqlFrontendError(
                f"{canon!r} is a plain table, not a materialized view — "
                "use DROP TABLE"
            )
        if isinstance(self._catalog, Mapping):
            try:
                del self._catalog[canon]
            except TypeError:
                raise SqlFrontendError(
                    "resolver mapping is read-only; drop the entry yourself"
                ) from None
        else:
            self._catalog.drop(canon)
        return self._report("DROP MATERIALIZED VIEW", canon, {"dropped": True})

    # -------------------------------------------------------------- indexes

    def _create_index(self, stmt: str, masked: str) -> DataFrame:
        """CREATE INDEX [IF NOT EXISTS] <name> ON <t> (<term_expr>)
        [WHERE <pred>] [LOCATION '<path>'] — a record-level secondary
        index: derive_index's derived lakette table keyed (term,
        *source_keys), registered under the source's root so point
        lookups (`WHERE <term_expr> = '<lit>'` / IN / BETWEEN, top-level
        conjunct) are served index-pruned instead of by table scan
        (sqlindex.py module doc spells out the rewrite and its safety
        gates). The build syncs at the table's current version; REFRESH
        INDEX (or run_ingest's derived= hook) maintains it at O(changed
        rows) per span."""
        m = re.match(
            rf"CREATE\s+INDEX\s+(IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s+ON\s+"
            rf"({_IDENT})\s*\(",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError(
                "supported: CREATE INDEX [IF NOT EXISTS] <name> ON <table> "
                "(<expr>) [WHERE <pred>] [LOCATION '<path>']"
            )
        name = stmt[m.start(2):m.end(2)]
        tname = stmt[m.start(3):m.end(3)]
        table = self._table(tname)
        open_pos = m.end() - 1
        close = self._paren_span(masked, open_pos)
        term = stmt[open_pos + 1:close - 1].strip()
        rest, mrest = stmt[close:], masked[close:]
        predicate = location = None
        lm = re.search(r"\bLOCATION\s+('(?:[^']|'')*')\s*$", mrest, re.IGNORECASE)
        if lm:
            location = _unquote(rest[lm.start(1):lm.end(1)])
            rest, mrest = rest[:lm.start()], mrest[:lm.start()]
        wm = re.match(r"\s*WHERE\s+(.+?)\s*$", mrest, re.IGNORECASE | re.DOTALL)
        if wm:
            predicate = rest[wm.start(1):wm.end(1)].strip()
        elif mrest.strip():
            raise SqlFrontendError(
                f"CREATE INDEX: unparsed trailing text {rest.strip()!r}"
            )
        from . import sqlindex

        if sqlindex._ci_get(table, name) is not None:
            if m.group(1):
                return self._report("CREATE INDEX", name, {
                    "created": False, "reason": "exists",
                })
            raise SqlFrontendError(
                f"index {name!r} already exists on {tname} (use IF NOT EXISTS)"
            )
        try:
            _idx, defn, report = sqlindex.create_index(
                self.spark, table, name, term,
                predicate=predicate, location=location, original_sql=stmt,
            )
        except ValueError as e:
            raise SqlFrontendError(f"CREATE INDEX: {e}") from None
        return self._report("CREATE INDEX", name, {
            "created": True, "on": tname, "term": term,
            "location": defn["root"], "src_version": report.src_version,
            "rows": report.applied_rows,
        })

    def _refresh_index(self, stmt: str, masked: str) -> DataFrame:
        """REFRESH INDEX <name> ON <t> [FULL] — one incremental
        maintenance pass over the source changefeed span (O(changed
        rows), exactly-once under the index's derive offsets); FULL
        forces a complete re-derivation (out-of-band drift repair, the
        REFRESH MATERIALIZED VIEW ... FULL contract)."""
        m = re.match(
            rf"REFRESH\s+INDEX\s+({_IDENT})\s+ON\s+({_IDENT})(\s+FULL)?\s*$",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError(
                "supported: REFRESH INDEX <name> ON <table> [FULL]"
            )
        name = stmt[m.start(1):m.end(1)]
        tname = stmt[m.start(2):m.end(2)]
        from . import sqlindex

        try:
            _defn, report = sqlindex.refresh_index(
                self.spark, self._table(tname), name, full=bool(m.group(3))
            )
        except sqlindex.SqlIndexError as e:
            raise SqlFrontendError(f"REFRESH INDEX: {e}") from None
        return self._report("REFRESH INDEX", name, {
            "on": tname, "src_version": report.src_version,
            "rows": report.applied_rows, "resync": report.resync,
            "initial_sync": report.initial_sync,
        })

    def _drop_index(self, stmt: str, masked: str) -> DataFrame:
        """DROP INDEX [IF EXISTS] <name> ON <t> — unregisters the index
        (metadata-only; its data files stay on disk for the owner to
        reclaim, DROP TABLE's contract). Point lookups on the term fall
        back to plain scans immediately."""
        m = re.match(
            rf"DROP\s+INDEX\s+(IF\s+EXISTS\s+)?({_IDENT})\s+ON\s+({_IDENT})\s*$",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError(
                "supported: DROP INDEX [IF EXISTS] <name> ON <table>"
            )
        name = stmt[m.start(2):m.end(2)]
        table = self._table(stmt[m.start(3):m.end(3)])
        from . import sqlindex

        try:
            defn = sqlindex.drop_index(table, name)
        except sqlindex.SqlIndexError:
            if m.group(1):
                return self._report("DROP INDEX", name, {
                    "dropped": False, "reason": "not registered",
                })
            raise SqlFrontendError(
                f"no index {name!r} on {stmt[m.start(3):m.end(3)]} "
                "(use IF EXISTS)"
            ) from None
        return self._report("DROP INDEX", name, {
            "dropped": True, "location": defn["root"],
        })

    # ------------------------------------------------------------ COPY INTO

    def _copy_into(self, stmt: str, masked: str) -> DataFrame:
        """COPY INTO — Delta-parity idempotent file loading:

            COPY INTO <t> FROM '<path>' FILEFORMAT = PARQUET | CSV | JSON
                [FORMAT_OPTIONS ('k' = 'v', ...)]

        Each source FILE is loaded at most once, across retries and
        crashes, exactly like Delta's loaded-file tracking. Mechanism
        (pure lakette metadata, no new commit protocol):

          1. heal: any `intent-*.json` left under the statement's marker
             dir is resolved first — if its batch epoch committed
             (epoch marker present, or the table's writer stamp says so;
             a successor commit persists a predecessor's marker, see
             table.py's at-least-once note), the per-file markers it
             promised are written now; either way the intent is removed.
          2. candidates = listed files minus those with a per-file marker.
          3. one `merge_into` for the whole batch under a DETERMINISTIC
             epoch (hash of the sorted candidate list), with the intent
             written beforehand — a crash anywhere leaves either nothing
             (no commit: intent discarded) or a committed batch the next
             invocation recognizes and marks, never a double-load.

        Rows enter through the INSERT path: minted seq, typed-NULL
        missing payload (parquet), duplicate-key ties refused. CSV/JSON
        read with the table's user schema (no inference drift).
        Divergence from Delta, stated: an existing key is an upsert, not
        an append — keyed-CDC semantics, same as INSERT."""
        import glob as _glob
        import hashlib

        m = re.match(
            rf"COPY\s+INTO\s+({_IDENT})\s+FROM\s+('(?:[^']|'')*')\s+"
            rf"FILEFORMAT\s*=\s*({_IDENT})\s*(?:FORMAT_OPTIONS\s*\()?",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError(
                "supported: COPY INTO <t> FROM '<path>' FILEFORMAT = "
                "PARQUET|CSV|JSON [FORMAT_OPTIONS ('k'='v', ...)]"
            )
        table = self._table(stmt[m.start(1):m.end(1)])
        src_path = _unquote(stmt[m.start(2):m.end(2)])
        fmt = stmt[m.start(3):m.end(3)].lower()
        if fmt not in ("parquet", "csv", "json"):
            raise SqlFrontendError(f"FILEFORMAT {fmt!r}: supported PARQUET, CSV, JSON")
        options: dict[str, str] = {}
        if masked[m.end() - 1:m.end()] == "(":
            end = self._paren_span(masked, m.end() - 1)
            for piece in _split_top(stmt[m.end():end - 1], masked[m.end():end - 1]):
                om = re.match(r"\s*'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'\s*$", piece)
                if not om:
                    raise SqlFrontendError(
                        f"cannot parse FORMAT_OPTIONS entry {piece.strip()!r}"
                    )
                options[om.group(1).replace("''", "'")] = om.group(2).replace("''", "'")
            if stmt[end:].strip():
                raise SqlFrontendError(
                    f"COPY INTO: unparsed trailing text {stmt[end:].strip()!r}"
                )
        elif stmt[m.end():].strip():
            raise SqlFrontendError(
                f"COPY INTO: unparsed trailing text {stmt[m.end():].strip()!r}"
            )

        # ---- list the source (posix: data files always come off a real FS)
        if any(ch in src_path for ch in "*?["):
            files = sorted(p for p in _glob.glob(src_path) if os.path.isfile(p))
        elif os.path.isdir(src_path):
            files = sorted(
                os.path.join(src_path, f) for f in os.listdir(src_path)
                if not f.startswith((".", "_"))
                and os.path.isfile(os.path.join(src_path, f))
            )
        elif os.path.isfile(src_path):
            files = [src_path]
        else:
            raise SqlFrontendError(f"COPY INTO source {src_path!r} does not exist")

        qid = "sql_copy_" + hashlib.sha256(
            os.path.abspath(src_path).encode()
        ).hexdigest()[:16]
        qdir = os.path.join(table.epochs_dir, qid)
        table.fs.makedirs(qdir)

        def _fmark(path: str) -> str:
            h = hashlib.sha256(os.path.abspath(path).encode()).hexdigest()[:24]
            return os.path.join(qdir, f"file-{h}.json")

        # ---- heal orphaned intents (crash between commit and markers);
        # a concurrent twin may heal/remove the same intent first — every
        # step here tolerates losing that race (the operations are
        # idempotent by content)
        for entry in sorted(table.fs.listdir(qdir)):
            if not entry.startswith("intent-"):
                continue
            ipath = os.path.join(qdir, entry)
            try:
                intent = table.fs.read_json(ipath)
            except FileNotFoundError:
                continue
            if table.epoch_committed(qid, int(intent["epoch"])):
                for f in intent["files"]:
                    if not table.fs.exists(_fmark(f)):
                        table.fs.put_json(_fmark(f), {"path": f, "epoch": intent["epoch"]})
            try:
                table.fs.remove(ipath)
            except FileNotFoundError:
                pass

        new_files = [f for f in files if not table.fs.exists(_fmark(f))]
        if not new_files:
            return self._report("COPY INTO", table.root, {
                "files_loaded": 0, "files_skipped": len(files), "rows": 0,
            })

        reader = self.spark.read.options(**options)
        if fmt == "parquet":
            df = reader.parquet(*new_files)
        else:
            # explicit schema: no sampling-dependent inference drift, and
            # a malformed file fails loudly instead of widening types
            schema = table.user_schema()
            df = (reader.schema(schema).csv(new_files) if fmt == "csv"
                  else reader.schema(schema).json(new_files))
        key_cols = table.key_cols()
        if all(k in df.columns for k in key_cols):  # else _events_from raises
            dup = (
                df.groupBy(*key_cols).count()
                .filter(F.col("count") > 1).limit(1).collect()
            )
            if dup:
                k = {c: dup[0][c] for c in key_cols}
                raise SqlFrontendError(
                    f"COPY INTO batch contains duplicate key rows (e.g. {k}); "
                    "the batch shares one minted seq, so the survivor would "
                    "be arbitrary — load conflicting files separately"
                )
        seq = self._next_seq(table)
        batch_epoch = int.from_bytes(
            hashlib.sha256("\n".join(new_files).encode()).digest()[:8], "big"
        ) >> 2  # positive, < 2**62
        table.fs.put_json(
            os.path.join(qdir, f"intent-{batch_epoch}.json"),
            {"epoch": batch_epoch, "files": new_files},
        )
        events = self._events_from(table, df, "U", seq)
        from .lakette.table import CommitConflictError

        twin = False
        try:
            stats = merge_into(self.spark, table, events,
                               query_id=qid, epoch=batch_epoch)
        except CommitConflictError:
            # a CONCURRENT twin racing the same source computed the same
            # candidate set, hence the same batch epoch — if its commit
            # carries our (qid, epoch) stamp, OUR exact batch is already
            # applied: adopt it (write the markers, succeed idempotently)
            # instead of surfacing a retry the user would no-op anyway.
            # Any OTHER conflicting writer re-raises untouched.
            if not table.epoch_committed(qid, batch_epoch):
                raise
            twin, stats = True, None
        for f in new_files:
            table.fs.put_json(_fmark(f), {"path": f, "epoch": batch_epoch})
        try:
            table.fs.remove(os.path.join(qdir, f"intent-{batch_epoch}.json"))
        except FileNotFoundError:
            pass  # the twin already cleaned it up
        fields: dict[str, Any] = {
            "files_loaded": len(new_files),
            "files_skipped": len(files) - len(new_files),
        }
        if twin:
            fields["applied_by"] = "concurrent twin"
        else:
            fields.update(rows=stats.batch_rows, version=stats.version, seq=seq)
        return self._report("COPY INTO", table.root, fields)

    # ------------------------------------------------- SHOW/TRUNCATE TABLE

    def _show(self, stmt: str, masked: str) -> DataFrame:
        if re.match(r"SHOW\s+TABLES\s*$", masked, re.IGNORECASE):
            rows = []
            for name in sorted(self._names().values()):
                t = self._table(name)
                meta = t.current_metadata()
                rows.append((name, t.root, int(meta["version"]),
                             ",".join(meta["key_cols"])))
            return self.spark.createDataFrame(
                rows, "name string, root string, version long, key_cols string"
            )
        if re.match(r"SHOW\s+MATERIALIZED\s+VIEWS\s*$", masked, re.IGNORECASE):
            from . import sqlmview

            rows = []
            for name in sorted(self._names().values()):
                t = self._table(name)
                d = sqlmview.read_definition(t)
                if d is None:
                    continue
                rows.append((name, t.root, d["kind"], d.get("sql", "")))
            return self.spark.createDataFrame(
                rows, "name string, root string, kind string, definition string"
            )
        im = re.match(
            rf"SHOW\s+INDEXES\s+ON\s+({_IDENT})\s*$", masked, re.IGNORECASE
        )
        if im:
            from . import sqlindex
            from .operators.derive_index import index_version

            table = self._table(stmt[im.start(1):im.end(1)])
            cur = int(table.current_metadata()["version"])
            rows = []
            for name, d in sorted(sqlindex.read_indexes(table).items()):
                iv = index_version(
                    sqlindex.index_table(table, d), d["derive_id"]
                )
                rows.append((
                    name, d["term"], d.get("predicate"), d["root"],
                    iv, cur, iv == cur,
                ))
            return self.spark.createDataFrame(
                rows,
                "name string, term string, predicate string, root string, "
                "synced_version long, current_version long, fresh boolean",
            )
        m = re.match(
            rf"SHOW\s+CREATE\s+TABLE\s+({_IDENT})\s*$", masked, re.IGNORECASE
        )
        if not m:
            raise SqlFrontendError(
                "supported: SHOW TABLES | SHOW CREATE TABLE <t> | "
                "SHOW MATERIALIZED VIEWS | SHOW INDEXES ON <t>"
            )
        name = stmt[m.start(1):m.end(1)]
        table = self._table(name)
        from . import sqlmview

        mdef = sqlmview.read_definition(table)
        if mdef is not None:
            # a materialized view's DDL is its definition statement — the
            # stored SQL re-runs verbatim (CREATE adopts same-SQL roots)
            return self.spark.createDataFrame(
                [(mdef.get("sql", ""),)], "createtab_stmt string"
            )
        meta = table.current_metadata()
        cols = ",\n".join(
            f"  {f.name} {f.dataType.simpleString().upper()}"
            for f in table.user_schema().fields
        )
        props = [f"'n_buckets' = '{meta['n_buckets']}'"]
        if meta.get("target_file_rows"):
            props.append(f"'target_file_rows' = '{meta['target_file_rows']}'")
        if meta.get("cluster_by"):
            props.append(f"'cluster_by' = '{','.join(meta['cluster_by'])}'")
            props.append(f"'cluster_mode' = '{meta.get('cluster_mode', 'linear')}'")
        if meta.get("column_lww"):
            props.append("'column_lww' = 'true'")
        ddl = (
            f"CREATE TABLE {name} (\n{cols},\n"
            f"  PRIMARY KEY ({', '.join(meta['key_cols'])})\n) USING LAKETTE\n"
            f"LOCATION '{table.root}'\n"
            f"TBLPROPERTIES ({', '.join(props)})"
        )
        cons = meta.get("constraints") or {}
        if cons:
            # comment lines: the statement round-trips through sql() (the
            # comment stripper drops them), and the reader still sees the
            # full declared surface + the statements that restore it
            ddl += "".join(
                f"\n-- ALTER TABLE {name} ADD CONSTRAINT {n} CHECK ({e})"
                for n, e in sorted(cons.items())
            )
        return self.spark.createDataFrame([(ddl,)], "createtab_stmt string")

    def _truncate(self, stmt: str, masked: str) -> DataFrame:
        """TRUNCATE TABLE — every live row tombstoned in one commit.
        Compiles onto delete_where(pred="true"): unlike a filesystem
        truncate this is a VERSIONED delete (time travel and RESTORE
        still see the old rows; vacuum reclaims them on its own clock),
        which is exactly Delta's TRUNCATE-equivalent `DELETE FROM t`."""
        m = re.match(rf"TRUNCATE\s+TABLE\s+({_IDENT})\s*$", masked, re.IGNORECASE)
        if not m:
            raise SqlFrontendError("supported: TRUNCATE TABLE <t>")
        table = self._table(stmt[m.start(1):m.end(1)])
        report = delete_where(self.spark, table, "true")
        return self._report("TRUNCATE", table.root, report)

    # ------------------------------------------------------ FSCK / EXPORT

    def _fsck(self, stmt: str, masked: str) -> DataFrame:
        """FSCK TABLE <t> [DEEP] — the three-tier integrity verification
        (lakette/fsck.py check_table): metadata chain + file existence by
        default, DEEP adds the content pass (row counts / stats vs
        manifests). REPORTS, never repairs — exactly the operator's
        contract; one row per issue, or a single ok row."""
        m = re.match(
            rf"FSCK\s+TABLE\s+({_IDENT})(\s+DEEP)?\s*$", masked, re.IGNORECASE
        )
        if not m:
            raise SqlFrontendError("supported: FSCK TABLE <t> [DEEP]")
        from .lakette.fsck import check_table

        table = self._table(stmt[m.start(1):m.end(1)])
        rep = check_table(table, spark=self.spark, deep=m.group(2) is not None)
        rows = [("ok" if rep["ok"] else "issue",
                 issue) for issue in rep["issues"]] or [("ok", "")]
        return self.spark.createDataFrame(
            [(s, i, str(rep["checked"])) for s, i in rows],
            "status string, issue string, checked string",
        )

    def _purge(self, stmt: str, masked: str) -> DataFrame:
        """PURGE TABLE <t> KEYS (<key>[, <key> ...]) [DRY RUN] — the
        right-to-be-forgotten statement (operators/purge.py purge_keys):
        erase the named keys' payload from EVERY retained version (history,
        tags, staged commits), keeping time travel for everything else.
        `<key>` is a literal for single-column keys or a parenthesized
        literal tuple in key-column order for composite keys; literals are
        '<string>' (with '' escaping) or numbers. DRY RUN plans and counts
        without rewriting."""
        m = re.match(
            rf"PURGE\s+TABLE\s+({_IDENT})\s+KEYS\s*\((.*)\)\s*(DRY\s+RUN)?\s*$",
            masked, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise SqlFrontendError(
                "supported: PURGE TABLE <t> KEYS (<key>[, <key> ...]) "
                "[DRY RUN] — <key> := literal | (literal, ...)"
            )
        table = self._table(stmt[m.start(1):m.end(1)])
        body = stmt[m.start(2):m.end(2)]
        mbody = masked[m.start(2):m.end(2)]

        def _lit(text: str) -> Any:
            text = text.strip()
            if text.startswith("'") and text.endswith("'"):
                return _unquote(text)
            try:
                return int(text)
            except ValueError:
                try:
                    return float(text)
                except ValueError:
                    raise SqlFrontendError(
                        f"PURGE: key literal must be a quoted string or a "
                        f"number, got {text!r}"
                    ) from None

        keys: list[Any] = []
        for item, mitem in zip(_split_top(body, mbody),
                               _split_top(mbody, mbody)):
            item = item.strip()
            if item.startswith("(") and item.endswith(")"):
                inner, minner = item[1:-1], mitem.strip()[1:-1]
                keys.append(tuple(_lit(p) for p in _split_top(inner, minner)))
            else:
                keys.append(_lit(item))
        from .operators.purge import purge_keys

        try:
            report = purge_keys(self.spark, table, keys,
                                dry_run=m.group(3) is not None)
        except ValueError as e:
            raise SqlFrontendError(f"PURGE: {e}") from None
        return self._report("PURGE", table.root, {
            "keys": report["keys"], "versions": report["versions_scanned"],
            "candidate_files": report["candidate_files"],
            "files_rewritten": report.get("files_rewritten", 0),
            "rows_redacted": report.get("rows_redacted", 0),
            "dry_run": report["dry_run"],
        })

    def _export(self, stmt: str, masked: str) -> DataFrame:
        """EXPORT TABLE <t> [VERSION AS OF <n>|'<tag>'] TO '<path>' —
        engine-free interop drop (operators/interop.py export_manifest):
        one pinned snapshot as a plain-parquet file manifest + view SQL,
        readable by DuckDB/Trino/anything. MOR deltas refuse (compact
        first), exactly the operator's contract."""
        m = re.match(
            rf"EXPORT\s+TABLE\s+({_IDENT})"
            r"(?:\s+VERSION\s+AS\s+OF\s+(\d+|'[^']*'))?"
            r"\s+TO\s+('(?:[^']|'')*')\s*$",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError(
                "supported: EXPORT TABLE <t> [VERSION AS OF <n>|'<tag>'] "
                "TO '<path>'"
            )
        from .operators.interop import export_manifest

        table = self._table(stmt[m.start(1):m.end(1)])
        kw: dict[str, Any] = {}
        if m.group(2):
            vtext = stmt[m.start(2):m.end(2)]
            if vtext.startswith("'"):
                kw["ref"] = _unquote(vtext)
            else:
                kw["version"] = int(vtext)
        out_dir = _unquote(stmt[m.start(3):m.end(3)])
        try:
            manifest = export_manifest(table, out_dir, **kw)
        except ValueError as e:
            raise SqlFrontendError(f"EXPORT: {e}") from None
        return self._report("EXPORT", table.root, {
            "out_dir": out_dir, "version": manifest["version"],
            "files": manifest["n_files"], "rows": manifest["total_rows"],
        })

    # ----------------------------------------------------------- utilities

    def _one_ident(self, stmt: str, masked: str, prefix: str) -> str:
        pat = prefix.replace(" ", r"\s+")
        m = re.match(rf"{pat}\s+({_IDENT})\s*$", masked, re.IGNORECASE)
        if not m:
            raise SqlFrontendError(f"supported: {prefix} <table>")
        return stmt[m.start(1):m.end(1)]

    def _optimize(self, stmt: str, masked: str) -> DataFrame:
        """OPTIMIZE <t> [ZORDER BY (c1, c2, ...)] — bin-packing compaction;
        with ZORDER BY, the rewrite interleaves the named columns
        (compact's cluster override), so min/max file stats prune on ALL
        of them. Per-invocation, exactly Delta's semantics: the layout is
        not persisted as a table default — a table-declared clustering
        (create's cluster_by) keeps governing plain OPTIMIZE."""
        m = re.match(
            rf"OPTIMIZE\s+({_IDENT})"
            r"(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*$",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError("supported: OPTIMIZE <table> [ZORDER BY (cols)]")
        table = self._table(stmt[m.start(1):m.end(1)])
        kw = {}
        if m.group(2) is not None:
            cols = [c.strip() for c in stmt[m.start(2):m.end(2)].split(",") if c.strip()]
            if not cols:
                raise SqlFrontendError("ZORDER BY needs at least one column")
            # one column: linear sort IS the optimal interleave (create()'s
            # own rule) — accept the statement, use the better mode
            kw = {"cluster_by": cols,
                  "cluster_mode": "zorder" if len(cols) > 1 else "linear"}
        try:
            report = compact(self.spark, table, **kw)
        except ValueError as e:
            raise SqlFrontendError(f"OPTIMIZE: {e}") from None
        if kw:
            report = {**report, "zorder_by": ",".join(kw["cluster_by"])}
        return self._report("OPTIMIZE", table.root, report)

    def _analyze(self, stmt: str, masked: str) -> DataFrame:
        """ANALYZE TABLE <t> COMPUTE STATISTICS [FOR COLUMNS c, ... |
        FOR ALL COLUMNS] [WITH APPROX] — the one-pass column profile
        (operators/profile.py) over the CURRENT snapshot: one row per
        column (n_rows, n_nulls, n_distinct, min/max). Divergence from
        Spark's ANALYZE, stated: the profile is RETURNED as the result
        relation rather than stashed in a metastore — lakette's planner
        consumes per-FILE stats from manifests (kmin/kmax, smax), which
        the writers maintain continuously; a table-level CBO stats store
        does not exist to write into. WITH APPROX swaps exact
        count_distinct for HLL sketches (the 100 TB reconnaissance
        shape — no Expand in the plan)."""
        m = re.match(
            rf"ANALYZE\s+TABLE\s+({_IDENT})\s+COMPUTE\s+STATISTICS"
            r"(?:\s+FOR\s+(?:(ALL)\s+COLUMNS|COLUMNS\s+([A-Za-z_0-9.,\s]+?)))?"
            r"(\s+WITH\s+APPROX)?\s*$",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError(
                "supported: ANALYZE TABLE <t> COMPUTE STATISTICS "
                "[FOR COLUMNS c1, c2 | FOR ALL COLUMNS] [WITH APPROX]"
            )
        from .operators.profile import column_profile

        table = self._table(stmt[m.start(1):m.end(1)])
        snap = table.snapshot(self.spark)
        user_cols = [f.name for f in table.user_schema().fields]
        if m.group(3):
            cols = [c.strip() for c in stmt[m.start(3):m.end(3)].split(",") if c.strip()]
            canon = {c.lower(): c for c in user_cols}
            bad = [c for c in cols if c.lower() not in canon]
            if bad:
                raise SqlFrontendError(
                    f"ANALYZE: no such columns {bad}; table columns: {user_cols}"
                )
            cols = [canon[c.lower()] for c in cols]
        else:
            cols = user_cols
        return column_profile(
            snap.select(*user_cols), cols, approx=m.group(4) is not None
        )

    def _vacuum(self, stmt: str, masked: str) -> DataFrame:
        m = re.match(
            rf"VACUUM\s+({_IDENT})(?:\s+RETAIN\s+(\d+)\s+HOURS)?"
            r"(\s+DRY\s+RUN)?\s*$",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError(
                "supported: VACUUM <table> [RETAIN <n> HOURS] [DRY RUN]"
            )
        table = self._table(stmt[m.start(1):m.end(1)])
        kw: dict[str, Any] = (
            {"grace_seconds": int(m.group(2)) * 3600.0} if m.group(2) else {}
        )
        if m.group(3):
            kw["dry_run"] = True
        report = table.vacuum(**kw)
        return self._report("VACUUM", table.root, report)

    def _restore(self, stmt: str, masked: str) -> DataFrame:
        m = re.match(
            rf"RESTORE\s+(?:TABLE\s+)?({_IDENT})\s+TO\s+"
            r"(?:VERSION\s+AS\s+OF\s+(\d+|'[^']*')|TIMESTAMP\s+AS\s+OF\s+('[^']*'))\s*$",
            masked, re.IGNORECASE,
        )
        if not m:
            raise SqlFrontendError(
                "supported: RESTORE [TABLE] <t> TO VERSION AS OF <n>|'<tag>' "
                "| TO TIMESTAMP AS OF '<ts>'"
            )
        table = self._table(stmt[m.start(1):m.end(1)])
        if m.group(2):
            vtext = stmt[m.start(2):m.end(2)]
            commit = table.restore(
                table.ref_version(_unquote(vtext))
                if vtext.startswith("'") else int(vtext)
            )
        else:
            commit = table.restore(as_of=_unquote(stmt[m.start(3):m.end(3)]))
        return self._report("RESTORE", table.root, {"version": commit.version})

    def _detail(self, ident: str) -> DataFrame:
        table = self._table(ident)
        meta = table.current_metadata()
        s = table.stats()
        cons = meta.get("constraints") or {}
        return self._report("DESCRIBE DETAIL", table.root, {
            "version": meta["version"], "n_buckets": meta["n_buckets"],
            "key_cols": ",".join(meta["key_cols"]),
            "rows": s.get("total_rows", ""), "files": s.get("total_files", ""),
            "constraints": "; ".join(
                f"{n} CHECK ({e})" for n, e in sorted(cons.items())
            ),
        })

    def _describe(self, ident: str) -> DataFrame:
        """DESCRIBE [TABLE] <t> — one row per USER column in schema order:
        logical name, Spark SQL type, nullability, and the engine roles the
        column plays (key / cluster[pos] / bloom). Engine META columns and
        retired (dropped) physical columns never appear; renamed columns
        show their CURRENT logical name (metadata `schema` is the logical
        view — what a reader of `snapshot()` sees; colmap handles the
        physical side). Metadata-only: reads the version file, never a
        manifest shard or data file."""
        from .lakette.table import META_COL_NAMES

        table = self._table(ident)
        meta = table.current_metadata()
        keys = set(meta.get("key_cols") or [])
        cluster = list(meta.get("cluster_by") or [])
        bloom = set(meta.get("bloom_cols") or [])
        rows = []
        for f in meta["schema"]["fields"]:
            logical = f["name"]
            if logical in META_COL_NAMES:
                continue
            roles = []
            if logical in keys:
                roles.append("key")
            if logical in cluster:
                roles.append(f"cluster[{cluster.index(logical)}]")
            if logical in bloom:
                roles.append("bloom")
            dtype = T.StructField.fromJson(f).dataType.simpleString()
            rows.append((logical, dtype, bool(f.get("nullable", True)),
                         ", ".join(roles)))
        schema = T.StructType([
            T.StructField("col_name", T.StringType()),
            T.StructField("data_type", T.StringType()),
            T.StructField("nullable", T.BooleanType()),
            T.StructField("roles", T.StringType()),
        ])
        return self.spark.createDataFrame(rows, schema)

    def _alter(self, stmt: str, masked: str) -> DataFrame:
        m = re.match(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+"
            rf"(?:RENAME\s+COLUMN\s+({_IDENT})\s+TO\s+({_IDENT})"
            rf"|DROP\s+COLUMN\s+({_IDENT})"
            rf"|CREATE\s+(TAG|BRANCH)\s+({_IDENT})(?:\s+VERSION\s+AS\s+OF\s+(\d+))?"
            rf"|DROP\s+(?:TAG|BRANCH)\s+({_IDENT})"
            rf"|ADD\s+CONSTRAINT\s+({_IDENT})\s+CHECK\s*\((.+)\)"
            rf"|DROP\s+CONSTRAINT\s+({_IDENT})"
            r"|ADD\s+COLUMNS?\s*\((.+)\))\s*$",
            masked, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise SqlFrontendError(
                "supported: ALTER TABLE <t> RENAME COLUMN a TO b | DROP COLUMN a | "
                "ADD COLUMN[S] (c TYPE, ...) | "
                "CREATE TAG|BRANCH <name> [VERSION AS OF n] | DROP TAG <name> | "
                "ADD CONSTRAINT <name> CHECK (expr) | DROP CONSTRAINT <name>"
            )
        table = self._table(stmt[m.start(1):m.end(1)])
        if m.group(2):
            c = table.rename_column(stmt[m.start(2):m.end(2)], stmt[m.start(3):m.end(3)])
            return self._report("ALTER RENAME COLUMN", table.root, {"version": c.version})
        if m.group(4):
            c = table.drop_column(stmt[m.start(4):m.end(4)])
            return self._report("ALTER DROP COLUMN", table.root, {"version": c.version})
        if m.group(6):
            rec = table.create_ref(
                stmt[m.start(6):m.end(6)], kind=m.group(5).lower(),
                version=int(m.group(7)) if m.group(7) else None,
            )
            return self._report("ALTER CREATE REF", table.root, rec)
        if m.group(9):
            # CHECK constraint: validated against the CURRENT rows (one
            # scan, Delta parity), then enforced on every future batch
            try:
                c = table.add_constraint(
                    self.spark, stmt[m.start(9):m.end(9)], stmt[m.start(10):m.end(10)].strip()
                )
            except ValueError as e:
                raise SqlFrontendError(f"ADD CONSTRAINT: {e}") from None
            return self._report("ALTER ADD CONSTRAINT", table.root, {"version": c.version})
        if m.group(11):
            try:
                c = table.drop_constraint(stmt[m.start(11):m.end(11)])
            except ValueError as e:
                raise SqlFrontendError(f"DROP CONSTRAINT: {e}") from None
            return self._report("ALTER DROP CONSTRAINT", table.root, {"version": c.version})
        if m.group(12):
            # explicit additive evolution — the DDL twin of merge_into's
            # implicit ALTER-then-merge; metadata-only, old rows read NULL
            body = stmt[m.start(12):m.end(12)]
            schema, keys = self._parse_coldefs(body, masked[m.start(12):m.end(12)])
            if keys is not None:
                raise SqlFrontendError(
                    "ADD COLUMN takes no PRIMARY KEY clause (keys are fixed "
                    "at CREATE TABLE — they are the merge identity)"
                )
            try:
                c = table.add_columns({f.name: f.dataType for f in schema.fields})
            except ValueError as e:
                raise SqlFrontendError(f"ADD COLUMN: {e}") from None
            return self._report("ALTER ADD COLUMN", table.root, {
                "version": c.version,
                "columns": ",".join(f.name for f in schema.fields),
            })
        table.drop_ref(stmt[m.start(8):m.end(8)])
        return self._report("ALTER DROP REF", table.root, {"dropped": stmt[m.start(8):m.end(8)]})
