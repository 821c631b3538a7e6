"""CREATE/REFRESH/DROP MATERIALIZED VIEW (forklift_spark/sqlmview.py):
the SELECT's shape must compile onto the right derive operator with the
operator's exact semantics (incremental == recompute, filtered-out
updates tombstone, exactly-once refresh), and every unsupported shape
must be refused loudly at CREATE time — never discovered at REFRESH."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.lakette.table import LaketteTable
from forklift_spark.operators.merge import merge_into
from forklift_spark.sqlfront import SqlFrontend, SqlFrontendError
from forklift_spark.sqlmview import parse_mview_select, MviewError
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table


def _ev(op, seq, path, lang="py", content="body"):
    return (op, seq, "r", path, f"c{seq}", lang, content, None, 1)


def _seed(spark, table, rows, *, epoch):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    return merge_into(spark, table, df, query_id="seed", epoch=epoch)


@pytest.fixture()
def fe(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    _seed(spark, table, [
        _ev("I", 1, "a", lang="de", content="aaaa"),
        _ev("I", 2, "b", lang="py", content="bb"),
        _ev("I", 3, "c", lang="fr", content="c"),
        _ev("I", 4, "d", lang="py", content="dddddd"),
    ], epoch=0)
    return SqlFrontend(spark, {"repos": table}), table, tmp_path


# ------------------------------------------------------------------ map

def test_map_mview_incremental_matches_recompute(spark, fe):
    front, table, tmp = fe
    rep = front.sql(
        "CREATE MATERIALIZED VIEW pyish LOCATION "
        f"'{tmp / 'pyish'}' AS SELECT repo, path, upper(lang) AS lang_u, "
        "length(content) AS n FROM repos WHERE lang <> 'de'"
    ).collect()[0]
    assert rep.created == "True" and rep.kind == "map"

    def state():
        return {
            r.path: (r.lang_u, r.n)
            for r in front.sql("SELECT path, lang_u, n FROM pyish").collect()
        }

    assert state() == {"b": ("PY", 2), "c": ("FR", 1), "d": ("PY", 6)}

    # update a INTO the predicate set, b OUT of it, plus a delete of c —
    # one refresh must upsert a, tombstone b (filter-failing update), drop c
    _seed(spark, table, [
        _ev("U", 9, "a", lang="go", content="aa"),
        _ev("U", 10, "b", lang="de", content="bb"),
        _ev("D", 11, "c"),
    ], epoch=1)
    r = front.sql("REFRESH MATERIALIZED VIEW pyish").collect()[0]
    assert r.kind == "map" and r.initial_sync == "False"
    assert int(r.epochs) >= 1
    assert state() == {"a": ("GO", 2), "d": ("PY", 6)}

    # idempotent: a second refresh applies nothing
    r2 = front.sql("REFRESH MATERIALIZED VIEW pyish").collect()[0]
    assert int(r2.epochs) == 0 and int(r2.rows) == 0

    # the view is a first-class lakette table: metadata tables work on it
    files = front.sql("SELECT count(*) AS n FROM pyish.files").collect()[0].n
    assert files >= 1


def test_map_mview_alias_qualifiers(spark, fe):
    front, table, tmp = fe
    front.sql(
        f"CREATE MATERIALIZED VIEW q LOCATION '{tmp / 'q'}' AS "
        "SELECT s.repo, s.path, concat(s.lang, ':', s.content) AS tag "
        "FROM repos s WHERE s.lang = 'py'"
    )
    got = {r.path: r.tag for r in front.sql("SELECT path, tag FROM q").collect()}
    assert got == {"b": "py:bb", "d": "py:dddddd"}


# ------------------------------------------------------------------ agg

def test_agg_mview(spark, fe):
    front, table, tmp = fe
    rep = front.sql(
        f"CREATE MATERIALIZED VIEW bylang LOCATION '{tmp / 'bylang'}' AS "
        "SELECT lang, count(*) AS n, sum(length(content)) AS sz "
        "FROM repos GROUP BY lang"
    ).collect()[0]
    assert rep.kind == "agg"

    def gold():
        return {
            r.lang: (r.n, r.sz)
            for r in front.sql("SELECT lang, n, sz FROM bylang").collect()
        }

    assert gold() == {"de": (1, 4), "py": (2, 8), "fr": (1, 1)}

    # moves between groups + delete: de group disappears, go appears
    _seed(spark, table, [
        _ev("U", 9, "a", lang="go", content="aa"),
        _ev("D", 11, "c"),
    ], epoch=1)
    front.sql("REFRESH MATERIALIZED VIEW bylang")
    assert gold() == {"go": (1, 2), "py": (2, 8)}

    # must equal a straight recompute through Catalyst
    expect = {
        r.lang: (r.n, r.sz)
        for r in front.sql(
            "SELECT lang, count(*) AS n, sum(length(content)) AS sz "
            "FROM repos GROUP BY lang"
        ).collect()
    }
    assert gold() == expect


# ----------------------------------------------------------------- join

def test_join_mview(spark, fe):
    front, fact, tmp = fe
    front.sql(
        f"CREATE TABLE owners (repo STRING, owner STRING, PRIMARY KEY (repo)) "
        f"LOCATION '{tmp / 'owners'}'"
    )
    front.sql("INSERT INTO owners (repo, owner) VALUES ('r', 'ada')")
    rep = front.sql(
        f"CREATE MATERIALIZED VIEW enr LOCATION '{tmp / 'enr'}' AS "
        "SELECT f.repo, f.path, f.content, d.owner AS owner "
        "FROM repos f JOIN owners d ON f.repo = d.repo"
    ).collect()[0]
    assert rep.kind == "join"

    def state():
        return {
            r.path: r.owner
            for r in front.sql("SELECT path, owner FROM enr").collect()
        }

    assert state() == {p: "ada" for p in ("a", "b", "c", "d")}

    # dim-driven refresh: owner change fans out to every fact row
    front.sql("UPDATE owners SET owner = 'bob' WHERE repo = 'r'")
    r = front.sql("REFRESH MATERIALIZED VIEW enr").collect()[0]
    assert r.kind == "join" and int(r.rows) >= 4
    assert state() == {p: "bob" for p in ("a", "b", "c", "d")}


# ------------------------------------------------------------- chaining

def test_chained_mview(spark, fe):
    """mview over mview: silver (filter) -> gold (agg) — a REFRESH of each
    propagates bronze changes through the chain."""
    front, table, tmp = fe
    front.sql(
        f"CREATE MATERIALIZED VIEW silver LOCATION '{tmp / 's'}' AS "
        "SELECT repo, path, lang, content FROM repos WHERE lang = 'py'"
    )
    front.sql(
        f"CREATE MATERIALIZED VIEW gold LOCATION '{tmp / 'g'}' AS "
        "SELECT lang, count(*) AS n FROM silver GROUP BY lang"
    )
    assert front.sql("SELECT n FROM gold").collect()[0].n == 2
    _seed(spark, table, [_ev("I", 20, "e", lang="py")], epoch=1)
    front.sql("REFRESH MATERIALIZED VIEW silver")
    front.sql("REFRESH MATERIALIZED VIEW gold")
    assert front.sql("SELECT n FROM gold").collect()[0].n == 3


# ------------------------------------------------- lifecycle + registry

def test_mview_lifecycle_show_drop_adopt(spark, fe):
    front, table, tmp = fe
    sql = (
        f"CREATE MATERIALIZED VIEW mv LOCATION '{tmp / 'mv'}' AS "
        "SELECT repo, path, lang FROM repos WHERE lang = 'py'"
    )
    front.sql(sql)
    shown = {r.name: r.kind for r in front.sql("SHOW MATERIALIZED VIEWS").collect()}
    assert shown == {"mv": "map"}

    # SHOW CREATE TABLE on an mview returns its definition statement,
    # which re-runs verbatim (the adoption contract below relies on it)
    ddl = front.sql("SHOW CREATE TABLE mv").collect()[0].createtab_stmt
    assert ddl.startswith("CREATE MATERIALIZED VIEW mv")

    # duplicate name: loud; IF NOT EXISTS: no-op
    with pytest.raises(SqlFrontendError, match="already registered"):
        front.sql(sql)
    rep = front.sql(sql.replace("VIEW mv", "VIEW IF NOT EXISTS mv")).collect()[0]
    assert rep.created == "False"

    # a DIFFERENT definition at the same location is refused
    front.sql("DROP MATERIALIZED VIEW mv")
    with pytest.raises(SqlFrontendError, match="DIFFERENT materialized view"):
        front.sql(
            f"CREATE MATERIALIZED VIEW mv2 LOCATION '{tmp / 'mv'}' AS "
            "SELECT repo, path, lang FROM repos"
        )

    # same SQL at the same location ADOPTS (the crash-retry contract):
    # re-register under the original name, zero rows re-applied
    front.sql(sql)
    assert front.sql("SELECT count(*) AS n FROM mv").collect()[0].n == 2

    # DROP MATERIALIZED VIEW refuses plain tables and vice versa
    with pytest.raises(SqlFrontendError, match="not a materialized view"):
        front.sql("DROP MATERIALIZED VIEW repos")
    with pytest.raises(SqlFrontendError, match="not a materialized view"):
        front.sql("REFRESH MATERIALIZED VIEW repos")


# ------------------------------------------------- streaming integration

def test_mview_refresh_hook_in_run_ingest(spark, tmp_path):
    """SQL-declared mviews ride the medallion loop: run_ingest(derived=
    [refresh_hook(view)]) keeps the view fresh per epoch, and after the
    drain it equals the recompute of the final bronze state."""
    from forklift_spark.changelog import ChangelogSpec, generate_changelog
    from forklift_spark.sqlmview import refresh_hook
    from forklift_spark.streaming.ingest import run_ingest

    log_dir = str(tmp_path / "log")
    generate_changelog(
        ChangelogSpec(n_events=1500, n_repos=4, paths_per_repo=10,
                      seed=7, segment_rows=500),
        log_dir,
    )
    bronze = create_entity_table(str(tmp_path / "bronze"), n_buckets=4)
    front = SqlFrontend(spark, {"bronze": bronze})
    # seed one epoch so the CREATE has a source snapshot, then stream
    run_ingest(spark, log_dir, bronze, str(tmp_path / "ck0"),
               query_id="mvloop", max_files_per_trigger=1, timeout_sec=120,
               available_now=True)
    front.sql(
        f"CREATE MATERIALIZED VIEW mv LOCATION '{tmp_path / 'mv'}' AS "
        "SELECT repo, path, lang, length(content) AS n FROM bronze "
        "WHERE lang <> 'md'"
    )
    # more events through the loop WITH the hook
    generate_changelog(
        ChangelogSpec(n_events=1500, n_repos=4, paths_per_repo=10,
                      seed=8, segment_rows=500),
        str(tmp_path / "log2"),
    )
    report = run_ingest(
        spark, str(tmp_path / "log2"), bronze, str(tmp_path / "ck1"),
        query_id="mvloop2", max_files_per_trigger=1, timeout_sec=120,
        derived=[refresh_hook(front._table("mv"))],
    )
    assert any(not e.skipped for e in report.epochs)
    got = sorted(
        tuple(r) for r in front.sql(
            "SELECT repo, path, lang, n FROM mv"
        ).collect()
    )
    want = sorted(
        tuple(r) for r in front.sql(
            "SELECT repo, path, lang, length(content) AS n FROM bronze "
            "WHERE lang <> 'md'"
        ).collect()
    )
    assert got == want and len(got) > 0


# ------------------------------------------------------------ loud gates

@pytest.mark.parametrize("select,msg", [
    ("SELECT DISTINCT lang FROM repos", "DISTINCT"),
    ("SELECT lang, count(*) AS n FROM repos GROUP BY lang ORDER BY n", "ORDER BY"),
    ("SELECT lang FROM repos LIMIT 5", "LIMIT"),
    ("SELECT lang, count(*) AS n FROM repos GROUP BY lang HAVING count(*) > 1", "HAVING"),
    ("SELECT repo FROM repos UNION SELECT repo FROM repos", "UNION"),
    ("SELECT repo, path FROM (SELECT * FROM repos)", "subquer"),
    ("SELECT * FROM repos", r"SELECT \*|not supported"),
    ("SELECT repo, path, rank() OVER (PARTITION BY repo ORDER BY seq) AS r FROM repos", "OVER"),
    ("SELECT length(content) FROM repos", "alias"),
    ("SELECT lang, sum(length(content)) FROM repos GROUP BY lang", "alias"),
    ("SELECT count(*) AS n FROM repos GROUP BY lang", "GROUP BY expression"),
    ("SELECT x.lang AS l, count(*) AS n FROM repos s GROUP BY x.lang", "unknown qualifier"),
])
def test_create_gates(spark, fe, select, msg):
    front, table, tmp = fe
    with pytest.raises(SqlFrontendError, match=msg):
        front.sql(
            f"CREATE MATERIALIZED VIEW bad LOCATION '{tmp / 'bad'}' AS {select}"
        )
    assert not LaketteTable.exists(str(tmp / "bad"))


@pytest.mark.parametrize("select,msg", [
    ("SELECT f.repo, f.path, d.owner AS o FROM repos f RIGHT JOIN owners d "
     "ON f.repo = d.repo", "RIGHT"),
    ("SELECT f.repo, f.path, d.owner AS o FROM repos f JOIN owners d "
     "ON f.repo = d.repo WHERE f.lang = 'py'", "no WHERE"),
    ("SELECT f.repo, f.path, d.owner AS o FROM repos f JOIN owners d "
     "ON f.repo = d.repo OR f.path = d.repo", "equalities"),
    ("SELECT repo, path, owner AS o FROM repos JOIN owners "
     "ON repos.repo = owners.repo", "aliases"),
])
def test_join_gates(spark, fe, select, msg):
    front, table, tmp = fe
    front.sql(
        f"CREATE TABLE owners (repo STRING, owner STRING, PRIMARY KEY (repo)) "
        f"LOCATION '{tmp / 'owners'}'"
    )
    with pytest.raises(SqlFrontendError, match=msg):
        front.sql(
            f"CREATE MATERIALIZED VIEW bad LOCATION '{tmp / 'bad'}' AS {select}"
        )


def test_parse_shapes_directly():
    """Pure-parser sanity: shapes classify without a SparkSession."""
    from forklift_spark.sqlfront import _mask_strings

    s = ("SELECT a, cast(b AS int) AS bi FROM t WHERE a > 'x AS y' "
         "GROUP BY a")
    plan = parse_mview_select(s, _mask_strings(s))
    assert [e["alias"] for e in plan["select"]] == [None, "bi"]
    assert plan["group_by_exprs"] == ["a"]
    assert plan["where"] == "a > 'x AS y'"

    with pytest.raises(MviewError, match="FROM"):
        parse_mview_select("SELECT 1 AS x", _mask_strings("SELECT 1 AS x"))
