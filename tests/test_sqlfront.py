"""SQL statement front-end (forklift_spark/sqlfront.py): each statement
must compile onto the existing operator with identical semantics to the
DataFrame path, time travel must resolve through version_as_of, and the
loud gates must reject every unsupported shape with a pointed message."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.operators.merge import merge_into
from forklift_spark.sqlfront import SqlFrontend, SqlFrontendError
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table


def _ev(op, seq, path, lang="py", content="body"):
    return (op, seq, "r", path, f"c{seq}", lang, content, None, 1)


def _seed(spark, table, rows, *, epoch=0):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    return merge_into(spark, table, df, query_id="seed", epoch=epoch)


def _state(spark, table):
    return {
        r.path: (r.lang, r.content, r.seq)
        for r in table.snapshot(spark).select("path", "lang", "content", "seq").collect()
    }


@pytest.fixture()
def fe_table(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    _seed(spark, table, [
        _ev("I", 1, "a", lang="de"), _ev("I", 2, "b", lang="py"),
        _ev("I", 3, "c", lang="fr"), _ev("I", 4, "d", lang="py"),
    ])
    return SqlFrontend(spark, {"repos": table}), table


def test_select_and_time_travel(spark, fe_table):
    fe, table = fe_table
    v1 = table.current_metadata()["version"]
    _seed(spark, table, [_ev("U", 9, "a", lang="go")], epoch=1)

    cur = {r.path: r.lang for r in fe.sql("SELECT path, lang FROM repos").collect()}
    assert cur["a"] == "go"
    # VERSION AS OF pins the pre-update snapshot
    old = {r.path: r.lang
           for r in fe.sql(f"SELECT path, lang FROM repos VERSION AS OF {v1}").collect()}
    assert old["a"] == "de"
    # aggregates + WHERE flow through Catalyst untouched; a string
    # containing FROM must not confuse the rewriter
    n = fe.sql("SELECT count(*) AS n FROM repos WHERE lang <> 'FROM repos'").collect()[0].n
    assert n == 4
    # self-join: two references, one registration each
    j = fe.sql(
        "SELECT a.path FROM repos a JOIN repos b ON a.path = b.path"
    ).count()
    assert j == 4


def test_select_timestamp_as_of(spark, fe_table):
    fe, table = fe_table
    hist = table.history_df(spark).collect()
    ts = max(r.committed_at for r in hist if r.committed_at is not None)
    _seed(spark, table, [_ev("U", 9, "a", lang="go")], epoch=1)
    old = {r.path: r.lang for r in fe.sql(
        f"SELECT path, lang FROM repos TIMESTAMP AS OF '{ts}'"
    ).collect()}
    assert old["a"] == "de"


def test_update_delete_match_dataframe_path(spark, fe_table):
    fe, table = fe_table
    rep = fe.sql("UPDATE repos SET content = content || '!' WHERE lang = 'py'").collect()[0]
    assert rep.statement == "UPDATE" and int(rep.rows_matched) == 2
    rep = fe.sql("DELETE FROM repos WHERE lang = 'de'").collect()[0]
    assert rep.statement == "DELETE" and int(rep.rows_matched) == 1
    st = _state(spark, table)
    assert set(st) == {"b", "c", "d"}
    assert st["b"][1] == "body!" and st["c"][1] == "body"


def test_insert_values_upserts_with_minted_seq(spark, fe_table):
    fe, table = fe_table
    rep = fe.sql(
        "INSERT INTO repos (repo, path, lang, content) VALUES "
        "('r', 'e', 'rs', 'new'), ('r', 'a', 'rs', 'replaced')"
    ).collect()[0]
    assert int(rep.rows) == 2
    st = _state(spark, table)
    assert st["e"][:2] == ("rs", "new")
    # keyed-table INSERT semantics: existing key replaced, seq minted above
    # every seen seq so the statement wins LWW
    assert st["a"][:2] == ("rs", "replaced") and st["a"][2] == 5
    # ...but a later event with higher seq still wins (dml.py interplay)
    _seed(spark, table, [_ev("U", 99, "a", lang="zz")], epoch=1)
    assert _state(spark, table)["a"][0] == "zz"


def test_insert_select_missing_payload_is_null(spark, fe_table):
    fe, table = fe_table
    spark.createDataFrame([("r", "f")], "repo string, path string") \
        .createOrReplaceTempView("stage_f")
    fe.sql("INSERT INTO repos SELECT repo, path FROM stage_f")
    st = _state(spark, table)
    assert st["f"] == (None, None, 5)


def test_merge_plain_upsert(spark, fe_table):
    fe, table = fe_table
    spark.createDataFrame(
        [("r", "a", "cX", "go", "merged"), ("r", "z", "cY", "go", "fresh")],
        "repo string, path string, commit string, lang string, content string",
    ).createOrReplaceTempView("staged")
    rep = fe.sql(
        "MERGE INTO repos t USING staged s ON t.repo = s.repo AND t.path = s.path "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0]
    assert int(rep.rows) == 2
    st = _state(spark, table)
    assert st["a"][1] == "merged" and st["z"][1] == "fresh"


def test_merge_conditional_and_delete_clause(spark, fe_table):
    fe, table = fe_table
    spark.createDataFrame(
        [("r", "a", "del"), ("r", "b", "up"), ("r", "z", "up"), ("r", "y", "skip")],
        "repo string, path string, act string",
    ).createOrReplaceTempView("acts")
    fe.sql(
        "MERGE INTO repos t USING (SELECT repo, path, act, 'X' AS content FROM acts) s "
        "ON t.repo = s.repo AND t.path = s.path "
        "WHEN MATCHED AND s.act = 'del' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED AND s.act = 'up' THEN INSERT *"
    )
    st = _state(spark, table)
    assert "a" not in st                      # matched + del condition
    assert st["b"][1] == "X"                  # matched fallthrough update
    assert st["z"][1] == "X"                  # unmatched + up condition
    assert "y" not in st                      # unmatched, condition failed -> no-op


def test_merge_null_condition_falls_through(spark, fe_table):
    """MERGE clause ordering: a WHEN ... AND cond clause whose condition
    evaluates to NULL does not claim the row — it must FALL THROUGH to the
    next clause (standard MERGE semantics). The complement filter must be
    `NOT (cond IS TRUE)`, not `NOT cond`, which silently drops NULL rows."""
    fe, table = fe_table
    spark.createDataFrame(
        [("r", "a", None), ("r", "b", "del")],
        "repo string, path string, act string",
    ).createOrReplaceTempView("null_acts")
    fe.sql(
        "MERGE INTO repos t USING (SELECT repo, path, act, 'Y' AS content "
        "FROM null_acts) s ON t.repo = s.repo AND t.path = s.path "
        "WHEN MATCHED AND s.act = 'del' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET *"
    )
    st = _state(spark, table)
    assert "b" not in st          # condition TRUE -> first clause deletes
    assert st["a"][1] == "Y"      # condition NULL -> falls through to UPDATE


def test_merge_column_level_update(spark, fe_table):
    """WHEN MATCHED THEN UPDATE SET c = expr: unassigned columns keep the
    STORED values; expressions and conditions may reference both aliases
    (the stored row arrives through one inner key join)."""
    fe, table = fe_table
    spark.createDataFrame(
        [("r", "a", "glue"), ("r", "b", "mark"), ("r", "z", "ignored")],
        "repo string, path string, note string",
    ).createOrReplaceTempView("notes")
    fe.sql(
        "MERGE INTO repos t USING notes s "
        "ON t.repo = s.repo AND t.path = s.path "
        "WHEN MATCHED AND t.lang = 'de' THEN UPDATE SET "
        "  content = t.content || ':' || s.note, lang = upper(t.lang) "
        "WHEN MATCHED THEN UPDATE SET t.content = s.note"
    )
    st = _state(spark, table)
    # 'a' was lang=de: both assignments see the stored row and the source
    assert st["a"][:2] == ("DE", "body:glue")
    # 'b' falls through to the unconditional clause; lang KEEPS stored 'py'
    assert st["b"][:2] == ("py", "mark")
    # 'z' is unmatched and there is no insert clause: no-op
    assert "z" not in st
    # content_sha stays derived from the new content (engine invariant)
    row = [r for r in table.snapshot(spark).collect() if r.path == "a"][0]
    import hashlib
    assert row.content_sha == hashlib.sha256(b"body:glue").hexdigest()


def test_merge_insert_cols_values(spark, fe_table):
    """WHEN NOT MATCHED THEN INSERT (cols) VALUES (exprs): listed columns
    from source expressions, unlisted payload columns NULL."""
    fe, table = fe_table
    spark.createDataFrame(
        [("r", "new1", "zz"), ("r", "a", "zz")],
        "repo string, path string, lang string",
    ).createOrReplaceTempView("incoming")
    fe.sql(
        "MERGE INTO repos t USING incoming s "
        "ON t.repo = s.repo AND t.path = s.path "
        "WHEN NOT MATCHED THEN INSERT (repo, path, lang, content) "
        "VALUES (s.repo, upper(s.path), s.lang, 'ins:' || s.path)"
    )
    st = _state(spark, table)
    assert st["NEW1"] == ("zz", "ins:new1", 5)
    assert st["a"][0] == "de"  # matched row untouched (no matched clause)


def test_merge_not_matched_by_source(spark, fe_table):
    """WHEN NOT MATCHED BY SOURCE: target rows without a source match are
    the branch's input; DELETE and column-level UPDATE both compile, with
    conditions over the stored row."""
    fe, table = fe_table
    spark.createDataFrame(
        [("r", "a", "keep")], "repo string, path string, content string",
    ).createOrReplaceTempView("survivors")
    fe.sql(
        "MERGE INTO repos t USING survivors s "
        "ON t.repo = s.repo AND t.path = s.path "
        "WHEN MATCHED THEN UPDATE SET content = s.content "
        "WHEN NOT MATCHED BY SOURCE AND t.lang = 'fr' THEN DELETE "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET lang = 'orphan'"
    )
    st = _state(spark, table)
    assert st["a"][1] == "keep"        # matched: column-level update
    assert "c" not in st               # fr row without source match: deleted
    assert st["b"][0] == "orphan"      # other unmatched targets: flagged
    assert st["d"][0] == "orphan"
    assert st["b"][1] == "body"        # unassigned column keeps stored value


def test_merge_using_lakette_source(spark, fe_table, tmp_path):
    fe, table = fe_table
    src = create_entity_table(str(tmp_path / "src"), n_buckets=2)
    _seed(spark, src, [_ev("I", 1, "q", lang="ml", content="from src")])
    fe2 = SqlFrontend(spark, {"repos": table, "staging": src})
    fe2.sql(
        "MERGE INTO repos t USING staging s ON t.repo = s.repo AND t.path = s.path "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    assert _state(spark, table)["q"][:2] == ("ml", "from src")


def test_optimize_vacuum_restore_history(spark, fe_table):
    fe, table = fe_table
    v1 = table.current_metadata()["version"]
    _seed(spark, table, [_ev("U", 9, "a", lang="go")], epoch=1)
    assert fe.sql("OPTIMIZE repos").collect()[0].statement == "OPTIMIZE"
    hist = fe.sql("DESCRIBE HISTORY repos")
    assert hist.count() >= 3 and "version" in hist.columns
    rep = fe.sql(f"RESTORE TABLE repos TO VERSION AS OF {v1}").collect()[0]
    assert rep.statement == "RESTORE"
    assert _state(spark, table)["a"][0] == "de"
    rep = fe.sql("VACUUM repos RETAIN 0 HOURS").collect()[0]
    assert rep.statement == "VACUUM"
    # table still readable after vacuum
    assert len(_state(spark, table)) == 4


def test_alter_and_refs(spark, fe_table):
    fe, table = fe_table
    fe.sql("ALTER TABLE repos CREATE TAG trained")
    assert table.ref_version("trained") == table.current_metadata()["version"]
    fe.sql("ALTER TABLE repos RENAME COLUMN lang TO language")
    assert "language" in [f.name for f in table.user_schema().fields]
    fe.sql("ALTER TABLE repos DROP TAG trained")
    assert all(r["name"] != "trained" for r in table.list_refs())


def test_describe_detail(spark, fe_table):
    fe, table = fe_table
    row = fe.sql("DESCRIBE DETAIL repos").collect()[0]
    assert row.key_cols == "repo,path" and int(row.n_buckets) == 4


def test_loud_gates(spark, fe_table):
    fe, table = fe_table
    with pytest.raises(SqlFrontendError, match="unknown table"):
        fe.sql("DELETE FROM nope WHERE true")
    with pytest.raises(SqlFrontendError, match="key column"):
        fe.sql("MERGE INTO repos t USING repos s ON t.repo = s.repo AND "
               "t.path = s.path WHEN MATCHED THEN UPDATE SET path = 'x'")
    with pytest.raises(SqlFrontendError, match="engine column"):
        fe.sql("MERGE INTO repos t USING repos s ON t.repo = s.repo AND "
               "t.path = s.path WHEN MATCHED THEN UPDATE SET seq = 99")
    with pytest.raises(SqlFrontendError, match="key columns"):
        fe.sql("MERGE INTO repos t USING repos s ON t.repo = s.repo "
               "WHEN MATCHED THEN UPDATE SET *")
    with pytest.raises(SqlFrontendError, match="SOURCE row only"):
        fe.sql("MERGE INTO repos t USING repos s ON t.repo = s.repo AND "
               "t.path = s.path WHEN NOT MATCHED AND t.lang = 'x' THEN INSERT *")
    with pytest.raises(SqlFrontendError, match="TARGET row only"):
        fe.sql("MERGE INTO repos t USING repos s ON t.repo = s.repo AND "
               "t.path = s.path WHEN NOT MATCHED BY SOURCE AND s.lang = 'x' "
               "THEN DELETE")
    with pytest.raises(SqlFrontendError, match="no BY SOURCE"):
        fe.sql("MERGE INTO repos t USING repos s ON t.repo = s.repo AND "
               "t.path = s.path WHEN MATCHED BY SOURCE THEN DELETE")
    with pytest.raises(SqlFrontendError, match="explicit column list"):
        fe.sql("INSERT INTO repos VALUES ('r', 'x')")
    with pytest.raises(SqlFrontendError, match="key columns"):
        fe.sql("INSERT INTO repos (lang) VALUES ('py')")
    with pytest.raises(SqlFrontendError, match="not in table schema"):
        fe.sql("INSERT INTO repos (repo, path, nope) VALUES ('r', 'x', 'y')")
    with pytest.raises(SqlFrontendError, match="unsupported statement"):
        fe.sql("GRANT SELECT ON repos TO bob")
    with pytest.raises(SqlFrontendError, match="NOT MATCHED supports"):
        fe.sql("MERGE INTO repos t USING repos s ON t.repo = s.repo AND "
               "t.path = s.path WHEN NOT MATCHED THEN DELETE")


def test_catalog_resolver(spark, tmp_path):
    from forklift_spark.lakette.catalog import Catalog

    cat = Catalog.create(str(tmp_path / "cat"))
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a")])
    cat.register("repos", table.root)
    fe = SqlFrontend(spark, cat)
    assert fe.sql("SELECT count(*) AS n FROM repos").collect()[0].n == 1


# ---- regression tests for the r5 self-review findings ----------------


def test_delete_with_typod_where_is_a_parse_error(spark, fe_table):
    """A malformed WHERE must never silently become a full-table delete."""
    fe, table = fe_table
    with pytest.raises(SqlFrontendError, match="unparsed text"):
        fe.sql("DELETE FROM repos WHRE lang = 'de'")
    assert len(_state(spark, table)) == 4  # nothing was touched
    # explicit full-table delete still works, spelled out
    fe.sql("DELETE FROM repos WHERE true")
    assert _state(spark, table) == {}


def test_cte_shadows_lakette_table(spark, fe_table):
    """SQL scoping: a CTE named like a registered table wins."""
    fe, table = fe_table
    n = fe.sql(
        "WITH repos AS (SELECT * FROM repos WHERE lang = 'py') "
        "SELECT count(*) AS n FROM repos"
    ).collect()[0].n
    assert n == 2  # the CTE's filter applied; 4 would mean it was bypassed


def test_comma_join_list_resolves_all_tables(spark, fe_table, tmp_path):
    fe, table = fe_table
    other = create_entity_table(str(tmp_path / "o"), n_buckets=2)
    _seed(spark, other, [_ev("I", 1, "a", lang="de")])
    fe2 = SqlFrontend(spark, {"repos": table, "others": other})
    n = fe2.sql(
        "SELECT count(*) AS n FROM repos, others "
        "WHERE repos.path = others.path"
    ).collect()[0].n
    assert n == 1


def test_multiline_string_literal_survives_comment_stripping(spark, fe_table):
    fe, table = fe_table
    fe.sql("UPDATE repos SET content = 'a\nb' WHERE path = 'a'  -- comment")
    assert _state(spark, table)["a"][1] == "a\nb"


def test_merge_duplicate_source_keys_raise(spark, fe_table):
    fe, table = fe_table
    spark.createDataFrame(
        [("r", "a", "x"), ("r", "a", "y")],
        "repo string, path string, content string",
    ).createOrReplaceTempView("dupsrc")
    with pytest.raises(SqlFrontendError, match="duplicate key rows"):
        fe.sql("MERGE INTO repos t USING dupsrc s ON t.repo = s.repo AND "
               "t.path = s.path WHEN MATCHED THEN UPDATE SET * "
               "WHEN NOT MATCHED THEN INSERT *")
    with pytest.raises(SqlFrontendError, match="duplicate key rows"):
        fe.sql("INSERT INTO repos SELECT repo, path, content FROM dupsrc")


def test_merge_unaliased_source_referenced_by_name(spark, fe_table):
    fe, table = fe_table
    spark.createDataFrame(
        [("r", "a", "by-name")], "repo string, path string, content string"
    ).createOrReplaceTempView("staged2")
    fe.sql(
        "MERGE INTO repos t USING staged2 ON t.repo = staged2.repo AND "
        "t.path = staged2.path WHEN MATCHED THEN UPDATE SET *"
    )
    assert _state(spark, table)["a"][1] == "by-name"


def test_merge_on_clause_case_insensitive_columns(spark, fe_table):
    fe, table = fe_table
    spark.createDataFrame(
        [("r", "a", "cased")], "repo string, path string, content string"
    ).createOrReplaceTempView("staged3")
    fe.sql(
        "MERGE INTO repos t USING staged3 s ON t.Repo = s.Repo AND "
        "t.PATH = s.PATH WHEN MATCHED THEN UPDATE SET *"
    )
    assert _state(spark, table)["a"][1] == "cased"


def test_select_views_are_deterministic_and_fresh(spark, fe_table):
    """View names are per (table, version): repeated SELECTs reuse/replace
    instead of leaking one uuid view per call, and a new commit IS
    reflected by the next statement."""
    fe, table = fe_table
    fe.sql("SELECT count(*) AS n FROM repos")
    before = {v.name for v in spark.catalog.listTables() if v.name.startswith("__lakette_")}
    fe.sql("SELECT count(*) AS n FROM repos")
    after = {v.name for v in spark.catalog.listTables() if v.name.startswith("__lakette_")}
    assert before == after  # no growth on re-query of the same version
    _seed(spark, table, [_ev("I", 9, "zz")], epoch=1)
    n = fe.sql("SELECT count(*) AS n FROM repos").collect()[0].n
    assert n == 5  # the new commit is visible without re-registering


def test_metadata_table_suffixes_and_explain(spark, fe_table):
    """Iceberg-style metadata tables through SQL: <t>.history / .files /
    .refs are driver-side metadata reads; EXPLAIN passes through."""
    fe, table = fe_table
    table.create_ref("snap1", kind="tag")
    hist = fe.sql("SELECT version, total_rows FROM repos.history ORDER BY version")
    assert hist.count() >= 1
    files = fe.sql("SELECT count(*) AS n, sum(rows) AS r FROM repos.files").collect()[0]
    assert int(files.r) == 4
    refs = fe.sql("SELECT name, kind FROM repos.refs").collect()
    assert ("snap1", "tag") in {(r.name, r.kind) for r in refs}
    # joins between data and metadata mix freely
    j = fe.sql(
        "SELECT count(*) AS n FROM repos r JOIN repos.refs f ON f.kind = 'tag'"
    ).collect()[0].n
    assert j == 4
    plan = fe.sql("EXPLAIN SELECT count(*) FROM repos").collect()[0][0]
    assert "__lakette_repos" in plan or "Aggregate" in plan


# ---- CREATE TABLE / CTAS / DROP TABLE ---------------------------------


def test_create_table_explicit_schema(spark, fe_table, tmp_path):
    """Explicit-schema CREATE: Spark-DDL types, PRIMARY KEY in the column
    list, LOCATION external root, TBLPROPERTIES -> create kwargs."""
    fe, _ = fe_table
    rep = fe.sql(
        "CREATE TABLE docs (id BIGINT, body STRING, score DOUBLE, "
        "PRIMARY KEY (id)) USING LAKETTE "
        f"LOCATION '{tmp_path / 'docs'}' "
        "TBLPROPERTIES ('n_buckets' = '2', 'cluster_by' = 'score')"
    ).collect()[0]
    assert rep.created == "True"
    t = fe._table("docs")
    assert t.key_cols() == ["id"]
    meta = t.current_metadata()
    assert meta["n_buckets"] == 2 and meta.get("cluster_by") == ["score"]
    # the new name works in every other statement immediately
    fe.sql("INSERT INTO docs (id, body, score) VALUES (1, 'x', 0.5)")
    assert fe.sql("SELECT count(*) AS n FROM docs").collect()[0].n == 1
    # IF NOT EXISTS on an existing name: no-op report, no error
    rep2 = fe.sql(
        f"CREATE TABLE IF NOT EXISTS docs (id BIGINT, PRIMARY KEY (id)) "
        f"LOCATION '{tmp_path / 'docs2'}'"
    ).collect()[0]
    assert rep2.created == "False"
    with pytest.raises(SqlFrontendError, match="already registered"):
        fe.sql(
            f"CREATE TABLE docs (id BIGINT, PRIMARY KEY (id)) "
            f"LOCATION '{tmp_path / 'docs3'}'"
        )


def test_create_table_as_select(spark, fe_table, tmp_path):
    """CTAS: schema from the SELECT, rows seeded through the INSERT path
    with a minted seq; result matches the SELECT exactly."""
    fe, _ = fe_table
    rep = fe.sql(
        "CREATE TABLE py_repos PRIMARY KEY (path) "
        f"LOCATION '{tmp_path / 'py'}' AS "
        "SELECT path, content FROM repos WHERE lang = 'py'"
    ).collect()[0]
    assert rep.created == "True" and rep.rows == "2"
    got = {
        (r.path, r.content)
        for r in fe.sql("SELECT path, content FROM py_repos").collect()
    }
    assert got == {("b", "body"), ("d", "body")}
    # schema came from the SELECT (keys + payload, nothing else)
    t = fe._table("py_repos")
    assert [f.name for f in t.user_schema().fields] == ["path", "content"]


def test_create_table_loud_gates(spark, fe_table, tmp_path):
    fe, _ = fe_table
    # no PRIMARY KEY: lakette tables are keyed — loud, names the rule
    with pytest.raises(SqlFrontendError, match="PRIMARY KEY"):
        fe.sql(f"CREATE TABLE t1 (id BIGINT) LOCATION '{tmp_path / 't1'}'")
    # PK names a column that is not declared
    with pytest.raises(SqlFrontendError, match="not a declared column"):
        fe.sql(
            f"CREATE TABLE t2 (id BIGINT, PRIMARY KEY (nope)) "
            f"LOCATION '{tmp_path / 't2'}'"
        )
    # engine column names are reserved
    with pytest.raises(SqlFrontendError, match="reserved"):
        fe.sql(
            f"CREATE TABLE t3 (seq BIGINT, PRIMARY KEY (seq)) "
            f"LOCATION '{tmp_path / 't3'}'"
        )
    # managed table needs a Catalog resolver
    with pytest.raises(SqlFrontendError, match="LOCATION"):
        fe.sql("CREATE TABLE t4 (id BIGINT, PRIMARY KEY (id))")
    # column list + AS SELECT is ambiguous: refused
    with pytest.raises(SqlFrontendError, match="schema from the SELECT"):
        fe.sql(
            f"CREATE TABLE t5 (id BIGINT, PRIMARY KEY (id)) "
            f"LOCATION '{tmp_path / 't5'}' AS SELECT 1 AS id"
        )
    # unknown TBLPROPERTIES key: loud, lists the supported set
    with pytest.raises(SqlFrontendError, match="unknown table property"):
        fe.sql(
            f"CREATE TABLE t6 (id BIGINT, PRIMARY KEY (id)) "
            f"LOCATION '{tmp_path / 't6'}' TBLPROPERTIES ('zorder' = 'on')"
        )
    # other engine format: not ours
    with pytest.raises(SqlFrontendError, match="USING"):
        fe.sql(
            f"CREATE TABLE t7 (id BIGINT, PRIMARY KEY (id)) USING DELTA "
            f"LOCATION '{tmp_path / 't7'}'"
        )
    # CTAS duplicate keys: arbitration tie — refused like INSERT/MERGE
    with pytest.raises(SqlFrontendError, match="duplicate key"):
        fe.sql(
            "CREATE TABLE t8 PRIMARY KEY (lang) "
            f"LOCATION '{tmp_path / 't8'}' AS SELECT lang, content FROM repos"
        )


def test_drop_table(spark, fe_table, tmp_path):
    """DROP unregisters (metadata-only); the table directory survives."""
    fe, _ = fe_table
    fe.sql(
        "CREATE TABLE tmp1 (id BIGINT, PRIMARY KEY (id)) "
        f"LOCATION '{tmp_path / 'tmp1'}'"
    )
    root = fe._table("tmp1").root
    rep = fe.sql("DROP TABLE tmp1").collect()[0]
    assert rep.dropped == "True"
    assert not fe._is_table("tmp1")
    import os
    assert os.path.exists(os.path.join(root, "metadata"))  # data untouched
    with pytest.raises(SqlFrontendError, match="unknown table"):
        fe.sql("DROP TABLE tmp1")
    rep2 = fe.sql("DROP TABLE IF EXISTS tmp1").collect()[0]
    assert rep2.dropped == "False"


def test_create_drop_through_catalog(spark, tmp_path):
    """With a Catalog resolver: LOCATION-less CREATE is a managed table
    under <catalog_root>/tables/<name>; DROP releases the catalog pin."""
    from forklift_spark.lakette.catalog import Catalog

    cat = Catalog.create(str(tmp_path / "cat"))
    fe = SqlFrontend(spark, cat)
    rep = fe.sql(
        "CREATE TABLE events (id BIGINT, kind STRING, PRIMARY KEY (id))"
    ).collect()[0]
    assert rep.created == "True"
    assert rep.location == str(tmp_path / "cat" / "tables" / "events")
    fe.sql("INSERT INTO events (id, kind) VALUES (1, 'click'), (2, 'view')")
    # the frontend resolves LIVE table heads (Catalog.table returns the
    # handle, not the pinned version), so the insert is visible at once;
    # advance keeps the catalog's own read-set current for its readers
    cat.advance("events")
    assert fe.sql("SELECT count(*) AS n FROM events").collect()[0].n == 2
    fe.sql("DROP TABLE events")
    assert "events" not in cat.names()


# ---- COPY INTO / SHOW / TRUNCATE --------------------------------------


def _write_parquet(spark, path, rows, schema="repo string, path string, lang string, content string"):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(str(path))


def test_copy_into_loads_each_file_once(spark, fe_table, tmp_path):
    """Per-file exactly-once: a re-run loads nothing; a NEW file in the
    same directory loads alone; rows enter with a minted seq."""
    fe, table = fe_table
    land = tmp_path / "landing"
    _write_parquet(spark, land / "f1", [("r", "n1", "py", "one")])
    rep = fe.sql(
        f"COPY INTO repos FROM '{land}/f1' FILEFORMAT = PARQUET"
    ).collect()[0]
    assert rep.rows == "1" and rep.files_loaded >= "1"
    assert _state(spark, table)["n1"][1] == "one"
    # identical re-run: zero files, zero rows, no new version
    v = int(table.current_metadata()["version"])
    rep2 = fe.sql(
        f"COPY INTO repos FROM '{land}/f1' FILEFORMAT = PARQUET"
    ).collect()[0]
    assert rep2.files_loaded == "0" and int(table.current_metadata()["version"]) == v


def test_copy_into_directory_incremental(spark, fe_table, tmp_path):
    """Directory source: only files without markers load; a later file
    arriving in the same dir is picked up by the next COPY."""
    fe, table = fe_table
    land = tmp_path / "dir_landing"
    land.mkdir()
    _write_parquet(spark, tmp_path / "a", [("r", "p1", "py", "v1")])
    _write_parquet(spark, tmp_path / "b", [("r", "p2", "py", "v2")])
    import shutil as sh
    for src, dst in (("a", "one.parquet"), ("b", "two.parquet")):
        part = next(p for p in (tmp_path / src).iterdir() if p.name.endswith(".parquet"))
        sh.copy(part, land / dst)
    rep = fe.sql(f"COPY INTO repos FROM '{land}' FILEFORMAT = PARQUET").collect()[0]
    assert rep.files_loaded == "2" and rep.rows == "2"
    # third file arrives later: ONLY it loads
    _write_parquet(spark, tmp_path / "c", [("r", "p3", "py", "v3")])
    part = next(p for p in (tmp_path / "c").iterdir() if p.name.endswith(".parquet"))
    sh.copy(part, land / "three.parquet")
    rep2 = fe.sql(f"COPY INTO repos FROM '{land}' FILEFORMAT = PARQUET").collect()[0]
    assert rep2.files_loaded == "1" and rep2.files_skipped == "2"
    assert _state(spark, table)["p3"][1] == "v3"


def test_copy_into_heals_crash_between_commit_and_markers(spark, fe_table, tmp_path):
    """The crash window: batch committed, per-file markers never written.
    The next COPY must recognize the intent's epoch as committed, write
    the markers, and NOT reload the files."""
    import os as _os

    fe, table = fe_table
    land = tmp_path / "crash_landing"
    _write_parquet(spark, land / "f1", [("r", "cx", "py", "crash")])
    fe.sql(f"COPY INTO repos FROM '{land}/f1' FILEFORMAT = PARQUET")
    # simulate the crash retroactively: delete the per-file markers and
    # restore the intent (exactly the state a die-after-commit leaves)
    import hashlib
    qid = "sql_copy_" + hashlib.sha256(
        _os.path.abspath(str(land / "f1")).encode()
    ).hexdigest()[:16]
    qdir = _os.path.join(table.epochs_dir, qid)
    files = sorted(
        _os.path.join(str(land / "f1"), f) for f in _os.listdir(land / "f1")
        if not f.startswith((".", "_")) and f.endswith(".parquet")
    )
    epoch = int.from_bytes(hashlib.sha256("\n".join(files).encode()).digest()[:8], "big") >> 2
    for f in _os.listdir(qdir):
        if f.startswith("file-"):
            _os.remove(_os.path.join(qdir, f))
    table.fs.put_json(_os.path.join(qdir, f"intent-{epoch}.json"),
                      {"epoch": epoch, "files": files})
    v = int(table.current_metadata()["version"])
    rep = fe.sql(f"COPY INTO repos FROM '{land}/f1' FILEFORMAT = PARQUET").collect()[0]
    assert rep.files_loaded == "0"  # healed, not reloaded
    assert int(table.current_metadata()["version"]) == v
    assert not any(f.startswith("intent-") for f in _os.listdir(qdir))
    assert any(f.startswith("file-") for f in _os.listdir(qdir))


def test_copy_into_csv_with_schema_and_gates(spark, fe_table, tmp_path):
    fe, table = fe_table
    csv = tmp_path / "in.csv"
    csv.write_text("r,c1,cc,py,from csv\n")
    rep = fe.sql(
        f"COPY INTO repos FROM '{csv}' FILEFORMAT = CSV "
        "FORMAT_OPTIONS ('header' = 'false')"
    ).collect()[0]
    assert rep.rows == "1"
    assert _state(spark, table)["c1"][1] == "from csv"
    with pytest.raises(SqlFrontendError, match="does not exist"):
        fe.sql(f"COPY INTO repos FROM '{tmp_path}/nope' FILEFORMAT = PARQUET")
    with pytest.raises(SqlFrontendError, match="FILEFORMAT"):
        fe.sql(f"COPY INTO repos FROM '{csv}' FILEFORMAT = AVRO")
    # duplicate keys within one batch: loud arbitration-tie refusal
    dup = tmp_path / "dup.csv"
    dup.write_text("r,same,cc,py,a\nr,same,cc,py,b\n")
    with pytest.raises(SqlFrontendError, match="duplicate key"):
        fe.sql(f"COPY INTO repos FROM '{dup}' FILEFORMAT = CSV")


def test_show_tables_and_show_create(spark, fe_table, tmp_path):
    fe, table = fe_table
    rows = fe.sql("SHOW TABLES").collect()
    assert [(r.name, r.key_cols) for r in rows] == [("repos", "repo,path")]
    ddl = fe.sql("SHOW CREATE TABLE repos").collect()[0].createtab_stmt
    assert "PRIMARY KEY (repo, path)" in ddl and "USING LAKETTE" in ddl
    # round-trip: the emitted DDL re-creates an equivalent table
    ddl2 = ddl.replace("CREATE TABLE repos", "CREATE TABLE repos2").replace(
        f"LOCATION '{table.root}'", f"LOCATION '{tmp_path / 'r2'}'"
    )
    fe.sql(ddl2)
    t2 = fe._table("repos2")
    assert t2.key_cols() == table.key_cols()
    assert [f.name for f in t2.user_schema().fields] == [
        f.name for f in table.user_schema().fields
    ]


def test_truncate_table(spark, fe_table):
    """TRUNCATE tombstones every live row in one versioned commit —
    time travel still sees the old rows."""
    fe, table = fe_table
    v = int(table.current_metadata()["version"])
    fe.sql("TRUNCATE TABLE repos")
    assert fe.sql("SELECT count(*) AS n FROM repos").collect()[0].n == 0
    assert fe.sql(
        f"SELECT count(*) AS n FROM repos VERSION AS OF {v}"
    ).collect()[0].n == 4


# ---- OPTIMIZE ZORDER / ANALYZE ----------------------------------------


def test_optimize_zorder_by(spark, fe_table):
    """ZORDER BY compiles onto compact's cluster override; the clustering
    is recorded in metadata and the state is unchanged."""
    fe, table = fe_table
    before = _state(spark, table)
    rep = fe.sql("OPTIMIZE repos ZORDER BY (lang, commit)").collect()[0]
    assert rep.statement == "OPTIMIZE" and rep.zorder_by == "lang,commit"
    # the rewrite recorded per-file cstats for BOTH zorder columns
    # (that is what the layout buys: pruning on non-key scans), and the
    # table state is byte-identical
    files = table.plan_files()
    assert files and all(
        (f.get("cstats") or {}).get("lang") and (f.get("cstats") or {}).get("commit")
        for f in files
    )
    assert _state(spark, table) == before
    # single column: linear is strictly better and compact refuses
    # 1-column zorder — the statement picks the better mode silently
    rep1 = fe.sql("OPTIMIZE repos ZORDER BY (lang)").collect()[0]
    assert rep1.zorder_by == "lang"
    # key columns are already the sort prefix: compact refuses, loudly
    with pytest.raises(SqlFrontendError, match="OPTIMIZE"):
        fe.sql("OPTIMIZE repos ZORDER BY (path, lang)")


def test_analyze_table_profiles_columns(spark, fe_table):
    fe, table = fe_table
    prof = {r.column_name: r for r in fe.sql(
        "ANALYZE TABLE repos COMPUTE STATISTICS"
    ).collect()}
    assert set(prof) == {"repo", "path", "commit", "lang", "content"}
    assert prof["lang"].n_rows == 4 and prof["lang"].n_distinct == 3
    assert prof["path"].min_str == "a" and prof["path"].max_str == "d"
    # FOR COLUMNS subset, case-insensitive resolution
    sub = fe.sql(
        "ANALYZE TABLE repos COMPUTE STATISTICS FOR COLUMNS LANG, path"
    ).collect()
    assert {r.column_name for r in sub} == {"lang", "path"}
    # WITH APPROX still answers (sketched cardinality)
    ap = {r.column_name: r for r in fe.sql(
        "ANALYZE TABLE repos COMPUTE STATISTICS FOR COLUMNS lang WITH APPROX"
    ).collect()}
    assert ap["lang"].n_distinct >= 2
    with pytest.raises(SqlFrontendError, match="no such columns"):
        fe.sql("ANALYZE TABLE repos COMPUTE STATISTICS FOR COLUMNS nope")


# ---- BEGIN / COMMIT / ROLLBACK ----------------------------------------


def test_transaction_two_tables_commit_atomically(spark, fe_table, tmp_path):
    """INSERTs into two tables inside BEGIN..COMMIT: invisible until
    COMMIT, then both published through ONE transaction record."""
    fe, table = fe_table
    other = create_entity_table(str(tmp_path / "o"), n_buckets=2)
    _seed(spark, other, [_ev("I", 1, "base")])
    fe2 = SqlFrontend(spark, {"repos": table, "other": other})
    fe2.sql("BEGIN")
    rep = fe2.sql(
        "INSERT INTO repos (repo, path, lang) VALUES ('r', 'tx1', 'py')"
    ).collect()[0]
    assert rep.staged  # staged, not committed
    fe2.sql("INSERT INTO other (repo, path, lang) VALUES ('r', 'tx2', 'py')")
    # no dirty reads: the staged rows are invisible mid-transaction
    assert fe2.sql("SELECT count(*) AS n FROM repos").collect()[0].n == 4
    assert fe2.sql("SELECT count(*) AS n FROM other").collect()[0].n == 1
    crep = fe2.sql("COMMIT").collect()[0]
    assert crep.members == "2"
    assert "tx1" in _state(spark, table)
    assert "tx2" in {r.path for r in other.snapshot(spark).collect()}


def test_transaction_rollback_discards_everything(spark, fe_table, tmp_path):
    fe, table = fe_table
    fe.sql("BEGIN TRANSACTION")
    fe.sql("INSERT INTO repos (repo, path, lang) VALUES ('r', 'gone', 'py')")
    rep = fe.sql("ROLLBACK").collect()[0]
    assert rep.aborted_members == "1"
    assert "gone" not in _state(spark, table)
    assert table.list_staged() == []  # staged payload cleaned up
    # the frontend is reusable after rollback
    fe.sql("INSERT INTO repos (repo, path, lang) VALUES ('r', 'kept', 'py')")
    assert "kept" in _state(spark, table)


def test_transaction_loud_gates(spark, fe_table):
    fe, table = fe_table
    with pytest.raises(SqlFrontendError, match="COMMIT without BEGIN"):
        fe.sql("COMMIT")
    with pytest.raises(SqlFrontendError, match="ROLLBACK without BEGIN"):
        fe.sql("ROLLBACK")
    fe.sql("BEGIN")
    with pytest.raises(SqlFrontendError, match="no nesting"):
        fe.sql("BEGIN")
    # non-stageable statements are refused inside a transaction
    with pytest.raises(SqlFrontendError, match="not allowed inside"):
        fe.sql("UPDATE repos SET lang = 'x' WHERE true")
    with pytest.raises(SqlFrontendError, match="not allowed inside"):
        fe.sql("OPTIMIZE repos")
    # one write statement per table per transaction
    fe.sql("INSERT INTO repos (repo, path, lang) VALUES ('r', 'w1', 'py')")
    with pytest.raises(SqlFrontendError, match="one write statement per table"):
        fe.sql("INSERT INTO repos (repo, path, lang) VALUES ('r', 'w2', 'py')")
    fe.sql("ROLLBACK")
    # empty transaction commits as a no-op
    fe.sql("BEGIN")
    assert fe.sql("COMMIT").collect()[0].members == "0"


# ---- ref time travel / VACUUM DRY RUN ---------------------------------


def test_version_as_of_ref_name(spark, fe_table):
    """VERSION AS OF '<tag-or-branch>' resolves through ref_version —
    Iceberg-style named time travel, in SELECT and RESTORE."""
    fe, table = fe_table
    table.create_ref("trained", kind="tag")
    _seed(spark, table, [_ev("U", 9, "a", lang="go")], epoch=1)
    cur = {r.path: r.lang for r in fe.sql("SELECT path, lang FROM repos").collect()}
    assert cur["a"] == "go"
    old = {r.path: r.lang for r in fe.sql(
        "SELECT path, lang FROM repos VERSION AS OF 'trained'"
    ).collect()}
    assert old["a"] == "de"
    # RESTORE TO a tag: the table rolls back to the tagged rows
    fe.sql("RESTORE TABLE repos TO VERSION AS OF 'trained'")
    assert _state(spark, table)["a"][0] == "de"
    with pytest.raises(ValueError, match="nope|no such"):
        fe.sql("SELECT * FROM repos VERSION AS OF 'nope'")


def test_vacuum_dry_run_counts_without_deleting(spark, fe_table):
    import os as _os

    fe, table = fe_table
    # rewrite everything twice so old versions hold unreferenced files
    fe.sql("UPDATE repos SET content = content || '1' WHERE true")
    fe.sql("UPDATE repos SET content = content || '2' WHERE true")
    n_data = len(_os.listdir(_os.path.join(table.root, "data")))
    rep = fe.sql("VACUUM repos RETAIN 0 HOURS DRY RUN").collect()[0]
    assert rep.dry_run == "True" and int(rep.removed_data_files) > 0
    # nothing actually deleted
    assert len(_os.listdir(_os.path.join(table.root, "data"))) == n_data
    # the real vacuum removes exactly what the dry run predicted
    rep2 = fe.sql("VACUUM repos RETAIN 0 HOURS").collect()[0]
    assert rep2.removed_data_files == rep.removed_data_files
    assert len(_os.listdir(_os.path.join(table.root, "data"))) == n_data - int(
        rep.removed_data_files
    )


def test_changes_metadata_table_is_the_cdc_feed(spark, fe_table):
    """FROM <t>.changes VERSION AS OF <n> — Delta table_changes parity:
    the span turning snapshot@n into the current snapshot, with change
    kind, keys, and full payload; tags work as offsets too."""
    fe, table = fe_table
    v0 = int(table.current_metadata()["version"])
    table.create_ref("before_fix", kind="tag")
    _seed(spark, table, [
        _ev("U", 9, "a", lang="go"), _ev("I", 10, "zz"),
        _ev("D", 11, "b", lang=None, content=None),
    ], epoch=1)
    rows = fe.sql(
        f"SELECT change, path FROM repos.changes VERSION AS OF {v0} "
        "ORDER BY path"
    ).collect()
    assert [(r.change, r.path) for r in rows] == [
        ("update", "a"), ("delete", "b"), ("insert", "zz"),
    ]
    # tag as the offset; payload columns ride along (full rows)
    got = fe.sql(
        "SELECT change, path, lang FROM repos.changes VERSION AS OF "
        "'before_fix' WHERE change = 'update'"
    ).collect()
    assert [(r.change, r.path, r.lang) for r in got] == [("update", "a", "go")]
    # joins against the live table mix freely
    n = fe.sql(
        f"SELECT count(*) AS n FROM repos.changes VERSION AS OF {v0} c "
        "JOIN repos r ON c.path = r.path"
    ).collect()[0].n
    assert n == 2  # the deleted row no longer joins
    # offset-less: loud, names the required form
    with pytest.raises(SqlFrontendError, match="starting\n?\\s*offset|starting offset"):
        fe.sql("SELECT * FROM repos.changes")


def test_changes_bounded_span_to_version(spark, fe_table):
    """FROM <t>.changes VERSION AS OF <n> TO <m> — the bounded span
    (Delta table_changes(start, end) parity): later commits must NOT
    leak into the feed, and tags resolve on both ends."""
    fe, table = fe_table
    v0 = int(table.current_metadata()["version"])
    _seed(spark, table, [_ev("U", 9, "a", lang="go")], epoch=1)
    v1 = int(table.current_metadata()["version"])
    table.create_ref("mid", kind="tag")
    _seed(spark, table, [_ev("I", 10, "zz")], epoch=2)

    rows = fe.sql(
        f"SELECT change, path FROM repos.changes VERSION AS OF {v0} TO {v1}"
    ).collect()
    assert [(r.change, r.path) for r in rows] == [("update", "a")]
    # tag as the end bound; alias still attaches after the TO clause
    rows = fe.sql(
        f"SELECT c.change, c.path FROM repos.changes VERSION AS OF {v0} "
        "TO 'mid' c WHERE c.change = 'update'"
    ).collect()
    assert [(r.change, r.path) for r in rows] == [("update", "a")]
    # unbounded still reaches the head
    n = fe.sql(
        f"SELECT count(*) AS n FROM repos.changes VERSION AS OF {v0}"
    ).collect()[0].n
    assert n == 2


def test_alter_add_column(spark, fe_table):
    """ALTER TABLE ADD COLUMN[S]: metadata-only additive evolution — old
    rows read typed NULL, new writes carry the column, SHOW CREATE TABLE
    lists it, and reserved/duplicate names are refused."""
    fe, table = fe_table
    rep = fe.sql(
        "ALTER TABLE repos ADD COLUMNS (stars BIGINT, meta STRUCT<a: INT>)"
    ).collect()[0]
    assert rep.columns == "stars,meta"

    # pre-evolution rows: typed NULLs
    got = fe.sql("SELECT path, stars, meta FROM repos WHERE path = 'a'").collect()[0]
    assert got.stars is None and got.meta is None
    # new writes carry it through the ordinary merge path
    fe.sql("UPDATE repos SET stars = 7 WHERE path = 'a'")
    assert fe.sql(
        "SELECT stars FROM repos WHERE path = 'a'"
    ).collect()[0].stars == 7
    # surfaces in SHOW CREATE TABLE
    ddl = fe.sql("SHOW CREATE TABLE repos").collect()[0].createtab_stmt
    assert "stars BIGINT" in ddl
    # loud gates: duplicate, reserved, bad type, PRIMARY KEY
    with pytest.raises(SqlFrontendError, match="already exists"):
        fe.sql("ALTER TABLE repos ADD COLUMN (stars LONG)")
    with pytest.raises(SqlFrontendError, match="reserved"):
        fe.sql("ALTER TABLE repos ADD COLUMN (seq LONG)")
    with pytest.raises(SqlFrontendError, match="cannot parse column types"):
        fe.sql("ALTER TABLE repos ADD COLUMN (x NOTATYPE)")
    with pytest.raises(SqlFrontendError, match="PRIMARY KEY"):
        fe.sql("ALTER TABLE repos ADD COLUMN (x INT, PRIMARY KEY (x))")


def test_fsck_and_export_statements(spark, fe_table, tmp_path):
    fe, table = fe_table
    # healthy table: single ok row (FSCK reports, never repairs)
    rows = fe.sql("FSCK TABLE repos DEEP").collect()
    assert [r.status for r in rows] == ["ok"]
    # engine-free export of a pinned version, then read it back via the
    # manifest reader — full interop round trip driven from SQL
    table.create_ref("drop1", kind="tag")
    _seed(spark, table, [_ev("U", 9, "a", lang="go")], epoch=1)
    rep = fe.sql(
        f"EXPORT TABLE repos VERSION AS OF 'drop1' TO '{tmp_path / 'out'}'"
    ).collect()[0]
    assert rep.files >= "1" and rep.rows == "4"
    from forklift_spark.operators.interop import read_manifest
    back = read_manifest(spark, str(tmp_path / "out"))
    st = {r.path: r.lang for r in back.collect()}
    assert st["a"] == "de"  # the tagged (pre-update) snapshot
    with pytest.raises(SqlFrontendError, match="supported: EXPORT"):
        fe.sql("EXPORT TABLE repos")


def test_insert_overwrite_replaces_atomically(spark, fe_table):
    """INSERT OVERWRITE: new rows upsert AND absent keys tombstone in ONE
    commit — a versioned full replace (time travel sees the old state)."""
    fe, table = fe_table
    v = int(table.current_metadata()["version"])
    spark.createDataFrame(
        [("r", "a", "kept"), ("r", "new1", "fresh")],
        "repo string, path string, content string",
    ).createOrReplaceTempView("replacement")
    rep = fe.sql("INSERT OVERWRITE repos SELECT * FROM replacement").collect()[0]
    assert rep.statement == "INSERT OVERWRITE"
    st = _state(spark, table)
    assert set(st) == {"a", "new1"}          # b/c/d tombstoned
    assert st["a"][1] == "kept"
    # exactly ONE commit happened
    assert int(table.current_metadata()["version"]) == v + 1
    # the pre-replace state is still addressable
    old = fe.sql(f"SELECT count(*) AS n FROM repos VERSION AS OF {v}").collect()[0].n
    assert old == 4
    with pytest.raises(SqlFrontendError, match="OVERWRITE takes a SELECT"):
        fe.sql("INSERT OVERWRITE repos (repo, path) VALUES ('r', 'x')")


def test_run_script_executes_statements_in_order(spark, fe_table):
    fe, table = fe_table
    out = fe.run_script("""
        -- a script mixing DML, a transaction, and a final query
        DELETE FROM repos WHERE lang = 'de';
        BEGIN;
        INSERT INTO repos (repo, path, lang, content)
            VALUES ('r', 'scripted', 'py', 'has; a semicolon');
        COMMIT;
        SELECT path, content FROM repos WHERE path = 'scripted'
    """).collect()
    assert [(r.path, r.content) for r in out] == [("scripted", "has; a semicolon")]
    assert "a" not in _state(spark, table)
    with pytest.raises(SqlFrontendError, match="empty script"):
        fe.run_script("  -- nothing\n  ")


def test_concurrent_copy_into_twins_are_exactly_once(spark, fe_table, tmp_path):
    """Two threads race the same COPY INTO: whatever the interleaving,
    every file applies exactly once — the loser either skips (markers
    already visible) or ADOPTS the twin's identical commit (same batch
    epoch under the shared statement query-id), never errors, never
    double-loads."""
    import threading

    fe, table = fe_table
    land = tmp_path / "race_land"
    _write_parquet(spark, land, [("r", f"rc{i}", "py", f"b{i}") for i in range(30)])
    errs, loaded = [], []

    def run():
        try:
            r = SqlFrontend(spark, {"repos": table}).sql(
                f"COPY INTO repos FROM '{land}' FILEFORMAT = PARQUET"
            ).collect()[0]
            loaded.append(int(r.files_loaded))
        except Exception as e:  # pragma: no cover - any error is a failure
            errs.append(e)

    ts = [threading.Thread(target=run) for _ in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs, errs
    # the 30 rows landed exactly once, whoever won
    got = {r.path for r in table.snapshot(spark).collect() if r.path.startswith("rc")}
    assert len(got) == 30
    re = fe.sql(f"COPY INTO repos FROM '{land}' FILEFORMAT = PARQUET").collect()[0]
    assert re.files_loaded == "0"


# ---- DESCRIBE [TABLE] (round 5) ------------------------------------------


def test_describe_lists_user_columns_with_roles(spark, fe_table):
    fe, table = fe_table
    rows = {r.col_name: r for r in fe.sql("DESCRIBE repos").collect()}
    # engine META columns never leak
    assert "seq" not in rows and "deleted" not in rows
    assert "path" in rows and "content" in rows
    assert "key" in rows["path"].roles
    assert rows["lang"].data_type == "string"
    # DESCRIBE TABLE spelling is the same statement
    rows2 = {r.col_name for r in fe.sql("DESCRIBE TABLE repos").collect()}
    assert rows2 == set(rows)


def test_describe_roles_and_rename(spark, tmp_path):
    from pyspark.sql import types as T

    from forklift_spark.lakette.table import LaketteTable

    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("commit", T.StringType(), True),
        T.StructField("size", T.IntegerType(), True),
    ])
    t = LaketteTable.create(
        str(tmp_path / "d"), schema, ["id"], n_buckets=2,
        bloom_cols=["commit"], cluster_by=["lang", "commit"],
        cluster_mode="zorder",
    )
    fe = SqlFrontend(spark, {"t": t})
    rows = {r.col_name: r for r in fe.sql("DESCRIBE t").collect()}
    assert "key" in rows["id"].roles
    assert "cluster[0]" in rows["lang"].roles
    assert "cluster[1]" in rows["commit"].roles and "bloom" in rows["commit"].roles
    assert rows["size"].data_type == "int"
    # rename flows through column mapping: DESCRIBE shows the NEW logical
    # name, the old one is gone
    t.rename_column("size", "bytes")
    rows = {r.col_name: r for r in fe.sql("DESCRIBE t").collect()}
    assert "bytes" in rows and "size" not in rows
    assert rows["bytes"].data_type == "int"


def test_describe_unknown_table_is_loud(spark, fe_table):
    fe, _ = fe_table
    with pytest.raises(SqlFrontendError, match="unknown table"):
        fe.sql("DESCRIBE nope")


# ---- CREATE TABLE ... SHALLOW CLONE ----------------------------------


def test_sql_shallow_clone_zero_copy_and_pinned(spark, fe_table, tmp_path):
    """The SQL clone compiles onto shallow_clone: zero-copy birth, a
    vacuum pin on the source, and full independence after birth."""
    fe, table = fe_table
    rep = fe.sql(
        f"CREATE TABLE dev SHALLOW CLONE repos LOCATION '{tmp_path / 'dev'}'"
    ).collect()[0]
    assert rep.created == "True"
    pin = rep.pin
    assert pin.startswith("clone-")
    assert any(r["name"] == pin for r in table.list_refs())
    # same rows, no data copied (clone data dir empty at birth)
    assert fe.sql("SELECT count(*) AS n FROM dev").collect()[0].n == 4
    import os as _os
    dev_data = str(tmp_path / "dev" / "data")
    assert not any(_os.scandir(dev_data))
    # independence: write to the clone, source unchanged
    fe.sql("UPDATE dev SET lang = 'rs' WHERE path = 'a'")
    assert _state(spark, table)["a"][0] == "de"
    assert {r.path: r.lang for r in fe.sql(
        "SELECT path, lang FROM dev").collect()}["a"] == "rs"


def test_sql_shallow_clone_version_and_tag(spark, fe_table, tmp_path):
    fe, table = fe_table
    v1 = table.current_metadata()["version"]
    table.create_ref("pre", kind="tag", version=v1)
    _seed(spark, table, [_ev("U", 9, "a", lang="go")], epoch=1)
    fe.sql(
        f"CREATE TABLE old SHALLOW CLONE repos VERSION AS OF {v1} "
        f"LOCATION '{tmp_path / 'old'}'"
    )
    fe.sql(
        f"CREATE TABLE tagd SHALLOW CLONE repos VERSION AS OF 'pre' "
        f"LOCATION '{tmp_path / 'tagd'}'"
    )
    for nm in ("old", "tagd"):
        got = {r.path: r.lang
               for r in fe.sql(f"SELECT path, lang FROM {nm}").collect()}
        assert got["a"] == "de", nm  # pre-update state travelled


def test_sql_shallow_clone_guards(spark, fe_table, tmp_path):
    fe, table = fe_table
    # plain-dict resolver without LOCATION is loud
    with pytest.raises(SqlFrontendError, match="LOCATION"):
        fe.sql("CREATE TABLE dev SHALLOW CLONE repos")
    # existing name is loud; IF NOT EXISTS is a no-op report
    with pytest.raises(SqlFrontendError, match="already registered"):
        fe.sql(
            f"CREATE TABLE repos SHALLOW CLONE repos "
            f"LOCATION '{tmp_path / 'x'}'"
        )
    rep = fe.sql(
        f"CREATE TABLE IF NOT EXISTS repos SHALLOW CLONE repos "
        f"LOCATION '{tmp_path / 'x'}'"
    ).collect()[0]
    assert rep.created == "False"
    # junk trailing clause is loud
    with pytest.raises(SqlFrontendError, match="unparsed clause"):
        fe.sql("CREATE TABLE dev SHALLOW CLONE repos DEEP COPY")


def test_sql_shallow_clone_managed_under_catalog(spark, tmp_path):
    """LOCATION-less clone under a Catalog resolver is managed and
    registered (with the catalog's own vacuum pin on the clone)."""
    from forklift_spark.lakette.catalog import Catalog

    cat = Catalog.create(str(tmp_path / "cat"))
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, [_ev("I", 1, "a"), _ev("I", 2, "b")])
    cat.register("repos", table.root)
    fe = SqlFrontend(spark, cat)
    fe.sql("CREATE TABLE snap SHALLOW CLONE repos")
    assert "snap" in cat.names()
    assert fe.sql("SELECT count(*) AS n FROM snap").collect()[0].n == 2
