"""CREATE/REFRESH/DROP INDEX (sqlfront.py) and the transparent
point-lookup rewrite (sqlindex.py): every accelerated statement must
return exactly what the unaccelerated plan returns, every safety gate
(staleness, OR, multi-relation qualification, partial index, time
travel) must fall back rather than mis-prune, and maintenance must move
postings when updates change the indexed term."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.operators.merge import merge_into
from forklift_spark.sqlfront import SqlFrontend, SqlFrontendError
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table
from forklift_spark import sqlindex


def _ev(op, seq, path, lang="py", content="body"):
    return (op, seq, "r", path, f"c{seq:02d}", lang, content, None, 1)


def _seed(spark, table, rows, *, epoch=0):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    return merge_into(spark, table, df, query_id="seed", epoch=epoch)


@pytest.fixture()
def fe(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=8)
    _seed(spark, table, [
        _ev("I", i, f"p{i:02d}", lang=("py" if i % 2 else "go"))
        for i in range(1, 25)
    ])
    return SqlFrontend(spark, {"repos": table}), table


def test_create_index_and_eq_lookup(spark, fe):
    front, table = fe
    r = front.sql("CREATE INDEX by_commit ON repos (commit)").collect()[0]
    assert r.asDict()["created"] == "True"
    got = front.sql("SELECT path FROM repos WHERE commit = 'c07'").collect()
    assert [x.path for x in got] == ["p07"]
    assert len(front.last_index_accel) == 1
    info = front.last_index_accel[0]
    assert info["index"] == "by_commit" and info["keys"] == 1
    # one key names one hash bucket: the source scan is bucket-pruned
    assert info["buckets"] == 1 and info["n_buckets"] == 8
    # a duplicate CREATE is loud; IF NOT EXISTS is idempotent
    with pytest.raises(SqlFrontendError, match="already exists"):
        front.sql("CREATE INDEX by_commit ON repos (commit)")
    again = front.sql(
        "CREATE INDEX IF NOT EXISTS by_commit ON repos (commit)"
    ).collect()[0]
    assert again.asDict()["created"] == "False"


def test_in_and_between_accelerate(spark, fe):
    front, table = fe
    front.sql("CREATE INDEX by_commit ON repos (commit)")
    expect_in = {r.path for r in table.snapshot(spark)
                 .filter(F.col("commit").isin("c03", "c11")).collect()}
    got = front.sql(
        "SELECT path FROM repos WHERE commit IN ('c03', 'c11')"
    ).collect()
    assert {r.path for r in got} == expect_in
    assert front.last_index_accel[0]["kind"] == "eq"
    assert front.last_index_accel[0]["keys"] == 2

    expect_rng = {r.path for r in table.snapshot(spark)
                  .filter(F.col("commit").between("c05", "c09")).collect()}
    got = front.sql(
        "SELECT path FROM repos WHERE commit BETWEEN 'c05' AND 'c09' "
        "AND lang = 'py' ORDER BY path"
    ).collect()
    assert {r.path for r in got} < expect_rng  # lang conjunct still applies
    assert front.last_index_accel[0]["kind"] == "range"
    assert front.last_index_accel[0]["keys"] == 5


def test_empty_lookup_is_empty_and_accelerated(spark, fe):
    front, _ = fe
    front.sql("CREATE INDEX by_commit ON repos (commit)")
    got = front.sql("SELECT * FROM repos WHERE commit = 'nope'").collect()
    assert got == []
    assert front.last_index_accel[0]["keys"] == 0


def test_stale_index_falls_back_and_refresh_moves_postings(spark, fe):
    front, table = fe
    front.sql("CREATE INDEX by_commit ON repos (commit)")
    # the update MOVES p03's term c03 -> c99 (and the index is now stale)
    _seed(spark, table, [_ev("U", 99, "p03", lang="rs")], epoch=1)
    got = front.sql("SELECT path FROM repos WHERE commit = 'c99'").collect()
    assert [r.path for r in got] == ["p03"]  # correct WITHOUT the index
    assert front.last_index_accel == []      # stale: gate refused it
    show = {r.name: r for r in front.sql("SHOW INDEXES ON repos").collect()}
    assert show["by_commit"].fresh is False

    rep = front.sql("REFRESH INDEX by_commit ON repos").collect()[0].asDict()
    assert rep["resync"] == "False"
    show = {r.name: r for r in front.sql("SHOW INDEXES ON repos").collect()}
    assert show["by_commit"].fresh is True
    # new term found, old term's posting retracted — both index-served
    assert [r.path for r in
            front.sql("SELECT path FROM repos WHERE commit = 'c99'").collect()
            ] == ["p03"]
    assert front.last_index_accel[0]["keys"] == 1
    assert front.sql("SELECT path FROM repos WHERE commit = 'c03'").collect() == []
    assert front.last_index_accel[0]["keys"] == 0


def test_or_and_not_shapes_never_prune(spark, fe):
    front, table = fe
    front.sql("CREATE INDEX by_commit ON repos (commit)")
    n_all = table.snapshot(spark).count()
    got = front.sql(
        "SELECT path FROM repos WHERE commit = 'c07' OR lang = 'py'"
    ).collect()
    assert front.last_index_accel == []
    assert len(got) == 1 + sum(1 for i in range(1, 25) if i % 2 and i != 7)
    got = front.sql(
        "SELECT count(*) AS n FROM repos WHERE NOT commit = 'c07'"
    ).collect()[0].n
    assert front.last_index_accel == []
    assert got == n_all - 1
    # a term predicate inside a subquery must not prune the OUTER scan
    got = front.sql(
        "SELECT count(*) AS n FROM repos WHERE lang IN "
        "(SELECT lang FROM repos WHERE commit = 'c08')"
    ).collect()[0].n
    assert got == sum(1 for i in range(1, 25) if i % 2 == 0)


def test_multi_relation_requires_qualification(spark, fe):
    front, table = fe
    front.sql("CREATE INDEX by_commit ON repos (commit)")
    # qualified: accelerates the aliased reference
    got = front.sql(
        "SELECT a.path FROM repos a JOIN repos b ON a.path = b.path "
        "WHERE a.commit = 'c05'"
    ).collect()
    assert [r.path for r in got] == ["p05"]
    assert len(front.last_index_accel) == 1
    # unqualified in a join: ambiguous ownership — never accelerated
    got = front.sql(
        "SELECT a.path FROM repos a JOIN repos b ON a.path = b.path "
        "AND b.commit = 'c05' WHERE a.lang <> 'zz'"
    ).collect()
    assert front.last_index_accel == []
    assert [r.path for r in got] == ["p05"]


def test_time_travel_and_partial_index_fall_back(spark, fe):
    front, table = fe
    v0 = int(table.current_metadata()["version"])
    front.sql("CREATE INDEX by_commit ON repos (commit)")
    got = front.sql(
        f"SELECT path FROM repos VERSION AS OF {v0} WHERE commit = 'c04'"
    ).collect()
    assert [r.path for r in got] == ["p04"]
    assert front.last_index_accel == []  # pinned read: no acceleration
    # a partial index only holds pred-passing rows: lookup-API-only
    front.sql("CREATE INDEX py_only ON repos (commit) WHERE lang = 'py'")
    got = front.sql("SELECT path FROM repos WHERE commit = 'c04'").collect()
    assert [r.path for r in got] == ["p04"]  # c04 is lang=go: correct!
    assert all(a["index"] != "py_only" for a in front.last_index_accel)


def test_show_drop_and_hook(spark, fe):
    front, table = fe
    front.sql("CREATE INDEX by_commit ON repos (commit)")
    rows = front.sql("SHOW INDEXES ON repos").collect()
    assert [r.name for r in rows] == ["by_commit"]
    assert rows[0].term == "commit" and rows[0].fresh is True
    # the ingest-loop hook keeps it fresh without SQL
    _seed(spark, table, [_ev("U", 77, "p01")], epoch=1)
    hook = sqlindex.refresh_hook(table, "by_commit")
    rep = hook(spark)
    assert rep.src_version == int(table.current_metadata()["version"])
    assert [r.path for r in
            front.sql("SELECT path FROM repos WHERE commit = 'c77'").collect()
            ] == ["p01"]
    assert front.last_index_accel[0]["keys"] == 1

    assert front.sql("DROP INDEX by_commit ON repos").collect()[0] \
        .asDict()["dropped"] == "True"
    front.sql("SELECT path FROM repos WHERE commit = 'c77'")
    assert front.last_index_accel == []  # dropped: plain scan again
    missing = front.sql("DROP INDEX IF EXISTS by_commit ON repos").collect()[0]
    assert missing.asDict()["dropped"] == "False"
    with pytest.raises(SqlFrontendError, match="no index"):
        front.sql("DROP INDEX by_commit ON repos")


def test_numeric_literal_on_string_term_skips_string_prune(spark, tmp_path):
    """`commit = 107` on a STRING commit column compares NUMERICALLY in
    Spark ('0107' = 107 is true), so the lexicographic (kmin, kmax) file
    prune — sound only for string-vs-string comparisons — must be skipped
    for non-string literals: with commits '0101'..'0125' every index file
    has kmax < '107' lexicographically, and a string-range prune would
    silently drop the matching row (sqlindex.accelerate all_str gate)."""
    table = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    _seed(spark, table, [
        ("I", i, "r", f"p{i:02d}", f"{100 + i:04d}", "py", "body", None, 1)
        for i in range(1, 26)
    ])
    front = SqlFrontend(spark, {"repos": table})
    front.sql("CREATE INDEX by_commit ON repos (commit)")

    got = front.sql("SELECT path, commit FROM repos WHERE commit = 107").collect()
    assert [(r.path, r.commit) for r in got] == [("p07", "0107")]
    assert front.last_index_accel and front.last_index_accel[0]["keys"] == 1

    # BETWEEN with numeric bounds takes the same gate
    got = front.sql(
        "SELECT path FROM repos WHERE commit BETWEEN 103 AND 105 ORDER BY path"
    ).collect()
    assert [r.path for r in got] == ["p03", "p04", "p05"]
    assert front.last_index_accel[0]["kind"] == "range"

    # string literals keep the file-pruned fast path and agree
    got = front.sql("SELECT path FROM repos WHERE commit = '0107'").collect()
    assert [r.path for r in got] == ["p07"]
