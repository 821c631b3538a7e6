"""Table-level CHECK constraints (lakette/table.py add_constraint /
drop_constraint; enforcement in operators/merge.py merge_into): Delta
ALTER TABLE ADD CONSTRAINT parity. Contracts under test:

  * ADD validates the CURRENT snapshot first — a constraint can never be
    born broken; the probe error names a violating key.
  * merge_into enforces on every full-row event BEFORE any write: a
    violating batch aborts atomically (ExpectationError, version
    unchanged), deletes are exempt (no post-image), NULL counts as a
    violation (three-valued logic).
  * metadata carries constraints across ordinary commits; DROP stops
    enforcement; rename/drop of a referenced column is refused.
  * the SQL front-end compiles ALTER TABLE ADD/DROP CONSTRAINT onto the
    same methods and DESCRIBE DETAIL lists the declared set.
"""

import pytest

from forklift_spark.lakette.table import LaketteTable
from forklift_spark.operators.expectations import ExpectationError
from forklift_spark.operators.merge import merge_into
from forklift_spark.sqlfront import SqlFrontend, SqlFrontendError
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table


def _ev(op, seq, path, lang="py", content="body"):
    return (op, seq, "r", path, f"c{seq}", lang, content, None, 1)


def _seed(spark, table, rows, *, epoch=0, qid="seed"):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    return merge_into(spark, table, df, query_id=qid, epoch=epoch)


@pytest.fixture()
def table(spark, tmp_path):
    t = create_entity_table(str(tmp_path / "t"), n_buckets=4)
    _seed(spark, t, [_ev("I", 1, "a"), _ev("I", 2, "b", lang="fr")])
    return t


def test_add_validates_existing_rows(spark, table):
    # holds on current rows: accepted, recorded in metadata
    table.add_constraint(spark, "lang_set", "lang IN ('py', 'fr', 'go')")
    assert table.current_metadata()["constraints"] == {
        "lang_set": "lang IN ('py', 'fr', 'go')"
    }
    # violated by an existing row: refused, names a violating key
    with pytest.raises(ValueError, match="existing row.*violate|violate.*existing"):
        table.add_constraint(spark, "py_only", "lang = 'py'")
    # unparseable expression: refused at ADD time, not at first merge
    with pytest.raises(ValueError, match="does not\n?\\s*evaluate|does not evaluate"):
        table.add_constraint(spark, "bad", "no_such_column > 0")
    # duplicate name: refused
    with pytest.raises(ValueError, match="already exists"):
        table.add_constraint(spark, "lang_set", "true")


def test_merge_enforces_before_any_write(spark, table):
    table.add_constraint(spark, "content_nonempty", "length(content) > 0")
    v = int(table.current_metadata()["version"])
    rows_before = table.snapshot(spark).count()
    # a batch mixing good and violating rows aborts WHOLE — atomicity
    with pytest.raises(ExpectationError, match="content_nonempty"):
        _seed(spark, table, [
            _ev("I", 3, "ok"), _ev("I", 4, "bad", content=""),
        ], epoch=1, qid="viol")
    assert int(table.current_metadata()["version"]) == v
    assert table.snapshot(spark).count() == rows_before
    # NULL content counts as a violation (three-valued logic)
    with pytest.raises(ExpectationError, match="content_nonempty"):
        _seed(spark, table, [_ev("I", 5, "n", content=None)], epoch=2, qid="nullv")
    # deletes are exempt: a tombstone has no post-image
    _seed(spark, table, [_ev("D", 6, "a", lang=None, content=None)], epoch=3, qid="del")
    assert table.snapshot(spark).count() == rows_before - 1
    # a clean batch passes
    _seed(spark, table, [_ev("I", 7, "c")], epoch=4, qid="clean")
    assert table.snapshot(spark).count() == rows_before


def test_drop_constraint_stops_enforcement(spark, table):
    table.add_constraint(spark, "content_nonempty", "length(content) > 0")
    table.drop_constraint("content_nonempty")
    assert table.current_metadata()["constraints"] == {}
    _seed(spark, table, [_ev("I", 3, "e", content="")], epoch=1, qid="after")
    assert "e" in {r.path for r in table.snapshot(spark).collect()}
    with pytest.raises(ValueError, match="no such constraint"):
        table.drop_constraint("content_nonempty")


def test_constraints_survive_commits_and_block_column_ops(spark, table):
    table.add_constraint(spark, "lang_set", "lang IN ('py', 'fr', 'go')")
    _seed(spark, table, [_ev("U", 9, "a", lang="go")], epoch=1, qid="later")
    # carried across an ordinary data commit
    assert "lang_set" in (table.current_metadata().get("constraints") or {})
    with pytest.raises(ValueError, match="referenced by CHECK"):
        table.rename_column("lang", "language")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        table.drop_column("lang")
    # unreferenced columns still rename/drop freely
    table.rename_column("commit", "commit_sha")
    assert "commit_sha" in [f.name for f in table.user_schema().fields]


def test_column_lww_tables_reject_constraints(spark, tmp_path):
    t = create_entity_table(str(tmp_path / "p"), n_buckets=2, column_lww=True)
    with pytest.raises(ValueError, match="column_lww"):
        t.add_constraint(spark, "c", "length(content) > 0")


def test_sql_surface(spark, table):
    fe = SqlFrontend(spark, {"repos": table})
    rep = fe.sql(
        "ALTER TABLE repos ADD CONSTRAINT lang_set "
        "CHECK (lang IN ('py', 'fr', 'go'))"
    ).collect()[0]
    assert rep.statement == "ALTER ADD CONSTRAINT"
    detail = fe.sql("DESCRIBE DETAIL repos").collect()[0]
    assert "lang_set CHECK (lang IN ('py', 'fr', 'go'))" in detail.constraints
    # the INSERT path enforces (ExpectationError propagates untranslated —
    # it is the engine's documented audit failure, same as the batch path)
    with pytest.raises(ExpectationError, match="lang_set"):
        fe.sql("INSERT INTO repos (repo, path, lang) VALUES ('r', 'x', 'zz')")
    # a violating ADD through SQL is a loud front-end error
    with pytest.raises(SqlFrontendError, match="ADD CONSTRAINT"):
        fe.sql("ALTER TABLE repos ADD CONSTRAINT py_only CHECK (lang = 'py')")
    fe.sql("ALTER TABLE repos DROP CONSTRAINT lang_set")
    fe.sql("INSERT INTO repos (repo, path, lang) VALUES ('r', 'x', 'zz')")
    assert "x" in {r.path for r in table.snapshot(spark).collect()}
    with pytest.raises(SqlFrontendError, match="DROP CONSTRAINT"):
        fe.sql("ALTER TABLE repos DROP CONSTRAINT nope")


def test_show_create_lists_constraints_and_round_trips(spark, table, tmp_path):
    fe = SqlFrontend(spark, {"repos": table})
    fe.sql("ALTER TABLE repos ADD CONSTRAINT c1 CHECK (length(path) > 0)")
    ddl = fe.sql("SHOW CREATE TABLE repos").collect()[0].createtab_stmt
    assert "ADD CONSTRAINT c1 CHECK (length(path) > 0)" in ddl
    # the emitted DDL still executes (constraint lines are comments)
    ddl2 = ddl.replace("CREATE TABLE repos", "CREATE TABLE repos2").replace(
        f"LOCATION '{table.root}'", f"LOCATION '{tmp_path / 'r2'}'"
    )
    fe.sql(ddl2)
    assert fe._is_table("repos2")


def test_streaming_ingest_enforces_constraints(spark, tmp_path):
    """The ingest LOOP surfaces a CHECK-constraint violation exactly like
    a fail-action expectation: the epoch aborts BEFORE commit, the table
    keeps its pre-epoch state, and after fixing the data the loop resumes
    exactly-once from the checkpoint (clean epochs before the bad one
    stay applied; nothing double-applies). The difference from run_ingest
    `expectations=` is WHERE the rule lives: a constraint is TABLE
    metadata, so every writer — streaming loop, SQL INSERT, replicate —
    enforces it without being configured to."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from forklift_spark.streaming.ingest import run_ingest

    COLS = ["op", "seq", "repo", "path", "commit", "lang", "content",
            "event_ts", "schema_ver"]

    def _write_seg(seg_dir, i, rows):
        os.makedirs(seg_dir, exist_ok=True)
        pdf = pd.DataFrame(rows, columns=COLS)
        pdf["event_ts"] = pd.Timestamp("2026-01-01")
        pdf["schema_ver"] = pd.array([1] * len(pdf), dtype="int32")
        pdf["seq"] = pdf["seq"].astype("int64")
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            os.path.join(seg_dir, f"seg-{i:05d}.parquet"),
            coerce_timestamps="us",
        )

    t = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    t.add_constraint(spark, "content_nonempty", "length(content) > 0")
    seg_dir = str(tmp_path / "log")
    _write_seg(seg_dir, 0, [_ev("I", 1, "good")])
    _write_seg(seg_dir, 1, [_ev("I", 2, "bad", content="")])
    with pytest.raises(Exception) as exc:
        run_ingest(spark, seg_dir, t, str(tmp_path / "ckpt"),
                   max_files_per_trigger=1)
    assert "content_nonempty" in str(exc.value)
    # epoch 0 committed, epoch 1 aborted atomically
    assert {r.path for r in t.snapshot(spark).collect()} == {"good"}
    # fix the offending segment in place and resume: exactly-once
    _write_seg(seg_dir, 1, [_ev("I", 2, "bad", content="fixed")])
    run_ingest(spark, seg_dir, t, str(tmp_path / "ckpt"),
               max_files_per_trigger=1)
    st = {r.path: r.content for r in t.snapshot(spark).collect()}
    assert set(st) == {"good", "bad"} and st["bad"] == "fixed"


def test_update_where_enforces_constraints(spark, table):
    """Predicate DML binds to table constraints too: an UPDATE whose
    post-image violates a CHECK aborts before any write; DELETE (a
    tombstone write) stays exempt."""
    table.add_constraint(spark, "content_nonempty", "length(content) > 0")
    fe = SqlFrontend(spark, {"repos": table})
    v = int(table.current_metadata()["version"])
    with pytest.raises(ExpectationError, match="content_nonempty"):
        fe.sql("UPDATE repos SET content = '' WHERE lang = 'py'")
    assert int(table.current_metadata()["version"]) == v  # nothing written
    # a valid UPDATE still flows
    fe.sql("UPDATE repos SET content = content || '!' WHERE lang = 'py'")
    # DELETE remains exempt (tombstones have no post-image)
    fe.sql("DELETE FROM repos WHERE lang = 'fr'")
    st = {r.path: r.content for r in table.snapshot(spark).collect()}
    assert st == {"a": "body!"}
