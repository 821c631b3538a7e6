"""Seeded fuzz of the materialized-view SELECT compiler
(forklift_spark/sqlmview.py): random definitions from the supported
grammar — random select entries (bare / aliased / qualified / computed),
random WHERE, random GROUP BY subsets, randomized keyword case and
whitespace — each CREATEd as an mview and checked against CATALYST'S OWN
evaluation of the identical statement text over the same source snapshot.
The parser/compiler must agree with Spark SQL on every shape it accepts,
both at initial sync and after an incremental REFRESH. Any divergence
fails with the seed."""

import random

import pytest
from pyspark.sql import functions as F

from forklift_spark.operators.merge import merge_into
from forklift_spark.sqlfront import SqlFrontend
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table

#: (expression over the source, needs-alias) — the fuzz picks from these;
#: every expression is valid for Spark AND compiles through the mapping
#: spec verbatim
_EXPRS = [
    ("repo", False),
    ("path", False),
    ("lang", False),
    ("content", False),
    ("upper(lang)", True),
    ("length(content)", True),
    ("concat(lang, ':', path)", True),
    ("substring(content, 1, 3)", True),
]
_PREDS = [None, "lang <> 'de'", "length(content) > 4", "lang = 'py'"]
_AGGS = ["count(*)", "sum(length(content))", "max(length(content))",
         "count(distinct lang)"]
_GROUPS = [("lang", False), ("upper(lang)", True), ("repo", False)]


def _sprinkle(rng, sql: str) -> str:
    """Randomize keyword case and whitespace without touching literals."""
    out = []
    for tok in sql.split(" "):
        if tok.upper() in ("SELECT", "FROM", "WHERE", "GROUP", "BY", "AS"):
            tok = tok.lower() if rng.random() < 0.5 else tok.upper()
        out.append(tok)
    sep = "  " if rng.random() < 0.3 else " "
    return sep.join(out)


def _gen_map(rng) -> str:
    picks = rng.sample(_EXPRS, rng.randint(1, 4))
    entries = []
    for i, (e, needs) in enumerate(picks):
        if needs or rng.random() < 0.3:
            entries.append(f"{e} AS c{i}")
        else:
            entries.append(e)
    pred = rng.choice(_PREDS)
    sql = f"SELECT {', '.join(entries)} FROM repos"
    if pred:
        sql += f" WHERE {pred}"
    return sql


def _gen_agg(rng) -> str:
    g, needs = rng.choice(_GROUPS)
    gsel = f"{g} AS g0" if needs else g
    aggs = [f"{a} AS a{i}" for i, a in enumerate(rng.sample(_AGGS, rng.randint(1, 2)))]
    pred = rng.choice(_PREDS)
    sql = f"SELECT {gsel}, {', '.join(aggs)} FROM repos"
    if pred:
        sql += f" WHERE {pred}"
    sql += f" GROUP BY {g}"
    return sql


def _ev(op, seq, path, lang, content):
    return (op, seq, "r", path, f"c{seq}", lang, content, None, 1)


def _rows(df):
    return sorted(
        tuple(None if v is None else str(v) for v in r)
        for r in df.select(*sorted(df.columns)).collect()
    )


@pytest.mark.parametrize("seed", range(6))
def test_mview_matches_catalyst_on_random_definitions(spark, tmp_path, seed):
    rng = random.Random(seed)
    table = create_entity_table(str(tmp_path / "src"), n_buckets=4)
    langs = ["de", "fr", "py", "go"]
    rows = [
        _ev("I", i + 1, f"f{i}", langs[i % 4], f"body-{i}" * (i % 3 + 1))
        for i in range(10)
    ]
    merge_into(spark, table, spark.createDataFrame(rows, CHANGELOG_SCHEMA),
               query_id="seed", epoch=0)
    fe = SqlFrontend(spark, {"repos": table})

    for case in range(3):
        gen = _gen_agg if rng.random() < 0.4 else _gen_map
        select = _sprinkle(rng, gen(rng))
        name = f"v{seed}_{case}"
        fe.sql(
            f"CREATE MATERIALIZED VIEW {name} LOCATION "
            f"'{tmp_path / name}' AS {select}"
        )
        # the ground truth: Catalyst evaluates the SAME statement text
        direct = fe.sql(select)
        got = fe.sql(f"SELECT {', '.join(direct.columns)} FROM {name}")
        assert _rows(got) == _rows(direct), f"seed={seed} case={case}: {select}"

    # one incremental epoch (update + delete + insert), REFRESH, re-check
    more = [
        _ev("U", 101, "f0", "py", "changed-body"),
        _ev("D", 102, "f1", None, None),
        _ev("I", 103, "f99", "fr", "fresh"),
    ]
    merge_into(spark, table, spark.createDataFrame(more, CHANGELOG_SCHEMA),
               query_id="seed", epoch=1)
    shown = [r.name for r in fe.sql("SHOW MATERIALIZED VIEWS").collect()]
    for name in shown:
        fe.sql(f"REFRESH MATERIALIZED VIEW {name}")
        mdef = fe.sql(f"SHOW CREATE TABLE {name}").collect()[0].createtab_stmt
        select = mdef.split(" AS ", 1)[1]
        direct = fe.sql(select)
        got = fe.sql(f"SELECT {', '.join(direct.columns)} FROM {name}")
        assert _rows(got) == _rows(direct), f"refresh diverged: {select}"
