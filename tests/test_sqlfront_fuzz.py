"""Seeded fuzz of the MERGE clause compiler (forklift_spark/sqlfront.py
_merge_events): random clause matrices over random table/source states,
checked against an independent plain-Python simulation of standard MERGE
semantics — clause order, AND-condition claiming with NULL fall-through,
branch visibility rules (matched sees both aliases, NOT MATCHED the
source row, BY SOURCE the stored row), UPDATE SET * whole-row replacement
(absent source payload -> typed NULL), column-level SET keeping stored
values, INSERT (cols) VALUES, and DELETE. Any divergence between the
compiled DataFrame plan and the 30-line simulation fails with the seed.
"""

import random

import pytest

from forklift_spark.operators.merge import merge_into
from forklift_spark.sqlfront import SqlFrontend
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table

LANGS = ["de", "fr", "py"]
PAYLOAD = ["commit", "lang", "content"]  # user payload columns (non-key)


def _build_state(rng):
    """{path: {col: value}} for a random table population."""
    n = rng.randint(3, 6)
    return {
        f"k{i}": {
            "repo": "r", "path": f"k{i}", "commit": f"c{i}",
            "lang": rng.choice(LANGS), "content": f"body{i}",
        }
        for i in range(n)
    }


def _build_source(rng, state):
    """Source rows: some matching keys, some new; act drives conditions
    (None exercises NULL fall-through), note feeds assignments."""
    rows = []
    for k in sorted(state):
        if rng.random() < 0.7:
            rows.append({"repo": "r", "path": k,
                         "act": rng.choice(["del", "up", None]),
                         "note": f"n-{k}", "lang": "go",
                         "content": f"src-{k}"})
    for i in range(rng.randint(1, 3)):
        rows.append({"repo": "r", "path": f"new{i}",
                     "act": rng.choice(["del", "up", None]),
                     "note": f"n-new{i}", "lang": "go",
                     "content": f"src-new{i}"})
    return rows


def _build_clauses(rng):
    """A random legal clause list: (branch, cond, action, payload-fn).
    cond is (colside, col, value) evaluated in the sim; actions mirror
    the compiler's matrix."""
    clauses = []
    if rng.random() < 0.6:
        clauses.append(("matched", ("s", "act", "del"), "delete", None))
    if rng.random() < 0.5:
        clauses.append(("matched", ("t", "lang", "de"), "update_cols",
                        lambda t, s: {"content": f"{t['content']}:{s['note']}"}))
    if rng.random() < 0.8:
        if rng.random() < 0.5:
            clauses.append(("matched", None, "update_star", None))
        else:
            clauses.append(("matched", None, "update_cols",
                            lambda t, s: {"content": s["note"]}))
    if rng.random() < 0.8:
        if rng.random() < 0.5:
            clauses.append(("insert", ("s", "act", "up"), "insert_star", None))
        else:
            clauses.append(("insert", None, "insert_cols",
                            lambda t, s: {"repo": s["repo"], "path": s["path"],
                                          "lang": "xx", "content": s["note"]}))
    if rng.random() < 0.5:
        if rng.random() < 0.5:
            clauses.append(("by_source", ("t", "lang", "fr"), "delete", None))
        else:
            clauses.append(("by_source", ("t", "lang", "fr"), "update_cols",
                            lambda t, s: {"lang": "fr-x"}))
    if not any(c[0] == "matched" for c in clauses) and not any(
        c[0] == "insert" for c in clauses
    ):
        clauses.insert(0, ("matched", None, "update_star", None))
        clauses.append(("insert", None, "insert_star", None))
    return clauses


def _clause_sql(clauses):
    parts = []
    for branch, cond, action, _ in clauses:
        head = {"matched": "WHEN MATCHED",
                "insert": "WHEN NOT MATCHED",
                "by_source": "WHEN NOT MATCHED BY SOURCE"}[branch]
        if cond:
            side, col, val = cond
            head += f" AND {side}.{col} = '{val}'"
        if action == "delete":
            act_sql = "DELETE"
        elif action == "update_star":
            act_sql = "UPDATE SET *"
        elif action == "insert_star":
            act_sql = "INSERT *"
        elif action == "update_cols":
            # mirror the payload-fns above, keyed by branch/cond shape
            if branch == "by_source":
                act_sql = "UPDATE SET lang = 'fr-x'"
            elif cond and cond[1] == "lang":
                act_sql = "UPDATE SET content = t.content || ':' || s.note"
            else:
                act_sql = "UPDATE SET content = s.note"
        else:  # insert_cols
            act_sql = ("INSERT (repo, path, lang, content) "
                       "VALUES (s.repo, s.path, 'xx', s.note)")
        parts.append(f"{head} THEN {act_sql}")
    return " ".join(parts)


def _simulate(state, source, clauses):
    """Plain-Python MERGE semantics: first claiming clause per row wins;
    a NULL/false condition falls through; unclaimed rows are no-ops."""
    out = {k: dict(v) for k, v in state.items()}
    src_by_key = {s["path"]: s for s in source}

    def _claims(cond, t, s):
        if cond is None:
            return True
        side, col, val = cond
        ref = (t if side == "t" else s) or {}
        return ref.get(col) == val  # None (NULL) never claims

    for k, s in src_by_key.items():
        branch = "matched" if k in state else "insert"
        t = state.get(k)
        for cbranch, cond, action, fn in clauses:
            if cbranch != branch or not _claims(cond, t, s):
                continue
            if action == "delete":
                out.pop(k, None)
            elif action == "update_star":
                out[k] = {"repo": "r", "path": k,
                          **{c: s.get(c) for c in PAYLOAD}}
            elif action == "update_cols":
                base = dict(out.get(k) or t)
                base.update(fn(t, s))
                out[k] = base
            elif action == "insert_star":
                out[k] = {"repo": "r", "path": k,
                          **{c: s.get(c) for c in PAYLOAD}}
            else:  # insert_cols
                row = {c: None for c in ("repo", "path", *PAYLOAD)}
                row.update(fn(None, s))
                out[k] = row
            break
    for k, t in state.items():
        if k in src_by_key:
            continue
        for cbranch, cond, action, fn in clauses:
            if cbranch != "by_source" or not _claims(cond, t, None):
                continue
            if action == "delete":
                out.pop(k, None)
            else:
                base = dict(out[k])
                base.update(fn(t, None))
                out[k] = base
            break
    return out


@pytest.mark.parametrize("seed", range(24))
def test_merge_clause_matrix_matches_simulation(spark, tmp_path, seed):
    rng = random.Random(seed)
    state = _build_state(rng)
    source = _build_source(rng, state)
    clauses = _build_clauses(rng)

    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    merge_into(
        spark, table,
        spark.createDataFrame(
            [("I", i + 1, v["repo"], v["path"], v["commit"], v["lang"],
              v["content"], None, 1) for i, v in enumerate(state.values())],
            CHANGELOG_SCHEMA,
        ),
        query_id="fuzz-seed", epoch=0,
    )
    spark.createDataFrame(
        [(s["repo"], s["path"], s["act"], s["note"], s["lang"], s["content"])
         for s in source],
        "repo string, path string, act string, note string, "
        "lang string, content string",
    ).createOrReplaceTempView("fuzz_src")

    fe = SqlFrontend(spark, {"target": table})
    sql = (
        "MERGE INTO target t USING fuzz_src s "
        "ON t.repo = s.repo AND t.path = s.path " + _clause_sql(clauses)
    )
    fe.sql(sql)
    got = {
        r.path: {"commit": r.commit, "lang": r.lang, "content": r.content}
        for r in table.snapshot(spark)
        .select("path", "commit", "lang", "content").collect()
    }
    want = {
        k: {c: v.get(c) for c in PAYLOAD} for k, v in _simulate(
            state, source, clauses
        ).items()
    }
    assert got == want, f"seed {seed} diverged\nSQL: {sql}"
