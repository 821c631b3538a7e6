"""purge_keys (operators/purge.py): right-to-be-forgotten erasure across
retained history — every retained version serves the redacted tombstone,
other rows stay byte-identical, stored invariants (fsck DEEP, counters,
manifest stats) hold, candidates are bucket-pruned, clones/patch tables
refuse, and the op is idempotent + confluent."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from forklift_spark.operators.merge import merge_into
from forklift_spark.operators.purge import purge_keys
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table


def _ev(op, seq, repo, path, lang="py", content="body"):
    return (op, seq, repo, path, f"c{seq}", lang, content, None, 1)


def _seed(spark, table, rows, *, epoch, mode="cow"):
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    return merge_into(spark, table, df, query_id="seed", epoch=epoch, mode=mode)


def _versions_state(spark, table, versions, *, include_deleted=False):
    out = {}
    for v in versions:
        snap = table.snapshot(spark, version=v, include_deleted=include_deleted)
        out[v] = sorted(tuple(r) for r in snap.collect())
    return out


def _build(spark, root, *, mode="cow", n_buckets=4):
    table = create_entity_table(root, n_buckets=n_buckets)
    _seed(spark, table, [
        _ev("I", 1, "r", "a", content="SECRET-A1"),
        _ev("I", 2, "r", "b", content="keep-b"),
        _ev("I", 3, "r", "c", content="keep-c"),
        _ev("I", 4, "r", "d", content="keep-d"),
    ], epoch=0, mode=mode)
    _seed(spark, table, [
        _ev("U", 5, "r", "a", lang="go", content="SECRET-A2"),
        _ev("U", 6, "r", "b", content="keep-b2"),
    ], epoch=1, mode=mode)
    _seed(spark, table, [
        _ev("D", 7, "r", "c", content=None),
    ], epoch=2, mode=mode)
    return table


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_purge_erases_every_retained_version(spark, tmp_path, mode):
    table = _build(spark, str(tmp_path / "t"), mode=mode)
    versions = [h["version"] for h in table.history()]
    table.create_ref("audit", version=min(versions))
    before = _versions_state(spark, table, versions)

    rep = purge_keys(spark, table, [("r", "a")])
    assert rep["rows_redacted"] >= 2  # both payload versions of 'a'
    assert rep["verified_clean"] is True

    # the key is gone from EVERY retained version's live view...
    for v in versions:
        snap = table.snapshot(spark, version=v)
        assert not [r for r in snap.collect() if r.path == "a"], f"v{v}"
    # ...and its tombstones carry NO payload but KEEP the seq
    tomb = [
        r for r in table.snapshot(
            spark, version=max(versions), include_deleted=True
        ).collect() if r.path == "a"
    ]
    assert tomb and tomb[0].content is None and tomb[0].lang is None
    assert tomb[0].content_sha is None and tomb[0].seq == 5

    # every OTHER row of every version is byte-identical
    after = _versions_state(spark, table, versions)
    for v in versions:
        keep = [t for t in before[v] if t[1] != "a"]
        got = [t for t in after[v] if t[1] != "a"]
        assert keep == got, f"v{v}: non-purged rows changed"

    # no retained parquet file contains the secret anywhere (raw sweep)
    for f in glob.glob(os.path.join(table.root, "data", "*.parquet")):
        cols = pq.read_table(f).to_pydict()
        for vals in cols.values():
            assert not any(
                isinstance(x, str) and "SECRET" in x for x in vals
            ), f
    # stored invariants hold: fsck DEEP green after the in-place rewrite
    from forklift_spark.lakette.fsck import check_table

    rep2 = check_table(table, spark=spark, deep=True)
    assert rep2["ok"], rep2["issues"]


def test_purge_dry_run_counts_without_writing(spark, tmp_path):
    table = _build(spark, str(tmp_path / "t"))
    files = sorted(glob.glob(os.path.join(table.root, "data", "*.parquet")))
    mtimes = {f: os.path.getmtime(f) for f in files}
    rep = purge_keys(spark, table, [("r", "a")], dry_run=True)
    assert rep["rows_matched"] >= 2 and rep["rows_redacted"] >= 2
    assert rep["files_rewritten"] == 0
    assert {f: os.path.getmtime(f) for f in files} == mtimes

    # real run, then idempotence: a second purge redacts nothing
    rep1 = purge_keys(spark, table, [("r", "a")])
    assert rep1["rows_redacted"] == rep["rows_redacted"]
    rep2 = purge_keys(spark, table, [("r", "a")])
    assert rep2["rows_redacted"] == 0 and rep2["files_rewritten"] == 0


def test_purge_confluence_replay_cannot_resurrect(spark, tmp_path):
    table = _build(spark, str(tmp_path / "t"))
    purge_keys(spark, table, [("r", "a")])
    # duplicate delivery of the ORIGINAL events (same seqs): the redacted
    # tombstone kept seq=5, so neither seq 1 nor seq 5 wins again
    _seed(spark, table, [
        _ev("I", 1, "r", "a", content="SECRET-A1"),
        _ev("U", 5, "r", "a", lang="go", content="SECRET-A2"),
    ], epoch=10)
    assert not [r for r in table.snapshot(spark).collect() if r.path == "a"]
    # a genuinely NEWER event is lawful new data and lands normally
    _seed(spark, table, [_ev("U", 99, "r", "a", content="fresh")], epoch=11)
    row = [r for r in table.snapshot(spark).collect() if r.path == "a"]
    assert row and row[0].content == "fresh" and row[0].seq == 99


def test_purge_candidates_are_bucket_pruned(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=8)
    _seed(spark, table, [
        _ev("I", i, "r", f"k{i}", content=f"v{i}") for i in range(1, 65)
    ], epoch=0)
    _seed(spark, table, [
        _ev("U", 100 + i, "r", f"k{i}", content=f"w{i}") for i in range(1, 65)
    ], epoch=1)
    total = len({
        f["path"]
        for h in table.history()
        for f in table.plan_files(metadata=table._raw_metadata_at(h["version"]))
    })
    rep = purge_keys(spark, table, [("r", "k7")])
    # one key -> one bucket per version: candidates are a fraction of the
    # table's files, never the whole list
    assert rep["candidate_files"] < total / 2, (rep["candidate_files"], total)
    assert rep["verified_clean"] is True


def test_purge_covers_staged_wap_commits(spark, tmp_path):
    table = _build(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [_ev("I", 50, "r", "a", content="SECRET-STAGED")], CHANGELOG_SCHEMA
    )
    merge_into(spark, table, df, query_id="aud", epoch=9, publish=False)
    (stage_id,) = [r["stage_id"] for r in table.list_staged()]
    purge_keys(spark, table, [("r", "a")])
    staged = table.staged_snapshot(spark, stage_id, include_deleted=True)
    rows = [r for r in staged.collect() if r.path == "a"]
    assert rows and all(r.content is None for r in rows)


def test_purge_refuses_clones_and_patch_tables(spark, tmp_path):
    src = _build(spark, str(tmp_path / "src"))
    clone, _pin = src.shallow_clone(str(tmp_path / "clone"))
    with pytest.raises(ValueError, match="shallow clone"):
        purge_keys(spark, clone, [("r", "a")])
    # purging the SOURCE cleanses the clone too (shared files)
    purge_keys(spark, src, [("r", "a")])
    assert not [r for r in clone.snapshot(spark).collect() if r.path == "a"]

    patch = create_entity_table(str(tmp_path / "p"), column_lww=True)
    with pytest.raises(ValueError, match="column_lww"):
        purge_keys(spark, patch, [("r", "a")])


def test_purge_key_normalization_and_guards(spark, tmp_path):
    table = _build(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="arity"):
        purge_keys(spark, table, [("r",)])
    with pytest.raises(ValueError, match="composite"):
        purge_keys(spark, table, ["a"])
    with pytest.raises(ValueError, match="empty"):
        purge_keys(spark, table, [])
    rep = purge_keys(spark, table, [{"path": "a", "repo": "r"}])
    assert rep["rows_redacted"] >= 2


def test_purge_sql_statement(spark, tmp_path):
    """PURGE TABLE ... KEYS through the SQL front-end: dry run counts,
    real run erases, single-key and composite literal forms parse."""
    from forklift_spark.sqlfront import SqlFrontend, SqlFrontendError

    table = _build(spark, str(tmp_path / "t"))
    fe = SqlFrontend(spark, {"repos": table})

    dry = fe.sql("PURGE TABLE repos KEYS (('r', 'a')) DRY RUN").collect()[0]
    assert dry.dry_run == "True" and int(dry.rows_redacted) >= 2
    assert not [r for r in table.snapshot(spark).collect()
                if r.path == "a" and r.content is None]  # nothing written yet

    rep = fe.sql("PURGE TABLE repos KEYS (('r', 'a'), ('r', 'd'))").collect()[0]
    assert int(rep.rows_redacted) >= 3 and rep.dry_run == "False"
    live = {r.path for r in table.snapshot(spark).collect()}
    assert "a" not in live and "d" not in live

    with pytest.raises(SqlFrontendError, match="PURGE"):
        fe.sql("PURGE TABLE repos KEYS (lang)")  # not a literal
    with pytest.raises(SqlFrontendError, match="composite"):
        fe.sql("PURGE TABLE repos KEYS ('just-one-part')")


def test_purge_applies_to_derived_tables(spark, tmp_path):
    """A derived (silver) table holds TRANSFORMED payloads of the purged
    key — erasure must be issued there too (key-preserving derives keep
    the same key). purge_keys works identically on the derived table, and
    a later incremental derive() span does not resurrect the payload
    (the purged source rows are tombstones, which flow as deletes)."""
    from forklift_spark.operators.derive import derive

    src = _build(spark, str(tmp_path / "src"))
    mapping = {"lang": "lang", "content": "upper(content)"}
    dst_root = str(tmp_path / "silver")
    derive(spark, src, dst_root, mapping)
    from forklift_spark.lakette.table import LaketteTable

    dst = LaketteTable(dst_root)
    assert [r for r in dst.snapshot(spark).collect()
            if r.path == "a" and "SECRET" in (r.content or "")]

    purge_keys(spark, src, [("r", "a")])
    rep = purge_keys(spark, dst, [("r", "a")])
    assert rep["verified_clean"] is True
    for t in (src, dst):
        import glob as _g
        for f in _g.glob(os.path.join(t.root, "data", "*.parquet")):
            cols = pq.read_table(f).to_pydict()
            assert not any(
                isinstance(x, str) and "SECRET" in x
                for vals in cols.values() for x in vals
            ), f

    # new source activity + catch-up derive: the purged key stays gone
    _seed(spark, src, [_ev("U", 50, "r", "b", content="keep-b3")], epoch=20)
    derive(spark, src, dst_root, mapping)
    rows = {r.path: r.content for r in dst.snapshot(spark).collect()}
    assert "a" not in rows and rows["b"] == "KEEP-B3"


def test_purge_mid_rescale_folds_specs(spark, tmp_path):
    """Purge on a table mid-bucket-rescale: history spans two bucket specs
    (old files live under n=4, new commits under n=16); candidate folding
    (current-spec bucket % old nb) must find the key's files under BOTH
    specs — missing the old spec would leak pre-rescale payload."""
    table = _build(spark, str(tmp_path / "t"), n_buckets=4)
    table.rescale(16)
    _seed(spark, table, [
        _ev("U", 20, "r", "a", content="SECRET-A3"),
        _ev("U", 21, "r", "b", content="keep-b3"),
    ], epoch=5)

    rep = purge_keys(spark, table, [("r", "a")])
    assert rep["rows_redacted"] >= 3  # seq 1, 5 (old spec) + 20 (new spec)
    assert rep["verified_clean"] is True
    for f in glob.glob(os.path.join(table.root, "data", "*.parquet")):
        cols = pq.read_table(f).to_pydict()
        assert not any(
            isinstance(x, str) and "SECRET" in x
            for vals in cols.values() for x in vals
        ), f
    for v in [h["version"] for h in table.history()]:
        assert not [r for r in table.snapshot(spark, version=v).collect()
                    if r.path == "a"], f"v{v}"


def test_purge_resolves_renamed_columns(spark, tmp_path):
    """Purge after a payload-column rename: files written BEFORE the
    rename carry the original physical name — redaction must resolve
    logical -> physical through each version's column mapping, not assume
    current logical names exist in old files."""
    table = _build(spark, str(tmp_path / "t"))
    table.rename_column("content", "body")
    _seed_renamed(spark, table, epoch=6)

    rep = purge_keys(spark, table, [("r", "a")])
    assert rep["verified_clean"] is True
    # old-name era payload gone (raw sweep finds no secret under any name)
    for f in glob.glob(os.path.join(table.root, "data", "*.parquet")):
        cols = pq.read_table(f).to_pydict()
        assert not any(
            isinstance(x, str) and "SECRET" in x
            for vals in cols.values() for x in vals
        ), f
    live = {r.path for r in table.snapshot(spark).collect()}
    assert "a" not in live and "b" in live


def _seed_renamed(spark, table, *, epoch):
    """One more commit under the POST-rename schema (body column)."""
    df = spark.createDataFrame(
        [("U", 30, "r", "a", "c30", "go", "SECRET-A4", None, 1)],
        "op string, seq long, repo string, path string, commit string, "
        "lang string, body string, event_ts timestamp, schema_ver int",
    )
    merge_into(spark, table, df, query_id="seed2", epoch=epoch)


def test_purge_replans_after_concurrent_commit(spark, tmp_path):
    """A writer that COMMITS new files between purge's rewrite pass and
    its post-pass version check gets a second pass: purge_keys re-plans
    (purge.py round loop) and redacts the late file too, so the default
    verify sees a clean table instead of raising."""
    table = _build(spark, str(tmp_path / "t"))
    orig = table._raw_current
    state = {"committed": False}

    def _secret_on_disk():
        for f in glob.glob(os.path.join(table.root, "data", "*.parquet")):
            for vals in pq.read_table(f).to_pydict().values():
                if any(isinstance(x, str) and "SECRET" in x for x in vals):
                    return True
        return False

    def hooked():
        # Disk going SECRET-free means round 1's rewrite just finished and
        # purge is at its version check — land a concurrent commit that
        # re-introduces payload for the purged key in a NEW data file.
        if not state["committed"] and not _secret_on_disk():
            state["committed"] = True  # set first: _seed re-enters hooked
            _seed(spark, table,
                  [_ev("U", 9, "r", "a", content="SECRET-LATE")], epoch=3)
        return orig()

    table._raw_current = hooked
    rep = purge_keys(spark, table, [("r", "a")])
    table._raw_current = orig

    assert state["committed"], "injection never fired"
    assert rep["rounds"] == 2, rep
    assert rep["verified_clean"] is True
    # the late commit's payload was redacted in the second round...
    assert not _secret_on_disk()
    # ...and its tombstone kept the late seq (LWW arbitration intact)
    tomb = [r for r in table.snapshot(spark, include_deleted=True).collect()
            if r.path == "a"]
    assert tomb and tomb[0].content is None and tomb[0].seq == 9
    # a table with no mid-purge writer takes exactly one round
    rep2 = purge_keys(spark, table, [("r", "b")])
    assert rep2["rounds"] == 1 and rep2["verified_clean"] is True


# ------------------------------------------------- randomized property sweep

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_REPOS = ["r0", "r1"]
_PATHS = ["a", "b", "c", "d"]

_ev_st = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.sampled_from(_REPOS),
    st.sampled_from(_PATHS),
)

#: a purge scenario = an event stream (seq = position+1), batch cut points
#: (each batch is one commit -> one retained version), mode per batch, and
#: the subset of keys to purge
_purge_scenario_st = st.lists(_ev_st, min_size=2, max_size=24).flatmap(
    lambda evs: st.tuples(
        st.just(evs),
        st.sets(st.integers(1, max(1, len(evs) - 1)), max_size=3),
        st.sampled_from(["cow", "mor"]),
        st.sets(
            st.tuples(st.sampled_from(_REPOS), st.sampled_from(_PATHS)),
            min_size=1, max_size=3,
        ),
    )
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(scenario=_purge_scenario_st)
def test_purge_property_random_histories(spark, tmp_path_factory, scenario):
    """Property: for ANY event stream, ANY commit batching, either merge
    mode, and ANY purge key subset — after purge_keys, (1) every retained
    version's live snapshot equals its pre-purge snapshot minus the purged
    keys, (2) no retained data file contains any purged key's payload,
    (3) the purge verify pass reports clean."""
    import uuid

    evs, cuts, mode, purge_set = scenario
    root = str(tmp_path_factory.mktemp("purgeprop") / uuid.uuid4().hex)
    table = create_entity_table(root, n_buckets=4)
    rows = [
        (op, i + 1, r, p, f"c{i + 1}", "py", f"PAYLOAD[{r}/{p}#{i + 1}]", None, 1)
        for i, (op, r, p) in enumerate(evs)
    ]
    bounds = sorted(cuts | {len(evs)})
    start = 0
    for epoch, end in enumerate(bounds):
        if end > start:
            _seed(spark, table, rows[start:end], epoch=epoch, mode=mode)
        start = end

    versions = [h["version"] for h in table.history()]
    before = _versions_state(spark, table, versions)
    rep = purge_keys(spark, table, sorted(purge_set))
    assert rep["verified_clean"] is True

    after = _versions_state(spark, table, versions)
    for v in versions:
        want = [t for t in before[v] if (t[0], t[1]) not in purge_set]
        assert after[v] == want, f"v{v}"
    needles = {f"PAYLOAD[{r}/{p}#" for r, p in purge_set}
    for f in glob.glob(os.path.join(table.root, "data", "*.parquet")):
        for vals in pq.read_table(f).to_pydict().values():
            for x in vals:
                if isinstance(x, str):
                    assert not any(n in x for n in needles), (f, x)
