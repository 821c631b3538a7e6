"""M8 — property-based suite (SURVEY.md §5.3): the LWW merge is confluent,
so for ANY event set, ANY delivery order, ANY batching, and ANY duplicate
re-delivery, the replayed table equals the pure-Python oracle.

hypothesis drives the event set + interleaving; the oracle is computed
independently of the engine (plain dict argmax)."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from forklift_spark.operators.merge import merge_into
from forklift_spark.streaming.ingest import CHANGELOG_SCHEMA, create_entity_table

REPOS = ["r0", "r1"]
PATHS = ["a", "b", "c"]

event_st = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.sampled_from(REPOS),
    st.sampled_from(PATHS),
)

#: a scenario = events (seq = position+1), a delivery permutation, batch cuts,
#: and indices of events delivered twice
scenario_st = st.lists(event_st, min_size=1, max_size=30).flatmap(
    lambda evs: st.tuples(
        st.just(evs),
        st.permutations(range(len(evs))),
        st.sets(st.integers(0, max(0, len(evs) - 1)), max_size=3),
        st.sets(st.integers(0, max(0, len(evs) - 1)), max_size=3),
    )
)


def oracle(events):
    """Pure-Python LWW: per key, payload of the max-seq event; deletes win
    like any other event and remove the key."""
    best = {}
    for op, seq, repo, path, content in events:
        k = (repo, path)
        if k not in best or seq > best[k][0]:
            best[k] = (seq, op, content)
    return {
        k: (seq, content)
        for k, (seq, op, content) in best.items()
        if op != "D"
    }


def snapshot_dict(spark, table):
    rows = table.snapshot(spark).select("repo", "path", "seq", "content").collect()
    return {(r.repo, r.path): (r.seq, r.content) for r in rows}


def run_scenario(spark, tmp_root, evs, perm, cuts, dups):
    events = [
        (op, i + 1, repo, path, f"content-{i + 1}")
        for i, (op, repo, path) in enumerate(evs)
    ]
    delivered = [events[i] for i in perm]
    for i in sorted(dups):
        delivered.append(events[i])  # duplicate re-delivery
    cut_points = sorted({c % len(delivered) for c in cuts if len(delivered)})
    batches, prev = [], 0
    for c in cut_points:
        if c > prev:
            batches.append(delivered[prev:c])
            prev = c
    batches.append(delivered[prev:])

    table = create_entity_table(str(tmp_root), n_buckets=4)
    for epoch, batch in enumerate(b for b in batches if b):
        pdf = pd.DataFrame(
            batch, columns=["op", "seq", "repo", "path", "content"]
        )
        pdf["commit"] = pdf["seq"].map("c{:04d}".format)
        pdf["lang"] = "py"
        pdf["event_ts"] = pd.Timestamp("2024-01-01")
        pdf["schema_ver"] = 1
        df = spark.createDataFrame(pdf[[f.name for f in CHANGELOG_SCHEMA.fields]], CHANGELOG_SCHEMA)
        merge_into(spark, table, df, query_id="prop", epoch=epoch)
    return {
        k: v for k, v in snapshot_dict(spark, table).items()
    }, {k: (s, c) for k, (s, c) in oracle(events).items()}


@pytest.fixture(scope="module")
def scratch(tmp_path_factory):
    return tmp_path_factory.mktemp("prop")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(scenario=scenario_st)
def test_any_interleaving_converges_to_oracle(spark, scratch, scenario):
    evs, perm, cuts, dups = scenario
    import uuid

    got, want = run_scenario(spark, scratch / uuid.uuid4().hex, evs, perm, cuts, dups)
    assert got == want


# ---------------------------------------- CDC-out diff reconstruction


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    scenario=st.tuples(
        st.lists(event_st, min_size=1, max_size=15),
        st.lists(event_st, min_size=1, max_size=15),
        st.sampled_from(["cow", "mor"]),
        st.sampled_from(["cow", "mor"]),
    )
)
def test_snapshot_diff_reconstructs_new_snapshot(spark, scratch, scenario):
    """Property: old snapshot + snapshot_diff == new snapshot, for any two
    event waves under any mode mix (COW/MOR epochs)."""
    import hashlib
    import uuid

    from forklift_spark.operators.changes import snapshot_diff

    evs1, evs2, m1, m2 = scenario
    e1 = [(op, i + 1, r, p, f"c-{i + 1}") for i, (op, r, p) in enumerate(evs1)]
    off = len(e1)
    e2 = [(op, off + i + 1, r, p, f"c-{off + i + 1}") for i, (op, r, p) in enumerate(evs2)]

    table = create_entity_table(str(scratch / uuid.uuid4().hex), n_buckets=4)
    for epoch, (batch, mode) in enumerate([(e1, m1), (e2, m2)]):
        pdf = pd.DataFrame(batch, columns=["op", "seq", "repo", "path", "content"])
        pdf["commit"] = pdf["seq"].map("c{:04d}".format)
        pdf["lang"] = "py"
        pdf["event_ts"] = pd.Timestamp("2024-01-01")
        pdf["schema_ver"] = 1
        df = spark.createDataFrame(
            pdf[[f.name for f in CHANGELOG_SCHEMA.fields]], CHANGELOG_SCHEMA
        )
        merge_into(spark, table, df, query_id="diffprop", epoch=epoch, mode=mode)
        if epoch == 0:
            v_old = table.current_metadata()["version"]
    v_new = table.current_metadata()["version"]

    def sha(content):
        return hashlib.sha256(content.encode()).hexdigest()

    reconstructed = {
        k: (seq, sha(content)) for k, (seq, content) in oracle(e1).items()
    }
    for r in snapshot_diff(spark, table, v_old, v_new).collect():
        k = (r.repo, r.path)
        if r.change == "delete":
            reconstructed.pop(k)  # KeyError would mean a bogus delete row
        else:
            assert (r.change == "insert") == (k not in reconstructed)
            reconstructed[k] = (r.seq, r.content_sha)
    want = {k: (seq, sha(content)) for k, (seq, content) in oracle(e1 + e2).items()}
    assert reconstructed == want
