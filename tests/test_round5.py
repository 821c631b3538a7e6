"""Round-5 regressions: ADVICE r4 fixes (orphan-reclaim twin safety,
dead-creator fallback, py-files freshness) and VERDICT r4 guard tasks."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from forklift_spark.lakette.table import CommitConflictError
from forklift_spark.operators.merge import compact, merge_into
from forklift_spark.streaming.ingest import create_entity_table


def _seed_rows(spark, table, n=40):
    rows = [
        ("I", i, f"r{i % 4}", f"p/{i}.py", f"c{i}", "py", f"body {i}", None, 1)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows,
        "op string, seq long, repo string, path string, commit string, "
        "lang string, content string, event_ts timestamp, schema_v int",
    )
    merge_into(spark, table, df, query_id="seed", epoch=0)


# ----------------------------------------------- ADVICE r4 #1: orphan reclaim


def test_twin_compacts_never_share_a_writer_stamp(spark, tmp_path):
    """Two compacts from the same base can commit DIFFERENT content
    (bucket subsets / output specs), so a paused twin's version file must
    never be silently replaced via stamp-match reclaim: the per-invocation
    nonce makes their stamps distinct, and the loser CONFLICTS instead."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    _seed_rows(spark, table)
    meta = table.current_metadata()

    # a "paused twin" compact: exclusive-created its version file (with a
    # compact stamp + its own nonce) but has not yet swapped CURRENT
    twin = {
        **table._raw_current(),
        "version": meta["version"] + 1,
        "parent_version": meta["version"],
        "writer": {"query_id": "__compact__", "epoch": meta["version"],
                   "nonce": "twin-nonce"},
        "twin_payload": True,  # must survive — proves no clobber
    }
    opath = os.path.join(table.meta_dir, f"v{meta['version'] + 1}.json")
    with open(opath, "w") as f:
        json.dump(twin, f)

    with pytest.raises(CommitConflictError):
        compact(spark, table)
    with open(opath) as f:
        assert json.load(f).get("twin_payload") is True  # twin file intact


def test_dead_creator_orphan_reclaimed_by_foreign_writer(spark, tmp_path, monkeypatch):
    """A writer that crashed between exclusive create and CURRENT swap must
    not wedge the version number for everyone until vacuum: once the orphan
    is older than the reclaim grace (LAKETTE_RECLAIM_GRACE) and CURRENT
    provably never advanced, ANY writer may reclaim it."""
    monkeypatch.setenv("LAKETTE_RECLAIM_GRACE", "5")
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=2)
    meta = table.current_metadata()
    orphan = {
        **table._raw_current(),
        "version": meta["version"] + 1,
        "parent_version": meta["version"],
        "writer": {"query_id": "someone_else", "epoch": 3, "nonce": "dead"},
    }
    opath = os.path.join(table.meta_dir, f"v{meta['version'] + 1}.json")
    with open(opath, "w") as f:
        json.dump(orphan, f)
    old = time.time() - 30
    os.utime(opath, (old, old))  # orphan is well past the grace window

    me = {"query_id": "me", "epoch": 1}
    commit = table.commit_version(new_files=[], replaced_buckets=set(), writer=me)
    assert commit.version == meta["version"] + 1
    assert table.current_metadata()["writer"] == me  # ours, not the corpse's


def test_young_foreign_orphan_still_conflicts(spark, tmp_path):
    """Inside the grace window a foreign orphan's creator may be alive and
    merely slow — the commit must conflict, never reclaim."""
    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=2)
    meta = table.current_metadata()
    orphan = {
        **table._raw_current(),
        "version": meta["version"] + 1,
        "parent_version": meta["version"],
        "writer": {"query_id": "someone_else", "epoch": 3},
        "their_payload": True,
    }
    opath = os.path.join(table.meta_dir, f"v{meta['version'] + 1}.json")
    with open(opath, "w") as f:
        json.dump(orphan, f)  # fresh mtime: inside any sane grace

    with pytest.raises(CommitConflictError):
        table.commit_version(
            new_files=[], replaced_buckets=set(),
            writer={"query_id": "me", "epoch": 1},
        )
    with open(opath) as f:
        assert json.load(f).get("their_payload") is True


# ------------------------------------------------ VERDICT r4 #4: SQL views


def test_sql_view_over_lakette_table_with_time_travel(spark, tmp_path):
    """create_or_replace_view registers a snapshot as a temp view so plain
    spark.sql works over lakette tables, including a time-travelled pin —
    results must match the DataFrame path exactly."""
    from forklift_spark.lakette.table import LaketteTable

    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=4)
    _seed_rows(spark, table, n=40)
    v1 = table.current_metadata()["version"]
    upd = spark.createDataFrame(
        [("U", 1000, "r0", "p/0.py", "c2", "py", "patched", None, 1),
         ("D", 1001, "r1", "p/1.py", None, None, None, None, 1)],
        "op string, seq long, repo string, path string, commit string, "
        "lang string, content string, event_ts timestamp, schema_v int",
    )
    merge_into(spark, table, upd, query_id="seed", epoch=1)

    table.create_or_replace_view(spark, "repos_now")
    table.create_or_replace_view(spark, "repos_v1", version=v1)

    now = spark.sql(
        "SELECT repo, count(*) AS n FROM repos_now GROUP BY repo ORDER BY repo"
    ).collect()
    df_now = (
        table.snapshot(spark).groupBy("repo").agg(F.count("*").alias("n"))
        .orderBy("repo").collect()
    )
    assert [tuple(r) for r in now] == [tuple(r) for r in df_now]
    # the pinned view still sees the pre-update state
    assert spark.sql("SELECT count(*) AS n FROM repos_v1").collect()[0].n == 40
    assert spark.sql("SELECT count(*) AS n FROM repos_now").collect()[0].n == 39
    assert spark.sql(
        "SELECT content FROM repos_now WHERE path = 'p/0.py'"
    ).collect()[0].content == "patched"
    assert spark.sql(
        "SELECT content FROM repos_v1 WHERE path = 'p/0.py'"
    ).collect()[0].content == "body 0"
    spark.catalog.dropTempView("repos_now")
    spark.catalog.dropTempView("repos_v1")


# ------------------------- VERDICT r4 #9: legacy counter bootstrap, paid once


def test_legacy_counter_bootstrap_is_paid_exactly_once(spark, tmp_path, monkeypatch):
    """Metadata predating the summary counters pays ONE full manifest
    materialization on the first commit (documented first-commit cost);
    the SECOND commit must ride the maintained counters and open only the
    touched buckets' shards."""
    import json as _json

    from forklift_spark.lakette.table import _MANIFEST_CACHE, LaketteTable

    table = create_entity_table(str(tmp_path / "tbl"), n_buckets=16)
    rows = [
        ("I", i, f"r{i % 13}", f"p/{i}.py", f"c{i}", "py", f"body {i}", None, 1)
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows,
        "op string, seq long, repo string, path string, commit string, "
        "lang string, content string, event_ts timestamp, schema_v int",
    )
    merge_into(spark, table, df, query_id="seed", epoch=0)

    # simulate legacy metadata: strip every maintained counter
    cur = table._raw_current()
    name = f"v{cur['version']}.json"
    for k in ("total_files", "total_rows", "total_delta_files",
              "spec_files", "bucket_stats"):
        cur.pop(k, None)
    with open(os.path.join(table.meta_dir, name), "w") as f:
        _json.dump(cur, f)
    n_refs = len(cur["manifests"])
    assert n_refs >= 10

    class _Ctr:
        def __init__(self):
            self.opens = []

    ctr = _Ctr()
    real = LaketteTable._read_manifest

    def counting(tbl, rel):
        ctr.opens.append(rel)
        return real(tbl, rel)

    _MANIFEST_CACHE.clear()
    monkeypatch.setattr(LaketteTable, "_read_manifest", counting)

    one = spark.createDataFrame(
        [("U", 9999, "r0", "p/0.py", "cx", "py", "patched", None, 1)],
        "op string, seq long, repo string, path string, commit string, "
        "lang string, content string, event_ts timestamp, schema_v int",
    )
    merge_into(spark, table, one, query_id="up", epoch=0)
    first_opens = len(set(ctr.opens))
    assert first_opens >= n_refs  # the documented one-time bootstrap

    ctr.opens.clear()
    _MANIFEST_CACHE.clear()
    two = spark.createDataFrame(
        [("U", 10000, "r0", "p/0.py", "cy", "py", "patched again", None, 1)],
        "op string, seq long, repo string, path string, commit string, "
        "lang string, content string, event_ts timestamp, schema_v int",
    )
    merge_into(spark, table, two, query_id="up", epoch=1)
    assert 0 < len(set(ctr.opens)) <= 2 < n_refs  # O(touched) from commit 2 on


# ----------------------------------------- VERDICT r4 #2: persisted IVF index


def test_ivf_persisted_index_queries_without_retraining(spark, tmp_path, monkeypatch):
    """ivf_build trains ONCE and materializes ivf_list as a parquet
    partition column + centroids sidecar; ivf_query must then (a) run with
    ZERO KMeans fits (fit is monkeypatched to explode), (b) prune the scan
    to the probed lists' PARTITIONS (PartitionFilters in the plan), (c)
    keep recall vs exact brute force, and (d) match the retrain-per-call
    ivf_topk on the same params (same seed => same quantizer)."""
    import numpy as np

    from forklift_spark.operators.similarity import (
        brute_force_topk, ivf_build, ivf_query, ivf_topk,
    )
    from forklift_spark.plans.guards import formatted_plan

    rng = np.random.default_rng(3)
    dim, per = 16, 40
    rows = []
    for c in range(5):  # 5 well-separated clusters
        center = rng.standard_normal(dim) * 10
        for j in range(per):
            v = center + rng.standard_normal(dim)
            rows.append((c * 1000 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "id long, emb array<float>")
    q = rows[7][1]  # a member of cluster 0

    root = str(tmp_path / "ivf")
    meta = ivf_build(spark, df, "emb", "id", root, n_lists=8)
    assert meta["dim"] == dim and len(meta["centroids"]) == 8
    want = [tuple(r) for r in ivf_topk(df, "emb", "id", q, k=10, n_lists=8,
                                       n_probe=2).collect()]

    # (a) the query path must never fit a model
    import pyspark.ml.clustering as clus

    def _explode(*a, **kw):
        raise AssertionError("ivf_query must not train k-means")

    monkeypatch.setattr(clus.KMeans, "fit", _explode)
    out = ivf_query(spark, root, q, k=10, n_probe=2)
    got = [tuple(r) for r in out.collect()]

    # (d) identical quantizer -> identical results as the ad-hoc variant
    assert got == want
    # (c) recall vs exact
    exact = [r.id for r in brute_force_topk(df, "emb", "id", q, k=10).collect()]
    recall = len({g[0] for g in got} & set(exact)) / 10
    assert got[0][0] == 7 and recall >= 0.8, f"persisted-IVF recall {recall}"
    # (b) partition pruning reaches the scan
    plan = formatted_plan(ivf_query(spark, root, q, k=10, n_probe=2))
    assert "PartitionFilters" in plan and "ivf_list" in plan, plan[:2000]
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("ivf_list" in ln and "[]" not in ln.split("PartitionFilters")[1][:4]
               for ln in pf), pf


def test_ivf_append_routes_new_rows_via_stored_centroids(spark, tmp_path, monkeypatch):
    """CDC-world index maintenance: ivf_assign_stored must reproduce the
    JVM quantizer's list ids exactly (same centroids => same argmin), and
    ivf_append must land new embeddings under the partition scheme with
    ZERO fits so ivf_query finds them immediately."""
    import numpy as np

    from forklift_spark.operators.similarity import (
        ivf_assign, ivf_append, ivf_assign_stored, ivf_build, ivf_query,
    )

    rng = np.random.default_rng(11)
    dim = 12
    centers = [rng.standard_normal(dim) * 8 for _ in range(4)]
    rows = [
        (c * 100 + j, [float(x) for x in centers[c] + rng.standard_normal(dim)])
        for c in range(4) for j in range(25)
    ]
    df = spark.createDataFrame(rows, "id long, emb array<float>")
    root = str(tmp_path / "ivf")
    ivf_build(spark, df, "emb", "id", root, n_lists=4)

    # parity: stored-centroid argmin == the JVM KMeans.transform assignment
    assigned_ml, centroids = ivf_assign(df, "emb", "id", n_lists=4)
    want = {r.id: r.ivf_list for r in assigned_ml.collect()}
    got = {
        r.id: r.ivf_list
        for r in ivf_assign_stored(df, "emb", "id", centroids).collect()
    }
    assert got == want

    # append a new batch near cluster 2's center — zero fits allowed
    import pyspark.ml.clustering as clus

    monkeypatch.setattr(
        clus.KMeans, "fit",
        lambda *a, **kw: (_ for _ in ()).throw(AssertionError("no fits")),
    )
    new_rows = [
        (9000 + j, [float(x) for x in centers[2] + 0.01 * rng.standard_normal(dim)])
        for j in range(5)
    ]
    new_df = spark.createDataFrame(new_rows, "id long, emb array<float>")
    assert ivf_append(spark, new_df, root) == 5
    q = new_rows[0][1]
    top = ivf_query(spark, root, q, k=5, n_probe=1).collect()
    assert top[0].id == 9000 and top[0].cos == 1.0  # found itself, list pruned
    assert {r.id for r in top} >= {9000, 9001, 9002}


# -------------------------------------------- ADVICE r4 #3: py-files freshness


def test_pyfiles_zip_is_built_fresh_and_matches_source():
    """The committed stale artifact is gone; make_pyfiles_zip() must emit a
    zip whose every entry is byte-identical to the CURRENT source (executor
    workers import mapInPandas helpers by name from this zip — stale bytes
    mean driver/executor version skew)."""
    import zipfile

    from scripts.bench_scaling import make_pyfiles_zip

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = make_pyfiles_zip()
    pkg_root = os.path.join(repo, "forklift_spark")
    with zipfile.ZipFile(zip_path) as z:
        names = [n for n in z.namelist() if n.endswith(".py")]
        assert any(n.endswith("operators/merge.py") for n in names)
        for n in names:
            src = os.path.join(repo, n)
            assert os.path.exists(src), f"zip entry {n} has no source file"
            with open(src, "rb") as f:
                assert z.read(n) == f.read(), f"zip entry {n} differs from source"
    # and every source module made it into the zip (nothing silently missing)
    on_disk = set()
    for root, _dirs, files in os.walk(pkg_root):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith(".py"):
                on_disk.add(os.path.relpath(os.path.join(root, fn), repo))
    assert on_disk == {n for n in names}


# ------------------------------------- DateType columns in stats_cols


def test_date_stats_cols_write_and_prune(spark, tmp_path):
    """stats_cols may name a DateType column: the writer records its
    per-file [min, max] as ISO strings (datetime.date is not JSON
    serializable raw; ISO order == chronological order, so the
    lexicographic cstats prune stays exact) and col_ranges with
    ISO-string bounds returns exactly the filtered snapshot."""
    import datetime

    from pyspark.sql import types as T

    from forklift_spark.lakette.table import LaketteTable

    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("d", T.DateType()),
        T.StructField("content", T.StringType()),
    ])
    table = LaketteTable.create(
        str(tmp_path / "t"), schema, ["k"],
        n_buckets=2, stats_cols=["d"], target_file_rows=16,
    )
    rows = [
        ("I", i, f"k{i:03d}",
         datetime.date(2024, 1, 1) + datetime.timedelta(days=i), "x")
        for i in range(48)
    ]
    df = spark.createDataFrame(
        rows, "op string, seq long, k string, d date, content string"
    )
    merge_into(spark, table, df, query_id="a", epoch=0)

    meta = table.current_metadata()
    stats = [f["cstats"]["d"] for f in meta["files"]
             if f.get("cstats", {}).get("d")]
    assert stats, "date stats were not recorded"
    assert all(isinstance(v, str) for s in stats for v in s)

    pruned = table.snapshot(
        spark, col_ranges={"d": ("2024-01-06", "2024-01-11")}
    )
    want = sorted(
        r.k for r in table.snapshot(spark)
        .filter(F.col("d").between("2024-01-06", "2024-01-11")).collect()
    )
    assert sorted(r.k for r in pruned.collect()) == want and len(want) == 6
