"""compact(cluster_by=): the Iceberg sort-order analogue. Key-sorted base
files span the whole domain of every NON-key column, so their per-file
cstats prune nothing on non-key scans; clustering the compaction sort by a
declared column makes those ranges tight and snapshot(col_ranges=) pruning
effective — with results byte-identical either way (pruning is planning,
the row filter is what makes the scan exact)."""

import pytest
from pyspark.sql import functions as F

from forklift_spark.operators.merge import compact, merge_into
from forklift_spark.streaming.ingest import create_entity_table

_DDL = (
    "op string, seq long, repo string, path string, commit string, "
    "lang string, content string, event_ts timestamp, schema_v int"
)

LANGS = ["c", "go", "java", "js", "md", "py", "rs", "ts"]


def _seed(spark, table, n=160):
    # langs uniformly interleaved across keys: every key-sorted file sees
    # (almost) the full lang domain — worst case for cstats pruning
    rows = [
        ("I", i, "r", f"p{i:04d}", f"sha{i}", LANGS[i % len(LANGS)], f"b{i}", None, 1)
        for i in range(1, n + 1)
    ]
    merge_into(spark, table, spark.createDataFrame(rows, _DDL),
               query_id="seed", epoch=0)


def _range_survivors(table, col, lo, hi):
    """Files a col_ranges scan would read — the same conservative cstats
    overlap test snapshot() plans with (missing stats => kept)."""
    kept = []
    for f in table.current_metadata()["files"]:
        rng = (f.get("cstats") or {}).get(col)
        if rng is not None and rng[0] is not None and (rng[1] < lo or rng[0] > hi):
            continue
        kept.append(f)
    return kept


def _state(spark, table):
    df = table.snapshot(spark)
    return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())


def test_clustering_tightens_cstats_and_stays_exact(spark, tmp_path):
    table = create_entity_table(
        str(tmp_path / "t"), n_buckets=4, target_file_rows=10
    )
    _seed(spark, table)
    before_state = _state(spark, table)
    compact(spark, table)  # key-sorted baseline layout, multiple files/bucket
    n_files = len(table.current_metadata()["files"])
    assert n_files > 8
    # key sort leaves lang cstats wide-open: a lang point scan reads
    # (nearly) everything, whether or not lang is in stats_cols
    baseline = _range_survivors(table, "lang", "py", "py")
    assert len(baseline) > n_files // 2

    compact(spark, table, cluster_by=["lang"])
    meta = table.current_metadata()
    assert all((f.get("cstats") or {}).get("lang") for f in meta["files"])
    clustered = _range_survivors(table, "lang", "py", "py")
    # the planning decision: strictly fewer files for the same predicate
    assert 0 < len(clustered) < len(baseline)
    # and well-targeted: survivors' ranges actually cover 'py'
    assert all(
        f["cstats"]["lang"][0] <= "py" <= f["cstats"]["lang"][1]
        for f in clustered
    )

    # exactness: clustered layout returns the identical table state, and
    # the pruned scan equals the plain filter
    assert _state(spark, table) == before_state
    got = table.snapshot(spark, col_ranges={"lang": ("py", "py")})
    want = table.snapshot(spark).filter(F.col("lang") == "py")
    assert sorted(r.path for r in got.collect()) == sorted(
        r.path for r in want.collect()
    )


def test_declared_cluster_by_is_the_compaction_default(spark, tmp_path):
    table = create_entity_table(
        str(tmp_path / "t"), n_buckets=2, target_file_rows=10,
        cluster_by=["lang"],
    )
    _seed(spark, table, n=80)
    compact(spark, table)  # no argument: the declared order applies
    meta = table.current_metadata()
    assert meta["cluster_by"] == ["lang"]
    survivors = _range_survivors(table, "lang", "md", "md")
    assert 0 < len(survivors) < len(meta["files"])
    # explicit override back to plain key sort: lang stats not recorded
    # (lang is not in stats_cols) -> every file conservatively kept
    compact(spark, table, cluster_by=[])
    assert len(_range_survivors(table, "lang", "md", "md")) == len(
        table.current_metadata()["files"]
    )


def test_cluster_by_guards(spark, tmp_path):
    table = create_entity_table(str(tmp_path / "t"), n_buckets=2)
    _seed(spark, table, n=8)
    with pytest.raises(ValueError, match="not in schema"):
        compact(spark, table, cluster_by=["nope"])
    with pytest.raises(ValueError, match="NON-key"):
        compact(spark, table, cluster_by=["repo"])

def _grid_seed(spark, table, n=320):
    # two INDEPENDENT dimensions: lang cycles fast, commit-group slow —
    # every (lang, grp) cell is populated, the z-order worst/best case
    rows = [
        ("I", i, "r", f"p{i:04d}", f"g{(i // 8) % 10}",
         LANGS[i % len(LANGS)], f"b{i}", None, 1)
        for i in range(1, n + 1)
    ]
    merge_into(spark, table, spark.createDataFrame(rows, _DDL),
               query_id="seed", epoch=0)


def test_zorder_prunes_every_cluster_dimension(spark, tmp_path):
    linear = create_entity_table(
        str(tmp_path / "lin"), n_buckets=2, target_file_rows=10,
        cluster_by=["lang", "commit"],
    )
    zorder = create_entity_table(
        str(tmp_path / "zo"), n_buckets=2, target_file_rows=10,
        cluster_by=["lang", "commit"], cluster_mode="zorder",
    )
    for t in (linear, zorder):
        _grid_seed(spark, t)
        compact(spark, t)
    n_lin = len(linear.current_metadata()["files"])
    n_zo = len(zorder.current_metadata()["files"])
    assert n_lin > 8 and n_zo > 8

    # linear: first column tight, second column wide-open in (almost)
    # every file. zorder: BOTH dimensions prune strictly — and the second
    # dimension prunes strictly BETTER than linear's, which is the point.
    zo_lang = _range_survivors(zorder, "lang", "py", "py")
    zo_grp = _range_survivors(zorder, "commit", "g3", "g3")
    lin_grp = _range_survivors(linear, "commit", "g3", "g3")
    assert 0 < len(zo_lang) < n_zo
    assert 0 < len(zo_grp) < n_zo
    assert len(zo_grp) / n_zo < len(lin_grp) / n_lin

    # exactness: both layouts answer a two-dimension scan identically
    for t in (linear, zorder):
        got = t.snapshot(
            spark, col_ranges={"lang": ("py", "py"), "commit": ("g3", "g3")}
        )
        want = t.snapshot(spark).filter("lang = 'py' AND commit = 'g3'")
        assert sorted(r.path for r in got.collect()) == sorted(
            r.path for r in want.collect()
        )
    assert _state(spark, linear) == _state(spark, zorder)


def test_zorder_rank_windows_add_no_exchange(spark):
    """The Morton key's rank windows must ride the writer's bucket
    repartition — ClusteredDistribution satisfied, LOCAL sorts only. One
    Exchange in the whole writer input plan, or the layout would double
    the compaction shuffle at 100 TB."""
    from forklift_spark.operators.merge import _zorder_expr

    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).cast("string").alias("a"),
        (F.col("id") % 11).alias("b"),
        (F.col("id") % 4).cast("int").alias("_bucket"),
    )
    part = (
        df.repartition(4, "_bucket")
        .withColumn("_z", _zorder_expr(["a", "b"]))
        .sortWithinPartitions("_bucket", "_z", "id")
    )
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    # and the key is a real interleave: both dims' bits present
    zs = [r["_z"] for r in part.select("_z").distinct().collect()]
    assert len(zs) > 7 * 2  # more distinct z values than either dim alone


def test_zorder_guards(spark, tmp_path):
    table = create_entity_table(
        str(tmp_path / "t"), n_buckets=2, cluster_by=["lang"]
    )
    _seed(spark, table, n=8)
    with pytest.raises(ValueError, match=">= 2 cluster columns"):
        compact(spark, table, cluster_mode="zorder")
    with pytest.raises(ValueError, match="linear.*zorder|zorder.*linear"):
        compact(spark, table, cluster_mode="hilbert")


def test_clustered_range_filter_reaches_the_parquet_scan(spark, tmp_path):
    """The col_ranges row filter must land in the parquet scan as a pushed
    filter: surviving files are SORTED by the cluster column, so their
    row-group stats are tight too — file pruning (planner) and row-group
    pruning (reader) compose from the one layout."""
    table = create_entity_table(
        str(tmp_path / "t"), n_buckets=2, target_file_rows=10,
        cluster_by=["lang"],
    )
    _seed(spark, table, n=80)
    compact(spark, table)
    plan = (
        table.snapshot(spark, col_ranges={"lang": ("md", "md")})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "lang" in plan.split("PushedFilters", 1)[1][:200], plan[:2000]


def test_linear_layout_rides_every_cow_rewrite(spark, tmp_path):
    """A declared LINEAR cluster order must survive ordinary COW merge
    epochs and predicate DML rewrites WITHOUT a compact — the rewrite
    already pays one partition-local sort, so clustering it is free
    (merge._base_layout). Z-order stays compact-only by design."""
    from forklift_spark.operators.dml import update_where

    table = create_entity_table(
        str(tmp_path / "t"), n_buckets=2, target_file_rows=10,
        cluster_by=["lang"],
    )
    _seed(spark, table, n=80)  # plain COW merge, NO compact
    meta = table.current_metadata()
    assert all((f.get("cstats") or {}).get("lang") for f in meta["files"])
    assert 0 < len(_range_survivors(table, "lang", "md", "md")) < len(meta["files"])

    # a DML rewrite keeps the layout (and its cstats) on touched buckets
    update_where(spark, table, {"content": "content || '!'"}, "lang = 'md'")
    meta = table.current_metadata()
    assert all((f.get("cstats") or {}).get("lang") for f in meta["files"])
    assert 0 < len(_range_survivors(table, "lang", "md", "md")) < len(meta["files"])

    # zorder tables: epochs write key-sorted (no rank-window tax) — no
    # cluster cstats until the next compact restores the curve
    zo = create_entity_table(
        str(tmp_path / "zo"), n_buckets=2, target_file_rows=10,
        cluster_by=["lang", "commit"], cluster_mode="zorder",
    )
    _grid_seed(spark, zo, n=80)
    assert not any(
        (f.get("cstats") or {}).get("lang")
        for f in zo.current_metadata()["files"]
    )
    compact(spark, zo)
    assert all(
        (f.get("cstats") or {}).get("lang")
        for f in zo.current_metadata()["files"]
    )


def test_cluster_declaration_guards(tmp_path):
    with pytest.raises(ValueError, match="not in schema"):
        create_entity_table(str(tmp_path / "a"), cluster_by=["nope"])
    with pytest.raises(ValueError, match="NON-key"):
        create_entity_table(str(tmp_path / "b"), cluster_by=["repo"])
    with pytest.raises(ValueError, match=">= 2 cluster columns"):
        create_entity_table(
            str(tmp_path / "c"), cluster_by=["lang"], cluster_mode="zorder"
        )
    with pytest.raises(ValueError, match="linear.*zorder|zorder.*linear"):
        create_entity_table(
            str(tmp_path / "d"), cluster_by=["lang"], cluster_mode="hilbert"
        )
