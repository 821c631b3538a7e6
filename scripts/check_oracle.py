"""Local mirror of the driver's correctness gate: run every harness query
on Spark AND its oracle SQL on DuckDB over the same parquet, compare
row-count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    a, b = normalize(sdf), normalize(odf)
    if len(a) == len(b):
        for c in a.columns:
            x, y = a[c], b[c]
            if pd.api.types.is_float_dtype(x) and pd.api.types.is_float_dtype(y):
                neq = ~(np.isclose(x.fillna(1e300), y.fillna(1e300), rtol=0, atol=1e-9))
            else:
                neq = ~((x.isna() & y.isna()) | (x.astype(str) == y.astype(str)))
            neq = np.asarray(neq)
            if neq.any():
                i = int(np.argmax(neq))
                problems.append(
                    f"values differ in col {c!r}: e.g. row {i}: spark={x.iloc[i]!r} oracle={y.iloc[i]!r} ({int(neq.sum())} cells)"
                )
    return problems


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: check_oracle.py [sf_dir] [query ...] --json OUT.json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    from forklift_spark.session import get_spark
    from harness.queries import EXTRA_ORACLES, EXTRA_QUERIES, ORACLES, QUERIES
    import harness  # noqa: F401  (registers the query modules)

    all_queries = {**QUERIES, **EXTRA_QUERIES}
    all_oracles = {**ORACLES, **EXTRA_ORACLES}

    spark = get_spark(app_name="oracle-check", cores=4, shuffle_partitions=8,
                      driver_memory="4g")
    con = duckdb.connect()
    for tbl in TABLES:
        p = os.path.join(sf, f"{tbl}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM parquet_scan('{p}')")

    n_ok = n_bad = n_rows_only = 0
    records = {}
    for name, fn in all_queries.items():
        if only and name not in only:
            continue
        extra = name in EXTRA_QUERIES
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            records[name] = {"status": "fail", "extra": extra,
                             "err": f"spark {type(e).__name__}"}
            n_bad += 1
            continue
        if name not in all_oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only check)")
            records[name] = {"status": "rows_only", "extra": extra, "rows": len(sdf)}
            n_rows_only += 1
            continue
        try:
            odf = con.execute(all_oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            records[name] = {"status": "fail", "extra": extra,
                             "err": f"duckdb {type(e).__name__}"}
            n_bad += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            records[name] = {"status": "fail", "extra": extra,
                             "err": "; ".join(problems)}
            n_bad += 1
        else:
            print(f"ok    {name}: {len(sdf)} rows")
            records[name] = {"status": "ok", "extra": extra, "rows": len(sdf)}
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {n_rows_only} rows-only")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf, "ok": n_ok, "failed": n_bad,
                 "rows_only": n_rows_only, "queries": records},
                f, indent=1,
            )
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
