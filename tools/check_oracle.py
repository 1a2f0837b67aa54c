"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given sf dir and
compares row-count, schema (sorted column names) and order-insensitive
values against the DuckDB ``oracle_sql()``. Exits nonzero on mismatch.

Usage: python tools/check_oracle.py [sf_dir] [name_filter] [--canon-strict]

``--canon-strict`` additionally runs each Spark result through a
replica of the driver's pandas canonicalizer (a bare ``sort_values``
over every column, no list→tuple coercion). The driver's version
crashes with ``TypeError: unhashable type: 'list'`` on any
array-typed output column — round 2's one red row — so this mode
catches that class of failure before the round ends.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(np.asarray(v).tolist()))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def driver_canon(df: pd.DataFrame) -> pd.DataFrame:
    """Replica of the harness canonicalizer: sort every column as-is.

    Raises on array-typed cells exactly like the driver does."""
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    strict = "--canon-strict" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    filt = args[1] if len(args) > 1 else ""

    import __spark_entry__ as E
    from cuvs_spark import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = E.queries(), E.oracle_sql()
    failures, no_oracle = [], []
    pats = [p for p in filt.split(",") if p] if filt else []
    for name, fn in qs.items():
        if pats and not any(p in name for p in pats):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL  {name}: spark error {ex}")
            continue
        if strict:
            try:
                driver_canon(sdf)
            except Exception as ex:
                failures.append((name, f"CANON ERROR: {ex}"))
                print(f"FAIL  {name}: driver canonicalizer would crash: {ex}")
                continue
        if name not in os_:
            no_oracle.append(name)
            print(f"skip  {name}: no oracle ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(os_[name]).df()
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"FAIL  {name}: duckdb error {ex}")
            continue
        s, d = norm(sdf), norm(ddf)
        status = []
        if len(s) != len(d):
            status.append(f"rowcount {len(s)} vs {len(d)}")
        if list(s.columns) != list(d.columns):
            status.append(f"schema {list(s.columns)} vs {list(d.columns)}")
        if not status:
            for c in s.columns:
                sv, dv = s[c].to_numpy(), d[c].to_numpy()
                if sv.dtype.kind == "f" or dv.dtype.kind == "f":
                    if not np.array_equal(sv.astype(float), dv.astype(float)):
                        mx = np.nanmax(np.abs(sv.astype(float) - dv.astype(float)))
                        status.append(f"col {c} float mismatch (max abs diff {mx:.3e})")
                elif not (sv == dv).all():
                    status.append(f"col {c} mismatch")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            print(f"ok    {name} ({len(s)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures, {len(no_oracle)} rows-only")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
