#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate (NOT shipped
code): reads Verify.scala's output dir, runs each oracle_sql.json query in
DuckDB against the same sf parquet tables, and compares values with columns
sorted by name.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import numbers
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _cell_key(v):
    # arrays/lists are unhashable and render differently (ndarray vs list);
    # canonicalize through list() so both engines produce the same sort key
    if hasattr(v, "__len__") and not isinstance(v, (str, bytes)):
        return str(list(v))
    # dtype-normalize numerics: one engine returning int64 10 and the other
    # float64 10.0 must produce the SAME key, or the two frames sort into
    # different row orders and the positional compare reports spurious
    # FAILs. Integral floats key as ints (only below 2^53, where the float
    # is exact); bool stays distinct (it is an Integral subtype).
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, numbers.Integral):
        return str(int(v))
    if isinstance(v, numbers.Real):
        f = float(v)
        if math.isnan(f):
            return "nan"
        if f.is_integer() and abs(f) < 2.0**53:
            return str(int(f))
        return repr(f)
    return str(v)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name AND rows by all columns: the positional compare
    below must not depend on either engine's output order (the Spark result
    is read back via a parquet glob with no ORDER BY guarantee)."""
    df = df[sorted(df.columns)]
    if len(df) and len(df.columns):
        key = df.apply(lambda s: s.map(_cell_key))
        df = df.loc[key.sort_values(by=list(df.columns), kind="mergesort").index]
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import glob
    have = {p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json")}
    for name in sorted(have):
        got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'", connection=con).df()
        # the DRIVER's gate row-sorts with raw pandas sort_values, which
        # crashes on array cells — an array-typed Spark output is a red row
        # there even when values match, so mirror that as a hard FAIL here
        # scan ALL rows (the frame is already in memory): leading NULLs
        # must not hide an array column from the guard. Runs BEFORE the
        # rows-only branch: the driver sorts rows-only outputs too.
        arrayish = [c for c in got.columns if any(
            hasattr(v, "__len__") and not isinstance(v, (str, bytes))
            for v in got[c])]
        if arrayish:
            print(f"[FAIL-arr ] {name}: array-typed output cols {arrayish} — "
                  "driver's pandas row-sort crashes on these; serialize to string")
            failures += 1
            continue
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL-sql ] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"[FAIL-cols] {name}: spark={list(g.columns)} duck={list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"[FAIL-rows] {name}: spark={len(g)} duck={len(e)}")
            failures += 1
            continue
        # dtype-drift report: the sort-key normalization above makes
        # int64 10 and float64 10.0 compare equal, so a lost ::BIGINT
        # cast can no longer FAIL the value check — surface int-vs-float
        # column pairs loudly so type-contract drift stays visible
        for c in g.columns:
            gk, ek = g[c].dtype.kind, e[c].dtype.kind
            if gk != ek and {gk, ek} <= {"i", "u", "f"}:
                kind = "int/float drift" if "f" in {gk, ek} else "signedness drift"
                print(f"[WARN-type] {name}: col={c} "
                      f"spark={g[c].dtype} duck={e[c].dtype} ({kind})")
        # value compare, cell by cell with list support
        bad = None
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if hasattr(a, "__len__") and not isinstance(a, str):
                    try:
                        ok = list(a) == list(b)
                    except Exception:
                        ok = False
                else:
                    ok = (a == b) or (pd.isna(a) is True and pd.isna(b) is True)
                if not ok:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"[FAIL-val ] {name}: col={c} row={i} spark={a!r} duck={b!r}")
            failures += 1
        else:
            print(f"[OK       ] {name}: {len(g)} rows")
    missing = set(oracle) - have
    for m in sorted(missing):
        print(f"[FAIL-miss] {m}: oracle declared but no spark result")
        failures += 1
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
