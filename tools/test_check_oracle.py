#!/usr/bin/env python3
"""Self-test for check_oracle.py's reporting paths (dev tool, like the
checker itself): the dtype-drift WARN must actually print in a sweep, and
an array-typed Spark result must hard-fail the way the driver's gate does.

Usage: python3 tools/test_check_oracle.py
"""
import contextlib
import io
import json
import os
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_oracle


def run(sf, out):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        failures = check_oracle.main(sf, out)
    return failures, buf.getvalue()


def main():
    sf = tempfile.mkdtemp(prefix="sf_")
    out = tempfile.mkdtemp(prefix="out_")
    con = duckdb.connect()
    for t in check_oracle.TABLES:
        con.sql(f"COPY (SELECT 1 AS x) TO '{sf}/{t}.parquet' (FORMAT PARQUET)")

    # 1. int64 result vs DOUBLE oracle: values compare equal (10 == 10.0)
    #    but the type-contract drift must be surfaced loudly
    os.makedirs(f"{out}/q_drift")
    con.sql(f"COPY (SELECT 10::BIGINT AS v) TO '{out}/q_drift/p0.parquet' (FORMAT PARQUET)")
    with open(f"{out}/oracle_sql.json", "w") as f:
        json.dump({"q_drift": "SELECT 10.0::DOUBLE AS v"}, f)
    failures, text = run(sf, out)
    assert failures == 0, text
    assert "[OK       ] q_drift" in text, text
    assert "[WARN-type] q_drift" in text and "int/float drift" in text, text

    # 2. array-typed Spark result: the DRIVER's pandas row-sort crashes on
    #    these, so the local checker must hard-fail, not canonicalize
    os.makedirs(f"{out}/q_arr")
    con.sql(f"COPY (SELECT [1,2,3] AS arr) TO '{out}/q_arr/p0.parquet' (FORMAT PARQUET)")
    with open(f"{out}/oracle_sql.json", "w") as f:
        json.dump({"q_drift": "SELECT 10.0::DOUBLE AS v",
                   "q_arr": "SELECT [1,2,3] AS arr"}, f)
    failures, text = run(sf, out)
    assert failures == 1, text
    assert "[FAIL-arr ] q_arr" in text, text
    assert "[OK       ] q_drift" in text, text

    print("check_oracle selftest OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
