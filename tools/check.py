#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
parquet tables of <sfDir> registered as views, and compares against the
parquet the Spark Verify main dumped at <verifyOutDir>/<name>/.

Comparison mirrors the driver's pandas-hash gate, which is BIT-exact:
both sides go through fetchdf / read_parquet into pandas, columns are
sorted by name, rows sorted, then values compared at the bit level
(float64 -0.0 != +0.0, int64 != float64). This catches the two classes
a value-level compare hides:
  * DuckDB sum(BIGINT) -> HUGEINT -> float64 in pandas (dtype mismatch
    vs Spark's int64) -- cast integer sums to BIGINT in oracle SQL;
  * IEEE -0.0 vs +0.0 after round() of a tiny negative -- normalize
    with `+ 0` on both sides.
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Sort columns by name, rows by stringified tuple; keep dtypes."""
    df = df[sorted(df.columns)]
    if len(df):
        key = df.astype(str).apply(tuple, axis=1)
        df = df.iloc[key.argsort(kind="mergesort").to_numpy()].reset_index(drop=True)
    return df


def bit_diff(a, b):
    """First bit-level difference between two canonicalized frames, or None."""
    if list(a.columns) != list(b.columns):
        return f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        x, y = a[c], b[c]
        # int widths are interchangeable (the driver's pandas hash casts
        # every integer dtype to uint64), but int-vs-float is a mismatch.
        ints = (np.int8, np.int16, np.int32, np.int64,
                np.uint8, np.uint16, np.uint32, np.uint64)
        if x.dtype in ints and y.dtype in ints:
            if not (x.to_numpy().astype(np.int64) == y.to_numpy().astype(np.int64)).all():
                neq = x.to_numpy().astype(np.int64) != y.to_numpy().astype(np.int64)
                i = int(np.argmax(neq))
                return f"col {c} row {i}: {x.iloc[i]!r} vs {y.iloc[i]!r}"
            continue
        if str(x.dtype) != str(y.dtype):
            return f"col {c}: dtype {x.dtype} vs {y.dtype}"
        if x.dtype == np.float64:
            xb = x.to_numpy().view(np.uint64)
            yb = y.to_numpy().view(np.uint64)
            neq = xb != yb
            if neq.any():
                i = int(np.argmax(neq))
                return f"col {c} row {i}: {x.iloc[i]!r} vs {y.iloc[i]!r} (bit-level)"
        else:
            for i in range(len(x)):
                if repr(x.iloc[i]) != repr(y.iloc[i]):
                    return f"col {c} row {i}: {x.iloc[i]!r} vs {y.iloc[i]!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
        if name not in oracle:
            status = "rows-only " + ("PASS" if len(got) > 0 else "FAIL(empty)")
            print(f"{status} {name}: {len(got)} rows (no oracle)")
            n_pass += len(got) > 0; n_fail += len(got) == 0
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns differ spark={sorted(got.columns)} duck={sorted(exp.columns)}")
            n_fail += 1; continue
        diff = bit_diff(canon(got), canon(exp))
        if diff is None:
            print(f"PASS {name}: {len(got)} rows"); n_pass += 1
        else:
            print(f"FAIL {name}: {diff}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
