#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles, mimicking the driver's DuckDB
compare: run Verify output vs oracle_sql.json on the same parquet tables,
sort columns by name, sort rows, compare values exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(LOCAL DEV TOOL ONLY — duckdb/pandas are driver-side; engine code is Scala.)
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stable row sort on stringified values (handles lists/NaN)
    key = df.apply(lambda r: json.dumps(
        [None if (isinstance(v, float) and np.isnan(v)) else
         (list(v) if isinstance(v, (list, np.ndarray)) else
          (str(v) if not isinstance(v, (int, float, bool, str, type(None))) else v))
         for v in r], default=str), axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)

def cell_eq(a, b):
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        la = list(a) if a is not None and not (isinstance(a, float) and pd.isna(a)) else None
        lb = list(b) if b is not None and not (isinstance(b, float) and pd.isna(b)) else None
        if la is None or lb is None:
            return la is None and lb is None
        return len(la) == len(lb) and all(cell_eq(x, y) for x, y in zip(la, lb))
    an = pd.isna(a) if not isinstance(a, (list, np.ndarray)) else False
    bn = pd.isna(b) if not isinstance(b, (list, np.ndarray)) else False
    if an or bn:
        return an and bn
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)
    return a == b or str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3:  # dev loop: restrict to one query
        oracles = {k: v for k, v in oracles.items() if k == sys.argv[3]}
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in
                             sorted(glob.glob(f"{res_dir}/*.parquet"))],
                            ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        # the DRIVER's compare crashes on list/ndarray cells (pandas
        # sort_values: "unhashable type"); fail loudly here instead of
        # masking it with the JSON sort key (r7 q_inverted_index lesson)
        complex_cols = [c for c in got.columns if got[c].map(
            lambda v: isinstance(v, (list, dict, np.ndarray))).any()]
        if complex_cols:
            print(f"FAIL {name}: complex-typed output columns {complex_cols} "
                  "(driver harness would crash; serialize to '|'-joined strings)")
            n_fail += 1; continue
        g, x = norm(got), norm(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}")
            n_fail += 1; continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}"); n_fail += 1; continue
        bad = None
        for ci, c in enumerate(g.columns):
            gv, xv = g[c].values, x[c].values
            for i in range(len(gv)):
                if not cell_eq(gv[i], xv[i]):
                    bad = (c, i, gv[i], xv[i]); break
            if bad: break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} duckdb={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
