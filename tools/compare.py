#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against the DuckDB oracle and diff. Usage:
    python3 tools/compare.py <sfDir> <verifyOutDir>
Not part of the library — dev tooling only (driver-side python env).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns, floats stay as-is (queries must round)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]")
        if str(df[c].dtype) in ("int32", "Int32", "int16"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype) == "object":
            # array cells (numpy arrays / lists, possibly nested) are
            # unhashable and break sort_values; freeze them to tuples at
            # every nesting level
            def freeze(v):
                if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
                    v = v.tolist()
                if isinstance(v, list):
                    return tuple(freeze(x) for x in v)
                return v
            df[c] = df[c].map(freeze)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    dirs = {d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))}
    # union of declared oracles and produced dirs: a query that threw in
    # Verify (no output dir) must count as a failure, not vanish
    for name in sorted(dirs | set(oracle)):
        qdir = os.path.join(out_dir, name)
        if name not in dirs:
            n_fail += 1
            print(f"  [FAIL] {name}: no result directory (query crashed in Verify)")
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        got = norm(pd.concat([pd.read_parquet(f) for f in files])
                   if files else pd.DataFrame())
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        exp = norm(con.execute(oracle[name]).df())
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=True)
            print(f"  [PASS] {name}: {len(got)} rows")
            n_pass += 1
        except AssertionError as e:
            n_fail += 1
            print(f"  [FAIL] {name}: {str(e)[:500]}")
            print("   spark:", got.head(3).to_dict("records"))
            print("   duck :", exp.head(3).to_dict("records"))
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
