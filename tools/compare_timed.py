#!/usr/bin/env python3
"""compare.py with a PER-ORACLE hard timeout — the second-scale-factor
gate (r12 VERDICT task 3) runs every batch oracle at sf0.1, where a
few all-pairs DuckDB oracles are quadratically slower than at the
driver's sf0.01; this wrapper runs each oracle in its own subprocess
and SIGKILLs past the budget (duckdb's interrupt() only lands at
operator boundaries — a monster pipeline blocks it), marking those
TIMEOUT so the round-close claim can list "green at sf0.1" and
"oracle-infeasible at sf0.1" explicitly.

Usage: python3 tools/compare_timed.py <sfDir> <verifyOutDir> [timeoutSec] [nameFilter,...]
Reuses compare.py's normalization verbatim (imported). Dev tooling —
driver-side python env only, like compare.py.
"""
import json, sys, glob, os, subprocess, time, tempfile
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import norm, TABLES

CHILD = r"""
import sys, json, os
sys.path.insert(0, os.getcwd())  # parent runs us with cwd = tools/
import duckdb
from compare import norm, TABLES
sf_dir, sql_file, out_file = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
sql = open(sql_file).read()
norm(con.execute(sql).df()).to_parquet(out_file)
"""


# Declared-slow oracles: per-entry override of the default subprocess
# cap. Empty since r16: cur_pipeline7's oracle was re-staged as DuckDB
# temp tables with singleton-shingle pruning (SparkEntry.oracleSql,
# VERDICT r15 task 7) and now runs in ~8 s at sf0.1 even on a
# contended box (tools/p7_oracle_dev.py: 64x over the r15 hinted
# form, byte-identical output at both sfs).
SLOW_ORACLES = {}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0
    wanted = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_timeout = 0
    timed_out = []
    dirs = {d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))}
    names = sorted(dirs | set(oracle))
    if wanted:
        names = [n for n in names if any(w in n for w in wanted)]
    tools_dir = os.path.dirname(os.path.abspath(__file__))
    child_py = os.path.join(tempfile.mkdtemp(prefix="cmp-timed-"), "child.py")
    open(child_py, "w").write(CHILD)
    for name in names:
        qdir = os.path.join(out_dir, name)
        if name not in dirs:
            n_fail += 1
            print(f"  [FAIL] {name}: no result directory", flush=True)
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        got = norm(pd.concat([pd.read_parquet(f) for f in files])
                   if files else pd.DataFrame())
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows", flush=True)
            continue
        with tempfile.TemporaryDirectory(prefix="cmp-gate-") as td:
            sqlf = os.path.join(td, "q.sql")
            outf = os.path.join(td, "exp.parquet")
            open(sqlf, "w").write(oracle[name])
            t0 = time.time()
            budget = max(timeout, SLOW_ORACLES.get(name, 0.0))
            try:
                r = subprocess.run(
                    [sys.executable, child_py, sf_dir, sqlf, outf],
                    cwd=tools_dir, timeout=budget,
                    capture_output=True, text=True)
            except subprocess.TimeoutExpired:
                n_timeout += 1
                timed_out.append(name)
                print(f"  [TIMEOUT] {name}: oracle exceeded {budget:.0f}s "
                      f"at this sf", flush=True)
                continue
            if r.returncode != 0:
                n_fail += 1
                print(f"  [ERR] {name}: {r.stderr.strip()[:300]}", flush=True)
                continue
            # re-norm after the parquet round trip: norm freezes array
            # cells to tuples, which arrow hands back as lists/ndarrays
            exp = norm(pd.read_parquet(outf))
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=True)
            print(f"  [PASS] {name}: {len(got)} rows "
                  f"({time.time()-t0:.1f}s oracle)", flush=True)
            n_pass += 1
        except AssertionError as e:
            n_fail += 1
            print(f"  [FAIL] {name}: {str(e)[:500]}", flush=True)
            print("   spark:", got.head(3).to_dict("records"), flush=True)
            print("   duck :", exp.head(3).to_dict("records"), flush=True)
    print(f"== {n_pass} pass, {n_fail} fail, {n_timeout} oracle-timeout"
          + (f" ({','.join(timed_out)})" if timed_out else ""), flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
