#!/usr/bin/env python3
"""check_oracle.py with a per-query wall cap and process-level
parallelism, for scale rehearsals where single oracles can run
minutes: each (query, oracle SQL) replays in its own subprocess under
`--cap` seconds (default 900); exceeding the cap records TIMEOUT
rather than hanging the sweep. Compare semantics are identical to
scripts/check_oracle.py (sort columns by name, row-sort, exact
compare with NaN==NaN).

Usage: check_oracle_capped.py <verify_out_dir> <sf_dir>
         [--cap 900] [--jobs 4] [--only q_a,q_b]
"""
import argparse
import concurrent.futures as cf
import json
import os
import subprocess
import sys
import time

WORKER = """
import json, sys
import duckdb, pandas as pd, numpy as np
out_dir, sf_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
sql = sys.stdin.read()
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

got = pd.read_parquet(f"{out_dir}/{name}")
want = con.execute(sql).fetchdf()
g, w = canon(got), canon(want)
if list(g.columns) != list(w.columns):
    print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}"); sys.exit(1)
if len(g) != len(w):
    print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); sys.exit(1)
for c in g.columns:
    gv, wv = g[c].to_numpy(), w[c].to_numpy()
    if gv.dtype.kind == "f" or wv.dtype.kind == "f":
        eq = (gv == wv) | (pd.isna(gv) & pd.isna(wv))
    else:
        eq = pd.Series(gv).eq(pd.Series(wv)) | (pd.isna(gv) & pd.isna(wv))
    eq = np.asarray(eq)
    if not eq.all():
        i = int(np.argmin(eq))
        print(f"FAIL {name}: col {c} row {i}: spark={gv[i]!r} oracle={wv[i]!r}")
        sys.exit(1)
print(f"OK   {name} ({len(g)} rows)")
"""


def run_one(out_dir, sf_dir, name, sql, cap):
    t0 = time.time()
    if not os.path.isdir(f"{out_dir}/{name}"):
        return name, f"FAIL {name}: no spark result", 0.0
    try:
        p = subprocess.run(
            [sys.executable, "-c", WORKER, out_dir, sf_dir, name],
            input=sql, capture_output=True, text=True, timeout=cap)
        msg = (p.stdout or p.stderr).strip().splitlines()
        msg = msg[-1] if msg else f"FAIL {name}: empty worker output"
        if p.returncode != 0 and not msg.startswith("FAIL"):
            msg = f"FAIL {name}: {msg[:200]}"
    except subprocess.TimeoutExpired:
        msg = f"TIMEOUT {name}: oracle exceeded {cap}s"
    return name, msg, time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("sf_dir")
    ap.add_argument("--cap", type=float, default=900.0)
    ap.add_argument("--jobs", type=int, default=4)
    ap.add_argument("--only", default=None)
    a = ap.parse_args()
    with open(f"{a.out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if a.only:
        keep = set(a.only.split(","))
        oracles = {k: v for k, v in oracles.items() if k in keep}
    n_fail = 0
    with cf.ThreadPoolExecutor(max_workers=a.jobs) as ex:
        futs = [ex.submit(run_one, a.out_dir, a.sf_dir, n, s, a.cap)
                for n, s in sorted(oracles.items())]
        for fut in cf.as_completed(futs):
            name, msg, dt = fut.result()
            print(f"{msg}  [{dt:.1f}s]", flush=True)
            if not msg.startswith("OK"):
                n_fail += 1
    print(f"\n{len(oracles) - n_fail}/{len(oracles)} queries match")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
