#!/usr/bin/env python3
"""DuckDB-side exact comparison for oracle checks whose result sets are
too big to canon in pandas: column lists must match, row counts must
match and EXCEPT ALL must be empty in both directions (multiset
equality; DuckDB's set ops use IS NOT DISTINCT semantics, so NULL/NaN
compare equal). Exits non-zero when any name fails (ADVICE r13: this
is the documented oracle gate for ~100M-row results, so automation
chaining it must see the failure)."""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

out_dir, sf_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3].split(",")
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
failed = []
for name in names:
    t0 = time.time()
    try:
        sql = oracles[name]
        con.execute(f"CREATE OR REPLACE TABLE want AS ({sql})")
        cols = sorted(r[0] for r in con.execute("DESCRIBE want").fetchall())
        # exact column-list compare (ADVICE r13: projecting only the
        # oracle's columns from the dump let EXTRA engine columns pass)
        got_cols = sorted(r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        ).fetchall())
        if got_cols != cols:
            print(f"FAIL {name}: columns {got_cols} vs {cols}", flush=True)
            failed.append(name)
            continue
        collist = ", ".join(f'"{c}"' for c in cols)
        con.execute(f"CREATE OR REPLACE VIEW got AS SELECT {collist} FROM "
                    f"read_parquet('{out_dir}/{name}/*.parquet')")
        ng = con.execute("SELECT count(*) FROM got").fetchone()[0]
        nw = con.execute("SELECT count(*) FROM want").fetchone()[0]
        if ng != nw:
            print(f"FAIL {name}: rows {ng} vs {nw}  [{time.time()-t0:.0f}s]",
                  flush=True)
            failed.append(name)
            continue
        d1 = con.execute(f"SELECT count(*) FROM (SELECT {collist} FROM got "
                         f"EXCEPT ALL SELECT {collist} FROM want)").fetchone()[0]
        d2 = con.execute(f"SELECT count(*) FROM (SELECT {collist} FROM want "
                         f"EXCEPT ALL SELECT {collist} FROM got)").fetchone()[0]
        ok = d1 == 0 and d2 == 0
        if not ok:
            failed.append(name)
        print(f"{'OK  ' if ok else 'FAIL'} {name} ({ng} rows, diff {d1}/{d2})  "
              f"[{time.time()-t0:.0f}s]", flush=True)
    except Exception as e:  # noqa: BLE001 — record and keep going
        print(f"FAIL {name}: {type(e).__name__}: {e}  [{time.time()-t0:.0f}s]",
              flush=True)
        failed.append(name)
if failed:
    print(f"FAILED {len(failed)}/{len(names)}: {','.join(failed)}", flush=True)
sys.exit(1 if failed else 0)
