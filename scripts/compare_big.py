#!/usr/bin/env python3
"""DuckDB-side exact comparison for oracle checks whose result sets are
too big to canon in pandas: row counts must match and EXCEPT ALL must
be empty in both directions (multiset equality; DuckDB's set ops use
IS NOT DISTINCT semantics, so NULL/NaN compare equal)."""
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
for name in names:
    t0 = time.time()
    sql = oracles[name]
    con.execute(f"CREATE OR REPLACE TABLE want AS ({sql})")
    cols = [r[0] for r in con.execute("DESCRIBE want").fetchall()]
    collist = ", ".join(f'"{c}"' for c in sorted(cols))
    con.execute(f"CREATE OR REPLACE VIEW got AS SELECT {collist} FROM "
                f"read_parquet('{out_dir}/{name}/*.parquet')")
    ng = con.execute("SELECT count(*) FROM got").fetchone()[0]
    nw = con.execute("SELECT count(*) FROM want").fetchone()[0]
    if ng != nw:
        print(f"FAIL {name}: rows {ng} vs {nw}  [{time.time()-t0:.0f}s]", flush=True)
        continue
    d1 = con.execute(f"SELECT count(*) FROM (SELECT {collist} FROM got "
                     f"EXCEPT ALL SELECT {collist} FROM want)").fetchone()[0]
    d2 = con.execute(f"SELECT count(*) FROM (SELECT {collist} FROM want "
                     f"EXCEPT ALL SELECT {collist} FROM got)").fetchone()[0]
    ok = d1 == 0 and d2 == 0
    print(f"{'OK  ' if ok else 'FAIL'} {name} ({ng} rows, diff {d1}/{d2})  "
          f"[{time.time()-t0:.0f}s]", flush=True)
