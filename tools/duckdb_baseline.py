#!/usr/bin/env python3
"""Time every oracle SQL from a Verify output dir in DuckDB.

Usage: tools/duckdb_baseline.py <sfDir> <verifyOutDir> [outJson]

Registers each <sfDir>/*.parquet as a view, runs each SQL in
<verifyOutDir>/oracle_sql.json once warm-up + once timed with threads=32,
writes {"queries": {name: sec}, "total": sec} to outJson
(default target/duckdb_baseline_<sf>.json).
"""
import glob
import json
import os
import sys
import time

import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
sf_name = os.path.basename(sf_dir.rstrip("/"))
out_json = sys.argv[3] if len(sys.argv) > 3 else f"target/duckdb_baseline_{sf_name}.json"

sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
con = duckdb.connect()
con.execute("SET threads=32")
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

times = {}
for name in sorted(sql):
    q = sql[name]
    con.execute(q).fetchall()  # warm-up (buffer cache, plan)
    t0 = time.time()
    con.execute(q).fetchall()
    times[name] = round(time.time() - t0, 3)
    print(f"{name:36s} {times[name]:8.3f}s", flush=True)

os.makedirs(os.path.dirname(out_json), exist_ok=True)
json.dump({"queries": times, "total": round(sum(times.values()), 3)}, open(out_json, "w"), indent=1)
print(f"total {sum(times.values()):.1f}s -> {out_json}")
