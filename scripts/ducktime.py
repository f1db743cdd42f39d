#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB over a testdata SF dir — the
single-node baseline half of the per-query Spark-vs-DuckDB
comparison. Mirrors graft.Bench: N passes (default 3), min per
query, one JSON line with loadavg before/after.

Usage: python3 scripts/ducktime.py <sfDir> <oracle_sql.json> [outFile]
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/duck_bench_latest.json"
    passes = int(os.environ.get("DUCK_BENCH_PASSES", "3"))  # min-of-3, symmetric with graft.Bench
    la0 = os.getloadavg()[0]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(oracle_path) as f:
        oracles = json.load(f)
    results = {}
    for name in sorted(oracles):
        best = None
        for _ in range(passes):
            t0 = time.time()
            try:
                con.sql(f"SELECT count(*) FROM ({oracles[name]})").fetchall()
                dt = time.time() - t0
            except Exception:
                dt = -1.0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 4)
    la1 = os.getloadavg()[0]
    doc = {"metric": "total", "value": round(sum(v for v in results.values() if v > 0), 4),
           "unit": "sec", "queries": results, "sf": sf_dir, "passes": passes,
           "loadavg_before": round(la0, 4), "loadavg_after": round(la1, 4)}
    line = json.dumps(doc)
    with open(out, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
