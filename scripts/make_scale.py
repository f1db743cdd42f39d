#!/usr/bin/env python3
"""Derive an Nx bench dataset from the driver's sf0.1 parquet: every
scaled table is N key-offset replicas of the original (offsets applied
consistently to foreign keys), dims are copied as-is. Bench evidence
only — correctness stays gated on the driver's own data.

Supersedes make_sf1.py (which is `make_scale.py <src> /tmp/sf1 10`).

Usage: python3 scripts/make_scale.py [src_dir] [out_dir] [replicas]
  e.g. python3 scripts/make_scale.py /root/testdata/sf0.1 /tmp/sf10 100
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 1_000_000_000

# table -> columns that carry the replica offset
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet'")
        print(f"{t}: copied", flush=True)
    for t, keys in OFFSET_COLS.items():
        cols = [c[0] for c in con.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + i * {OFF} AS {c}" if c in keys else c for c in cols)
        query = f"""SELECT {sel}
            FROM '{SRC}/{t}.parquet', (SELECT unnest(range({REPLICAS})) AS i)"""
        if t == "events":
            # the driver's events table is TIMESTAMP(NANOS); DuckDB's
            # parquet writer downcasts to micros, so route through
            # pyarrow to keep the replica's physical type identical
            import pyarrow as pa
            import pyarrow.parquet as pq
            tbl = con.sql(query).arrow()
            idx = tbl.schema.get_field_index("ts")
            tbl = tbl.set_column(idx, "ts", tbl.column("ts").cast(pa.timestamp("ns")))
            pq.write_table(tbl, f"{OUT}/{t}.parquet")
        else:
            con.sql(f"COPY ({query}) TO '{OUT}/{t}.parquet'")
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
