#!/usr/bin/env python3
"""Derive an Nx bench dataset from the driver's sf0.1 parquet: every
scaled table is N key-offset replicas of the original (offsets applied
consistently to foreign keys), dims are copied as-is. Bench evidence
only — correctness stays gated on the driver's own data.

Supersedes make_sf1.py (which is `make_scale.py <src> /tmp/sf1 10`).

With --organic, documents/embeddings replicas are additionally
perturbed so cross-replica rows are NOT near-duplicates — exact
replication multiplies every pair-emitting dedup query's candidate set
by replicas^2 (the BENCH_SF1.md caveat), which models nothing real;
organically grown corpora keep a roughly constant duplicate rate.
  - documents: every whitespace token gets a per-replica suffix
    (`tok~i`) — within-replica shingle/minhash/simhash structure is
    preserved isomorphically, cross-replica Jaccard drops to 0;
    n_chars is recomputed to stay == length(text).
  - embeddings: per-(replica, dim) deterministic sign flips — a
    diagonal orthogonal transform, so within-replica cosines are
    preserved EXACTLY while cross-replica cosines of formerly-equal
    vectors collapse to random-sign sums (|cos| ~ 1/sqrt(64) ≈ 0.12,
    far below every near-dup/semantic-dedup threshold).

Usage: python3 scripts/make_scale.py [src_dir] [out_dir] [replicas] [--organic]
  e.g. python3 scripts/make_scale.py /root/testdata/sf0.1 /tmp/sf10 100 --organic
"""
import os
import sys

import duckdb

args = [a for a in sys.argv[1:] if a != "--organic"]
ORGANIC = "--organic" in sys.argv[1:]
SRC = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
OUT = args[1] if len(args) > 1 else "/tmp/sf1"
REPLICAS = int(args[2]) if len(args) > 2 else 10
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
        def render(c):
            if c in keys:
                return f"{c} + i * {OFF} AS {c}"
            if ORGANIC and t == "documents" and c == "text":
                return ("array_to_string(list_transform(string_split(text, ' '), "
                        "tok -> tok || '~' || i::VARCHAR), ' ') AS text")
            if ORGANIC and t == "documents" and c == "n_chars":
                return ("length(array_to_string(list_transform(string_split(text, ' '), "
                        "tok -> tok || '~' || i::VARCHAR), ' ')) AS n_chars")
            if ORGANIC and t == "embeddings" and c == "label":
                # label is q_dedup_embedding's blocking key; replica-
                # offsetting it models a blocking key whose cardinality
                # grows with the corpus (constant block size -> linear
                # pair work), the only regime a blocked pair join is
                # ever deployed in
                return f"(label + i * 10)::INT AS label"
            if ORGANIC and t == "embeddings" and c == "embedding":
                return ("list_transform(range(1, len(embedding) + 1), "
                        "j -> (embedding[j] * (CASE WHEN hash(i * 64 + j) % 2 = 0 "
                        "THEN 1 ELSE -1 END))::FLOAT) AS embedding")
            return c
        sel = ", ".join(render(c) for c in cols)
        query = f"""SELECT {sel}
            FROM '{SRC}/{t}.parquet', (SELECT unnest(range({REPLICAS})) AS i)"""
        src_ts_ns = False
        if t == "events":
            import pyarrow.parquet as _pq
            src_ts_ns = str(_pq.read_schema(f"{SRC}/{t}.parquet").field("ts").type) == "timestamp[ns]"
        if src_ts_ns:
            # older testdata generations ship events.ts as
            # TIMESTAMP(NANOS); DuckDB's parquet writer downcasts to
            # micros, so route through pyarrow to keep the replica's
            # physical type identical to the source. Newer generations
            # are native micros and the plain COPY already matches.
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
