#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped
by graft.Verify, run its oracle SQL in DuckDB over the same parquet
tables, sort columns by name, sort rows, and compare values.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_classes(arrow_table):
    """Per-column rendered-type class, mirroring what the driver's
    type-sensitive hasher distinguishes. The key case: DuckDB window
    sums / integer sums produce HUGEINT (arrow decimal128(38,0)) and
    DECIMAL stays decimal — both render differently from int64/float64
    even at equal values (SURVEY §4; the r5 q_equidepth miss, which
    pandas-value comparison could not see because .df() collapses
    HUGEINT/DECIMAL to float64).
    """
    import pyarrow.types as pt
    classes = {}
    for field in arrow_table.schema:
        t = field.type
        if pt.is_decimal(t):
            c = "decimal"
        elif pt.is_integer(t):
            c = "int"
        elif pt.is_floating(t):
            c = "float"
        elif pt.is_boolean(t):
            c = "bool"
        elif pt.is_timestamp(t):
            c = "timestamp"
        elif pt.is_date(t):
            c = "date"
        elif pt.is_string(t) or pt.is_large_string(t):
            c = "string"
        elif pt.is_binary(t) or pt.is_large_binary(t):
            c = "binary"
        elif pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t):
            c = "list"
        else:
            c = str(t)
        classes[field.name] = c
    return classes


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes to comparable forms
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c], utc=True).dt.tz_localize(None)
        elif df[c].dtype == object:
            def norm_cell(v):
                if v is None:
                    return None
                if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                    return str([str(x) for x in v])
                return str(v)
            df[c] = df[c].map(norm_cell)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # large-SF sweeps: cap DuckDB so a huge oracle (q_paragraph_dedup
    # at sf10) fails as a per-query error row instead of OOM-killing
    # the whole sweep
    mem = os.environ.get("SELFCHECK_DUCKDB_MEMORY")
    if mem:
        con.sql(f"SET memory_limit='{mem}'")
    threads = os.environ.get("SELFCHECK_DUCKDB_THREADS")
    if threads:
        con.sql(f"SET threads={int(threads)}")
    # spill room for the large-SF oracles (an in-memory connection has
    # no temp dir by default, so big aggregates/joins can't spill)
    tmpdir = os.environ.get("SELFCHECK_DUCKDB_TEMPDIR")
    if tmpdir:
        os.makedirs(tmpdir, exist_ok=True)
        con.sql(f"SET temp_directory='{tmpdir}'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_rows_only = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_fail += 1
            continue
        got_arrow = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").arrow()
        got = got_arrow.to_pandas()
        if name not in oracles:
            status = "ok" if len(got) > 0 else "EMPTY"
            print(f"ROWS  {name}: {len(got)} rows ({status})")
            n_rows_only += 1
            continue
        try:
            exp_arrow = con.sql(oracles[name]).arrow()
            exp = exp_arrow.to_pandas()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        gt, et = type_classes(got_arrow), type_classes(exp_arrow)
        # SURVEY §4 determinism rule: no OUTPUT column may be DECIMAL
        # (or a HUGEINT producer). Both sides may agree here — Python
        # Decimal str()s identically from pyarrow — while the DRIVER's
        # hasher renders Spark Decimal and DuckDB DECIMAL differently
        # (the r7 q_corr_regress miss). Enforce the rule itself, not
        # this replica's rendering.
        dec_cols = sorted(c for side in (gt, et) for c, cls in side.items()
                          if cls == "decimal")
        if dec_cols:
            print(f"FAIL  {name}: DECIMAL output column(s) {dec_cols} "
                  "violate the §4 rule — driver hash WILL diverge; "
                  "cast to VARCHAR/DOUBLE/BIGINT on both sides")
            n_fail += 1
            continue
        if gt != et:
            diff = {c: (gt.get(c), et.get(c)) for c in set(gt) | set(et)
                    if gt.get(c) != et.get(c)}
            print(f"FAIL  {name}: type mismatch (spark, oracle): {diff}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"PASS  {name}: {len(g)} rows")
            n_pass += 1
        except AssertionError as ex:
            print(f"FAIL  {name}: value mismatch: {str(ex)[:500]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
