#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle SQL in
DuckDB over the same parquet tables and compares against the Spark result
parquet written by graft.Verify. Dev tool only — not part of the library.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def row_key(row):
    return tuple((v is None, str(type(v)), v if v is not None else 0) for v in row)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        spark = pq.read_table(files[0])
        # driver semantics: sort columns by name, then compare values
        dcols = sorted(duck.column_names)
        scols = sorted(spark.column_names)
        if dcols != scols:
            print(f"FAIL {name}: columns {scols} vs oracle {dcols}"); n_fail += 1; continue
        drows = sorted([tuple(norm(r[c]) for c in dcols) for r in duck.to_pylist()], key=row_key)
        srows = sorted([tuple(norm(r[c]) for c in scols) for r in spark.to_pylist()], key=row_key)
        if len(drows) != len(srows):
            print(f"FAIL {name}: rows {len(srows)} vs oracle {len(drows)}"); n_fail += 1; continue
        if drows != srows:
            bad = next(i for i in range(len(drows)) if drows[i] != srows[i])
            print(f"FAIL {name}: value mismatch at sorted row {bad}:")
            print(f"  spark:  {srows[bad]}")
            print(f"  oracle: {drows[bad]}")
            n_fail += 1; continue
        # schema type check (loose): arrow types equal after name sort
        dtypes = {c: str(duck.schema.field(c).type) for c in dcols}
        stypes = {c: str(spark.schema.field(c).type) for c in scols}
        flag = "" if dtypes == stypes else f"  [type diff: {dtypes} vs {stypes}]"
        print(f"PASS {name} ({len(srows)} rows){flag}")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
