#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a given
SF dir, then execute each oracle SQL in DuckDB over the same parquet tables and
compare (row count, column names, sorted value hash). Usage:
    python3 tools/gatecheck.py [sfdir] [outdir]
"""
import sys, os, json, hashlib
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    # driver-style: sort columns by name, canonicalize values, sort rows, hash
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                row.append(f"{v:.10g}")
            else:
                row.append(str(v))
        rows.append("|".join(row))
    rows.sort()
    return cols, len(rows), hashlib.md5("\n".join(rows).encode()).hexdigest()

def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(OUT)):
        d = os.path.join(OUT, name)
        if not os.path.isdir(d):
            continue
        spark_df = duckdb.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        scols, snr, shash = canon(spark_df)
        if name not in oracle:
            results[name] = {"status": "rows_only", "rows": snr, "ok": snr >= 0}
            continue
        try:
            odf = con.sql(oracle[name]).df()
        except Exception as ex:
            results[name] = {"status": "oracle_error", "err": str(ex)[:300]}
            continue
        ocols, onr, ohash = canon(odf)
        ok = (scols == ocols) and (snr == onr) and (shash == ohash)
        results[name] = {"status": "ok" if ok else "MISMATCH",
                         "rows": snr, "oracle_rows": onr,
                         "cols": scols if scols != ocols else None,
                         "oracle_cols": ocols if scols != ocols else None,
                         "hash_eq": shash == ohash}
    nbad = 0
    for k, v in results.items():
        flag = v["status"]
        if flag not in ("ok", "rows_only"):
            nbad += 1
        print(f"{k:28s} {flag:12s} {json.dumps({kk: vv for kk, vv in v.items() if kk != 'status'}, default=str)[:220]}")
    print(f"\n{len(results)} queries, {nbad} failing")
    sys.exit(1 if nbad else 0)

main()
