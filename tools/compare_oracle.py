#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare to the Spark parquet output in
outDir/<name>/ (columns sorted by name, rows sorted, values hashed).

Usage: python3 tools/compare_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = repr(round(v, 9))
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING spark output: {name}")
            n_bad += 1
            continue
        try:
            o = con.sql(sql)
            ocols, orows = [d[0] for d in o.description], o.fetchall()
        except Exception as e:
            print(f"ORACLE-FAIL {name}: {e}")
            n_bad += 1
            continue
        s = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        scols, srows = [d[0] for d in s.description], s.fetchall()
        if sorted(map(str.lower, ocols)) != sorted(map(str.lower, scols)):
            print(f"SCHEMA-MISMATCH {name}: oracle={sorted(ocols)} spark={sorted(scols)}")
            n_bad += 1
            continue
        co, cs = canon(orows, [c.lower() for c in ocols]), canon(srows, [c.lower() for c in scols])
        if len(co) != len(cs):
            print(f"ROWCOUNT {name}: oracle={len(co)} spark={len(cs)}")
            n_bad += 1
        elif co != cs:
            diffs = [(a, b) for a, b in zip(co, cs) if a != b][:3]
            print(f"VALUES {name}: first diffs {diffs}")
            n_bad += 1
        else:
            n_ok += 1
            print(f"OK {name} ({len(co)} rows)")
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
