#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
Reads each <name>/ parquet result + oracle_sql.json, runs the SQL in DuckDB
over the sf parquet tables, and diffs (schema-insensitively: sorted columns,
sorted rows, values stringified).
"""
import sys, os, json, glob
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        res_dir = f"{outdir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"[MISS] {name}: no spark result dir"); n_fail += 1; continue
        try:
            spark_rel = con.execute(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            scols = [d[0] for d in spark_rel.description]
            srows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            dcols = [d[0] for d in duck_rel.description]
            drows = duck_rel.fetchall()
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); n_fail += 1; continue
        sc, scn = canon(srows, scols)
        dc, dcn = canon(drows, dcols)
        if scn != dcn:
            print(f"[FAIL] {name}: columns differ spark={scn} duck={dcn}"); n_fail += 1
        elif sc != dc:
            n_fail += 1
            diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
            print(f"[FAIL] {name}: rows spark={len(sc)} duck={len(dc)}; first diffs: {diffs}")
            only_s = set(sc) - set(dc); only_d = set(dc) - set(sc)
            print(f"        only-spark({len(only_s)}): {list(only_s)[:2]}")
            print(f"        only-duck({len(only_d)}): {list(only_d)[:2]}")
        else:
            print(f"[ OK ] {name}: {len(sc)} rows"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
