#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's t2 correctness gate: run
graft.Verify output against DuckDB oracle SQL and compare. Not part of the
shipped library (the Scala engine has no Python dependency); this exists so
oracle mismatches are caught before the round gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows by value repr — order-insensitive
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.10g}"
            vals.append((cols[i], repr(v)))
        out.append(tuple(vals))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written"); n_fail += 1; continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        cur = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in cur.description]
        srows = cur.fetchall()
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns oracle={sorted(ocols)} spark={sorted(scols)}")
            n_fail += 1; continue
        o, s = canon(orows, ocols), canon(srows, scols)
        if o == s:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            for i, (a, b) in enumerate(zip(o, s)):
                if a != b:
                    print(f"  first diff row {i}:\n   oracle={a}\n   spark ={b}")
                    break
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
