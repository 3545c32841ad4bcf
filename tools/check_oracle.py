#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's t2 correctness gate: run
graft.Verify output against DuckDB oracle SQL and compare. Not part of the
shipped library (the Scala engine has no Python dependency); this exists so
oracle mismatches are caught before the round gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
       python3 tools/check_oracle.py --selftest

The compare is TYPE-STRICT (r13): the driver's hash is computed over typed
values, so an oracle emitting HUGEINT (e.g. an uncast integer `sum(...)
OVER (...)`) against a Spark BIGINT column fails the driver even when every
value is equal. We therefore compare DuckDB result types of the oracle
cursor against the types DuckDB infers reading the Spark parquet, so local
green == driver green. `--selftest` proves the checker catches the r12
q120/q126 class of bug (uncast window sum) before trusting a run.
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

def type_mismatches(ocols, otypes, scols, stypes):
    """Per-column DuckDB type compare, by column name. Returns a list of
    (col, oracle_type, spark_type) strings for genuinely different types.

    The one tolerated family is DECIMAL width: DuckDB types sum(DECIMAL(p,s))
    as DECIMAL(38,s) while Spark writes DECIMAL(p+10,s); the driver's hash
    canonicalizes decimals by VALUE+scale, so widths differ benignly as long
    as the scale matches. Everything else (HUGEINT vs BIGINT, INT vs BIGINT,
    VARCHAR vs anything) is a real driver-level mismatch."""
    omap = {c: str(t) for c, t in zip(ocols, otypes)}
    smap = {c: str(t) for c, t in zip(scols, stypes)}
    bad = []
    for c in sorted(omap):
        ot, st = omap[c], smap.get(c)
        if st is None or ot == st:
            continue
        if ot.startswith("DECIMAL(") and st.startswith("DECIMAL("):
            oscale = ot.rstrip(")").split(",")[-1]
            sscale = st.rstrip(")").split(",")[-1]
            if oscale == sscale:
                continue
        bad.append((c, ot, st))
    return bad

def selftest():
    """A deliberately uncast integer window sum (DuckDB HUGEINT) against a
    BIGINT parquet-shaped column MUST be flagged — reproduces the r12
    q120/q126 driver failure that the old repr()-based compare missed."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT CAST(i AS BIGINT) AS k, "
                "CAST(i AS BIGINT) AS v FROM range(5) r(i)")
    def ct(sql):
        rel = con.sql(sql)
        return rel.columns, [str(t) for t in rel.types]
    oc, ot = ct("SELECT k, sum(v) OVER (ORDER BY k) AS cum FROM t")
    # the "spark side": same values, but the column is an honest BIGINT
    sc, st = ct(
        "SELECT k, CAST(sum(v) OVER (ORDER BY k) AS BIGINT) AS cum FROM t")
    bad = type_mismatches(oc, ot, sc, st)
    assert bad == [("cum", "HUGEINT", "BIGINT")], f"selftest MISSED: {bad}"
    # and the cast form must be clean
    assert type_mismatches(sc, st, sc, st) == []
    # benign DECIMAL width difference must NOT be flagged
    dc, dt = ct("SELECT CAST(1.50 AS DECIMAL(38,2)) AS d")
    ec, et = ct("SELECT CAST(1.50 AS DECIMAL(22,2)) AS d")
    assert type_mismatches(dc, dt, ec, et) == []
    # but a SCALE difference is real
    fc, ft = ct("SELECT CAST(1.50 AS DECIMAL(22,3)) AS d")
    assert len(type_mismatches(dc, dt, fc, ft)) == 1
    print("selftest PASS: uncast window sum is caught, decimal widths tolerated")
    return 0

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # sixth oracle axis (r17): pin DuckDB's session zone to match a
    # non-UTC Spark run (Verify's SPARK_GRAFT_TZ). Fixture timestamps
    # are naive wall-clock (isAdjustedToUTC=0) so most ops are
    # zone-independent on both sides; the pin covers the TIMESTAMPTZ
    # edges (epoch casts, tz-aware functions).
    import os as _os
    tz = _os.environ.get("GRAFT_ORACLE_TZ")
    if tz:
        con.execute(f"SET TimeZone='{tz}'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # driver fixtures are single parquet FILES; Spark-written tables
        # (e.g. the replicated x4 corpus) are DIRECTORIES of part files
        import os
        pat = (f"{sf_dir}/{t}.parquet/*.parquet"
               if os.path.isdir(f"{sf_dir}/{t}.parquet")
               else f"{sf_dir}/{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written"); n_fail += 1; continue
        try:
            rel = con.sql(sql)
            ocols = list(rel.columns)
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        scols = list(rel.columns)
        stypes = [str(t) for t in rel.types]
        srows = rel.fetchall()
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns oracle={sorted(ocols)} spark={sorted(scols)}")
            n_fail += 1; continue
        badtypes = type_mismatches(ocols, otypes, scols, stypes)
        if badtypes:
            print(f"FAIL {name}: TYPE mismatch (driver hash is typed): " +
                  "; ".join(f"{c} oracle={ot} spark={st}" for c, ot, st in badtypes))
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
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
