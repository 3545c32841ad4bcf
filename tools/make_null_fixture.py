#!/usr/bin/env python3
"""Dev-only: build the null-bearing fixture the standing round-close gate
runs against (FIXTURES.md §C). Copies every sf0.001 table verbatim, then
unions three adversarial rows into documents.parquet:

  (NULL id, real text)   -- exercises every id-keyed contract
  (id, NULL text/lang)   -- exercises every text-derived expression
  (id, NULL n_chars/src) -- exercises priority/stratum null handling

The engine's null contracts (SURVEY.md r14 note) and every oracle must
agree on these rows — Verify + check_oracle against this dir is the gate
that keeps the r13 null-divergence class from regrowing.

Usage: python3 tools/make_null_fixture.py [outDir]   (default /tmp/sf_nulls)
"""
import sys, os, shutil, glob
import duckdb

src = "/root/testdata/sf0.001"
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_nulls"
os.makedirs(out, exist_ok=True)
for p in glob.glob(f"{src}/*.parquet"):
    if os.path.basename(p) != "documents.parquet":
        shutil.copy(p, out)

con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT * FROM '{src}/documents.parquet'
  UNION ALL BY NAME
  SELECT * FROM (VALUES
    (CAST(NULL AS BIGINT), 'null-id text body', 'en', 'src0',
     CAST(17 AS BIGINT)),
    (CAST(999991 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
     'src1', CAST(NULL AS BIGINT)),
    (CAST(999992 AS BIGINT), 'text with null nchars', 'en',
     CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT))
  ) t(doc_id, text, lang, source, n_chars)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
n = con.execute(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
print(f"null fixture at {out}: documents={n} (base + 3 null rows)")
