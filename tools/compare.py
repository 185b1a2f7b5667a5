#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare: for each query dir in
outDir, run the oracle SQL on the sf tables and diff against Spark's parquet
output (columns sorted by name, rows sorted, exact value compare)."""
import sys, json, glob, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.10g}"
    return str(v)

fail, ok, skip = [], [], []
for name in sorted(glob.glob(f"{out_dir}/q_*")):
    qname = name.split("/")[-1]
    spark = con.sql(f"SELECT * FROM '{name}/*.parquet'").fetchall()
    cols = [d[0] for d in con.sql(f"SELECT * FROM '{name}/*.parquet' LIMIT 0").description]
    if qname not in oracles:
        skip.append((qname, len(spark)))
        continue
    try:
        res = con.sql(oracles[qname])
        ocols = [d[0] for d in res.description]
        oracle = res.fetchall()
    except Exception as e:
        fail.append((qname, f"oracle error: {e}"))
        continue
    if sorted(c.lower() for c in cols) != sorted(c.lower() for c in ocols):
        fail.append((qname, f"schema: spark={sorted(cols)} oracle={sorted(ocols)}"))
        continue
    # reorder both by sorted column name
    sidx = [cols.index(c) for c in sorted(cols, key=str.lower)]
    oidx = [ocols.index(c) for c in sorted(ocols, key=str.lower)]
    # dtype-sensitive like the driver's pandas-hash compare (r11's
    # q_pack_sequences HUGEINT-vs-BIGINT slip passed the old stringified
    # check here but failed officially)
    stypes = [con.sql(f"SELECT * FROM '{name}/*.parquet' LIMIT 0").description[i][1] for i in sidx]
    otypes = [res.description[i][1] for i in oidx]
    if stypes != otypes:
        fail.append((qname, f"dtype: spark={stypes} oracle={otypes}"))
        continue
    srows = sorted(tuple(norm(r[i]) for i in sidx) for r in spark)
    orows = sorted(tuple(norm(r[i]) for i in oidx) for r in oracle)
    if srows == orows:
        ok.append(qname)
    else:
        diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        extra = f" rowcount {len(srows)} vs {len(orows)}" if len(srows) != len(orows) else ""
        fail.append((qname, f"values{extra}: first diffs {diff}"))

print(f"OK: {len(ok)}  FAIL: {len(fail)}  NO-ORACLE: {len(skip)}")
for q, msg in fail: print(f"  FAIL {q}: {msg[:500]}")
for q, n in skip: print(f"  rows-only {q}: {n} rows")
