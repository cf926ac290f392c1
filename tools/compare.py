#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each Verify
parquet output, run the matching oracle SQL in DuckDB over the same
sf-dir tables, and diff (schema by sorted column name, then row-set by
value). Usage: compare.py <sfDir> <verifyOutDir>"""
import sys, json, math, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v

fails = []
for qname in sorted(oracle):
    qdir = os.path.join(outdir, qname)
    if not os.path.isdir(qdir):
        print(f"MISSING OUTPUT {qname}")
        fails.append(qname)
        continue
    spark_rel = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
    scols = [d[0] for d in spark_rel.description]
    srows = spark_rel.fetchall()
    try:
        duck_rel = con.execute(oracle[qname])
        dcols = [d[0] for d in duck_rel.description]
        drows = duck_rel.fetchall()
    except Exception as e:
        print(f"ORACLE ERROR {qname}: {e}")
        fails.append(qname)
        continue
    if sorted(scols) != sorted(dcols):
        print(f"SCHEMA MISMATCH {qname}: spark={sorted(scols)} duck={sorted(dcols)}")
        fails.append(qname)
        continue
    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    key = lambda row: [repr(x) for x in row]
    sset = sorted((tuple(canon(r[i]) for i in sidx) for r in srows), key=key)
    dset = sorted((tuple(canon(r[i]) for i in didx) for r in drows), key=key)
    if len(sset) != len(dset):
        print(f"ROWCOUNT MISMATCH {qname}: spark={len(sset)} duck={len(dset)}")
        fails.append(qname)
        continue
    bad = [(a, b) for a, b in zip(sset, dset) if a != b]
    if bad:
        print(f"VALUE MISMATCH {qname}: {len(bad)}/{len(sset)} rows; first: spark={bad[0][0]} duck={bad[0][1]}")
        fails.append(qname)
    else:
        print(f"OK {qname} ({len(sset)} rows)")

# rows-only queries (no oracle): just report counts
for qdir in sorted(glob.glob(os.path.join(outdir, "q*"))):
    qname = os.path.basename(qdir)
    if qname in oracle or not os.path.isdir(qdir):
        continue
    n = con.execute(f"SELECT count(*) FROM '{qdir}/*.parquet'").fetchone()[0]
    print(f"ROWS-ONLY {qname}: {n} rows")

print(("FAILED: " + ", ".join(fails)) if fails else "ALL MATCH")
sys.exit(1 if fails else 0)
