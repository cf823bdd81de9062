#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle
SQL in DuckDB over the sf tables, load the Spark result parquet, sort
columns by name, and compare row counts, schemas and values exactly.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, os, sys
import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracles = json.load(open(os.path.join(out, "oracle_sql.json")))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

fails = []
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    if only and name not in only:
        continue
    spark_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
    srows = spark_rel.fetchall()
    scols = spark_rel.columns
    stypes = [str(t) for t in spark_rel.types]
    if name not in oracles:
        status = "ROWS-ONLY " + ("ok" if len(srows) > 0 else "EMPTY!")
        print(f"{name:28s} {status} ({len(srows)} rows)")
        if len(srows) == 0:
            fails.append((name, "rows-only query returned 0 rows"))
        continue
    try:
        orel = con.sql(oracles[name])
        orows = orel.fetchall()
        ocols = orel.columns
        otypes = [str(t) for t in orel.types]
    except Exception as e:
        print(f"{name:28s} ORACLE ERROR: {str(e)[:200]}")
        fails.append((name, f"oracle error: {e}"))
        continue
    # The real driver sorts rows via pandas, which cannot hash
    # array-valued cells — any list-typed output column crashes its
    # compare even when values match. Flag it here so it never ships.
    listy = [c for c, t in zip(scols, stypes) if "[]" in t or t.startswith("LIST")]
    if listy:
        print(f"{name:28s} LIST-TYPED OUTPUT (driver compare would crash): {listy}")
        fails.append((name, f"list-typed output columns {listy}"))
        continue
    sidx = sorted(range(len(scols)), key=lambda i: scols[i])
    oidx = sorted(range(len(ocols)), key=lambda i: ocols[i])
    sc = [scols[i] for i in sidx]
    oc = [ocols[i] for i in oidx]
    st = [stypes[i] for i in sidx]
    ot = [otypes[i] for i in oidx]
    msgs = []
    if len(srows) != len(orows):
        msgs.append(f"rowcount spark={len(srows)} duck={len(orows)}")
    if sc != oc:
        msgs.append(f"colnames spark={sc} duck={oc}")
    elif st != ot:
        msgs.append(f"coltypes spark={st} duck={ot}")
    if not msgs:
        for rn, (sr, orr) in enumerate(zip(srows, orows)):
            sv = tuple(norm(sr[i]) for i in sidx)
            ov = tuple(norm(orr[i]) for i in oidx)
            if sv != ov:
                msgs.append(f"row {rn}: spark={sv} duck={ov}")
                break
    if msgs:
        print(f"{name:28s} MISMATCH: {'; '.join(msgs)[:300]}")
        fails.append((name, msgs[0]))
    else:
        print(f"{name:28s} OK ({len(srows)} rows)")

missing = [n for n in oracles if not os.path.isdir(os.path.join(out, n))]
for n in missing:
    if not only or n in only:
        print(f"{n:28s} NO SPARK OUTPUT (query failed)")
        fails.append((n, "no spark output"))

print(f"\n{len(fails)} failures")
sys.exit(1 if fails else 0)
