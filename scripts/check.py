#!/usr/bin/env python3
"""Local feedback loop: mimic the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <sfDir> <outDir>
Reads outDir/<name>/*.parquet (Spark results) + outDir/oracle_sql.json,
runs each oracle SQL in DuckDB over views on sfDir/*.parquet, and compares
row values (columns sorted by name, floats compared exactly after the
queries' own rounding).
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not spark_files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        o = con.execute(sql).fetch_arrow_table()
        sp = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    ocols, scols = sorted(o.column_names), sorted(sp.column_names)
    if ocols != scols:
        print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
        fails += 1
        continue
    orows = o.select(ocols).to_pylist()
    srows = sp.select(ocols).to_pylist()
    if len(orows) != len(srows):
        print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
        fails += 1
        continue
    # normalize: compare str() of values (catches type width diffs too)
    def norm(rows):
        return [tuple((k, repr(v)) for k, v in sorted(r.items())) for r in rows]
    on, sn = norm(orows), norm(srows)
    if on != sn:
        bad = next(i for i in range(len(on)) if on[i] != sn[i])
        print(f"FAIL {name}: first diff at row {bad}:\n  oracle: {on[bad]}\n  spark:  {sn[bad]}")
        fails += 1
        continue
    print(f"ok   {name} ({len(orows)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
