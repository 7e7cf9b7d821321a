#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate:
run `sbt runMain graft.Verify <sfDir> <outDir>` first, then this script
re-runs every oracle SQL in DuckDB over the same parquet tables and
compares row counts, schemas (name-sorted), and values.

Not part of the Spark library — local feedback loop only.
Usage: python3 scripts/check.py [sfDir] [outDir] [--query name]
"""
import sys, json, glob, os
import duckdb

argv = sys.argv[1:]
only = None
if "--query" in argv:
    i = argv.index("--query")
    only = argv[i + 1]
    del argv[i:i + 2]
args = [a for a in argv if not a.startswith("--")]
SF = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
OUT = args[1] if len(args) > 1 else "/tmp/verify_out"

con = duckdb.connect()
for t in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(t)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))
fails = 0
if only is not None:
    if only not in oracles:
        print(f"unknown query {only!r}; known: {sorted(oracles)}")
        sys.exit(2)
    oracles = {only: oracles[only]}
for name, sql in sorted(oracles.items()):
    res_dir = f"{OUT}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no spark result dir"); fails += 1; continue
    try:
        spark_df = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        duck_df = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    # driver sorts columns by name before hashing values
    spark_df = spark_df[sorted(spark_df.columns)]
    duck_df = duck_df[sorted(duck_df.columns)]
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: schema {list(spark_df.columns)} vs {list(duck_df.columns)}")
        fails += 1; continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
        fails += 1; continue
    # value compare, row by row in given order (both canonically ordered);
    # null masks compared EXPLICITLY first (str-coercion alone could let a
    # None-vs-'None' or NaN-vs-'nan' string coincidence slip through)
    mismatch = None
    for c in spark_df.columns:
        a = spark_df[c].reset_index(drop=True)
        b = duck_df[c].reset_index(drop=True)
        try:
            na, nb = a.isna(), b.isna()
            neq = na.eq(nb)
            if not neq.all():
                i = int(neq.idxmin())
                mismatch = (c, i, "null" if na.iloc[i] else a.iloc[i],
                            "null" if nb.iloc[i] else b.iloc[i])
                break
            eq = a.astype(str).eq(b.astype(str)) | na
            if not eq.all():
                i = int(eq.idxmin())
                mismatch = (c, i, a.iloc[i], b.iloc[i])
                break
        except Exception as e:
            mismatch = (c, -1, "cmp-error", str(e)); break
    if mismatch:
        c, i, av, bv = mismatch
        print(f"FAIL {name}: col={c} row={i} spark={av!r} duck={bv!r}")
        fails += 1
    else:
        print(f"OK   {name}: {len(spark_df)} rows")
print(f"\n{len(oracles)-fails}/{len(oracles)} queries match")
sys.exit(1 if fails else 0)
