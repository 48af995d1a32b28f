"""Full-registry verify sweep: every queries() entry vs its oracle_sql()
via DuckDB views over the same parquet, sorted-columns/sorted-rows string
comparison. Usage: python scripts/verify_all.py [sf_dir]  (checked in late round 8; SKILL.md previously said rebuild-from-transcript)"""
import importlib.util
import sys
import time

import duckdb
from pyspark.sql import SparkSession

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)

df = m.entry(spark)
rows = df.collect()
assert len(rows) >= 0
print(f"entry() OK: {len(rows)} rows, schema {df.columns}", flush=True)

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

qs = m.queries()
oracles = m.oracle_sql()
fail = []
only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        sdf = fn(spark, SF_DIR)
        spark_pd = sdf.toPandas()
        if name not in oracles:
            print(f"  {name}: rows-only ({len(spark_pd)} rows) [{time.time()-t0:.1f}s]", flush=True)
            continue
        ora_pd = con.execute(oracles[name]).fetchdf()
        sp = spark_pd.reindex(sorted(spark_pd.columns), axis=1)
        op = ora_pd.reindex(sorted(ora_pd.columns), axis=1)
        if list(sp.columns) != list(op.columns):
            fail.append((name, f"schema {list(sp.columns)} vs {list(op.columns)}"))
            print(f"  {name}: SCHEMA MISMATCH", flush=True)
            continue
        srows = sorted(tuple(str(v) for v in r) for r in sp.itertuples(index=False))
        orows = sorted(tuple(str(v) for v in r) for r in op.itertuples(index=False))
        if srows != orows:
            ndiff = sum(1 for a, b in zip(srows, orows) if a != b) + abs(len(srows) - len(orows))
            fail.append((name, f"{ndiff} row diffs ({len(srows)} vs {len(orows)} rows)"))
            print(f"  {name}: VALUE MISMATCH {ndiff} diffs", flush=True)
            for a, b in list(zip(srows, orows))[:2000]:
                if a != b:
                    print(f"    spark={a}\n    ora  ={b}", flush=True)
                    break
        else:
            print(f"  {name}: OK ({len(srows)} rows) [{time.time()-t0:.1f}s]", flush=True)
    except Exception as e:
        fail.append((name, f"ERR {type(e).__name__}: {e}"))
        print(f"  {name}: ERROR {type(e).__name__}: {str(e)[:300]}", flush=True)

print(f"\n{'='*60}\n{len(qs)} queries, {len(fail)} failures", flush=True)
for n, r in fail:
    print(f"  FAIL {n}: {r[:200]}", flush=True)
sys.exit(1 if fail else 0)
