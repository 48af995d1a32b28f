"""Round-13 stage-isolated A/B: the est-screen signature-attach join at
2M docs, default (64) vs auto-scaled shuffle partitions, over SHARED
persisted inputs (shingle/sig/cand built once) — removes the upstream
pipeline's variance from the comparison the end-to-end A/B could not
resolve.  Six alternating legs.

Usage: python scripts/probe_screen_stage_ab.py [n_docs] [legs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
LEGS = int(sys.argv[2]) if len(sys.argv) > 2 else 6

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.python.filterPushdown.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from csv_query_engine_spark.io.pysource import register as register_sources  # noqa: E402
from csv_query_engine_spark.pipeline import dedup as dd  # noqa: E402

register_sources(spark)

base = (
    spark.read.format("synthetic_docs")
    .option("n_docs", str(N_DOCS))
    .option("rows_per_partition", str(max(N_DOCS // 64, 1)))
    .load()
    .select("doc_id", "text")
)
DEGEN_TEXT = "the quick brown fox jumps over the lazy dog " * 8
degen = spark.range(8192).select(
    (F.col("id") + N_DOCS).alias("doc_id"), F.lit(DEGEN_TEXT).alias("text")
)
corpus = base.unionByName(degen)

t0 = time.time()
hashed = (
    dd._hashed_shingles(corpus, "doc_id", "text", 5)
    .select("id", "hashes")
    .persist(StorageLevel.MEMORY_AND_DISK)
)
sig = dd._oph_signatures(hashed, 64).select("id", "sig").persist(StorageLevel.MEMORY_AND_DISK)
n_sig = sig.count()
be = dd._band_entries(sig, 64, 16)
mins = be.groupBy("band", "bucket").agg(F.min("id").alias("cand"))
cand = (
    be.join(mins, ["band", "bucket"])
    .filter(F.col("id") != F.col("cand"))
    .select("id", "cand")
    .distinct()
).persist(StorageLevel.MEMORY_AND_DISK)
n_cand = cand.count()
hashed.unpersist()
print(f"setup: sigs={n_sig} cands={n_cand} [{time.time()-t0:.1f}s]", flush=True)

row_bytes = 2 * 8 * 64 + 32
n_auto = max(64, min(4096, -(-n_sig * 16 * row_bytes // (128 << 20))))
print(f"auto partitions = {n_auto}", flush=True)

est = F.aggregate(
    F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
    F.lit(0),
    lambda acc, x: acc + x,
).cast("double") / F.lit(64.0)

results = {"default": [], "auto": []}
for leg in range(LEGS):
    mode = "default" if leg % 2 == 0 else "auto"
    c = cand
    sa = sig.select(F.col("id"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("id").alias("cand"), F.col("sig").alias("sig_b"))
    if mode == "auto":
        c = c.repartition(n_auto, "id")
        sa = sa.repartition(n_auto, "id")
    j = c.join(sa, "id")
    if mode == "auto":
        j = j.repartition(n_auto, "cand")
        sb = sb.repartition(n_auto, "cand")
    t0 = time.time()
    n = j.join(sb, "cand").filter(est >= F.lit(0.35)).count()
    dt = time.time() - t0
    results[mode].append(round(dt, 1))
    print(f"leg {leg} mode={mode}: {dt:.1f}s screened={n}", flush=True)

print(f"RESULT default={results['default']} auto={results['auto']}", flush=True)
