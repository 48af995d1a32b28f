"""Round-13 interleaved A/B for the 2M survivors wall (round-12 verdict
#2, lever (a)): does scaling the estimate-screen join's shuffle
partitions with candidate volume (screen_partitions="auto", ~128 MB per
partition instead of 64 global partitions x ~375 MB -> spill) move the
2M end-to-end wall?  Same discipline as the round-12 mask A/B: four
alternating same-session legs, cache_scope per leg, identical corpus.

Usage: python scripts/probe_screen_partitions_ab.py [n_docs] [legs]
Results recorded in BASELINE.md (round 13).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
LEGS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

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
from csv_query_engine_spark.pipeline import cache_scope  # noqa: E402
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

results = {"default": [], "auto": []}
for leg in range(LEGS):
    mode = "default" if leg % 2 == 0 else "auto"
    sp = None if mode == "default" else "auto"
    with cache_scope(spark):
        t0 = time.time()
        v = dd.minhash_dedup_survivors(corpus, threshold=0.5, screen_partitions=sp).persist()
        n_total = v.count()
        n_dups = v.filter(F.col("is_dup")).count()
        dt = time.time() - t0
        v.unpersist()
    results[mode].append(round(dt, 1))
    print(f"leg {leg} mode={mode}: {dt:.1f}s  verdicts={n_total} dups={n_dups}", flush=True)

print(f"RESULT default={results['default']} auto={results['auto']}", flush=True)
