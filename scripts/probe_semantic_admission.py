"""Round-13 streaming SEMANTIC admission probe: the linear-incremental
claim, measured for the embedding face.  Routes K equal micro-batches
(ascending vec-id slices of a deterministic synthetic vector corpus,
with a planted cross-batch duplicate in every batch) through
`route_semantic_admission_batch` and prints each batch's wall — the
claim is that per-batch cost stays FLAT as the admitted store grows
(the bucket-MIN store is O(distinct buckets), candidates ≤
n_bands×|batch|, and candidate vectors re-read only the semi-joined
candidate ids), matching the minhash admission's round-12 measurement.

Ends with a bucket-MIN store compaction (the shared MIN/MAX
maintenance face — the semantic mins table rides `compact_batch_store`
unchanged) plus one more batch over the compacted store.

Usage: python scripts/probe_semantic_admission.py [n_batches] [batch_vecs]
Results recorded in BASELINE.md (round 13).
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
BATCH_VECS = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from csv_query_engine_spark.streaming.events import (  # noqa: E402
    compact_batch_store,
    read_semantic_bucket_mins,
    read_semantic_verdicts,
    route_semantic_admission_batch,
)


@F.pandas_udf("array<float>")
def _vec(col):
    import numpy as np
    import pandas as pd

    out = []
    for i in col:
        rng = np.random.default_rng(int(i))
        out.append(rng.standard_normal(64).astype("float32"))
    return pd.Series(out)


store = os.path.join(tempfile.mkdtemp(prefix="sem_admission_"), "store")
total = N_BATCHES * BATCH_VECS
# every batch plants one copy of vector 0 at its last id, so each batch
# exercises a genuine cross-batch duplicate against the stored mins
corpus = spark.range(0, total, 1, 32).select(
    F.col("id").alias("vec_id"),
    _vec(F.when(F.col("id") % BATCH_VECS == BATCH_VECS - 1, F.lit(0)).otherwise(F.col("id"))).alias(
        "embedding"
    ),
)

print(f"== semantic admission probe: {N_BATCHES} batches x {BATCH_VECS} vecs")
walls = []
for b in range(N_BATCHES):
    lo, hi = b * BATCH_VECS, (b + 1) * BATCH_VECS
    batch = corpus.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
    t0 = time.time()
    route_semantic_admission_batch(batch, b, store, threshold=0.92)
    w = time.time() - t0
    walls.append(w)
    print(f"  batch {b}: [{w:.1f}s]", flush=True)

verdicts = read_semantic_verdicts(spark, store)
n_v = verdicts.count()
n_d = verdicts.filter(F.col("is_dup")).count()
# every batch after the first planted a copy of vector 0 -> must drop
plants = verdicts.filter(
    (F.col("vec_id") % BATCH_VECS == BATCH_VECS - 1) & (F.col("vec_id") > BATCH_VECS)
)
n_plants_dropped = plants.filter(F.col("is_dup") & (F.col("dup_of") == 0)).count()
mins_rows = spark.read.parquet(f"{store}/mins").count()
merged = read_semantic_bucket_mins(spark, store).count()
print(
    f"  verdicts={n_v} dups={n_d} planted_dropped={n_plants_dropped}/{N_BATCHES - 1} "
    f"stored_min_rows={mins_rows} merged_buckets={merged}"
)
assert n_plants_dropped == N_BATCHES - 1, "cross-batch planted dups must drop"

t0 = time.time()
removed = compact_batch_store(
    spark,
    f"{store}/mins",
    "band INT, bucket INT, min_id BIGINT, batch_id BIGINT",
    ["band", "bucket"],
    "min_id",
    "min",
)
mins_after = spark.read.parquet(f"{store}/mins").count()
merged_after = read_semantic_bucket_mins(spark, store).count()
print(
    f"  compaction: removed {removed} partitions, stored rows {mins_rows} -> "
    f"{mins_after}, merged buckets {merged} == {merged_after} [{time.time() - t0:.1f}s]"
)
assert merged_after == merged

b = N_BATCHES
batch = corpus.filter(F.col("vec_id") >= total).unionByName(
    spark.range(total, total + BATCH_VECS).select(
        F.col("id").alias("vec_id"), _vec(F.col("id")).alias("embedding")
    )
)
t0 = time.time()
route_semantic_admission_batch(batch, b, store, threshold=0.92)
print(f"  post-compaction batch {b}: [{time.time() - t0:.1f}s]")
print(f"  walls: {[round(w, 1) for w in walls]}")
spark.stop()
