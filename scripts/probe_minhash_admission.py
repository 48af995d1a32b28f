"""Round-12 streaming MinHash admission probe: the linear-incremental
claim, measured.  Routes K equal micro-batches (ascending doc-id slices
of the synthetic corpus) through `route_minhash_admission_batch` and
prints each batch's wall — the claim is that per-batch cost stays FLAT
as the admitted store grows (the bucket-MIN store is O(distinct
buckets), candidates ≤ bands×|batch|, and candidate re-shingling
touches only the semi-joined candidate docs), in contrast to a
naive screen-against-everything whose batch cost grows with the corpus.

Also prints the store accounting per batch (mins rows written, verdicts,
dups) and ends with a bucket-MIN store compaction (the maintenance face)
plus one more batch over the compacted store.

Usage: python scripts/probe_minhash_admission.py [n_batches] [batch_docs]
Results recorded in BASELINE.md (round 12).
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
BATCH_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.python.filterPushdown.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from csv_query_engine_spark.io.pysource import register as register_sources  # noqa: E402
from csv_query_engine_spark.streaming.events import (  # noqa: E402
    compact_batch_store,
    read_minhash_bucket_mins,
    read_minhash_verdicts,
    route_minhash_admission_batch,
)

register_sources(spark)
store = os.path.join(tempfile.mkdtemp(prefix="mh_admission_"), "store")
total = N_BATCHES * BATCH_DOCS
corpus = (
    spark.read.format("synthetic_docs")
    .option("n_docs", str(total))
    .option("rows_per_partition", str(max(total // 32, 1)))
    .load()
    .select("doc_id", "text")
)

print(f"== minhash admission probe: {N_BATCHES} batches x {BATCH_DOCS} docs")
walls = []
for b in range(N_BATCHES):
    lo, hi = b * BATCH_DOCS, (b + 1) * BATCH_DOCS
    batch = corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    t0 = time.time()
    route_minhash_admission_batch(batch, b, store, threshold=0.5)
    w = time.time() - t0
    walls.append(w)
    print(f"  batch {b}: [{w:.1f}s]", flush=True)

verdicts = read_minhash_verdicts(spark, store)
n_v = verdicts.count()
n_d = verdicts.filter(F.col("is_dup")).count()
mins_rows = spark.read.parquet(f"{store}/mins").count()
merged_mins = read_minhash_bucket_mins(spark, store).count()
print(
    f"  verdicts={n_v} dups={n_d} stored_min_rows={mins_rows} "
    f"merged_buckets={merged_mins}"
)
print(
    f"  walls: first={walls[0]:.1f}s last={walls[-1]:.1f}s "
    f"mean(2..)={sum(walls[1:]) / max(len(walls) - 1, 1):.1f}s "
    f"(flat = per-batch cost independent of store size)"
)

t0 = time.time()
removed = compact_batch_store(
    spark,
    f"{store}/mins",
    "band INT, bucket BIGINT, min_id BIGINT, batch_id BIGINT",
    ["band", "bucket"],
    "min_id",
    "min",
)
t_c = time.time() - t0
after = spark.read.parquet(f"{store}/mins").count()
merged_after = read_minhash_bucket_mins(spark, store).count()
assert merged_after == merged_mins, "compaction changed the merged state"
print(
    f"  compaction: removed {removed} batch partitions in {t_c:.1f}s; "
    f"stored rows {mins_rows} -> {after}, merged buckets unchanged"
)

# one more batch over the compacted store: verdicts still flow
b = N_BATCHES
extra = corpus.filter(F.col("doc_id") < BATCH_DOCS).select(
    (F.col("doc_id") + total).alias("doc_id"), "text"
)
t0 = time.time()
route_minhash_admission_batch(extra, b, store, threshold=0.5)
print(f"  post-compaction batch {b}: [{time.time() - t0:.1f}s]")
n_after = read_minhash_verdicts(spark, store).count()
assert n_after == n_v + BATCH_DOCS
print("probe_minhash_admission: all assertions passed")
