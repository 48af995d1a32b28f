"""Round-10 CoW join-view write-amplification probe: a 2M-row
materialized fact x dim view maintained under a 10k-row delta batch,
with the view partitioned two ways:

  hash  — default pmod(xxhash64(pk), 64): uniform delta keys touch
          EVERY bucket, so the batch rewrites the whole 2M-row view
          (the amplification the docstring warns about);
  month — bucket_expr = the fact's month column (24 months, delta
          confined to one): the batch rewrites ~1/24 of the view.

Records wall time per mode + partitions rewritten.  Usage:
python scripts/probe_ivm.py [n_rows] (default 2_000_000).
Results in BASELINE.md (round 10)."""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from csv_query_engine_spark.streaming.events import route_join_view_batch  # noqa: E402

base = "/tmp/probe_ivm_store"
shutil.rmtree(base, ignore_errors=True)

dim = spark.range(10_000).select(
    F.col("id").alias("dk"), (F.col("id") % 7).alias("g")
)
fact = spark.range(N).select(
    F.col("id").alias("fk"),
    (F.col("id") % 10_000).alias("dk"),
    F.concat(F.lit("2024-"), F.lpad(((F.col("id") * 31) % 24 + 1).cast("string"), 2, "0")).alias("mon"),
    (F.col("id") % 1000).cast("double").alias("v"),
    F.lit("upsert").alias("change_type"),
)
# delta: 10k updates confined to month 2024-05 + 1k brand-new keys in it
upd = fact.filter((F.col("mon") == "2024-05")).limit(10_000).withColumn(
    "v", F.col("v") + 1.0
)
new = spark.range(N, N + 1_000).select(
    F.col("id").alias("fk"), (F.col("id") % 10_000).alias("dk"),
    F.lit("2024-05").alias("mon"), F.lit(1.0).alias("v"),
    F.lit("upsert").alias("change_type"),
)
delta = upd.unionByName(new).persist()
delta.count()

for mode, kw in (("hash", {}), ("month", {"bucket_expr": F.col("mon")})):
    vd = f"{base}/{mode}"
    t0 = time.time()
    route_join_view_batch(fact, 0, vd, dim, ["fk"], ["dk"], **kw)
    t_init = time.time() - t0
    parts_before = {d: os.path.getmtime(f"{vd}/{d}") for d in os.listdir(vd) if d.startswith("_b=")}
    t0 = time.time()
    route_join_view_batch(delta, 1, vd, dim, ["fk"], ["dk"], **kw)
    t_batch = time.time() - t0
    parts_after = {d: os.path.getmtime(f"{vd}/{d}") for d in os.listdir(vd) if d.startswith("_b=")}
    rewritten = sum(1 for d in parts_after if parts_after[d] != parts_before.get(d))
    print(f"{mode}: init {t_init:.1f}s, delta-batch {t_batch:.1f}s, "
          f"partitions {len(parts_after)}, rewritten {rewritten}", flush=True)

print("probe_ivm done")
