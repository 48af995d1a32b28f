"""Round-13 semantic-survivors scale probe: push the LINEAR embedding
dedup face (pipeline/similarity.py::semantic_dedup_survivors) to
corpus tiers the pair face could never materialize, with the same
accounting discipline as probe_survivors_tier.py — candidate volume
per doc (must stay ≤ n_bands by construction), exact-verify volume,
end-to-end wall, and the planted degenerate-block assertion (8192
copies of the GLOBAL-MIN-id vector: every copy shares all its buckets
with id 0, so each bucket's min is 0 and all 8192 drop with
dup_of = 0, dup_cosine = 1.0 — the case plain banded LSH must cap
away, handled here by one MIN of aggregate state per bucket).

Vectors are deterministic per id (per-row seeded standard normals,
Arrow-batched), so reruns measure the same corpus.

Usage: python scripts/probe_semantic_survivors.py [n_vecs]
Results recorded in BASELINE.md (round 13).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
N_BANDS = 8

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from csv_query_engine_spark.pipeline import cache_scope  # noqa: E402
from csv_query_engine_spark.pipeline import similarity as sim  # noqa: E402


@F.pandas_udf("array<float>")
def _vec(col):
    import numpy as np
    import pandas as pd

    out = []
    for i in col:
        rng = np.random.default_rng(int(i))
        out.append(rng.standard_normal(64).astype("float32"))
    return pd.Series(out)


base = spark.range(0, N_VECS, 1, 64).select(
    F.col("id").alias("vec_id"), _vec(F.col("id")).alias("embedding")
)
# 8192 copies of the id-0 vector at ids N..N+8191 (the degenerate block)
degen = spark.range(8192).select(
    (F.col("id") + N_VECS).alias("vec_id"), _vec(F.lit(0)).alias("embedding")
)
corpus = base.unionByName(degen)

print(f"== semantic survivors: {N_VECS} vecs + 8192-identical block (bands={N_BANDS})")

with cache_scope(spark):
    # --- candidate-volume accounting with the operator's own recipe
    from pyspark.storagelevel import StorageLevel

    t0 = time.time()
    buckets_udf = sim.quantized_band_buckets_udf(sim._quantized_planes(64, 64), N_BANDS)
    v = corpus.select("vec_id", buckets_udf("embedding").alias("bks")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    b = v.select("vec_id", F.posexplode("bks").alias("band", "bucket"))
    mins = b.groupBy("band", "bucket").agg(F.min("vec_id").alias("cand"))
    cand = (
        b.join(mins, ["band", "bucket"])
        .filter(F.col("cand") < F.col("vec_id"))
        .select("vec_id", "cand")
        .distinct()
    )
    n_cand = cand.count()
    n_docs = v.count()
    print(
        f"   accounting: {n_cand} candidate pairs over {n_docs} docs "
        f"= {n_cand / n_docs:.2f}/doc (bound {N_BANDS}) [{time.time() - t0:.1f}s]"
    )
    v.unpersist()

with cache_scope(spark):
    # --- end to end
    t0 = time.time()
    out = sim.semantic_dedup_survivors(corpus, threshold=0.92, n_bands=N_BANDS)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_dup").cast("long")).alias("dups"),
        F.sum(
            ((F.col("vec_id") >= N_VECS) & F.col("is_dup") & (F.col("dup_of") == 0)).cast(
                "long"
            )
        ).alias("block_resolved"),
    ).collect()[0]
    wall = time.time() - t0
    print(
        f"   end-to-end: {agg['n']} verdicts, {agg['dups']} dups, "
        f"block resolved {agg['block_resolved']}/8192 [{wall:.1f}s]"
    )
    assert agg["block_resolved"] == 8192, "degenerate block must resolve to id 0"

spark.stop()
