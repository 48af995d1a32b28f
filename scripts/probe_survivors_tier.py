"""Round-12 survivors-tier probe (round-11 verdict #7): push the LINEAR
dedup face one magnitude past the round-11 tier (508k in 68 s) and
record WHICH stage hits the wall first — the bucket-MIN aggregate, the
candidate join, or the exact-verify join — with verify-volume
accounting (the no-silent-caps rule applied to the repo's own scale
claims).

Stages timed with the operator's OWN internals (`_hashed_shingles` /
`_oph_signatures` / `_band_entries`), so the accounting cannot drift
from the operator, then the operator runs END TO END at the same tier
with the planted-block assertions from probe_guards.py.

Usage: python scripts/probe_survivors_tier.py [n_docs]
Results recorded in BASELINE.md (round 12).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

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

print(f"== survivors stage accounting: {N_DOCS} docs + 8192 identical")
with cache_scope(spark):
    from pyspark.storagelevel import StorageLevel

    t0 = time.time()
    hashed = (
        dd._hashed_shingles(corpus, "doc_id", "text", 5)
        .select("id", "hashes")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_docs = hashed.count()
    t_shingle = time.time() - t0

    t0 = time.time()
    sig = dd._oph_signatures(hashed, 64).persist(StorageLevel.MEMORY_AND_DISK)
    sig.count()
    t_sig = time.time() - t0

    t0 = time.time()
    be = dd._band_entries(sig, 64, 16).persist(StorageLevel.MEMORY_AND_DISK)
    n_band_rows = be.count()
    mins = be.groupBy("band", "bucket").agg(F.min("id").alias("cand"))
    n_buckets = mins.count()
    t_minagg = time.time() - t0

    t0 = time.time()
    cand = (
        be.join(mins, ["band", "bucket"])
        .filter(F.col("id") != F.col("cand"))
        .select("id", "cand")
        .distinct()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_cand = cand.count()
    t_cand = time.time() - t0

    t0 = time.time()
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("double") / F.lit(64.0)
    screened = (
        cand.join(sig.select(F.col("id"), F.col("sig").alias("sig_a")), "id")
        .join(sig.select(F.col("id").alias("cand"), F.col("sig").alias("sig_b")), "cand")
        .filter(est >= F.lit(0.35))
        .select("id", "cand")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_screened = screened.count()
    t_screen = time.time() - t0

    t0 = time.time()
    n_verified = (
        screened.join(hashed.select(F.col("id"), F.col("hashes").alias("h_a")), "id")
        .join(hashed.select(F.col("id").alias("cand"), F.col("hashes").alias("h_b")), "cand")
        .select(dd.jaccard(F.col("h_a"), F.col("h_b")).alias("j"))
        .filter(F.col("j") >= 0.5)
        .count()
    )
    t_verify = time.time() - t0

    print(
        f"  docs={n_docs} band_rows={n_band_rows} buckets={n_buckets}\n"
        f"  candidates={n_cand} (bound {16 * n_docs}; "
        f"{n_cand / n_docs:.2f}/doc) screened={n_screened} verified={n_verified}\n"
        f"  stage walls: shingle+hash {t_shingle:.1f}s | signatures {t_sig:.1f}s | "
        f"band+minagg {t_minagg:.1f}s | cand join {t_cand:.1f}s | "
        f"est screen {t_screen:.1f}s | exact verify {t_verify:.1f}s"
    )
    assert n_cand <= 16 * n_docs, "candidate volume exceeded the linear bound"

print(f"== survivors END-TO-END: {N_DOCS} docs + 8192 identical")
with cache_scope(spark):
    t0 = time.time()
    verdicts = dd.minhash_dedup_survivors(corpus, threshold=0.5).persist()
    n_total = verdicts.count()
    n_dups = verdicts.filter(F.col("is_dup")).count()
    t_v = time.time() - t0
    degen_dups = verdicts.filter(
        (F.col("doc_id") > N_DOCS) & F.col("is_dup")
    ).count()
    print(
        f"  verdicts={n_total} dups={n_dups} degen_block_dups={degen_dups} "
        f"(expect 8191) [{t_v:.1f}s]"
    )
    assert degen_dups == 8191, "identical block not fully collapsed"
    t0 = time.time()
    clusters = dd.survivor_clusters(verdicts)
    n_roots = clusters.filter(~F.col("is_dup")).count()
    print(f"  clusters: survivors={n_roots} [{time.time() - t0:.1f}s]")
    verdicts.unpersist()

print("probe_survivors_tier: all assertions passed")
