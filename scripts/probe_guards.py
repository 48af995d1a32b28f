"""Round-10 guard-trigger probes (round-9 verdict #3): the 10x probes
all stayed under the degenerate thresholds by construction, so the
guard code paths were only exercised by unit fixtures.  This probe
runs the top candidate-dense operators at ~100x the sf0.1 row counts
WITH planted degenerate distributions that actually trip the guards,
and prints the accounting (the no-silent-caps rule: what was dropped,
not just what came out).

1a. minhash max_bucket ACCOUNTING at N_DOCS (default 500k) + a planted
   block of 8192 IDENTICAL docs (> max_bucket=4096, every band
   collapses to one bucket) + a 100-copy block (under the cap).
   Reports total/oversized bucket counts, rows and candidate-pairs
   dropped (computed with the operator's OWN `_band_entries`, so the
   accounting cannot drift).
1b. minhash END-TO-END assertions at PAIRS_N (default 100k): the
   8192-block emits NO pairs (dropped, by design — exact dedup is the
   right tool for mass-identical docs), the 100-block emits all
   C(100,2).  Separate tier because the template-dense synthetic
   corpus is LEGITIMATELY near-dup-dense: at 500k docs the sub-cap
   buckets admit 6.02e8 candidate pairs (measured, max surviving
   bucket 3952), and the exact-verify join over them exceeds a single
   box's spill disk — the kind of volume a 1000-executor cluster
   absorbs and local[16] cannot.  The 500k ACCOUNTING above is the
   guard evidence; this tier proves the drop/keep behavior end to end.
1c. exact-prepass accounting + LINEAR survivors (round 11): records
   the measured negative (the 500k corpus is near-dup-dense, NOT
   identical-dense — exact/signature collapse removes ~135/175 of the
   6.0e8 candidates), then runs minhash_dedup_survivors at N_DOCS end
   to end — verify volume ≤ bands×docs by construction, so the tier
   the all-pairs face cannot finish in-box completes here, with the
   planted blocks resolved exactly (8191 + 99 duplicates).
2. entity max_block_key — sf0.1 dirty records + 1500 planted records
   sharing one phone: the default cap (1000) must RAISE with the key
   and count in the message; a raised cap (4096) must complete.
3. containment at PAIRS_N — no cap exists (the prefix-filter bound is
   algorithmic), so this is a scale-behavior probe: wall time + pair
   count.

Usage: python scripts/probe_guards.py [n_docs] [pairs_n]
Results recorded in BASELINE.md (round 10).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
PAIRS_N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "48g")
    # synthetic_docs is a pushFilters() Python source (CLAUDE.md rule)
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
    .option("rows_per_partition", str(max(N_DOCS // 32, 1)))
    .load()
    .select("doc_id", "text")
)

DEGEN_TEXT = "the quick brown fox jumps over the lazy dog " * 8
SMALL_TEXT = "pack my box with five dozen liquor jugs every single day " * 6
degen = spark.range(8192).select(
    (F.col("id") + N_DOCS).alias("doc_id"), F.lit(DEGEN_TEXT).alias("text")
)
small = spark.range(100).select(
    (F.col("id") + N_DOCS + 10_000).alias("doc_id"), F.lit(SMALL_TEXT).alias("text")
)
corpus = base.unionByName(degen).unionByName(small)

# ---------------------------------------------------------- 1. minhash
print(f"== minhash max_bucket probe: {N_DOCS} docs + 8192 identical + 100 identical")
with cache_scope(spark):
    from pyspark.storagelevel import StorageLevel

    t0 = time.time()
    hashed = (
        dd._hashed_shingles(corpus, "doc_id", "text", 5)
        .select("id", "hashes")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sig = dd._oph_signatures(hashed, 64)
    be = dd._band_entries(sig, 64, 16)
    stats = (
        be.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("buckets"),
            F.sum(F.when(F.col("n") > 4096, 1).otherwise(0)).alias("oversized"),
            F.sum(F.when(F.col("n") > 4096, F.col("n"))).alias("dropped_rows"),
            F.sum(
                F.when(F.col("n") > 4096, F.col("n") * (F.col("n") - 1) / 2)
            ).alias("dropped_cand_pairs"),
        )
        .collect()[0]
    )
    t_stats = time.time() - t0
    print(
        f"  buckets={stats['buckets']} oversized={stats['oversized']} "
        f"dropped_rows={stats['dropped_rows']} "
        f"dropped_cand_pairs={stats['dropped_cand_pairs']} [{t_stats:.1f}s]"
    )
# 1b. end-to-end drop/keep assertions at the single-box tier (see
# module docstring: the 500k sub-cap candidate volume — 6.02e8 pairs
# measured — exceeds local spill disk in the exact-verify join; the
# accounting above is the 500k guard evidence).
print(f"== minhash end-to-end drop/keep assertions: {PAIRS_N} docs + planted blocks")
pairs_base = (
    spark.read.format("synthetic_docs")
    .option("n_docs", str(PAIRS_N))
    .option("rows_per_partition", str(max(PAIRS_N // 32, 1)))
    .load()
    .select("doc_id", "text")
)
pairs_corpus = pairs_base.unionByName(degen).unionByName(small)
with cache_scope(spark):
    t0 = time.time()
    pairs = dd.minhash_lsh_pairs(pairs_corpus, threshold=0.5).persist()
    n_pairs = pairs.count()
    t_pairs = time.time() - t0
    n_degen = pairs.filter(
        (F.col("id_a") >= N_DOCS) & (F.col("id_a") < N_DOCS + 8192)
    ).count()
    n_small = pairs.filter(F.col("id_a") >= N_DOCS + 10_000).count()
    print(
        f"  emitted_pairs={n_pairs} [{t_pairs:.1f}s]  "
        f"degen_block_pairs={n_degen} (expect 0: dropped by max_bucket)  "
        f"small_block_pairs={n_small} (expect {100 * 99 // 2})"
    )
    assert n_degen == 0, "oversized block leaked pairs"
    assert n_small == 100 * 99 // 2, "under-cap block lost pairs"

# --------------------- 1c. exact-prepass accounting + LINEAR survivors
# Round-11 (round-10 verdict #2 investigated): the verdict hypothesized
# the 500k spill came from mass-identical blocks exact dedup removes.
# MEASURED FALSE: the raw 500k corpus has 499,865 unique normalized
# texts (135 within-group pairs) and 499,826 unique OPH signatures
# (175) — the 6.0e8 sub-cap candidates are GENUINE template near-dups,
# i.e. the all-pairs OUTPUT is itself quadratic-dense and no prepass
# linearizes it.  The exact-prepass accounting below records that
# honest negative; the tier that DOES finish in-box at 500k is
# minhash_dedup_survivors — greedy bucket-min verdicts with verify
# volume ≤ bands×docs by construction (linear, cap-free).
print(f"== exact-prepass accounting: {N_DOCS} docs + 8192 identical + 100 identical")
with cache_scope(spark):
    t0 = time.time()
    _, groups = dd.minhash_dedup_funnel(corpus, threshold=0.5)
    groups = groups.persist()
    n_groups = groups.count()
    n_docs_total = corpus.count()
    degen_g = groups.filter(F.col("n_copies") >= 8192).count()
    print(
        f"  docs={n_docs_total} unique_texts={n_groups} "
        f"exact_collapsed={n_docs_total - n_groups} blocks>=8192: {degen_g} "
        f"[{time.time() - t0:.1f}s]"
    )
    assert degen_g >= 1, "planted identical block did not collapse"
    groups.unpersist()

print(f"== LINEAR survivors end-to-end: {N_DOCS} docs + planted blocks")
with cache_scope(spark):
    t0 = time.time()
    verdicts = dd.minhash_dedup_survivors(corpus, threshold=0.5).persist()
    n_total = verdicts.count()
    n_dups = verdicts.filter(F.col("is_dup")).count()
    t_v = time.time() - t0
    # the 8192-identical block that plain LSH CAP-DROPS is resolved
    # exactly here: 8191 members marked duplicates of the block min
    degen_dups = verdicts.filter(
        (F.col("doc_id") > N_DOCS) & (F.col("doc_id") < N_DOCS + 8192) & F.col("is_dup")
    ).count()
    small_dups = verdicts.filter(
        (F.col("doc_id") > N_DOCS + 10_000) & F.col("is_dup")
    ).count()
    print(
        f"  verdicts={n_total} dups={n_dups} degen_block_dups={degen_dups} "
        f"(expect 8191) small_block_dups={small_dups} (expect 99) [{t_v:.1f}s]"
    )
    assert degen_dups == 8191, "identical block not fully collapsed"
    assert small_dups == 99, "small block not fully collapsed"
    # cluster face at the same tier: pointer-jumping root resolution
    t0 = time.time()
    clusters = dd.survivor_clusters(verdicts)
    n_roots = clusters.filter(~F.col("is_dup")).count()
    degen_roots = clusters.filter(
        (F.col("doc_id") >= N_DOCS) & (F.col("doc_id") < N_DOCS + 8192)
    ).select("cluster_root").distinct().collect()
    print(
        f"  clusters: survivors={n_roots} degen_block_roots={[r[0] for r in degen_roots]} "
        f"(expect [{N_DOCS}]) [{time.time() - t0:.1f}s]"
    )
    assert [r[0] for r in degen_roots] == [N_DOCS]
    verdicts.unpersist()

# ----------------------------------------------------------- 2. entity
print("== entity max_block_key probe: sf0.1 dirty records + 1500 shared-phone")
from csv_query_engine_spark.pipeline.entity import (  # noqa: E402
    entity_match_pairs,
    synthetic_entity_records,
)

cust = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
recs = synthetic_entity_records(cust)
mass = spark.range(1500).select(
    (F.col("id") + 10_000_000).alias("rec_id"),
    F.concat(F.lit("massrecord"), F.col("id").cast("string")).alias("name"),
    F.lit("0-0000000").alias("phone"),
    (F.col("id") % 25).cast("int").alias("city"),
    F.lit("BUILDING").alias("segment"),
    (F.col("id") * 13).alias("bal_cents"),
)
planted = recs.unionByName(mass)
try:
    entity_match_pairs(planted, block_dist=1, max_name_len=18).count()
    print("  ERROR: guard did not fire")
    sys.exit(1)
except Exception as e:
    msg = str(e).split("SQLSTATE")[0].strip()
    assert "max_block_key" in msg, msg
    print(f"  default cap raised as designed: {msg[:160]}")
with cache_scope(spark):
    t0 = time.time()
    n = entity_match_pairs(
        planted, block_dist=1, max_name_len=18, max_block_key=4096
    ).count()
    print(f"  raised cap (4096): completed, pairs={n} [{time.time() - t0:.1f}s]")

# ------------------------------------------------------ 3. containment
print(f"== containment scale probe: {PAIRS_N} docs (no cap — algorithmic bound)")
with cache_scope(spark):
    t0 = time.time()
    n = dd.containment_pairs(pairs_base, threshold=0.8).count()
    print(f"  pairs={n} [{time.time() - t0:.1f}s]")

print("probe_guards: all assertions passed")
