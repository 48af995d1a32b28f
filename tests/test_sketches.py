"""pipeline/sketches.py: the Misra-Gries heavy-hitter guarantee must
hold under adversarial partitioning, summaries must stay bounded, and
the verified output must equal the exact answer (the oracle query test
covers the documents-table twin; these cover the algorithm)."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_query_engine_spark.pipeline.sketches import _mg_summaries, heavy_hitters


def _docs(spark, texts, parts=None):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return df.repartition(parts) if parts else df


def _exact_hh(spark, df, k):
    toks = df.select(F.explode(F.split(F.lower("text"), " ")).alias("token")).filter(
        F.col("token") != ""
    )
    n = toks.count()
    return {
        (r["token"], r["n_occ"])
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
        .filter(F.col("n_occ") > n // k)
        .collect()
    }


def test_planted_heavy_key_survives_adversarial_partitioning(spark):
    """A key just over N/k, scattered across many partitions so no
    single partition sees it concentrated, must still surface — the
    additive-counts argument (globally heavy => locally heavy in >= 1
    partition) is exactly what this pins."""
    # 64 docs: every doc carries one "hot" + 15 unique fillers
    texts = [
        "hot " + " ".join(f"w{i}x{j}" for j in range(15)) for i in range(64)
    ]
    df = _docs(spark, texts, parts=16)
    # N = 64·16 = 1024 tokens; hot count 64 > N/32 = 32 => heavy at k=32
    got = {r["token"] for r in heavy_hitters(df, k=32).collect()}
    assert "hot" in got
    assert got == {t for t, _ in _exact_hh(spark, df, 32)}


def test_output_equals_exact_answer_with_counts(spark):
    """Zipf-ish corpus: verified output (tokens AND counts) must equal
    the exact GROUP BY/HAVING answer for several k."""
    words = []
    for i in range(40):
        words += [f"w{i}"] * (200 // (i + 1))  # ~harmonic frequencies
    texts = [" ".join(words[i::8]) for i in range(8)]
    df = _docs(spark, texts, parts=8)
    for k in (4, 16, 64):
        got = {(r["token"], r["n_occ"]) for r in heavy_hitters(df, k=k).collect()}
        assert got == _exact_hh(spark, df, k), k


def test_summary_rows_bounded_per_partition(spark):
    """Each partition's MG summary must emit <= k candidate rows plus
    exactly one total row — the O(k) state contract that makes pass 1
    map-only at any corpus size."""
    import pandas as pd

    k = 8
    batches = [
        pd.DataFrame({"token": [f"t{i % 50}" for i in range(j, j + 500)]})
        for j in range(0, 2000, 500)
    ]
    out = list(_mg_summaries(k)(iter(batches)))
    assert len(out) == 1
    pdf = out[0]
    assert len(pdf) <= k + 1
    totals = pdf[pdf["token"].isnull()]
    assert len(totals) == 1 and int(totals["n_part"].iloc[0]) == 2000
    # MG undercount bound: every surviving counter <= true count
    import collections

    true = collections.Counter(t for b in batches for t in b["token"])
    for _, row in pdf[pdf["token"].notnull()].iterrows():
        assert row["n_part"] <= true[row["token"]]


def test_kmeans_deterministic_across_partitionings(spark):
    """Integer distances + FLOOR centroid updates must make the full
    clustering bit-identical under different physical partitionings —
    the property float k-means cannot give (partition-order float
    sums)."""
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.pipeline.similarity import kmeans_clusters

    e = load_tables(spark, "/root/testdata/sf0.001", ("embeddings",), register=False)[
        "embeddings"
    ]
    r1 = sorted(map(tuple, kmeans_clusters(e.repartition(16), k=5, iterations=2).collect()))
    spark.catalog.clearCache()
    r2 = sorted(map(tuple, kmeans_clusters(e.repartition(3), k=5, iterations=2).collect()))
    spark.catalog.clearCache()
    assert r1 == r2 and len(r1) == 500


def test_kmeans_matches_numpy_replay(spark):
    """Full-algorithm lock: replay seeds (md5-hash order), scale-6
    quantization, integer distances with lowest-cid tie-break, and
    FLOOR-mean centroid updates in numpy — assignments AND distances
    must match bit-for-bit."""
    import hashlib
    import math

    import numpy as np

    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.pipeline.similarity import kmeans_clusters

    k, iters = 4, 2
    e = load_tables(spark, "/root/testdata/sf0.001", ("embeddings",), register=False)[
        "embeddings"
    ]
    rows = e.collect()
    ids = [r["vec_id"] for r in rows]
    X = np.stack([
        np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1e6 + 0.5)
        for r in rows
    ]).astype(np.int64)

    def h(i):
        return int(hashlib.md5(f"km-{i}".encode()).hexdigest()[:8], 16)

    seed_ids = sorted(ids, key=lambda i: (h(i), i))[:k]
    row_of = {v: i for i, v in enumerate(ids)}
    C = X[[row_of[v] for v in seed_ids]].copy()

    def assign(C):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)  # N × k
        cid = d.argmin(axis=1)  # argmin ties -> lowest index, matching
        return cid, d[np.arange(len(X)), cid]

    for _ in range(iters):
        cid, _ = assign(C)
        for c in range(k):
            m = X[cid == c]
            if len(m):
                C[c] = np.floor(m.sum(axis=0) / len(m) + 0.5).astype(np.int64)
    cid, dist = assign(C)
    want = {ids[i]: (int(cid[i]), int(dist[i])) for i in range(len(ids))}

    got = {
        r["vec_id"]: (r["cluster_id"], r["sq_dist_units"])
        for r in kmeans_clusters(e, k=k, iterations=iters).collect()
    }
    assert got == want


def test_hll_rollup_merge_identity_and_error_bound(spark):
    """Unioning per-day HLL sketch state must estimate the same set as
    one direct global sketch (merge identity, same lgK), and both must
    sit within the HLL error envelope of the exact distinct count."""
    from pyspark.sql import functions as F

    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.queries import REGISTRY, _load

    _load()
    got = {
        r["event_type"]: r
        for r in REGISTRY["sketch_user_rollup"][0](spark, "/root/testdata/sf0.01").collect()
    }
    e = load_tables(spark, "/root/testdata/sf0.01", ("events",))["events"]
    direct = {
        r["event_type"]: r["est"]
        for r in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("est"))
        .collect()
    }
    exact = {
        r["event_type"]: r["u"]
        for r in e.groupBy("event_type").agg(F.count_distinct("user_id").alias("u")).collect()
    }
    assert set(got) == set(exact)
    for k, row in got.items():
        assert row["n_days"] >= 1
        # merge identity: union-of-days == direct sketch (same lgK 12)
        assert abs(row["approx_users"] - direct[k]) <= max(1, 0.005 * direct[k]), k
        # HLL error envelope at lgK=12: ~1.6% rse; allow 4 sigma
        assert abs(row["approx_users"] - exact[k]) <= max(3, 0.065 * exact[k]), (
            k, row["approx_users"], exact[k],
        )


def test_hll_overlap_identity_and_disjoint(spark):
    from csv_query_engine_spark.pipeline.sketches import hll_overlap

    a = spark.range(0, 2000).select(F.col("id").cast("string").alias("k"))
    # identical sets: union == both estimates, jaccard == 1e6 exactly
    row = hll_overlap(a, a, "k").collect()[0]
    assert row["est_a"] == row["est_b"] == row["est_union"]
    assert row["est_intersection"] == row["est_a"]
    assert row["jaccard_ppm"] == 1_000_000
    # estimate within HLL's expected error (~1.04/sqrt(256) ≈ 6.5%; 4σ)
    assert abs(row["est_a"] - 2000) / 2000 < 0.26

    # disjoint sets: intersection estimate near zero relative to union
    b = spark.range(10_000, 12_000).select(F.col("id").cast("string").alias("k"))
    row2 = hll_overlap(a, b, "k").collect()[0]
    assert row2["est_union"] >= max(row2["est_a"], row2["est_b"])
    assert row2["est_intersection"] <= 0.2 * row2["est_union"]
    assert row2["jaccard_ppm"] <= 200_000


def test_hll_overlap_union_is_register_max_merge(spark):
    """The 'u' estimate must equal hll_distinct over the concatenated
    keys — MAX over combined rows IS the register merge (the property
    the SQL twin relies on)."""
    from csv_query_engine_spark.pipeline.sketches import hll_distinct, hll_overlap

    a = spark.range(0, 1500).select(F.col("id").cast("string").alias("k"))
    b = spark.range(1000, 2500).select(F.col("id").cast("string").alias("k"))
    row = hll_overlap(a, b, "k").collect()[0]
    u = (
        hll_distinct(
            a.unionAll(b).select(F.lit("u").alias("g"), "k"), "k", "g"
        )
        .collect()[0]["hll_estimate"]
    )
    assert row["est_union"] == u
