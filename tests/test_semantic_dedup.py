"""pipeline/similarity.py::semantic_dedup_pairs (SemDeDup): planted
paraphrases at a realistic threshold must be recalled, unrelated pairs
must not surface, and the plan must keep the scale properties (cached
dims feeding k-means AND the pair join, broadcast centroid join, no
cartesian product). Cross-engine exactness vs the nested k-means +
pair-join DuckDB twin is covered by test_queries_oracle.py
(dedup_semantic_pairs, verified at sf0.001/0.01/0.1)."""

from __future__ import annotations

import math

import pytest

from csv_query_engine_spark.pipeline.similarity import semantic_dedup_pairs


def _unit(vec):
    n = math.sqrt(sum(x * x for x in vec)) or 1.0
    return [x / n for x in vec]


@pytest.fixture(scope="module")
def planted(spark):
    """3 well-separated blobs of 20 vectors each in 64-dim, plus two
    planted paraphrase pairs (ids 900/901 and 902/903: tiny
    perturbations, cosine > 0.99) and one anti-pair (904 vs 905:
    orthogonal axes, cosine ~ 0)."""
    import hashlib

    def h(i, d):
        return (
            int.from_bytes(hashlib.md5(f"{i}:{d}".encode()).digest()[:4], "big")
            / float(1 << 31)
            - 1.0
        )

    rows = []
    for blob in range(3):
        center = [3.0 if d == blob * 20 else h(blob, d) * 0.1 for d in range(64)]
        for i in range(20):
            vid = blob * 100 + i
            vec = [c + h(vid, d) * 0.3 for d, c in enumerate(center)]
            rows.append((vid, _unit(vec)))
    base = [1.0 if d < 8 else 0.01 for d in range(64)]
    rows.append((900, _unit(base)))
    rows.append((901, _unit([x + 0.001 * ((d % 3) - 1) for d, x in enumerate(base)])))
    base2 = [1.0 if 30 <= d < 38 else -0.01 for d in range(64)]
    rows.append((902, _unit(base2)))
    rows.append((903, _unit([x - 0.001 * (d % 2) for d, x in enumerate(base2)])))
    rows.append((904, _unit([1.0 if d == 50 else 0.0 for d in range(64)])))
    rows.append((905, _unit([1.0 if d == 60 else 0.0 for d in range(64)])))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_planted_paraphrases_recalled(planted):
    pairs = {
        (r["vec_id_a"], r["vec_id_b"]): r["cos_sim"]
        for r in semantic_dedup_pairs(planted, k=6, threshold=0.92).collect()
    }
    assert (900, 901) in pairs, "planted paraphrase pair missed"
    assert (902, 903) in pairs, "planted paraphrase pair missed"
    assert pairs[(900, 901)] > 0.99
    assert pairs[(902, 903)] > 0.99
    assert (904, 905) not in pairs, "orthogonal pair wrongly flagged"


def test_threshold_filters_and_ordering(planted):
    out = semantic_dedup_pairs(planted, k=6, threshold=0.92).collect()
    assert all(r["cos_sim"] >= 0.92 for r in out)
    assert all(r["vec_id_a"] < r["vec_id_b"] for r in out)
    keys = [(r["cluster_id"], r["vec_id_a"], r["vec_id_b"]) for r in out]
    assert keys == sorted(keys)


def test_within_blob_pairs_share_cluster(planted):
    """At a loose threshold, same-blob vectors surface and every pair's
    cluster_id is by construction shared — the bucketing invariant: a
    pair can only be emitted from inside one cluster."""
    out = semantic_dedup_pairs(planted, k=6, threshold=0.5).collect()
    assert len(out) > 10
    # all planted blob members are mutually similar well above 0.5:
    # each surfaced pair must come from one cluster (single cluster_id
    # per row is structural; spot-check blob 0 pairs exist)
    blob0 = [r for r in out if r["vec_id_a"] < 100 and r["vec_id_b"] < 100]
    assert len(blob0) > 5


def test_plan_scale_properties(planted):
    df = semantic_dedup_pairs(planted, k=6, threshold=0.92)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, "dims/assign cache not in plan"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------- semantic_dedup_survivors (round 13, linear face)


@pytest.fixture(scope="module")
def with_copies(spark, planted):
    """The planted corpus plus EXACT copies of ids 0, 101 and 904 at
    +10000 — the dedup scenario the verdict face exists for.  The copy
    of id 0 is the deterministic anchor: 0 is the GLOBAL min id, so
    every bucket holding the copy also holds id 0 and the bucket min
    IS the matching source (cosine exactly 1.0 after scale-6
    quantization of identical coordinates)."""
    from pyspark.sql import functions as F

    copies = planted.filter(F.col("vec_id").isin(0, 101, 904)).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    return planted.unionAll(copies)


def test_survivors_verdict_spine_and_sentinels(with_copies):
    from csv_query_engine_spark.pipeline import cache_scope
    from csv_query_engine_spark.pipeline.similarity import semantic_dedup_survivors

    with cache_scope(with_copies.sparkSession):
        rows = semantic_dedup_survivors(with_copies, threshold=0.92).collect()
    assert len(rows) == with_copies.count(), "one verdict row per input vector"
    for r in rows:
        if r["is_dup"]:
            assert r["dup_of"] < r["vec_id"], "dup_of is a smaller-id bucket min"
            assert r["dup_cosine"] >= 0.92
        else:
            assert r["dup_of"] == -1 and r["dup_cosine"] == -1.0


def test_survivors_copy_of_global_min_always_drops(with_copies):
    from csv_query_engine_spark.pipeline import cache_scope
    from csv_query_engine_spark.pipeline.similarity import semantic_dedup_survivors

    with cache_scope(with_copies.sparkSession):
        verdicts = {
            r["vec_id"]: r
            for r in semantic_dedup_survivors(with_copies, threshold=0.92).collect()
        }
    anchor = verdicts[10000]  # copy of the global-min id
    assert anchor["is_dup"] and anchor["dup_of"] == 0 and anchor["dup_cosine"] == 1.0
    # the source itself survives (nothing smaller can match it)
    assert not verdicts[0]["is_dup"]


def test_survivor_clusters_resolve_semantic_verdicts(with_copies):
    """The dup_of pointer forest is the same shape minhash survivors
    emit, so dedup.survivor_clusters resolves semantic chains too."""
    from csv_query_engine_spark.pipeline.dedup import survivor_clusters
    from csv_query_engine_spark.pipeline.similarity import semantic_dedup_survivors

    from csv_query_engine_spark.pipeline import cache_scope

    with cache_scope(with_copies.sparkSession):
        v = semantic_dedup_survivors(with_copies, threshold=0.92)
        roots = {
            r["vec_id"]: r["cluster_root"]
            for r in survivor_clusters(v, id_col="vec_id").collect()
        }
    assert roots[10000] == 0
    assert roots[0] == 0


def test_survivors_plan_scale_properties(with_copies):
    from csv_query_engine_spark.pipeline.similarity import semantic_dedup_survivors

    df = semantic_dedup_survivors(with_copies, threshold=0.92)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, "vector table cache not in plan"
    assert "CartesianProduct" not in plan
