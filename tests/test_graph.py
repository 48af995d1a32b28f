"""operators/graph.py PageRank properties: rank-mass conservation,
hub dominance, and repeat-run determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_query_engine_spark.operators.graph import pagerank


def _sym_edges(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    return df.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        df.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def test_rank_mass_conserved_and_hub_wins(spark):
    # star: node 0 connected to 1..9 — the hub must dominate
    edges = _sym_edges(spark, [(0, i) for i in range(1, 10)])
    rows = {r["node"]: r["pagerank"] for r in pagerank(edges, iterations=6).collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-6, sum(rows.values())
    assert rows[0] > max(v for k, v in rows.items() if k != 0) * 3
    leaf_ranks = {v for k, v in rows.items() if k != 0}
    assert len(leaf_ranks) == 1, "symmetric leaves must tie exactly"


def test_deterministic_across_runs_and_partitionings(spark):
    pairs = [(i, (i * 7 + 1) % 50) for i in range(50) if i != (i * 7 + 1) % 50]
    e1 = _sym_edges(spark, pairs).repartition(16)
    e2 = _sym_edges(spark, pairs).repartition(3)
    r1 = sorted(map(tuple, pagerank(e1).collect()))
    r2 = sorted(map(tuple, pagerank(e2).collect()))
    assert r1 == r2, "fixed-point rounding must make ranks partitioning-independent"
