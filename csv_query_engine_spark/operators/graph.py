"""Iterative PageRank (power method) with cross-engine-exact arithmetic.

The second iterative-graph operator family next to connected components
(pipeline/dedup.py): rank flows along edges for a FIXED number of power
iterations.  Unlike CC's data-dependent convergence loop, the fixed
unroll is deterministic by construction, which makes the whole
algorithm ORACLE-PAIRABLE: :func:`sql_pagerank` emits the identical
computation as unrolled SQL CTEs, and every iteration keeps the two
engines bit-equal by

- carrying rank state as UNSCALED LONGS at scale 9 and doing every
  per-step quantization as pure IEEE arithmetic — FLOOR(x·10⁹ + 0.5)
  — never an engine ROUND function (Spark's round goes through
  BigDecimal string rounding while DuckDB rounds the scaled double;
  at ~10⁵ roundings per run the two disagree on boundary values
  systematically — measured: 826/30k node ranks off by 1e-9 at sf0.1
  with per-step ROUND, zero with the FLOOR form), and
- summing the quantized contributions as longs (exact,
  partition-order-independent).

Scale: degrees and contributions are partial+final aggregates on the
edge key; each iteration is one join (edges × ranks, both partitioned
on the node key — AQE reuses the exchange) + one aggregation.  Rank
state is bounded (one row per node), and with a FIXED small iteration
count the plan grows linearly — no self-referencing join doubling, so
the per-round localCheckpoint rule for convergence loops
(dedup.connected_components) is not needed here; the bounded unroll is
the documented contract.

Edges must be directed and deduplicated; every node must have at least
one out-edge (symmetrized graphs satisfy this — dangling-mass
redistribution is out of scope and documented)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def pagerank(edges: DataFrame, iterations: int = 4, damping: float = 0.85) -> DataFrame:
    """(node, pagerank) after `iterations` power steps over directed
    `edges` (src, dst).  The edge+degree table feeds every iteration —
    persisted once (CLAUDE.md multi-consumer rule)."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = edges.select(F.col("src").alias("node")).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n = nodes.count()  # bounded driver scalar: one long

    def quant(x):  # FLOOR(x*1e9 + 0.5): IEEE-only scale-9 quantization
        return F.floor(x * F.lit(1e9) + F.lit(0.5))

    # rank state: unscaled long at scale 9 ("_ru")
    r = nodes.select("node", quant(F.lit(1.0) / F.lit(float(n))).alias("_ru"))
    base = F.lit(1.0 - damping) / F.lit(float(n))
    for _ in range(iterations):
        contrib = e.join(r, e["src"] == r["node"]).select(
            F.col("dst"),
            quant((F.col("_ru") / F.lit(1e9)) / F.col("deg")).alias("_cu"),
        )
        r = contrib.groupBy(F.col("dst").alias("node")).agg(
            quant(base + F.lit(damping) * (F.sum("_cu") / F.lit(1e9))).alias("_ru")
        )
    return r.select("node", (F.col("_ru") / F.lit(1e9)).alias("pagerank"))


def sql_pagerank(
    pairs_cte: str, iterations: int = 4, damping: float = 0.85
) -> str:
    """DuckDB twin: the same fixed power iteration unrolled into CTEs.
    `pairs_cte` must define a relation ``pairs(c, s)`` of distinct
    undirected node pairs; edges are its symmetrization."""
    d = repr(damping)
    its = []
    prev = "r0"
    for i in range(1, iterations + 1):
        its.append(
            f"""r{i} AS (
        SELECT e.dst AS node,
               CAST(FLOOR(((1 - {d}) / (SELECT n FROM nn)
                           + {d} * (CAST(SUM(CAST(FLOOR((r._ru / 1e9) / e.deg * 1e9 + 0.5)
                                                  AS BIGINT)) AS BIGINT) / 1e9))
                          * 1e9 + 0.5) AS BIGINT) AS _ru
        FROM e JOIN {prev} r ON e.src = r.node
        GROUP BY e.dst
    )"""
        )
        prev = f"r{i}"
    unrolled = ",\n    ".join(its)
    return f"""
    WITH pairs AS ({pairs_cte}),
    edges AS (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL
        SELECT s AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    e AS (SELECT edges.src, edges.dst, deg.deg
          FROM edges JOIN deg ON edges.src = deg.src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST(FLOOR(1.0 / (SELECT n FROM nn) * 1e9 + 0.5) AS BIGINT)
                   AS _ru
           FROM nodes),
    {unrolled}
    SELECT node, _ru / 1e9 AS pagerank FROM {prev} ORDER BY node
    """


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph.

    `edges` must be distinct canonical pairs (x < y), one row per edge.
    Returns (node, tri_count) for every node in >=1 triangle; each
    triangle contributes 1 to each of its three corners.

    Scale: the classic degree-ordered orientation (each edge is
    directed from its lower-(degree, id) endpoint to the higher one)
    bounds the wedge join by sum(out_degree^2) = O(m^1.5) instead of
    sum(degree^2), which is what makes triangle enumeration survive
    skewed/dense graphs — a hub of degree d contributes at most
    O(sqrt(m)) out-edges, never d.  Three equi-joins on int keys, all
    shuffle-partitioned; no cartesian products.  `edges` feeds the
    degree agg and the orientation join, and the oriented table feeds
    the wedge build (twice) plus the closing-edge probe — both persist
    once (CLAUDE.md multi-consumer rule).
    """
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    deg = (
        edges.select(F.col("x").alias("node"))
        .unionByName(edges.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Orient x->y when (deg, id) of x precedes y's; ties cannot happen
    # (the id is unique).  One join per endpoint.
    dx = deg.select(F.col("node").alias("x"), F.col("deg").alias("_dx"))
    dy = deg.select(F.col("node").alias("y"), F.col("deg").alias("_dy"))
    oriented = (
        edges.join(dx, "x")
        .join(dy, "y")
        .select(
            F.when(
                (F.col("_dx") < F.col("_dy"))
                | ((F.col("_dx") == F.col("_dy")) & (F.col("x") < F.col("y"))),
                F.struct(F.col("x").alias("u"), F.col("y").alias("v")),
            )
            .otherwise(F.struct(F.col("y").alias("u"), F.col("x").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Wedges u -> (v, w): two out-edges of u.  v != w; enumerate each
    # unordered wedge once by requiring v < w in the orientation order
    # is unnecessary — (v, w) and (w, v) both probe, so keep one side
    # by the closing edge's own orientation instead: the closing edge
    # exists exactly once as (v, w) OR (w, v) in `oriented`.
    e2 = oriented.select(F.col("u"), F.col("v").alias("w"))
    wedges = oriented.join(e2, "u").filter(F.col("v") != F.col("w"))
    closing = oriented.select(
        F.col("u").alias("v"), F.col("v").alias("w"), F.lit(1).alias("_hit")
    )
    tris = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    corners = (
        tris.select(F.col("u").alias("node"))
        .unionByName(tris.select(F.col("v").alias("node")))
        .unionByName(tris.select(F.col("w").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("tri_count"))
