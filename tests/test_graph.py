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


def test_triangle_count_known_graph(spark):
    """K4 on {0..3} plus a pendant edge (3,4): K4 has 4 triangles, each
    node of K4 sits in exactly 3 of them, the pendant node in none."""
    from itertools import combinations

    from csv_query_engine_spark.operators.graph import triangle_count

    pairs = list(combinations(range(4), 2)) + [(3, 4)]
    edges = spark.createDataFrame(pairs, "x long, y long")
    rows = {r["node"]: r["tri_count"] for r in triangle_count(edges).collect()}
    assert rows == {0: 3, 1: 3, 2: 3, 3: 3}
    assert sum(rows.values()) // 3 == 4


def test_triangle_count_skew_hub_and_brute_force(spark):
    """Hub-and-ring graph vs a brute-force reference: the degree-ordered
    orientation must not change counts, only bound the wedge join."""
    from itertools import combinations

    from csv_query_engine_spark.operators.graph import triangle_count

    n = 24
    ring = [(i, (i + 1) % n) for i in range(n)]
    hub = [(i, n) for i in range(n)]  # node n connected to everyone
    pairs = sorted({(min(a, b), max(a, b)) for a, b in ring + hub})
    adj = set(pairs)
    expect: dict[int, int] = {}
    for a, b, c in combinations(range(n + 1), 3):
        if ((a, b) in adj) and ((b, c) in adj) and ((a, c) in adj):
            for v in (a, b, c):
                expect[v] = expect.get(v, 0) + 1
    edges = spark.createDataFrame(pairs, "x long, y long").repartition(7)
    rows = {r["node"]: r["tri_count"] for r in triangle_count(edges).collect()}
    assert rows == expect


def _ref_pagerank_dangling(edges, iterations=4, damping=0.85):
    """Pure-Python mirror of pagerank() including dangling
    redistribution, with the identical FLOOR quantization."""
    import math
    from collections import Counter

    srcs = {s for s, _ in edges}
    nodes = sorted(srcs | {d for _, d in edges})
    n = len(nodes)
    deg = Counter(s for s, _ in edges)

    def q(x):
        return math.floor(x * 1e9 + 0.5)

    r = {v: q(1.0 / n) for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(iterations):
        cs = {v: 0 for v in nodes}
        for s, d in edges:
            cs[d] += q((r[s] / 1e9) / deg[s])
        du = sum(r[v] for v in nodes if v not in srcs)
        dsh = q((du / 1e9) / n)
        r = {v: q(base + damping * ((cs[v] + dsh) / 1e9)) for v in nodes}
    return {v: r[v] / 1e9 for v in nodes}


def test_dangling_mass_redistributed_on_sink_graph(spark):
    """Directed chain into a sink plus a feeder star: without the
    dangling term the sink's mass would leak every round and total rank
    would decay; with it, mass is conserved and the Spark ranks equal
    the quantized pure-Python reference bit-for-bit."""
    edges = [(0, 1), (1, 2), (3, 2), (4, 2), (0, 2)]  # node 2: pure sink
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["pagerank"] for r in pagerank(df, iterations=5).collect()}
    want = _ref_pagerank_dangling(edges, iterations=5)
    assert got == want
    assert abs(sum(got.values()) - 1.0) < 1e-6, sum(got.values())
    # isolated-source nodes (3, 4: no in-edges) still receive base +
    # dangling share, never drop out of the rank table
    assert got[3] == got[4] > 0


def test_dangling_noop_on_symmetrized_graph(spark):
    """On a graph with no sinks the dangling term is exactly zero:
    ranks must equal the pre-redistribution reference (mass-conserved
    star results from test_rank_mass_conserved_and_hub_wins)."""
    pairs = [(0, i) for i in range(1, 10)]
    edges = _sym_edges(spark, pairs)
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    got = {r["node"]: r["pagerank"] for r in pagerank(edges, iterations=6).collect()}
    assert got == _ref_pagerank_dangling(sym, iterations=6)


def test_source_only_nodes_keep_constant_base_rank(spark):
    """Sink-free graph WITH source-only nodes (a root feeding a cycle):
    the fused fast path must still emit the root with its constant
    base rank and flow its contribution downstream — matching the
    dangling-aware pure-Python reference exactly."""
    edges = [(0, 1), (1, 0), (2, 0), (2, 1)]  # node 2: out-edges, no in-edges
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["pagerank"] for r in pagerank(df, iterations=5).collect()}
    want = _ref_pagerank_dangling(edges, iterations=5)
    assert got == want
    assert 2 in got and got[2] > 0


def test_bfs_khop_min_distance_and_cap(spark):
    """Planted chain + shortcut: minimum distance wins (node reached at
    2 via shortcut, not 3 via chain), unreached nodes are absent, the
    hop cap truncates, and disconnected seeds count at dist 0."""
    from csv_query_engine_spark.operators.graph import bfs_khop

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 9), (9, 3), (7, 8)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,), (42,)], "node long")
    got = {r["node"]: r["dist"] for r in bfs_khop(edges, seeds, max_hops=3).collect()}
    assert got == {0: 0, 42: 0, 1: 1, 9: 1, 2: 2, 3: 2, 4: 3}
    capped = {r["node"]: r["dist"] for r in bfs_khop(edges, seeds, max_hops=2).collect()}
    assert capped == {0: 0, 42: 0, 1: 1, 9: 1, 2: 2, 3: 2}
