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
state is bounded (one row per node); on the sink-free fast path the
plan grows linearly (no self-referencing join doubling), and on the
dangling path — where the rank state is referenced twice per round —
it lazy-localCheckpoints each round per the CLAUDE.md
exponential-replan rule.

Edges must be directed and deduplicated.  Dangling nodes (no
out-edges — e.g. pure sinks in a directed purchase graph) are handled
with the standard uniform redistribution: each iteration adds ONE
one-row aggregate (the dangling rank mass, quantized once globally so
every node receives the identical share) broadcast into the rank
update, keeping the whole computation oracle-pairable; sink-free
graphs are detected with one bounded check and take a fused loop with
none of that machinery (bit-equal output — D = 0)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def pagerank(
    edges: DataFrame,
    iterations: int = 4,
    damping: float = 0.85,
    dangling: bool | None = None,
    source_only: bool | None = None,
) -> DataFrame:
    """(node, pagerank) after `iterations` power steps over directed
    `edges` (src, dst), with the standard dangling-mass redistribution:
    nodes = src ∪ dst, and each round the rank mass sitting on nodes
    with no out-edges is shared uniformly (quantized ONCE globally —
    `_dsh` — so every node receives the bit-identical share) inside the
    damping term: r'(v) = (1−d)/N + d·(Σ contrib(v) + D/N).  On graphs
    with no dangling nodes this reduces bit-exactly to the plain update
    (D = 0, and long + 0 cannot perturb the double division), so
    symmetrized-graph oracles are unchanged.

    The edge+degree table, the degree table (out-node set for the
    anti-join), and the node set feed every iteration — each persisted
    once (CLAUDE.md multi-consumer rule); the dangling sum is a one-row
    broadcast, never a per-round collect.

    Cost containment (measured: the general path ran the sink-free
    trade-network query 2.8 → 10.8 s warm): dangling-ness is a STATIC
    property of the edge set, so one bounded driver check picks the
    loop — sink-free graphs take the LEAN loop (identical to the
    pre-dangling operator: one join + one agg per round, linear plan,
    bit-equal output since D = 0); only genuinely sinked graphs pay
    the dangling aggregate, and there the rank state lazy-
    localCheckpoints each round because r is referenced twice per
    round (contribution join + dangling sum) and the plan would
    otherwise double per iteration (CLAUDE.md exponential-replan
    rule).

    Round-15 job-count work (guide §8 — use what you know that the
    optimizer does not; under AQE each per-round localCheckpoint plans
    eagerly at build time, so every probe/join is a real driver-visible
    job): (a) the node table carries a STATIC ``_dg`` (dangling) flag
    computed once in the setup join, so the per-round dangling mass is
    a filter+sum over the checkpointed rank state instead of an
    anti-join against the out-node set (same rows summed — int64 sums
    are order-independent, bit-equal); (b) callers may pass
    construction-derived graph knowledge: ``dangling``/``source_only``
    skip the corresponding probe jobs. ``dangling=True`` is always
    safe (the general loop is bit-equal on sink-free graphs, D = 0);
    ``dangling=False`` / ``source_only=False`` are CLAIMS and must
    hold by construction (e.g. a symmetrized edge set has neither) —
    a false claim changes results. ``None`` probes as before."""
    # Persist the INPUT edge projection first: deg, e and dsts each
    # consume it in separate jobs (their persists materialize under
    # different actions, so exchange reuse never applies) — an expensive
    # caller subtree (e.g. the orders×lineitem distinct the trade-graph
    # queries feed in) otherwise re-runs once per consumer (round-14;
    # the triangle_count input persist is the same rule).
    edges = edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    e = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    outs = deg.select(F.col("src").alias("node"))  # distinct by construction
    dsts = (
        edges.select(F.col("dst").alias("node"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # node set WITH the static dangling flag (no out-edges), computed in
    # the same setup job that materializes the node cache: the per-round
    # dangling mass then filters the checkpointed rank state instead of
    # anti-joining the out-node set every round.
    nodes = (
        outs.unionByName(dsts)
        .distinct()
        .join(outs.select("node", F.lit(1).alias("_o")), "node", "left")
        .select("node", F.col("_o").isNull().alias("_dg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()  # bounded driver scalar: one long
    # static graph property: dangling = no out-edges (needs the
    # redistribution loop). Caller-supplied knowledge skips the probe
    # job; otherwise one cached-read filter probe (no join — the flag
    # is already on the cached node table).
    has_dangling = (
        dangling
        if dangling is not None
        else nodes.filter(F.col("_dg")).limit(1).count() > 0
    )

    def quant(x):  # FLOOR(x*1e9 + 0.5): IEEE-only scale-9 quantization
        return F.floor(x * F.lit(1e9) + F.lit(0.5))

    # rank state: unscaled long at scale 9 ("_ru")
    r = nodes.select("node", quant(F.lit(1.0) / F.lit(float(n))).alias("_ru"), "_dg")
    base = F.lit(1.0 - damping) / F.lit(float(n))
    if not has_dangling:
        # FUSED loop (the fast path; measured vs the per-round node
        # left-join variant: 5.6 vs 7.3 s warm at sf0.1): the quantized
        # update fuses into the contribution aggregate, r stays one
        # groupBy output per round, plan growth is linear. Source-only
        # nodes (no in-edges) never appear in the aggregate but their
        # rank is the CONSTANT quant(base + d·0) from round 1 on — a
        # static union row, not a per-round join. The src-only probe
        # runs only on this branch: dangling graphs never consume it,
        # so they don't pay the anti-join count job; caller-supplied
        # knowledge (source_only=False for symmetrized edge sets)
        # skips it entirely.
        has_src_only = (
            source_only
            if source_only is not None
            else outs.join(dsts, "node", "left_anti").limit(1).count() > 0
        )
        src_only = (
            outs.join(dsts, "node", "left_anti").select(
                "node",
                quant(base + F.lit(damping) * (F.lit(0).cast("long") / F.lit(1e9))).alias(
                    "_ru"
                ),
            )
            if has_src_only
            else None
        )
        for _ in range(iterations):
            contrib = e.join(r, e["src"] == r["node"]).select(
                F.col("dst"),
                quant((F.col("_ru") / F.lit(1e9)) / F.col("deg")).alias("_cu"),
            )
            r = contrib.groupBy(F.col("dst").alias("node")).agg(
                quant(base + F.lit(damping) * (F.sum("_cu") / F.lit(1e9))).alias("_ru")
            )
            if src_only is not None:
                r = r.unionByName(src_only)
        return r.select("node", (F.col("_ru") / F.lit(1e9)).alias("pagerank"))
    for _ in range(iterations):
        contrib = e.join(r, e["src"] == r["node"]).select(
            F.col("dst"),
            quant((F.col("_ru") / F.lit(1e9)) / F.col("deg")).alias("_cu"),
        )
        csum = contrib.groupBy(F.col("dst").alias("node")).agg(
            F.sum("_cu").alias("_cs")
        )
        # dangling mass: filter+sum over the checkpointed rank state via
        # the static _dg flag — no per-round anti-join (same rows
        # summed; int64 sums are order-independent, bit-equal)
        dang = (
            r.filter(F.col("_dg"))
            .agg(F.coalesce(F.sum("_ru"), F.lit(0)).cast("long").alias("_du"))
            .select(
                quant((F.col("_du") / F.lit(1e9)) / F.lit(float(n))).alias("_dsh")
            )
        )
        r = (
            nodes.join(csum, "node", "left")
            .crossJoin(F.broadcast(dang))  # 1-row broadcast, not cartesian
            .select(
                "node",
                quant(
                    base
                    + F.lit(damping)
                    * (
                        (
                            F.coalesce(F.col("_cs"), F.lit(0).cast("long"))
                            + F.col("_dsh")
                        )
                        / F.lit(1e9)
                    )
                ).alias("_ru"),
                "_dg",
            )
            # truncate lineage: r is referenced twice next round
            .localCheckpoint(eager=False)
        )
    return r.select("node", (F.col("_ru") / F.lit(1e9)).alias("pagerank"))


def sql_pagerank(
    pairs_cte: str, iterations: int = 4, damping: float = 0.85
) -> str:
    """DuckDB twin: the same fixed power iteration unrolled into CTEs.
    `pairs_cte` must define a relation ``pairs(c, s)`` of distinct
    undirected node pairs; edges are its symmetrization.

    Literal hazard (measured: 6/1600 node ranks off by 1e-9 at sf0.01):
    DuckDB evaluates ``(1 - 0.85)`` in DECIMAL — exactly 0.15, whose
    double is 1 ulp BELOW Python's ``1.0 - 0.85`` — so the base term
    must be emitted as the Python-computed double literal
    (``CAST(repr(1.0 - damping) AS DOUBLE)``), matching Spark's
    ``F.lit(1.0 - damping)`` bit-for-bit; otherwise the FLOOR
    quantization flips on boundary values probabilistically."""
    d = repr(damping)
    base = repr(1.0 - damping)
    its = []
    prev = "r0"
    for i in range(1, iterations + 1):
        its.append(
            f"""r{i} AS (
        SELECT e.dst AS node,
               CAST(FLOOR((CAST({base} AS DOUBLE) / (SELECT n FROM nn)
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


def sql_pagerank_directed(
    edges_cte: str, iterations: int = 4, damping: float = 0.85
) -> str:
    """DuckDB twin of the GENERAL (dangling-aware) power iteration:
    `edges_cte` must define a relation ``dedges(src, dst)`` of distinct
    DIRECTED edges — sinks allowed.  Mirrors :func:`pagerank`
    expression-for-expression: per-round dangling sum (NOT EXISTS
    against the out-degree table) quantized once via the same FLOOR
    form, added to the per-node contribution sum inside the damping
    term over the full src ∪ dst node set.  The base term uses the
    Python-computed double literal (see :func:`sql_pagerank` — DuckDB's
    DECIMAL ``(1 - d)`` is 1 ulp off Spark's ``F.lit(1.0 - d)``)."""
    d = repr(damping)
    base = repr(1.0 - damping)
    its = []
    prev = "r0"
    for i in range(1, iterations + 1):
        its.append(
            f"""d{i} AS (
        SELECT CAST(FLOOR(((CAST(COALESCE(SUM(r._ru), 0) AS BIGINT) / 1e9)
                           / (SELECT n FROM nn)) * 1e9 + 0.5) AS BIGINT) AS dsh
        FROM {prev} r
        WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.src = r.node)
    ),
    r{i} AS (
        SELECT nd.node,
               CAST(FLOOR((CAST({base} AS DOUBLE) / (SELECT n FROM nn)
                           + {d} * ((COALESCE(c.cs, 0) + (SELECT dsh FROM d{i}))
                                    / 1e9))
                          * 1e9 + 0.5) AS BIGINT) AS _ru
        FROM nodes nd LEFT JOIN (
            SELECT e.dst AS node,
                   CAST(SUM(CAST(FLOOR((r._ru / 1e9) / e.deg * 1e9 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS cs
            FROM e JOIN {prev} r ON e.src = r.node
            GROUP BY e.dst
        ) c ON nd.node = c.node
    )"""
        )
        prev = f"r{i}"
    unrolled = ",\n    ".join(its)
    return f"""
    WITH dedges AS ({edges_cte}),
    deg AS (SELECT src, COUNT(*) AS deg FROM dedges GROUP BY src),
    e AS (SELECT dedges.src, dedges.dst, deg.deg
          FROM dedges JOIN deg ON dedges.src = deg.src),
    nodes AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM dedges UNION ALL SELECT dst FROM dedges)),
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
    # ONE pass over the triangle set: explode the three corners per row
    # instead of a 3-leg self-union — the union form re-ran the whole
    # wedge join once per leg (round-14; the wedge join is the O(m^1.5)
    # stage, so tripling it dominated the operator).
    corners = tris.select(
        F.explode(F.array(F.col("u"), F.col("v"), F.col("w"))).alias("node")
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("tri_count"))


def bfs_khop(edges: DataFrame, seeds: DataFrame, max_hops: int = 3) -> DataFrame:
    """Bounded breadth-first reachability: (node, dist) with dist = the
    MINIMUM hop count from any seed, capped at ``max_hops`` — the
    blast-radius / influence-horizon query (who is within k hops of
    this set?) that PageRank's global scores cannot answer.

    ``edges`` (src, dst) is followed as given — symmetrize first for
    undirected reach.  ``seeds``: one ``node`` column.

    Shape: frontier-at-a-time BFS — each hop is ONE join frontier→edges
    + a distinct + an anti join against the visited set, so a node is
    labeled exactly once at its first (minimum) distance and the
    per-hop work is proportional to the frontier's out-edges, never to
    paths (the path-enumeration blow-up lives only in the oracle's
    recursive CTE, which DuckDB's recursive-UNION dedup also bounds to
    nodes×hops).  With small fixed max_hops the loop unrolls into one
    plan (the 4-iteration PageRank precedent — no per-round
    checkpointing needed at this depth; checkpoint per round if you
    raise max_hops past ~6, the CC lesson).

    Scale: every join keys on the node id; the visited set is one row
    per reached node; nothing is ever collected.

    Every per-hop table persists LAZILY (round-14): ``visited`` and
    ``frontier`` are each referenced twice per hop (the anti join + the
    union / the next hop's join), so the unrolled single-job plan
    otherwise TRIPLES its subtree count per hop — measured 154 parquet
    scans in the 3-hop plan over a join-derived edge table.  The lazy
    persists keep the whole unroll ONE job (no extra actions): the
    cache rewrite collapses every repeated subtree to one evaluation +
    InMemoryTableScans (8 scans after).  Cache lifetime is
    CALLER-OWNED — wrap in ``pipeline.cache_scope(spark)``."""
    from pyspark.storagelevel import StorageLevel

    lvl = StorageLevel.MEMORY_AND_DISK
    frontier = seeds.select(F.col("node").cast("long").alias("node")).distinct().persist(lvl)
    visited = frontier.select("node", F.lit(0).alias("dist")).persist(lvl)
    e = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    ).persist(lvl)
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .persist(lvl)
        )
        visited = visited.unionByName(nxt.select("node", F.lit(h).alias("dist"))).persist(lvl)
        frontier = nxt
    return visited


def sql_bfs_khop(edges_sql: str, seeds_sql: str, max_hops: int = 3) -> str:
    """DuckDB twin of :func:`bfs_khop`: a recursive CTE with UNION
    (distinct — bounds the working set to nodes×hops, not paths),
    MIN(dist) per node."""
    return f"""
    WITH RECURSIVE e AS ({edges_sql}),
    seeds AS ({seeds_sql}),
    walk(node, dist) AS (
        SELECT CAST(node AS BIGINT), 0 FROM seeds
        UNION
        SELECT CAST(e.dst AS BIGINT), w.dist + 1
        FROM walk w JOIN e ON w.node = e.src
        WHERE w.dist < {max_hops}
    )
    SELECT node, CAST(MIN(dist) AS INTEGER) AS dist FROM walk GROUP BY node
    """
