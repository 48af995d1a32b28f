"""Scale-safe EXACT order statistics by iterative range-bucketing —
distributed selection (Blum et al.'s selection problem, the
bucket-refinement form used by every shared-nothing engine).

The two familiar exact-quantile shapes both die at 100 TB:

* a global ``ROW_NUMBER`` window is a single-task sort of the corpus;
* ``percentile(col, q)`` (exact) buffers every row of the group in one
  aggregation buffer (the round-6 anomaly-screen lesson).

Selection by refinement does neither: each round partitions the value
RANGE into B fixed buckets (a map-side histogram — one aggregation to
≤ B rows), locates the bucket containing each target rank from the
driver-side prefix sum (B longs, bounded), and recurses into those
buckets.  The candidate set shrinks by ~B× per round, so a 10¹² -row
corpus needs ~4 rounds before the remainder fits the direct
``TakeOrdered`` path.  Driver state is B counts per round — the
bounded-driver-object contract (k-means centroids / BPE dictionary
precedents).  Multiple ranks descend TOGETHER: every round's histogram
is computed once and shared by all ranks still inside that subtree
(quartiles pay one corpus scan per level, not one per quantile).

Correctness does not depend on the bucketing arithmetic: buckets only
NARROW the candidate set (the refinement filter reuses the histogram's
own float expression, so there is no boundary seam), and the final
step selects the exact rank-th smallest inside the remainder — so the
DuckDB oracle can verify the RESULT with a plain ROW_NUMBER (fine at
oracle scale) without mirroring the algorithm, and there is no
cross-engine float hazard at all.  Duplicate-heavy data converges
fast: a bucket whose min equals its max IS the answer.

Domain: non-null, non-NaN values (both are filtered on entry — NaN
would poison the range arithmetic and has no defined rank).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_expr(lo: float, width: float, n_buckets: int):
    return F.least(
        F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(n_buckets - 1),
    )


def _select(cur: DataFrame, ranks: list[int], n_buckets: int, direct_limit: int) -> dict[int, float]:
    """ranks (1-based, each ≤ rows of cur) -> exact kth-smallest value.
    One histogram per level SHARED by every rank in this subtree."""
    st = cur.agg(
        F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    ).collect()[0]
    n, lo, hi = st["n"], st["lo"], st["hi"]
    bad = [r for r in ranks if r > (n or 0)]
    if bad:
        raise ValueError(f"rank(s) {bad} out of range for {n} remaining rows")
    width = (hi - lo) / n_buckets if n else 0.0
    if n <= direct_limit or lo == hi or width <= 0.0:
        if lo == hi:
            return {r: lo for r in ranks}
        vals = [row["v"] for row in cur.orderBy("v").limit(max(ranks)).collect()]
        return {r: vals[r - 1] for r in ranks}
    counts = {
        row["b"]: row["c"]
        for row in cur.groupBy(_bucket_expr(lo, width, n_buckets).alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    # driver-side prefix sum over ≤ n_buckets longs: rank -> (bucket,
    # residual rank within it)
    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for r in ranks:
        cum = 0
        target = n_buckets - 1
        for i in range(n_buckets):
            c = counts.get(i, 0)
            if cum + c >= r:
                target = i
                break
            cum += c
        by_bucket.setdefault(target, []).append((r, r - cum))
    out: dict[int, float] = {}
    for target, pairs in by_bucket.items():
        sub = cur.filter(_bucket_expr(lo, width, n_buckets) == target)
        got = _select(sub, [res for _, res in pairs], n_buckets, direct_limit)
        for orig, res in pairs:
            out[orig] = got[res]
    return out


def _prepared(df: DataFrame, col: str) -> DataFrame:
    return (
        df.select(F.col(col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull() & ~F.isnan("v"))
    )


def kth_smallest(
    df: DataFrame,
    col: str,
    rank: int,
    n_buckets: int = 1024,
    direct_limit: int = 65536,
) -> float:
    """The exact ``rank``-th smallest (1-based) non-null non-NaN value
    of ``col``.  Raises ``ValueError`` if rank is out of range."""
    if rank < 1:
        raise ValueError(f"rank must be >= 1, got {rank}")
    return _select(_prepared(df, col), [rank], n_buckets, direct_limit)[rank]


def exact_quantile_values(
    df: DataFrame,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    n_buckets: int = 1024,
    direct_limit: int = 65536,
) -> dict[float, tuple[int, float]]:
    """q -> (rank, value) with rank = ceil(q·N) over non-null non-NaN
    values and value = the EXACT rank-th smallest.  ALL quantiles
    descend together, sharing each level's histogram scan, over ONE
    persisted projection of the input — callers needing several
    quantiles must come through here (or :func:`exact_quantiles`),
    never one :func:`kth_smallest` descent per quantile.  The result is
    a bounded driver object and the descent fully materializes inside
    the call, so the cache is released in ``finally`` before returning
    (no persisted blocks outlive the call)."""
    from pyspark.storagelevel import StorageLevel

    base = _prepared(df, col).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n = base.count()  # doubles as the cache-materializing action
        ranks = {q: max(1, math.ceil(q * n)) for q in qs}
        got = _select(base, sorted(set(ranks.values())), n_buckets, direct_limit)
        return {float(q): (int(r), float(got[r])) for q, r in ranks.items()}
    finally:
        base.unpersist()


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    n_buckets: int = 1024,
    direct_limit: int = 65536,
) -> DataFrame:
    """One row per quantile: (q, rank, value) with rank = ceil(q·N)
    over non-null non-NaN values and value = the EXACT rank-th
    smallest — discrete quantiles, the ``ROW_NUMBER``-definable kind
    the oracle can verify.  qs of the form k/4 keep ceil(q·N) exact in
    IEEE on every engine (power-of-two denominators).  All quantiles
    descend together, sharing each level's histogram scan; the shared
    persisted base is unpersisted before return."""
    spark = df.sparkSession
    got = exact_quantile_values(df, col, qs, n_buckets, direct_limit)
    out = [(q, r, v) for q, (r, v) in got.items()]
    return spark.createDataFrame(out, "q double, rank bigint, value double")


# ---------------------------------------------------------------- grouped

def grouped_exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    n_buckets: int = 32,
    direct_limit: int = 4096,
    max_levels: int = 12,
) -> DataFrame:
    """EXACT per-group quantiles by fully-DISTRIBUTED range-bucket
    refinement — the grouped face of :func:`kth_smallest`, with NO
    driver-side per-group state and NO grow-with-group-row-count
    buffer (the two shapes that die at 100 TB: exact ``percentile``
    buffers every group row in one aggregation buffer, and a global
    per-group ``ROW_NUMBER`` sorts the whole group in one task).

    One row per (group, q): ``(*group_cols, q, rank, value)`` with
    rank = ceil(q·N_group) (1-based, over non-null non-NaN values)
    and value = the EXACT rank-th smallest within the group.

    Each level runs ONE shuffle aggregation: the facts join their
    group's active targets (≤ len(qs) replication), bucket into
    ``n_buckets`` fixed sub-ranges of the target's current [lo, hi],
    and aggregate (count, min, max) per (group, q, bucket).  The
    per-target prefix sum + bucket pick runs as a window over ≤
    n_buckets rows per (group, q) — bounded partitions, never the
    whole group.  The chosen bucket's ACTUAL min/max become the next
    level's [lo, hi] (floor-bucketing is monotone in v, so the
    [bmin, bmax] interval contains exactly that bucket's rows — the
    BETWEEN refinement filter is seam-free by construction, same
    argument as :func:`_select`).  A target finishes when its range
    collapses to a single value (duplicate-heavy groups converge
    immediately) or its remainder fits ``direct_limit``, after which
    the final rank is picked via sort_array(collect_list) over a
    buffer bounded by direct_limit BY CONSTRUCTION — not by group
    size.  Candidate count shrinks ~n_buckets× per level, so
    max_levels=12 covers ≥ 32¹² rows per group.

    Iterative-loop discipline (CLAUDE.md): the prepared fact
    projection is localCheckpoint'd FIRST; the per-round STATE is
    localCheckpoint'd every level (lazy — the convergence count is
    the one materializing action per round), so plan size stays
    constant across levels.

    Driver state: the loop counter and one ``active.count()`` long
    per level.  Oracle pairing: correctness is algorithm-independent
    (the result is the plain per-group ROW_NUMBER rank), so a DuckDB
    twin can verify the RESULT at oracle scale without mirroring the
    descent, and no cross-engine float hazard exists — boundary
    values are exact data values."""
    from pyspark.sql import Window as W

    g = list(group_cols)
    vals = (
        df.select(*g, F.col(col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull() & ~F.isnan("v"))
        .localCheckpoint(eager=False)
    )
    stats = vals.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    state = stats.select(*g, F.explode(qarr).alias("q"), "n", "lo", "hi").select(
        *g,
        "q",
        F.greatest(F.lit(1).cast("long"), F.ceil(F.col("q") * F.col("n")).cast("long"))
        .alias("rank"),
        "lo",
        "hi",
        F.col("n").alias("n_rem"),
    )
    state = state.withColumn("r", F.col("rank"))
    key = g + ["q"]
    for _level in range(max_levels):
        state = state.localCheckpoint(eager=False)
        active = state.filter(
            (F.col("n_rem") > direct_limit) & (F.col("lo") < F.col("hi"))
        )
        if active.count() == 0:  # the one materializing action per round
            break
        width = (F.col("hi") - F.col("lo")) / F.lit(float(n_buckets))
        b = F.least(
            F.floor((F.col("v") - F.col("lo")) / width).cast("int"),
            F.lit(n_buckets - 1),
        )
        hist = (
            vals.join(active.select(*key, "r", "lo", "hi"), g)
            .filter((F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")))
            .groupBy(*key, "r", b.alias("b"))
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.min("v").alias("bmin"),
                F.max("v").alias("bmax"),
            )
        )
        w = W.partitionBy(*key).orderBy("b")  # ≤ n_buckets rows/partition
        picked = (
            hist.withColumn("cum", F.sum("c").over(w))
            .filter(F.col("cum") >= F.col("r"))
            .groupBy(*key)
            .agg(F.min(F.struct("b", "c", "bmin", "bmax", "cum")).alias("s"))
            .select(
                *key,
                F.col("s.c").alias("new_n"),
                F.col("s.bmin").alias("new_lo"),
                F.col("s.bmax").alias("new_hi"),
                (F.col("s.cum") - F.col("s.c")).alias("cum_before"),
            )
        )
        state = state.join(picked, key, "left").select(
            *key,
            "rank",
            F.when(
                F.col("new_n").isNotNull(), F.col("r") - F.col("cum_before")
            )
            .otherwise(F.col("r"))
            .alias("r"),
            F.coalesce("new_lo", "lo").alias("lo"),
            F.coalesce("new_hi", "hi").alias("hi"),
            F.coalesce("new_n", "n_rem").alias("n_rem"),
        )
    state = state.localCheckpoint(eager=False)  # two consumers below
    trivial = state.filter(F.col("lo") >= F.col("hi")).select(
        *key, "rank", F.col("lo").alias("value")
    )
    rest = state.filter(F.col("lo") < F.col("hi"))
    resolved = (
        vals.join(rest.select(*key, "rank", "r", "lo", "hi"), g)
        .filter((F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")))
        .groupBy(*key, "rank", "r")
        .agg(
            F.element_at(
                F.array_sort(F.collect_list("v")), F.col("r").cast("int")
            ).alias("value")
        )
        .select(*key, "rank", "value")
    )
    return trivial.unionByName(resolved).orderBy(*g, "q")
