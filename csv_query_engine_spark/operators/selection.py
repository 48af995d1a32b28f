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
