"""Scale-safe EXACT order statistics by iterative range-bucketing —
distributed selection (Blum et al.'s selection problem, the
bucket-refinement form used by every shared-nothing engine).

The two familiar exact-quantile shapes both die at 100 TB:

* a global ``ROW_NUMBER`` window is a single-task sort of the corpus;
* ``percentile(col, q)`` (exact) buffers every row of the group in one
  aggregation buffer (the round-6 anomaly-screen lesson).

Selection by refinement does neither: each round partitions the value
RANGE into B fixed buckets (a map-side histogram — one aggregation to
≤ B rows), locates the bucket containing the target rank from the
driver-side prefix sum (B longs, bounded), and recurses into that one
bucket.  The candidate set shrinks by ~B× per round, so a 10¹² -row
corpus needs ~4 rounds before the remainder fits the direct
``TakeOrdered`` path.  Driver state is B counts per round — the
bounded-driver-object contract (k-means centroids / BPE dictionary
precedents).

Correctness does not depend on the bucketing arithmetic: buckets only
NARROW the candidate set, and the final step selects the exact
rank-th smallest inside it — so the DuckDB oracle can verify the
RESULT with a plain ROW_NUMBER (fine at oracle scale) without
mirroring the algorithm, and there is no cross-engine float hazard at
all.  Duplicate-heavy data converges fast: a bucket whose min equals
its max IS the answer.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kth_smallest(
    df: DataFrame,
    col: str,
    rank: int,
    n_buckets: int = 1024,
    direct_limit: int = 65536,
) -> float:
    """The exact ``rank``-th smallest (1-based) non-null value of
    ``col``.  Raises ``ValueError`` if rank is out of range."""
    if rank < 1:
        raise ValueError(f"rank must be >= 1, got {rank}")
    if df.columns == ["v"]:
        cur = df  # pre-projected (exact_quantiles persists this once)
    else:
        cur = df.select(F.col(col).cast("double").alias("v")).filter(
            F.col("v").isNotNull()
        )
    r = rank
    while True:
        st = cur.agg(
            F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
        ).collect()[0]
        n, lo, hi = st["n"], st["lo"], st["hi"]
        if r > n:
            raise ValueError(f"rank {r} out of range for {n} remaining rows")
        width = (hi - lo) / n_buckets if n is not None and n > 0 else 0.0
        if n <= direct_limit or lo == hi or width <= 0.0:
            # direct path: the remainder is driver-bounded (or constant)
            if lo == hi:
                return lo
            rows = cur.orderBy("v").limit(r).orderBy(F.desc("v")).limit(1).collect()
            return rows[0]["v"]
        b = F.least(
            F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
            F.lit(n_buckets - 1),
        )
        counts = {
            row["b"]: row["c"]
            for row in cur.groupBy(b.alias("b")).agg(F.count(F.lit(1)).alias("c")).collect()
        }
        cum = 0
        target = n_buckets - 1
        for i in range(n_buckets):
            c = counts.get(i, 0)
            if cum + c >= r:
                target = i
                break
            cum += c
        r -= cum
        bound_lo = lo + target * width
        bound_hi = lo + (target + 1) * width
        # reproduce the bucket predicate exactly (same float arithmetic
        # the histogram used) so the refined set IS bucket `target`
        del bound_lo, bound_hi  # informational only; the PREDICATE is
        # the same float arithmetic the histogram used, so the refined
        # set is exactly bucket `target` (no boundary seam)
        cur = cur.filter(
            F.least(
                F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
                F.lit(n_buckets - 1),
            )
            == target
        )


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    n_buckets: int = 1024,
    direct_limit: int = 65536,
) -> DataFrame:
    """One row per quantile: (q, rank, value) with rank = ceil(q·N)
    over non-null values and value = the EXACT rank-th smallest —
    discrete quantiles, the ``ROW_NUMBER``-definable kind the oracle
    can verify.  qs of the form k/4 keep ceil(q·N) exact in IEEE on
    every engine (power-of-two denominators)."""
    from pyspark.storagelevel import StorageLevel

    spark = df.sparkSession
    base = (
        df.select(F.col(col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = base.count()  # doubles as the cache-materializing action
    out = []
    for q in qs:
        rnk = max(1, math.ceil(q * n))
        out.append(
            (float(q), int(rnk), float(kth_smallest(base, col, rnk, n_buckets, direct_limit)))
        )
    return spark.createDataFrame(out, "q double, rank bigint, value double")
