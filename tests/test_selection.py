"""operators/selection.py: exact kth-smallest by iterative range-bucket
refinement — forced multi-round refinement (tiny direct_limit), heavy
duplicates (min==max fast path), ties at the rank boundary, and rank
range errors. Cross-engine exactness is covered by
test_queries_oracle.py (orders_exact_quantiles_selection)."""

from __future__ import annotations

import pytest

from csv_query_engine_spark.operators.selection import exact_quantiles, kth_smallest


def test_kth_smallest_forced_refinement_matches_sorted(spark):
    # deterministic scattered values; tiny direct_limit + few buckets
    # forces ≥2 histogram rounds before the direct path
    vals = [((i * 2654435761) % 100003) / 7.0 for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ordered = sorted(vals)
    for rank in (1, 17, 2500, 4999, 5000):
        got = kth_smallest(df, "x", rank, n_buckets=16, direct_limit=64)
        assert got == ordered[rank - 1], rank


def test_kth_smallest_heavy_duplicates_and_bounds(spark):
    df = spark.createDataFrame([(5.0,)] * 1000 + [(7.0,)] * 10, "x double")
    assert kth_smallest(df, "x", 1000, n_buckets=8, direct_limit=4) == 5.0
    assert kth_smallest(df, "x", 1001, n_buckets=8, direct_limit=4) == 7.0
    with pytest.raises(ValueError):
        kth_smallest(df, "x", 1011, n_buckets=8, direct_limit=4)
    with pytest.raises(ValueError):
        kth_smallest(df, "x", 0)


def test_exact_quantiles_nulls_excluded(spark):
    rows = [(float(i),) for i in range(1, 101)] + [(None,)] * 20
    df = spark.createDataFrame(rows, "x double")
    out = {r["q"]: (r["rank"], r["value"]) for r in exact_quantiles(df, "x").collect()}
    # N = 100 non-null; ceil(.25*100)=25 -> 25.0, etc.
    assert out == {0.25: (25, 25.0), 0.5: (50, 50.0), 0.75: (75, 75.0)}


def test_kth_smallest_single_v_column_nulls_and_nan(spark):
    """Review regression: a caller frame whose only column is literally
    named 'v' must still get the null/NaN filter (the old pre-projection
    shortcut skipped it: NULLs sorted first and shifted every rank)."""
    rows = [(float(i),) for i in range(1, 11)] + [(None,)] * 5 + [(float("nan"),)] * 3
    df = spark.createDataFrame(rows, "v double")
    assert kth_smallest(df, "v", 1, n_buckets=8, direct_limit=4) == 1.0
    assert kth_smallest(df, "v", 10, n_buckets=8, direct_limit=4) == 10.0
    with pytest.raises(ValueError):
        kth_smallest(df, "v", 11, n_buckets=8, direct_limit=4)


def test_quantiles_share_histogram_scans(spark):
    """All quantiles descend together: the quartile query runs ONE
    level-1 histogram job, not one per quantile (3 ranks through a
    forced-refinement frame still produce exact answers)."""
    vals = [((i * 48271) % 9973) * 1.0 for i in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ordered = sorted(vals)
    out = {r["q"]: r["value"] for r in
           exact_quantiles(df, "x", n_buckets=16, direct_limit=64).collect()}
    import math
    for q in (0.25, 0.5, 0.75):
        assert out[q] == ordered[math.ceil(q * 4000) - 1], q


def test_kth_smallest_hypothesis_style_random_sweep(spark):
    """Deterministic pseudo-random sweep (hypothesis-style, fixed seed
    for reproducibility): kth_smallest equals the sorted reference for
    every rank on small adversarial frames — duplicates, negatives,
    near-equal clusters."""
    import random

    rng = random.Random(8)
    for trial in range(5):
        n = rng.randint(1, 60)
        vals = [
            rng.choice([rng.uniform(-5, 5), float(rng.randint(-3, 3)), 1e-9 * rng.randint(0, 5)])
            for _ in range(n)
        ]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        ordered = sorted(vals)
        for rank in {1, n, max(1, n // 2)}:
            got = kth_smallest(df, "x", rank, n_buckets=4, direct_limit=3)
            assert got == ordered[rank - 1], (trial, rank, vals)


def test_exact_quantiles_releases_its_cache(spark):
    """Driver-bounded operators must not leak persisted blocks (round-9
    discipline): exact_quantiles persists its projection for the shared
    descent and unpersists it in ``finally`` before returning."""
    spark.catalog.clearCache()
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    df = spark.createDataFrame([(float(i),) for i in range(500)], "x double")
    exact_quantiles(df, "x", n_buckets=8, direct_limit=16).collect()
    leftover = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert leftover == 0, f"{leftover} persisted RDDs leaked by exact_quantiles"


def test_grouped_exact_quantiles_forced_refinement(spark):
    """Per-group descent matches the per-group sorted reference under
    forced multi-level refinement (tiny direct_limit, few buckets),
    across groups of very different sizes and value ranges."""
    import math
    import random

    from csv_query_engine_spark.operators.selection import grouped_exact_quantiles

    rng = random.Random(11)
    rows = []
    for gi, size in enumerate((1, 7, 300, 1200)):
        lo, hi = (-50.0 * gi, 100.0 * (gi + 1))
        rows += [(f"g{gi}", rng.uniform(lo, hi)) for _ in range(size)]
    df = spark.createDataFrame(rows, "grp string, x double")
    out = grouped_exact_quantiles(
        df, ["grp"], "x", (0.25, 0.5, 0.75), n_buckets=4, direct_limit=8
    ).collect()
    assert len(out) == 12  # 4 groups x 3 quantiles
    ref: dict[str, list[float]] = {}
    for gname, v in rows:
        ref.setdefault(gname, []).append(v)
    for r in out:
        vals = sorted(ref[r["grp"]])
        rank = max(1, math.ceil(r["q"] * len(vals)))
        assert r["rank"] == rank, r
        assert r["value"] == vals[rank - 1], (r, vals[rank - 1])


def test_grouped_exact_quantiles_duplicates_nulls_nan(spark):
    """Duplicate-heavy groups resolve through the range-collapse path
    (lo==hi -> value, NO collect of the group's rows); nulls and NaN
    are excluded from ranks."""
    from csv_query_engine_spark.operators.selection import grouped_exact_quantiles

    rows = (
        [("dup", 5.0)] * 3000
        + [("dup", 9.0)] * 1000
        + [("mix", float(i)) for i in range(1, 11)]
        + [("mix", None), ("mix", float("nan"))]
    )
    df = spark.createDataFrame(rows, "grp string, x double")
    out = {
        (r["grp"], r["q"]): (r["rank"], r["value"])
        for r in grouped_exact_quantiles(
            df, ["grp"], "x", (0.25, 0.5, 0.75), n_buckets=4, direct_limit=8
        ).collect()
    }
    # dup: N=4000 -> ranks 1000/2000/3000, all 5.0
    assert out[("dup", 0.25)] == (1000, 5.0)
    assert out[("dup", 0.5)] == (2000, 5.0)
    assert out[("dup", 0.75)] == (3000, 5.0)
    # mix: N=10 non-null non-NaN -> 3.0 / 5.0 / 8.0... ranks 3,5,8
    assert out[("mix", 0.25)] == (3, 3.0)
    assert out[("mix", 0.5)] == (5, 5.0)
    assert out[("mix", 0.75)] == (8, 8.0)


def test_grouped_exact_quantiles_plan_has_no_group_sized_buffer(spark):
    """Plan pin for the registered consumer: no exact percentile()
    aggregate (per-group row buffer) anywhere; the only windows are
    the per-(group,q) prefix sums over <= n_buckets rows (partitioned
    by real keys, never empty partitionBy); no cartesian product."""
    import contextlib
    import io

    from csv_query_engine_spark.queries import all_queries
    from tests.conftest import SF_SMOKE

    df = all_queries()["orders_monthly_exact_quantiles"](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "percentile" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        # every window partitions by real keys: the spec lists the
        # partition columns before the ORDER BY clause
        assert spec.strip().startswith("month"), spec
