"""Reproducible-internals sketches (pipeline/sketches.py):
Count-Min (cm_cells/cm_estimates) and the hand-built HyperLogLog
(hll_distinct). Cross-engine exactness is covered by
test_queries_oracle.py (events_cm_user_counts,
events_hll_type_cardinality)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from csv_query_engine_spark.pipeline.sketches import (
    cm_cells,
    cm_estimates,
    hll_distinct,
)


def _cm_pos(key: str, i: int, width: int) -> int:
    return int(hashlib.md5(f"cm{i}-{key}".encode()).hexdigest()[:8], 16) % width


def test_cm_never_undercounts_and_replays(spark):
    """est >= exact for every key (collisions only add), bounded cell
    count, and the estimates equal a pure-Python sketch replay —
    including any collision overcounts."""
    depth, width = 4, 8  # tiny width forces collisions
    rows = [(f"k{i % 20}",) for i in range(300)]
    df = spark.createDataFrame(rows, "k string")
    cells = cm_cells(df, "k", depth=depth, width=width)
    assert cells.count() <= depth * width
    keys = df.select("k").distinct()
    est = {
        r["k"]: r["est_count"]
        for r in cm_estimates(cells, keys, "k", depth=depth, width=width).collect()
    }
    exact = {}
    for (k,) in rows:
        exact[k] = exact.get(k, 0) + 1
    # python replay of the whole sketch
    table = {}
    for k, n in exact.items():
        for i in range(depth):
            c = _cm_pos(k, i, width)
            table[(i, c)] = table.get((i, c), 0) + n
    expect = {
        k: min(table[(i, _cm_pos(k, i, width))] for i in range(depth)) for k in exact
    }
    assert est == expect
    assert all(est[k] >= exact[k] for k in exact)
    # tiny width over 20 keys: at least one collision overcount exists,
    # so the replay (and the oracle twin) genuinely checks error paths
    assert any(est[k] > exact[k] for k in exact)


def test_hll_accuracy_and_merge_by_max(spark):
    """Estimate within the ~3σ relative-error envelope for p=8
    (1.04/sqrt(256) ≈ 6.5% σ), and building one sketch over A ∪ B
    equals merging the per-shard registers by MAX — the shard-union
    contract."""
    rows = [(("a" if i % 2 == 0 else "b"), f"u{i}") for i in range(4000)]
    df = spark.createDataFrame(rows, "g string, k string")
    out = {r["g"]: r["hll_estimate"] for r in hll_distinct(df, "k", "g").collect()}
    for g, n_true in (("a", 2000), ("b", 2000)):
        assert abs(out[g] - n_true) / n_true < 0.2, (g, out[g])

    # union-vs-merged-registers: one group holding all keys must equal
    # the estimate from max-merged shard registers — here simulated by
    # relabeling both shards to one group (registers merge by MAX
    # inside the same groupBy)
    merged = {
        r["g"]: r["hll_estimate"]
        for r in hll_distinct(df.withColumn("g", F.lit("all")), "k", "g").collect()
    }
    both = hll_distinct(
        df.select(F.lit("all").alias("g"), "k").union(
            df.select(F.lit("all").alias("g"), "k")
        ),
        "k",
        "g",
    ).collect()[0]["hll_estimate"]
    # duplicates cannot move any register: same estimate exactly
    assert both == merged["all"]


def test_hdr_quantiles_error_bound_and_bounded_size(spark):
    """HDR sketch contract: every estimate is a lower bound of the true
    quantile with relative error <= 2^-sub_bits; bucket count stays
    under 63*2^s + 1 for any input; non-positive values land in the
    reserved bucket and estimate as 0."""
    import random

    from csv_query_engine_spark.pipeline.sketches import hdr_buckets, hdr_quantiles

    rng = random.Random(17)
    vals = (
        [rng.randint(1, 10**9) for _ in range(5000)]
        + [rng.randint(1, 50) for _ in range(500)]
        + [10**15]
    )
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    b = hdr_buckets(df, "x", sub_bits=5)
    assert b.count() <= 63 * 32 + 1
    svals = sorted(vals)
    for r in hdr_quantiles(b, (0.01, 0.25, 0.5, 0.75, 0.99)).collect():
        true = svals[r["rank"] - 1]
        assert r["est"] <= true
        assert true <= r["est"] * (1 + 2**-5), (r, true)

    neg = spark.createDataFrame([(-3,), (0,), (7,)], "x long")
    out = {r["q"]: r["est"] for r in
           hdr_quantiles(hdr_buckets(neg, "x"), (0.25, 1.0)).collect()}
    assert out[0.25] == 0 and out[1.0] == 7


def test_hdr_merge_identity(spark):
    """SUM-merging per-shard bucket tables equals the one-shot global
    build (additive integer cells — the Count-Min contract applied to
    order statistics), so estimates from the merged sketch are
    IDENTICAL, not just close."""
    from pyspark.sql import functions as F

    from csv_query_engine_spark.pipeline.sketches import hdr_buckets, hdr_quantiles

    vals = [((i * 2654435761) % 999983) + 1 for i in range(20000)]
    df = spark.createDataFrame(
        [(v, i % 3) for i, v in enumerate(vals)], "x long, shard int"
    )
    shards = [
        hdr_buckets(df.filter(F.col("shard") == s), "x") for s in range(3)
    ]
    merged = (
        shards[0].unionByName(shards[1]).unionByName(shards[2])
        .groupBy("e", "sb")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    direct = hdr_buckets(df, "x")
    mk = sorted(tuple(r) for r in merged.collect())
    dk = sorted(tuple(r) for r in direct.collect())
    assert mk == dk
    me = sorted(tuple(r) for r in hdr_quantiles(merged).collect())
    de = sorted(tuple(r) for r in hdr_quantiles(direct).collect())
    assert me == de


def test_hdr_grouped_error_bound_and_merge(spark):
    """Grouped HDR: per-group estimates obey the relative-error bound
    against each group's sorted reference, and (group, e, sb) SUM-merge
    of per-shard builds equals the direct grouped build."""
    import random

    from pyspark.sql import functions as F

    from csv_query_engine_spark.pipeline.sketches import (
        hdr_buckets_by,
        hdr_quantiles_by,
    )

    rng = random.Random(23)
    rows = [
        (f"g{i % 4}", rng.randint(1, 10 ** (3 + (i % 4))), i % 2)
        for i in range(8000)
    ]
    df = spark.createDataFrame(rows, "g string, v long, shard int")
    by_g: dict[str, list[int]] = {}
    for g, v, _ in rows:
        by_g.setdefault(g, []).append(v)
    out = hdr_quantiles_by(hdr_buckets_by(df, ["g"], "v"), ["g"], (0.5, 0.99)).collect()
    assert len(out) == 8
    for r in out:
        true = sorted(by_g[r["g"]])[r["rank"] - 1]
        assert r["est"] <= true <= r["est"] * (1 + 2**-5), (r, true)
    merged = (
        hdr_buckets_by(df.filter(F.col("shard") == 0), ["g"], "v")
        .unionByName(hdr_buckets_by(df.filter(F.col("shard") == 1), ["g"], "v"))
        .groupBy("g", "e", "sb")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    direct = hdr_buckets_by(df, ["g"], "v")
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in direct.collect()
    )
