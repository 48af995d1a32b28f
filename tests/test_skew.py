"""Skew/co-location tools: salted join correctness and the no-exchange
property of bucketed joins."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from csv_query_engine_spark.operators.skew import (
    read_bucketed_table,
    salted_join,
    write_bucketed,
)


def test_salted_join_matches_plain_join(spark):
    left = spark.range(0, 10_000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )  # heavy 5-key skew
    right = spark.createDataFrame([(i, f"r{i}") for i in range(5)], "k long, name string")
    got = salted_join(left, right, "k", salt=4)
    plain = left.join(right, "k")
    assert got.count() == plain.count() == 10_000
    g = {(r["k"], r["v"], r["name"]) for r in got.collect()}
    p = {(r["k"], r["v"], r["name"]) for r in plain.collect()}
    assert g == p


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], "k long, v string")
    right = spark.createDataFrame([(1, "x")], "k long, name string")
    rows = {r["k"]: r["name"] for r in salted_join(left, right, "k", how="left", salt=3).collect()}
    assert rows == {1: "x", 99: None}


def test_salted_join_rejects_outer_variants(spark):
    """right/full outer would emit each unmatched right row salt× (the
    right side is replicated) — must raise, not silently mis-count."""
    import pytest

    left = spark.createDataFrame([(1, "a")], "k long, v string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k long, name string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, "k", how=how)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = spark.range(0, 5_000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("v")
    )
    lines = spark.range(0, 20_000).select(
        (F.col("id") % 5_000).alias("o_key"), F.col("id").alias("line")
    )
    write_bucketed(orders, "t_orders_b", "o_key", 8, str(tmp_path / "ob"))
    write_bucketed(lines, "t_lines_b", "o_key", 8, str(tmp_path / "lb"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable auto-broadcast: these test tables are tiny, so Catalyst
        # would broadcast and skip the bucketed path we're asserting
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_bucketed_table(spark, "t_orders_b").join(
            read_bucketed_table(spark, "t_lines_b"), "o_key"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # both sides' bucketed scans satisfy the join's partitioning
        # requirement -> sort-merge join with NO shuffle exchange
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 20_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lines_b")


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's own skew handling (spark.sql.adaptive.skewJoin): a
    shuffle sort-merge join with one hot key must come out of adaptive
    replanning with the skewed partition SPLIT — SortMergeJoin(skew=
    true) over an 'AQEShuffleRead … skewed' reader — with no manual
    salting.

    When each tool wins (the division of labor this suite documents):
    AQE handles skewed BATCH shuffle joins automatically at runtime
    from actual partition sizes — prefer it there (zero code, exact
    stats). salted_join remains necessary where AQE cannot act: stream-
    static joins (no adaptive replanning of streams), skewed
    AGGREGATIONS (skewJoin only rewrites joins), and keys so hot a
    single right-side match-set still overwhelms one task after
    splitting. The bucketed tables cover the third regime: repeated
    joins where the shuffle itself is the cost."""
    confs = {
        # test-scale thresholds: the hot partition is ~5 MB, production
        # defaults (256 MB) would never fire at fixture size
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "128KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 300k of 400k rows land on key 0 -> one shuffle partition is
        # >100x the median
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") < 300_000, F.lit(0)).otherwise(F.col("id") % 100).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 101).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        joined = left.join(right, "k")
        assert joined.count() == 400_000  # correctness unaffected by the split
        joined.collect()  # finalize THIS plan instance adaptively
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "skewed" in plan, plan  # AQEShuffleRead split the hot partition
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_bloom_prefiltered_join_matches_plain_join(spark):
    from csv_query_engine_spark.operators.skew import bloom_prefiltered_join

    fact = spark.range(0, 5000).select(
        (F.col("id") % 500).alias("fk"), F.col("id").alias("v")
    )
    dim = spark.range(0, 100).select(
        (F.col("id") * 7).alias("dk"), (F.col("id") % 3).alias("g")
    )
    got = bloom_prefiltered_join(fact, dim, "fk", "dk", expected_n=128)
    want = fact.join(dim, fact["fk"] == dim["dk"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_prefiltered_join_rejects_outer(spark):
    import pytest

    from csv_query_engine_spark.operators.skew import bloom_prefiltered_join

    fact = spark.range(10).select(F.col("id").alias("fk"))
    dim = spark.range(5).select(F.col("id").alias("dk"))
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_prefiltered_join(fact, dim, "fk", "dk", expected_n=8, how="left")


def test_bloom_prefilter_runs_before_join_no_extra_shuffle(spark):
    from csv_query_engine_spark.operators.skew import bloom_prefiltered_join

    fact = spark.range(0, 5000).select((F.col("id") % 500).alias("fk"))
    dim = spark.range(0, 100).select((F.col("id") * 7).alias("dk"))
    plan = bloom_prefiltered_join(
        fact, dim, "fk", "dk", expected_n=128
    )._jdf.queryExecution().executedPlan().toString()
    # the probe's bit tests sit in a Filter on the fact side, below the
    # join; the bitmap arrives via broadcast (BroadcastNestedLoopJoin on
    # the 1-row packed table is the crossJoin-broadcast idiom)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 1
    assert "bit_count" in plan or "&" in plan  # codegen'd bit tests present


def test_skew_report_planted_hot_key(spark):
    from csv_query_engine_spark.operators.skew import skew_report

    # 900 rows on key "hot", 10 keys with 10 rows each
    hot = spark.range(900).select(F.lit("hot").alias("k"))
    cold = spark.range(100).select((F.col("id") % 10).cast("string").alias("k"))
    rep = skew_report(hot.unionAll(cold), "k", top_k=3).collect()
    assert [r["key"] for r in rep] == ["hot", "0", "1"]
    top = rep[0]
    assert top["n"] == 900 and top["rnk"] == 1
    assert top["share_ppm"] == 900000
    assert top["total_rows"] == 1000 and top["n_keys"] == 11
    # max/mean = 900 / (1000/11) = 9.9 -> ceil = 10
    assert top["suggested_salt"] == 10
    assert top["skew_ratio_ppm"] == 9900000
    # uniform data suggests no salting
    uni = skew_report(cold, "k", top_k=2).collect()[0]
    assert uni["suggested_salt"] == 1


def test_skew_report_no_window_in_plan(spark):
    from csv_query_engine_spark.operators.skew import skew_report

    df = spark.range(1000).select((F.col("id") % 13).cast("string").alias("k"))
    plan = skew_report(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
