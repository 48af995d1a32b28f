"""Plan-linter rules (operators/lint.py): each anti-pattern the repo's
reviews hunt by hand must be detected on a purpose-built bad plan and
ABSENT on the idiomatic equivalent."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from csv_query_engine_spark.operators.lint import lint_plan


def _rules(df):
    return {f["rule"] for f in lint_plan(df) if f["severity"] != "info"}


def test_cartesian_product_flagged_but_not_broadcast_crossjoin(spark):
    a = spark.range(10).select(F.col("id").alias("x"))
    b = spark.range(10).select(F.col("id").alias("y"))
    # CartesianProduct only materializes when neither side broadcasts
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert "cartesian-product" in _rules(a.crossJoin(b))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    # the 1-row-broadcast idiom compiles to BroadcastNestedLoopJoin — clean
    one = b.agg(F.count(F.lit(1)).alias("n"))
    assert "cartesian-product" not in _rules(a.crossJoin(F.broadcast(one)))


def test_unpartitioned_window_flagged(spark):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("g"))
    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    ok = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    assert "unpartitioned-window" in _rules(bad)
    assert "unpartitioned-window" not in _rules(ok)
    # the single-partition exchange under the bad window is attributed
    # to the window finding, not double-reported
    assert "single-partition-exchange" not in _rules(bad)


def test_python_row_udf_flagged_arrow_clean(spark):
    from pyspark.sql.types import LongType

    df = spark.range(50)
    plain = F.udf(lambda x: x + 1, LongType(), useArrow=False)
    assert "python-row-udf" in _rules(df.select(plain("id")))
    assert "python-row-udf" not in _rules(df.select((F.col("id") + 1)))


def test_global_agg_and_sort_are_not_hard_findings(spark):
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("g"))
    # global sort range-partitions (parallel) — no error/warn findings
    assert _rules(df.orderBy("g")) == set()
    # global final aggregate: SinglePartition is reported as info only
    agg = df.agg(F.sum("id").alias("s"))
    assert _rules(agg) == set()
    rules_info = {f["rule"] for f in lint_plan(agg)}
    assert "single-partition-exchange" in rules_info


def test_registered_flagship_is_clean(spark):
    from csv_query_engine_spark.queries import all_queries

    df = all_queries()["flagship_region_nation_revenue"](
        spark, "/root/testdata/sf0.001"
    )
    hard = {f["rule"] for f in lint_plan(df) if f["severity"] == "error"}
    assert hard == set()
