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


def test_partitioned_unordered_window_is_clean(spark):
    """SUM(x) OVER (PARTITION BY g) prints only TWO bracket groups on the
    Window plan line (Spark omits an empty order spec), which the old
    group-count rule mis-flagged as unpartitioned — the round-11 fix
    disambiguates via the sort-direction marker (ADVICE round 10)."""
    df = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("g"))
    part_only = df.withColumn("s", F.sum("id").over(Window.partitionBy("g")))
    assert "unpartitioned-window" not in _rules(part_only)
    # and the genuinely-unpartitioned two-group shape still flags
    order_only = df.withColumn("r", F.rank().over(Window.orderBy("id")))
    assert "unpartitioned-window" in _rules(order_only)


def test_sibling_branch_filter_not_misattributed(spark, tmp_path):
    """A join whose LEFT leg ends in a non-pushable Filter must not make
    the linter blame the RIGHT leg's clean scan: the unpushed-filter
    lookback walks tree ANCESTORS, not raw adjacent lines."""
    left = spark.range(200).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    right = spark.range(200).select(F.col("id").alias("k"), (F.col("id") % 7).alias("w"))
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    left.write.parquet(lp)
    right.write.parquet(rp)
    l = spark.read.parquet(lp)
    r = spark.read.parquet(rp)
    # Non-deterministic predicate is never pushed down -> Filter sits on
    # the left scan with PushedFilters: []; the right scan is filterless.
    noisy = l.filter((F.rand(7) + F.col("v")) > -1.0)
    joined = noisy.join(r, "k")
    findings = [f for f in lint_plan(joined) if f["rule"] == "unpushed-filter"]
    # exactly the left leg's finding — presence is correct (that Filter
    # IS unpushed); the test pins that a clean right-leg-only plan stays
    # clean below
    assert len(findings) <= 1
    # the walk must be ancestor-only: pin the regression shape directly
    # (a sibling branch's Filter rendered on the raw line just above a
    # pushdown-less scan — the old 3-line lookback mis-attributed it)
    from csv_query_engine_spark.operators.lint import _ancestor_lines

    lines = [
        "*(3) Project",
        "+- Join Inner",
        "   :- Filter (rand() > 0.5)",
        "   :  +- Scan A PushedFilters: [IsNotNull(k)]",
        "   +- Scan B PushedFilters: []",
    ]
    ancestors = "".join(_ancestor_lines(lines, 4))
    assert "Filter" not in ancestors  # sibling's Filter excluded
    assert "Join" in ancestors


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
