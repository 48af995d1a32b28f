"""Relational operator coverage (SURVEY.md §2 Tier A + Tier B).

Each query is declared with the DataFrame API (Catalyst owns the physical
plan: parquet pushdown, broadcast-vs-shuffle join selection, AQE) and is
paired with an ANSI-SQL oracle that DuckDB executes on the same parquet.

Determinism conventions for the oracle hash compare (SURVEY.md §7 risk 3):

* every computed column is aliased identically on both sides;
* floating aggregates use the *exact-sum* pattern: evaluate the per-row
  expression in double (bit-identical per row in both engines), cast to
  DECIMAL(18,6) (same binary double in -> same decimal out), SUM the
  decimals exactly, cast the total back to double — immune to summation
  order, which otherwise differs between engines/partitionings;
* orderings used under LIMIT are made total with unique-key tiebreakers.

Scale notes are attached per query; the global posture is: dimension
tables (region/nation/part/supplier at TPC-H ratios) broadcast, fact-fact
joins shuffle on their keys with AQE skew handling, aggregates are
partial+final (map-side combine) automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from csv_query_engine_spark.io.readers import load_tables
from csv_query_engine_spark.queries import register

# ---------------------------------------------------------------- helpers


def _unscaled(expr: Column, scale: int) -> Column:
    """Unscaled fixed-point long of a double at the given scale, via pure
    double ops: F.round is BigDecimal(shortest-repr).setScale(HALF_UP) —
    the SAME rounding as a decimal cast — and rint snaps the ×10^scale
    product (within ~1e-10 of an integer, far under the 0.5 snap radius)
    to that exact integer."""
    return F.rint(F.round(expr, scale) * F.lit(float(10**scale))).cast("long")


def exact_sum(expr: Column, alias: str, scale: int = 6) -> Column:
    """Order-independent SUM of a floating expression (see module doc).

    Implementation: sums the unscaled fixed-point longs (codegen'd long
    addition — measured 2.3× faster than a decimal-buffered SUM, which
    falls off Spark's compact-long path the moment the buffer precision
    exceeds 18) and rescales exactly through decimal division at the
    end. Bit-identical to ``exact_sum_decimal`` (verified) within its
    envelope: |group sum| < 2^63/10^scale ≈ 9.2e12 at scale 6 — holds
    through sf≈400 for TPC-H money columns; beyond that use
    :func:`exact_sum_decimal` (same semantics, wider buffer)."""
    total = F.sum(_unscaled(expr, scale))
    return (
        (total.cast("decimal(38,6)") / F.lit(10**scale).cast("decimal(12,0)"))
        .cast("double")
        .alias(alias)
    )


def exact_sum_decimal(expr: Column, alias: str, scale: int = 6) -> Column:
    """Decimal-buffered exact sum — the unbounded-scale variant of
    :func:`exact_sum` (slower: the (p+10, s) agg buffer exceeds compact-
    long precision, so every add is a BigDecimal)."""
    return F.sum(expr.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def exact_avg(expr: Column, alias: str, scale: int = 6) -> Column:
    """AVG as exact-sum / count, divided in double (deterministic)."""
    total = F.sum(_unscaled(expr, scale))
    return (
        (total.cast("decimal(38,6)") / F.lit(10**scale).cast("decimal(12,0)")).cast("double")
        / F.count(expr)
    ).alias(alias)


def _sql_exact_sum(expr: str, alias: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def _sql_exact_avg(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


REVENUE = "l_extendedprice * (1 - l_discount)"


def _revenue_col() -> Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


# ---------------------------------------------------------------- flagship
#
# The reference's canonical question is "Which services were affected in
# Mumbai last month?" -> SELECT "Service", COUNT(*) FROM df WHERE "City" =
# 'Mumbai' AND <range> GROUP BY "Service" (reference models.py:31-36,
# sql_generator.py:73-78).  Its star-schema analog: per-nation order count
# + revenue, filtered to one region (the city-equality filter, A8) and a
# date range (the last-month range filter, A9), grouped (A7), counted and
# revenue-aggregated (A6), sorted desc (A19), limited (A15).


@register(
    "flagship_region_nation_revenue",
    f"""
    SELECT n.n_name AS nation,
           COUNT(*) AS count,
           {_sql_exact_sum(REVENUE, 'revenue')}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def flagship_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan -> eq-filter -> range-filter -> join -> groupBy -> count/sum ->
    sort desc (A1, A4-A10, A16, A19 in one plan).

    Scale: nation(25)/region(5) broadcast (no shuffle); customer->orders->
    lineitem shuffle on their join keys; the region+date filters push into
    the orders/region parquet scans before the join; aggregate is
    partial+final on n_name (25 groups -> trivially small final stage).
    """
    t = load_tables(spark, sf_dir, ("region", "nation", "customer", "orders", "lineitem"))
    dim = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dim, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("count"), exact_sum(_revenue_col(), "revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


# ------------------------------------------------------- aggregation suite


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_sql_exact_sum('l_quantity', 'sum_qty')},
           {_sql_exact_sum('l_extendedprice', 'sum_base_price')},
           {_sql_exact_sum(REVENUE, 'sum_disc_price')},
           {_sql_exact_sum(REVENUE + ' * (1 + l_tax)', 'sum_charge')},
           {_sql_exact_avg('l_quantity', 'avg_qty')},
           {_sql_exact_avg('l_extendedprice', 'avg_price')},
           {_sql_exact_avg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: wide multi-aggregate groupBy (SURVEY §2 Tier B
    aggregations).  Scale: single scan, 4 group values -> partial agg does
    ~all the work map-side; no join, one tiny shuffle."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    charge = _revenue_col() * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity"), "sum_qty"),
            exact_sum(F.col("l_extendedprice"), "sum_base_price"),
            exact_sum(_revenue_col(), "sum_disc_price"),
            exact_sum(charge, "sum_charge"),
            exact_avg(F.col("l_quantity"), "avg_qty"),
            exact_avg(F.col("l_extendedprice"), "avg_price"),
            exact_avg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "group_count_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS count
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY count DESC, o_orderpriority
    """,
)
def group_count_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's entire deterministic grammar output shape:
    SELECT "col", COUNT(*) as count ... GROUP BY "col" (A6/A7,
    sql_generator.py:56,73-78), plus the desc-count sort of A19."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), "o_orderpriority")
    )


@register(
    "distinct_agg_customers",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def distinct_agg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (Tier B aggregations).  Scale: Spark
    expands distinct-agg into a two-phase partial-distinct plan
    automatically; no manual pre-dedup needed."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "rollup_flag_status",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS count,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (Tier B). Null ordering pinned explicitly —
    Spark default (nulls first asc) vs DuckDB (nulls last) differ."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("count"), exact_sum(F.col("l_quantity"), "sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "cube_region_status",
    """
    SELECT CAST(COALESCE(n_regionkey, -1) AS BIGINT) AS regionkey,
           COALESCE(o_orderstatus, '<ALL>') AS orderstatus,
           COUNT(*) AS count
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY CUBE (n_regionkey, o_orderstatus)
    ORDER BY regionkey, orderstatus
    """,
)
def cube_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over a join (Tier B grouping sets + broadcast dim join).
    Subtotal-row NULL keys are coalesced to sentinels (-1 / '<ALL>') on
    BOTH sides so the int key stays non-null (pandas would upcast a
    nullable int64 grouping column to float64 and drift the value repr)."""
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    joined = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.cube("n_regionkey", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.coalesce(F.col("n_regionkey"), F.lit(-1)).cast("bigint").alias("regionkey"),
            F.coalesce(F.col("o_orderstatus"), F.lit("<ALL>")).alias("orderstatus"),
            "count",
        )
        .orderBy("regionkey", "orderstatus")
    )


@register(
    "stats_acctbal_by_segment",
    """
    SELECT c_mktsegment,
           ROUND(CAST(STDDEV_SAMP(c_acctbal) AS DOUBLE), 2) AS std_bal,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def stats_acctbal_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/min/max). stddev is rounded — it is
    a genuinely order-dependent float reduction in both engines."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.round(F.stddev_samp("c_acctbal"), 2).alias("std_bal"),
            F.min("c_acctbal").cast("double").alias("min_bal"),
            F.max("c_acctbal").cast("double").alias("max_bal"),
            exact_sum(F.col("c_acctbal"), "sum_bal"),
        )
        .orderBy("c_mktsegment")
    )


# ------------------------------------------------------------------ joins


@register(
    "q3_shipping_priority",
    f"""
    SELECT l.l_orderkey AS orderkey,
           {_sql_exact_sum(REVENUE, 'revenue')},
           o.o_orderdate AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: selective filters on both fact sides + 3-way join
    + top-10 (Tier B joins/sort/limit).  Scale: both filters push to the
    scans; limit-after-sort is a TakeOrderedAndProject (no full sort)."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"].filter(F.col("o_orderdate") < cutoff), F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"].filter(F.col("l_shipdate") > cutoff), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_orderkey").alias("orderkey"), F.col("o_orderdate").alias("orderdate"))
        .agg(exact_sum(_revenue_col(), "revenue"))
        .select("orderkey", "revenue", "orderdate")
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    f"""
    SELECT n.n_name AS nation, {_sql_exact_sum(REVENUE, 'revenue')}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: 6-way join with a non-key equality (customer and
    supplier in the same nation).  Scale: supplier/nation/region broadcast;
    lineitem⋈orders⋈customer shuffles carry only join keys + revenue."""
    t = load_tables(spark, sf_dir, TABLE_SET_STAR)
    sup = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], (F.col("o_custkey") == F.col("c_custkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(exact_sum(_revenue_col(), "revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


TABLE_SET_STAR = ("region", "nation", "customer", "supplier", "orders", "lineitem")


@register(
    "join_kinds_outer",
    """
    SELECT n.n_name AS nation, COUNT(c.c_custkey) AS n_customers
    FROM nation n
    LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey AND c.c_acctbal > 9000
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def join_kinds_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with an extra join-side predicate — COUNT(col)
    counts non-null matches only, preserving unmatched nations as 0."""
    t = load_tables(spark, sf_dir, ("nation", "customer"))
    c = t["customer"].filter(F.col("c_acctbal") > 9000)
    return (
        t["nation"]
        .join(c, F.col("n_nationkey") == F.col("c_nationkey"), "left")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("c_custkey").alias("n_customers"))
        .orderBy("nation")
    )


@register(
    "semi_join_customers_with_urgent",
    """
    SELECT c_mktsegment, COUNT(*) AS count
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def semi_join_customers_with_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS (Tier B joins). Scale: semi-join carries no
    payload from the probe side and short-circuits on first match."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("c_mktsegment")
    )


@register(
    "anti_join_parts_never_ordered",
    """
    SELECT p_brand, COUNT(*) AS count
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey
    )
    GROUP BY p_brand
    ORDER BY count DESC, p_brand
    """,
)
def anti_join_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS (Tier B joins)."""
    t = load_tables(spark, sf_dir, ("part", "lineitem"))
    return (
        t["part"]
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"), "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), "p_brand")
    )


@register(
    "self_join_reorder_rate",
    """
    SELECT l1.l_orderkey AS orderkey, COUNT(*) AS n_pairs
    FROM lineitem l1
    JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
    WHERE l1.l_orderkey % 100 = 0
    GROUP BY l1.l_orderkey
    ORDER BY n_pairs DESC, orderkey
    LIMIT 20
    """,
)
def self_join_reorder_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self theta-join (equi key + inequality residual) — the shape used
    for range/as-of composition (SURVEY §2 Tier B joins note)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"].filter(
        F.col("l_orderkey") % 100 == 0
    )
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_linenumber") < F.col("l2.l_linenumber")),
        )
        .groupBy(F.col("l1.l_orderkey").alias("orderkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------- windows


@register(
    "topk_parts_per_brand",
    """
    SELECT p_brand, p_partkey, p_retailprice
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               ROW_NUMBER() OVER (
                   PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey
               ) AS rn
        FROM part
    ) t
    WHERE rn <= 3
    ORDER BY p_brand, p_retailprice DESC, p_partkey
    """,
)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number window (Tier B windows; SURVEY §2).
    Ordering made total with the p_partkey tiebreaker."""
    p = load_tables(spark, sf_dir, ("part",))["part"]
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
        .orderBy("p_brand", F.desc("p_retailprice"), "p_partkey")
    )


@register(
    "window_lag_order_gaps",
    """
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           CAST(COALESCE(DATEDIFF('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate), -1) AS BIGINT) AS days_since_prev
    FROM orders
    WHERE o_custkey % 50 = 0
    ORDER BY custkey, orderkey
    """,
)
def window_lag_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG + datediff per customer (Tier B windows / date functions)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"].filter(F.col("o_custkey") % 50 == 0)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn(
            "days_since_prev",
            # COALESCE(-1) keeps the column non-null so neither side's
            # pandas materialization upcasts BIGINT -> float64 (repr drift).
            F.coalesce(
                F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)), F.lit(-1)
            ).cast("bigint"),
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            "days_since_prev",
        )
        .orderBy("custkey", "orderkey")
    )


@register(
    "window_running_revenue",
    """
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
           NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    WHERE o_custkey % 100 = 0
    ORDER BY custkey, orderkey
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running frame sum + rank + ntile in one pass (Tier B windows).
    The running decimal sum uses the exact-sum pattern inside the frame."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"].filter(F.col("o_custkey") % 100 == 0)
    w_time = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn(
            "running_total",
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .over(w_time.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("double"),
        )
        .withColumn(
            "price_rank",
            F.rank().over(W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")),
        )
        .withColumn(
            "quartile",
            F.ntile(4).over(W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")),
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            "running_total",
            "price_rank",
            "quartile",
        )
        .orderBy("custkey", "orderkey")
    )


# ----------------------------------------------------------------- set ops


@register(
    "setops_segment_overlap",
    """
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
         urgent   AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                      WHERE o_orderpriority = '1-URGENT')
    SELECT 'building_and_rich' AS set_name, COUNT(*) AS count
    FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM rich) t
    UNION ALL
    SELECT 'building_not_urgent' AS set_name, COUNT(*) AS count
    FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM urgent) t
    UNION ALL
    SELECT 'building_or_rich' AS set_name, COUNT(*) AS count
    FROM (SELECT c_custkey FROM building UNION SELECT c_custkey FROM rich) t
    ORDER BY set_name
    """,
)
def setops_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION(distinct) counts (Tier B set ops)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    building = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = t["customer"].filter(F.col("c_acctbal") > 5000).select("c_custkey")
    urgent = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("count")).select(
            F.lit(name).alias("set_name"), "count"
        )

    return (
        one("building_and_rich", building.intersect(rich))
        .unionByName(one("building_not_urgent", building.exceptAll(urgent).distinct()))
        .unionByName(one("building_or_rich", building.union(rich).distinct()))
        .orderBy("set_name")
    )


# ------------------------------------------------------- scalar functions


@register(
    "scalar_string_funcs",
    """
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LOWER(p_brand) AS brand_lower,
           LENGTH(p_name) AS name_len,
           SUBSTRING(p_type, 1, 5) AS type_prefix,
           REPLACE(p_brand, 'Brand#', 'B') AS brand_short,
           CONCAT_WS('|', p_brand, p_type) AS brand_type,
           TRIM(p_name) AS name_trim,
           REGEXP_EXTRACT(p_brand, '[0-9]+', 0) AS brand_num,
           CASE WHEN CONTAINS(p_type, 'PROMO') THEN 1 ELSE 0 END AS is_promo
    FROM part
    WHERE p_partkey % 10 = 0
    ORDER BY p_partkey
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface (Tier B): case, length, substring, replace,
    concat_ws, trim, regexp_extract, contains."""
    p = load_tables(spark, sf_dir, ("part",))["part"].filter(F.col("p_partkey") % 10 == 0)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.when(F.col("p_type").contains("PROMO"), 1).otherwise(0).alias("is_promo"),
    ).orderBy("p_partkey")


@register(
    "scalar_date_funcs",
    """
    SELECT o_orderkey,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(QUARTER(o_orderdate) AS INT) AS order_quarter,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS order_dow,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date
    FROM orders
    WHERE o_orderkey % 25 = 0
    ORDER BY o_orderkey
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface (Tier B): trunc, field extraction,
    last_day, interval arithmetic.  DAYOFWEEK is 1=Sunday in both."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"].filter(F.col("o_orderkey") % 25 == 0)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        # DuckDB DAYOFWEEK is 0-based (Sunday=0); Spark is 1-based
        # (Sunday=1) — the oracle side adds 1 to line up.
        F.dayofweek("o_orderdate").cast("int").alias("order_dow"),
        # DATE-typed outputs normalize differently across engines'
        # pandas bridges; pin to timestamp on both sides.
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp").alias("month_end"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
    ).orderBy("o_orderkey")


@register(
    "scalar_math_case",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 0) AS price_round,
           CAST(ABS(l_discount - 0.05) AS DOUBLE) AS disc_dev,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(POWER(CAST(l_quantity AS DOUBLE), 2) AS DOUBLE) AS qty_sq,
           CASE
             WHEN l_quantity < 10 THEN 'small'
             WHEN l_quantity < 30 THEN 'medium'
             ELSE 'large'
           END AS qty_bucket,
           GREATEST(l_tax, l_discount) AS max_rate,
           LEAST(l_tax, l_discount) AS min_rate
    FROM lineitem
    WHERE l_orderkey % 200 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_math_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + CASE WHEN + greatest/least scalar surface (Tier B)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"].filter(F.col("l_orderkey") % 200 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 0).alias("price_round"),
        F.abs(F.col("l_discount") - 0.05).cast("double").alias("disc_dev"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.pow(F.col("l_quantity").cast("double"), 2).cast("double").alias("qty_sq"),
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
        .alias("qty_bucket"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "json_props_extract",
    """
    SELECT event_type,
           COUNT(*) AS count,
           CAST(SUM(CAST(CAST(props->>'$.k' AS BIGINT) AS DECIMAL(18,6))) AS DOUBLE) AS sum_k,
           CAST(MIN(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column (Tier B scalar
    JSON; SURVEY §2 maps it to get_json_object)."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("count"),
            exact_sum(F.col("k"), "sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "json_props_variant",
    """
    SELECT event_type,
           CAST(FLOOR(CAST(props->>'$.k' AS BIGINT) / 25) AS BIGINT) AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN props->>'$.missing' IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_missing_path
    FROM events
    GROUP BY event_type, k_bucket
    ORDER BY event_type, k_bucket
    """,
)
def json_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: the props
    JSON is parsed ONCE into a variant (`parse_json`), then fields come
    out via typed `variant_get` / `try_variant_get` paths — the
    open-schema ingestion shape (parse once, bind types per query)
    that replaces per-field `get_json_object` string re-parsing.

    Scale: variant parse is one codegen'd pass per row; every
    subsequent path access reads the decoded binary, so wide queries
    touching many fields don't multiply parse cost the way chained
    get_json_object calls do.  `try_variant_get` on an absent path
    yields NULL (counted per group) instead of failing the batch."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.missing", "string")
    return (
        e.select(
            "event_type",
            k.alias("k"),
            F.floor(k / F.lit(25)).cast("bigint").alias("k_bucket"),
            missing.alias("m"),
        )
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.sum(F.when(F.col("m").isNull(), 1).otherwise(0)).cast("bigint").alias("n_missing_path"),
        )
        .orderBy("event_type", "k_bucket")
    )


@register(
    "predicates_in_like_between",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_orderpriority LIKE '1-%'
      AND o_totalprice BETWEEN 1000 AND 50000
      AND o_custkey IS NOT NULL
    ORDER BY o_orderkey
    """,
)
def predicates_in_like_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full predicate language: IN, LIKE, BETWEEN, IS NOT NULL, AND-chain
    (A8-A10 generalized; Tier B filters)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.filter(F.col("o_orderstatus").isin("F", "P"))
        .filter(F.col("o_orderpriority").like("1-%"))
        .filter(F.col("o_totalprice").between(1000, 50000))
        .filter(F.col("o_custkey").isNotNull())
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "pivot_status_by_segment",
    """
    SELECT c_mktsegment,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (Spark) == FILTERed counts (ANSI oracle).  Explicit pivot
    value list avoids the extra distinct-values job at scale."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    joined = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    return (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .select(
            "c_mktsegment",
            F.col("F").alias("f_orders"),
            F.col("O").alias("o_orders"),
            F.col("P").alias("p_orders"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "dedup_collapse_returnflags",
    """
    SELECT l_returnflag, l_linestatus, l_shipmode_dummy, COUNT(*) AS count
    FROM (
        SELECT l_returnflag, l_linestatus,
               CAST(l_linenumber % 3 AS INT) AS l_shipmode_dummy
        FROM lineitem
    ) t
    GROUP BY l_returnflag, l_linestatus, l_shipmode_dummy
    ORDER BY count DESC, l_returnflag, l_linestatus, l_shipmode_dummy
    """,
)
def dedup_collapse_returnflags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A17 dedup-collapse as a distributed plan: group by ALL
    columns, count, sort desc (reference query.py:49-58 did this in pandas
    on the driver; here it is a shuffle agg).  Null-key policy: Spark
    keeps null group keys (pandas silently drops them) — documented fix,
    SURVEY §2 A17."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    proj = li.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("l_linenumber") % 3).cast("int").alias("l_shipmode_dummy"),
    )
    return (
        proj.groupBy(*proj.columns)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), "l_returnflag", "l_linestatus", "l_shipmode_dummy")
    )


@register(
    "correlated_scalar_subquery",
    """
    SELECT p.p_brand AS brand,
           COUNT(*) AS n_above_brand_avg
    FROM part p
    JOIN (
        SELECT p_brand, CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price
        FROM part GROUP BY p_brand
    ) b ON p.p_brand = b.p_brand
    WHERE p.p_retailprice > b.avg_price
    GROUP BY p.p_brand
    ORDER BY brand
    """,
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group average comparison (decorrelated into a join — the plan
    Catalyst produces for the correlated form; written explicitly)."""
    p = load_tables(spark, sf_dir, ("part",))["part"]
    avg_b = p.groupBy(F.col("p_brand").alias("b_brand")).agg(exact_avg(F.col("p_retailprice"), "avg_price"))
    return (
        p.join(F.broadcast(avg_b), F.col("p_brand") == F.col("b_brand"))
        .filter(F.col("p_retailprice") > F.col("avg_price"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count(F.lit(1)).alias("n_above_brand_avg"))
        .orderBy("brand")
    )


@register(
    "percentiles_extprice_by_flag",
    """
    SELECT l_returnflag AS flag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           COUNT(*) AS count
    FROM lineitem
    GROUP BY flag
    ORDER BY flag
    """,
)
def percentiles_extprice_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (median / p90) per return flag
    (Tier B aggregations row — ordered-set aggregates). Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` both use linear
    interpolation (R type-7); outputs rounded to 4 decimals on both
    sides to absorb last-ulp drift.

    Scale: exact percentile needs the per-group value multiset — fine
    for low-cardinality groups (3 flags).  For high-cardinality groups
    the EXACT scale path is operators/selection.py::
    grouped_exact_quantiles (distributed per-group range-bucket
    descent, buffers bounded by direct_limit — the
    orders_monthly_exact_quantiles query, round 9); the approximate
    path is ``approx_percentile`` (t-digest, mergeable map-side),
    whose values are engine-specific and hence not oracle-paired.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            # one ordered-set pass for both quantiles (array form), not
            # two independent sorts of the per-group multiset
            F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("_q"),
            F.count(F.lit(1)).alias("count"),
        )
        .select(
            "flag",
            F.round(F.col("_q")[0], 4).alias("p50"),
            F.round(F.col("_q")[1], 4).alias("p90"),
            "count",
        )
        .orderBy("flag")
    )


@register(
    "window_rank_lead_quartile",
    """
    SELECT o_orderkey AS orderkey,
           o_orderpriority AS priority,
           DENSE_RANK() OVER w AS rnk,
           NTILE(4) OVER w AS quartile,
           CAST(COALESCE(LEAD(o_orderkey) OVER w, -1) AS BIGINT) AS next_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS top_orderkey
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY priority, rnk, orderkey
    """,
)
def window_rank_lead_quartile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank + ntile + lead + first_value over one window (Tier B
    windows row). The ordering is made total (totalprice desc, orderkey)
    so rank/ntile/lead agree across engines; LEAD at the partition edge
    is coalesced to -1 to keep the BIGINT column non-null (pandas
    upcast-to-float repr drift)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"].filter(F.col("o_custkey") % 100 == 0)
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderpriority").alias("priority"),
            F.dense_rank().over(w).alias("rnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.coalesce(F.lead("o_orderkey").over(w), F.lit(-1)).cast("bigint").alias("next_orderkey"),
            F.first("o_orderkey").over(w).alias("top_orderkey"),
        )
        .orderBy("priority", "rnk", "orderkey")
    )


def _passthrough(spark: SparkSession, sf_dir: str, tables: tuple, sql: str) -> DataFrame:
    """Tier B pass-through execution path: register temp views, gate the
    SQL through the engine's validator (token + parsed-plan checks —
    nlsql/validator.py), then spark.sql. The same route engine.QueryEngine
    .sql() takes, exercised by the driver contract."""
    from csv_query_engine_spark.nlsql.validator import validate_sql

    t = load_tables(spark, sf_dir, tables)
    for name, df in t.items():
        df.createOrReplaceTempView(name)
    return spark.sql(validate_sql(sql, spark=spark))


@register(
    "groupingsets_priority_status",
    """
    SELECT COALESCE(o_orderpriority, '<ALL>') AS priority,
           COALESCE(o_orderstatus, '<ALL>') AS status,
           COUNT(*) AS count
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    ORDER BY priority, status
    """,
)
def groupingsets_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the validated SQL pass-through
    (Tier B grouping sets row; rollup/cube cover the DataFrame forms).
    NULL set markers coalesced to sentinels on both sides."""
    return _passthrough(
        spark,
        sf_dir,
        ("orders",),
        """
        SELECT COALESCE(o_orderpriority, '<ALL>') AS priority,
               COALESCE(o_orderstatus, '<ALL>') AS status,
               COUNT(*) AS count
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY priority, status
        """,
    )


@register(
    "exists_customers_with_open_high_value",
    """
    SELECT c.c_mktsegment AS segment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O' AND o.o_totalprice > 150000
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o2
        WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F' AND o2.o_totalprice < 5000
    )
    GROUP BY segment
    ORDER BY segment
    """,
)
def exists_customers_with_open_high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the validated pass-through —
    Catalyst decorrelates to semi/anti joins (the plan the DataFrame
    semi/anti queries build explicitly)."""
    return _passthrough(
        spark,
        sf_dir,
        ("customer", "orders"),
        """
        SELECT c.c_mktsegment AS segment, COUNT(*) AS n_customers
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O' AND o.o_totalprice > 150000
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o2
            WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F' AND o2.o_totalprice < 5000
        )
        GROUP BY segment
        ORDER BY segment
        """,
    )


@register(
    "array_funcs_embeddings",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
           ROUND(CAST(list_sum(list_transform(list_slice(embedding, 1, 8),
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE), 6) AS head_energy
    FROM embeddings
    WHERE vec_id % 200 = 0
    ORDER BY vec_id
    """,
)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over the embeddings column (Tier B scalar
    functions row: size/element_at/array_max/slice/transform/aggregate).
    Per-element float->double casts ordered identically on both sides."""
    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"].filter(F.col("vec_id") % 200 == 0)
    head_sq = F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double") * x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(F.aggregate(head_sq, F.lit(0.0), lambda a, x: a + x), 6).alias("head_energy"),
    ).orderBy("vec_id")


@register("sketch_approx_aggregates", None)
def sketch_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates per event_type: HyperLogLog++ distinct users and
    t-digest value quantiles. Registered rows-only — sketch estimates
    are engine-specific by construction; accuracy vs exact is asserted
    in tests.

    Scale: this IS the high-cardinality path — both sketches are fixed-
    size and mergeable, so map-side partials stay bounded no matter how
    many distinct users a partition holds (exact distinct would shuffle
    every key). rsd=0.01 -> ~1.5 KB HLL registers per group.

    Quantiles are projected to scalar p50/p99 columns (not an array):
    the driver's result canonicalizer sorts pandas frames, and array
    cells are unhashable there."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    q = F.percentile_approx("value", [0.5, 0.99], 10_000)
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            q.getItem(0).alias("p50"),
            q.getItem(1).alias("p99"),
            F.count(F.lit(1)).alias("count"),
        )
        .orderBy("event_type")
    )


@register(
    "unpivot_part_measures",
    """
    SELECT p_partkey, measure, val
    FROM (
        UNPIVOT (SELECT p_partkey,
                        CAST(p_retailprice AS DOUBLE) AS retailprice,
                        CAST(p_size AS DOUBLE) AS size
                 FROM part WHERE p_partkey % 100 = 0)
        ON retailprice, size INTO NAME measure VALUE val
    )
    ORDER BY p_partkey, measure
    """,
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (Tier B reshaping — the inverse of the pivot
    query): wide measure columns to (measure, value) rows. Map-side
    expansion, no shuffle except the presentation sort."""
    p = load_tables(spark, sf_dir, ("part",))["part"].filter(F.col("p_partkey") % 100 == 0)
    wide = p.select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return wide.unpivot(
        ids=["p_partkey"],
        values=["retailprice", "size"],
        variableColumnName="measure",
        valueColumnName="val",
    ).orderBy("p_partkey", "measure")


@register(
    "window_range_frame_moving_sum",
    """
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           CAST(SUM(CAST(ROUND(ROUND(o_totalprice, 6) * 1000000, 0) AS BIGINT)) OVER (
               PARTITION BY o_custkey
               ORDER BY DATEDIFF('day', TIMESTAMP '1970-01-01', o_orderdate)
               RANGE BETWEEN 90 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_90d_micro
    FROM orders
    WHERE o_custkey % 100 = 0
    ORDER BY custkey, orderkey
    """,
)
def window_range_frame_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, vs the row-based frames
    elsewhere): trailing-90-day order total per customer, frame keyed on
    days-since-epoch so date peers merge identically in both engines.
    Output stays in exact fixed-point micros (BIGINT) — a windowed float
    sum would drift by summation order across engines."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"].filter(F.col("o_custkey") % 100 == 0)
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-90, 0)
    )
    return (
        o.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.sum(_unscaled(F.col("o_totalprice"), 6)).over(w).cast("bigint").alias("trailing_90d_micro"),
        )
        .orderBy("custkey", "orderkey")
    )


@register(
    "collect_priorities_per_segment",
    """
    SELECT c.c_mktsegment AS segment,
           array_to_string(list_sort(list_distinct(list(o.o_orderpriority))), '|') AS priorities,
           COUNT(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY segment
    ORDER BY segment
    """,
)
def collect_priorities_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set aggregation (Tier B aggregations row) — distinct
    priorities seen per market segment, sorted and string-joined so the
    set compares deterministically across engines (array reprs differ).
    Scale: collect_set state is bounded by the value domain (5
    priorities), not group size."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    j = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    return (
        j.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.concat_ws("|", F.array_sort(F.collect_set("o_orderpriority"))).alias("priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("segment")
    )


@register(
    "having_high_volume_customers",
    f"""
    SELECT c_custkey, c_name,
           {_sql_exact_sum('l_quantity', 'sum_qty')},
           COUNT(DISTINCT o_orderkey) AS n_orders
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 1500.0
    ORDER BY sum_qty DESC, c_custkey
    """,
)
def having_high_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (TPC-H Q18 shape): customers whose total ordered
    quantity exceeds a threshold — post-aggregation filtering, the one
    WHERE-vs-HAVING distinction the Tier-B surface exposes.  The HAVING
    predicate compares the exact sum, so the cut is identical across
    engines even at the threshold boundary.

    Scale: lineitem pre-aggregates per orderkey FIRST (its natural join
    key, so the partial sums collapse ~4 lineitems/order before anything
    shuffles wide), which also turns COUNT(DISTINCT o_orderkey) into a
    plain COUNT — no distinct-expand double shuffle. The per-order sums
    carry the exact-sum unscaled-long buffer so two-level summation stays
    bit-identical to the one-level form. HAVING shrinks the agg output
    *before* the customer join, so the name lookup touches the surviving
    ~10% of groups.
    """
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer"))
    per_order = t["lineitem"].groupBy("l_orderkey").agg(
        F.sum(_unscaled(F.col("l_quantity"), 6)).alias("__qty_u")
    )
    agg = (
        per_order.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            (F.sum("__qty_u").cast("decimal(38,6)") / F.lit(10**6).cast("decimal(12,0)"))
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("sum_qty") > 1500.0)
    )
    return (
        agg.join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "sum_qty", "n_orders")
        .orderBy(F.desc("sum_qty"), "c_custkey")
    )


@register(
    "window_distribution_funcs",
    """
    SELECT o_orderkey,
           o_orderpriority AS priority,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY priority, o_orderkey
    """,
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (Tier B windows): percent_rank and
    cume_dist of each order's price within its priority class.  The
    window ORDER BY carries the o_orderkey tiebreaker so ranks are
    tie-free and both engines compute the identical (rank-1)/(n-1) and
    rank/n ratios — exact in double, no epsilon needed.

    Scale: one shuffle on the partition key; rank math is a single sort
    per partition with no extra pass (cume_dist reuses the same sorted
    run). Skewed priority classes fall under AQE's purview like any
    window — 5 priorities means ~n/5 rows per class, uniform here.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"].filter(F.col("o_custkey") % 100 == 0)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            F.col("o_orderpriority").alias("priority"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("priority", "o_orderkey")
    )


@register(
    "q10_returned_item_report",
    f"""
    SELECT c.c_custkey, c.c_name, {_sql_exact_sum(REVENUE, 'revenue')},
           n.n_name AS nation, c.c_acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item report): customers who returned the most
    revenue in a quarter. Classic fact-fact join + small-dim broadcast +
    grouped exact-sum + top-k with a unique-key tiebreaker under LIMIT.

    Scale: the date filter pushes to the orders scan and the returnflag
    filter to the lineitem scan before either shuffles; nation
    broadcasts; top-20 is TakeOrdered, never a global sort."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"), "c_acctbal")
        .agg(exact_sum(_revenue_col(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "nation", "c_acctbal")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register("sketch_user_rollup", None)
def sketch_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE-sketch rollup — the other half of the sketch story
    next to sketch_approx_aggregates' one-shot estimates: per-day
    DataSketches HLL sketches of the user set are built ONCE (the
    expensive pass over the raw events), then re-aggregated by UNIONING
    SKETCH STATE (`hll_union_agg`) to per-type totals — the raw data is
    never re-read.  At 100 TB this is the pre-aggregation pattern:
    persist daily sketch tables (~KBs/group), answer any later
    cross-day distinct-count rollup from sketches alone.

    Rows-only: DataSketches estimates are engine-specific; the merge
    identity (union-of-daily == direct-global) and the error bound vs
    exact are pinned in tests/test_sketches.py."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    daily = e.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias(
                "approx_users"
            ),
        )
        .orderBy("event_type")
    )
