"""Temporal join query coverage: as-of join + banded range join over
events × orders (SURVEY.md §2 Tier B joins row — "range/as-of joins:
compose with inequality conditions"; the reference exposes DuckDB's ASOF
JOIN only by pass-through, reference sql_generator.py:85-94 /
query.py:44, with no dedicated code of its own).

Oracle SQL is written in the ANSI window-function form (row_number over
the inequality join) so DuckDB executes the same semantics the Spark
side produces with the linear union-sort operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_query_engine_spark.io.readers import load_tables
from csv_query_engine_spark.operators.temporal import asof_join, range_join_banded
from csv_query_engine_spark.queries import register


@register(
    "asof_join_last_order_before_event",
    """
    WITH ranked AS (
        SELECT e.event_id, e.user_id,
               o.o_orderkey, o.o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
               ) AS rn
        FROM events e
        JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id,
           o_orderkey AS last_orderkey,
           o_totalprice AS last_totalprice
    FROM ranked WHERE rn = 1
    ORDER BY event_id
    """,
)
def asof_join_last_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event picks up the most recent order of
    the same customer at-or-before the event timestamp (ties on
    o_orderdate broken by greatest o_orderkey — deterministic).

    Scale: the union-sort operator shuffles events+orders ONCE on the
    customer key and fills forward in a single ordered pass — linear,
    vs the oracle's inequality-join form which materializes every
    (event, earlier-order) pair per key before pruning (quadratic on
    hot customers).
    """
    t = load_tables(spark, sf_dir, ("orders",))
    events = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id", F.col("user_id"), "ts"
    )
    orders = t["orders"].select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey", "o_totalprice"
    )
    joined = asof_join(
        events,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
        tiebreak_cols=["o_orderkey"],
        how="inner",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    ).orderBy("event_id")


@register(
    "range_join_shipments_within_month",
    """
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_lineitems,
           COUNT(DISTINCT l.l_orderkey) AS n_orders
    FROM lineitem l
    JOIN orders o
      ON o.o_orderkey = l.l_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY priority
    ORDER BY priority
    """,
)
def range_join_shipments_within_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: line items shipped inside the 30-day window
    after their order's date, aggregated per order priority.

    Scale: the equi key (orderkey) carries the shuffle; the band is a
    post-join filter inside the hash join — no interval bucketing
    needed when a key exists.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"].select(
        F.col("l_orderkey").alias("okey"), "l_shipdate"
    )
    orders = load_tables(spark, sf_dir, ("orders",))["orders"].select(
        F.col("o_orderkey").alias("okey"), "o_orderdate", "o_orderpriority"
    )
    joined = range_join_banded(
        li,
        orders,
        on="okey",
        left_ts="l_shipdate",
        right_start="o_orderdate",
        right_end_expr="o_orderdate + INTERVAL 30 DAYS",
    )
    return (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.countDistinct("okey").alias("n_orders"),
        )
        .orderBy("priority")
    )


@register(
    "events_resample_ffill",
    """
    WITH cells AS (
        SELECT user_id AS key,
               CAST(time_bucket(INTERVAL '6 hours', ts) AS TIMESTAMP) AS grid_ts,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS bucket_value
        FROM events GROUP BY 1, 2
    ),
    spans AS (SELECT key, MIN(grid_ts) AS lo, MAX(grid_ts) AS hi FROM cells GROUP BY key),
    grid AS (
        SELECT key, unnest(generate_series(lo, hi, INTERVAL '6 hours')) AS grid_ts FROM spans
    )
    SELECT g.key AS user_id,
           CAST(g.grid_ts AS TIMESTAMP) AS grid_ts,
           CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events,
           COALESCE(c.bucket_value, -1.0) AS bucket_value,
           LAST_VALUE(c.bucket_value IGNORE NULLS) OVER (
               PARTITION BY g.key ORDER BY g.grid_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM grid g LEFT JOIN cells c ON g.key = c.key AND g.grid_ts = c.grid_ts
    ORDER BY user_id, grid_ts
    """,
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 6-hour grid resampling with forward fill
    (operators.temporal.resample_with_ffill) — the temporal alignment
    every feature pipeline runs before joining event-derived features.
    Empty grid cells report the -1.0 sentinel for their own bucket sum
    (NULL on both engines would drift the pandas repr) and carry the
    last observed bucket value forward."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    from csv_query_engine_spark.operators.temporal import resample_with_ffill

    out = resample_with_ffill(e)
    return out.select(
        "user_id",
        "grid_ts",
        "n_events",
        F.coalesce("bucket_value", F.lit(-1.0)).alias("bucket_value"),
        "filled_value",
    ).orderBy("user_id", "grid_ts")
