"""Registry queries for the MERGE / SCD2 operators (operators/merge.py).

Both queries are fully SQL-expressible, so they carry DuckDB oracles:
the type-1 merge is a CASE projection + UNION of the insert set; the
type-2 history is the UNION of closed-out rows, new open versions and
untouched rows.  NULL valid_to (open version) is COALESCEd to the
2200-01-01 sentinel on BOTH sides (CLAUDE.md nullable-output rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_query_engine_spark.io.readers import load_tables
from csv_query_engine_spark.operators.merge import merge_upsert, scd2_apply
from csv_query_engine_spark.queries import register
from csv_query_engine_spark.queries.relational import exact_sum


@register(
    "merge_upsert_customer_refresh",
    """
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_acctbal < 0.0 THEN 0.0 ELSE c_acctbal END AS c_acctbal,
           c_mktsegment
    FROM customer
    UNION ALL
    SELECT 1000000 + n_nationkey, 'Customer#NEW_' || CAST(n_nationkey AS VARCHAR),
           n_nationkey, 0.0, 'NEW'
    FROM nation
    ORDER BY c_custkey
    """,
)
def merge_upsert_customer_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-1 MERGE: a change set that (a) resets negative customer
    balances to zero and (b) inserts one synthetic onboarding customer
    per nation, applied to the customer dimension in one upsert.

    Scale: ONE full-outer shuffle join on c_custkey resolves update /
    insert / carry-through column-wise (operators/merge.py) — the plan
    a Delta/Iceberg MERGE compiles to, with no per-row lookups; the
    update set is built from a pushed-down scan filter and the insert
    set from the 25-row nation dim."""
    t = load_tables(spark, sf_dir, ("customer", "nation"))
    cust = t["customer"]
    updates = cust.filter(F.col("c_acctbal") < 0.0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    inserts = t["nation"].select(
        (F.lit(1000000) + F.col("n_nationkey")).alias("c_custkey"),
        F.concat(F.lit("Customer#NEW_"), F.col("n_nationkey").cast("string")).alias("c_name"),
        F.col("n_nationkey").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    merged = merge_upsert(cust, updates.unionByName(inserts), ["c_custkey"])
    return merged.orderBy("c_custkey")


@register(
    "scd2_customer_segment_history",
    """
    WITH big AS (
        SELECT o_custkey
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        GROUP BY o_custkey
        HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) > 1200000.0
    )
    SELECT c.c_custkey, c.c_mktsegment AS segment,
           TIMESTAMP '1995-01-01' AS valid_from,
           TIMESTAMP '2000-01-01' AS valid_to,
           FALSE AS is_current
    FROM customer c JOIN big b ON c.c_custkey = b.o_custkey
    WHERE c.c_mktsegment <> 'PREMIUM'
    UNION ALL
    SELECT c.c_custkey, 'PREMIUM', TIMESTAMP '2000-01-01',
           TIMESTAMP '2200-01-01', TRUE
    FROM customer c JOIN big b ON c.c_custkey = b.o_custkey
    WHERE c.c_mktsegment <> 'PREMIUM'
    UNION ALL
    SELECT c.c_custkey, c.c_mktsegment, TIMESTAMP '1995-01-01',
           TIMESTAMP '2200-01-01', TRUE
    FROM customer c
    WHERE c.c_custkey NOT IN (SELECT o_custkey FROM big)
       OR c.c_mktsegment = 'PREMIUM'
    ORDER BY c_custkey, valid_from
    """,
)
def scd2_customer_segment_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD: customers whose post-2000 spend crosses a threshold
    move to the PREMIUM segment effective 2000-01-01; the dimension
    history closes their original version at that date and opens a new
    one, leaving everyone else untouched.

    Scale: the change set is a partial+final aggregate on o_custkey
    with an exact-sum threshold (bit-stable vs the oracle); scd2_apply
    is one full-outer shuffle join on the key plus unions — no windows
    over the dimension, no collect.  The no-op path (already-PREMIUM
    changes collapse to nothing) keeps re-application idempotent."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    dim = t["customer"].select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = (
        t["orders"]
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .groupBy("o_custkey")
        .agg(exact_sum(F.col("o_totalprice"), "_spend"))
        .filter(F.col("_spend") > 1200000.0)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.lit("PREMIUM").alias("c_mktsegment"),
            F.lit("2000-01-01").cast("timestamp").alias("change_ts"),
        )
    )
    hist = scd2_apply(
        dim, changes, ["c_custkey"], ["c_mktsegment"], "change_ts"
    )
    return hist.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        "valid_from",
        F.coalesce(F.col("valid_to"), F.lit("2200-01-01").cast("timestamp")).alias("valid_to"),
        "is_current",
    ).orderBy("c_custkey", "valid_from")


@register(
    "scd2_snapshot_asof",
    """
    WITH big AS (
        SELECT o_custkey
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        GROUP BY o_custkey
        HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) > 1200000.0
    ),
    hist AS (
        SELECT c.c_custkey, c.c_mktsegment AS segment,
               TIMESTAMP '1995-01-01' AS valid_from,
               TIMESTAMP '2000-01-01' AS valid_to
        FROM customer c JOIN big b ON c.c_custkey = b.o_custkey
        WHERE c.c_mktsegment <> 'PREMIUM'
        UNION ALL
        SELECT c.c_custkey, 'PREMIUM', TIMESTAMP '2000-01-01', NULL
        FROM customer c JOIN big b ON c.c_custkey = b.o_custkey
        WHERE c.c_mktsegment <> 'PREMIUM'
        UNION ALL
        SELECT c.c_custkey, c.c_mktsegment, TIMESTAMP '1995-01-01', NULL
        FROM customer c
        WHERE c.c_custkey NOT IN (SELECT o_custkey FROM big)
           OR c.c_mktsegment = 'PREMIUM'
    ),
    snap AS (
        SELECT CAST(t.as_of AS TIMESTAMP) AS as_of, h.segment
        FROM (VALUES (TIMESTAMP '1999-06-01'), (TIMESTAMP '2000-06-01')) t(as_of)
        JOIN hist h
          ON h.valid_from <= t.as_of AND (h.valid_to IS NULL OR h.valid_to > t.as_of)
    )
    SELECT as_of, segment, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM snap GROUP BY as_of, segment
    ORDER BY as_of, segment
    """,
)
def scd2_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The READ side of the SCD2 contract: reconstruct the dimension AS
    OF two instants — before the 2000-01-01 segment change (original
    segments) and after (movers counted under PREMIUM) — from the same
    versioned history scd2_customer_segment_history builds. Per-segment
    membership counts at each as-of date.

    Scale: the as-of predicate (valid_from <= t < valid_to) is a
    broadcast-join of the 2-row instant table against the history —
    at a real SF the history parquet is partitioned by is_current so
    current-snapshot queries prune to the open partition; both
    snapshots here read the history once."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    dim = t["customer"].select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = (
        t["orders"]
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .groupBy("o_custkey")
        .agg(exact_sum(F.col("o_totalprice"), "_spend"))
        .filter(F.col("_spend") > 1200000.0)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.lit("PREMIUM").alias("c_mktsegment"),
            F.lit("2000-01-01").cast("timestamp").alias("change_ts"),
        )
    )
    hist = scd2_apply(dim, changes, ["c_custkey"], ["c_mktsegment"], "change_ts")
    as_of = spark.createDataFrame(
        [("1999-06-01",), ("2000-06-01",)], "asof_s string"
    ).select(F.col("asof_s").cast("timestamp").alias("as_of"))
    return (
        hist.join(
            F.broadcast(as_of),
            (F.col("valid_from") <= F.col("as_of"))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("as_of"))),
        )
        .groupBy("as_of", F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("as_of", "segment")
    )


@register(
    "customer_snapshot_cdc_diff",
    """
    WITH old AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 13 <> 0
    ),
    new AS (
        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
                    ELSE c_acctbal END AS c_acctbal,
               CASE WHEN c_custkey % 9 = 0 THEN 'MOVED'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer WHERE c_custkey % 17 <> 0
    )
    SELECT COALESCE(n.c_custkey, o.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'insert'
                WHEN n.c_custkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           CASE WHEN o.c_custkey IS NULL OR n.c_custkey IS NULL THEN ''
                ELSE CONCAT_WS(',',
                    CASE WHEN n.c_acctbal IS DISTINCT FROM o.c_acctbal
                         THEN 'c_acctbal' END,
                    CASE WHEN n.c_mktsegment IS DISTINCT FROM o.c_mktsegment
                         THEN 'c_mktsegment' END,
                    CASE WHEN n.c_name IS DISTINCT FROM o.c_name
                         THEN 'c_name' END,
                    CASE WHEN n.c_nationkey IS DISTINCT FROM o.c_nationkey
                         THEN 'c_nationkey' END)
           END AS changed_cols_csv,
           COALESCE(n.c_acctbal, -99999.0) AS c_acctbal,
           COALESCE(n.c_mktsegment, '') AS c_mktsegment
    FROM new n FULL OUTER JOIN old o ON n.c_custkey = o.c_custkey
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR n.c_acctbal IS DISTINCT FROM o.c_acctbal
       OR n.c_mktsegment IS DISTINCT FROM o.c_mktsegment
       OR n.c_name IS DISTINCT FROM o.c_name
       OR n.c_nationkey IS DISTINCT FROM o.c_nationkey
    ORDER BY c_custkey
    """,
)
def customer_snapshot_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC extraction between two deterministic snapshots of the
    customer dimension (operators/merge.snapshot_diff): keys dropped
    from the new snapshot surface as deletes, keys absent from the old
    as inserts, attribute drift as updates with the sorted changed-
    column list.  Completes the maintenance trio — snapshot_diff
    applied back via merge_upsert reproduces the new snapshot
    (property-tested in tests/test_merge.py).

    Scale: one full-outer key join, output proportional to the CHANGE
    volume, never the snapshot size.  changed_cols surfaces as a
    comma-joined string (cross-engine array reprs differ); nullable
    delete-side outputs COALESCE to sentinels on both sides
    (CLAUDE.md)."""
    from csv_query_engine_spark.operators.merge import snapshot_diff

    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    old = cust.filter(F.col("c_custkey") % 13 != 0)
    new = cust.filter(F.col("c_custkey") % 17 != 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.when(F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + F.lit(100.0))
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        F.when(F.col("c_custkey") % 9 == 0, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    d = snapshot_diff(old, new, ["c_custkey"])
    return d.select(
        "c_custkey",
        "change_type",
        F.array_join(F.col("changed_cols"), ",").alias("changed_cols_csv"),
        F.coalesce(F.col("c_acctbal"), F.lit(-99999.0)).alias("c_acctbal"),
        F.coalesce(F.col("c_mktsegment"), F.lit("")).alias("c_mktsegment"),
    ).orderBy("c_custkey")


@register(
    "orders_incremental_agg_refresh",
    """
    SELECT o_orderpriority,
           CAST(DATE_TRUNC('year', o_orderdate) AS TIMESTAMP) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM orders
    WHERE NOT (o_orderpriority = '5-LOW' AND o_orderdate < TIMESTAMP '1996-01-01')
    GROUP BY o_orderpriority, order_year
    ORDER BY o_orderpriority, order_year
    """,
)
def orders_incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance
    (operators/merge.aggregate_state / refresh_aggregate): the standing
    per-(priority, year) order aggregate is refreshed by merging (a) a
    late-arriving delta batch (1997+ orders) and (b) a retraction
    batch (low-priority pre-1996 orders withdrawn) — the base rows are
    never re-read.  Because state buffers are unscaled fixed-point
    longs, merge is associative long addition, so the incrementally-
    maintained state is BIT-EQUAL to the full recompute the oracle
    runs — the invariant that makes incremental refresh trustworthy
    at 100 TB (re-aggregating the base would be the whole point lost).

    Scale: each state build is one partial+final agg over only its
    batch; the merge aggregates the tiny key-space union.  State
    cardinality = |priorities| × |years|, trivially broadcastable."""
    from csv_query_engine_spark.operators.merge import aggregate_state, refresh_aggregate

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    keyed = orders.select(
        "o_orderpriority",
        F.date_trunc("year", F.col("o_orderdate")).alias("order_year"),
        "o_totalprice",
        "o_orderdate",
    )
    cutoff = F.lit("1997-01-01").cast("timestamp")
    keys = ["o_orderpriority", "order_year"]
    sums = {"price_u": F.col("o_totalprice")}
    base = aggregate_state(keyed.filter(F.col("o_orderdate") < cutoff), keys, sums)
    delta = aggregate_state(keyed.filter(F.col("o_orderdate") >= cutoff), keys, sums)
    retract = aggregate_state(
        keyed.filter(
            (F.col("o_orderpriority") == "5-LOW")
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        ),
        keys,
        sums,
        sign=-1,
    )
    state = refresh_aggregate(base, delta, keys, ["price_u"])
    state = refresh_aggregate(state, retract, keys, ["price_u"])
    return state.select(
        "o_orderpriority",
        "order_year",
        F.col("n"),
        (
            F.col("price_u").cast("decimal(38,6)")
            / F.lit(10**6).cast("decimal(12,0)")
        )
        .cast("double")
        .alias("total_price"),
    ).orderBy("o_orderpriority", "order_year")


@register(
    "orders_customer_join_ivm",
    """
    WITH fact AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
                         AND o_orderkey % 17 = 0 AND o_orderkey % 13 <> 0
                    THEN o_totalprice + 100.0 ELSE o_totalprice
               END AS o_totalprice
        FROM orders
        WHERE NOT (o_orderdate < TIMESTAMP '1997-01-01' AND o_orderkey % 13 = 0)
    ),
    dim AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 0 THEN 'PREMIUM' ELSE c_mktsegment
               END AS c_mktsegment
        FROM customer
        WHERE c_custkey % 997 <> 0
    )
    SELECT c_mktsegment, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM fact JOIN dim ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderstatus
    ORDER BY c_mktsegment, o_orderstatus
    """,
)
def orders_customer_join_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance (operators/merge.py::
    refresh_join_view / refresh_join_view_dim) — the join sibling of
    orders_incremental_agg_refresh: a materialized orders ⋈ customer
    view (pre-1997 orders) absorbs (a) a fact-side change batch —
    1997+ inserts, deletes of every 13th base order, +100.00 price
    corrections on every 17th — and (b) a dim-side batch — every 10th
    customer re-segmented to PREMIUM, every 997th erased — WITHOUT
    re-reading the base fact or re-running the base join.  The oracle
    recomputes fact' ⋈ dim' from scratch; row-equality of the final
    aggregate is the IVM trust property (delete-then-reinsert on the
    fact key, column-overwrite / drop on the dim key).

    Scale: the view is never shuffled — the anti join broadcasts the
    bounded per-batch delta key set; the re-derive join touches
    delta-many rows; the dim batch is a broadcast column overwrite.
    The final aggregate here exists only to keep the certified result
    small."""
    from csv_query_engine_spark.operators.merge import (
        refresh_join_view,
        refresh_join_view_dim,
    )

    t = load_tables(spark, sf_dir, ("orders", "customer"))
    orders, cust = t["orders"], t["customer"]
    fact_cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    dim = cust.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    base = orders.filter(F.col("o_orderdate") < cutoff)
    view = base.select(*fact_cols).join(dim, "o_custkey").select(
        *fact_cols, "c_mktsegment"
    )

    ch = "change_type"
    inserts = (
        orders.filter(F.col("o_orderdate") >= cutoff)
        .select(*fact_cols)
        .withColumn(ch, F.lit("upsert"))
    )
    deletes = (
        base.filter(F.col("o_orderkey") % 13 == 0)
        .select(*fact_cols)
        .withColumn(ch, F.lit("delete"))
    )
    updates = (
        base.filter((F.col("o_orderkey") % 17 == 0) & (F.col("o_orderkey") % 13 != 0))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
        )
        .withColumn(ch, F.lit("upsert"))
    )
    fact_delta = inserts.unionByName(deletes).unionByName(updates)
    v1 = refresh_join_view(view, fact_delta, dim, ["o_orderkey"], ["o_custkey"])

    dim_updates = (
        cust.filter((F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") % 997 != 0))
        .select(
            F.col("c_custkey").alias("o_custkey"),
            F.lit("PREMIUM").alias("c_mktsegment"),
        )
        .withColumn(ch, F.lit("upsert"))
    )
    dim_deletes = cust.filter(F.col("c_custkey") % 997 == 0).select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    ).withColumn(ch, F.lit("delete"))
    v2 = refresh_join_view_dim(
        v1, dim_updates.unionByName(dim_deletes), ["o_custkey"], ["c_mktsegment"]
    )

    return (
        v2.groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            exact_sum(F.col("o_totalprice"), "total_price"),
        )
        .orderBy("c_mktsegment", "o_orderstatus")
    )


@register(
    "orders_customer_join_agg_ivm",
    """
    WITH fact AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
                         AND o_orderkey % 17 = 0 AND o_orderkey % 13 <> 0
                    THEN o_totalprice + 100.0 ELSE o_totalprice
               END AS o_totalprice
        FROM orders
        WHERE NOT (o_orderdate < TIMESTAMP '1997-01-01' AND o_orderkey % 13 = 0)
    )
    SELECT c_mktsegment, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM fact JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderstatus
    ORDER BY c_mktsegment, o_orderstatus
    """,
)
def orders_customer_join_agg_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full IVM stack composed (operators/merge.py::
    refresh_join_aggregate): a grouped revenue aggregate OVER the
    materialized orders ⋈ customer view absorbs the same fact-side
    change batch as orders_customer_join_ivm — retractions read the
    OLD joined contributions from the VIEW (the base fact is never
    re-read), insertions aggregate the delta ⋈ dim rows, and both fold
    into the standing state as unscaled-long addition.  The oracle
    re-aggregates fact' ⋈ customer from scratch; BIT-equality of the
    maintained state to the full recompute — through a join — is the
    property certified.

    Scale: delta-key broadcast semi join against the view, delta-sized
    aggregations, a key-space-sized merge.  Nothing fact-sized moves."""
    from csv_query_engine_spark.operators.merge import (
        aggregate_state,
        refresh_join_aggregate,
    )

    t = load_tables(spark, sf_dir, ("orders", "customer"))
    orders, cust = t["orders"], t["customer"]
    fact_cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    dim = cust.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    base = orders.filter(F.col("o_orderdate") < cutoff)
    view = base.select(*fact_cols).join(dim, "o_custkey").select(
        *fact_cols, "c_mktsegment"
    )
    keys = ["c_mktsegment", "o_orderstatus"]
    sums = {"price_u": F.col("o_totalprice")}
    state0 = aggregate_state(view, keys, sums)

    ch = "change_type"
    inserts = (
        orders.filter(F.col("o_orderdate") >= cutoff)
        .select(*fact_cols)
        .withColumn(ch, F.lit("upsert"))
    )
    deletes = (
        base.filter(F.col("o_orderkey") % 13 == 0)
        .select(*fact_cols)
        .withColumn(ch, F.lit("delete"))
    )
    updates = (
        base.filter((F.col("o_orderkey") % 17 == 0) & (F.col("o_orderkey") % 13 != 0))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
        )
        .withColumn(ch, F.lit("upsert"))
    )
    fact_delta = inserts.unionByName(deletes).unionByName(updates)
    state = refresh_join_aggregate(
        state0, view, fact_delta, dim, ["o_orderkey"], ["o_custkey"], keys, sums
    )
    return state.select(
        "c_mktsegment",
        "o_orderstatus",
        F.col("n"),
        (
            F.col("price_u").cast("decimal(38,6)")
            / F.lit(10**6).cast("decimal(12,0)")
        )
        .cast("double")
        .alias("total_price"),
    ).orderBy("c_mktsegment", "o_orderstatus")
