"""Streaming-analytics registrations: the BATCH twins of the streaming
transforms in csv_query_engine_spark.streaming (identical window
semantics, oracle-checkable in SQL). The stateful streaming execution
path (watermarks, memory sink, availableNow) is exercised in
tests/test_streaming.py against these same plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_query_engine_spark.io.readers import load_tables
from csv_query_engine_spark.queries import register
from csv_query_engine_spark.queries.relational import exact_sum


@register(
    "events_hourly_counts",
    """
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS count,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def events_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch twin of
    streaming.windowed_event_counts). Scale: partial agg per partition,
    shuffle keyed by (window, type) — bounded output regardless of input."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("count"), exact_sum(F.col("value"), "sum_value"))
        .select(F.col("win.start").alias("window_start"), "event_type", "count", "sum_value")
        .orderBy("window_start", "event_type")
    )


@register(
    "events_sliding_counts",
    """
    SELECT CAST(time_bucket(INTERVAL '30 minutes', ts) - o * INTERVAL '30 minutes' AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS count
    FROM events, UNNEST([0, 1]) AS t(o)
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour length, 30 minute step): each event lands
    in 2 windows. The oracle expresses the same thing by exploding the 2
    candidate window starts per event."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("count"))
        .select(F.col("win.start").alias("window_start"), "event_type", "count")
        .orderBy("window_start", "event_type")
    )


@register(
    "events_sessionization",
    """
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL '30 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gaps
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL '30 minutes' AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap (batch
    F.session_window — same merge semantics the streaming path uses;
    the oracle derives sessions with the classic lag-gap-cumsum idiom).
    Session end = last event + gap, matching Spark's definition.
    Spark's session window is end-EXCLUSIVE — an event exactly `gap`
    after the previous one starts a NEW session — so the oracle's
    new-session predicate is >= (not >), and its cumsum window orders by
    (ts, event_id) so duplicate timestamps assign deterministically."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "events_user_activity_profile",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           CAST(MIN(ts) AS TIMESTAMP) AS first_seen,
           CAST(MAX(ts) AS TIMESTAMP) AS last_seen,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_user_activity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity activity rollup — the profile aggregation a streaming
    pipeline materializes continuously; here the batch form."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            exact_sum(F.col("value"), "total_value"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).cast("bigint").alias("n_purchases"),
        )
        .orderBy("user_id")
    )


@register(
    "events_conversion_attribution",
    """
    WITH v AS (
        SELECT user_id, event_id AS view_id, ts AS view_ts
        FROM events WHERE event_type = 'view'
    ),
    p AS (
        SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
               value AS purchase_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT v.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT v.view_id) AS BIGINT) AS n_converting_views,
           CAST(SUM(date_diff('second', view_ts, purchase_ts)) AS BIGINT) AS sum_delay_s,
           CAST(SUM(CAST(purchase_value AS DECIMAL(18,6))) AS DOUBLE) AS attributed_value
    FROM v JOIN p
      ON v.user_id = p.user_id
     AND purchase_ts >= view_ts
     AND purchase_ts <= view_ts + INTERVAL 60 MINUTE
    GROUP BY v.user_id
    ORDER BY v.user_id
    """,
)
def events_conversion_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.conversion_join (stream-stream interval
    join), rolled up per user: pair count, converting views, total
    view→purchase delay (integer seconds — exact cross-engine), and
    attributed purchase value (exact sum).

    Scale: an interval self-join keyed by user — shuffles both sides on
    user_id once; the time predicate is evaluated at the join, and the
    per-user pair space is bounded by activity × horizon, the same
    bound the streaming state store relies on."""
    from csv_query_engine_spark.streaming.events import conversion_join

    e = load_tables(spark, sf_dir, ("events",))["events"]
    pairs = conversion_join(e, e)
    delay_s = F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("view_id").alias("n_converting_views"),
            F.sum(delay_s).cast("bigint").alias("sum_delay_s"),
            exact_sum(F.col("purchase_value"), "attributed_value"),
        )
        .orderBy("user_id")
    )


@register(
    "events_view_conversion_flags",
    """
    WITH v AS (
        SELECT user_id, event_id AS view_id, ts AS view_ts
        FROM events WHERE event_type = 'view'
    ),
    p AS (
        SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
               value AS purchase_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT v.user_id, v.view_id,
           CAST(COUNT(p.purchase_id) AS BIGINT) AS n_purchases,
           (COUNT(p.purchase_id) > 0) AS converted,
           CAST(COALESCE(MIN(date_diff('second', view_ts, purchase_ts)), -1) AS BIGINT)
               AS first_delay_s,
           CAST(COALESCE(SUM(CAST(purchase_value AS DECIMAL(18,6))), 0) AS DOUBLE)
               AS attributed_value
    FROM v LEFT JOIN p
      ON v.user_id = p.user_id
     AND purchase_ts >= view_ts
     AND purchase_ts <= view_ts + INTERVAL 60 MINUTE
    GROUP BY v.user_id, v.view_id
    ORDER BY v.user_id, v.view_id
    """,
)
def events_view_conversion_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.conversion_join(how='left_outer') — the
    OUTER half of the attribution contract: every view emits, converted
    or not (null purchase columns rolled up to n_purchases=0 /
    first_delay_s=-1 / attributed_value=0.0; sentinels COALESCEd on
    both sides per the nullable-numeric invariant).

    Scale: same user-keyed interval join as the inner twin — one
    shuffle per side on user_id; outer rows add no pair-space growth
    (at most one null-extended row per view). In the streaming form the
    unmatched view emits exactly when the watermark proves no purchase
    can still arrive (state expiry), which is the same row this batch
    plan produces eagerly."""
    from csv_query_engine_spark.streaming.events import conversion_join

    e = load_tables(spark, sf_dir, ("events",))["events"]
    pairs = conversion_join(e, e, how="left_outer")
    delay_s = F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")
    return (
        pairs.groupBy("user_id", "view_id")
        .agg(
            F.count("purchase_id").alias("n_purchases"),
            (F.count("purchase_id") > 0).alias("converted"),
            F.coalesce(F.min(delay_s), F.lit(-1)).cast("bigint").alias("first_delay_s"),
            exact_sum(F.coalesce(F.col("purchase_value"), F.lit(0.0)), "attributed_value"),
        )
        .orderBy("user_id", "view_id")
    )


@register(
    "events_cohort_retention",
    """
    WITH wk AS (
        SELECT user_id,
               CAST(FLOOR(date_diff('day', TIMESTAMP '2024-01-01', ts) / 7) AS BIGINT)
                   AS week
        FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, week FROM wk
    )
    SELECT c.cohort_week,
           a.week - c.cohort_week AS offset_weeks,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM active a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY c.cohort_week, offset_weeks
    ORDER BY cohort_week, offset_weeks
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity week,
    counted in each later week they return — the canonical product-
    analytics rollup (and the schema a training-data freshness audit
    uses for source recency).

    Scale: the (user, week) activity set dedups map-side BEFORE any
    join; the cohort table is one MIN aggregate on the same user key —
    the dedup, cohort agg, join and final count all align on user_id,
    so AQE plans one shuffle of the deduplicated pairs, never the raw
    event stream (events collapse ~66x here). Week index is integer
    day arithmetic — bit-equal cross-engine."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    wk = e.select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts"), F.lit("2024-01-01").cast("timestamp")) / 7
        ).cast("long").alias("week"),
    )
    active = wk.distinct()
    cohort = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        active.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("offset_weeks"))
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
        .orderBy("cohort_week", "offset_weeks")
    )


@register(
    "events_funnel_steps",
    """
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT v.user_id, MIN(e.ts) AS t2
        FROM v JOIN events e
          ON e.user_id = v.user_id AND e.event_type = 'click' AND e.ts > v.t1
        GROUP BY v.user_id
    ),
    p AS (
        SELECT c.user_id, MIN(e.ts) AS t3
        FROM c JOIN events e
          ON e.user_id = c.user_id AND e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY c.user_id
    )
    SELECT step, n_users FROM (
        SELECT '1_view' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
        UNION ALL
        SELECT '2_click_after_view', CAST(COUNT(*) AS BIGINT) FROM c
        UNION ALL
        SELECT '3_purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM p
    ) ORDER BY step
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered multi-step funnel (view → click → purchase, each step
    STRICTLY after the previous step's first completion): the
    sequential-pattern shape (MATCH_RECOGNIZE-lite) that sessionization
    and the pairwise conversion join don't cover.

    Scale: each step is a per-user MIN aggregate chained through a join
    keyed on user_id — every stage aligns on the same key, so the whole
    funnel is one user-partitioned pipeline (AQE reuses the exchange);
    step counts are single-row aggregates. The per-user step tables `v`
    and `c` each feed TWO consumers (the next step's join AND their own
    count) — persisted once (tiny per-user tables; caller-owned
    lifetime per the repo persist convention) so the funnel reads the
    events table exactly three times, once per step filter, instead of
    six. Cross-engine safety: only counts surface, so the ns-vs-µs
    timestamp encodings can't drift the hash."""
    from pyspark.storagelevel import StorageLevel

    e = load_tables(spark, sf_dir, ("events",))["events"]

    def first_after(prev: DataFrame, etype: str, prev_t: str, out_t: str) -> DataFrame:
        ev = e.filter(F.col("event_type") == etype).select("user_id", "ts")
        return (
            prev.join(ev, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_t))
        )

    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c = first_after(v, "click", "t1", "t2").persist(StorageLevel.MEMORY_AND_DISK)
    p = first_after(c, "purchase", "t2", "t3")
    counts = [
        v.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit("1_view").alias("step"), "n_users"
        ),
        c.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit("2_click_after_view").alias("step"), "n_users"
        ),
        p.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit("3_purchase_after_click").alias("step"), "n_users"
        ),
    ]
    out = counts[0].unionByName(counts[1]).unionByName(counts[2])
    return out.orderBy("step")


@register(
    "events_value_anomalies",
    """
    WITH th AS (
        SELECT event_type,
               FLOOR(quantile_cont(value, 0.99) * 1e4 + 0.5) / 1e4 AS p99
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, th.p99,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN e.value > th.p99 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_anomalies
    FROM events e JOIN th ON e.event_type = th.event_type
    GROUP BY e.event_type, th.p99
    ORDER BY e.event_type
    """,
)
def events_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-threshold anomaly screen: events whose value
    exceeds their type's p99, counted per type — the
    learn-threshold-then-filter shape (the percentile is computed from
    the data, joined back, and applied as a predicate) that static
    range checks (orders_quality_constraints) can't express.

    This is the EXACT oracle tier of operators/anomaly.py::
    value_anomaly_screen; the operator's approx=True default is the
    100 TB path (mergeable approx_percentile summaries — exact
    percentile buffers the per-group value multiset, which scales with
    group ROW count on a continuous column). The exact threshold is
    FLOOR-quantized (never engine ROUND; CLAUDE.md) so the DuckDB
    quantile_cont twin lands on the identical double."""
    from csv_query_engine_spark.operators.anomaly import value_anomaly_screen

    e = load_tables(spark, sf_dir, ("events",))["events"]
    return value_anomaly_screen(e, approx=False)


@register(
    "events_markov_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    trans AS (
        SELECT a.event_type AS from_type, b.event_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n_trans
        FROM seq a JOIN seq b
          ON a.user_id = b.user_id AND b.rn = a.rn + 1
        GROUP BY a.event_type, b.event_type
    ),
    tot AS (SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
            FROM trans GROUP BY from_type)
    SELECT t.from_type, t.to_type, t.n_trans,
           FLOOR(CAST(t.n_trans AS DOUBLE) / tot.n_from * 1e6 + 0.5) / 1e6 AS p
    FROM trans t JOIN tot ON t.from_type = tot.from_type
    ORDER BY t.from_type, t.to_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next = b | current = a) from lead-paired events — the
    sequence-MODEL member of the event-analytics family (funnel checks
    one fixed pattern; this estimates the full transition structure,
    the input to next-event prediction or anomaly-flow detection).

    Scale: one user-keyed window (the sessionization partitioning) to
    pair each event with its successor, then a 5×5-ish aggregate —
    shuffle is one pass on user_id and the output is event-type²
    rows. Determinism: the window orders by (ts, event_id) — unique-key
    tiebreak per the repo's ordering invariant — and the probability
    quantizes via FLOOR(x·10⁶ + 0.5) (engine ROUND diverges on
    boundaries; CLAUDE.md)."""
    from pyspark.sql import Window as W

    e = load_tables(spark, sf_dir, ("events",))["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select("user_id", "event_type", F.lead("event_type").over(w).alias("_nxt"))
        .filter(F.col("_nxt").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("_nxt").alias("to_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_trans"))
    )
    tot = trans.groupBy("from_type").agg(F.sum("n_trans").cast("bigint").alias("n_from"))
    return (
        trans.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_trans",
            (
                F.floor(
                    F.col("n_trans").cast("double") / F.col("n_from") * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "events_robust_anomalies",
    f"""
    WITH med AS (
        SELECT event_type,
               FLOOR(quantile_cont(value, 0.5) * 1e4 + 0.5) / 1e4 AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, med.med, abs(e.value - med.med) AS d
        FROM events e JOIN med ON e.event_type = med.event_type
    ),
    mad AS (
        SELECT event_type,
               FLOOR(quantile_cont(d, 0.5) * 1e4 + 0.5) / 1e4 AS mad
        FROM dev GROUP BY event_type
    )
    SELECT dev.event_type, dev.med, mad.mad,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN dev.d > CAST({3.5 * 1.4826!r} AS DOUBLE) * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad ON dev.event_type = mad.event_type
    GROUP BY dev.event_type, dev.med, mad.mad
    ORDER BY dev.event_type
    """,
)
def events_robust_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) anomaly screen per event type — the
    outlier-resistant sibling of the p99 threshold screen
    (events_value_anomalies): a value is anomalous when its absolute
    deviation from the type median exceeds 3.5 robust standard
    deviations (MAD × 1.4826, the normal-consistency constant). Unlike
    mean/stddev or p99, the thresholds themselves cannot be dragged by
    the outliers they are meant to catch.

    This is the EXACT oracle tier of operators/anomaly.py::
    robust_anomaly_screen; the operator's approx=True default is the
    100 TB path (mergeable approx_percentile summaries for BOTH
    passes — exact percentile buffers the per-group value multiset,
    which scales with group ROW count on a continuous column). med and
    mad are FLOOR-quantized (the chained med → d → MAD arithmetic
    stays pure IEEE on both engines; engine ROUND compounds across the
    chain — round-6 ADVICE) and the consistency constant is emitted as
    the Python-computed double literal (decimal hazard, CLAUDE.md)."""
    from csv_query_engine_spark.operators.anomaly import robust_anomaly_screen

    e = load_tables(spark, sf_dir, ("events",))["events"]
    return robust_anomaly_screen(e, approx=False)


@register(
    "events_window_heavy_hitters",
    """
    WITH w AS (
        SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP)
                   AS window_start,
               event_type
        FROM events
    ),
    tot AS (
        SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n_window
        FROM w GROUP BY window_start
    )
    SELECT w.window_start, w.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_occ, tot.n_window
    FROM w JOIN tot USING (window_start)
    GROUP BY w.window_start, w.event_type, tot.n_window
    HAVING CAST(COUNT(*) AS BIGINT) > tot.n_window // 8
    ORDER BY window_start, event_type
    """,
)
def events_window_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window heavy hitters: event types whose count within their
    tumbling 1-hour window exceeds n_window/k (k=8) — the BATCH TWIN of
    streaming/events.py::streaming_heavy_hitters, which carries the
    Misra-Gries summary as per-window state in applyInPandasWithState.
    Output is exact, so the oracle is plain GROUP BY + HAVING against
    the per-window total (integer division on both engines).

    Scale: two aggregations keyed on the window (bounded output), the
    per-window totals broadcast back; the STREAMING sibling does the
    same with O(k) state per window and no dictionary-wide shuffle —
    its candidates provably cover this exact answer (MG bound), and
    tests/test_streaming.py pins streaming == batch at harness
    cardinalities with a checkpoint restart."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    w = e.select(F.window("ts", "1 hour").start.alias("window_start"), "event_type")
    tot = w.groupBy("window_start").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_window")
    )
    return (
        w.groupBy("window_start", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"))
        .join(F.broadcast(tot), "window_start")
        .filter(F.col("n_occ") > F.expr("n_window div 8"))
        .select("window_start", "event_type", "n_occ", "n_window")
        .orderBy("window_start", "event_type")
    )
