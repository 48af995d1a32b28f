"""Structured Streaming analytics over the events table (SURVEY.md §7
phase 6 — the reference has zero streaming code, grep-verified
SURVEY.md §1, so this is a net-new Spark-native extension).

Design: streams are the same declarative plans as batch — watermarked
event-time windows, session windows, and within-watermark dedup. Each
streaming transform has a batch twin registered in queries/streaming_q.py
with a DuckDB oracle (time_bucket / lag-gap sessionization), so the
window *semantics* are oracle-checked even though the stateful execution
path is exercised via the memory sink in tests.

Scale: watermarks bound state; windowed aggregates shuffle on
(window, key) with partial aggregation; dropDuplicatesWithinWatermark
keeps only the watermark horizon in the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def ensure_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to watermark-compatible TIMESTAMP
    (local-tz). Harness generations have stored ``ts`` three ways:
    TIMESTAMP(NANOS) — a nanosecond long under ``nanosAsLong`` — plain
    TIMESTAMP(MICROS) (LTZ), and naive TIMESTAMP_NTZ. Watermarks reject
    NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); the session runs in UTC
    (session.py), so the NTZ→LTZ cast maps wall time to the same instant
    DuckDB reads for the batch oracles."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def read_events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the events parquet (one file here; a
    directory of arriving files in production — same plan).

    The stream schema is taken from the file footer via a batch read
    (streams cannot infer schemas themselves); ``ts`` is normalized to
    a watermarkable TIMESTAMP whatever its physical encoding — see
    :func:`ensure_event_time`."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file source requires a directory; select just the events file
    # out of the shared sf_dir with a glob filter.
    schema = spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir).schema
    reader = spark.readStream.schema(schema).option("pathGlobFilter", "events.parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return ensure_event_time(reader.parquet(sf_dir))


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding event-time aggregation: count + value
    sum per (window, event_type). Late data beyond the watermark is
    dropped; state is bounded by watermark + window length."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("count"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "count",
            "sum_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows per user: events within ``gap`` of each other
    merge; a session closes when the watermark passes its end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event stream on event_id within the watermark horizon
    (dropDuplicatesWithinWatermark keeps state only for the horizon —
    unbounded-key dedup without unbounded state)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running totals maintained across micro-batches (the batch twin —
    oracle-checked — is queries/streaming_q.events_user_activity_profile).

    Semantics: for every user seen in a micro-batch, update persistent
    state (event count, value sum, batches-seen) and emit the new
    running totals. This is the shape built-in windowed aggs cannot
    express: arbitrary per-key state transition logic in Python, Arrow-
    batched per group.

    Scale: state lives in the state store keyed by user_id (shuffled
    once per micro-batch on the grouping key); per-key state is O(1)
    here so the store is bounded by the live-key cardinality, not the
    stream length. The UDF body is self-contained so cloudpickle ships
    it by value (workers cannot import this package).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
            T.StructField("n_batches", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("batches", T.LongType()),
        ]
    )

    def update(key, pdfs, state):
        import pandas as pd

        n, total, batches = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        batches += 1
        state.update((n, total, batches))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "n_batches": [batches],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_type_profiles(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``transformWithStateInPandas``
    (the Spark 4 arbitrary-state API that supersedes
    ``applyInPandasWithState``): per-user profiles maintained across
    micro-batches with TWO typed state primitives — a ValueState for
    the running (n_events, total_value) pair and a MapState keyed by
    event_type for per-type counts.  Each batch emits the user's
    updated profile: event count, value total, distinct-type count,
    and the (alphabetically first) modal event type.

    Versus applyInPandasWithState (running_user_totals above): state
    is a set of named, individually-typed stores rather than one
    tuple, MapState gives per-subkey point updates (no
    read-modify-write of a whole blob), and the same processor can
    register timers (not used here — timeMode="None" keeps this test
    deterministic).  Requires the RocksDB state store provider; the
    caller sets ``spark.sql.streaming.stateStore.providerClass``.

    Scale: state is keyed by user_id (one shuffle per micro-batch);
    per-user state is O(#event_types) — bounded — and RocksDB keeps
    the store off-heap and incrementally checkpointed, which is the
    point of the new API at 100 TB stream volumes.  The processor
    class is defined in-function so cloudpickle ships it by value
    (workers cannot import this package)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
            T.StructField("n_types", T.LongType()),
            T.StructField("top_type", T.StringType()),
        ]
    )

    class Profile(StatefulProcessor):
        def init(self, handle):
            self._totals = handle.getValueState("totals", "n BIGINT, total DOUBLE")
            self._by_type = handle.getMapState("by_type", "t STRING", "c BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total = (self._totals.get() or (0, 0.0)) if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
                for t, c in pdf.groupby("event_type").size().items():
                    prev = self._by_type.getValue((t,)) if self._by_type.containsKey((t,)) else None
                    self._by_type.updateValue((t,), (int(prev[0] if prev else 0) + int(c),))
            self._totals.update((n, total))
            counts = [(t[0], c[0]) for t, c in self._by_type.iterator()]
            # deterministic tie-break: highest count, then first name
            best = sorted(counts, key=lambda tc: (-tc[1], tc[0]))[0][0]
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "n_types": [len(counts)],
                    "top_type": [best],
                }
            )

        def close(self):
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        Profile(), out_schema, "Update", "None"
    )


def streaming_heavy_hitters(
    events: DataFrame,
    k: int = 8,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Stream-native Misra-Gries heavy hitters: the mergeable MG
    summary from pipeline/sketches.py carried as PER-WINDOW state in
    ``applyInPandasWithState`` — windowed top event types with bounded
    state, closing the loop between the sketch layer and the streaming
    layer (round-6 verdict #7). Emits, per update, every candidate the
    window's summary currently holds: (window_start, event_type,
    mg_count, n_window).

    Guarantees (Misra & Gries 1982, same bulk-decrement step as the
    batch summarizer): after any prefix of the window's stream the
    summary holds every type whose true count exceeds n_window/k, and
    mg_count underestimates the true count by at most n_window/k.
    When k ≥ the live type cardinality no decrement ever fires and the
    counts are EXACT — the harness case the restart test pins against
    the batch twin (queries/streaming_q.events_window_heavy_hitters,
    oracle-paired).

    Scale: state per window is O(k) — two short arrays — regardless of
    how many events or distinct types the window sees; the shuffle per
    micro-batch keys on the window start only. State RETIREMENT (the
    bounding contract along the window axis): pass ``watermark`` and
    the operator watermarks the stream, registers an EventTimeTimeout
    at each window's end, and when the watermark passes it the window's
    state is EVICTED with one final emission (``is_final=true``) — the
    summary can't change once the watermark guarantees no more events
    for the window, so live state is bounded by the watermark horizon,
    not the stream's age. ``watermark=None`` keeps NoTimeout (every
    window's state lives for the query — only for bounded tests).
    Timeout arithmetic assumes a UTC session (the repo convention —
    session.py and the verify recipe both pin it): the group key
    arrives as a naive datetime in the session timezone and is pinned
    to UTC explicitly before the epoch conversion, so the host OS
    timezone cannot shift the retirement instant."""
    import datetime as _dt

    from pyspark.sql.streaming.state import GroupStateTimeout

    window_sec = None
    if watermark is not None:
        # parse "<n> <unit>" for the timeout arithmetic — only the
        # timeout path needs it, so NoTimeout callers may pass any
        # window string F.window() accepts
        n, unit = window.split()
        units = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
                 "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}
        if unit not in units:
            raise ValueError(
                f"unsupported window unit {unit!r} for timeout arithmetic"
            )
        window_sec = int(n) * units[unit]

    out_schema = T.StructType(
        [
            T.StructField("window_start", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("mg_count", T.LongType()),
            T.StructField("n_window", T.LongType()),
            T.StructField("is_final", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("types", T.ArrayType(T.StringType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("total", T.LongType()),
        ]
    )

    use_timeout = watermark is not None

    def update(key, pdfs, state):
        import pandas as pd

        if use_timeout and state.hasTimedOut:
            # watermark passed the window end: the summary is final —
            # emit it once more flagged final and EVICT the state
            types, counts, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "window_start": [key[0]] * len(types),
                    "event_type": list(types),
                    "mg_count": [int(c) for c in counts],
                    "n_window": [int(total)] * len(types),
                    "is_final": [True] * len(types),
                }
            )
            return
        if state.exists:
            types, counts, total = state.get
            counters = dict(zip(types, [int(c) for c in counts]))
            total = int(total)
        else:
            counters, total = {}, 0
        for pdf in pdfs:
            vc = pdf["event_type"].value_counts()
            total += int(vc.sum())
            for tok, c in vc.items():
                c = int(c)
                if tok in counters:
                    counters[tok] += c
                elif len(counters) < k:
                    counters[tok] = c
                else:
                    # bulk MG decrement (identical to the batch
                    # summarizer): each decrement unit is paid by k+1
                    # distinct keys at once, preserving the n/k bound
                    while c > 0 and tok not in counters:
                        if len(counters) < k:
                            counters[tok] = c
                            break
                        m = min(counters.values())
                        dec = min(c, m)
                        counters = {
                            t: v - dec for t, v in counters.items() if v - dec > 0
                        }
                        c -= dec
        state.update((list(counters), list(counters.values()), total))
        if use_timeout:
            # retire when the watermark passes this window's END.
            # key[0] is a NAIVE datetime in the (UTC) session timezone:
            # pin tzinfo explicitly so .timestamp() cannot reinterpret
            # it in the host OS zone (a +05:30 host would otherwise set
            # the timeout 5.5 h early — at/below the watermark, which
            # Spark rejects and kills the query)
            end = key[0].replace(tzinfo=_dt.timezone.utc) + _dt.timedelta(
                seconds=window_sec
            )
            state.setTimeoutTimestamp(int(end.timestamp() * 1000))
        yield pd.DataFrame(
            {
                "window_start": [key[0]] * len(counters),
                "event_type": list(counters),
                "mg_count": list(counters.values()),
                "n_window": [total] * len(counters),
                "is_final": [False] * len(counters),
            }
        )

    if watermark is not None:
        events = events.withWatermark("ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    win_start = F.window("ts", window).start.alias("window_start")
    return (
        events.select(win_start, "event_type", "ts")
        .groupBy("window_start")
        .applyInPandasWithState(update, out_schema, state_schema, "update", timeout)
    )


def conversion_join(
    views: DataFrame,
    purchases: DataFrame,
    horizon_minutes: int = 60,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """STREAM-STREAM interval join: each 'view' event paired with every
    'purchase' by the same user within ``horizon_minutes`` after it —
    the attribution/conversion join (click→purchase) every event
    pipeline runs.

    State bounding (the stream-stream contract): BOTH sides carry a
    watermark and the join condition bounds purchase_ts to
    [view_ts, view_ts + horizon], so Spark can expire a buffered view
    once the purchase-side watermark passes view_ts + horizon, and a
    buffered purchase once the view-side watermark passes purchase_ts.
    Without the time bound the state store would grow with the stream.

    ``how="left_outer"`` is the other half of the attribution contract:
    views that never convert DO emit, with null purchase columns — in
    streaming mode only once the watermark passes ``view_ts + horizon``
    (the row is provably unmatched then; rows still inside the horizon
    at query end stay in state and are not emitted — the correct
    at-most-once-and-only-when-final semantics), in batch mode
    immediately. The batch twin with the DuckDB oracle is
    queries/streaming_q.events_view_conversion_flags.

    Pass the same source twice for a self-join stream (two independent
    readStream plans); the inner batch twin with the DuckDB oracle is
    queries/streaming_q.events_conversion_attribution.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    # Watermark BEFORE the event_type filter so that, where the filter
    # is NOT pushable below the watermark node, every event advances the
    # per-stream watermark. CONTRACT (measured here): for pushable
    # sources (parquet/file streams) Catalyst still pushes the
    # event_type predicate into the scan, so a side whose event type
    # stops arriving (e.g. no more purchases) freezes its per-stream
    # watermark, the global watermark (min across streams) stalls with
    # it, and outer-join state is never evicted — unmatched views are
    # then never emitted. Production attribution streams must keep both
    # event types flowing (heartbeats) or set
    # spark.sql.streaming.multipleWatermarkPolicy=max (weaker lateness
    # guarantee). The test exercises the trickling-purchases case.
    v = (
        views.withWatermark("ts", watermark)
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES"))
    )
    return v.join(p, cond, how).select(
        "user_id", "view_id", "purchase_id", "view_ts", "purchase_ts", "purchase_value"
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Drive a (file-backed) stream to completion synchronously via the
    memory sink — the local test harness for streaming plans."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def enrich_with_dim(stream: DataFrame, dim: DataFrame, on: str, how: str = "left") -> DataFrame:
    """Stream-static dimension enrichment: each micro-batch joins against
    the static side, broadcast per batch (no stream-side state).

    Scale: the canonical pattern for attaching slowly-changing dimension
    attributes to an event stream — keep the dim broadcast-sized or
    pre-bucket both sides on the key; AQE does not replan streams, so
    the static side's size discipline is the operator's contract."""
    return stream.join(F.broadcast(dim), on, how)


def route_quality_batch(batch_df, batch_id: int, checks, good_path: str, quarantine_path: str):
    """One micro-batch of the streaming dead-letter gate: split by the
    row-level constraints, then write each side keyed by ``batch_id``
    with a dynamic partition overwrite — replaying the SAME batch (the
    documented foreachBatch at-least-once failure mode: crash after the
    writes but before the checkpoint commit) rewrites the same
    ``batch_id=<n>`` partition instead of appending duplicates, so the
    sinks are idempotent under replay. The split is deterministic
    (plan-literal predicates, no RNG), so a replay produces byte-equal
    partitions; a crash BETWEEN the two writes heals on replay the same
    way. Module-level (not a closure) so the replay contract is
    testable directly — foreachBatch functions run on the driver, so
    package imports here are safe."""
    from csv_query_engine_spark.pipeline.validation import split_by_rules

    good, bad = split_by_rules(batch_df, checks)
    for side, path in ((good, good_path), (bad, quarantine_path)):
        (
            side.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )


def quality_gate_stream(
    stream: DataFrame,
    checks,
    good_path: str,
    quarantine_path: str,
    checkpoint: str,
):
    """Streaming dead-letter routing: every micro-batch splits by the
    row-level constraints (pipeline/validation.py::split_by_rules) —
    passing rows land in ``good_path``, violating rows in
    ``quarantine_path`` WITH their ``failed_rules`` — so bad data parks
    for repair instead of poisoning downstream state or failing the
    query. foreachBatch alone is at-least-once; the per-batch dynamic
    partition overwrite in :func:`route_quality_batch` makes a replayed
    batch a rewrite of its own partition, which upgrades the
    END-TO-END result (checkpoint offsets + idempotent sink) to
    effectively-once.

    Scale: the split is pure per-row codegen (no shuffle, no state);
    the only state is the source offsets in the checkpoint. This is the
    streaming face of the quality layer: check_constraints gates a
    BATCH before publication, split_by_rules routes a STREAM row by
    row."""

    def route(batch_df, batch_id):
        route_quality_batch(batch_df, batch_id, checks, good_path, quarantine_path)

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def route_admission_batch(
    batch_df,
    batch_id: int,
    admitted_dir: str,
    rejected_dir: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """One micro-batch of the streaming dedup admission gate: screen the
    batch against everything admitted by EARLIER batches (exact
    fingerprint + span-blocked near-dup via
    pipeline/dedup.py::incremental_dedup), collapse exact duplicates
    WITHIN the batch (min doc_id survives), and write both sides keyed
    by ``batch_id`` with dynamic partition overwrite.

    Replay contract (the quality-gate idiom, :func:`route_quality_batch`):
    the admitted-corpus read FILTERS ``batch_id < current`` — a replayed
    batch therefore screens against exactly the pre-batch corpus even
    though its own earlier write may already sit in the store — and the
    deterministic verdicts rewrite the same partitions, so replays are
    no-ops end to end.

    Granularity note: near-duplicate pairs arriving in the SAME
    micro-batch admit together (the batch boundary is the dedup
    granularity — the trade every micro-batch admission system makes);
    exact duplicates collapse within the batch too.

    Scale: the batch is small by construction (its fingerprints/spans
    broadcast); the admitted corpus is touched only by the linear gram
    explode with candidate-restricted gram builds — incremental_dedup's
    audited plan. State lives in the parquet store, not executor memory.
    """
    from pyspark.sql import functions as SF

    from csv_query_engine_spark.pipeline.dedup import incremental_dedup
    from csv_query_engine_spark.pipeline.text import fingerprint

    spark = batch_df.sparkSession
    batch = batch_df.select(
        SF.col(id_col).cast("long").alias("doc_id"), SF.col(text_col).alias("text")
    )
    # within-batch exact collapse: min doc_id per fingerprint survives
    fp = batch.select("doc_id", "text", fingerprint(SF.col("text")).alias("_fp"))
    survivors = fp.groupBy("_fp").agg(SF.min("doc_id").alias("doc_id"))
    batch_kept = fp.join(survivors, ["_fp", "doc_id"]).select("doc_id", "text")
    batch_exact_dropped = fp.join(
        survivors.withColumnRenamed("doc_id", "_keep"), "_fp"
    ).filter(SF.col("doc_id") != SF.col("_keep")).select(
        "doc_id",
        SF.lit("exact_dup").alias("verdict"),
        SF.col("_keep").cast("long").alias("dup_of"),
    )
    try:
        corpus = (
            spark.read.parquet(admitted_dir)
            .filter(SF.col("batch_id") < int(batch_id))
            .select("doc_id", "text")
        )
        have_corpus = True
    except Exception:  # first batch: no store yet
        have_corpus = False
    if have_corpus:
        verdicts = incremental_dedup(batch_kept, corpus, threshold=threshold)
    else:
        verdicts = batch_kept.select(
            "doc_id", SF.lit("admit").alias("verdict"), SF.lit(-1).cast("long").alias("dup_of")
        )
    admitted = batch_kept.join(
        verdicts.filter(SF.col("verdict") == "admit").select("doc_id"), "doc_id"
    )
    rejected = verdicts.filter(SF.col("verdict") != "admit").unionByName(
        batch_exact_dropped
    )
    for side, path in ((admitted, admitted_dir), (rejected, rejected_dir)):
        (
            side.withColumn("batch_id", SF.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )


def dedup_admission_stream(
    stream: DataFrame,
    admitted_dir: str,
    rejected_dir: str,
    checkpoint: str,
    threshold: float = 0.5,
):
    """Streaming near-duplicate ADMISSION — the streaming face of the
    dedup family (the continuously-fed curation pipeline: each crawl
    slice screens against everything already ingested before joining
    the corpus): foreachBatch routes every micro-batch through
    :func:`route_admission_batch`, so the admitted store grows only by
    novel documents and every rejection is parked with its verdict and
    the id it duplicates. Checkpoint offsets + batch_id-keyed dynamic
    partition overwrites + the pre-batch corpus filter make the result
    effectively-once under replay."""

    def route(batch_df, batch_id):
        route_admission_batch(
            batch_df, batch_id, admitted_dir, rejected_dir, threshold=threshold
        )

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def _read_store_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Explicit-schema store read where ONLY a missing path reads as
    empty (the first batch); any other AnalysisException fails the
    batch so the checkpoint retries (round-9 store-reader rule)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(schema).parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], schema)
        raise


def route_minhash_admission_batch(
    batch_df,
    batch_id: int,
    store_dir: str,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    hash_mode: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """One micro-batch of streaming MINHASH admission — the incremental
    face of :func:`~csv_query_engine_spark.pipeline.dedup.
    minhash_dedup_survivors` (round-11 verdict #3): the store keeps one
    MIN-mergeable row per (band, bucket) — the third aggregate store
    after SUM (CM/HDR) and MAX (HLL) — so each incoming doc verifies
    against AT MOST ``bands`` candidates no matter how large the
    admitted corpus grows.  Linear KEEP/DROP against everything seen in
    earlier batches, with no per-key stream state and no pair table.

    Per batch: OPH signatures + band entries for the batch docs; bucket
    mins MERGED from the pre-batch store (``batch_id < current`` — the
    replay read guard) and the batch's own entries (so within-batch
    dups resolve exactly like the batch operator); candidates = each
    doc's merged bucket mins (≠ self, ≤ ``bands`` per doc); exact
    Jaccard verification re-shingles ONLY the candidate docs
    (semi-joined from the docs store — linear in batch size).  Verdict
    = smallest verified candidate (is_dup, dup_of, dup_jaccard — the
    batch operator's exact output columns and sentinels).

    Store layout under ``store_dir`` (all batch_id-keyed dynamic
    overwrite — every table is a deterministic function of the batch,
    so a replay rewrites its own partitions byte-identically):

    * ``docs``     — (doc_id, text): ALL batch docs, dup or not —
      bucket mins come from every doc (a dup still occupies its
      buckets, exactly as in the batch operator), and later batches
      re-shingle candidates from here;
    * ``mins``     — (band, bucket, min_id): the batch's OWN bucket
      mins; the read side MIN-merges across batches
      (:func:`read_minhash_bucket_mins`);
    * ``entries``  — (doc_id, band, bucket): every doc's band entries
      (round 13) — what lets :func:`reconcile_minhash_admission`
      find the docs a LATE-arriving smaller bucket min affects
      without re-shingling the corpus; ≤ ``bands`` small rows per
      doc, dwarfed by the docs store itself;
    * ``verdicts`` — (doc_id, is_dup, dup_of, dup_jaccard).

    Stream==batch contract: when batches arrive in ASCENDING doc-id
    order (the replay/backfill layout), every doc's merged bucket min
    equals the whole-corpus bucket min at verification time, so the
    accumulated verdicts EQUAL ``minhash_dedup_survivors(corpus,
    est_margin=None)`` run on the union — pinned in
    tests/test_streaming.py.  Under arbitrary arrival order a doc may
    verify before its global bucket min arrives (verdicts remain valid
    greedy smaller-id verdicts — the doc admits where the batch
    operator might drop it); :func:`reconcile_minhash_admission`
    (round 13) closes exactly that gap as a bounded maintenance pass,
    restoring stream==batch under ANY arrival order.  The
    signature-agreement estimate screen is deliberately absent (it
    exists to cut candidate volume, which the bucket-MIN bound already
    caps at ``bands``/doc).

    Scale: batch work is one shingle scan over the batch + ``bands``
    bucket-min lookups/doc against a store that is O(distinct buckets)
    — never O(corpus); candidate re-shingling touches ≤ bands×|batch|
    store docs via a broadcastable id semi-join."""
    from pyspark.storagelevel import StorageLevel

    from csv_query_engine_spark.pipeline.dedup import (
        _band_entries,
        _hashed_shingles,
        _oph_signatures,
        jaccard,
    )

    spark = batch_df.sparkSession
    bucket_sql_type = "STRING" if hash_mode == "md5" else "BIGINT"
    mins_schema = f"band INT, bucket {bucket_sql_type}, min_id BIGINT, batch_id BIGINT"
    docs_schema = "doc_id BIGINT, text STRING, batch_id BIGINT"

    batch = batch_df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    # hashed shingles feed the band build AND the verify join (and the
    # batch feeds docs-store write) — persist once, release in finally
    hashed_b = (
        _hashed_shingles(batch, "doc_id", "text", shingle_k, hash_mode)
        .select("id", "hashes")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        sig_b = _oph_signatures(
            hashed_b, num_hashes, hash_bits=32 if hash_mode == "md5" else 64
        )
        be_b = _band_entries(sig_b, num_hashes, bands, hash_mode).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        batch_mins = be_b.groupBy("band", "bucket").agg(F.min("id").alias("min_id"))
        prev_mins = (
            _read_store_or_empty(spark, f"{store_dir}/mins", mins_schema)
            .filter(F.col("batch_id") < int(batch_id))
            .select("band", "bucket", "min_id")
        )
        merged = (
            prev_mins.unionByName(batch_mins)
            .groupBy("band", "bucket")
            .agg(F.min("min_id").alias("min_id"))
        )
        cand = (
            be_b.join(merged, ["band", "bucket"])
            .filter(F.col("id") != F.col("min_id"))
            .select("id", F.col("min_id").alias("cand"))
            .distinct()
        )
        # candidate shingles: within-batch candidates from hashed_b;
        # earlier-batch candidates re-shingled from the docs store,
        # restricted to the (bounded, ≤ bands×|batch|) candidate id set
        prev_docs = (
            _read_store_or_empty(spark, f"{store_dir}/docs", docs_schema)
            .filter(F.col("batch_id") < int(batch_id))
            .select("doc_id", "text")
            .join(
                F.broadcast(cand.select(F.col("cand").alias("doc_id")).distinct()),
                "doc_id",
                "left_semi",
            )
        )
        cand_hashes = hashed_b.unionByName(
            _hashed_shingles(prev_docs, "doc_id", "text", shingle_k, hash_mode).select(
                "id", "hashes"
            )
        )
        verified = (
            cand.join(hashed_b.select(F.col("id"), F.col("hashes").alias("h_a")), "id")
            .join(
                cand_hashes.select(F.col("id").alias("cand"), F.col("hashes").alias("h_b")),
                "cand",
            )
            .select("id", "cand", jaccard(F.col("h_a"), F.col("h_b")).alias("j"))
            .filter(F.col("j") >= threshold)
        )
        dup = (
            verified.groupBy("id")
            .agg(F.min(F.struct(F.col("cand"), F.col("j"))).alias("m"))
            .select(
                "id", F.col("m.cand").alias("dup_of"), F.col("m.j").alias("dup_jaccard")
            )
        )
        # verdict SPINE = docs that produced ≥1 shingle — exactly the
        # batch operator's sig-derived spine (a doc shorter than
        # shingle_k has no signature row there, so it must have no
        # verdict row here either or the pinned stream==batch equality
        # diverges on degenerate inputs; round-13 ADVICE fix).  The
        # docs store still keeps EVERY batch doc.
        verdicts = (
            hashed_b.filter(F.size("hashes") > 0)
            .select(F.col("id").alias("doc_id"))
            .join(dup.withColumnRenamed("id", "doc_id"), "doc_id", "left")
            .select(
                "doc_id",
                F.col("dup_of").isNotNull().alias("is_dup"),
                F.coalesce(F.col("dup_of"), F.lit(-1)).cast("bigint").alias("dup_of"),
                F.coalesce(F.col("dup_jaccard"), F.lit(-1.0)).alias("dup_jaccard"),
            )
        )
        entries = be_b.select(F.col("id").alias("doc_id"), "band", "bucket")
        for side, sub in (
            (batch, "docs"),
            (batch_mins, "mins"),
            (entries, "entries"),
            (verdicts, "verdicts"),
        ):
            (
                side.withColumn("batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(f"{store_dir}/{sub}")
            )
        # a (re)written batch at or below the reconciliation watermark
        # carries fresh GREEDY verdicts — invalidate the watermark so
        # the next reconcile_minhash_admission re-detects from scratch
        wm = _read_reconcile_watermark(spark, store_dir)
        if wm is not None and int(batch_id) <= wm:
            _drop_reconcile_watermark(spark, store_dir)
    finally:
        hashed_b.unpersist()
        try:
            be_b.unpersist()
        except NameError:
            pass


def minhash_admission_stream(
    stream: DataFrame,
    store_dir: str,
    checkpoint: str,
    threshold: float = 0.5,
    **kwargs,
):
    """Streaming MinHash admission: foreachBatch routes every
    micro-batch through :func:`route_minhash_admission_batch` — the
    linear (bucket-MIN) dedup face running continuously, completing the
    family's batch/streaming symmetry (CM/HLL/HDR/BM25/census/
    contamination all have both faces).  Checkpoint offsets +
    batch_id-keyed dynamic overwrite + the pre-batch read guard make it
    effectively-once under replay."""

    def route(batch_df, batch_id):
        route_minhash_admission_batch(
            batch_df, batch_id, store_dir, threshold=threshold, **kwargs
        )

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_minhash_bucket_mins(
    spark: SparkSession, store_dir: str, hash_mode: str = "xxhash64"
) -> DataFrame:
    """MIN-merge every batch's bucket-min partition into the current
    admission state (the mergeable contract — MIN is the third
    aggregate in the store family after SUM and MAX; compacting old
    batch partitions into one is the same MIN)."""
    t = "STRING" if hash_mode == "md5" else "BIGINT"
    mins = _read_store_or_empty(
        spark, f"{store_dir}/mins", f"band INT, bucket {t}, min_id BIGINT, batch_id BIGINT"
    )
    return mins.groupBy("band", "bucket").agg(F.min("min_id").alias("min_id"))


def read_minhash_verdicts(spark: SparkSession, store_dir: str) -> DataFrame:
    """All admission verdicts accumulated so far (one row per doc)."""
    return _read_store_or_empty(
        spark,
        f"{store_dir}/verdicts",
        "doc_id BIGINT, is_dup BOOLEAN, dup_of BIGINT, dup_jaccard DOUBLE, batch_id BIGINT",
    )


def _read_reconcile_watermark(spark: SparkSession, store_dir: str) -> int | None:
    """Largest ``_reconciled_upto=<W>`` marker under the store root —
    the store's verdicts are batch-consistent with every min that had
    arrived by batch ``W``.  Integer-named empty files (no content
    read-back through py4j; no escaping — ids are digits)."""
    fs, root, _ = _store_fs(spark, store_dir)
    if not fs.exists(root):
        return None
    best = None
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("_reconciled_upto="):
            v = name.split("=", 1)[1]
            if v.isdigit():
                best = int(v) if best is None or int(v) > best else best
    return best


def _write_reconcile_watermark(spark: SparkSession, store_dir: str, upto: int) -> None:
    fs, root, jvm = _store_fs(spark, store_dir)
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("_reconciled_upto=") and name != f"_reconciled_upto={upto}":
            fs.delete(st.getPath(), True)
    fs.create(
        jvm.org.apache.hadoop.fs.Path(f"{store_dir}/_reconciled_upto={int(upto)}"), True
    ).close()


def _drop_reconcile_watermark(spark: SparkSession, store_dir: str) -> None:
    fs, root, _ = _store_fs(spark, store_dir)
    if not fs.exists(root):
        return
    for st in fs.listStatus(root):
        if st.getPath().getName().startswith("_reconciled_upto="):
            fs.delete(st.getPath(), True)


def _stale_min_affected(
    spark: SparkSession,
    store_dir: str,
    mins: DataFrame,
    entries: DataFrame,
    id_name: str,
):
    """Shared arrival-order divergence detector of the bucket-MIN
    admission family (minhash AND semantic — the drift rule applied to
    the reconciliation logic): a doc/vector verified at batch ``t``
    diverges iff some of its buckets' FINAL min strictly undercuts the
    running min it saw at ``t`` (watermark-adjusted: rows at/below a
    ``_reconciled_upto`` watermark were already consistent as of W, so
    their effective view is the smaller running min AT W).  Both sides
    of the comparison live in the stored per-batch ``mins``; ``entries``
    maps flagged (band, bucket, batch) triples back to ids — no corpus
    scan.  Returns (affected (id, batch_id) rows PERSISTED — caller
    unpersists — , newest batch id), or (None, None) on an empty store.
    Running/final windows partition by the bucket key, never global."""
    from pyspark.sql.window import Window
    from pyspark.storagelevel import StorageLevel

    wm = _read_reconcile_watermark(spark, store_dir)
    newest = mins.agg(F.max("batch_id")).collect()[0][0]
    if newest is None:
        return None, None
    wb = Window.partitionBy("band", "bucket")
    run_min = F.min("min_id").over(
        wb.orderBy("batch_id").rowsBetween(Window.unboundedPreceding, 0)
    )
    fin_min = F.min("min_id").over(wb)
    with_runs = mins.select(
        "band", "bucket", "batch_id",
        run_min.alias("_run"), fin_min.alias("_fin"),
    )
    if wm is not None:
        run_at_wm = (
            mins.filter(F.col("batch_id") <= int(wm))
            .groupBy("band", "bucket")
            .agg(F.min("min_id").alias("_run_wm"))
        )
        with_runs = with_runs.join(run_at_wm, ["band", "bucket"], "left").select(
            "band", "bucket", "batch_id", "_fin",
            F.when(
                F.col("batch_id") <= int(wm),
                F.coalesce(F.col("_run_wm"), F.col("_run")),
            )
            .otherwise(F.col("_run"))
            .alias("_run"),
        )
    flagged = with_runs.filter(F.col("_fin") < F.col("_run")).select(
        "band", "bucket", "batch_id"
    )
    affected = (
        entries.join(flagged, ["band", "bucket", "batch_id"], "left_semi")
        .select(id_name, "batch_id")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return affected, int(newest)


def reconcile_minhash_admission(
    spark: SparkSession,
    store_dir: str,
    threshold: float = 0.5,
    shingle_k: int = 5,
    hash_mode: str = "xxhash64",
) -> int:
    """Re-verdict the docs a LATE-arriving smaller bucket min affects —
    the maintenance pass that closes the arrival-order gap (round-12
    verdict #4): after it runs, the accumulated verdicts equal
    ``minhash_dedup_survivors(union, est_margin=None)`` under ANY
    arrival order, not just ascending ids.  Returns the number of docs
    re-verdicted (0 = store already consistent).

    Which docs can diverge?  A doc verified at batch ``t`` saw, for
    each of its buckets, the min over batches ``<= t``; bucket mins
    only ever DECREASE, so its candidate set changed since iff some
    bucket's FINAL min is strictly below its running min at ``t``.
    Both sides of that comparison live in the stored per-batch ``mins``
    table, and the stored ``entries`` table maps the flagged
    (band, bucket, batch) triples back to doc ids — no corpus scan.
    The affected docs (plus their ≤ ``bands`` candidate mins) are
    re-shingled via a semi-join on the bounded id set, re-verified with
    the exact Jaccard, and their verdict rows rewritten in place:
    per-batch dynamic overwrite touching ONLY the affected batch
    partitions (keep = old rows anti-joined, plus the new rows — the
    CoW delete-then-reinsert idempotence, so a crashed reconciliation
    just re-runs).

    Run on a QUIESCENT store (no concurrent foreachBatch).  Successful
    passes record a ``_reconciled_upto=<W>`` watermark (W = the newest
    batch folded in), so the next pass only chases mins that arrived
    AFTER W — repeated maintenance is incremental and a clean second
    pass returns 0.  A REPLAY of a batch at or below the watermark
    recomputes greedy verdicts for that batch, so the route DROPS the
    watermark when it writes such a batch — the next reconciliation
    re-detects from scratch and restores equality."""
    from pyspark.storagelevel import StorageLevel

    from csv_query_engine_spark.pipeline.dedup import _hashed_shingles, jaccard

    bucket_sql_type = "STRING" if hash_mode == "md5" else "BIGINT"
    mins = _read_store_or_empty(
        spark,
        f"{store_dir}/mins",
        f"band INT, bucket {bucket_sql_type}, min_id BIGINT, batch_id BIGINT",
    )
    entries = _read_store_or_empty(
        spark,
        f"{store_dir}/entries",
        f"doc_id BIGINT, band INT, bucket {bucket_sql_type}, batch_id BIGINT",
    )
    affected, newest = _stale_min_affected(spark, store_dir, mins, entries, "doc_id")
    if affected is None:
        return 0
    try:
        n_affected = affected.count()
        if n_affected == 0:
            _write_reconcile_watermark(spark, store_dir, int(newest))
            return 0
        finals = mins.groupBy("band", "bucket").agg(F.min("min_id").alias("cand"))
        cand = (
            entries.join(affected.select("doc_id"), "doc_id", "left_semi")
            .join(finals, ["band", "bucket"])
            .filter(F.col("doc_id") != F.col("cand"))
            .select("doc_id", "cand")
            .distinct()
        )
        docs_schema = "doc_id BIGINT, text STRING, batch_id BIGINT"
        need_ids = (
            affected.select("doc_id")
            .unionByName(cand.select(F.col("cand").alias("doc_id")))
            .distinct()
        )
        need_docs = (
            _read_store_or_empty(spark, f"{store_dir}/docs", docs_schema)
            .select("doc_id", "text")
            .join(need_ids, "doc_id", "left_semi")
        )
        hashed = (
            _hashed_shingles(need_docs, "doc_id", "text", shingle_k, hash_mode)
            .select("id", "hashes")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            verified = (
                cand.withColumnRenamed("doc_id", "id")
                .join(hashed.select("id", F.col("hashes").alias("h_a")), "id")
                .join(
                    hashed.select(F.col("id").alias("cand"), F.col("hashes").alias("h_b")),
                    "cand",
                )
                .select("id", "cand", jaccard(F.col("h_a"), F.col("h_b")).alias("j"))
                .filter(F.col("j") >= threshold)
            )
            dup = (
                verified.groupBy("id")
                .agg(F.min(F.struct(F.col("cand"), F.col("j"))).alias("m"))
                .select(
                    F.col("id").alias("doc_id"),
                    F.col("m.cand").alias("_dup_of"),
                    F.col("m.j").alias("_dup_j"),
                )
            )
            new_rows = (
                affected.join(dup, "doc_id", "left")
                .select(
                    "doc_id",
                    F.col("_dup_of").isNotNull().alias("is_dup"),
                    F.coalesce(F.col("_dup_of"), F.lit(-1)).cast("bigint").alias("dup_of"),
                    F.coalesce(F.col("_dup_j"), F.lit(-1.0)).alias("dup_jaccard"),
                    "batch_id",
                )
            )
            verdicts_schema = (
                "doc_id BIGINT, is_dup BOOLEAN, dup_of BIGINT, "
                "dup_jaccard DOUBLE, batch_id BIGINT"
            )
            old = (
                _read_store_or_empty(spark, f"{store_dir}/verdicts", verdicts_schema)
                .join(affected.select("batch_id").distinct(), "batch_id", "left_semi")
                .join(affected.select("doc_id"), "doc_id", "left_anti")
                .select("doc_id", "is_dup", "dup_of", "dup_jaccard", "batch_id")
            )
            out = old.unionByName(new_rows).localCheckpoint(eager=True)
            try:
                (
                    out.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(f"{store_dir}/verdicts")
                )
            finally:
                out.unpersist()
        finally:
            hashed.unpersist()
        _write_reconcile_watermark(spark, store_dir, int(newest))
        return n_affected
    finally:
        affected.unpersist()


def route_semantic_admission_batch(
    batch_df,
    batch_id: int,
    store_dir: str,
    threshold: float = 0.92,
    n_planes: int = 64,
    n_bands: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """One micro-batch of streaming SEMANTIC admission — the
    incremental face of :func:`~csv_query_engine_spark.pipeline.
    similarity.semantic_dedup_survivors` (round 13): the bucket-MIN
    store idiom instantiated for EMBEDDING space, so each incoming
    vector verifies against at most ``n_bands`` candidates (the merged
    min of each of its quantized-hyperplane-LSH buckets) no matter how
    large the admitted corpus grows — the paraphrase-catching sibling
    of :func:`route_minhash_admission_batch`, sharing its replay
    protocol, its reconciliation machinery, and its store layout.

    Store layout under ``store_dir`` (all batch_id-keyed dynamic
    overwrite — every table is a deterministic function of the batch,
    so a replay rewrites its own partitions byte-identically):

    * ``vecs``     — (vec_id, embedding): ALL batch vectors (dups
      still occupy their buckets, exactly as in the batch operator);
      later batches re-read ONLY candidate vectors from here via a
      bounded id semi-join;
    * ``mins``     — (band, bucket, min_id): the batch's own bucket
      mins; reads MIN-merge (:func:`read_semantic_bucket_mins`);
    * ``entries``  — (vec_id, band, bucket): ≤ ``n_bands`` rows per
      vector, what lets :func:`reconcile_semantic_admission` find the
      vectors a late-arriving smaller min affects without a corpus
      scan;
    * ``verdicts`` — (vec_id, is_dup, dup_of, dup_cosine): the batch
      operator's exact output columns and -1/-1.0 sentinels.

    Stream==batch contract: under ASCENDING-id arrival the accumulated
    verdicts EQUAL ``semantic_dedup_survivors(union)`` (pinned in
    tests/test_streaming.py); under arbitrary arrival
    :func:`reconcile_semantic_admission` closes the gap — the same
    watermarked maintenance pass as the minhash family, on the shared
    :func:`_stale_min_affected` detector.

    Scale: batch work is one Arrow-batched signature pass over the
    batch + ``n_bands`` bucket-min lookups/vector against a store that
    is O(distinct buckets); candidate vectors re-read ≤
    n_bands×|batch| store rows via a broadcastable id semi-join; the
    verify join carries one ``dim``-float payload per side (no
    estimate screen needed — the bucket-MIN bound already caps
    candidates, and the round-13 scale probe measured the batch face
    wall-free at 2M vectors)."""
    from pyspark.storagelevel import StorageLevel

    from csv_query_engine_spark.pipeline import similarity as sim

    spark = batch_df.sparkSession
    mins_schema = "band INT, bucket INT, min_id BIGINT, batch_id BIGINT"
    vecs_schema = "vec_id BIGINT, embedding ARRAY<FLOAT>, batch_id BIGINT"

    buckets_udf = sim.quantized_band_buckets_udf(
        sim._quantized_planes(n_planes, dim), n_bands
    )
    batch = batch_df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<float>").alias("embedding"),
    )
    # the vector table feeds the bucket scan, the verify join (both
    # sides' batch half) and the vecs-store write — persist once
    v = batch.select(
        "vec_id",
        "embedding",
        sim._quantized_norm(F.col("embedding")).alias("nq"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        be = v.select(
            "vec_id", F.posexplode(buckets_udf(F.col("embedding"))).alias("band", "bucket")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        batch_mins = be.groupBy("band", "bucket").agg(F.min("vec_id").alias("min_id"))
        prev_mins = (
            _read_store_or_empty(spark, f"{store_dir}/mins", mins_schema)
            .filter(F.col("batch_id") < int(batch_id))
            .select("band", "bucket", "min_id")
        )
        merged = (
            prev_mins.unionByName(batch_mins)
            .groupBy("band", "bucket")
            .agg(F.min("min_id").alias("min_id"))
        )
        cand = (
            be.join(merged, ["band", "bucket"])
            .filter(F.col("min_id") != F.col("vec_id"))
            .select("vec_id", F.col("min_id").alias("cand"))
            .distinct()
        )
        prev_vecs = (
            _read_store_or_empty(spark, f"{store_dir}/vecs", vecs_schema)
            .filter(F.col("batch_id") < int(batch_id))
            .select("vec_id", "embedding")
            .join(
                F.broadcast(cand.select(F.col("cand").alias("vec_id")).distinct()),
                "vec_id",
                "left_semi",
            )
        )
        cand_vecs = v.select("vec_id", "embedding", "nq").unionByName(
            prev_vecs.select(
                "vec_id",
                "embedding",
                sim._quantized_norm(F.col("embedding")).alias("nq"),
            )
        )
        score = sim.quantized_cosine(
            F.col("vec_a"), F.col("vec_b"), F.col("na"), F.col("nb")
        )
        scored = (
            cand.join(
                v.select(
                    "vec_id", F.col("embedding").alias("vec_a"), F.col("nq").alias("na")
                ),
                "vec_id",
            )
            .join(
                cand_vecs.select(
                    F.col("vec_id").alias("cand"),
                    F.col("embedding").alias("vec_b"),
                    F.col("nq").alias("nb"),
                ),
                "cand",
            )
            .select("vec_id", "cand", score.alias("cos"))
            .filter(F.col("cos") >= F.lit(float(threshold)))
        )
        dup = (
            scored.groupBy("vec_id")
            .agg(F.min(F.struct(F.col("cand"), F.col("cos"))).alias("m"))
            .select(
                "vec_id",
                F.col("m.cand").alias("dup_of"),
                F.col("m.cos").alias("dup_cosine"),
            )
        )
        # spine = every batch vector (the batch operator's spine is the
        # vector table itself — unlike shingles, every vector buckets)
        verdicts = (
            v.select("vec_id")
            .join(dup, "vec_id", "left")
            .select(
                "vec_id",
                F.col("dup_of").isNotNull().alias("is_dup"),
                F.coalesce(F.col("dup_of"), F.lit(-1)).cast("bigint").alias("dup_of"),
                F.coalesce(F.col("dup_cosine"), F.lit(-1.0)).alias("dup_cosine"),
            )
        )
        entries = be.select("vec_id", "band", "bucket")
        for side, sub in (
            (batch, "vecs"),
            (batch_mins, "mins"),
            (entries, "entries"),
            (verdicts, "verdicts"),
        ):
            (
                side.withColumn("batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(f"{store_dir}/{sub}")
            )
        wm = _read_reconcile_watermark(spark, store_dir)
        if wm is not None and int(batch_id) <= wm:
            _drop_reconcile_watermark(spark, store_dir)
    finally:
        v.unpersist()
        try:
            be.unpersist()
        except NameError:
            pass


def semantic_admission_stream(
    stream: DataFrame,
    store_dir: str,
    checkpoint: str,
    threshold: float = 0.92,
    **kwargs,
):
    """Streaming semantic admission: foreachBatch routes every
    micro-batch through :func:`route_semantic_admission_batch` — the
    embedding dedup family's streaming face, completing its
    batch/streaming symmetry the way :func:`minhash_admission_stream`
    did for token space.  Checkpoint offsets + batch_id-keyed dynamic
    overwrite + the pre-batch read guard make it effectively-once
    under replay."""

    def route(batch_df, batch_id):
        route_semantic_admission_batch(
            batch_df, batch_id, store_dir, threshold=threshold, **kwargs
        )

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_semantic_bucket_mins(spark: SparkSession, store_dir: str) -> DataFrame:
    """MIN-merge every batch's bucket-min partition into the current
    semantic-admission state (the MIN-mergeable contract shared with
    the minhash store; :func:`compact_batch_store` applies)."""
    mins = _read_store_or_empty(
        spark, f"{store_dir}/mins", "band INT, bucket INT, min_id BIGINT, batch_id BIGINT"
    )
    return mins.groupBy("band", "bucket").agg(F.min("min_id").alias("min_id"))


def read_semantic_verdicts(spark: SparkSession, store_dir: str) -> DataFrame:
    """All semantic-admission verdicts accumulated so far."""
    return _read_store_or_empty(
        spark,
        f"{store_dir}/verdicts",
        "vec_id BIGINT, is_dup BOOLEAN, dup_of BIGINT, dup_cosine DOUBLE, batch_id BIGINT",
    )


def reconcile_semantic_admission(
    spark: SparkSession,
    store_dir: str,
    threshold: float = 0.92,
    n_planes: int = 64,
    n_bands: int = 8,
    dim: int = 64,
) -> int:
    """Re-verdict the vectors a LATE-arriving smaller bucket min
    affects — :func:`reconcile_minhash_admission`'s semantics applied
    to the semantic store, on the SHARED :func:`_stale_min_affected`
    detector (the drift rule): after it runs, accumulated verdicts
    equal ``semantic_dedup_survivors(union)`` under ANY arrival order.
    Returns the number of vectors re-verdicted (0 = store already
    consistent).  Run on a QUIESCENT store; passes are watermarked
    (``_reconciled_upto=``) and the route drops the watermark when a
    batch at/below it replays — identical protocol, identical crash
    story (per-batch delete-then-reinsert idempotence)."""
    from pyspark.storagelevel import StorageLevel

    from csv_query_engine_spark.pipeline import similarity as sim

    mins = _read_store_or_empty(
        spark, f"{store_dir}/mins", "band INT, bucket INT, min_id BIGINT, batch_id BIGINT"
    )
    entries = _read_store_or_empty(
        spark,
        f"{store_dir}/entries",
        "vec_id BIGINT, band INT, bucket INT, batch_id BIGINT",
    )
    affected, newest = _stale_min_affected(spark, store_dir, mins, entries, "vec_id")
    if affected is None:
        return 0
    try:
        n_affected = affected.count()
        if n_affected == 0:
            _write_reconcile_watermark(spark, store_dir, int(newest))
            return 0
        finals = mins.groupBy("band", "bucket").agg(F.min("min_id").alias("cand"))
        cand = (
            entries.join(affected.select("vec_id"), "vec_id", "left_semi")
            .join(finals, ["band", "bucket"])
            .filter(F.col("vec_id") != F.col("cand"))
            .select("vec_id", "cand")
            .distinct()
        )
        vecs_schema = "vec_id BIGINT, embedding ARRAY<FLOAT>, batch_id BIGINT"
        need_ids = (
            affected.select("vec_id")
            .unionByName(cand.select(F.col("cand").alias("vec_id")))
            .distinct()
        )
        need_vecs = (
            _read_store_or_empty(spark, f"{store_dir}/vecs", vecs_schema)
            .select("vec_id", "embedding")
            .join(need_ids, "vec_id", "left_semi")
            .select(
                "vec_id",
                "embedding",
                sim._quantized_norm(F.col("embedding")).alias("nq"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            score = sim.quantized_cosine(
                F.col("vec_a"), F.col("vec_b"), F.col("na"), F.col("nb")
            )
            verified = (
                cand.join(
                    need_vecs.select(
                        "vec_id",
                        F.col("embedding").alias("vec_a"),
                        F.col("nq").alias("na"),
                    ),
                    "vec_id",
                )
                .join(
                    need_vecs.select(
                        F.col("vec_id").alias("cand"),
                        F.col("embedding").alias("vec_b"),
                        F.col("nq").alias("nb"),
                    ),
                    "cand",
                )
                .select("vec_id", "cand", score.alias("cos"))
                .filter(F.col("cos") >= F.lit(float(threshold)))
            )
            dup = (
                verified.groupBy("vec_id")
                .agg(F.min(F.struct(F.col("cand"), F.col("cos"))).alias("m"))
                .select(
                    "vec_id",
                    F.col("m.cand").alias("_dup_of"),
                    F.col("m.cos").alias("_dup_c"),
                )
            )
            new_rows = affected.join(dup, "vec_id", "left").select(
                "vec_id",
                F.col("_dup_of").isNotNull().alias("is_dup"),
                F.coalesce(F.col("_dup_of"), F.lit(-1)).cast("bigint").alias("dup_of"),
                F.coalesce(F.col("_dup_c"), F.lit(-1.0)).alias("dup_cosine"),
                "batch_id",
            )
            verdicts_schema = (
                "vec_id BIGINT, is_dup BOOLEAN, dup_of BIGINT, "
                "dup_cosine DOUBLE, batch_id BIGINT"
            )
            old = (
                _read_store_or_empty(spark, f"{store_dir}/verdicts", verdicts_schema)
                .join(affected.select("batch_id").distinct(), "batch_id", "left_semi")
                .join(affected.select("vec_id"), "vec_id", "left_anti")
                .select("vec_id", "is_dup", "dup_of", "dup_cosine", "batch_id")
            )
            out = old.unionByName(new_rows).localCheckpoint(eager=True)
            try:
                (
                    out.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(f"{store_dir}/verdicts")
                )
            finally:
                out.unpersist()
        finally:
            need_vecs.unpersist()
        _write_reconcile_watermark(spark, store_dir, int(newest))
        return n_affected
    finally:
        affected.unpersist()


def compact_batch_store(
    spark: SparkSession,
    store_path: str,
    schema: str,
    key_cols: list[str],
    value_col: str,
    agg: str,
    upto_batch: int | None = None,
) -> int:
    """Fold every batch partition with ``batch_id <= upto_batch`` into
    ONE partition keyed by ``upto_batch`` — the maintenance face of the
    mergeable-store idiom (each read-side merge is over O(batches)
    partitions otherwise; compaction IS the same merge, made durable).
    Returns the number of partitions removed (0 = nothing to compact).

    MIN/MAX stores ONLY (minhash bucket mins, HLL registers), because
    the whole protocol is crash-safe by IDEMPOTENCE: after the merged
    partition is written, the not-yet-deleted old partitions change
    nothing (MIN/MAX of duplicates is the same value), so a crash
    between the write and any deletion — or a replayed old batch
    rewriting its partition afterwards — leaves every read correct.
    SUM stores (CM cells, HDR buckets) are REFUSED: the same crash
    window would double-count (merged total + surviving originals),
    and fixing that needs an atomic swap (a table format's commit), not
    a plain-parquet protocol.

    ``upto_batch`` defaults to everything below the NEWEST batch — the
    only batch a foreachBatch replay can still target is the last
    uncommitted one, so compacting strictly below it is safe even
    mid-stream.  The merged frame is localCheckpoint'd BEFORE the
    in-place dynamic overwrite (the round-11 compaction rule: truncate
    the file lineage Spark's overwrite-path check walks)."""
    if agg not in ("min", "max"):
        raise ValueError(
            f"compact_batch_store supports min/max stores only (got {agg!r}): "
            "SUM stores double-count in the crash window between the merged "
            "write and the old-partition deletes — use compact_sum_store "
            "(two-phase-commit generation swap) for those"
        )
    store = _read_store_or_empty(spark, store_path, schema)
    batches = sorted(r[0] for r in store.select("batch_id").distinct().collect())
    if upto_batch is None:
        if len(batches) < 2:
            return 0
        upto_batch = batches[-2]
    elif batches and upto_batch >= batches[-1]:
        # the NEWEST batch may still be an uncommitted foreachBatch: a
        # replay would rewrite its batch_id partition with batch-only
        # rows AFTER the older partitions were deleted — silent loss of
        # merged MIN/MAX state.  Guard, don't clamp (the repo's
        # guard-everything convention; round-13 ADVICE fix).
        raise ValueError(
            f"upto_batch={upto_batch} includes the newest stored batch "
            f"({batches[-1]}), which a foreachBatch replay can still rewrite "
            "— compact strictly below it (default: batches[-2])"
        )
    todo = [b for b in batches if b <= upto_batch]
    if len(todo) < 2:
        return 0
    fn = F.min if agg == "min" else F.max
    merged = (
        store.filter(F.col("batch_id") <= int(upto_batch))
        .groupBy(*key_cols)
        .agg(fn(value_col).alias(value_col))
        .withColumn("batch_id", F.lit(int(upto_batch)))
        .localCheckpoint(eager=True)
    )
    try:
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(store_path)
        )
    finally:
        merged.unpersist()
    # idempotent cleanup: each deletion is individually safe (survivors
    # merge to the same values); decoded-name matching per the round-11
    # partition-dir rule even though batch ids never escape
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(store_path)
    fs = root.getFileSystem(hconf)
    gone = {str(b) for b in todo if b != upto_batch}
    removed = 0
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("batch_id=")):
            continue
        if _unescape_path_name(name[len("batch_id="):]) in gone:
            fs.delete(st.getPath(), True)
            removed += 1
    return removed


def _store_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def _latest_committed_gen(spark: SparkSession, store_path: str) -> int | None:
    """Largest generation under ``{store}/_gen/`` that carries its
    ``_COMMITTED`` marker (marker-latest-wins — the JsonlShardSink
    two-phase-commit idiom applied to a directory swap).  Staged but
    uncommitted generations are invisible.  The ``_gen`` prefix starts
    with an underscore, so Spark's own listing of the raw store never
    sees it."""
    fs, _, jvm = _store_fs(spark, store_path)
    gen_root = jvm.org.apache.hadoop.fs.Path(f"{store_path}/_gen")
    if not fs.exists(gen_root):
        return None
    best = None
    for st in fs.listStatus(gen_root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.isdigit()):
            continue
        if fs.exists(jvm.org.apache.hadoop.fs.Path(f"{store_path}/_gen/{name}/_COMMITTED")):
            g = int(name)
            best = g if best is None or g > best else best
    return best


def read_sum_store(spark: SparkSession, store_path: str, schema: str) -> DataFrame:
    """Generation-aware read of a batch_id-keyed SUM store: the latest
    COMMITTED compaction generation (rows representing every batch
    ``<= gen``) unioned with the raw batch partitions ``batch_id >
    gen``.  The read-side exclusion of raw partitions at-or-below the
    generation is what makes the swap crash-safe for SUM state: after
    the marker lands, not-yet-deleted old partitions are simply never
    read, so the crash window between marker and deletes cannot
    double-count (the window the plain delete-after-merge protocol —
    ``compact_batch_store`` — is only safe for MIN/MAX in)."""
    raw = _read_store_or_empty(spark, store_path, schema)
    g = _latest_committed_gen(spark, store_path)
    if g is None:
        return raw
    gen_df = spark.read.schema(schema).parquet(f"{store_path}/_gen/{g}/data")
    return gen_df.unionByName(raw.filter(F.col("batch_id") > g))


def compact_sum_store(
    spark: SparkSession,
    store_path: str,
    schema: str,
    key_cols: list[str],
    value_col: str,
    upto_batch: int | None = None,
) -> int:
    """Fold every batch partition with ``batch_id <= upto_batch`` of a
    SUM-mergeable store (CM cells, HDR buckets) into ONE committed
    generation — the atomic-commit compaction ``compact_batch_store``
    refuses for SUM aggregates (round-12 verdict #3).  Returns the
    number of raw batch partitions removed (0 = nothing to compact).

    Two-phase-commit swap (the JsonlShardSink ``_commit-<id>`` idiom
    applied to a staged directory):

    1. SUM-merge the CURRENT read view at ``batch_id <= upto_batch``
       (previous generation + newer raw partitions) and write it to
       the staged dir ``{store}/_gen/{upto}/data`` — invisible to
       readers (no marker yet; re-staging after a crash just
       overwrites).
    2. Create the ``_COMMITTED`` marker (one atomic file create).
       From this instant :func:`read_sum_store` serves the new
       generation and IGNORES raw partitions ``<= upto_batch``.
    3. Delete the superseded raw partitions and older generations —
       each deletion individually safe because step 2 already removed
       them from every read.

    Crash between 1 and 2: readers keep the old view (exact).  Crash
    between 2 and 3: readers use the new generation; stale partitions
    are dead weight, never double-counted.  A replayed foreachBatch can
    only target the NEWEST batch, which the same guard as the MIN/MAX
    path keeps strictly above ``upto_batch`` — its rewrite lands in a
    raw partition the reader still consumes exactly once."""
    raw = _read_store_or_empty(spark, store_path, schema)
    raw_ids = sorted(r[0] for r in raw.select("batch_id").distinct().collect())
    prev_gen = _latest_committed_gen(spark, store_path)
    newest = max(raw_ids) if raw_ids else prev_gen
    if newest is None:
        return 0
    if upto_batch is None:
        candidates = [b for b in raw_ids if b < newest]
        if prev_gen is not None:
            candidates = [b for b in candidates if b > prev_gen]
        if not candidates:
            return 0
        upto_batch = candidates[-1]
    if upto_batch >= newest:
        raise ValueError(
            f"upto_batch={upto_batch} includes the newest stored batch "
            f"({newest}), which a foreachBatch replay can still rewrite — "
            "compact strictly below it"
        )
    if prev_gen is not None and upto_batch <= prev_gen:
        return 0
    view = read_sum_store(spark, store_path, schema)
    merged = (
        view.filter(F.col("batch_id") <= int(upto_batch))
        .groupBy(*key_cols)
        .agg(F.sum(value_col).cast("bigint").alias(value_col))
        .withColumn("batch_id", F.lit(int(upto_batch)).cast("bigint"))
    )
    staged = f"{store_path}/_gen/{int(upto_batch)}"
    merged.write.mode("overwrite").parquet(f"{staged}/data")
    fs, root, jvm = _store_fs(spark, store_path)
    fs.create(jvm.org.apache.hadoop.fs.Path(f"{staged}/_COMMITTED"), True).close()
    # post-commit cleanup — every step idempotent and read-invisible
    gone = {str(b) for b in raw_ids if b <= upto_batch}
    removed = 0
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("batch_id=")):
            continue
        if _unescape_path_name(name[len("batch_id="):]) in gone:
            fs.delete(st.getPath(), True)
            removed += 1
    gen_root = jvm.org.apache.hadoop.fs.Path(f"{store_path}/_gen")
    for st in fs.listStatus(gen_root):
        name = st.getPath().getName()
        if st.isDirectory() and name.isdigit() and int(name) < int(upto_batch):
            fs.delete(st.getPath(), True)
    return removed


def route_cm_batch(
    batch_df, batch_id: int, key_col: str, cells_path: str, depth: int = 4, width: int = 64
):
    """One micro-batch of the streaming Count-Min build: the batch's
    OWN cell table (≤ depth×width rows — pipeline/sketches.py::
    cm_cells) written keyed by ``batch_id`` with dynamic partition
    overwrite, so a replayed batch (foreachBatch's documented
    at-least-once failure mode) rewrites its own partition instead of
    double-counting — the round-7/8 replay idiom. Merging is the
    sketch's own contract: cells are additive, so the read side SUMs
    across batch partitions (:func:`read_cm_cells`); no per-key state
    lives in the checkpoint at all, only source offsets."""
    from csv_query_engine_spark.pipeline.sketches import cm_cells

    cells = cm_cells(batch_df.select(key_col), key_col, depth=depth, width=width)
    (
        cells.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(cells_path)
    )


def cm_sketch_stream(
    stream: DataFrame,
    key_col: str,
    cells_path: str,
    checkpoint: str,
    depth: int = 4,
    width: int = 64,
):
    """Streaming Count-Min frequency sketch: every micro-batch folds
    into a bounded per-batch cell table (:func:`route_cm_batch`);
    estimates come from the SUM-merged cells at read time.  The
    bounded-state streaming answer to "how often has key k appeared so
    far?" when the key dictionary is too large for per-key state —
    contrast running_user_totals (exact, per-key state) and
    streaming_heavy_hitters (top-k only): the CM store is
    O(depth×width×batches) no matter the key cardinality, and
    compacting old batch partitions into one is the same SUM."""

    def route(batch_df, batch_id):
        route_cm_batch(batch_df, batch_id, key_col, cells_path, depth, width)

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_cm_cells(spark: SparkSession, cells_path: str) -> DataFrame:
    """SUM-merge every batch's cell partition into one sketch (the
    mergeable contract; works the same for cross-shard or cross-day
    merges). Explicit schema — a zero-batch directory has no partitions
    to infer from (the read_csv_audited lesson).  Generation-aware
    (round 13): a :func:`compact_sum_store` generation replaces the
    partitions it folded."""
    cells = read_sum_store(
        spark, cells_path, "r INT, c BIGINT, cnt BIGINT, batch_id BIGINT"
    )
    return cells.groupBy("r", "c").agg(F.sum("cnt").cast("bigint").alias("cnt"))


def route_hll_batch(
    batch_df, batch_id: int, key_col: str, group_col: str, regs_path: str, p: int = 8
):
    """One micro-batch of the streaming HyperLogLog build: the batch's
    OWN (group, bucket, mb) register table written batch_id-keyed with
    dynamic overwrite (replay rewrites its partition byte-identically —
    registers are deterministic md5 arithmetic). Merge is the sketch's
    contract: registers combine by MAX across batches
    (:func:`read_hll_registers`), the dual of the Count-Min cells' SUM.

    The group column is cast to STRING on write so the reader's
    explicit schema (the zero-batch lesson) holds for ANY group type —
    an int-typed group would otherwise write int32 partitions the
    string-schema read cannot decode (review finding)."""
    from csv_query_engine_spark.pipeline.sketches import hll_registers

    regs = hll_registers(
        batch_df.withColumn(group_col, F.col(group_col).cast("string")),
        key_col,
        group_col,
        p=p,
    )
    (
        regs.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(regs_path)
    )


def hll_sketch_stream(
    stream: DataFrame,
    key_col: str,
    group_col: str,
    regs_path: str,
    checkpoint: str,
    p: int = 8,
):
    """Streaming distinct-count sketch: per-group HLL registers folded
    per micro-batch, MAX-merged at read time — bounded state (m rows
    per group per batch) with NO per-key stream state; duplicates
    across batches cannot move any register, so the merged estimate
    equals the one-shot batch estimate exactly."""

    def route(batch_df, batch_id):
        route_hll_batch(batch_df, batch_id, key_col, group_col, regs_path, p)

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_hll_registers(spark: SparkSession, regs_path: str, group_col: str) -> DataFrame:
    """MAX-merge every batch's register partition into one sketch
    (explicit schema — the zero-batch-directory lesson; the group
    column always reads back as STRING, :func:`route_hll_batch` casts
    it on write)."""
    regs = spark.read.schema(
        f"{group_col} STRING, b BIGINT, mb INT, batch_id BIGINT"
    ).parquet(regs_path)
    return regs.groupBy(group_col, "b").agg(F.max("mb").alias("mb"))


# ------------------------------------------- streaming retrieval index

def route_bm25_batch(
    batch_df, batch_id: int, postings_path: str, id_col: str = "doc_id", text_col: str = "text"
):
    """One micro-batch of the streaming inverted-index build: the
    batch's OWN (id, token, tf) postings (pipeline/retrieval.py::
    doc_term_frequencies) written keyed by ``batch_id`` with dynamic
    partition overwrite.  Documents are atomic per batch (each arrives
    whole), so a doc's postings are FINAL the moment its batch lands —
    the merged index is the plain union of batch partitions, no
    cross-batch combine needed — and a replayed batch (foreachBatch's
    at-least-once failure mode) rewrites its own partition
    byte-identically instead of double-counting (the round-7/8 replay
    idiom; the CM/HLL sketch-build contract applied to retrieval
    stats).  df/doclen/avgdl are NOT stored: they derive from the
    merged postings at read time, so they can never drift from the
    postings that produced them."""
    from csv_query_engine_spark.pipeline.retrieval import doc_term_frequencies

    tf = doc_term_frequencies(batch_df, id_col=id_col, text_col=text_col)
    (
        tf.withColumn("id", F.col("id").cast("long"))
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(postings_path)
    )


def bm25_index_stream(
    stream: DataFrame,
    postings_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming BM25 index maintenance: every document micro-batch
    folds into its own postings partition (:func:`route_bm25_batch`);
    scoring reads the merged index (:func:`read_bm25_postings` →
    retrieval.bm25_topk_from_postings — the SAME scoring core the
    batch operator uses, so stream-built == batch-built by
    construction).  Checkpoint state is source offsets only — the
    index lives in the partitioned store, mergeable and compactable
    (concatenating batch partitions is the merge)."""

    def route(batch_df, batch_id):
        route_bm25_batch(batch_df, batch_id, postings_path, id_col, text_col)

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_bm25_postings(spark: SparkSession, postings_path: str) -> DataFrame:
    """Merge every batch's postings into the current index with
    RETRIEVAL FRESHNESS: if a document was re-sent in a later batch
    (an update), only its LATEST batch's postings count — per-id
    max-batch_id filter, one bounded join.  Explicit schema (the
    zero-batch-directory lesson)."""
    p = spark.read.schema("id BIGINT, token STRING, tf BIGINT, batch_id BIGINT").parquet(
        postings_path
    )
    latest = p.groupBy("id").agg(F.max("batch_id").alias("batch_id"))
    return p.join(latest, ["id", "batch_id"]).select("id", "token", "tf")


def route_hdr_batch(
    batch_df, batch_id: int, value_col: str, buckets_path: str, sub_bits: int = 5
):
    """One micro-batch of the streaming quantile-sketch build: the
    batch's OWN log-bucket table (pipeline/sketches.py::hdr_buckets,
    ≤ 63·2^sub_bits + 1 rows) written batch_id-keyed with dynamic
    partition overwrite (replay rewrites its partition
    byte-identically — deterministic integer bucketing).  Merging is
    the sketch's contract: buckets are additive, so the read side SUMs
    across batch partitions (:func:`read_hdr_buckets`) — the Count-Min
    idiom for order statistics."""
    from csv_query_engine_spark.pipeline.sketches import hdr_buckets

    b = hdr_buckets(batch_df, value_col, sub_bits=sub_bits)
    (
        b.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(buckets_path)
    )


def hdr_sketch_stream(
    stream: DataFrame,
    value_col: str,
    buckets_path: str,
    checkpoint: str,
    sub_bits: int = 5,
):
    """Streaming quantile sketch: per-batch HDR bucket tables,
    SUM-merged at read time — bounded state with NO per-key stream
    state; quantile estimates from the merged sketch equal the
    one-shot batch build exactly (deterministic integer buckets)."""

    def route(batch_df, batch_id):
        route_hdr_batch(batch_df, batch_id, value_col, buckets_path, sub_bits)

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_hdr_buckets(spark: SparkSession, buckets_path: str) -> DataFrame:
    """SUM-merge every batch's bucket partition into one sketch
    (explicit schema — the zero-batch-directory lesson).
    Generation-aware (round 13): a :func:`compact_sum_store` generation
    replaces the partitions it folded."""
    b = read_sum_store(
        spark, buckets_path, "e INT, sb BIGINT, cnt BIGINT, batch_id BIGINT"
    )
    return b.groupBy("e", "sb").agg(F.sum("cnt").cast("bigint").alias("cnt"))


# ---------------------------------------- streaming entity admission

_ENTITY_RECORD_SCHEMA = (
    "rec_id BIGINT, name STRING, phone STRING, city INT, segment STRING,"
    " bal_cents BIGINT, matched_to BIGINT, batch_id BIGINT"
)
_ENTITY_VARIANT_SCHEMA = "rec_id BIGINT, variant STRING, batch_id BIGINT"


def read_entity_store(
    spark: SparkSession, store_dir: str, before_batch: int | None = None
):
    """(records, variants) of the entity-admission store — explicit
    schemas (the zero-batch-directory lesson).  ``before_batch`` is the
    REPLAY guard (CLAUDE.md round-8 invariant): a batch being routed
    must read only STRICTLY EARLIER partitions, or a replayed batch
    would see its own earlier write and mis-match against itself.
    A store that does not exist yet (the FIRST batch) reads as empty."""

    def _read(path: str, schema: str) -> DataFrame:
        from pyspark.errors import AnalysisException

        try:
            return spark.read.schema(schema).parquet(path)
        except AnalysisException as e:
            # ONLY the missing-path case reads as empty (the first
            # batch).  Any other failure (corrupt footer, permissions,
            # FS hiccup) must FAIL the batch so the checkpoint retries
            # it — an empty-store fallback would durably write wrong
            # matched_to=-1 verdicts that a replay then reproduces
            # (round-9 review finding).
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                return spark.createDataFrame([], schema)
            raise

    recs = _read(f"{store_dir}/records", _ENTITY_RECORD_SCHEMA)
    vars_ = _read(f"{store_dir}/variants", _ENTITY_VARIANT_SCHEMA)
    if before_batch is not None:
        recs = recs.filter(F.col("batch_id") < before_batch)
        vars_ = vars_.filter(F.col("batch_id") < before_batch)
    return recs, vars_


def route_entity_admission_batch(
    batch_df, batch_id: int, store_dir: str, **match_kwargs
):
    """One micro-batch of streaming entity admission: incoming records
    (rec_id, name, phone, city, segment, bal_cents) are matched against
    the accepted store with the provably-complete cross-frame blocks
    (pipeline/entity.py::entity_match_across), reusing the store's
    PRE-COMPUTED deletion-neighborhood variants (written once per batch
    — a record's variants never change, so the name block is fully
    incremental).  Every record is then appended to the store with its
    verdict: ``matched_to`` = the smallest matching store rec_id, or −1
    for a new entity.  Both tables write batch_id-keyed with dynamic
    overwrite; with the ``batch_id < current`` read guard a REPLAYED
    batch recomputes against the identical store view and rewrites its
    partitions byte-identically.

    Same-batch duplicates admit independently (the incremental-dedup
    contract) and pair up against any LATER batch through the store."""
    from pyspark.storagelevel import StorageLevel

    from csv_query_engine_spark.pipeline.entity import (
        entity_match_across,
        record_variants,
    )

    # The store schema is FIXED (rec_id + the five fixture fields), so
    # kwargs the schema cannot honor are rejected up front — a renamed
    # id or an unknown weight field would otherwise crash or silently
    # mis-block every batch (round-9 review finding).
    allowed = {
        "name_col", "name_weight", "exact_weights", "threshold",
        "block_col", "block_dist", "max_name_len",
    }
    unsupported = set(match_kwargs) - allowed
    if unsupported:
        raise ValueError(
            f"unsupported admission kwargs {sorted(unsupported)}: the store "
            f"schema is fixed to (rec_id, name, phone, city, segment, bal_cents)"
        )
    ew = match_kwargs.get("exact_weights")
    if ew is not None and not set(ew) <= {"phone", "city", "segment", "bal_cents"}:
        raise ValueError(f"exact_weights fields {sorted(ew)} not in the store schema")

    spark = batch_df.sparkSession
    store, st_vars = read_entity_store(spark, store_dir, before_batch=int(batch_id))
    # ONE materialization of the batch, ONE neighborhood build — shared
    # by the matcher and the store writes; unpersisted before return so
    # a long-running stream cannot accumulate per-batch caches.
    batch = batch_df.persist(StorageLevel.MEMORY_AND_DISK)
    inc_vars = record_variants(
        batch,
        name_col=match_kwargs.get("name_col", "name"),
        block_dist=match_kwargs.get("block_dist", 1),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        matches = entity_match_across(
            batch,
            store,
            store_variants=st_vars,
            incoming_variants=inc_vars,
            persist_incoming=False,
            **match_kwargs,
        )
        verdict = matches.groupBy(F.col("id_in").alias("rec_id")).agg(
            F.min("id_store").alias("matched_to")
        )
        out = (
            batch.join(verdict, "rec_id", "left")
            .select(
                "rec_id",
                "name",
                "phone",
                "city",
                "segment",
                "bal_cents",
                F.coalesce(F.col("matched_to"), F.lit(-1))
                .cast("long")
                .alias("matched_to"),
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{store_dir}/records")
        )
        (
            inc_vars.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{store_dir}/variants")
        )
    finally:
        batch.unpersist()
        inc_vars.unpersist()


def entity_admission_stream(
    stream: DataFrame, store_dir: str, checkpoint: str, **match_kwargs
):
    """Streaming entity admission: each record micro-batch is matched
    against everything admitted before it and appended with its
    verdict (:func:`route_entity_admission_batch`).  Checkpoint state
    is source offsets only; the store (records + precomputed name
    variants) lives in the batch_id-partitioned tables."""

    def route(batch_df, batch_id):
        route_entity_admission_batch(batch_df, batch_id, store_dir, **match_kwargs)

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# ------------------------------------------------ streaming join-view IVM

def _unescape_path_name(name: str) -> str:
    """Decode Spark's partition-directory percent-escaping (the inverse
    of ExternalCatalogUtils.escapePathName: ``%XX`` hex pairs for the
    reserved/control characters, everything else literal)."""
    out: list[str] = []
    i = 0
    while i < len(name):
        c = name[i]
        if c == "%" and i + 2 < len(name):
            try:
                out.append(chr(int(name[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(c)
        i += 1
    return "".join(out)


def _delete_emptied_buckets(spark: SparkSession, view_dir: str, emptied: set) -> None:
    """Remove bucket directories whose every row disappeared (dynamic
    overwrite cannot rewrite a partition it emits zero rows for).
    Matching is on the percent-DECODED value part of listed ``_b=*``
    directory names, so whatever escaping Spark applied when writing is
    matched exactly (ADVICE round 10 — never f-string the raw value
    into a path).  Idempotent: deleting an absent path is a no-op."""
    if not emptied:
        return
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(view_dir)
    fs = root.getFileSystem(hconf)
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("_b=")):
            continue
        if _unescape_path_name(name[3:]) in emptied:
            fs.delete(st.getPath(), True)


def route_join_view_batch(
    batch_df,
    batch_id: int,
    view_dir: str,
    dim: DataFrame,
    fact_pk: list[str],
    join_keys: list[str],
    n_buckets: int = 64,
    change_col: str = "change_type",
    bucket_expr=None,
    target_file_bytes: int | None = None,
):
    """One micro-batch of streaming JOIN-view maintenance — the
    streaming face of operators/merge.py::refresh_join_view, stored as
    bucket-partitioned parquet with COPY-ON-WRITE partition rewrites
    (the plan a Delta/Iceberg MERGE executes underneath, made
    explicit).  The view is partitioned by ``_b = pmod(xxhash64(pk),
    n_buckets)``; a change batch touches only its keys' buckets:

        out(touched) = (stored rows of touched buckets ANTI JOIN
                        batch keys) ∪ (batch upserts ⋈ dim)

    written with batch_id-free DYNAMIC partition overwrite — only
    touched buckets rewrite; untouched buckets' files are never read
    or written.  A touched bucket whose rows ALL disappeared produces
    no output rows, and dynamic overwrite cannot rewrite a partition
    it emits nothing for — those bucket directories are deleted
    explicitly (idempotent: deleting an absent path is a no-op).

    Replay contract: different from the batch_id-keyed stores — the
    rewrite is IDEMPOTENT rather than keyed.  Upsert = delete-then-
    reinsert on the pk, so routing the same batch twice leaves the
    store row-identical whether the first write landed or not (the
    second anti-join just deletes the rows the first one inserted and
    reinserts the same values).  The dim must be stable across a
    replay of THIS batch; slowly-changing dims stream their own deltas
    through :func:`route_join_view_dim_batch` (round 11), serialized
    with the fact batches by the caller.

    Scale: the anti join broadcasts the batch key set; the rewrite
    reads/writes only touched buckets (the copy-on-write amplification
    every CoW table format pays — size buckets so one bucket ≪ the
    view); the store is never shuffled.  The touched-bucket collect is
    bounded by the batch's distinct bucket values.

    PARTITION LOCALITY — the knob that decides the write
    amplification: the default hash bucket spreads UNIFORM deltas over
    every bucket (a 10k-key uniform batch touches all 64 — a full
    rewrite), which is fine for small views but defeats CoW pruning at
    scale.  When deltas are time-correlated (the normal case — recent
    keys change), pass ``bucket_expr`` = a Column computed from the
    fact row with matching locality (e.g. the month of the order
    date): a one-month delta then rewrites ONE partition no matter how
    big the view is — exactly why real lakes partition CoW tables by
    event time, not key hash.  Contract: the expression must be a
    DETERMINISTIC function of the fact columns (the same row must land
    in the same partition on replay) and its per-batch distinct-value
    count must stay small (it drives the touched-value collect and the
    partition count).  HARD contract (same as a lake's partition
    column): the bucket-determining columns are IMMUTABLE per pk — a
    delta row must carry the STORED row's bucket value, because only
    touched buckets are read: a delete/update whose bucket value
    differs from the stored row's never sees it (the old row survives,
    an update also inserts into the new bucket — a silent duplicate).
    Moving a row across buckets requires an explicit delete carrying
    the OLD bucket-determining values plus an insert with the new.
    The default hash-of-pk bucket satisfies this automatically (the pk
    is immutable by definition)."""
    from pyspark.errors import AnalysisException
    from pyspark.storagelevel import StorageLevel

    spark = batch_df.sparkSession
    bucket = (
        bucket_expr
        if bucket_expr is not None
        else F.pmod(
            F.xxhash64(*[F.col(k) for k in fact_pk]), F.lit(n_buckets)
        ).cast("int")
    )
    delta = batch_df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        touched_rows = (
            delta.select(bucket.alias("_b"), bucket.cast("string").alias("_bs"))
            .distinct()
            .collect()
        )
        # NULL check FIRST: sorted() over a mixed None/non-None batch
        # raises TypeError before the intended diagnostic (ADVICE round
        # 11 — only the all-NULL single-row case reached the ValueError).
        if any(r["_bs"] is None for r in touched_rows):
            raise ValueError(
                "join view: bucket expression produced NULL for some rows — "
                "a NULL bucket writes __HIVE_DEFAULT_PARTITION__ and breaks "
                "the emptied-bucket cleanup; make bucket_expr total over the "
                "fact columns (COALESCE a sentinel)"
            )
        touched = sorted(r["_b"] for r in touched_rows)
        # Partition-DIRECTORY matching happens on the string form (Spark
        # names dirs from the value's string repr, percent-escaping
        # special characters) — never on f-string interpolation of the
        # raw Python value (ADVICE round 10: a bucket_expr value with
        # ':' or ' ' built a path that missed the real escaped dir and
        # the "deleted" rows resurfaced on the next read).
        touched_strs = {r["_bs"] for r in touched_rows}
        if not touched:
            return
        upserts = delta.filter(F.col(change_col) != "delete").drop(change_col)
        fresh = upserts.join(dim, join_keys, "inner").withColumn("_b", bucket)
        try:
            view = spark.read.schema(fresh.schema).parquet(view_dir)
        except AnalysisException as e:
            # ONLY missing-path reads as empty (first batch); anything
            # else fails the batch so the checkpoint retries (the
            # entity-store rule).
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                view = fresh.limit(0)
            else:
                raise
        keys = delta.select(*fact_pk).distinct()
        kept = (
            view.filter(F.col("_b").isin(list(touched)))
            .join(F.broadcast(keys), fact_pk, "left_anti")
        )
        out = kept.unionByName(fresh.select(*kept.columns)).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            writer = (
                out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
            )
            if target_file_bytes is not None:
                # file-size hygiene per rewrite (round 11): derive
                # maxRecordsPerFile from a bounded Arrow sample of the
                # (already persisted) output — bounds oversized files
                # with no extra shuffle; pair with compact_join_view
                # for files-per-bucket hygiene on long streams.
                from csv_query_engine_spark.io.writers import estimate_bytes_per_row

                bpr = estimate_bytes_per_row(out)
                writer = writer.option(
                    "maxRecordsPerFile", str(max(int(target_file_bytes / bpr), 1))
                )
            writer.partitionBy("_b").parquet(view_dir)
            written = {
                r["_bs"]
                for r in out.select(F.col("_b").cast("string").alias("_bs"))
                .distinct()
                .collect()
            }
            _delete_emptied_buckets(spark, view_dir, touched_strs - written)
        finally:
            out.unpersist()
    finally:
        delta.unpersist()


def join_view_stream(
    stream: DataFrame,
    view_dir: str,
    dim: DataFrame,
    fact_pk: list[str],
    join_keys: list[str],
    checkpoint: str,
    n_buckets: int = 64,
    bucket_expr=None,
    target_file_bytes: int | None = None,
    compact_every: int | None = None,
    compact_schema: str | None = None,
    max_files_per_bucket: int = 8,
):
    """Continuously-maintained materialized JOIN view: every fact-delta
    micro-batch routes through :func:`route_join_view_batch`, so the
    parquet view tracks fact ⋈ dim under upserts and deletes without
    ever recomputing the base join.  Checkpoint offsets + the
    idempotent copy-on-write rewrite give effectively-once
    maintenance; read the view back with :func:`read_join_view`.

    File hygiene (round 11): ``target_file_bytes`` bounds per-rewrite
    file sizes, and ``compact_every=N`` runs :func:`compact_join_view`
    after every Nth batch from the SAME foreachBatch slot (so it never
    races the rewrites — the serialization contract for free);
    ``compact_schema`` (the read_join_view schema string, ``_b``
    included) is required when compaction is on.  A crash between the
    rewrite and the compaction is safe: the replayed batch's rewrite is
    idempotent and compaction is content-preserving whenever it runs."""
    if compact_every is not None and not compact_schema:
        raise ValueError("compact_every requires compact_schema")

    def route(batch_df, batch_id):
        route_join_view_batch(
            batch_df, batch_id, view_dir, dim, fact_pk, join_keys, n_buckets,
            bucket_expr=bucket_expr, target_file_bytes=target_file_bytes,
        )
        if compact_every is not None and (batch_id + 1) % compact_every == 0:
            compact_join_view(
                batch_df.sparkSession, view_dir, compact_schema,
                target_file_bytes=target_file_bytes or 128 * 1024 * 1024,
                max_files_per_bucket=max_files_per_bucket,
            )

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def route_join_view_dim_batch(
    batch_df,
    batch_id: int,
    view_dir: str,
    join_keys: list[str],
    update_cols: list[str],
    schema: str,
    change_col: str = "change_type",
    target_file_bytes: int | None = None,
) -> None:
    """One micro-batch of DIM-side join-view maintenance — the
    streaming face of operators/merge.py::refresh_join_view_dim,
    closing the static-dim gap: slowly-changing dimension deltas
    (attribute updates, key deletes) apply to the bucket store without
    ever touching the fact stream or re-running the base join.

    Plan: the delta keys broadcast against the view to find TOUCHED
    buckets (left-semi on ``join_keys``); only those buckets are read
    back, column-overwritten / retracted by ``refresh_join_view_dim``'s
    broadcast plan, and rewritten with dynamic partition overwrite.
    Buckets a delete emptied reuse the emptied-directory path.

    Write amplification is BY DESIGN the opposite of the fact route: a
    fact delta is bucket-local (time-correlated ``bucket_expr``), but a
    dim attribute touches every bucket holding that key's fact rows —
    potentially all of them.  That is why dims are the SMALL side and
    dim changes the rare stream; the contract (and why the bucket
    column may never be dim-derived: ``bucket_expr`` is a function of
    FACT columns only) is inherited from route_join_view_batch.

    Replay contract: idempotent, not batch_id-keyed — an attribute
    overwrite applied twice writes the same values; a delete applied
    twice deletes nothing more.  A crash between bucket rewrites heals
    on re-run: already-updated rows still match their key and simply
    re-receive the same values.  Fact and dim batches for the same view
    must be SERIALIZED by the caller (two writers racing dynamic
    overwrite on one directory is the same undefined behavior every
    lake format forbids); dim INSERTS are a fact-side event (an inner
    view has no dangling fact rows to revive — the
    refresh_join_view_dim split)."""
    from pyspark.storagelevel import StorageLevel

    from csv_query_engine_spark.operators.merge import refresh_join_view_dim

    spark = batch_df.sparkSession
    delta = batch_df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        view = read_join_view(spark, view_dir, schema)
        keys = delta.select(*join_keys).distinct()
        touched_rows = (
            view.join(F.broadcast(keys), join_keys, "left_semi")
            .select(F.col("_b"), F.col("_b").cast("string").alias("_bs"))
            .distinct()
            .collect()
        )
        if not touched_rows:
            return
        touched = [r["_b"] for r in touched_rows]
        if any(r["_bs"] is None for r in touched_rows):
            raise ValueError(
                "join view: bucket expression produced NULL for some rows — "
                "a NULL bucket writes __HIVE_DEFAULT_PARTITION__ and breaks "
                "the emptied-bucket cleanup; make bucket_expr total over the "
                "fact columns (COALESCE a sentinel)"
            )
        touched_strs = {r["_bs"] for r in touched_rows}
        sub = view.filter(F.col("_b").isin(touched))
        out = refresh_join_view_dim(
            sub, delta, join_keys, update_cols, change_col
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            writer = (
                out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
            )
            if target_file_bytes is not None:
                # same per-rewrite sizing as the fact route
                from csv_query_engine_spark.io.writers import estimate_bytes_per_row

                bpr = estimate_bytes_per_row(out)
                writer = writer.option(
                    "maxRecordsPerFile", str(max(int(target_file_bytes / bpr), 1))
                )
            writer.partitionBy("_b").parquet(view_dir)
            written = {
                r["_bs"]
                for r in out.select(F.col("_b").cast("string").alias("_bs"))
                .distinct()
                .collect()
            }
            _delete_emptied_buckets(spark, view_dir, touched_strs - written)
        finally:
            out.unpersist()
    finally:
        delta.unpersist()


def join_view_dim_stream(
    dim_stream: DataFrame,
    view_dir: str,
    join_keys: list[str],
    update_cols: list[str],
    schema: str,
    checkpoint: str,
):
    """Continuous dim-side maintenance: every dim-delta micro-batch
    routes through :func:`route_join_view_dim_batch`.  Run it and the
    fact-side :func:`join_view_stream` with ``availableNow``/triggered
    hand-offs (or a single orchestrating stream) so their batches never
    interleave on the store — the serialization contract above."""

    def route(batch_df, batch_id):
        route_join_view_dim_batch(
            batch_df, batch_id, view_dir, join_keys, update_cols, schema,
        )

    return (
        dim_stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def read_join_view(spark: SparkSession, view_dir: str, schema: str) -> DataFrame:
    """The maintained view, with an EXPLICIT schema (the zero-row /
    emptied-store lesson: a view whose every bucket was deleted has no
    files to infer from).  ``schema`` must include the ``_b INT``
    bucket column."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(schema).parquet(view_dir)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], schema)
        raise


def join_view_file_census(spark: SparkSession, view_dir: str) -> dict[str, tuple[str, int]]:
    """Per-bucket data-file census of a CoW join view: decoded bucket
    value -> (escaped directory name, file count).  Pure listing — no
    data read; the input to :func:`compact_join_view`'s hot-bucket
    selection and the test pin on bounded files-per-bucket."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(view_dir)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return {}
    out: dict[str, tuple[str, int]] = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("_b=")):
            continue
        n = sum(
            1
            for f in fs.listStatus(st.getPath())
            if f.isFile() and not f.getPath().getName().startswith(("_", "."))
        )
        out[_unescape_path_name(name[3:])] = (name, n)
    return out


def compact_join_view(
    spark: SparkSession,
    view_dir: str,
    schema: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    max_files_per_bucket: int = 4,
) -> dict:
    """File-hygiene maintenance for the CoW join view (round 11 — the
    long-stream fragmentation story): buckets whose data-file count
    exceeds ``max_files_per_bucket`` are rewritten bucket-local
    (repartition on ``_b`` → one writer task per bucket) with
    ``maxRecordsPerFile`` derived from a bounded Arrow sample (the
    :func:`~csv_query_engine_spark.io.writers.write_size_targeted_parquet`
    sizing), so a hot bucket ends at ⌈bucket_bytes/target⌉ files.

    Only the HOT buckets are read (direct ``_b=...`` paths under a
    basePath, never a full-view scan) and only they are rewritten
    (dynamic partition overwrite).  The hot rows are localCheckpoint'd
    before the write — that truncates the file lineage so Spark allows
    overwriting the directories it just read, and the blocks are
    released on exit (cache_scope).  Run it from the maintenance slot
    of the stream (e.g. every N batches inside foreachBatch, or a
    side job while the stream is quiesced) — the rewrite is the same
    idempotent bucket replacement the batch route performs, so a crash
    mid-compaction is healed by re-running it.

    Returns the audit knobs (no-silent-caps rule):
    ``{buckets_total, buckets_compacted, files_before, files_after,
    bytes_per_row, max_records_per_file}``."""
    from csv_query_engine_spark.io.writers import estimate_bytes_per_row
    from csv_query_engine_spark.pipeline import cache_scope

    census = join_view_file_census(spark, view_dir)
    hot = {v: (name, n) for v, (name, n) in census.items() if n > max_files_per_bucket}
    audit = {
        "buckets_total": len(census),
        "buckets_compacted": len(hot),
        "files_before": sum(n for _, n in hot.values()),
        "files_after": 0,
        "bytes_per_row": 0.0,
        "max_records_per_file": 0,
    }
    if not hot:
        return audit
    paths = [f"{view_dir}/{name}" for name, _ in hot.values()]
    rows = spark.read.option("basePath", view_dir).schema(schema).parquet(*paths)
    with cache_scope(spark):
        part = rows.repartition("_b").localCheckpoint()
        bpr = estimate_bytes_per_row(part)
        max_records = max(int(target_file_bytes / bpr), 1)
        (
            part.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .option("maxRecordsPerFile", str(max_records))
            .partitionBy("_b")
            .parquet(view_dir)
        )
    after = join_view_file_census(spark, view_dir)
    audit["files_after"] = sum(
        n for v, (_, n) in after.items() if v in hot
    )
    audit["bytes_per_row"] = bpr
    audit["max_records_per_file"] = max_records
    return audit


# ------------------------------------------------ streaming census drift

_CENSUS_SCHEMA = (
    "column_name STRING, data_type STRING, n_nonnull BIGINT, n_null BIGINT, "
    "n_distinct BIGINT, min_num DOUBLE, max_num DOUBLE, "
    "min_str STRING, max_str STRING, batch_id BIGINT"
)


def route_census_batch(batch_df, batch_id: int, census_dir: str, cols=None):
    """One micro-batch of the streaming data-census monitor: the
    batch's OWN :func:`~csv_query_engine_spark.profiler.table_profile`
    census (≤ |columns| rows — exact mode is fine, the batch is
    bounded) written batch_id-keyed with dynamic partition overwrite —
    the ACCUMULATED-state replay idiom (a replayed batch recomputes
    the identical census and rewrites its own partition)."""
    from csv_query_engine_spark.profiler import table_profile

    prof = table_profile(batch_df, cols)
    (
        prof.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(census_dir)
    )


_CENTROID_SCHEMA = "label STRING, dim INT, sum_units BIGINT, n_vecs BIGINT, batch_id BIGINT"


def route_centroid_batch(
    batch_df,
    batch_id: int,
    store_dir: str,
    label_col: str = "label",
    vec_col: str = "embedding",
):
    """One micro-batch of the streaming EMBEDDING-CENTROID monitor —
    the embedding-space sibling of the census store: the batch's own
    per-(label, dim) quantized component sums (label, dim, sum_units,
    n_vecs), where ``sum_units`` is the exact long sum of
    FLOOR(x·1e6 + 0.5) per coordinate.  The label_centroids
    quantize-before-cross-row-sum invariant makes this state EXACTLY
    SUM-mergeable (long addition is associative — no float
    partition-order drift), so the merged whole-stream centroid equals
    the one-shot batch computation bit-for-bit
    (:func:`read_merged_centroids`).  batch_id-keyed dynamic overwrite:
    the state is a deterministic function of the batch, so a replay
    rewrites its partition byte-identically (the accumulated-state
    idiom; SUM-merge on read is safe because replays REWRITE, never
    append).

    Scale: the explode is linear (|batch|×dim small numeric rows, the
    vector never shuffles as an array); state is |labels|×dim rows per
    batch."""
    dims = batch_df.select(
        F.col(label_col).cast("string").alias("label"),
        F.posexplode(vec_col).alias("dim", "_x"),
    ).select(
        "label",
        "dim",
        F.floor(F.col("_x").cast("double") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("_q"),
    )
    # count NON-NULL coordinates (F.count("_q"), not count(*)) — SUM
    # already skips NULL _q, and label_centroids divides by F.count(v);
    # counting exploded rows would break the bit-identical merge
    # contract on NULL coordinates (round-13 ADVICE fix)
    state = dims.groupBy("label", "dim").agg(
        F.sum("_q").alias("sum_units"), F.count("_q").alias("n_vecs")
    )
    (
        state.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store_dir)
    )


def centroid_stream(
    stream: DataFrame,
    store_dir: str,
    checkpoint: str,
    label_col: str = "label",
    vec_col: str = "embedding",
):
    """Streaming per-label centroid maintenance via foreachBatch →
    :func:`route_centroid_batch`; effectively-once under replay (the
    idiom)."""

    def route(batch_df, batch_id):
        route_centroid_batch(batch_df, batch_id, store_dir, label_col, vec_col)

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_merged_centroids(spark: SparkSession, store_dir: str) -> DataFrame:
    """SUM-merge every batch's centroid state into exact whole-stream
    per-label centroids — BIT-IDENTICAL to
    ``pipeline.similarity.label_centroids`` over the union of the
    batches (same quantization, same long sums, same op order
    sum→double→/1e6→/n), pinned in tests."""
    p = _read_store_or_empty(spark, store_dir, _CENTROID_SCHEMA)
    return (
        p.groupBy("label", "dim")
        .agg(F.sum("sum_units").alias("_su"), F.sum("n_vecs").alias("_n"))
        .select(
            "label",
            F.col("dim").cast("int").alias("dim"),
            (F.col("_su").cast("double") / F.lit(1e6) / F.col("_n")).alias("centroid"),
            F.col("_n").cast("long").alias("n_vecs"),
        )
    )


def read_centroid_drift(
    spark: SparkSession, store_dir: str, last_n: int | None = None
) -> DataFrame:
    """Per-transition per-LABEL centroid shift between consecutive
    stored batches — the embedding-space complement of
    :func:`read_census_drift` (embedding-model swaps, source-mix
    changes, and upstream featurization drift move centroids long
    before scalar stats notice): for every consecutive batch pair and
    every label present in BOTH, the L2 shift and cosine of the two
    per-batch centroid vectors, computed entirely from the stored
    |labels|×dim state (vectors are never re-read).  Labels appearing
    or vanishing between batches are census territory (n_vecs_old/new
    carry the sizes for labels present in both).  ``last_n`` bounds the
    timeline like the census reader's.

    One Spark job regardless of snapshot count (round-13 — the round-12
    verdict's per-transition collect loop replaced): the batch ids are
    collected ONCE (bounded — one row per micro-batch), turned into a
    broadcast (from_batch, to_batch) pair table, and every transition
    aggregates in a single lagged self-join keyed by (pair, label,
    dim)."""
    _EMPTY = (
        "from_batch BIGINT, to_batch BIGINT, label STRING, l2_shift DOUBLE, "
        "cosine DOUBLE, n_vecs_old BIGINT, n_vecs_new BIGINT"
    )
    p = _read_store_or_empty(spark, store_dir, _CENTROID_SCHEMA)
    ids = [r["batch_id"] for r in p.select("batch_id").distinct().orderBy("batch_id").collect()]
    if last_n is not None and last_n >= 0:
        ids = ids[-(last_n + 1):]
    if len(ids) < 2:
        return spark.createDataFrame([], _EMPTY)
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(ids, ids[1:])],
        "from_batch BIGINT, to_batch BIGINT",
    )
    c = F.col("sum_units").cast("double") / F.lit(1e6) / F.col("n_vecs")
    ca = p.join(F.broadcast(pairs), p["batch_id"] == pairs["from_batch"]).select(
        "from_batch", "to_batch", "label", "dim",
        c.alias("_ca"), F.col("n_vecs").alias("_na"),
    )
    cb = p.join(F.broadcast(pairs), p["batch_id"] == pairs["to_batch"]).select(
        "from_batch", "to_batch", "label", "dim",
        c.alias("_cb"), F.col("n_vecs").alias("_nb"),
    )
    return (
        ca.join(cb, ["from_batch", "to_batch", "label", "dim"])
        .groupBy("from_batch", "to_batch", "label")
        .agg(
            F.sqrt(F.sum((F.col("_cb") - F.col("_ca")) * (F.col("_cb") - F.col("_ca")))).alias("l2_shift"),
            F.sum(F.col("_ca") * F.col("_cb")).alias("_dot"),
            F.sqrt(F.sum(F.col("_ca") * F.col("_ca"))).alias("_no"),
            F.sqrt(F.sum(F.col("_cb") * F.col("_cb"))).alias("_nn"),
            F.max("_na").alias("n_vecs_old"),
            F.max("_nb").alias("n_vecs_new"),
        )
        .select(
            F.col("from_batch").cast("bigint").alias("from_batch"),
            F.col("to_batch").cast("bigint").alias("to_batch"),
            "label",
            "l2_shift",
            F.when(
                (F.col("_no") > 0) & (F.col("_nn") > 0),
                F.col("_dot") / (F.col("_no") * F.col("_nn")),
            )
            .otherwise(F.lit(0.0))
            .alias("cosine"),
            "n_vecs_old",
            "n_vecs_new",
        )
    )


_VOCAB_SCHEMA = "bucket INT, n BIGINT, batch_id BIGINT"


def route_vocab_batch(
    batch_df,
    batch_id: int,
    store_dir: str,
    text_col: str = "text",
    n_buckets: int = 1024,
):
    """One micro-batch of the streaming VOCABULARY-drift monitor — the
    text-space member of the drift triad (census = tabular, centroids =
    embeddings, this = token distribution): the batch's token counts
    folded into a FIXED-WIDTH hashed histogram (bucket =
    pmod(xxhash64(token), n_buckets) — the gram-shuffle hashing rule;
    only counts surface, so collisions just merge mass) written
    batch_id-keyed with dynamic overwrite.  State is ≤ n_buckets rows
    per batch no matter the vocabulary size — the bounded-state answer
    where a per-token store would grow with the corpus — and counts are
    SUM-mergeable across batches/shards (replays REWRITE their
    partition, so the SUM-on-read stays exact)."""
    from csv_query_engine_spark.pipeline.text import tokens

    tok = batch_df.select(F.explode(tokens(F.col(text_col))).alias("_t"))
    hist = (
        tok.select(F.pmod(F.xxhash64("_t"), F.lit(n_buckets)).cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    (
        hist.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store_dir)
    )


def vocab_stream(
    stream: DataFrame,
    store_dir: str,
    checkpoint: str,
    text_col: str = "text",
    n_buckets: int = 1024,
):
    """Streaming vocabulary-histogram maintenance via foreachBatch →
    :func:`route_vocab_batch`; effectively-once under replay."""

    def route(batch_df, batch_id):
        route_vocab_batch(batch_df, batch_id, store_dir, text_col, n_buckets)

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_vocab_drift(
    spark: SparkSession, store_dir: str, last_n: int | None = None
) -> DataFrame:
    """Per-transition Jensen-Shannon divergence between CONSECUTIVE
    stored token histograms — a template change, language-mix shift, or
    crawl-source swap moves token mass across hash buckets long before
    document counts or lengths notice.  Computed entirely from the
    ≤ n_buckets-row snapshots (text never re-read): for each adjacent
    batch pair, JS(p, q) = ½KL(p‖m) + ½KL(q‖m) with m = ½(p+q), over
    the bucket distributions (absent buckets are zero mass; the
    0·log(0) terms drop).  JS ∈ [0, ln 2]; 0 ⟺ identical bucket
    distributions.  Hash-bucketing makes this a drift PROXY (mass that
    moves within one bucket is invisible — collision odds are the
    gram-shuffle rule's), which is exactly the monitoring contract;
    per-token forensics belong to vocab_coverage on the raw text.

    One Spark job regardless of snapshot count (round-13): the batch
    ids are collected once, a broadcast (from_batch, to_batch) pair
    table keys the lagged self-join, per-pair totals join back
    (broadcast — one row per transition), and every JS aggregates in a
    single pass."""
    _EMPTY = (
        "from_batch BIGINT, to_batch BIGINT, js_divergence DOUBLE, "
        "tokens_old BIGINT, tokens_new BIGINT"
    )
    p = _read_store_or_empty(spark, store_dir, _VOCAB_SCHEMA)
    ids = [r["batch_id"] for r in p.select("batch_id").distinct().orderBy("batch_id").collect()]
    if last_n is not None and last_n >= 0:
        ids = ids[-(last_n + 1):]
    if len(ids) < 2:
        return spark.createDataFrame([], _EMPTY)
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(ids, ids[1:])],
        "from_batch BIGINT, to_batch BIGINT",
    )
    ha = p.join(F.broadcast(pairs), p["batch_id"] == pairs["from_batch"]).select(
        "from_batch", "to_batch", "bucket", F.col("n").alias("_na")
    )
    hb = p.join(F.broadcast(pairs), p["batch_id"] == pairs["to_batch"]).select(
        "from_batch", "to_batch", "bucket", F.col("n").alias("_nb")
    )
    j = ha.join(hb, ["from_batch", "to_batch", "bucket"], "full_outer").select(
        "from_batch",
        "to_batch",
        F.coalesce(F.col("_na"), F.lit(0)).alias("_na"),
        F.coalesce(F.col("_nb"), F.lit(0)).alias("_nb"),
    )
    tots = j.groupBy("from_batch", "to_batch").agg(
        F.sum("_na").alias("_ta"), F.sum("_nb").alias("_tb")
    )
    j2 = j.join(F.broadcast(tots), ["from_batch", "to_batch"])
    # guard the per-row shares so a zero-total side contributes 0 (the
    # final select emits NaN for those transitions, matching the old
    # per-pair Python branch)
    pa = F.when(F.col("_ta") > 0, F.col("_na").cast("double") / F.col("_ta").cast("double")).otherwise(F.lit(0.0))
    pb = F.when(F.col("_tb") > 0, F.col("_nb").cast("double") / F.col("_tb").cast("double")).otherwise(F.lit(0.0))
    m = (pa + pb) / F.lit(2.0)
    term = F.when(pa > 0, pa * F.log(pa / m)).otherwise(F.lit(0.0)) + F.when(
        pb > 0, pb * F.log(pb / m)
    ).otherwise(F.lit(0.0))
    return (
        j2.groupBy("from_batch", "to_batch")
        .agg(
            (F.sum(term) / F.lit(2.0)).alias("_js"),
            F.max("_ta").alias("_ta"),
            F.max("_tb").alias("_tb"),
        )
        .select(
            F.col("from_batch").cast("bigint").alias("from_batch"),
            F.col("to_batch").cast("bigint").alias("to_batch"),
            F.when((F.col("_ta") == 0) | (F.col("_tb") == 0), F.lit(float("nan")))
            .otherwise(F.col("_js"))
            .alias("js_divergence"),
            F.col("_ta").cast("bigint").alias("tokens_old"),
            F.col("_tb").cast("bigint").alias("tokens_new"),
        )
    )


_CONTAM_SCHEMA = (
    "vec_id BIGINT, contaminated INT, max_cosine DOUBLE, "
    "matched_bench_id BIGINT, batch_id BIGINT"
)


def route_contamination_batch(
    batch_df, batch_id: int, verdict_dir: str, bench: DataFrame,
    threshold: float = 0.9, id_col: str = "vec_id", vec_col: str = "embedding",
):
    """One micro-batch of the STREAMING semantic-decontamination screen:
    the batch's embeddings score against the (static, bounded,
    broadcast) benchmark set via
    :func:`~csv_query_engine_spark.pipeline.similarity.semantic_contamination`
    and the verdicts write batch_id-keyed with dynamic partition
    overwrite — the ACCUMULATED-state replay idiom (a replayed batch
    recomputes identical verdicts and rewrites its own partition
    byte-identically; the bench set must be stable across a replay,
    the stream-static contract)."""
    from csv_query_engine_spark.pipeline.similarity import semantic_contamination

    v = semantic_contamination(
        batch_df, bench, threshold=threshold, id_col=id_col, vec_col=vec_col
    )
    (
        v.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(verdict_dir)
    )


def contamination_stream(
    stream: DataFrame, verdict_dir: str, bench: DataFrame, checkpoint: str,
    threshold: float = 0.9, id_col: str = "vec_id", vec_col: str = "embedding",
):
    """Continuously-screened embedding stream: every micro-batch's
    contamination verdicts land in the batch_id-keyed store; read the
    accumulated verdicts back with :func:`read_contamination_verdicts`."""

    def route(batch_df, batch_id):
        route_contamination_batch(
            batch_df, batch_id, verdict_dir, bench, threshold, id_col, vec_col
        )

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def read_contamination_verdicts(spark: SparkSession, verdict_dir: str) -> DataFrame:
    """The accumulated verdict store, explicit schema (the zero-batch
    directory lesson); only PATH_NOT_FOUND reads as empty."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(_CONTAM_SCHEMA).parquet(verdict_dir)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], _CONTAM_SCHEMA)
        raise


def census_stream(stream: DataFrame, census_dir: str, checkpoint: str, cols=None):
    """Continuously-profiled stream: every micro-batch appends its
    census snapshot; :func:`read_census_drift` turns the store into a
    per-batch-transition drift timeline."""

    def route(batch_df, batch_id):
        route_census_batch(batch_df, batch_id, census_dir, cols)

    return (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def read_census_drift(
    spark: SparkSession, census_dir: str, last_n: int | None = None
) -> DataFrame:
    """Per-transition drift verdicts from the census store: for every
    CONSECUTIVE pair of stored batch censuses, the
    :func:`~csv_query_engine_spark.profiler.census_drift` verdict table
    keyed by (from_batch, to_batch) — schema changes and null-rate /
    cardinality shifts BETWEEN micro-batches, computed entirely from
    the stored ≤|columns|-row snapshots (the data itself is never
    re-read).  Explicit schema (the zero-batch-directory lesson);
    batch ids in a structured-streaming checkpoint are dense, so
    consecutive means ``to = from + 1``.  One Spark job regardless of
    snapshot count (round-13 — the per-transition union loop replaced
    by a broadcast pair table keying census_drift's full-outer column
    join); pass ``last_n`` to bound a long-running stream's timeline
    to its most recent N transitions (dashboards rarely want more)."""
    from pyspark.errors import AnalysisException

    from csv_query_engine_spark.profiler import census_drift

    _EMPTY = (
        "from_batch BIGINT, to_batch BIGINT, column_name STRING, status STRING, "
        "type_old STRING, type_new STRING, null_ppm_old BIGINT, "
        "null_ppm_new BIGINT, ndv_old BIGINT, ndv_new BIGINT"
    )
    try:
        p = spark.read.schema(_CENSUS_SCHEMA).parquet(census_dir)
    except AnalysisException as e:
        # only a store that does not exist yet reads as empty (the
        # entity-store rule); other failures must surface
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], _EMPTY)
        raise
    ids = [
        r["batch_id"]
        for r in p.select("batch_id").distinct().orderBy("batch_id").collect()
    ]  # bounded: one row per micro-batch
    if last_n is not None and last_n >= 0:
        ids = ids[-(last_n + 1):]
    if len(ids) < 2:
        return spark.createDataFrame([], _EMPTY)
    # one lagged self-join over ALL transitions (round-13 — replaces
    # the per-transition union loop): the broadcast pair table keys
    # census_drift's full-outer column join per (from_batch, to_batch)
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(ids, ids[1:])],
        "from_batch BIGINT, to_batch BIGINT",
    )
    old = p.join(F.broadcast(pairs), p["batch_id"] == pairs["from_batch"]).drop(
        "batch_id"
    )
    new = p.join(F.broadcast(pairs), p["batch_id"] == pairs["to_batch"]).drop(
        "batch_id"
    )
    return census_drift(old, new, key_cols=["from_batch", "to_batch"])
