"""Streaming execution path: file-source streams driven to completion via
the memory sink (availableNow), checked against the batch twins that are
themselves oracle-verified in test_queries_oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csv_query_engine_spark.queries.streaming_q import (
    events_hourly_counts,
    events_sessionization,
)
from csv_query_engine_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
    stream_dedup,
    windowed_event_counts,
)
from tests.conftest import SF_SMOKE


def test_stream_windowed_counts_matches_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    assert stream.isStreaming
    agg = windowed_event_counts(stream, window="1 hour")
    out = run_stream_to_memory(agg, "win_counts", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): r["count"]
        for r in out.collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): r["count"]
        for r in events_hourly_counts(spark, SF_SMOKE).collect()
    }
    assert got == batch


def test_stream_sessionization_append_subset_of_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    sess = sessionize_stream(stream, gap="30 minutes", watermark="1 hour")
    out = run_stream_to_memory(sess, "sessions", output_mode="append").collect()
    batch = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in events_sessionization(spark, SF_SMOKE).collect()
    }
    # Append mode emits only watermark-closed sessions -> subset of batch,
    # but the one-shot file source closes almost everything.
    assert len(out) > 0
    for r in out:
        assert batch.get((r["user_id"], r["session_start"])) == r["n_events"]
    assert len(out) >= 0.8 * len(batch)


def test_stream_dedup_within_watermark(spark, tmp_path):
    # Duplicate the events rows into a two-file stream -> every event_id
    # arrives twice; dropDuplicatesWithinWatermark must emit each once.
    src = spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(200)
    d = str(tmp_path / "dup_events")
    src.write.mode("overwrite").parquet(d)
    src.write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema(src.schema).parquet(d)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    deduped = stream_dedup(stream, watermark="1 hour")
    out = run_stream_to_memory(deduped, "dedup_events", output_mode="append")
    n = out.count()
    n_distinct = out.select("event_id").distinct().count()
    assert n == n_distinct == 200
