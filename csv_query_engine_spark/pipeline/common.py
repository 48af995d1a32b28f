"""Shared driver-side helpers for the pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Decouple compute parallelism from scan layout: a single-file
    scan arrives as ONE partition and serializes the per-row stages
    (measured 50 s single-core for the sf0.1 shingle stage; 25 s for
    repetition stats -> ~2 s spread). Only under-partitioned inputs
    repartition — an input already at session parallelism (the 100 TB
    case: thousands of scan splits) passes through, avoiding a
    pointless full shuffle of the raw rows.

    Partition-count probe: the Java-side ``jdf.rdd()`` handle — it
    plans the query but skips the Python RDD wrapper's serializer
    setup that ``df.rdd`` pays on every call (this helper runs on
    every pipeline operator invocation). Falls back to ``df.rdd``
    where the internal handle is unavailable (e.g. Spark Connect).
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    try:
        n = df._jdf.rdd().getNumPartitions()
    except AttributeError:  # Spark Connect / API change
        n = df.rdd.getNumPartitions()
    if n >= p:
        return df
    return df.repartition(p)
