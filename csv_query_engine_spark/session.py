"""SparkSession factory.

One long-lived session per process (the reference opened a fresh DuckDB
connection per query, query.py:42-45 — on Spark that would throw away the
JIT-compiled codegen, the catalog, and AQE statistics, so we keep a single
session; see SURVEY.md §4).

Scale posture (tuned for correctness on local[N] *and* sanity on a real
cluster):

* AQE on (runtime join-strategy switches, skew-join splitting, partition
  coalescing) — the single biggest lever for unknown data at 100 TB.
* Arrow on for any driver<->pandas handoff (collect path, pandas UDFs).
* ``spark.sql.shuffle.partitions`` defaults to ~cores locally; on a real
  cluster AQE coalescing makes the initial number mostly irrelevant as
  long as it is high enough, so we leave it overridable via env.
* Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "csv_query_engine_spark"


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 8


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or return the existing) SparkSession with engine defaults."""
    cores = _default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cores, 8)))
    )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Harness events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanosecond timestamp type, so read as long and convert in the
        # loader (io.readers.load_tables) — DuckDB reads the same column
        # as a µs TIMESTAMP, so truncating ns->µs keeps oracle parity.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # A long-lived session compiling hundreds of generated classes
        # fills the default 240 MB JIT code cache, after which HotSpot
        # disables compilation and every stage runs interpreted
        # (measured: the heaviest query degraded 4x late in a 50-query
        # suite). Size the cache for a query-suite workload.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS",
                "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
