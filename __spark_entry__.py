"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`csv_query_engine_spark.queries` — the registry of
every implemented operator from SURVEY.md §2 plus the pipeline/streaming
extensions, each paired with a DuckDB-runnable ANSI-SQL oracle where the
semantics are SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from csv_query_engine_spark.queries import all_oracles, all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the star-schema analog of the
    reference's canonical "Which services were affected in Mumbai last
    month?" (reference models.py:31-36) — per-nation order count +
    revenue for one region and a date range."""
    return all_queries()["flagship_region_nation_revenue"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2)."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; keys missing here (vs
    ``queries()``) are genuinely non-SQL-expressible ops (LSH/streaming
    state) and get the driver's weaker rows-only check."""
    return all_oracles()
