"""Query registry: every implemented operator from SURVEY.md §2 exposed as

    name -> (callable(spark, sf_dir) -> DataFrame,  oracle_sql | None)

The driver contract (__spark_entry__.py) is a thin adapter over this.
Oracle SQL strings are ANSI SQL runnable by DuckDB against the same
parquet tables (views pre-registered by the driver).  ``None`` marks ops
that are genuinely non-SQL-expressible (LSH dedup, streaming state) —
the driver then records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (fn, oracle_sql or None)
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {k: v[0] for k, v in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {k: v[1] for k, v in REGISTRY.items() if v[1] is not None}


_LOADED = False


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for side effect: each module registers its queries.
    from csv_query_engine_spark.queries import (  # noqa: F401
        pipeline_q,
        relational,
        streaming_q,
        temporal_q,
    )

    _LOADED = True
