"""Result post-processing (reference operators A17-A20).

The reference pulls the whole result into pandas, and — if any fully
duplicated row exists — groups by ALL columns, counts, and sorts desc
(query.py:49-58). That collapses work onto the driver; here the same
semantics run *inside the Spark plan* (distributed, pre-collect).

Null-key policy (documented fix, SURVEY.md §2 A17): pandas groupby
silently drops rows with NaN in any key; Spark keeps null group keys.
We keep them — dropping data rows silently is a bug, not a semantic.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def has_duplicate_rows(df: DataFrame) -> bool:
    """Reference A18 (``result.duplicated().any()``), distributed: any
    group of all columns with count>1 — probed with an early-exit limit
    instead of two full counts."""
    return (
        df.groupBy(*df.columns)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .count()
        > 0
    )


def collapse_duplicates(df: DataFrame, count_col: str = "count") -> DataFrame:
    """Group by all columns, count, sort desc (A17 + A19)."""
    return (
        df.groupBy(*df.columns)
        .agg(F.count(F.lit(1)).alias(count_col))
        .orderBy(F.desc(count_col), *df.columns)
    )


def _collapse_probe(df: DataFrame, count_col: str = "count") -> tuple[DataFrame, bool, DataFrame | None]:
    """One-pass conditional collapse: the all-columns count aggregate is
    computed ONCE and persisted; the duplicate flag is probed from the
    cached aggregate and the collapsed plan reuses it (A17+A18+A19 in a
    single aggregation job instead of two). Returns (plan, collapsed,
    cached) — the caller must unpersist ``cached`` after materializing."""
    # Internal alias: the result may itself carry a `count` column (any
    # GROUP BY ... COUNT(*) AS count query) and the probe filter must not
    # be ambiguous. Renamed to the public name only on the collapse path.
    tmp = "__collapse_n"
    grouped = df.groupBy(*df.columns).agg(F.count(F.lit(1)).alias(tmp)).persist()
    has_dup = grouped.filter(F.col(tmp) > 1).limit(1).count() > 0
    if has_dup:
        out = grouped.orderBy(F.desc(tmp), *df.columns).withColumnRenamed(tmp, count_col)
        return out, True, grouped
    grouped.unpersist()
    return df, False, None


def collapse_if_duplicated(df: DataFrame) -> tuple[DataFrame, bool]:
    """The reference's conditional collapse (query.py:49-58). Probes via
    the one-pass aggregate; the cache is dropped before returning so
    direct callers own no persist lifecycle (:func:`materialize` uses
    :func:`_collapse_probe` directly and keeps the cache warm through
    its collect)."""
    out, collapsed, cached = _collapse_probe(df)
    if cached is not None:
        cached.unpersist()
    return out, collapsed


@dataclass
class QueryResult:
    """Result envelope (reference models.py:24-26) — plus the
    ``execution_time`` the reference's UI expected but the backend never
    sent (index.html:218 vs models.py:24-26; SURVEY.md §2 notes)."""

    sql: str
    rows: list[dict] = field(default_factory=list)
    columns: list[str] = field(default_factory=list)
    execution_time: float = 0.0
    row_count: int = 0
    collapsed: bool = False


def materialize(df: DataFrame, sql: str, limit: int | None = 200, collapse: bool = True) -> QueryResult:
    """Execute + bound + serialize (A15/A16/A20): limit applied to the
    plan (never string-append), rows as list-of-dicts, wall time
    measured around the action."""
    start = time.perf_counter()
    collapsed = False
    cached = None
    try:
        if collapse:
            df, collapsed, cached = _collapse_probe(df)
        if limit is not None:
            df = df.limit(limit)
        rows = [r.asDict(recursive=True) for r in df.collect()]
    finally:
        if cached is not None:
            cached.unpersist()
    elapsed = time.perf_counter() - start
    return QueryResult(
        sql=sql,
        rows=rows,
        columns=list(df.columns),
        execution_time=elapsed,
        row_count=len(rows),
        collapsed=collapsed,
    )
