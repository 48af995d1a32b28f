"""Chart-layer operators promoted server-side (reference A22-A25).

The reference does these in browser JavaScript over the ≤200 returned
rows (index.html:277-430). Promoted into the engine they run
distributed and pre-limit, so a chart over a billion-row result
aggregates in the cluster and ships only the category points:

* A22 bar aggregation — sum of a value column per category
  (index.html:310-355, manual sum at 324-330);
* A23 pie aggregation — occurrence count per category
  (index.html:356-397, manual count at 369-374);
* A24 chart-type inference — ≥2 numeric cols -> line (first 3 numeric,
  index.html:283-309); ≥2 cols -> bar; else pie; "numeric" = every
  non-null value parses as a finite float (index.html:279-282);
* A25 CSV export with quote-escaping (index.html:400-430, escape at
  411-417) — served by ``io.writers.write_csv`` (Spark's writer
  implements RFC-4180 quoting); the helper here covers the in-memory
  rows path the reference actually exercises.
"""

from __future__ import annotations

import csv
import io
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def bar_aggregate(df: DataFrame, category_col: str, value_col: str | None = None) -> DataFrame:
    """A22: per-category total of ``value_col``; with no value column the
    reference passes a ``count`` column through unchanged — mirrored by
    counting rows. One partial+final aggregation, category-keyed."""
    if value_col is None:
        return df.groupBy(category_col).agg(F.count(F.lit(1)).alias("value"))
    return df.groupBy(category_col).agg(F.sum(value_col).alias("value"))


def pie_aggregate(df: DataFrame, category_col: str) -> DataFrame:
    """A23: occurrence count per category."""
    return df.groupBy(category_col).agg(F.count(F.lit(1)).alias("value"))


def _is_float(v) -> bool:
    if v is None:
        return False
    try:
        return math.isfinite(float(v))
    except (TypeError, ValueError):
        return False


def infer_chart_type(rows: list[dict], columns: list[str]) -> dict:
    """A24: the reference's client-side chart chooser, as a result-shape
    classifier. Returns {type, x, y} where y lists the plotted columns.

    Reference rules (index.html:277-397): a column is "numeric" if every
    non-null value parses to a finite float; ≥2 numeric columns -> line
    chart over the first 3 numeric columns; else ≥2 columns -> bar
    (first column = category, second = value); else pie on the single
    column. Runs on the already-limited row payload, like the UI did.
    """
    numeric = [
        c
        for c in columns
        if rows and all(_is_float(r.get(c)) for r in rows if r.get(c) is not None)
        and any(r.get(c) is not None for r in rows)
    ]
    if len(numeric) >= 2:
        return {"type": "line", "x": columns[0], "y": numeric[:3]}
    if len(columns) >= 2:
        return {"type": "bar", "x": columns[0], "y": [columns[1]]}
    return {"type": "pie", "x": columns[0] if columns else None, "y": []}


def rows_to_csv(rows: list[dict], columns: list[str]) -> str:
    """A25: serialize result rows to CSV with RFC-4180 quoting — the
    reference hand-escapes ``,`` and ``"`` (index.html:411-417); the
    stdlib writer implements the same contract correctly."""
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=columns, extrasaction="ignore", lineterminator="\n")
    w.writeheader()
    for r in rows:
        w.writerow({c: ("" if r.get(c) is None else r.get(c)) for c in columns})
    return buf.getvalue()
