"""Order-insensitive result comparison between a Spark DataFrame and a
DuckDB result — a local stand-in for the driver's row-count + schema +
value-hash check, but stricter: it asserts exact value equality so any
driver hash definition passes."""

from __future__ import annotations

import datetime as _dt
import math

import pandas as pd


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # Exactness is the goal: no rounding here. Queries are written so
        # both engines produce bit-identical doubles (see relational.py).
        return v
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "tolist"):  # numpy scalar / array
        return _norm_cell(v.tolist())
    return v


def to_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def assert_results_match(spark_df, duck_rel, name: str = "query") -> None:
    spdf = spark_df.toPandas()
    ddf = duck_rel.df()
    assert sorted(spdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} duckdb={sorted(ddf.columns)}"
    )
    assert len(spdf) == len(ddf), f"{name}: row count spark={len(spdf)} duckdb={len(ddf)}"
    s_rows = to_rows(spdf)
    d_rows = to_rows(ddf)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
