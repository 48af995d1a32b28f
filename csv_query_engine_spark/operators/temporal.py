"""Temporal join operators: as-of join and banded range join.

Spark has no ASOF JOIN builtin (DuckDB does; the reference inherits it
via pass-through — SURVEY.md §2 Tier B joins row, reference
sql_generator.py:85-94 exposes the whole DuckDB SELECT dialect). Two
physical strategies exist:

1. inequality join + per-left-row top-1 window — O(|L|·|R|) pairs per
   key before the window prunes; fine for bounded keys, quadratic blowup
   on hot keys at 100 TB.
2. union-sort (implemented here): tag both inputs, union, single shuffle
   on the key, one ordered window pass filling the most recent right-row
   attributes forward. Linear in |L|+|R|, one shuffle, no candidate
   explosion — the strategy that survives scale. Skewed keys are AQE's
   problem only for the shuffle itself (no pair blowup to amplify it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_MATCH_T = "_asof_matched_t"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach `value_cols` from the right row with the
    greatest `right_ts` <= `left_ts` within the same `on` key (backward
    as-of). Ties on `right_ts` resolve to the greatest `tiebreak_cols`
    (deterministic). `how`: 'inner' drops unmatched left rows, 'left'
    keeps them with nulls.

    Single shuffle on `on`; window pass is linear per partition.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports how='inner' or 'left', got {how!r}")
    tiebreak_cols = tiebreak_cols or []
    out_cols = [c for c in left.columns]

    l_tagged = left.select(
        *out_cols,
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_is_right"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_tb_{c}") for c in tiebreak_cols],
    )
    r_tagged = right.select(
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in out_cols if c != on],
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        *[F.col(c).alias(f"_tb_{c}") for c in tiebreak_cols],
    ).select(*l_tagged.columns)  # align column order for unionByName-safety

    # Sort: time asc; at equal time right rows precede left rows (<=
    # semantics) and among equal-time right rows the greatest tiebreak
    # sorts last so last() picks it.
    order = [F.col("_t").asc(), F.col("_is_right").desc()] + [
        F.col(f"_tb_{c}").asc_nulls_first() for c in tiebreak_cols
    ]
    w = W.partitionBy(on).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)

    filled = l_tagged.unionByName(r_tagged).select(
        *out_cols,
        "_is_right",
        F.last(F.when(F.col("_is_right") == 1, F.col("_t")), ignorenulls=True).over(w).alias(_MATCH_T),
        *[
            F.last(F.when(F.col("_is_right") == 1, F.col(f"_v_{c}")), ignorenulls=True)
            .over(w)
            .alias(c)
            for c in value_cols
        ],
    )
    out = filled.filter(F.col("_is_right") == 0).drop("_is_right", _MATCH_T)
    if how == "inner":
        matched = filled.filter(F.col("_is_right") == 0).filter(F.col(_MATCH_T).isNotNull())
        out = matched.drop("_is_right", _MATCH_T)
    return out


def range_join_banded(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_start: str,
    right_end_expr: str,
) -> DataFrame:
    """Equi-key banded range join: left rows matched to right rows whose
    [right_start, right_end_expr) interval contains left_ts, within the
    same `on` key.

    With an equi key present, Catalyst plans a shuffle/broadcast hash
    join on the key and evaluates the band as a post-join filter — the
    right physical shape; no custom bucketing needed. (A keyless
    interval join would need interval bucketing to avoid the cartesian
    plan; all harness range joins are keyed.)
    """
    r = right.select(on, right_start, F.expr(right_end_expr).alias("_band_end"), *[
        c for c in right.columns if c not in (on, right_start)
    ])
    cond = (
        (left[on] == r[on])
        & (left[left_ts] >= r[right_start])
        & (left[left_ts] < r["_band_end"])
    )
    return left.join(r, cond).drop(r[on]).drop("_band_end")


def resample_with_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "6 hours",
) -> DataFrame:
    """Per-key time-grid resampling with forward fill — the temporal
    alignment step feature pipelines run before joining event streams
    to models: bucket each key's events onto a fixed grid spanning that
    key's own [first, last] bucket, aggregate per cell, and carry the
    last observed aggregate forward across empty cells.

    Output: (key, grid_ts, n_events, bucket_value, filled_value) —
    ``bucket_value`` is the cell's exact value sum (NULL-sentinel-free:
    0.0 in empty cells is WRONG for forward-fill semantics, so empty
    cells carry NULL there) and ``filled_value`` is the last non-null
    bucket_value at or before the cell.

    Scale: per-key min/max is one map-side-combined aggregate; the grid
    explode emits span/bucket rows per key (bounded, no global
    sequence); the left join and the forward-fill window are both keyed
    and partitioned by the key — no single-task stage, no cross joins.
    The window's ``last(ignorenulls)`` over an ordered frame is the
    linear one-pass fill; rows-unbounded-preceding keeps it streaming-
    friendly (no full-partition buffering).
    """
    from csv_query_engine_spark.queries.relational import exact_sum

    b = F.window(ts_col, bucket).getField("start")
    per_cell = (
        events.groupBy(F.col(key_col).alias("key"), b.alias("grid_ts"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact fixed-point sum: summation order cannot drift the
            # double, so the forward-filled values are oracle-stable
            exact_sum(F.col(value_col), "bucket_value"),
        )
    )
    step = F.expr(f"INTERVAL {bucket}")
    spans = per_cell.groupBy("key").agg(
        F.min("grid_ts").alias("_lo"), F.max("grid_ts").alias("_hi")
    )
    grid = spans.select(
        "key", F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias("grid_ts")
    )
    w = (
        W.partitionBy("key")
        .orderBy("grid_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(per_cell, ["key", "grid_ts"], "left")
        .select(
            F.col("key").alias(key_col),
            "grid_ts",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            "bucket_value",
            F.last("bucket_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )
