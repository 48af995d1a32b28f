"""Batch MERGE (upsert) and SCD2 dimension maintenance.

The reference's DuckDB pass-through surface stops at SELECT (reference
query.py:42-45 executes arbitrary SELECTs only), but a training-data /
warehouse pipeline built on this engine needs the write-side half of
dimension upkeep: apply a change set to a snapshot (type-1 MERGE) and
maintain a versioned history (type-2 SCD).  Spark has no MERGE INTO on
plain parquet (that's a table-format feature — Delta/Iceberg), so both
are implemented as the join-based plans those formats' engines generate
underneath:

- ``merge_upsert`` — one full-outer shuffle join on the key; matched
  rows take the source's values column-wise, unmatched source rows
  insert, unmatched target rows carry through.  At 100 TB the win is
  that this is ONE key-partitioned join (bucketed/co-partitioned
  storage makes it shuffle-free on the target side) — never a per-row
  lookup loop.
- ``scd2_apply`` — closes the open version of every changed key at the
  change timestamp and opens a new one; unchanged keys and already-
  closed history pass through untouched.  One shuffle on the key for
  the open-row join; closed history is unioned back without a shuffle.

Both are pure DataFrame plans (no UDFs, no collect) and deterministic:
no-op changes (attributes equal) are detected column-wise and dropped,
so re-applying the same change set is idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    update_cols: list[str] | None = None,
) -> DataFrame:
    """MERGE INTO target USING source ON key: matched rows are updated
    (source values win on `update_cols`, other target columns carry
    through), source rows with no match are inserted, target rows with
    no match are kept.  `source` must carry the key columns plus at
    least `update_cols`; missing non-updated columns on the insert path
    come out NULL (standard MERGE behaviour for unlisted columns).

    One full-outer shuffle join on the key; resolution is column-wise
    COALESCE-style projection (codegen'd, no UDF).  The source side
    must be key-unique — enforced cheaply via dropDuplicates on the
    key, which co-partitions with the join and adds no extra shuffle.
    """
    update_cols = (
        [c for c in source.columns if c in target.columns and c not in key_cols]
        if update_cols is None
        else update_cols
    )
    src = source.dropDuplicates(key_cols).select(
        *[F.col(c).alias(f"_s_{c}") for c in source.columns],
        F.lit(True).alias("_s_present"),
    )
    cond = None
    for k in key_cols:
        clause = F.col(k) == F.col(f"_s_{k}")
        cond = clause if cond is None else (cond & clause)
    joined = target.join(src, cond, "full_outer")
    out = []
    for c in target.columns:
        if c in key_cols:
            # key: whichever side is present (they agree when both are)
            out.append(F.coalesce(F.col(c), F.col(f"_s_{c}")).alias(c))
        elif c in update_cols and f"_s_{c}" in joined.columns:
            # matched-or-insert: source wins when the source row exists
            out.append(
                F.when(F.col("_s_present"), F.col(f"_s_{c}"))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            out.append(F.col(c).alias(c))
    return joined.select(*out)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    change_ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2.  `dim` is the history table:
    key + `attr_cols` + (`valid_from`, `valid_to` NULL-when-open,
    `is_current`).  `changes` carries key + `attr_cols` +
    `change_ts_col`.  For each key in `changes` whose attributes differ
    from its open row: the open row closes at the change timestamp and
    a new open row starts there.  New keys insert an open row.  Changes
    whose attributes equal the open row are no-ops (idempotent
    re-apply).  Multiple changes per key collapse to the latest by
    `change_ts_col` (earlier intra-batch versions are not expanded —
    the batch contract is latest-wins, matching warehouse MERGE).

    One shuffle on the key: the latest-change dedup window, the
    open-row full-outer join, and (with co-partitioned storage) the
    union back of closed history all align on it.
    """
    latest = (
        changes.withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy(*key_cols).orderBy(F.col(change_ts_col).desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    open_rows = dim.filter(F.col(is_current))
    closed_rows = dim.filter(~F.col(is_current))

    src = latest.select(
        *[F.col(c).alias(f"_c_{c}") for c in key_cols],
        *[F.col(c).alias(f"_c_{c}") for c in attr_cols],
        F.col(change_ts_col).alias("_c_ts"),
    )
    cond = None
    for k in key_cols:
        clause = F.col(k) == F.col(f"_c_{k}")
        cond = clause if cond is None else (cond & clause)
    j = open_rows.join(src, cond, "full_outer")

    differs = None
    for a in attr_cols:
        d = ~F.col(a).eqNullSafe(F.col(f"_c_{a}"))
        differs = d if differs is None else (differs | d)
    has_open = F.col(is_current).isNotNull()
    has_change = F.col("_c_ts").isNotNull()
    changed = has_open & has_change & differs
    new_key = ~has_open & has_change

    dim_cols = dim.columns
    # 1. open rows: unchanged keys keep theirs; changed keys close out
    kept_or_closed = j.filter(has_open).select(
        *[
            F.when(changed, F.col("_c_ts")).otherwise(F.col(valid_to)).alias(c)
            if c == valid_to
            else F.when(changed, F.lit(False)).otherwise(F.col(is_current)).alias(c)
            if c == is_current
            else F.col(c).alias(c)
            for c in dim_cols
        ]
    )
    # 2. new open versions for changed keys, new keys insert
    opened = j.filter(changed | new_key).select(
        *[
            F.coalesce(F.col(f"_c_{c}"), F.col(c)).alias(c)
            if c in key_cols
            else F.col(f"_c_{c}").alias(c)
            if c in attr_cols
            else F.col("_c_ts").alias(c)
            if c == valid_from
            else F.lit(None).cast(dim.schema[valid_to].dataType).alias(c)
            if c == valid_to
            else F.lit(True).alias(c)
            if c == is_current
            else F.lit(None).cast(dim.schema[c].dataType).alias(c)
            for c in dim_cols
        ]
    )
    return closed_rows.unionByName(kept_or_closed).unionByName(opened)
