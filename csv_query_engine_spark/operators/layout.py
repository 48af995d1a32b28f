"""Z-order (Morton curve) data layout for multi-dimensional file
skipping.

At 100 TB the dominant cost of a selective query is the scan, and the
dominant scan optimization is *not reading files at all*: parquet
min/max footer stats (or a table format's file-level stats) prune any
file whose range cannot match.  A layout sorted on ONE column gives
perfect pruning on that column and none on any other; interleaving the
bits of two columns (the Morton / Z-order curve, the same technique
behind Delta's OPTIMIZE ZORDER BY) bounds BOTH dimensions within every
file, so range predicates on either column — or both — skip most of
the table.

Everything here is codegen'd integer bit arithmetic on DataFrame
columns (shifts/masks/ORs — no UDF), so assigning the curve position
is a map-only pass; the per-file stats table is one partial+final
aggregate on the file id.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(a: Column, b: Column, bits: int = 12) -> Column:
    """Interleave the low `bits` bits of two non-negative integer
    columns: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    Pure shifts/masks — whole-stage-codegen'd, no UDF."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda x, y: x.bitwiseOR(y), parts)


def sql_morton(a: str, b: str, bits: int = 12) -> str:
    """The identical interleave as ANSI SQL (DuckDB-runnable) — used by
    oracle twins so both engines compute bit-equal curve positions."""
    parts = []
    for i in range(bits):
        parts.append(f"((({a} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(parts) + ")"


def zorder_file_assignment(
    df: DataFrame,
    a: Column,
    b: Column,
    bits: int = 12,
    n_files: int = 64,
) -> DataFrame:
    """Assign each row a target file id by its Morton position: the top
    log2(n_files) bits of the 2*bits-bit curve index.  `a`/`b` must
    already be scaled into [0, 2^bits) (modulo or min-max integer
    scaling — exact integer ops so any engine agrees).  Writing with
    ``partitionBy/repartitionByRange(file_id)`` then materializes the
    physical layout; this operator computes the assignment and is the
    unit the stats/pruning math runs on."""
    shift = 2 * bits - (n_files - 1).bit_length()
    return df.withColumn("_z", morton_code(a, b, bits)).withColumn(
        "file_id", F.shiftright(F.col("_z"), shift)
    )


def layout_stats(assigned: DataFrame, stat_cols: list[str]) -> DataFrame:
    """Per-file footer-style statistics: row count + min/max of each
    listed column.  One partial+final aggregate on file_id."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return assigned.groupBy("file_id").agg(*aggs)


def prunable_files(stats: DataFrame, col: str, lo, hi) -> Column:
    """Predicate over the stats table: True when a file CANNOT contain
    rows with `col` in [lo, hi] — the file-skipping decision a scan
    planner makes from footer stats."""
    return (F.col(f"max_{col}") < F.lit(lo)) | (F.col(f"min_{col}") > F.lit(hi))


def compact_small_files(
    spark,
    src_dir: str,
    dst_dir: str,
    target_file_mb: int = 128,
    sort_within_by: list[str] | None = None,
) -> dict:
    """Small-file compaction — the other half of physical layout next
    to Z-ordering: a table written by many streaming micro-batches or
    fine-grained partitions accumulates thousands of tiny parquet
    files, and at 100 TB the per-file open/footer/seek overhead (plus
    the driver's file-listing memory) dominates the scan long before
    row count does. Rewrites ``src_dir`` into ``dst_dir`` with file
    count derived from TOTAL BYTES / ``target_file_mb`` (the size-based
    rule Delta/Iceberg OPTIMIZE uses — never a fixed partition count),
    optionally re-sorting within files so min/max footer stats stay
    tight for skipping.

    Returns an audit dict (files/bytes before and after, rows — rows
    are re-counted on the REWRITTEN output, so the audit is also a
    conservation check). The rewrite is one shuffle-free pass when no
    sort is requested (coalesce, not repartition); with
    ``sort_within_by`` it pays one range shuffle to restore clustering.

    Replay/crash safety: the write goes to a NEW directory (mode
    "overwrite"), never in place — swap-on-success is the caller's
    atomic rename, the same two-phase discipline as the JSONL sink."""
    import os

    def _scan(d):
        files = []
        for root, _dirs, names in os.walk(d):
            for n in names:
                if n.endswith(".parquet"):
                    files.append(os.path.join(root, n))
        return files, sum(os.path.getsize(f) for f in files)

    before_files, before_bytes = _scan(src_dir)
    df = spark.read.parquet(src_dir)
    n_out = max(1, -(-before_bytes // (target_file_mb * 1024 * 1024)))
    if sort_within_by:
        out = df.repartitionByRange(n_out, *sort_within_by).sortWithinPartitions(
            *sort_within_by
        )
    else:
        out = df.coalesce(n_out)
    out.write.mode("overwrite").parquet(dst_dir)
    after_files, after_bytes = _scan(dst_dir)
    return {
        "files_before": len(before_files),
        "files_after": len(after_files),
        "bytes_before": int(before_bytes),
        "bytes_after": int(after_bytes),
        "rows": spark.read.parquet(dst_dir).count(),
    }


def global_row_numbers(
    df: DataFrame,
    order_cols: list[str],
    ascending: bool = True,
    n_partitions: int | None = None,
) -> DataFrame:
    """Globally-ordered dense row numbers (``global_rn`` starting at 1)
    WITHOUT the unpartitioned-window shape the plan linter flags as a
    hard error — the scale-safe ROW_NUMBER() OVER (ORDER BY ...):

    1. ``repartitionByRange`` on the order columns — rows land in
       range-disjoint partitions (equal keys co-locate; boundary
       PLACEMENT is sampled and may vary run to run, but the final
       numbering never depends on where boundaries fall).
    2. a window partitioned by ``spark_partition_id()`` — every window
       group IS one data partition, so the sorts run fully parallel.
    3. per-partition row counts (≤ #partitions rows) cumulate into
       offsets via the triangular broadcast idiom (the bounded-
       post-limit-ranking rule — no window over the counts either);
       ``global_rn = offset + local_rn``.

    The LAST order column must make the ordering total (the repo's
    unique-key tiebreaker invariant) or equal rows get an arbitrary —
    though still consistent — relative order.

    Scale: one range-exchange of the data (the same shuffle a global
    sort pays), parallel per-partition sorts, and a ≤P-row broadcast —
    contrast the single-task ``Window.orderBy(...)`` funnel.  Output
    carries all input columns plus ``global_rn``."""
    from pyspark.sql import Window as W

    cols = [F.col(c) if ascending else F.col(c).desc() for c in order_cols]
    parts = (
        df.repartitionByRange(n_partitions, *cols)
        if n_partitions
        else df.repartitionByRange(*cols)
    )
    local = parts.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_rn",
        F.row_number().over(W.partitionBy("_pid").orderBy(*cols)),
    )
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    other = counts.select(F.col("_pid").alias("_pid2"), F.col("_n").alias("_n2"))
    offsets = (
        counts.join(F.broadcast(other), F.col("_pid2") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_n2"), F.lit(0)).alias("_offset"))
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("global_rn", (F.col("_offset") + F.col("_rn")).cast("bigint"))
        .drop("_pid", "_rn", "_offset")
    )
