"""Skew and co-location tools (SURVEY.md §7 phase 6 scale posture).

* :func:`salted_join` — manual key salting for skewed joins. AQE's
  skew-join handling (on by default in the session factory) already
  splits oversized shuffle partitions at runtime; the manual form
  remains necessary where AQE cannot act: stream-static joins, skewed
  *aggregations*, or a key so hot it overwhelms a single task even
  after AQE splitting.
* :func:`write_bucketed` / :func:`read_bucketed_table` — persistent
  bucketing: both join sides pre-hashed into the same bucket layout so
  repeated joins on the bucket key run with NO shuffle exchange at all
  (the scan's output partitioning already satisfies the join's
  requirement). The 100 TB pattern: bucket the fact tables once at
  ingest, amortize across every downstream join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join where the LEFT (big, skewed) side's hot keys are split
    across ``salt`` sub-keys and the RIGHT side is replicated ``salt``×,
    so one hot key occupies ``salt`` tasks instead of one.

    The salt is derived deterministically from spark_partition_id —
    rows of the same key already co-resident stay together (no extra
    pass), rows of a hot key arriving from many input partitions spread
    across sub-keys. Output columns = left ∪ right minus the duplicate
    key, same as ``left.join(right, on, how)``.

    ``how`` is restricted to join types where the ``salt``× replication
    of the right side cannot surface in the output: inner/left/
    left_semi/left_anti (every right row that matters is matched, so
    replication only fans out matches the left side de-salts). For
    right/full outer, an UNMATCHED right row would be emitted once per
    salt replica — wrong — so those are rejected.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "right/full-outer would emit each unmatched right row salt× (the "
            "right side is replicated). Use AQE skew-join for outer variants."
        )
    l_salted = left.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(salt)))
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l_salted.join(r_salted, [on, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist as a bucketed+sorted table: co-locates all rows of a key
    in one bucket file per bucket, so joins/aggregations on the bucket
    column skip the shuffle exchange entirely."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col).sortBy(bucket_col)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
