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


def bloom_prefiltered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    expected_n: int,
    fpp: float = 0.01,
    how: str = "inner",
    hash_mode: str = "xx",
) -> DataFrame:
    """Equi-join with a Bloom-filter runtime pre-filter on the fact
    side — the join-optimization shape Spark's own runtime row-level
    filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`) and
    Delta/Iceberg DPP apply, built explicitly so it works on ANY plan
    and its accounting is inspectable.  When the dim side is too big to
    broadcast as a hash-join table but its KEY SET fits a bitmap
    (100 M keys at 1 % fpp ≈ 120 MB; 10 M ≈ 12 MB), the fact scan is
    pre-filtered map-side to rows that can possibly match, so the
    shuffle moves only matching-plus-fpp rows instead of the whole
    100 TB fact.  No false negatives (Bloom guarantee) and the real
    join removes false positives, so the result is row-equal to
    ``fact.join(dim, ...)`` — the property the oracle twin checks.

    ``how`` is restricted to inner/left_semi: for left/full outer the
    pre-filter would DROP unmatched fact rows the join must keep.
    Build = one explode + bit_or aggregation over the dim keys
    (pipeline/decontam.py machinery — same bitmap, same packer as the
    decontamination screen); probe = one 1-row broadcast + codegen'd
    bit tests, no UDFs.  ``expected_n`` sizes the bitmap (caller-owned
    capacity contract, standard for Blooms); undersizing only raises
    fpp — correctness is unaffected."""
    from csv_query_engine_spark.pipeline.decontam import (
        bloom_build,
        bloom_pack,
        bloom_params,
        bloom_probe,
    )

    allowed = {"inner", "left_semi", "leftsemi", "semi"}
    if how.lower() not in allowed:
        raise ValueError(
            f"bloom_prefiltered_join supports inner/left_semi, got {how!r}: "
            "the pre-filter drops fact rows with no dim match, which outer "
            "joins must keep."
        )
    m_bits, k = bloom_params(expected_n, fpp)
    keys = dim.select(F.col(dim_key)).distinct()
    packed = bloom_pack(bloom_build(keys, dim_key, m_bits, k, hash_mode), m_bits)
    flagged = bloom_probe(fact, fact_key, packed, m_bits, k, "_bloom_hit", hash_mode)
    pre = flagged.filter(F.col("_bloom_hit")).drop("_bloom_hit")
    if fact_key == dim_key:
        return pre.join(dim, [fact_key], how)
    return pre.join(dim, pre[fact_key] == dim[dim_key], how)


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Key-skew diagnosis for a prospective join/aggregation key — the
    MEASURE step before reaching for :func:`salted_join` or AQE skew
    handling: the ``top_k`` heaviest keys with exact counts, shares in
    FLOOR-ppm and their dense position (``rnk``), alongside the
    dataset-level summary every row repeats (total rows, key count,
    ``skew_ratio_ppm`` = max/mean key count ×10⁶, and
    ``suggested_salt`` = ⌈max/mean⌉ — the salt factor that splits the
    hottest key into mean-sized slices).

    Scale: ONE fact-sized groupBy (the same shuffle the join itself
    would do), then everything is bounded: top-k via ordered LIMIT
    (TakeOrdered — no global sort), rank via the triangular broadcast
    self-join over ≤ top_k rows (never an unpartitioned window), and
    the summary is a 1-row broadcast.  All derived numbers are integer
    arithmetic or single IEEE ops on exact longs — oracle-pairable."""
    per_key = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    summary = per_key.agg(
        F.sum("n").cast("bigint").alias("total_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("n").cast("bigint").alias("max_n"),
    )
    topk = per_key.orderBy(F.col("n").desc(), F.col("key")).limit(top_k)
    other = topk.select(
        F.col("key").alias("_k2"), F.col("n").alias("_n2")
    )
    ranked = (
        topk.join(
            F.broadcast(other),
            (F.col("_n2") > F.col("n"))
            | ((F.col("_n2") == F.col("n")) & (F.col("_k2") <= F.col("key"))),
        )
        .groupBy("key", "n")
        .agg(F.count(F.lit(1)).cast("int").alias("rnk"))
    )
    return (
        ranked.crossJoin(F.broadcast(summary))
        .select(
            "key",
            F.col("n").cast("bigint").alias("n"),
            F.floor(
                F.col("n").cast("double")
                * F.lit(1000000.0)
                / F.col("total_rows").cast("double")
            )
            .cast("bigint")
            .alias("share_ppm"),
            "rnk",
            "total_rows",
            "n_keys",
            F.floor(
                F.col("max_n").cast("double")
                * F.lit(1000000.0)
                * F.col("n_keys").cast("double")
                / F.col("total_rows").cast("double")
            )
            .cast("bigint")
            .alias("skew_ratio_ppm"),
            F.expr(
                "CAST((max_n * n_keys + total_rows - 1) DIV total_rows AS INT)"
            ).alias("suggested_salt"),
        )
        .orderBy("rnk", "key")
    )
