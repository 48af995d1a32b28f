"""Sequence packing — mapping a document corpus onto fixed-length
training sequences (the last batch-prep step of an LLM data pipeline).

Semantics: GPT-style concat-and-split packing. Documents are laid out in
a deterministic order (ascending id) into one conceptual token stream;
training sequence ``k`` is the token slice ``[k*seq_len, (k+1)*seq_len)``.
Each document therefore has a global start offset, a home pack, an
offset within that pack, and a flag for whether it straddles a pack
boundary (where a loss mask / attention reset would go).

Scale design: the global prefix sum is computed HIERARCHICALLY with
every window PARTITIONED — no stage funnels the corpus (or any
corpus-proportional table) through one task:

1. per-bucket subtotals (``id div bucket_size``), map-side combined;
2. per-superbucket subtotals (``bucket div sb_factor``) — a tiny table,
   |corpus| / (bucket_size × sb_factor) rows (~38 k at 10^10 docs with
   the defaults);
3. exclusive cumsum over superbuckets via a TRIANGULAR self-join
   (sum of strictly-smaller superbuckets) instead of an unpartitioned
   window: O(k²) pairs on the tiny table, but broadcastable, fully
   parallel, and free of the single-task WindowExec the unpartitioned
   form forces (Spark's "No Partition Defined for Window" warning);
4. bucket offsets: window over ``btok`` PARTITIONED BY superbucket
   (≤ sb_factor rows per task);
5. doc offsets: window over ``n_tokens`` PARTITIONED BY bucket
   (≤ bucket_size rows per task, after the broadcast join of offsets).

The id-range bucketing keys every window by a prefix of ``id``, so
ordering inside a partition equals global ordering restricted to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from csv_query_engine_spark.pipeline.text import bpe_ish_token_count

DEFAULT_SEQ_LEN = 2048


def sequence_packing(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = DEFAULT_SEQ_LEN,
    bucket_size: int = 64,
    sb_factor: int = 4096,
) -> DataFrame:
    """(id, n_tokens, start_offset, pack_id, offset_in_pack,
    spans_boundary) for concat-and-split packing into ``seq_len``-token
    sequences. All-integer arithmetic (BPE-ish token estimate), so the
    DuckDB oracle matches bit-exactly.

    Empty documents (0 tokens) occupy no stream space: their pack is the
    pack their start offset falls in and they never span a boundary."""
    base = df.select(
        F.col(id_col).alias("id"),
        bpe_ish_token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    ).withColumn("bucket", F.expr(f"id div {bucket_size}"))

    bucket_totals = base.groupBy("bucket").agg(F.sum("n_tokens").alias("btok")).withColumn(
        "sb", F.expr(f"bucket div {sb_factor}")
    )
    sb_totals = bucket_totals.groupBy("sb").agg(F.sum("btok").alias("sbtok"))

    # Exclusive cumsum over the tiny superbucket table WITHOUT a window:
    # left-join every superbucket to the strictly-smaller ones and sum.
    # Quadratic in #superbuckets, but that count is |corpus|/(bucket_size
    # × sb_factor) — the join is broadcast-sized and fully parallel,
    # where an unpartitioned window would be one task however small.
    lower = sb_totals.select(F.col("sb").alias("sb_lo"), F.col("sbtok").alias("sbtok_lo"))
    sb_offsets = (
        sb_totals.join(F.broadcast(lower), F.col("sb_lo") < F.col("sb"), "left")
        .groupBy("sb")
        .agg(F.coalesce(F.sum("sbtok_lo"), F.lit(0)).alias("sb_off"))
    )

    w_bucket = (
        Window.partitionBy("sb").orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_offsets = bucket_totals.join(F.broadcast(sb_offsets), "sb").select(
        "bucket",
        (F.col("sb_off") + F.coalesce(F.sum("btok").over(w_bucket), F.lit(0))).alias("bucket_off"),
    )

    w_in = Window.partitionBy("bucket").orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    start = F.col("bucket_off") + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    laid = base.join(F.broadcast(bucket_offsets), "bucket").select(
        "id", "n_tokens", start.alias("start_offset")
    )

    end = F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - F.lit(1)
    return laid.select(
        F.col("id").alias(id_col),
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {seq_len}").alias("pack_id"),
        (F.col("start_offset") % seq_len).alias("offset_in_pack"),
        (end - (end % seq_len) > F.col("start_offset") - (F.col("start_offset") % seq_len)).alias(
            "spans_boundary"
        ),
    )
