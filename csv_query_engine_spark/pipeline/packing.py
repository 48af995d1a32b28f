"""Sequence packing — mapping a document corpus onto fixed-length
training sequences (the last batch-prep step of an LLM data pipeline).

Semantics: GPT-style concat-and-split packing. Documents are laid out in
a deterministic order (ascending id) into one conceptual token stream;
training sequence ``k`` is the token slice ``[k*seq_len, (k+1)*seq_len)``.
Each document therefore has a global start offset, a home pack, an
offset within that pack, and a flag for whether it straddles a pack
boundary (where a loss mask / attention reset would go).

Scale design: the global prefix sum is computed HIERARCHICALLY — a
per-bucket subtotal aggregation (map-side combined), an exclusive cumsum
over the tiny bucket table (a window over #buckets rows, broadcastable),
and a within-bucket window partitioned by bucket. A naive
``Window.orderBy(id)`` with no partition would pull the entire corpus
through ONE task at 100 TB; here every stage is keyed and the only
unpartitioned window runs over ~|corpus|/bucket_size rows. The id-range
bucketing keys the within-bucket window by ``id div bucket_size``, so
ordering inside a bucket equals global ordering restricted to it.
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

    bucket_totals = base.groupBy("bucket").agg(F.sum("n_tokens").alias("btok"))
    w_bucket = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_offsets = bucket_totals.select(
        "bucket", F.coalesce(F.sum("btok").over(w_bucket), F.lit(0)).alias("bucket_off")
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
