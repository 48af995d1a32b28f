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
2. a THREE-level exclusive prefix sum over the bucket table
   (:func:`exclusive_bucket_offsets`): two partitioned grouping/window
   levels of fan-out ``sb_factor`` and a triangular broadcast self-join
   only on the top |corpus|/(bucket_size × sb_factor²) -row table —
   ~10 rows at 10^10 docs, so the quadratic term is gone while every
   stage stays partitioned (no single-task WindowExec, no Spark
   "No Partition Defined for Window" warning);
3. doc offsets: window over ``n_tokens`` PARTITIONED BY bucket
   (≤ bucket_size rows per task, after the broadcast join of offsets).

The id-range bucketing keys every window by a prefix of ``id``, so
ordering inside a partition equals global ordering restricted to it.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from csv_query_engine_spark.pipeline.text import bpe_ish_token_count

DEFAULT_SEQ_LEN = 2048


def auto_fan(n_rows: int, floor: int = 16) -> int:
    """Knob auto-sizing shared by both packing operators: with a
    four-level hierarchy (rows-per-bucket → g1 fan → g2 fan → top
    triangle), setting every level to ~N^(1/4) keeps each stage at
    ≤ max(floor, ceil(N^0.25)) rows per task for ANY corpus size —
    ~320 at 10^10 docs — with no caller tuning. The floor keeps tiny
    inputs from degenerating to fan=1 hierarchies."""
    return max(floor, math.ceil(max(n_rows, 1) ** 0.25))


def exclusive_bucket_offsets(
    bucket_totals: DataFrame,
    key: str,
    val: str,
    out: str,
    fan: int = 4096,
) -> DataFrame:
    """Exclusive prefix sum over a (key, val) totals table with EVERY
    stage partitioned — the hierarchical cumsum both packing operators
    share.

    Two grouping levels above the input (``g1 = key div fan``,
    ``g2 = g1 div fan``) and a triangular broadcast join ONLY on the
    tiny g2 table: the quadratic term is O((k/fan²)²) — ~10 rows at
    1.6e8 buckets (10^10 docs at bucket_size 64), where the previous
    single-level form left O((k/fan)²) ≈ 7×10^8 broadcast-nested-loop
    comparisons at that scale. Below g2, both refinement steps are
    windows partitioned by the parent group (≤ fan rows per task), so
    no stage funnels a corpus-proportional table through one task.

    Returns (key, out) with ``out`` = sum of ``val`` over all strictly
    smaller keys.
    """
    g1c, g2c, g1tok, g2tok = "_g1", "_g2", "_g1tok", "_g2tok"
    lvl1 = bucket_totals.withColumn(g1c, F.expr(f"{key} div {fan}"))
    g1_totals = lvl1.groupBy(g1c).agg(F.sum(val).alias(g1tok)).withColumn(
        g2c, F.expr(f"{g1c} div {fan}")
    )
    g2_totals = g1_totals.groupBy(g2c).agg(F.sum(g1tok).alias(g2tok))

    # Triangular exclusive cumsum on the k/fan² -row top table: avoids
    # the single-task unpartitioned WindowExec however small the table.
    lower = g2_totals.select(F.col(g2c).alias("_lo"), F.col(g2tok).alias("_lotok"))
    g2_offsets = (
        g2_totals.join(F.broadcast(lower), F.col("_lo") < F.col(g2c), "left")
        .groupBy(g2c)
        .agg(F.coalesce(F.sum("_lotok"), F.lit(0)).alias("_g2off"))
    )

    w_g1 = Window.partitionBy(g2c).orderBy(g1c).rowsBetween(Window.unboundedPreceding, -1)
    g1_offsets = g1_totals.join(F.broadcast(g2_offsets), g2c).select(
        g1c,
        (F.col("_g2off") + F.coalesce(F.sum(g1tok).over(w_g1), F.lit(0))).alias("_g1off"),
    )

    w_key = Window.partitionBy(g1c).orderBy(key).rowsBetween(Window.unboundedPreceding, -1)
    return lvl1.join(F.broadcast(g1_offsets), g1c).select(
        key,
        (F.col("_g1off") + F.coalesce(F.sum(val).over(w_key), F.lit(0))).alias(out),
    )


def sequence_packing(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = DEFAULT_SEQ_LEN,
    bucket_size: int | None = None,
    sb_factor: int | None = None,
) -> DataFrame:
    """(id, n_tokens, start_offset, pack_id, offset_in_pack,
    spans_boundary) for concat-and-split packing into ``seq_len``-token
    sequences. All-integer arithmetic (BPE-ish token estimate), so the
    DuckDB oracle matches bit-exactly.

    ``bucket_size``/``sb_factor`` default to :func:`auto_fan` over the
    id SPAN (max id + 1, not the row count — id-range buckets must stay
    ≤ fan rows even for dense ids; sparse ids only make buckets
    emptier). The sizing aggregate doubles as the action that
    materializes the persisted ``base``, so auto mode costs no extra
    corpus pass. The layout itself is knob-independent (global id
    order), so explicit knobs remain available for tests.

    ``base`` (the corpus tokenize + count subtree) feeds BOTH the
    bucket-totals aggregate and the final offset join — persisted once
    (MEMORY_AND_DISK, SQL columnar cache; CALLER-OWNED lifetime, wrap
    in pipeline.cache_scope or clearCache as bench.py does) so the
    corpus scan and bpe_ish_token_count run once, not twice.

    Empty documents (0 tokens) occupy no stream space: their pack is the
    pack their start offset falls in and they never span a boundary."""
    counted = df.select(
        F.col(id_col).alias("id"),
        bpe_ish_token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if bucket_size is None or sb_factor is None:
        span = (counted.agg(F.max("id")).first()[0] or 0) + 1
        fan = auto_fan(span)
        bucket_size = bucket_size if bucket_size is not None else fan
        sb_factor = sb_factor if sb_factor is not None else fan
    base = counted.withColumn("bucket", F.expr(f"id div {bucket_size}"))

    bucket_totals = base.groupBy("bucket").agg(F.sum("n_tokens").alias("btok"))
    bucket_offsets = exclusive_bucket_offsets(
        bucket_totals, "bucket", "btok", "bucket_off", fan=sb_factor
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
