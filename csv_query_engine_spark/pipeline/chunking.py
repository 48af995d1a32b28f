"""Document chunking and shard assignment — the layout steps between a
cleaned corpus and a training/embedding job (the reference has no
pipeline layer; SURVEY.md §2 lists these under the LLM-data extensions).

* :func:`chunk_documents` — fixed-size overlapping token windows per
  document (the unit an embedding or retrieval pipeline indexes).
* :func:`shard_assignment` — deterministic, hash-ordered packing of
  documents into token-budgeted output shards (the unit a distributed
  training job reads).

Both are pure layout computations: integer arithmetic end to end, so
the DuckDB oracles match bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from csv_query_engine_spark.pipeline.packing import exclusive_bucket_offsets
from csv_query_engine_spark.pipeline.text import _spread, bpe_ish_token_count, tokens

DEFAULT_CHUNK_TOKENS = 128
DEFAULT_CHUNK_STRIDE = 96


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
    stride: int = DEFAULT_CHUNK_STRIDE,
) -> DataFrame:
    """(id, chunk_idx, start_tok, n_tokens, chunk_text): overlapping
    ``chunk_tokens``-token windows every ``stride`` tokens, covering
    every token of every document (the final window is the short
    remainder). ``stride < chunk_tokens`` gives ``chunk_tokens −
    stride`` tokens of overlap — the standard retrieval-chunking shape.

    Chunk count is ``1 + ceil(max(n − chunk, 0) / stride)`` computed in
    integer arithmetic (``(x + stride − 1) div stride``), so the oracle
    reproduces it without float rounding hazards.

    Scale: one pass — tokenize, explode the chunk INDEX (a small int
    range, not the token array), then slice/join per chunk row with
    codegen'd built-ins. No shuffle at all: chunk rows stay in their
    document's partition; downstream groupings shuffle the ~chunk-sized
    text instead of the full document, which is the point.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        # stride > chunk leaves coverage gaps AND lets the final window
        # start past the end of short documents (empty chunk) — caught
        # by the hypothesis coverage property. Full coverage and
        # non-empty windows hold exactly when stride ≤ chunk.
        raise ValueError(f"stride ({stride}) must be <= chunk_tokens ({chunk_tokens})")
    base = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))).select(
        "id", tokens(F.col("_t")).alias("toks")
    )
    n_chunks = F.lit(1) + F.expr(f"(greatest(size(toks) - {chunk_tokens}, 0) + {stride} - 1) div {stride}")
    start = F.col("chunk_idx") * F.lit(stride)
    return (
        base.select("id", "toks", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"))
        .select(
            F.col("id").alias(id_col),
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            start.cast("long").alias("start_tok"),
            F.least(F.lit(chunk_tokens), F.size("toks") - start).cast("long").alias("n_tokens"),
            F.concat_ws(" ", F.slice("toks", start + 1, chunk_tokens)).alias("chunk_text"),
        )
    )


DEFAULT_SHARD_TOKENS = 4096


def shard_assignment(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_tokens: int = DEFAULT_SHARD_TOKENS,
    salt: str = "shard-",
    n_buckets: int | None = None,
    sb_factor: int | None = None,
) -> DataFrame:
    """(id, n_tokens, shard_id, offset_in_shard): documents laid out in
    a DETERMINISTIC pseudo-random order (md5 of the salted id — the
    cross-engine hash from pipeline/sampling.py) and packed greedily
    into shards of ``shard_tokens`` BPE-ish tokens: shard_id =
    running_tokens div shard_tokens. Hash ordering decorrelates shard
    content from ingestion order — the global-shuffle property training
    shards need — while staying reproducible across engines and runs.

    Scale: the running sum uses the same fully-partitioned hierarchy as
    sequence_packing, keyed by the hash's high bits instead of the id
    range (uniform by construction): per-bucket subtotals (map-side
    combined) → the shared three-level exclusive prefix sum
    (:func:`~csv_query_engine_spark.pipeline.packing.
    exclusive_bucket_offsets` — triangular join only on the
    k/sb_factor² top table) → a window partitioned by bucket. No
    single-task stage, no quadratic term in the bucket count; the
    oracle reproduces the layout with one (tiny, oracle-side-only)
    global window.

    ``n_buckets``/``sb_factor`` default to auto-sizing from the corpus
    row count N (hash keys are uniform, so N rows spread evenly):
    fan = :func:`~csv_query_engine_spark.pipeline.packing.auto_fan`(N)
    and n_buckets = ceil(N / fan) keep EVERY hierarchy level ≤ ~N^(1/4)
    rows per task at any N. The sizing count() doubles as the action
    that materializes the persisted ``base``, so auto mode costs no
    extra corpus pass; the layout is knob-independent (global hash
    order), so explicit knobs remain for tests.

    ``base`` (corpus tokenize + count + hash) feeds BOTH the
    bucket-totals aggregate and the final offset join — persisted once
    (MEMORY_AND_DISK; CALLER-OWNED lifetime, pipeline.cache_scope /
    clearCache) so the corpus scan and bpe_ish_token_count run once.
    """
    from csv_query_engine_spark.pipeline.packing import auto_fan

    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col("id").cast("string"))), 1, 8), 16, 10).cast(
        "long"
    )
    counted = (
        _spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t")))
        .select("id", bpe_ish_token_count(F.col("_t")).cast("long").alias("n_tokens"))
        .withColumn("hkey", h)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if n_buckets is None or sb_factor is None:
        n = counted.count()
        fan = auto_fan(n)
        sb_factor = sb_factor if sb_factor is not None else fan
        n_buckets = n_buckets if n_buckets is not None else max(1, -(-n // fan))
    # 32-bit hash → top bits pick the bucket: bucket ranges are
    # contiguous in hash order, so within-bucket order + bucket
    # offsets compose to the global hash order.
    base = counted.withColumn(
        "bucket", F.expr(f"hkey div {max(1, (1 << 32) // n_buckets)}")
    )

    bucket_totals = base.groupBy("bucket").agg(F.sum("n_tokens").alias("btok"))
    bucket_offsets = exclusive_bucket_offsets(
        bucket_totals, "bucket", "btok", "bucket_off", fan=sb_factor
    )

    w_in = (
        Window.partitionBy("bucket")
        .orderBy("hkey", "id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("bucket_off") + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    return (
        base.join(F.broadcast(bucket_offsets), "bucket")
        .select(F.col("id").alias(id_col), "n_tokens", start.alias("_start"))
        .select(
            id_col,
            "n_tokens",
            F.expr(f"_start div {shard_tokens}").cast("long").alias("shard_id"),
            (F.col("_start") % shard_tokens).cast("long").alias("offset_in_shard"),
        )
    )
