"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash
(SURVEY.md §7 phase 6 — the training-data-pipeline layer).

Scale design (the point of each implementation):

* **exact** — hash aggregate on the fingerprint; one shuffle keyed by a
  16-byte digest, no text moves after the map side.
* **n-gram Jaccard (exact, pairwise)** — only for bounded candidate
  sets; the all-pairs form is quadratic and kept subset-gated.
* **MinHash LSH** — the scale path for near-dup at 100 TB: shingle ->
  K minhashes (one map-side pass, built-in xxhash64, no Python) ->
  band buckets -> candidate pairs only where a band collides -> exact
  Jaccard verification of candidates. Shuffle volume is O(docs × bands),
  independent of the quadratic pair space.
* **SimHash** — 64-bit signature per doc via an Arrow-batched pandas UDF
  (bit-majority over md5-derived token hashes; built-ins cannot express
  the 64-lane majority vote without a 64× explode), then 16-bit band
  blocking and exact Hamming verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csv_query_engine_spark.pipeline.text import fingerprint, normalize_text, tokens

def _spread(df: DataFrame) -> DataFrame:
    """Repartition to the session's default parallelism before
    compute-heavy per-row stages. A small parquet input arrives as ONE
    partition (one task — measured 50s single-core for the sf0.1 shingle
    stage); compute parallelism must not be inherited from scan layout.
    At cluster scale this is a cheap round-robin of input rows, dwarfed
    by the per-row work it parallelizes."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


# --------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Keep one arbitrary row per key set (Spark's dropDuplicates).
    Non-deterministic winner — use :func:`exact_dedup_canonical` when
    the survivor must be stable."""
    return df.dropDuplicates(keys)


def exact_dedup_canonical(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic exact dedup on the normalized-text fingerprint:
    survivor = min id per fingerprint; also reports the collapsed
    duplicate count. One shuffle on the digest."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


# ------------------------------------------------------ shingles / jaccard


def char_shingles(col: Column, k: int = 5) -> Column:
    """Distinct character k-grams of the normalized text (array<string>).
    Pure built-ins: sequence + transform + substring, codegen'd."""
    s = normalize_text(col)
    n = F.greatest(F.length(s) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(s, i, k)))


def token_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams (array<string>) of the normalized text."""
    t = tokens(col)
    cnt = F.greatest(F.size(t) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), cnt - 1),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two string arrays (deterministic
    integer ratio -> bit-identical across engines)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All-pairs exact n-gram Jaccard ≥ threshold. QUADRATIC — meant for
    bounded candidate sets (a pre-filtered bucket, a sampled audit), not
    the full corpus; the corpus-scale path is :func:`minhash_lsh_pairs`."""
    grams = _spread(df).select(F.col(id_col).alias("id"), token_ngrams(F.col(text_col), n).alias("grams"))
    a = grams.select(F.col("id").alias("id_a"), F.col("grams").alias("grams_a"))
    b = grams.select(F.col("id").alias("id_b"), F.col("grams").alias("grams_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", jaccard(F.col("grams_a"), F.col("grams_b")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------ MinHash LSH


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """K minhash values per doc: min over shingles of xxhash64(seed_j,
    shingle). Entirely JVM-side; one aggregation, no explode of the hash
    dimension (the K mins are K agg expressions over one exploded
    shingle stream)."""
    sh = _spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(char_shingles(F.col(text_col), shingle_k)).alias("sh"),
    )
    aggs = [F.min(F.xxhash64(F.lit(j), F.col("sh"))).alias(f"h{j}") for j in range(num_hashes)]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH with exact-Jaccard
    verification of candidates.

    With 64 hashes / 16 bands (r=4), collision probability at the s-curve
    midpoint gives high recall for jaccard ≥ ~0.5 while keeping candidate
    volume near-linear. Verification joins shingle sets back, so emitted
    pairs are TRUE positives only (precision 1.0; recall < 1 is the
    documented LSH trade)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)

    band_entries = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws(",", F.transform(F.slice("sig", b * rows_per_band + 1, rows_per_band), lambda h: h.cast("string")))).alias("bucket"),
                ),
            )
        ).alias("be"),
    ).select("id", F.col("be.band").alias("band"), F.col("be.bucket").alias("bucket"))

    cand = (
        band_entries.alias("x")
        .join(band_entries.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )

    grams = _spread(df).select(F.col(id_col).alias("gid"), char_shingles(F.col(text_col), shingle_k).alias("grams"))
    return (
        cand.join(grams.withColumnRenamed("gid", "id_a").withColumnRenamed("grams", "grams_a"), "id_a")
        .join(grams.withColumnRenamed("gid", "id_b").withColumnRenamed("grams", "grams_b"), "id_b")
        .select("id_a", "id_b", jaccard(F.col("grams_a"), F.col("grams_b")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------- SimHash


def _simhash64(texts) -> "pd.Series":  # noqa: F821 - pandas imported lazily
    """Vectorized 64-bit SimHash: md5-derived 64-bit hash per token,
    bit-position majority vote. Deterministic (md5), no engine-specific
    hashing.

    NOTE: the worker-side twin of this logic lives INSIDE
    :func:`simhash_column`'s UDF so cloudpickle serializes it by value —
    executors' Python workers do not have this package importable, so
    nothing shipped to a worker may reference this module by name.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    out = np.zeros(len(texts), dtype=np.int64)
    for row, text in enumerate(texts):
        if not text:
            continue
        counts = np.zeros(64, dtype=np.int64)
        for tok in str(text).split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for bit in range(64):
                counts[bit] += 1 if (h >> bit) & 1 else -1
        sig = 0
        for bit in range(64):
            if counts[bit] > 0:
                sig |= 1 << bit
        # two's-complement into int64
        out[row] = sig - (1 << 64) if sig >= (1 << 63) else sig
    return pd.Series(out)


def simhash_column() -> Column:
    """Arrow-batched pandas UDF computing SimHash of normalized text.
    Python is justified here: the 64-lane majority vote has no built-in
    expression; the UDF is vectorized per Arrow batch, not per row.

    The UDF body is self-contained (imports + logic inline) so cloudpickle
    ships it by value — workers cannot import this package."""

    @F.pandas_udf(T.LongType())
    def simhash_udf(s):
        import hashlib

        import numpy as np
        import pandas as pd

        texts = s.fillna("")
        out = np.zeros(len(texts), dtype=np.int64)
        for row, text in enumerate(texts):
            if not text:
                continue
            counts = np.zeros(64, dtype=np.int64)
            for tok in str(text).split():
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                for bit in range(64):
                    counts[bit] += 1 if (h >> bit) & 1 else -1
            sig = 0
            for bit in range(64):
                if counts[bit] > 0:
                    sig |= 1 << bit
            out[row] = sig - (1 << 64) if sig >= (1 << 63) else sig
        return pd.Series(out)

    return simhash_udf(normalize_text(F.col("text")))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Blocking: split the 64-bit signature into 4×16-bit bands; any pair
    within Hamming ≤ 3 must agree exactly on ≥1 band (pigeonhole), so a
    band-equality join finds all of them without the quadratic compare.
    """
    sigs = _spread(df).select(F.col(id_col).alias("id"), simhash_column().alias("sig"))
    bands = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.shiftrightunsigned("sig", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bucket"))
                for b in range(4)
            ])
        ).alias("be"),
    ).select("id", "sig", F.col("be.band").alias("band"), F.col("be.bucket").alias("bucket"))

    hamming = F.bit_count(F.col("x.sig").bitwiseXOR(F.col("y.sig")))
    return (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"), hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
