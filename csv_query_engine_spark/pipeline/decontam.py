"""Distributed Bloom-filter membership for benchmark decontamination.

Checking a 100 TB training corpus against a benchmark set is a
membership problem: an exact semi-join shuffles the corpus keys; a
Bloom filter turns it into a broadcast bitmap probe with zero false
negatives and a tunable false-positive rate — the standard first-stage
screen before (optionally) exact-verifying the tiny flagged subset.

Everything stays a DataFrame plan:

- **build**: each benchmark value sets k = ln(2)·m/n bit positions via
  independent xxhash64(value, seed_i) probes; positions explode to
  (word, bit) pairs and a single ``bit_or`` aggregation folds them into
  an m/64-row bitmap TABLE — the filter is built by the cluster, never
  a driver loop, and merging shards is the same bit_or (mergeable
  sketch semantics).
- **probe**: the bitmap table densifies into ONE row holding an
  array<long> (a single tiny aggregation over <= m/64 rows), broadcasts,
  and every corpus row tests its k bits with codegen'd element_at +
  bit-ops — a MAP-ONLY pass over the corpus, no shuffle at all (the
  exact semi-join this replaces shuffles every corpus key).  The bitmap
  never touches the driver (contrast: Spark's own ``DataFrame.stat``
  filters are built driver-side).  Envelope: m is sized from the
  BENCHMARK set (n ~ 1e6 entries at fpp 1e-2 -> m ~ 1.2 MB), far under
  broadcast limits; the corpus side can be any size.

False positives are the contract (rate ~ (1 - e^{-kn/m})^k, sized by
``bloom_params``); false negatives are impossible — pinned by
tests/test_decontam.py.  The default xxhash64 probes are the fastest
JVM path but not ANSI-expressible; ``hash_mode="md5"`` switches every
probe to the repo's cross-engine md5 recipe, and since a Bloom bit is
set iff SOME benchmark value hashed to that position, a DuckDB twin
reproduces the whole pipeline — false positives included — as a
position-set join with no bit arithmetic at all (the basis of the
fully oracle-paired registry query, which also pins m and k so the
twin is a static string)."""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(expected_n: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k_hashes) for a target false-positive rate; m is rounded
    up to a multiple of 64 so the bitmap is whole longs."""
    if expected_n <= 0:
        return 64, 1
    m = math.ceil(-expected_n * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / expected_n * math.log(2)))
    return m, k


def _position(value: Column, m_bits: int, i: int, hash_mode: str) -> Column:
    """Bit position in [0, m_bits) for probe i of one value.

    ``hash_mode="xx"`` (default everywhere): xxhash64 with seed i — the
    fastest JVM path.  ``hash_mode="md5"``: the repo's cross-engine md5
    recipe (first 8 hex chars of ``md5('bl{i}-' || value)``), a little
    slower per probe but bit-for-bit reproducible by DuckDB — the basis
    for the fully oracle-paired decontamination query (positions decide
    the bitmap, so hash parity makes the WHOLE build/pack/probe
    pipeline, false positives included, cross-engine exact)."""
    if hash_mode == "xx":
        return F.pmod(F.xxhash64(value, F.lit(i)), F.lit(m_bits))
    if hash_mode == "md5":
        hex8 = F.substring(F.md5(F.concat(F.lit(f"bl{i}-"), value.cast("string"))), 1, 8)
        return F.pmod(F.conv(hex8, 16, 10).cast("long"), F.lit(m_bits))
    raise ValueError(f"unknown hash_mode {hash_mode!r}")


def _positions(value: Column, m_bits: int, k: int, hash_mode: str = "xx") -> Column:
    """Array of k bit positions in [0, m_bits) for one value."""
    return F.array(*[_position(value, m_bits, i, hash_mode) for i in range(k)])


def bloom_build(
    df: DataFrame, col: str, m_bits: int, k: int, hash_mode: str = "xx"
) -> DataFrame:
    """Bitmap table (word bigint, bits bigint) covering every value of
    `col`.  One explode (k rows per value) + one bit_or aggregation —
    partial+final, map-side-combined; output has <= m_bits/64 rows."""
    pos = df.select(
        F.explode(_positions(F.col(col), m_bits, k, hash_mode)).alias("_p")
    )
    return (
        pos.select(
            (F.col("_p") / 64).cast("long").alias("word"),
            F.expr("shiftleft(1L, CAST(_p % 64 AS INT))").alias("_mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_pack(bloom: DataFrame, m_bits: int) -> DataFrame:
    """Densify the (word, bits) bitmap table into ONE row holding the
    full array<long> (missing words are zero).  The range join + sort +
    transform all run over <= m_bits/64 rows — negligible; the result
    broadcasts to the probe."""
    spark = bloom.sparkSession
    words = spark.range(m_bits // 64).select(F.col("id").alias("word"))
    dense = words.join(bloom, "word", "left").select(
        "word", F.coalesce(F.col("bits"), F.lit(0).cast("long")).alias("bits")
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("word"), F.col("bits")))),
            lambda s: s["bits"],
        ).alias("_bloom")
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    packed: DataFrame,
    m_bits: int,
    k: int,
    flag: str = "maybe_member",
    hash_mode: str = "xx",
) -> DataFrame:
    """Adds boolean `flag`: True iff all k bit positions of `col` are
    set in the packed bitmap (from :func:`bloom_pack`) — possibly-a-
    member, never a false negative.

    One broadcast of the single-row bitmap + codegen'd element_at/bit
    tests per row: a map-only pass, no shuffle of the corpus.  Each
    probe's position materializes to a column first (the repo's
    materialize-before-reuse rule — the word lookup and the mask both
    read it, so the hash runs once per probe, not twice)."""
    out = df.crossJoin(F.broadcast(packed))
    pcols = [f"_p{i}" for i in range(k)]
    for i in range(k):
        out = out.withColumn(pcols[i], _position(F.col(col), m_bits, i, hash_mode))
    hit = None
    for i in range(k):
        word_bits = F.element_at(F.col("_bloom"), (F.col(pcols[i]) / 64).cast("int") + 1)
        mask = F.expr(f"shiftleft(1L, CAST({pcols[i]} % 64 AS INT))")
        h = word_bits.bitwiseAND(mask) != 0
        hit = h if hit is None else (hit & h)
    return out.withColumn(flag, hit).drop("_bloom", *pcols)
