"""Auto-sized packing knobs (round-6 item 8): `auto_fan` must keep
every level of the 3-level prefix-sum hierarchy ≤ fan rows per task at
ANY corpus size, and the auto-mode layouts must stay bit-identical to
the knob-independent semantics (global id / hash order)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from csv_query_engine_spark.pipeline.chunking import shard_assignment
from csv_query_engine_spark.pipeline.packing import auto_fan, sequence_packing


def test_auto_fan_bounds_every_level():
    """For N across 12 orders of magnitude, with bucket_size = fan and
    sb_factor = fan, every hierarchy stage handles ≤ fan rows:
    rows-per-bucket ≤ fan (dense ids), g1/g2 window partitions ≤ fan by
    construction (div fan), and the top triangular table has
    ceil(N/fan³) ≤ fan rows — so the broadcast self-join is O(fan²)
    comparisons, never corpus-proportional."""
    for exp in range(0, 13):
        n = 10**exp
        fan = auto_fan(n)
        assert fan >= 16
        k = math.ceil(n / fan)  # bucket count (dense ids)
        top = math.ceil(k / fan**2)  # rows in the triangular table
        assert top <= fan, (n, fan, top)
        # per-task row bounds: bucket window ≤ fan rows, g1/g2 ≤ fan
        assert n / max(k, 1) <= fan + 1, (n, fan)


def _docs(spark, n: int):
    # constant 3-token text -> every doc contributes exactly t tokens,
    # giving closed-form layouts checkable without a driver-side cumsum
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("alpha beta gamma").alias("text")
    )


def test_sequence_packing_auto_mode_three_magnitudes(spark):
    """Auto knobs at N = 50 / 5 000 / 500 000: id-dense constant-size
    docs must get start_offset = id * t exactly (verified distributed —
    zero mismatching rows), proving the auto-sized hierarchy composes
    to the same global prefix sum at every magnitude."""
    t = 3
    for n in (50, 5_000, 500_000):
        out = sequence_packing(_docs(spark, n), seq_len=7)
        bad = out.where(F.col("start_offset") != F.col("doc_id") * t).count()
        assert bad == 0, (n, bad)
        assert out.count() == n
        spark.catalog.clearCache()


def test_shard_assignment_auto_mode_is_permutation_layout(spark):
    """Auto knobs at N = 50 / 5 000 / 500 000: hash-ordered constant-
    size docs must occupy starts {0, t, 2t, …, (N−1)t} exactly — i.e.
    the auto-sized hierarchy still yields a permutation of the token
    stream. Checked via distributed distinct/min/max/sum closed forms
    (no driver-side ordering replay)."""
    t = 3
    for n in (50, 5_000, 500_000):
        out = shard_assignment(_docs(spark, n), shard_tokens=11).select(
            (F.col("shard_id") * 11 + F.col("offset_in_shard")).alias("start")
        )
        row = out.agg(
            F.count("*").alias("n"),
            F.countDistinct("start").alias("nd"),
            F.min("start").alias("mn"),
            F.max("start").alias("mx"),
            F.sum("start").alias("s"),
        ).first()
        assert row["n"] == n and row["nd"] == n
        assert row["mn"] == 0 and row["mx"] == (n - 1) * t
        assert row["s"] == t * n * (n - 1) // 2
        # every start must land on a token boundary of the constant size
        assert out.where(F.col("start") % t != 0).count() == 0
        spark.catalog.clearCache()
