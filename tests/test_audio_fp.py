"""Audio energy-envelope fingerprinting (pipeline/multimodal.py::
audio_fingerprints / audio_dup_pairs): planted duplicate clips must be
recovered at Hamming 0, uniform gain must not change the fingerprint,
and unrelated clips must not collide into near-dup pairs."""

from __future__ import annotations

import struct

from csv_query_engine_spark.pipeline.multimodal import (
    audio_dup_pairs,
    audio_fingerprints,
)


def _wav(samples) -> bytes:
    data = b"".join(struct.pack("<h", int(s)) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _clip(seed: int, n: int = 650):
    # deterministic LCG noise — unrelated seeds give unrelated energy
    # envelopes (a shared sawtooth would make every clip a phase-shifted
    # near-dup of every other, which the fingerprint rightly flags)
    out, x = [], seed
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
        out.append((x >> 16) % 4096 - 2048)
    return out


def _saw(seed: int, n: int = 650):
    # sawtooth with exact structure for the gain-invariance check
    return [(((seed * 37 + 11 * k) % 4096) - 2048) for k in range(n)]


def _media_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, media binary")


def test_planted_duplicates_recovered_at_hamming_zero(spark):
    a = _clip(7)
    rows = [
        (1, _wav(a)),
        (2, _wav(_clip(123))),
        (3, _wav(a)),  # exact dup of 1
        (4, _wav(_clip(555, n=700))),
    ]
    pairs = audio_dup_pairs(_media_df(spark, rows)).collect()
    assert [(r["doc_id_a"], r["doc_id_b"], r["hamming"]) for r in pairs] == [(1, 3, 0)]


def test_fingerprint_is_gain_invariant_and_deterministic(spark):
    a = _saw(9)
    # halving amplitude preserves every energy-derivative sign
    half = [s // 2 for s in a]
    rows = [(1, _wav(a)), (2, _wav(half))]
    fps = {r["doc_id"]: r["afp"] for r in audio_fingerprints(_media_df(spark, rows)).collect()}
    assert fps[1] == fps[2]
    again = {r["doc_id"]: r["afp"] for r in audio_fingerprints(_media_df(spark, rows)).collect()}
    assert fps == again


def test_distinct_content_scatters(spark):
    rows = [(i, _wav(_clip(1000 + 13 * i, n=640 + i))) for i in range(12)]
    fps = [r["afp"] for r in audio_fingerprints(_media_df(spark, rows)).collect()]
    assert len(set(fps)) == len(fps), "distinct clips must not collide"


def test_wav_encode_planted_dups_mod_4096(spark):
    """wav_encode's closed form: ids differing by exactly 4096 (same
    clip length, same samples mod 4096) encode identical WAV bytes —
    the documents-table planting the registered query relies on."""
    from csv_query_engine_spark.pipeline import multimodal as mm

    d = spark.createDataFrame([(10,), (4106,), (20,)], "doc_id long")
    media = mm.wav_encode(d)
    pairs = audio_dup_pairs(media).collect()
    assert [(r["doc_id_a"], r["doc_id_b"], r["hamming"]) for r in pairs] == [(10, 4106, 0)]


def test_plan_ships_hashes_not_audio(spark):
    rows = [(i, _wav(_clip(i))) for i in range(6)]
    plan = (
        audio_dup_pairs(_media_df(spark, rows))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # the only Python stage is the Arrow-batched fingerprint map;
    # the band join runs on the persisted 8-byte hash table
    assert "InMemoryTableScan" in plan
