"""pipeline/multimodal.py::perceptual_hashes / phash_dup_pairs: the
aHash must be identical for identical pixels, tolerant to small
perturbations (few bits), and far for different content; the banded
blocking must recover every pair the brute-force Hamming check finds
(pigeonhole completeness at max_hamming <= 3)."""

from __future__ import annotations

import pytest

from csv_query_engine_spark.pipeline.multimodal import (
    perceptual_hashes,
    phash_dup_pairs,
)


def _ppm(w, h, pixel_fn):
    header = f"P6\n{w} {h}\n255\n".encode()
    px = bytes(pixel_fn(p) % 256 for p in range(w * h * 3))
    return header + px


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, _ppm(16, 16, lambda p: (p * 7) )),          # base image
        (2, _ppm(16, 16, lambda p: (p * 7) )),          # exact duplicate
        (3, _ppm(16, 16, lambda p: (p * 7) + (1 if p == 0 else 0))),  # 1-byte tweak
        (4, _ppm(16, 16, lambda p: (p * 131) + 37)),    # different content
        (5, _ppm(8, 24, lambda p: (p * 7) )),           # same rule, other raster
    ]
    return spark.createDataFrame(rows, "doc_id long, media binary")


def test_hashes_deterministic_and_discriminative(media):
    h = {r["doc_id"]: r["phash"] for r in perceptual_hashes(media).collect()}
    assert h[1] == h[2], "identical pixels must hash identically"
    assert bin((h[1] ^ h[3]) & ((1 << 64) - 1)).count("1") <= 3, "1-byte tweak"
    assert bin((h[1] ^ h[4]) & ((1 << 64) - 1)).count("1") > 3, "different content"


def test_banded_pairs_match_bruteforce(media):
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
        for r in phash_dup_pairs(media, max_hamming=3).collect()
    }
    h = {r["doc_id"]: r["phash"] for r in perceptual_hashes(media).collect()}
    ids = sorted(h)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((h[a] ^ h[b]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                expected[(a, b)] = d
    assert got == expected
    assert (1, 2) in got and got[(1, 2)] == 0
    assert all((4 not in pair) for pair in got), "different content paired"


def test_bucket_guard_drops_degenerate_buckets(spark):
    # 30 identical flat images: every band bucket has 30 members; with
    # max_bucket=10 the guard suppresses the degenerate bucket entirely
    rows = [(i, _ppm(8, 8, lambda p: 128)) for i in range(30)]
    media = spark.createDataFrame(rows, "doc_id long, media binary")
    out = phash_dup_pairs(media, max_hamming=0, max_bucket=10).collect()
    assert out == []
    full = phash_dup_pairs(media, max_hamming=0).collect()
    assert len(full) == 30 * 29 // 2
