"""pipeline/fuzzy.py: SymSpell deletion-neighborhood join must be
EXACT — identical pair set to the brute-force quadratic join for any
dictionary, including the short-string edge cases (len <= d) where
naive q-gram blocking breaks."""

from __future__ import annotations

import itertools

from csv_query_engine_spark.pipeline.fuzzy import deletion_neighborhood, fuzzy_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


WORDS = [
    "spark", "spork", "spart", "park", "part", "cart", "carts", "car",
    "a", "at", "ate", "hash", "dash", "cash", "cache", "batch", "match",
    "x", "xy", "merge", "marge", "large", "",
]


def _brute(words, d):
    return sorted(
        (a, b)
        for a, b in itertools.combinations(sorted(set(words) - {""}), 2)
        if _lev(a, b) <= d
    )


def test_fuzzy_pairs_exact_vs_brute_force(spark):
    df = spark.createDataFrame([(w,) for w in WORDS if w], "token string")
    for d in (1, 2):
        got = sorted(
            (r["tok_a"], r["tok_b"]) for r in fuzzy_pairs(df, max_dist=d).collect()
        )
        assert got == _brute(WORDS, d), f"d={d}"


def test_fuzzy_pairs_reports_true_distance(spark):
    df = spark.createDataFrame([(w,) for w in WORDS if w], "token string")
    for r in fuzzy_pairs(df, max_dist=2).collect():
        assert r["dist"] == _lev(r["tok_a"], r["tok_b"])


def test_deletion_neighborhood_counts(spark):
    df = spark.createDataFrame([("abc",)], "token string")
    v1 = {r["variant"] for r in deletion_neighborhood(df, max_dist=1).collect()}
    assert v1 == {"abc", "bc", "ac", "ab"}
    v2 = {r["variant"] for r in deletion_neighborhood(df, max_dist=2).collect()}
    assert v2 == {"abc", "bc", "ac", "ab", "a", "b", "c"}
