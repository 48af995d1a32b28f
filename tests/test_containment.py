"""Exact containment join (pipeline/dedup.py::containment_pairs): the
asymmetric similarity member — quote/extract detection with zero false
negatives (prefix filter exactness vs brute force) that symmetric
Jaccard provably misses."""

from __future__ import annotations

import pytest

from csv_query_engine_spark.pipeline.dedup import (
    allpairs_jaccard_pairs,
    containment_pairs,
)

LONG = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu one two three four five six"
)
QUOTE = "kilo lima mike november oscar papa quebec romeo"  # inside LONG
DOCS = [
    (1, LONG),
    (2, QUOTE),
    (3, "completely different content about seven eight nine ten eleven twelve"),
    (4, LONG),  # exact dup of 1
]


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quote_detected_containment_not_jaccard(spark):
    """Doc 2 is a verbatim span of doc 1: containment(2→1) = 1.0, but
    Jaccard(1,2) ≈ |A|/|B| is far below any dedup threshold — the case
    this operator exists for."""
    pairs = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(_df(spark), threshold=0.8).collect()
    }
    assert pairs[(2, 1)] == 1.0 and pairs[(2, 4)] == 1.0
    assert (1, 2) not in pairs  # the long doc is NOT contained in the quote
    assert pairs[(1, 4)] == 1.0 and pairs[(4, 1)] == 1.0  # exact dups, both ways
    jac = {
        (r["id_a"], r["id_b"])
        for r in allpairs_jaccard_pairs(_df(spark), threshold=0.5).collect()
    }
    assert (2, 1) not in jac and (1, 2) not in jac


def test_exactness_vs_bruteforce(spark):
    """Prefix filtering must lose nothing: compare against the direct
    quadratic containment on a corpus of overlapping token windows."""
    base = "w%d"
    words = [base % i for i in range(40)]
    rows = [
        (i, " ".join(words[s : s + ln]))
        for i, (s, ln) in enumerate(
            [(0, 30), (5, 12), (0, 40), (20, 15), (8, 8), (25, 10), (33, 7)]
        )
    ]
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(_df(spark, rows), threshold=0.6).collect()
    }

    def grams(text):
        t = text.split()
        return {" ".join(t[i : i + 3]) for i in range(max(len(t) - 2, 1))}

    want = {}
    gs = {i: grams(t) for i, t in rows}
    for a, ga in gs.items():
        for b, gb in gs.items():
            if a == b or not ga:
                continue
            c = len(ga & gb) / len(ga)
            if c >= 0.6:
                want[(a, b)] = pytest.approx(c)
    assert got == want


def test_plan_persists_grams_no_cartesian(spark):
    plan = (
        containment_pairs(_df(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
