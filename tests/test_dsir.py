"""pipeline/features.py::dsir_importance_weights: planted-vocabulary
sanity (a pool doc written in the target's vocabulary must outscore a
pool doc with disjoint vocabulary), conservation (every non-empty pool
doc gets exactly one weight row; target docs get none), and a pure-
Python replay of the full hashed-bucket log-ratio arithmetic.
Cross-engine exactness is covered by test_queries_oracle.py
(docs_dsir_selection, sf0.001/0.01/0.1)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from csv_query_engine_spark.pipeline.features import dsir_importance_weights

# target docs share a vocabulary; pool doc 10 borrows it, pool doc 11
# is disjoint, pool doc 12 is empty after normalization
ROWS = [
    (1, "tgt", "apple banana cherry apple banana"),
    (2, "tgt", "banana cherry apple cherry"),
    (3, "tgt", "cherry apple banana banana apple"),
    (10, "pool", "apple banana cherry banana"),
    (11, "pool", "zebra quark lattice phonon"),
    (12, "pool", "   "),
]

B = 1024


def _grams(text: str) -> list[str]:
    toks = [t for t in " ".join(text.lower().split()).split(" ") if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(g: str) -> int:
    return int(hashlib.md5(("dsir-" + g).encode()).hexdigest()[:8], 16) % B


def _py_reference(rows):
    """Mirror of the operator: bucket counts with add-1 smoothing, ONE
    ln of the integer ratio per bucket FLOOR-quantized at 1e6, exact
    integer dot product per pool doc."""
    tb: dict[int, int] = {}
    pb: dict[int, int] = {}
    docs: dict[int, dict[int, int]] = {}
    for did, grp, text in rows:
        for g in _grams(text):
            b = _bucket(g)
            if grp == "tgt":
                tb[b] = tb.get(b, 0) + 1
            else:
                pb[b] = pb.get(b, 0) + 1
                dd = docs.setdefault(did, {})
                dd[b] = dd.get(b, 0) + 1
    tt, pt = sum(tb.values()), sum(pb.values())
    out = {}
    for did, counts in docs.items():
        units = 0
        for b, n in counts.items():
            num = (tb.get(b, 0) + 1) * (pt + B)
            den = (pb.get(b, 0) + 1) * (tt + B)
            units += n * math.floor(math.log(num / den) * 1e6 + 0.5)
        out[did] = (sum(counts.values()), units / 1e6)
    return out


def test_dsir_planted_vocabulary_and_replay(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, grp string, text string")
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_logweight"])
        for r in dsir_importance_weights(df, F.col("grp") == "tgt").collect()
    }
    # conservation: exactly the two non-empty pool docs are weighted
    assert set(got) == {10, 11}
    # planted signal: target-vocabulary pool doc outscores the disjoint one
    assert got[10][1] > got[11][1]
    # exact replay of the quantized arithmetic
    assert got == _py_reference(ROWS)


def test_dsir_null_predicate_rows_are_pool(spark):
    rows = [(1, "tgt", "alpha beta"), (2, None, "alpha beta"), (3, "pool", "gamma")]
    df = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    got = {r["doc_id"] for r in dsir_importance_weights(df, F.col("grp") == "tgt").collect()}
    # NULL predicate coalesces to pool membership — the row is weighted,
    # not silently dropped (the split_by_rules NULL lesson)
    assert got == {2, 3}
