"""pipeline/features.py::linear_quality_scores: the learned-gate scorer
must replay exactly against a pure-Python reference (same hashing, same
left-associated weighted sum, same quantization), honor custom weights/
threshold, and keep the no-extra-shuffle plan. Cross-engine exactness
is covered by test_queries_oracle.py (docs_quality_classifier_scores)."""

from __future__ import annotations

import hashlib
import math

import pytest

from csv_query_engine_spark.pipeline.features import (
    default_quality_weights,
    linear_quality_scores,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "spark catalyst optimizer pushes filters into the parquet scan"),
    (3, "aaa aaa aaa aaa aaa"),
    (4, "one"),
]


def _py_reference(text: str, weights: list[float], bias: float):
    """Mirror of the operator: normalize is lower + collapse whitespace
    (pipeline/text.py::normalize_text); one md5 per token, low bit sign,
    high bits index; x_k = f_k/n; logit/score FLOOR-quantized at 1e6."""
    toks = [t for t in " ".join(text.lower().split()).split(" ") if t]
    d = len(weights)
    f = [0] * d
    for t in toks:
        h = int(hashlib.md5(("fh-" + t).encode()).hexdigest()[:8], 16)
        f[(h >> 1) % d] += 1 if h % 2 == 0 else -1
    n = len(toks)
    z = bias
    for k, wk in enumerate(weights):
        z = z + wk * (f[k] / n)
    zq = math.floor(z * 1e6 + 0.5) / 1e6
    s = 1.0 / (1.0 + math.exp(-zq))
    return zq, math.floor(s * 1e6 + 0.5) / 1e6


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_python_reference(docs):
    w = default_quality_weights()
    out = {r["doc_id"]: r for r in linear_quality_scores(docs).collect()}
    assert set(out) == {1, 2, 3, 4}
    for doc_id, text in DOCS:
        zq, score = _py_reference(text, w, 0.0)
        assert out[doc_id]["logit"] == zq, (doc_id, out[doc_id]["logit"], zq)
        assert out[doc_id]["quality_score"] == score
        assert out[doc_id]["pass_gate"] == (1 if score >= 0.5 else 0)


def test_custom_weights_and_threshold(docs):
    # all-positive weights + high bias force everything through; an
    # impossible threshold blocks everything
    w = [0.5] * 8
    hi = linear_quality_scores(docs, weights=w, bias=10.0).collect()
    assert all(r["pass_gate"] == 1 for r in hi)
    lo = linear_quality_scores(docs, weights=w, bias=-10.0, threshold=0.99).collect()
    assert all(r["pass_gate"] == 0 for r in lo)
    with pytest.raises(ValueError):
        linear_quality_scores(docs, weights=[0.1, 0.2])


def test_plan_adds_no_work_beyond_feature_agg(docs):
    """The classifier is pure projection over the feature vectors: same
    number of exchanges as the featurizer itself, no Python eval."""
    from csv_query_engine_spark.pipeline.features import feature_hash_vectors

    base = feature_hash_vectors(docs)._jdf.queryExecution().executedPlan().toString()
    plan = linear_quality_scores(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == base.count("Exchange")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
