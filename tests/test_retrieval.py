"""pipeline/retrieval.py::bm25_topk: lock the scoring to a pure-Python
BM25 reference on a tiny corpus (same derived query terms, same
quantization), and pin the plan's scale properties. Cross-engine
exactness is covered by test_queries_oracle.py (docs_bm25_top_docs,
verified at sf0.001/0.01/0.1)."""

from __future__ import annotations

import math

import pytest

from csv_query_engine_spark.pipeline.retrieval import B, K1, bm25_topk

DOCS = [
    (1, "spark shuffles data across the cluster"),
    (2, "spark spark spark everywhere in the plan"),
    (3, "the optimizer prunes columns and pushes filters"),
    (4, "a tiny doc"),
    (5, "data data data and more data in the lake"),
]


def _py_bm25(docs, n_terms=3, k1=K1, b=B):
    toks = {i: " ".join(t.lower().split()).split(" ") for i, t in docs}
    tf = {i: {} for i, _ in docs}
    for i, ts in toks.items():
        for t in ts:
            tf[i][t] = tf[i].get(t, 0) + 1
    df = {}
    for i in tf:
        for t in tf[i]:
            df[t] = df.get(t, 0) + 1
    qterms = sorted(df, key=lambda t: (-df[t], t))[:n_terms]
    n = len(docs)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    out = {}
    for i in tf:
        su, matched = 0, 0
        for t in qterms:
            if t not in tf[i]:
                continue
            matched += 1
            idf = math.floor(
                math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)) * 1e9 + 0.5
            ) / 1e9
            s = (
                idf
                * (tf[i][t] * (k1 + 1.0))
                / (tf[i][t] + k1 * ((1.0 - b) + b * (len(toks[i]) / avgdl)))
            )
            su += math.floor(s * 1e6 + 0.5)
        if matched:
            out[i] = (matched, su / 1e6)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_python_reference(docs):
    expected = _py_bm25(DOCS, n_terms=3)
    got = {
        r["doc_id"]: (r["n_matched_terms"], r["bm25_score"])
        for r in bm25_topk(docs, n_terms=3, top_n=10).collect()
    }
    assert got == expected


def test_topk_is_bounded_and_ordered(docs):
    rows = bm25_topk(docs, n_terms=3, top_n=2).collect()
    assert len(rows) == 2
    assert rows[0]["bm25_score"] >= rows[1]["bm25_score"]


def test_plan_broadcasts_query_terms_no_python(docs):
    plan = bm25_topk(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "InMemoryTableScan" in plan  # persisted token/tf tables
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_hybrid_rrf_fuses_both_rankings(spark, docs):
    """RRF semantics on a crafted corpus: a doc present in BOTH bounded
    lists scores 1/(k+r_lex) + 1/(k+r_vec); a doc in only one list gets
    the single term and a 0 sentinel for the absent rank; the output is
    conserved (no row outside the union of the two lists)."""
    from csv_query_engine_spark.pipeline.retrieval import (
        RRF_K,
        hybrid_rrf_topk,
    )

    # embeddings: doc 1 is nearly parallel to the query (vec_id 0),
    # doc 2 orthogonal, doc 3 anti-parallel; docs beyond 3 absent from
    # the embedding table entirely (lexical-only candidates).
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.99, 0.1]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.05]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["doc_id"]: r
        for r in hybrid_rrf_topk(
            docs, emb, query_vec_id=0, list_n=3, top_n=10, n_terms=3
        ).collect()
    }
    lex_ranks = {d: r["lex_rank"] for d, r in out.items() if r["lex_rank"] > 0}
    vec_ranks = {d: r["vec_rank"] for d, r in out.items() if r["vec_rank"] > 0}
    assert len(lex_ranks) == 3 and len(vec_ranks) == 3
    # cosine order against vec 0: doc1 (~1.0) > doc2 (0.0) > doc3 (<0)
    assert vec_ranks[1] == 1 and vec_ranks[2] == 2 and vec_ranks[3] == 3
    for d, r in out.items():
        expect = 0.0
        if r["lex_rank"] > 0:
            expect += 1.0 / (RRF_K + r["lex_rank"])
        if r["vec_rank"] > 0:
            expect += 1.0 / (RRF_K + r["vec_rank"])
        assert r["lex_rank"] > 0 or r["vec_rank"] > 0  # conservation
        assert abs(r["rrf_score"] - expect) < 2e-9


def test_hybrid_rrf_plan_has_no_cartesian_no_python(spark, docs):
    from csv_query_engine_spark.pipeline.retrieval import hybrid_rrf_topk

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)], "vec_id long, embedding array<float>"
    )
    plan = hybrid_rrf_topk(docs, emb, list_n=3, n_terms=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_retrieval_metrics_contract(spark):
    """retrieval_metrics: recall@k / first-relevant-rank / MRR addend
    per query, with 0 sentinels for no-relevant-retrieved and
    no-relevant-set queries (round 9)."""
    from csv_query_engine_spark.pipeline.retrieval import retrieval_metrics

    run = spark.createDataFrame(
        # q1: relevant at ranks 2 and 5; q2: none relevant; q3: rank 1
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4), (1, 14, 5),
         (2, 20, 1), (2, 21, 2),
         (3, 30, 1)],
        "query_id long, cand_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 11), (1, 14), (1, 99), (3, 30), (4, 40)],
        "query_id long, cand_id long",
    )
    out = {r["query_id"]: r for r in retrieval_metrics(run, qrels, k=5).collect()}
    assert out[1]["n_rel"] == 3 and out[1]["hits_at_k"] == 2
    assert abs(out[1]["recall_at_k"] - 2 / 3) < 1e-15
    assert out[1]["first_rel_rank"] == 2 and out[1]["rr"] == 0.5
    # q2 has a relevant SET? no qrels -> n_rel 0, all-zero metrics
    assert out[2]["n_rel"] == 0 and out[2]["recall_at_k"] == 0.0
    assert out[2]["first_rel_rank"] == 0 and out[2]["rr"] == 0.0
    assert out[3]["rr"] == 1.0 and out[3]["recall_at_k"] == 1.0
    # qrels-only query 4 (never retrieved) still gets an all-zero row —
    # excluding it would overstate any MRR/recall average over the
    # output (round-9 ADVICE fix)
    assert out[4]["n_rel"] == 1 and out[4]["hits_at_k"] == 0
    assert out[4]["recall_at_k"] == 0.0
    assert out[4]["first_rel_rank"] == 0 and out[4]["rr"] == 0.0
    # hits beyond k are excluded from recall but still set first_rel_rank
    out2 = {r["query_id"]: r for r in retrieval_metrics(run, qrels, k=1).collect()}
    assert out2[1]["hits_at_k"] == 0 and out2[1]["first_rel_rank"] == 2
