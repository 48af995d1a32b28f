"""pipeline/privacy.py (pseudonymization contracts: determinism,
referential integrity, null preservation, no-shuffle plan) and
pipeline/text.py::ngram_novelty (first-seer semantics on a constructed
corpus). Cross-engine exactness of both registered queries is covered
by test_queries_oracle.py at sf0.001/0.01/0.1."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from csv_query_engine_spark.pipeline.privacy import pseudonym, pseudonymize_columns
from csv_query_engine_spark.pipeline.text import ngram_novelty


def test_pseudonym_deterministic_and_null_preserving(spark):
    df = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, None), (4, "alice")],
        "id long, name string",
    )
    out = {r["id"]: r["name"] for r in pseudonymize_columns(df, ["name"], "s-").collect()}
    # referential integrity: equal values -> equal tokens
    assert out[1] == out[4]
    assert out[1] != out[2]
    assert out[3] is None
    # the token is exactly the salted sha256 prefix
    assert out[1] == hashlib.sha256(b"s-alice").hexdigest()[:16]
    # a different salt rotates every token
    out2 = {r["id"]: r["name"] for r in pseudonymize_columns(df, ["name"], "t-").collect()}
    assert out2[1] != out[1]


def test_pseudonym_plan_is_pure_projection(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    plan = (
        df.select(pseudonym(F.col("name"), "s-").alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ngram_novelty_first_seer_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # grams: abc, bcd — all first
            (2, "a b c d"),          # exact dup -> both seen before
            (3, "a b c x"),          # abc seen, bcx fresh
            (4, "zz"),               # sub-n doc: vacuously novel
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert out[1]["n_grams"] == 2 and out[1]["n_seen_before"] == 0
    assert out[1]["novelty"] == 1.0
    assert out[2]["n_grams"] == 2 and out[2]["n_seen_before"] == 2
    assert out[2]["novelty"] == 0.0
    assert out[3]["n_grams"] == 2 and out[3]["n_seen_before"] == 1
    assert out[3]["novelty"] == 0.5
    assert out[4]["n_grams"] == 0 and out[4]["novelty"] == 1.0


def test_group_holdout_keeps_duplicates_together(spark):
    from csv_query_engine_spark.pipeline.sampling import group_holdout_split

    # 60 distinct texts, each duplicated 3x under different doc_ids: a
    # row-hash split would scatter some groups; the group split cannot
    rows = []
    for g in range(60):
        for k in range(3):
            rows.append((g * 10 + k, f"unique document text number {g} with content"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["split"]: r for r in group_holdout_split(docs).collect()}
    assert sum(r["n_docs"] for r in out.values()) == 180
    assert sum(r["n_groups"] for r in out.values()) == 60
    for r in out.values():
        assert r["n_spanning_groups"] == 0
        assert r["n_docs"] == 3 * r["n_groups"]  # whole groups move together


def test_erase_keys_partitions_each_table(spark):
    """Erasure propagation: cleaned + removed partition each table
    exactly (conservation), every reference to an erased key is gone
    from EVERY table, and non-referenced rows survive untouched."""
    from csv_query_engine_spark.pipeline.privacy import erase_keys

    users = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "uid long, name string")
    acts = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3), (14, 3)], "aid long, uid long"
    )
    keys = spark.createDataFrame([(1,), (3,)], "key long")
    cleaned, audit = erase_keys(
        {"users": users, "acts": acts}, {"users": "uid", "acts": "uid"}, keys
    )
    assert {r["uid"] for r in cleaned["users"].collect()} == {2}
    assert {r["aid"] for r in cleaned["acts"].collect()} == {12}
    a = {r["table_name"]: r for r in audit.collect()}
    assert (a["users"]["n_before"], a["users"]["n_removed"], a["users"]["n_after"]) == (3, 2, 1)
    assert (a["acts"]["n_before"], a["acts"]["n_removed"], a["acts"]["n_after"]) == (5, 4, 1)


def test_k_anonymity_audit_contract(spark):
    """k-anonymity audit: classes below k flagged, NULL quasi values
    form their own (linkable) class, dataset risk numbers are exact
    integer-derived ppm repeated on every row (round 9)."""
    from csv_query_engine_spark.pipeline.privacy import k_anonymity_audit

    rows = (
        [("DE", "A")] * 6        # safe class
        + [("DE", "B")] * 2      # at risk
        + [("FR", "A")] * 1      # at risk
        + [(None, "A")] * 3      # NULL class, at risk (< 5)
    )
    df = spark.createDataFrame(rows, "country string, seg string")
    out = k_anonymity_audit(df, ["country", "seg"], k=5).collect()
    by_class = {(r["country"], r["seg"]): r for r in out}
    assert len(by_class) == 4
    assert not by_class[("DE", "A")]["at_risk"]
    assert by_class[("DE", "B")]["at_risk"] and by_class[("FR", "A")]["at_risk"]
    assert by_class[(None, "A")]["at_risk"] and by_class[(None, "A")]["n_rows"] == 3
    # risk rows = 2 + 1 + 3 = 6 of 12 -> exactly 500000 ppm, on every row
    assert all(r["n_risk_rows"] == 6 and r["risk_ppm"] == 500000 for r in out)
