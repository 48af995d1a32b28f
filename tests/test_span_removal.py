"""Exact duplicated-span removal (pipeline/text.py::
remove_duplicate_spans — Lee et al. 2022 ExactSubstr): planted
duplicate spans must be excised byte-exactly, unique text must survive
untouched, and the token accounting must conserve."""

from __future__ import annotations

from csv_query_engine_spark.pipeline.text import remove_duplicate_spans

# 8-token span planted in docs 1 and 2 (once each — cross-doc dup);
# doc 3 repeats its own 8-token span twice (within-doc dup); doc 4 is
# unique; doc 5 is shorter than n=8.
SPAN = "alpha bravo charlie delta echo foxtrot golf hotel"
DOCS = [
    (1, f"unique one text here {SPAN} trailing words apart"),
    (2, f"other prefix tokens {SPAN} and a different tail"),
    (3, f"{SPAN} middle filler {SPAN}"),
    (4, "entirely unique document with no duplicated span at all present"),
    (5, "short doc"),
]


def _run(spark, n=8):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r for r in remove_duplicate_spans(df, n=n).collect()}


def test_planted_spans_removed_byte_exact(spark):
    out = _run(spark)
    # Docs 1/2: exactly the 8 span tokens vanish; surrounding text is
    # byte-exact (normalized tokens rejoined with single spaces).
    assert out[1]["cleaned_text"] == "unique one text here trailing words apart"
    assert out[2]["cleaned_text"] == "other prefix tokens and a different tail"
    assert out[1]["n_removed_tokens"] == 8 and out[2]["n_removed_tokens"] == 8
    # Doc 3's span duplicates ITSELF (total-occurrence criterion):
    # both copies go, the filler stays.
    assert out[3]["cleaned_text"] == "middle filler"
    assert out[3]["n_removed_tokens"] == 16


def test_unique_and_short_docs_pass_through(spark):
    out = _run(spark)
    assert out[4]["cleaned_text"] == DOCS[3][1]
    assert out[4]["n_removed_tokens"] == 0
    assert out[5]["cleaned_text"] == "short doc"
    assert out[5]["n_removed_tokens"] == 0


def test_token_accounting_conserves(spark):
    out = _run(spark)
    for r in out.values():
        kept = len(r["cleaned_text"].split()) if r["cleaned_text"] else 0
        assert r["n_tokens"] == kept + r["n_removed_tokens"]


def test_fully_duplicated_doc_empties(spark):
    df = spark.createDataFrame(
        [(1, SPAN), (2, SPAN), (3, "some other words")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, n=8).collect()}
    assert out[1]["cleaned_text"] == "" and out[2]["cleaned_text"] == ""
    assert out[1]["n_removed_tokens"] == 8
    assert out[3]["cleaned_text"] == "some other words"


def test_overlapping_spans_merge_not_double_count(spark):
    """Two overlapping duplicated 4-grams cover a 5-token run; the
    covered-position DISTINCT must merge the overlap (5 removed, not 8)."""
    run = "one two three four five"
    df = spark.createDataFrame(
        [(1, f"head {run} tail"), (2, f"left {run} right")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, n=4).collect()}
    assert out[1]["cleaned_text"] == "head tail"
    assert out[1]["n_removed_tokens"] == 5


def test_plan_no_python_no_cartesian(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = remove_duplicate_spans(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan  # persisted base/gpos multi-consumer tables


def _py_remove(docs, n=4):
    """Pure-Python reference: same tokenize → n-gram occurrence count →
    covered-position union → reassembly semantics."""
    import re
    from collections import Counter

    toks = {
        i: re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip().split(" ")
        for i, t in docs
    }
    counts = Counter()
    for ts in toks.values():
        for s in range(max(len(ts) - n + 1, 0)):
            counts[tuple(ts[s : s + n])] += 1
    out = {}
    for i, ts in toks.items():
        covered = set()
        for s in range(max(len(ts) - n + 1, 0)):
            if counts[tuple(ts[s : s + n])] >= 2:
                covered.update(range(s, s + n))
        kept = [t for p, t in enumerate(ts) if p not in covered]
        out[i] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


def test_random_corpora_match_python_reference(spark):
    """Hypothesis-style randomized lock: many small corpora with forced
    overlap structure; Spark output must equal the reference exactly
    (token counts, removed counts, and the reassembled string)."""
    import random

    rng = random.Random(42)
    vocab = [f"t{k}" for k in range(12)]  # small vocab -> dense collisions
    for trial in range(8):
        docs = []
        for i in range(rng.randint(2, 7)):
            ln = rng.randint(0, 14)
            docs.append((i, " ".join(rng.choice(vocab) for _ in range(ln))))
        want = _py_remove(docs, n=4)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_removed_tokens"], r["cleaned_text"])
            for r in remove_duplicate_spans(df, n=4).collect()
        }
        assert got == want, f"trial {trial}: {docs}"
