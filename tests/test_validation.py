"""Unit tests for pipeline/validation.py: one-pass compilation, null
semantics, and the approx (HLL++) scale path."""

from __future__ import annotations

import contextlib
import io
import re

from csv_query_engine_spark.pipeline.validation import Check, check_constraints


def _checks():
    return [
        Check("completeness", "a", 1.0),
        Check("uniqueness", "a", 1.0),
        Check("range", "b", 0.5, lo=0.0, hi=10.0),
        Check("accepted", "c", 0.9, values=("x", "y")),
        Check("pattern", "c", 0.9, regex="^[xy]$"),
    ]


def test_all_constraints_one_scan(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 5.0, "x"), (2, 50.0, "y"), (None, 5.0, "z")], "a int, b double, c string"
    )
    p = str(tmp_path / "t.parquet")
    df.write.mode("overwrite").parquet(p)
    out = check_constraints(spark.read.parquet(p), _checks())
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert "Join" not in plan and "BatchEvalPython" not in plan, plan


def test_metrics_and_null_semantics(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "x"), (2, 50.0, "y"), (None, None, "z"), (2, 5.0, None)],
        "a int, b double, c string",
    )
    rows = {r["constraint"]: r for r in check_constraints(df, _checks()).collect()}
    assert rows["completeness(a)"]["metric"] == 0.75
    # uniqueness: 2 distinct non-null of 4 rows
    assert rows["uniqueness(a)"]["metric"] == 0.5
    # range: nulls FAIL the predicate (2 of 4 in range)
    assert rows["range(b)[0.0,10.0]"]["metric"] == 0.5
    assert rows["accepted(c){x,y}"]["metric"] == 0.5
    assert rows["pattern(c)^[xy]$"]["metric"] == 0.5
    assert rows["completeness(a)"]["passed"] is False
    assert rows["range(b)[0.0,10.0]"]["passed"] is True


def test_approx_uses_hll_no_expand(spark):
    df = spark.createDataFrame([(i % 7, float(i)) for i in range(100)], "a int, b double")
    checks = [Check("uniqueness", "a", 0.01), Check("uniqueness", "b", 0.01)]
    exact = check_constraints(df, checks)
    approx = check_constraints(df, checks, approx=True)

    def plan_of(d):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            d.explain("formatted")
        return buf.getvalue()

    # two exact distincts need the Expand pass; HLL++ sketches don't
    assert "Expand" in plan_of(exact)
    assert "Expand" not in plan_of(approx)
    got = {r["constraint"]: r["metric"] for r in approx.collect()}
    assert abs(got["uniqueness(a)"] - 0.07) < 0.01


def test_row_level_split_routes_and_explains(spark):
    from csv_query_engine_spark.pipeline.validation import Check, split_by_rules

    df = spark.createDataFrame(
        [
            (1, "view", 10.0),
            (2, None, 5.0),          # completeness(event_type) fails
            (3, "click", -1.0),      # range(value) fails
            (4, "bogus", 2000.0),    # accepted + range fail
        ],
        "event_id long, event_type string, value double",
    )
    checks = [
        Check("completeness", "event_type", 1.0),
        Check("range", "value", 1.0, lo=0.0, hi=1000.0),
        Check("accepted", "event_type", 1.0, values=("view", "click", "purchase")),
    ]
    good, bad = split_by_rules(df, checks)
    assert [r["event_id"] for r in good.collect()] == [1]
    reasons = {r["event_id"]: r["failed_rules"] for r in bad.collect()}
    assert "completeness(event_type)" in reasons[2]
    assert "range(value)[0.0,1000.0]" in reasons[3]
    assert "accepted(event_type)" in reasons[4] and "range(value)" in reasons[4]
    # conservation: every input row lands in exactly one side
    assert good.count() + bad.count() == df.count()
    # no row-level form for uniqueness
    import pytest as _pytest

    from csv_query_engine_spark.pipeline.validation import row_predicate

    with _pytest.raises(ValueError):
        row_predicate(Check("uniqueness", "event_id", 1.0))


def test_split_conserves_null_rows_under_accepted_only_rules(spark):
    """Round-7 verdict bug #1: NULL.isin(...) is SQL NULL, so without the
    isNotNull guard a NULL row under an accepted-ONLY rule set vanished
    from BOTH outputs (filter(NULL) and filter(~NULL) each drop it).
    The exact repro shape: 3 rows in, one NULL — conservation must hold
    and the NULL row must quarantine with the accepted rule named."""
    from csv_query_engine_spark.pipeline.validation import Check, split_by_rules

    df = spark.createDataFrame(
        [(1, "view"), (2, None), (3, "bogus")], "event_id long, event_type string"
    )
    checks = [Check("accepted", "event_type", 1.0, values=("view", "click"))]
    good, bad = split_by_rules(df, checks)
    assert [r["event_id"] for r in good.collect()] == [1]
    reasons = {r["event_id"]: r["failed_rules"] for r in bad.collect()}
    assert sorted(reasons) == [2, 3], "NULL row must land in quarantine, not vanish"
    assert "accepted(event_type)" in reasons[2]
    assert good.count() + bad.count() == df.count()


def test_split_plan_is_shuffle_free(spark):
    from csv_query_engine_spark.pipeline.validation import Check, split_by_rules

    df = spark.createDataFrame([(1, "a", 1.0)], "event_id long, event_type string, value double")
    good, bad = split_by_rules(df, [Check("completeness", "event_type", 1.0)])
    for side in (good, bad):
        plan = side._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "EvalPython" not in plan


def test_fk_audit_nulls_orphans_fanout(spark):
    from csv_query_engine_spark.pipeline.validation import fk_audit

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (None,), (None,)], "fk int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    r = fk_audit(child, parent, "fk", "pk").collect()[0]
    assert r["n_child_rows"] == 6
    assert r["n_child_keys"] == 3          # 1, 2, 9 (NULL excluded)
    assert r["n_null_fk_rows"] == 2        # missing links, not orphans
    assert r["n_orphan_keys"] == 1 and r["n_orphan_rows"] == 1  # fk=9
    assert r["n_parent_keys"] == 3
    assert r["n_childless_parents"] == 1   # pk=3
    assert r["max_fanout"] == 2            # fk=1
    assert r["orphan_rows_ppm"] == 166666  # floor(1e6/6)


def test_fk_audit_empty_child(spark):
    from csv_query_engine_spark.pipeline.validation import fk_audit

    child = spark.createDataFrame([], "fk int")
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    r = fk_audit(child, parent, "fk", "pk").collect()[0]
    assert r["n_child_rows"] == 0 and r["n_orphan_rows"] == 0
    assert r["n_childless_parents"] == 2
    assert r["orphan_rows_ppm"] == 0  # GREATEST(,1) guards the division
