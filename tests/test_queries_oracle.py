"""Every registered query with an oracle is executed on the test SF and
compared exactly against DuckDB — the local equivalent of the driver's
CORRECTNESS gate (row-count + schema + order-insensitive value hash)."""

from __future__ import annotations

import pytest

from csv_query_engine_spark.queries import REGISTRY, _load
from tests.compare import assert_results_match
from tests.conftest import SF_ORACLE

_load()
CASES = sorted(REGISTRY.keys())


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, duck, name):
    fn, oracle = REGISTRY[name]
    df = fn(spark, SF_ORACLE)
    # Repo-wide plan lint (round 10): no registered query may plan a
    # CartesianProduct or an unpartitioned Window — the two hard scale
    # errors (operators/lint.py); generalizes test_plans' per-query
    # pins to every registry entry on every run.
    from csv_query_engine_spark.operators.lint import lint_plan

    hard = [f for f in lint_plan(df) if f["severity"] == "error"]
    assert not hard, f"{name}: plan lint errors {hard}"
    if oracle is None:
        # Rows-only check for non-SQL-expressible ops.
        assert df.count() >= 0
        return
    assert_results_match(df, duck.sql(oracle), name)


def test_sketch_aggregates_close_to_exact(spark):
    """Sketches have no cross-engine oracle; bound their error vs the
    exact answers instead."""
    from pyspark.sql import functions as F

    from csv_query_engine_spark.io.readers import load_tables

    got = {
        r["event_type"]: r
        for r in REGISTRY["sketch_approx_aggregates"][0](spark, SF_ORACLE).collect()
    }
    e = load_tables(spark, SF_ORACLE, ("events",))["events"]
    exact = {
        r["event_type"]: r
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("users")).collect()
    }
    assert set(got) == set(exact)
    for k, r in got.items():
        assert abs(r["approx_users"] - exact[k]["users"]) <= max(2, 0.05 * exact[k]["users"])
        # the sketch guarantees RANK error, not value error (it returns a
        # real element, no interpolation): check the returned value's
        # actual rank is within eps of the requested quantile
        n = e.filter(F.col("event_type") == k).count()
        for target_q, approx_q in zip((0.5, 0.99), (r["p50"], r["p99"])):
            rank = (
                e.filter((F.col("event_type") == k) & (F.col("value") <= approx_q)).count() / n
            )
            assert abs(rank - target_q) <= 0.02, (k, target_q, approx_q, rank)
