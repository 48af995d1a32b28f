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
    if oracle is None:
        # Rows-only check for non-SQL-expressible ops.
        assert df.count() >= 0
        return
    assert_results_match(df, duck.sql(oracle), name)
