from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Test-session wall-time: the suite runs thousands of tiny shuffles
# (streaming micro-batches especially, where stateful operators use the
# raw shuffle-partition count with no AQE coalescing), and each extra
# task is pure scheduling overhead at test data sizes. 8 partitions
# measured ~25% faster on the heaviest streaming/property tests with
# identical results (every pinned invariant is partition-count
# independent; the partitioning-invariance tests repartition
# explicitly). setdefault honors an explicit override.
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

from csv_query_engine_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="csv_query_engine_spark_tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the harness tables registered as views,
    mirroring the driver's oracle setup."""
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_ORACLE, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()
