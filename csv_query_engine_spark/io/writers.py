"""Sinks.

The reference's only sinks are JSON rows to the HTTP client
(query.py:63) and a client-side CSV export with quote-escaping
(index.html:400-430, A25). Server-side we provide the real distributed
writers; ``rows_json`` mirrors the ``List[Dict]`` envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    # Spark's CSV writer quote-escapes embedded commas/quotes natively —
    # the distributed equivalent of the reference's manual JS escaping
    # (index.html:411-417).
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def rows_json(df: DataFrame, limit: int | None = 200) -> list[dict]:
    """Bounded row materialization (reference A20: ``to_dict('records')``,
    query.py:56-63). Always bounded — an unbounded collect is a driver
    OOM at scale, so ``limit=None`` must be requested explicitly."""
    if limit is not None:
        df = df.limit(limit)
    return [row.asDict(recursive=True) for row in df.collect()]


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    **options: str,
) -> None:
    """JDBC sink (pairs with readers.read_jdbc). Parallelism contract:
    each PARTITION opens one connection and writes ``batchsize``-row
    batches, so the write concurrency IS the partition count — cap it
    with ``num_partitions`` (coalesce) so a wide DataFrame doesn't open
    hundreds of connections against the database; raise ``batchsize``
    for round-trip-dominated links. The Derby round-trip test
    (tests/test_engine.py) exercises this path."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    opts = {"batchsize": str(batchsize), **options}
    df.write.mode(mode).jdbc(url, table, properties=opts)
