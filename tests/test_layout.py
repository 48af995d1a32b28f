"""Unit tests for operators/layout.py: Morton interleave correctness
and the multi-dimensional file-skipping win over a single-column sort."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from csv_query_engine_spark.operators.layout import (
    layout_stats,
    morton_code,
    prunable_files,
    sql_morton,
    zorder_file_assignment,
)


def test_morton_interleave_known_values(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5), (4095, 4095)], "a long, b long")
    got = [r["z"] for r in df.select(morton_code(F.col("a"), F.col("b")).alias("z")).collect()]

    def ref(a, b):
        z = 0
        for i in range(12):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == [ref(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (3, 5), (4095, 4095)]]


def test_sql_morton_matches_column_form(spark):
    import duckdb

    pairs = [(a * 97 % 4096, a * 31 % 4096) for a in range(500)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = [
        r["z"]
        for r in df.select(morton_code(F.col("a"), F.col("b")).alias("z"))
        .orderBy("a", "b")
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    want = [r[0] for r in con.execute(
        f"SELECT {sql_morton('a', 'b', 12)} FROM t ORDER BY a, b"
    ).fetchall()]
    assert got == want


def test_zorder_prunes_both_dims_linear_prunes_one(spark):
    """The point of the curve: a 64-file Z-order layout lets range
    predicates on EITHER dimension skip >=50% of files; the same data
    sorted by dimension A alone prunes nothing for a B-range query."""
    n = 64 * 64
    rows = [((i * 2654435761) % 4096, (i * 40503) % 4096) for i in range(n)]
    df = spark.createDataFrame(rows, "a long, b long")

    z = layout_stats(
        zorder_file_assignment(df, F.col("a"), F.col("b"), bits=12, n_files=64),
        ["a", "b"],
    )
    lo, hi = 1000, 1255  # a 1/16-wide range in either dim
    total = z.count()
    za = z.filter(prunable_files(z, "a", lo, hi)).count()
    zb = z.filter(prunable_files(z, "b", lo, hi)).count()
    assert za / total >= 0.5, f"z-order pruned only {za}/{total} files on dim a"
    assert zb / total >= 0.5, f"z-order pruned only {zb}/{total} files on dim b"

    # linear layout: sort by a, 64 equal files
    lin = (
        df.withColumn(
            "file_id", F.floor(F.col("a") * 64 / 4096).cast("long")
        )
        .groupBy("file_id")
        .agg(F.min("b").alias("min_b"), F.max("b").alias("max_b"))
    )
    lb = lin.filter((F.col("max_b") < lo) | (F.col("min_b") > hi)).count()
    assert lb == 0, "a-sorted layout should not prune b-range queries on uniform data"


def test_assignment_is_map_only_no_udf(spark, tmp_path):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    p = str(tmp_path / "t.parquet")
    df.write.mode("overwrite").parquet(p)
    out = zorder_file_assignment(
        spark.read.parquet(p), F.col("a"), F.col("b"), bits=12, n_files=64
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_compact_small_files_merges_and_conserves(spark, tmp_path):
    from csv_query_engine_spark.operators.layout import compact_small_files

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    df = spark.range(0, 10000).selectExpr("id", "id % 7 AS k")
    df.repartition(64).write.parquet(src)  # the small-file problem
    audit = compact_small_files(spark, src, dst, target_file_mb=128)
    assert audit["files_before"] == 64
    assert audit["files_after"] == 1  # 10k rows ≪ 128 MB -> one file
    assert audit["rows"] == 10000
    got = spark.read.parquet(dst)
    assert got.count() == 10000 and set(got.columns) == {"id", "k"}


def test_compact_with_sort_keeps_footer_stats_tight(spark, tmp_path):
    from csv_query_engine_spark.operators.layout import compact_small_files

    src, dst = str(tmp_path / "s2"), str(tmp_path / "c2")
    spark.range(0, 5000).selectExpr("id", "CAST(id % 100 AS LONG) AS k").repartition(
        16
    ).write.parquet(src)
    audit = compact_small_files(spark, src, dst, target_file_mb=1, sort_within_by=["id"])
    assert audit["rows"] == 5000 and audit["files_after"] <= audit["files_before"]
    # within-file sort -> a selective id filter prunes via footer stats;
    # functional check: the data round-trips and stays complete
    assert spark.read.parquet(dst).filter("id < 100").count() == 100


def test_global_row_numbers_dense_and_ordered(spark):
    from pyspark.sql import functions as F

    from csv_query_engine_spark.operators.layout import global_row_numbers

    df = spark.range(10_000).select(
        (F.col("id") * 37 % 1000).alias("k"), F.col("id").alias("uid")
    )
    out = global_row_numbers(df, ["k", "uid"], n_partitions=8).collect()
    assert len(out) == 10_000
    rns = sorted(r["global_rn"] for r in out)
    assert rns == list(range(1, 10_001))  # dense, 1-based, no gaps/dups
    by_rn = sorted(out, key=lambda r: r["global_rn"])
    keys = [(r["k"], r["uid"]) for r in by_rn]
    assert keys == sorted(keys)  # numbering follows the total order


def test_global_row_numbers_descending_and_no_hard_lint(spark):
    from pyspark.sql import functions as F

    from csv_query_engine_spark.operators.lint import lint_plan
    from csv_query_engine_spark.operators.layout import global_row_numbers

    df = spark.range(500).select(F.col("id").alias("v"))
    out = global_row_numbers(df, ["v"], ascending=False)
    assert [f for f in lint_plan(out) if f["severity"] == "error"] == []
    rows = sorted((r["global_rn"], r["v"]) for r in out.collect())
    assert rows[0] == (1, 499) and rows[-1] == (500, 0)
