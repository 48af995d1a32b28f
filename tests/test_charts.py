"""Chart-layer operators (reference A22-A25, index.html:277-430)."""

from __future__ import annotations

from csv_query_engine_spark import charts


def test_bar_aggregate_sums_per_category(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "cat string, v double"
    )
    out = {r["cat"]: r["value"] for r in charts.bar_aggregate(df, "cat", "v").collect()}
    assert out == {"a": 3.0, "b": 5.0}


def test_bar_aggregate_counts_without_value(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "cat string")
    out = {r["cat"]: r["value"] for r in charts.bar_aggregate(df, "cat").collect()}
    assert out == {"a": 2, "b": 1}


def test_pie_aggregate_counts(spark):
    df = spark.createDataFrame([("x",), ("x",), ("y",)], "cat string")
    out = {r["cat"]: r["value"] for r in charts.pie_aggregate(df, "cat").collect()}
    assert out == {"x": 2, "y": 1}


def test_chart_type_line_for_two_numeric():
    rows = [{"a": "1", "b": 2.5, "c": "x"}, {"a": "3", "b": 4.0, "c": "y"}]
    got = charts.infer_chart_type(rows, ["a", "b", "c"])
    assert got["type"] == "line" and got["y"] == ["a", "b"]


def test_chart_type_bar_for_mixed_two_cols():
    rows = [{"cat": "a", "n": "x1"}, {"cat": "b", "n": "x2"}]
    got = charts.infer_chart_type(rows, ["cat", "n"])
    assert got == {"type": "bar", "x": "cat", "y": ["n"]}


def test_chart_type_pie_for_single_col():
    got = charts.infer_chart_type([{"only": "v"}], ["only"])
    assert got["type"] == "pie"


def test_rows_to_csv_escapes_quotes_and_commas():
    rows = [{"a": 'he said "hi"', "b": "x,y"}, {"a": None, "b": 3}]
    text = charts.rows_to_csv(rows, ["a", "b"])
    lines = text.strip().split("\n")
    assert lines[0] == "a,b"
    assert lines[1] == '"he said ""hi""","x,y"'
    assert lines[2] == ",3"
