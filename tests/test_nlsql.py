from __future__ import annotations

import datetime as dt

import pytest

from csv_query_engine_spark.nlsql import (
    UnsafeSQLError,
    generate_sql_rule_based,
    get_last_month_range,
    quote_identifier,
    strip_sql_fences,
    validate_sql,
)
from csv_query_engine_spark.profiler import ColumnInfo

COLS = [
    ColumnInfo("City", "string", "city"),
    ColumnInfo("Service", "string", "service"),
    ColumnInfo("incident_date", "date", "date"),
    ColumnInfo("severity", "numeric", "other"),
]

NOW = dt.date(2024, 2, 15)  # injectable clock -> last month = Jan 2024


def test_flagship_grammar():
    sql = generate_sql_rule_based(
        "Which services were affected in Mumbai last month?", COLS, now=NOW
    )
    assert sql == (
        "SELECT `Service`, COUNT(*) AS count FROM df"
        " WHERE `City` = 'Mumbai'"
        " AND `incident_date` >= '2024-01-01 00:00:00'"
        " AND `incident_date` <= '2024-01-31 23:59:59'"
        " GROUP BY `Service`"
    )


def test_select_star_default():
    assert generate_sql_rule_based("show everything", COLS) == "SELECT * FROM df"


def test_each_city_capitalized():
    for city in ["mumbai", "delhi", "bangalore", "chennai", "kolkata", "hyderabad", "pune", "ahmedabad"]:
        sql = generate_sql_rule_based(f"data for {city}", COLS)
        assert f"`City` = '{city.capitalize()}'" in sql


def test_which_requires_column_match():
    # 'which' word not matching a column -> no group by (reference
    # sql_generator.py:50-56 matches against column names only)
    sql = generate_sql_rule_based("which foobar is best", COLS)
    assert "GROUP BY" not in sql


def test_last_month_range_boundaries():
    assert get_last_month_range(dt.date(2024, 3, 31)) == ("2024-02-01 00:00:00", "2024-02-29 23:59:59")
    assert get_last_month_range(dt.date(2024, 1, 1)) == ("2023-12-01 00:00:00", "2023-12-31 23:59:59")


def test_quote_identifier():
    assert quote_identifier("Column Name With Spaces") == "`Column Name With Spaces`"
    assert quote_identifier("we`ird") == "`we``ird`"


def test_strip_fences():
    assert strip_sql_fences("```sql\nSELECT 1\n```") == "SELECT 1"
    assert strip_sql_fences("```\nSELECT 1\n```") == "SELECT 1"
    assert strip_sql_fences("SELECT 1") == "SELECT 1"


# ------------------------------------------------------------- validator


@pytest.mark.parametrize(
    "bad",
    [
        "DROP TABLE df",
        "INSERT INTO df VALUES (1)",
        "SELECT 1; SELECT 2",
        "CREATE TABLE x AS SELECT 1",
        "UPDATE df SET a = 1",
        "DELETE FROM df",
        "",
    ],
)
def test_validator_rejects(bad):
    with pytest.raises(UnsafeSQLError):
        validate_sql(bad)


def test_validator_fixes_created_at_false_positive():
    # Reference substring check rejects this legal query (SURVEY.md §2 A14).
    sql = "SELECT created_at, updated_by FROM df WHERE created_at > '2024-01-01'"
    assert validate_sql(sql) == sql


def test_validator_ignores_keywords_in_literals_and_comments():
    assert validate_sql("SELECT * FROM df WHERE note = 'please DROP me'")
    assert validate_sql("SELECT * FROM df -- DROP TABLE hint\n")
    assert validate_sql("SELECT `weird DELETE col` FROM df")


def test_validator_strips_trailing_semicolon():
    assert validate_sql("SELECT 1;") == "SELECT 1"


# --------------------------------------------------------------- dialect


def test_dialect_transpiles_reference_canonical_output():
    from csv_query_engine_spark.nlsql import duckdb_to_spark_sql

    # The exact shape the reference documents its LLM emitting
    # (reference models.py:31-36): DuckDB double-quoted identifiers.
    got = duckdb_to_spark_sql(
        'SELECT "Service", COUNT(*) as count FROM df WHERE "City" = \'Mumbai\' GROUP BY "Service"'
    )
    assert got == (
        "SELECT `Service`, COUNT(*) as count FROM df WHERE `City` = 'Mumbai' GROUP BY `Service`"
    )


def test_dialect_noop_on_spark_sql():
    from csv_query_engine_spark.nlsql import duckdb_to_spark_sql

    sql = "SELECT `Service`, COUNT(*) AS count FROM df WHERE note = 'a \"quoted\" word' -- \"c\"\n"
    assert duckdb_to_spark_sql(sql) == sql


def test_dialect_renames_list_functions_outside_literals():
    from csv_query_engine_spark.nlsql import duckdb_to_spark_sql

    got = duckdb_to_spark_sql(
        "SELECT LIST_CONTAINS(tags, 'x'), list_transform(v, y -> y + 1), "
        "mylist_contains(z), 'list_filter(a)' FROM df"
    )
    assert got == (
        "SELECT array_contains(tags, 'x'), transform(v, y -> y + 1), "
        "mylist_contains(z), 'list_filter(a)' FROM df"
    )


def test_dialect_identifier_escapes():
    from csv_query_engine_spark.nlsql import duckdb_to_spark_sql

    # "" -> literal " ; embedded backtick in the ident -> doubled
    assert duckdb_to_spark_sql('SELECT "we""ird" FROM df') == 'SELECT `we"ird` FROM df'
    assert duckdb_to_spark_sql('SELECT "a`b" FROM df') == "SELECT `a``b` FROM df"


def test_validator_plan_check(spark):
    with pytest.raises(UnsafeSQLError):
        validate_sql("EXPLAIN SELECT 1", spark=spark)
    with pytest.raises(UnsafeSQLError):
        validate_sql("SHOW TABLES", spark=spark)
    assert validate_sql("WITH t AS (SELECT 1 AS a) SELECT * FROM t", spark=spark)


def test_live_llm_contract():
    """Opt-in live round-trip for the network planner (reference A12):
    set SPARK_GRAFT_LLM_TEST=1 with OPENAI_API_KEY (and optionally
    OPENAI_MODEL) to pin the request/response contract against a real
    endpoint — prompt embeds the column triples and the last-month
    range, response comes back fence-stripped as one SELECT the
    validator accepts. Skips cleanly offline (no network in CI)."""
    import os

    import pytest as _pytest

    if os.environ.get("SPARK_GRAFT_LLM_TEST") != "1":
        _pytest.skip("live LLM contract test is opt-in (SPARK_GRAFT_LLM_TEST=1)")
    if not os.environ.get("OPENAI_API_KEY"):
        _pytest.skip("OPENAI_API_KEY not set")
    _pytest.importorskip("openai")

    from csv_query_engine_spark.nlsql.llm import OpenAIPlanner
    from csv_query_engine_spark.nlsql.validator import validate_sql

    columns = [
        {"name": "city", "type": "string", "semantic_type": "categorical"},
        {"name": "amount", "type": "double", "semantic_type": "numeric"},
        {"name": "created_at", "type": "date", "semantic_type": "datetime"},
    ]
    sql = OpenAIPlanner().generate("total amount by city", columns, table="df")
    assert sql.upper().lstrip().startswith("SELECT")
    assert "df" in sql
    validate_sql(sql)  # must be a clean single SELECT


# ------------------------------------------- extended schema-driven grammar

ORDERS_COLS = [
    {"name": "o_orderkey", "type": "bigint", "semantic_type": "id"},
    {"name": "o_custkey", "type": "bigint", "semantic_type": "id"},
    {"name": "o_orderstatus", "type": "string", "semantic_type": "category"},
    {"name": "o_totalprice", "type": "double", "semantic_type": "amount"},
    {"name": "o_orderdate", "type": "timestamp", "semantic_type": "date"},
    {"name": "o_orderpriority", "type": "string", "semantic_type": "category"},
]


def test_extended_agg_by_group():
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended

    sql = generate_sql_extended(
        "total o_totalprice by o_orderpriority", ORDERS_COLS, table="orders"
    )
    assert sql == (
        "SELECT `o_orderpriority`, SUM(`o_totalprice`) AS `sum_o_totalprice` "
        "FROM orders GROUP BY `o_orderpriority`"
    )


def test_extended_topn_count_with_filter():
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended

    sql = generate_sql_extended(
        "top 3 count of orders per o_orderstatus where o_orderpriority is 1-URGENT",
        ORDERS_COLS,
        table="orders",
    )
    assert sql == (
        "SELECT `o_orderstatus`, COUNT(*) AS `count` FROM orders "
        "WHERE `o_orderpriority` = '1-URGENT' "
        "GROUP BY `o_orderstatus` "
        "ORDER BY `count` DESC, `o_orderstatus` LIMIT 3"
    )


def test_extended_sql_executes_and_validates(spark):
    """Generated SQL must pass the validator and produce the same rows
    as the hand-written equivalent on the harness tables."""
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended
    from csv_query_engine_spark.nlsql.validator import validate_sql

    t = load_tables(spark, "/root/testdata/sf0.001", ("orders",))
    t["orders"].createOrReplaceTempView("orders")
    sql = generate_sql_extended(
        "average o_totalprice per o_orderstatus", ORDERS_COLS, table="orders"
    )
    validate_sql(sql, spark)
    got = {r[0]: r[1] for r in spark.sql(sql).collect()}
    want = {
        r[0]: r[1]
        for r in spark.sql(
            "SELECT o_orderstatus, AVG(o_totalprice) FROM orders GROUP BY o_orderstatus"
        ).collect()
    }
    assert got == want


def test_extended_plural_fold_and_unknown_words_ignored():
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended

    cols = [{"name": "priority", "type": "string", "semantic_type": "category"}]
    sql = generate_sql_extended("how many rows per priorities", cols, table="t")
    assert sql == "SELECT `priority`, COUNT(*) AS `count` FROM t GROUP BY `priority`"
    # nothing parseable -> SELECT *
    assert generate_sql_extended("tell me things", cols, table="t") == "SELECT * FROM t"


def test_planner_falls_back_to_extended_grammar(spark):
    """End-to-end through the engine facade: a question the reference
    grammar can't parse resolves via the extended grammar; reference-
    pattern questions keep their reference-exact SQL."""
    from csv_query_engine_spark.nlsql.llm import RuleBasedPlanner

    p = RuleBasedPlanner()
    ext = p.generate("total o_totalprice by o_orderpriority", ORDERS_COLS, table="orders")
    assert "SUM(`o_totalprice`)" in ext and "GROUP BY `o_orderpriority`" in ext
    # reference which-X path unchanged (base grammar wins)
    cols = [{"name": "Service", "type": "string", "semantic_type": "service"}]
    base = p.generate("which services failed", cols)
    assert base == "SELECT `Service`, COUNT(*) AS count FROM df GROUP BY `Service`"


def test_extended_distinct_count_per_group():
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended

    sql = generate_sql_extended(
        "how many distinct o_custkey per o_orderstatus", ORDERS_COLS, table="orders"
    )
    assert sql == (
        "SELECT `o_orderstatus`, COUNT(DISTINCT `o_custkey`) AS `distinct_o_custkey` "
        "FROM orders GROUP BY `o_orderstatus`"
    )


def test_extended_numeric_comparisons_and_date_bounds():
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended

    sql = generate_sql_extended(
        "count orders with o_totalprice over 1000 and o_custkey below 500 "
        "between 1995-01-01 and 1995-03-31",
        ORDERS_COLS,
        table="orders",
    )
    assert "`o_totalprice` > 1000" in sql
    assert "`o_custkey` < 500" in sql
    assert "`o_orderdate` >= '1995-01-01' AND `o_orderdate` <= '1995-03-31'" in sql
    assert sql.startswith("SELECT COUNT(*) AS `count` FROM orders WHERE ")

    since = generate_sql_extended(
        "total o_totalprice since 1996-06-01", ORDERS_COLS, table="orders"
    )
    assert "`o_orderdate` >= '1996-06-01'" in since


def test_extended_new_patterns_execute_and_validate(spark):
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended
    from csv_query_engine_spark.nlsql.validator import validate_sql
    from csv_query_engine_spark.profiler import profile

    o = load_tables(spark, "/root/testdata/sf0.001", ("orders",))["orders"]
    cols = profile(o)
    # median-ish threshold so the filter MUST drop rows — the round-8
    # "numeric"-type bug made the comparison silently vanish and a
    # below-the-data threshold (1000) masked it (vacuous test)
    sql = generate_sql_extended(
        "how many distinct o_custkey per o_orderstatus with o_totalprice over 150000",
        cols,
        table="orders",
    )
    assert "`o_totalprice` > 150000" in sql, sql
    validate_sql(sql, spark)
    got = {r["o_orderstatus"]: r["distinct_o_custkey"] for r in spark.sql(sql).collect()}
    from pyspark.sql import functions as F

    assert o.filter(F.col("o_totalprice") <= 150000).count() > 0, "threshold vacuous"
    expected = {
        r["o_orderstatus"]: r["n"]
        for r in o.filter(F.col("o_totalprice") > 150000)
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert got == expected


def test_extended_having_count_threshold():
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended

    sql = generate_sql_extended(
        "count of orders per o_orderstatus with more than 5", ORDERS_COLS, table="orders"
    )
    assert sql == (
        "SELECT `o_orderstatus`, COUNT(*) AS `count` FROM orders "
        "GROUP BY `o_orderstatus` HAVING COUNT(*) > 5"
    )
    sql = generate_sql_extended(
        "orders per o_orderstatus with at least 3", ORDERS_COLS, table="orders"
    )
    assert "HAVING COUNT(*) >= 3" in sql


def test_extended_sorted_by_is_ordering_not_grouping():
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended

    sql = generate_sql_extended(
        "orders sorted by o_totalprice descending", ORDERS_COLS, table="orders"
    )
    assert sql == "SELECT * FROM orders ORDER BY `o_totalprice` DESC"
    # grouped query ordering a NON-grouped column falls back to the
    # metric path (ordering a non-grouped column is invalid SQL)
    sql = generate_sql_extended(
        "top 2 count of orders per o_orderstatus sorted by o_totalprice",
        ORDERS_COLS,
        table="orders",
    )
    assert sql.endswith("GROUP BY `o_orderstatus` ORDER BY `count` DESC, `o_orderstatus` LIMIT 2")


def test_extended_having_and_order_execute(spark):
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended
    from csv_query_engine_spark.nlsql.validator import validate_sql

    t = load_tables(spark, "/root/testdata/sf0.001", ("orders",))
    t["orders"].createOrReplaceTempView("orders")
    sql = generate_sql_extended(
        "count of orders per o_orderstatus with at least 1", ORDERS_COLS, table="orders"
    )
    validate_sql(sql, spark)
    got = {r[0]: r[1] for r in spark.sql(sql).collect()}
    want = {
        r[0]: r[1]
        for r in spark.sql(
            "SELECT o_orderstatus, COUNT(*) FROM orders GROUP BY o_orderstatus HAVING COUNT(*) >= 1"
        ).collect()
    }
    assert got == want
    sql = generate_sql_extended(
        "top 3 orders sorted by o_totalprice descending", ORDERS_COLS, table="orders"
    )
    validate_sql(sql, spark)
    rows = spark.sql(sql).collect()
    assert len(rows) == 3
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_extended_substring_and_numeric_between(spark):
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended
    from csv_query_engine_spark.nlsql.validator import validate_sql
    from csv_query_engine_spark.profiler import profile
    from pyspark.sql import functions as F

    o = load_tables(spark, "/root/testdata/sf0.001", ("orders",))["orders"]
    cols = profile(o)
    sql = generate_sql_extended(
        "count orders with o_orderpriority containing URGENT "
        "and o_totalprice between 1000 and 50000",
        cols,
        table="orders",
    )
    assert "`o_orderpriority` LIKE '%URGENT%'" in sql
    assert "`o_totalprice` >= 1000 AND `o_totalprice` <= 50000" in sql
    validate_sql(sql, spark)
    got = spark.sql(sql).collect()[0]["count"]
    expected = o.filter(
        F.col("o_orderpriority").contains("URGENT")
        & (F.col("o_totalprice") >= 1000)
        & (F.col("o_totalprice") <= 50000)
    ).count()
    assert got == expected

    # numeric-between must NOT fire on ISO dates (year prefix guarded);
    # the date rule still owns that question shape
    dsql = generate_sql_extended(
        "count orders between 1995-01-01 and 1995-03-31", cols, table="orders"
    )
    assert "BETWEEN" not in dsql.upper().replace(" >= ", "")
    assert "`o_orderdate` >= '1995-01-01' AND `o_orderdate` <= '1995-03-31'" in dsql
    # substring rule ignores numeric columns
    nsql = generate_sql_extended(
        "count orders with o_totalprice containing 99", cols, table="orders"
    )
    assert "LIKE" not in nsql


def test_extended_like_escapes_underscore():
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended

    cols = [{"name": "event_type", "type": "string", "semantic_type": "category"}]
    sql = generate_sql_extended(
        "count events with event_type containing page_view", cols, table="events"
    )
    # '_' is a LIKE single-char wildcard: must be escaped or 'pagesview'
    # would also match
    assert "LIKE '%page\\_view%'" in sql


def _profiled_tables(spark, names):
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.profiler import profile

    loaded = load_tables(spark, "/root/testdata/sf0.001", tuple(names))
    out = {}
    for n, df in loaded.items():
        df.createOrReplaceTempView(n)
        out[n] = profile(df)
    return out


def test_multi_table_direct_join_executes_equal(spark):
    """'how many customers per n_name' spans customer (table mention)
    and nation (column) — the inferred nationkey join must execute and
    equal the hand-written query; validator still AST-gates it."""
    from csv_query_engine_spark.nlsql.extended import generate_sql_multi_table
    from csv_query_engine_spark.nlsql.validator import validate_sql

    tabs = _profiled_tables(spark, ("customer", "nation"))
    sql = generate_sql_multi_table("how many customers per n_name", tabs)
    validate_sql(sql, spark)
    assert "JOIN" in sql and "c_nationkey" in sql and "n_nationkey" in sql
    got = {r[0]: r[1] for r in spark.sql(sql).collect()}
    want = {
        r[0]: r[1]
        for r in spark.sql(
            "SELECT n_name, COUNT(*) FROM customer JOIN nation"
            " ON c_nationkey = n_nationkey GROUP BY n_name"
        ).collect()
    }
    assert got == want


def test_multi_table_fact_dim_aggregate_executes_equal(spark):
    """'average o_totalprice by c_mktsegment' joins orders to customer
    on the custkey suffix; suffix folds also bind bare column words
    ('average totalprice by mktsegment')."""
    from csv_query_engine_spark.nlsql.extended import generate_sql_multi_table
    from csv_query_engine_spark.nlsql.validator import validate_sql

    tabs = _profiled_tables(spark, ("customer", "orders"))
    want = {
        r[0]: r[1]
        for r in spark.sql(
            "SELECT c_mktsegment, AVG(o_totalprice) FROM customer JOIN orders"
            " ON c_custkey = o_custkey GROUP BY c_mktsegment"
        ).collect()
    }
    for question in (
        "average o_totalprice by c_mktsegment",
        "average totalprice by mktsegment",
    ):
        sql = generate_sql_multi_table(question, tabs)
        validate_sql(sql, spark)
        got = {r[0]: r[1] for r in spark.sql(sql).collect()}
        assert got == want, question


def test_multi_table_bridge_join_executes_equal(spark):
    """'total l_extendedprice by c_mktsegment': lineitem and customer
    share no key suffix — the orders bridge (custkey + orderkey) is
    inferred and the 3-table join executes equal."""
    from csv_query_engine_spark.nlsql.extended import generate_sql_multi_table
    from csv_query_engine_spark.nlsql.validator import validate_sql

    tabs = _profiled_tables(spark, ("customer", "lineitem", "orders"))
    sql = generate_sql_multi_table("total l_extendedprice by c_mktsegment", tabs)
    validate_sql(sql, spark)
    assert sql.count("JOIN") == 2, sql
    got = {r[0]: round(r[1], 6) for r in spark.sql(sql).collect()}
    want = {
        r[0]: round(r[1], 6)
        for r in spark.sql(
            "SELECT c_mktsegment, SUM(l_extendedprice) FROM customer"
            " JOIN orders ON c_custkey = o_custkey"
            " JOIN lineitem ON o_orderkey = l_orderkey GROUP BY c_mktsegment"
        ).collect()
    }
    assert got == want


def test_multi_table_single_table_questions_stay_single(spark):
    """Questions fully covered by one table never grow a join, and a
    multi-table question with filters keeps the WHERE text."""
    from csv_query_engine_spark.nlsql.extended import generate_sql_multi_table
    from csv_query_engine_spark.nlsql.validator import validate_sql

    tabs = _profiled_tables(spark, ("customer", "orders", "nation"))
    sql = generate_sql_multi_table("count of orders per o_orderstatus", tabs)
    assert "JOIN" not in sql
    sql = generate_sql_multi_table(
        "average o_totalprice by n_name for o_totalprice over 1000", tabs
    )
    validate_sql(sql, spark)
    assert "JOIN" in sql and "`o_totalprice` > 1000" in sql
    rows = spark.sql(sql).collect()
    assert rows and all(r[1] > 1000 for r in rows)


def test_multi_table_flagship_topn_revenue_executes_equal(spark):
    """Round 10: 'top 5 nations by revenue' composes the reference's
    flagship NL shape from one sentence — the derived revenue metric
    (extendedprice·(1−discount)), the lineitem→orders→customer→nation
    TWO-bridge path (BFS over key suffixes), grouping by the mentioned
    table's name column, and ORDER BY metric DESC LIMIT N — and
    executes equal to the hand-written q5-shaped SQL."""
    from csv_query_engine_spark.nlsql.extended import generate_sql_multi_table
    from csv_query_engine_spark.nlsql.validator import validate_sql

    tabs = _profiled_tables(spark, ("lineitem", "orders", "customer", "nation"))
    metrics = {
        "revenue": ("l_extendedprice * (1 - l_discount)", ["l_extendedprice", "l_discount"])
    }
    sql = generate_sql_multi_table("top 5 nations by revenue", tabs, metrics=metrics)
    validate_sql(sql, spark)
    assert "LIMIT 5" in sql and "GROUP BY `n_name`" in sql
    for frag in ("l_orderkey", "o_custkey", "c_nationkey", "n_nationkey"):
        assert frag in sql, sql
    got = [(r[0], round(r[1], 6)) for r in spark.sql(sql).collect()]
    want = [
        (r[0], round(r[1], 6))
        for r in spark.sql(
            "SELECT n_name, SUM(l_extendedprice * (1 - l_discount)) AS revenue"
            " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
            " JOIN customer ON o_custkey = c_custkey"
            " JOIN nation ON c_nationkey = n_nationkey"
            " GROUP BY n_name ORDER BY revenue DESC, n_name LIMIT 5"
        ).collect()
    ]
    assert got == want

    # the "per <table>" phrasing takes the same path without top-N
    sql2 = generate_sql_multi_table("total revenue per nation", tabs, metrics=metrics)
    validate_sql(sql2, spark)
    assert "GROUP BY `n_name`" in sql2 and "LIMIT" not in sql2
    got2 = {r[0]: round(r[1], 6) for r in spark.sql(sql2).collect()}
    want2 = {
        r[0]: round(r[1], 6)
        for r in spark.sql(
            "SELECT n_name, SUM(l_extendedprice * (1 - l_discount))"
            " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
            " JOIN customer ON o_custkey = c_custkey"
            " JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ).collect()
    }
    assert got2 == want2


def test_multi_table_engine_registers_revenue_metric(spark):
    """engine.ask_tables auto-registers the flagship revenue metric
    from the profiled extendedprice+discount pair — the HTTP
    multi_table route answers the golden-example question end-to-end."""
    from csv_query_engine_spark.engine import QueryEngine
    from csv_query_engine_spark.io.readers import load_tables

    eng = QueryEngine(spark)
    loaded = load_tables(
        spark, "/root/testdata/sf0.001", ("lineitem", "orders", "customer", "nation")
    )
    for n, df in loaded.items():
        eng.register(df, n)
    res = eng.ask_tables("top 5 nations by revenue")
    assert "revenue" in res.sql and "LIMIT 5" in res.sql
    assert len(res.rows) == 5


def test_multi_table_unjoinable_is_rejected(spark):
    """Columns spanning tables with no key-suffix path raise — never a
    silently wrong cross join."""
    import pytest

    from csv_query_engine_spark.nlsql.extended import generate_sql_multi_table

    tabs = {
        "a": [{"name": "a_val", "type": "bigint", "semantic_type": "other"}],
        "b": [{"name": "b_score", "type": "double", "semantic_type": "other"}],
    }
    with pytest.raises(ValueError):
        generate_sql_multi_table("average b_score by a_val", tabs)


def test_extended_for_each_and_year_filter(spark):
    """Round 9: 'for each X' groups like by/per, and 'in YYYY' binds a
    calendar-year range on the date column (executes-equal), yielding
    to explicit date bounds."""
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended
    from csv_query_engine_spark.nlsql.validator import validate_sql
    from csv_query_engine_spark.profiler import profile

    t = load_tables(spark, "/root/testdata/sf0.001", ("orders",))
    t["orders"].createOrReplaceTempView("orders")
    cols = profile(t["orders"])
    sql = generate_sql_extended(
        "count of orders for each o_orderpriority in 1996", cols, table="orders"
    )
    validate_sql(sql, spark)
    assert "GROUP BY `o_orderpriority`" in sql and "1996-01-01" in sql and "1997-01-01" in sql
    got = {r[0]: r[1] for r in spark.sql(sql).collect()}
    want = {
        r[0]: r[1]
        for r in spark.sql(
            "SELECT o_orderpriority, COUNT(*) FROM orders"
            " WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'"
            " GROUP BY o_orderpriority"
        ).collect()
    }
    assert got == want and got
    # an explicit bound wins over the year rule
    sql2 = generate_sql_extended(
        "count of orders in 1996 since 1996-06-01", cols, table="orders"
    )
    assert "1996-06-01" in sql2 and "1997-01-01" not in sql2
    # 'in 1995' inside an ISO date must not fire the year rule
    sql3 = generate_sql_extended(
        "count of orders since 1995-03-01", cols, table="orders"
    )
    assert sql3.count("1995") == 1


def test_multi_table_topn_revenue_with_date_ranges_executes_equal(spark):
    """Round 11 (round-10 verdict #8): the reference's flagship NL shape
    fully generalized — 'top 5 nations by revenue last month' composes
    the round-10 top-N-by-derived-metric multi-hop inference with the
    A9 last-month range (injectable clock), and 'in YYYY' composes the
    round-9 calendar filter on the same inferred join. The range binds
    the combined profile's first date column (l_shipdate — bridge-table
    columns are not referenceable by design); executes equal to the
    hand-written SQL and still passes the AST validator."""
    import datetime as dt

    from csv_query_engine_spark.nlsql.extended import generate_sql_multi_table
    from csv_query_engine_spark.nlsql.validator import validate_sql

    tabs = _profiled_tables(spark, ("lineitem", "orders", "customer", "nation"))
    metrics = {
        "revenue": ("l_extendedprice * (1 - l_discount)", ["l_extendedprice", "l_discount"])
    }
    now = dt.date(1996, 4, 15)
    sql = generate_sql_multi_table(
        "top 5 nations by revenue last month", tabs, now=now, metrics=metrics
    )
    validate_sql(sql, spark)
    assert "LIMIT 5" in sql and "GROUP BY `n_name`" in sql
    assert "1996-03-01" in sql and "1996-03-31" in sql  # injectable clock
    got = [(r[0], round(r[1], 6)) for r in spark.sql(sql).collect()]
    want = [
        (r[0], round(r[1], 6))
        for r in spark.sql(
            "SELECT n_name, SUM(l_extendedprice * (1 - l_discount)) AS revenue"
            " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
            " JOIN customer ON o_custkey = c_custkey"
            " JOIN nation ON c_nationkey = n_nationkey"
            " WHERE l_shipdate >= '1996-03-01 00:00:00'"
            " AND l_shipdate <= '1996-03-31 23:59:59'"
            " GROUP BY n_name ORDER BY revenue DESC, n_name LIMIT 5"
        ).collect()
    ]
    assert got and got == want

    sql2 = generate_sql_multi_table(
        "top 3 nations by revenue in 1995", tabs, now=now, metrics=metrics
    )
    validate_sql(sql2, spark)
    assert "'1995-01-01'" in sql2 and "'1996-01-01'" in sql2 and "LIMIT 3" in sql2
    got2 = [(r[0], round(r[1], 6)) for r in spark.sql(sql2).collect()]
    want2 = [
        (r[0], round(r[1], 6))
        for r in spark.sql(
            "SELECT n_name, SUM(l_extendedprice * (1 - l_discount)) AS revenue"
            " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
            " JOIN customer ON o_custkey = c_custkey"
            " JOIN nation ON c_nationkey = n_nationkey"
            " WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'"
            " GROUP BY n_name ORDER BY revenue DESC, n_name LIMIT 3"
        ).collect()
    ]
    assert got2 and got2 == want2


def test_low_cardinality_values_profile(spark):
    """profiler.low_cardinality_values returns complete sorted value
    sets for low-cardinality string columns only — high-cardinality
    strings are dropped entirely, never truncated."""
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.profiler import low_cardinality_values

    cust = load_tables(spark, "/root/testdata/sf0.001", ("customer",), register=False)[
        "customer"
    ]
    vals = low_cardinality_values(cust)
    assert sorted(vals["c_mktsegment"]) == vals["c_mktsegment"]
    assert set(vals["c_mktsegment"]) == {
        r["c_mktsegment"] for r in cust.select("c_mktsegment").distinct().collect()
    }
    assert "c_name" not in vals  # high-cardinality: dropped, not truncated


def test_multi_table_value_equality_on_bridge_executes_equal(spark):
    """Round 12 (round-11 verdict #8): the A8 equality generalized to
    profiled value sets composes with the multi-hop join and the A9
    date range — 'revenue per nation for segment BUILDING last month'
    filters the customer BRIDGE table's c_mktsegment while grouping by
    the nation end table.  The WHERE text must be present (a threshold
    below the data range can't catch a vanished filter) and the result
    executes equal to hand-written SQL; ambiguous and off-plan value
    tokens raise."""
    import datetime as dt

    import pytest

    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.nlsql.extended import generate_sql_multi_table
    from csv_query_engine_spark.nlsql.validator import validate_sql
    from csv_query_engine_spark.profiler import low_cardinality_values

    tabs = _profiled_tables(spark, ("lineitem", "orders", "customer", "nation"))
    loaded = load_tables(
        spark, "/root/testdata/sf0.001", ("customer", "orders"), register=False
    )
    cvals = {
        "customer": low_cardinality_values(loaded["customer"]),
        "orders": low_cardinality_values(loaded["orders"]),
    }
    metrics = {
        "revenue": ("l_extendedprice * (1 - l_discount)", ["l_extendedprice", "l_discount"])
    }
    now = dt.date(1996, 4, 15)
    sql = generate_sql_multi_table(
        "revenue per nation for segment BUILDING last month",
        tabs,
        now=now,
        metrics=metrics,
        column_values=cvals,
    )
    validate_sql(sql, spark)
    assert "`c_mktsegment` = 'BUILDING'" in sql  # the filter is PRESENT
    assert "GROUP BY `n_name`" in sql and "1996-03-01" in sql
    got = {(r[0], round(r[1], 6)) for r in spark.sql(sql).collect()}
    want = {
        (r[0], round(r[1], 6))
        for r in spark.sql(
            "SELECT n_name, SUM(l_extendedprice * (1 - l_discount)) AS revenue"
            " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
            " JOIN customer ON o_custkey = c_custkey"
            " JOIN nation ON c_nationkey = n_nationkey"
            " WHERE c_mktsegment = 'BUILDING'"
            " AND l_shipdate >= '1996-03-01 00:00:00'"
            " AND l_shipdate <= '1996-03-31 23:59:59'"
            " GROUP BY n_name"
        ).collect()
    }
    assert got and got == want

    # single-table plan: the value binds directly
    sql1 = generate_sql_multi_table(
        "how many customers per mktsegment", tabs, column_values=cvals
    )
    assert "JOIN" not in sql1  # single-table plan, no filter token present

    # ambiguous value: the same token planted in TWO columns raises
    amb = {
        "customer": {"c_mktsegment": ["BUILDING"], "c_other": ["BUILDING"]},
    }
    with pytest.raises(ValueError, match="more than one column"):
        generate_sql_multi_table(
            "count of customers for segment BUILDING",
            {"customer": tabs["customer"]},
            column_values=amb,
        )

    # off-plan value: a token owned by a table the plan never reaches
    with pytest.raises(ValueError, match="does not reach"):
        generate_sql_multi_table(
            "how many suppliers for segment BUILDING",
            {**tabs, "supplier": _profiled_tables(spark, ("supplier",))["supplier"]},
            column_values=cvals,
        )


def test_value_equality_multiple_values_one_column_is_in_list(spark):
    """Two value tokens of the SAME column ('BUILDING or MACHINERY')
    must bind ONE membership filter, never an always-empty AND of
    equalities."""
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.nlsql.extended import generate_sql_multi_table
    from csv_query_engine_spark.nlsql.validator import validate_sql
    from csv_query_engine_spark.profiler import low_cardinality_values

    tabs = _profiled_tables(spark, ("customer",))
    cust = load_tables(spark, "/root/testdata/sf0.001", ("customer",), register=False)[
        "customer"
    ]
    cvals = {"customer": low_cardinality_values(cust)}
    sql = generate_sql_multi_table(
        "how many customers for segment BUILDING or MACHINERY",
        tabs,
        column_values=cvals,
    )
    validate_sql(sql, spark)
    assert "`c_mktsegment` IN ('BUILDING', 'MACHINERY')" in sql
    got = spark.sql(sql).collect()[0][0]
    want = cust.filter(cust["c_mktsegment"].isin("BUILDING", "MACHINERY")).count()
    assert got == want and got > 0


def test_value_equality_binds_when_explicit_rule_missed(spark):
    """Round-13 ADVICE fix: 'X is VALUE' where X resolves to NO column
    must leave VALUE eligible for value-equality binding (the explicit
    rule consumed nothing, so excluding the token made the filter
    silently vanish — violating bind-or-fail)."""
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.nlsql.extended import generate_sql_multi_table
    from csv_query_engine_spark.nlsql.validator import validate_sql
    from csv_query_engine_spark.profiler import low_cardinality_values

    tabs = _profiled_tables(spark, ("customer",))
    cust = load_tables(spark, "/root/testdata/sf0.001", ("customer",), register=False)[
        "customer"
    ]
    cvals = {"customer": low_cardinality_values(cust)}
    # "category" resolves to no customer column; BUILDING must still bind
    sql = generate_sql_multi_table(
        "how many customers where category is BUILDING",
        tabs,
        column_values=cvals,
    )
    validate_sql(sql, spark)
    assert "`c_mktsegment` = 'BUILDING'" in sql
    got = spark.sql(sql).collect()[0][0]
    want = cust.filter(cust["c_mktsegment"] == "BUILDING").count()
    assert got == want and got > 0

    # control: when X DOES resolve, the explicit rule owns the token and
    # the value rule must not double-bind (exactly one equality emitted)
    sql2 = generate_sql_multi_table(
        "how many customers where mktsegment is BUILDING",
        tabs,
        column_values=cvals,
    )
    validate_sql(sql2, spark)
    assert sql2.count("BUILDING") == 1


def test_value_equality_grammar_stopwords_never_bind(spark):
    """Round-13 ADVICE fix: a low-cardinality value spelled like a
    grammar word ('top', 'or', 'count') must never value-bind — the
    grammar-disjointness invariant extended to the stop-word set."""
    from csv_query_engine_spark.nlsql.extended import generate_sql_multi_table
    from csv_query_engine_spark.nlsql.validator import validate_sql

    tabs = _profiled_tables(spark, ("customer",))
    # plant lowercase grammar words as legitimate-looking values
    cvals = {"customer": {"c_mktsegment": ["top", "or", "count", "BUILDING"]}}
    sql = generate_sql_multi_table(
        "top 3 customers by acctbal",
        tabs,
        column_values=cvals,
    )
    validate_sql(sql, spark)
    assert "c_mktsegment" not in sql  # no spurious filter from 'top'/'by'


def test_per_group_topn_single_table_executes_equal(spark):
    """Round-13 (round-12 verdict #6): 'top N <entity> per <group>'
    ranks entities INSIDE each group via a PARTITIONED window with the
    entity as tiebreaker — executes equal to hand-written SQL, and the
    plan passes the cartesian/unpartitioned-window lint."""
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended
    from csv_query_engine_spark.nlsql.validator import validate_sql
    from csv_query_engine_spark.operators.lint import lint_plan
    from csv_query_engine_spark.profiler import profile

    cust = load_tables(spark, "/root/testdata/sf0.001", ("customer",))["customer"]
    cust.createOrReplaceTempView("customer")
    cols = profile(cust)
    sql = generate_sql_extended(
        "top 2 nationkey per mktsegment by total acctbal", cols, table="customer"
    )
    validate_sql(sql, spark)
    assert "PARTITION BY `c_mktsegment`" in sql and "ROW_NUMBER()" in sql
    df = spark.sql(sql)
    findings = [f for f in lint_plan(df) if f["severity"] == "error"]
    assert not findings, findings
    got = [tuple(r) for r in df.collect()]
    want = [
        tuple(r)
        for r in spark.sql(
            "SELECT c_mktsegment, c_nationkey, sum_acctbal FROM ("
            " SELECT c_mktsegment, c_nationkey, SUM(c_acctbal) AS sum_acctbal,"
            "  ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY SUM(c_acctbal) DESC, c_nationkey) AS rnk"
            " FROM customer GROUP BY c_mktsegment, c_nationkey"
            ") WHERE rnk <= 2 ORDER BY c_mktsegment, rnk"
        ).collect()
    ]
    assert got and got == want


def test_per_group_topn_multi_table_table_words(spark):
    """Table-word entity and group ('top 2 suppliers per nation by
    revenue') resolve to name columns through the join plan and
    execute equal to hand-written SQL."""
    from csv_query_engine_spark.nlsql.extended import generate_sql_multi_table
    from csv_query_engine_spark.nlsql.validator import validate_sql

    tabs = _profiled_tables(spark, ("lineitem", "supplier", "nation"))
    metrics = {
        "revenue": ("l_extendedprice * (1 - l_discount)", ["l_extendedprice", "l_discount"])
    }
    sql = generate_sql_multi_table(
        "top 2 suppliers per nation by revenue", tabs, metrics=metrics
    )
    validate_sql(sql, spark)
    assert "PARTITION BY `n_name`" in sql
    got = [tuple(r) for r in spark.sql(sql).collect()]
    want = [
        tuple(r)
        for r in spark.sql(
            "SELECT n_name, s_name, revenue FROM ("
            " SELECT n_name, s_name, SUM(l_extendedprice * (1 - l_discount)) AS revenue,"
            "  ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, s_name) AS rnk"
            " FROM lineitem JOIN supplier ON l_suppkey = s_suppkey"
            " JOIN nation ON s_nationkey = n_nationkey"
            " GROUP BY n_name, s_name"
            ") WHERE rnk <= 2 ORDER BY n_name, rnk"
        ).collect()
    ]
    assert got and got == want
    # round-trip values: every group has at most 2 rows
    from collections import Counter

    per_group = Counter(r[0] for r in got)
    assert max(per_group.values()) <= 2


def test_per_group_topn_falls_back_when_entity_unbound(spark):
    """Disjointness: when the entity word binds to nothing, the phrase
    falls back to the existing whole-group top-N semantics (ORDER BY
    metric DESC LIMIT N), never a half-bound window."""
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended
    from csv_query_engine_spark.profiler import profile

    cust = load_tables(spark, "/root/testdata/sf0.001", ("customer",))["customer"]
    cols = profile(cust)
    sql = generate_sql_extended(
        "top 3 widgets per mktsegment", cols, table="customer"
    )
    assert "ROW_NUMBER" not in sql
    assert "GROUP BY `c_mktsegment`" in sql and "LIMIT 3" in sql


def test_extended_recency_compiles_with_tiebreak():
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended

    sql = generate_sql_extended("10 most recent orders", ORDERS_COLS, table="orders")
    assert sql == (
        "SELECT * FROM orders ORDER BY `o_orderdate` DESC, `o_orderkey` DESC LIMIT 10"
    )
    sql = generate_sql_extended("5 earliest orders", ORDERS_COLS, table="orders")
    assert sql == (
        "SELECT * FROM orders ORDER BY `o_orderdate` ASC, `o_orderkey` ASC LIMIT 5"
    )
    # an explicit "sorted by" wins over the recency phrasing
    sql = generate_sql_extended(
        "10 most recent orders sorted by o_totalprice descending",
        ORDERS_COLS,
        table="orders",
    )
    assert "ORDER BY `o_totalprice` DESC" in sql and "o_orderdate" not in sql
    # a grouped recency question compiles to the PARTITIONED row_number
    # form (round-13 late), never an unpartitioned window or an invalid
    # date ORDER BY under GROUP BY
    sql = generate_sql_extended(
        "3 most recent orders per o_orderstatus", ORDERS_COLS, table="orders"
    )
    assert "PARTITION BY `o_orderstatus` ORDER BY `o_orderdate` DESC, `o_orderkey` DESC" in sql
    assert "`_rnk` <= 3" in sql and "GROUP BY" not in sql


def test_extended_recency_executes(spark):
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended
    from csv_query_engine_spark.nlsql.validator import validate_sql

    t = load_tables(spark, "/root/testdata/sf0.001", ("orders",))
    t["orders"].createOrReplaceTempView("orders")
    sql = generate_sql_extended("10 most recent orders", ORDERS_COLS, table="orders")
    validate_sql(sql, spark)
    rows = spark.sql(sql).collect()
    assert len(rows) == 10
    dates = [r["o_orderdate"] for r in rows]
    assert dates == sorted(dates, reverse=True)
    want = spark.sql(
        "SELECT * FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 10"
    ).collect()
    assert rows == want


def test_extended_per_group_recency_executes(spark):
    from csv_query_engine_spark.io.readers import load_tables
    from csv_query_engine_spark.nlsql.extended import generate_sql_extended
    from csv_query_engine_spark.nlsql.validator import validate_sql

    t = load_tables(spark, "/root/testdata/sf0.001", ("orders",))
    t["orders"].createOrReplaceTempView("orders")
    sql = generate_sql_extended(
        "3 most recent orders per o_orderstatus", ORDERS_COLS, table="orders"
    )
    validate_sql(sql, spark)
    got = [tuple(r) for r in spark.sql(sql).collect()]
    want = [
        tuple(r)
        for r in spark.sql(
            """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                      o_orderdate, o_orderpriority
               FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                         ORDER BY o_orderdate DESC, o_orderkey DESC) AS rnk
                     FROM orders)
               WHERE rnk <= 3 ORDER BY o_orderstatus, rnk"""
        ).collect()
    ]
    assert got == want
    statuses = {r[2] for r in got}
    assert len(statuses) > 1 and all(
        sum(1 for r in got if r[2] == s) <= 3 for s in statuses
    )
