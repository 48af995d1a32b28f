from csv_query_engine_spark.nlsql.dialect import duckdb_to_spark_sql
from csv_query_engine_spark.nlsql.generator import (
    generate_sql_rule_based,
    get_last_month_range,
    quote_identifier,
)
from csv_query_engine_spark.nlsql.llm import LLMPlanner, RuleBasedPlanner, strip_sql_fences
from csv_query_engine_spark.nlsql.validator import UnsafeSQLError, validate_sql

__all__ = [
    "LLMPlanner",
    "RuleBasedPlanner",
    "UnsafeSQLError",
    "duckdb_to_spark_sql",
    "generate_sql_rule_based",
    "get_last_month_range",
    "quote_identifier",
    "strip_sql_fences",
    "validate_sql",
]
