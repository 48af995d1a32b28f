"""SQL safety validation (reference operators A14/A15).

The reference rejects SQL when any of 9 keywords appears as a *substring*
of the uppercased text (sql_generator.py:110-116) — which falsely rejects
a ``created_at`` column ("CREATE" ⊂ "CREATED_AT") — and force-appends
``LIMIT`` as a string (sql_generator.py:124-125).

Here validation is token-based (comments and string literals stripped
first, keywords matched on word boundaries), multi-statement input is
rejected, the statement must be a query (SELECT/WITH/VALUES), and —
when a SparkSession is supplied — the parsed logical plan is asserted to
contain no command/DDL node, which is the real guarantee: ``spark.sql``
happily executes DDL, so the pass-through surface must gate it
(SURVEY.md §7 risk 4).

Row limiting is applied to the DataFrame (``df.limit(n)``), never by
string append.
"""

from __future__ import annotations

import re

FORBIDDEN_KEYWORDS = (
    # reference blocklist (sql_generator.py:111) ...
    "INSERT", "UPDATE", "DELETE", "DROP", "ALTER", "CREATE", "ATTACH", "COPY", "PRAGMA",
    # ... plus Spark-specific command surface the reference never faced:
    "TRUNCATE", "MERGE", "GRANT", "REVOKE", "SET", "RESET", "REFRESH",
    "CACHE", "UNCACHE", "ANALYZE", "MSCK", "LOAD",
)

_QUERY_STARTERS = ("SELECT", "WITH", "VALUES", "FROM", "TABLE")


class UnsafeSQLError(ValueError):
    """Raised when pass-through SQL is not a single pure query (A14's
    HTTP-400 surface as a typed engine exception, A21)."""


def _strip_literals_and_comments(sql: str) -> str:
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'" or ch == '"':
            quote = ch
            i += 1
            while i < n:
                if sql[i] == quote:
                    # doubled quote = escaped
                    if i + 1 < n and sql[i + 1] == quote:
                        i += 2
                        continue
                    break
                i += 1
            i += 1
            out.append(" ")  # literal replaced by a space
        elif ch == "`":
            i += 1
            start = i
            while i < n and sql[i] != "`":
                i += 1
            # quoted identifiers are opaque: keep a placeholder word so
            # keyword matching cannot fire inside them
            out.append(" qid_" + re.sub(r"\W", "_", sql[start:i]) + " ")
            i += 1
        elif sql.startswith("--", i):
            while i < n and sql[i] != "\n":
                i += 1
        elif sql.startswith("/*", i):
            i += 2
            while i < n and not sql.startswith("*/", i):
                i += 1
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def validate_sql(sql: str, spark=None, max_statements: int = 1) -> str:
    """Return the cleaned SQL or raise :class:`UnsafeSQLError`."""
    cleaned = sql.strip().rstrip(";").strip()
    if not cleaned:
        raise UnsafeSQLError("Empty SQL")

    stripped = _strip_literals_and_comments(cleaned)
    if ";" in stripped:
        raise UnsafeSQLError("Multiple SQL statements are not allowed")

    tokens = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", stripped.upper()))
    bad = sorted(tokens & set(FORBIDDEN_KEYWORDS))
    if bad:
        raise UnsafeSQLError(f"Unsafe SQL operation(s) detected: {', '.join(bad)}")

    first = re.match(r"\s*\(*\s*([A-Za-z]+)", stripped)
    if not first or first.group(1).upper() not in _QUERY_STARTERS:
        raise UnsafeSQLError("Only SELECT queries are allowed")

    if spark is not None:
        _assert_pure_query_plan(cleaned, spark)
    return cleaned


def _assert_pure_query_plan(sql: str, spark) -> None:
    """Parse with Spark's own parser (via py4j) and reject command nodes —
    AST-level enforcement of SELECT-only (the reference had no AST at all,
    SURVEY.md §3 step 3)."""
    try:
        plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    except Exception as exc:  # parse error -> not a valid query
        raise UnsafeSQLError(f"SQL failed to parse: {exc}") from None
    cls = plan.getClass().getName()
    # Commands (DDL/DML/config) parse to *Command / *Statement nodes.
    if "Command" in cls or cls.endswith("Statement"):
        raise UnsafeSQLError(f"Not a pure query (parsed to {cls.rsplit('.', 1)[-1]})")
