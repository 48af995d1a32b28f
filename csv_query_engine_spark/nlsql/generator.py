"""Rule-based NL->SQL (reference operators A5-A11).

Reproduces the reference's entire deterministic grammar
(sql_generator.py:42-78):

    SELECT {* | `c`, COUNT(*) AS count}
    FROM df
    [WHERE `citycol` = '<City>' [AND `datecol` BETWEEN <start> AND <end>]]
    [GROUP BY `c`]

* "which X" (regex ``which (\\w+)``, case-insensitive, single-word column
  names only — reference sql_generator.py:50-56) selects the group-by
  column when X matches a column name;
* the first of the 8 hard-coded cities found in the question becomes an
  equality filter on the first city-semantic column, value capitalized
  (sql_generator.py:58-65);
* "last month" adds a closed range on the first date-semantic column;
  the reference took bounds from the wall clock (sql_generator.py:12-17)
  — here the clock is injectable (``now``) so plans are deterministic
  and testable (SURVEY.md §7 risk 2).

Identifiers are backtick-quoted — the Spark SQL equivalent of the
reference's double-quoting (A11, sql_generator.py:8-10).
"""

from __future__ import annotations

import datetime as dt
import re

# Hard-coded city vocabulary, verbatim from reference sql_generator.py:61.
CITIES = ("mumbai", "delhi", "bangalore", "chennai", "kolkata", "hyderabad", "pune", "ahmedabad")


def quote_identifier(name: str) -> str:
    """Backtick-quote an identifier (A11); embedded backticks doubled per
    Spark SQL lexical rules."""
    return "`" + name.replace("`", "``") + "`"


def get_last_month_range(now: dt.date | None = None) -> tuple[str, str]:
    """First/last instant of the previous calendar month as ISO strings
    (A9, reference sql_generator.py:12-17) with an injectable clock."""
    today = now or dt.date.today()
    first_of_this = today.replace(day=1)
    last_of_prev = first_of_this - dt.timedelta(days=1)
    first_of_prev = last_of_prev.replace(day=1)
    return (
        first_of_prev.isoformat() + " 00:00:00",
        last_of_prev.isoformat() + " 23:59:59",
    )


def generate_sql_rule_based(
    question: str,
    columns: list[dict] | list,
    table: str = "df",
    now: dt.date | None = None,
) -> str:
    """NL -> one Spark-SQL SELECT string (A5-A11).

    ``columns`` is the profiler output: objects/dicts with ``name``,
    ``type``, ``semantic_type``.
    """

    def _get(c, k):
        return c[k] if isinstance(c, dict) else getattr(c, k)

    q = question.lower()
    names = {_get(c, "name").lower(): _get(c, "name") for c in columns}

    select_cols = "*"
    group_by = ""
    where_clauses: list[str] = []

    # "which X" -> GROUP BY X + count (A6/A7).  The reference matches the
    # captured word against column names exactly (sql_generator.py:50-56),
    # which fails its own canonical example ("which services" vs column
    # `Service` — that example only works via the LLM path). Delta: we
    # also try a trailing-'s' singular/plural fold so the flagship
    # question resolves deterministically.
    m = re.search(r"which (\w+)", q)
    if m:
        word = m.group(1)
        candidates = (word, word.rstrip("s"), word + "s")
        hit = next((names[w] for w in candidates if w in names), None)
        if hit is not None:
            col = quote_identifier(hit)
            select_cols = f"{col}, COUNT(*) AS count"
            group_by = f" GROUP BY {col}"

    # City equality filter (A8) on the first city-semantic column.
    city_cols = [_get(c, "name") for c in columns if _get(c, "semantic_type") == "city"]
    if city_cols:
        for city in CITIES:
            if city in q:
                where_clauses.append(f"{quote_identifier(city_cols[0])} = '{city.capitalize()}'")
                break

    # "last month" range filter (A9) on the first date-semantic column.
    date_cols = [_get(c, "name") for c in columns if _get(c, "semantic_type") == "date"]
    if "last month" in q and date_cols:
        start, end = get_last_month_range(now)
        d = quote_identifier(date_cols[0])
        where_clauses.append(f"{d} >= '{start}' AND {d} <= '{end}'")

    sql = f"SELECT {select_cols} FROM {quote_identifier(table) if not table.isidentifier() else table}"
    if where_clauses:
        sql += " WHERE " + " AND ".join(where_clauses)  # conjunction (A10)
    sql += group_by
    return sql
