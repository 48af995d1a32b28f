"""LLM SQL planner (reference operator A12/A13) — pluggable, offline by
default.

The reference calls OpenAI chat completions at temperature 0 with a
prompt embedding the column triples and the last-month date range
(sql_generator.py:80-103). Here the planner is an interface: the default
implementation is the deterministic rule-based generator (no network);
an OpenAI-backed implementation is provided behind an import-try and an
explicit API key, emitting *Spark SQL* dialect.
"""

from __future__ import annotations

import datetime as dt
import os
import re
from typing import Protocol

from csv_query_engine_spark.nlsql.generator import generate_sql_rule_based, get_last_month_range


def strip_sql_fences(text: str) -> str:
    """Remove ```sql ... ``` fences from model output (A13,
    reference sql_generator.py:25-31)."""
    text = text.strip()
    m = re.match(r"^```(?:sql)?\s*(.*?)\s*```$", text, re.DOTALL | re.IGNORECASE)
    return m.group(1).strip() if m else text


class MissingAPIKeyError(RuntimeError):
    """Reference surfaces HTTP 400 when OPENAI_API_KEY is unset
    (sql_generator.py:81-82); typed exception here (A21)."""


class LLMPlanner(Protocol):
    def generate(self, question: str, columns: list, table: str = "df") -> str: ...


class RuleBasedPlanner:
    """Deterministic planner — the offline default.

    Reference-grammar rules (A5-A11) take priority so reference-pattern
    questions produce byte-identical SQL; when they parse NOTHING (the
    bare ``SELECT * FROM t`` fallback) the schema-driven extended
    grammar (nlsql/extended.py: count/agg/group/top-N/equality) gets a
    chance before giving up — still deterministic, still offline."""

    def __init__(self, now: dt.date | None = None):
        self.now = now

    def generate(self, question: str, columns: list, table: str = "df") -> str:
        sql = generate_sql_rule_based(question, columns, table=table, now=self.now)
        base_star = sql.startswith("SELECT * FROM") and " WHERE " not in sql
        if base_star:
            from csv_query_engine_spark.nlsql.extended import generate_sql_extended

            ext = generate_sql_extended(question, columns, table=table, now=self.now)
            if not ext.startswith("SELECT * FROM"):
                return ext
        return sql


class OpenAIPlanner:
    """Network-backed planner mirroring reference A12; requires the
    optional ``openai`` package and an explicit key."""

    def __init__(self, model: str | None = None, api_key: str | None = None, now: dt.date | None = None):
        self.model = model or os.environ.get("OPENAI_MODEL", "gpt-4o-mini")
        self.api_key = api_key or os.environ.get("OPENAI_API_KEY", "")
        self.now = now

    def _prompt(self, question: str, columns: list, table: str) -> str:
        def _get(c, k):
            return c[k] if isinstance(c, dict) else getattr(c, k)

        cols = "\n".join(
            f"- {_get(c, 'name')} ({_get(c, 'type')}, {_get(c, 'semantic_type')})" for c in columns
        )
        today = (self.now or dt.date.today()).isoformat()
        start, end = get_last_month_range(self.now)
        return (
            f"You write one Spark SQL SELECT query over the table `{table}`.\n"
            f"Columns:\n{cols}\n"
            f"Current date: {today}. 'Last month' means {start} .. {end}.\n"
            "Quote identifiers with backticks if they contain spaces.\n"
            "Return ONLY the SQL, no explanation.\n"
            f"Question: {question}"
        )

    def generate(self, question: str, columns: list, table: str = "df") -> str:
        if not self.api_key:
            raise MissingAPIKeyError("OPENAI_API_KEY is not configured")
        try:
            from openai import OpenAI  # optional dependency
        except ImportError as exc:
            raise MissingAPIKeyError("openai package not installed") from exc
        client = OpenAI(api_key=self.api_key)
        resp = client.chat.completions.create(
            model=self.model,
            temperature=0,
            messages=[{"role": "user", "content": self._prompt(question, columns, table)}],
        )
        return strip_sql_fences(resp.choices[0].message.content or "")
