"""Plan linter: mechanical detection of the scale anti-patterns this
repo's own reviews keep hunting by hand (PLANS.md / tests/test_plans.py
pin them per-query; this generalizes the checks to ANY DataFrame).

The rules are exactly the repo's review checklist:

* ``cartesian-product`` (error) — a CartesianProduct joins every row
  pair; at 100 TB it never finishes.  (1-row-broadcast crossJoins
  compile to BroadcastNestedLoopJoin, which is NOT flagged.)
* ``unpartitioned-window`` (error) — a Window with no PARTITION BY
  funnels the whole input through ONE task (the plan shows the
  ``Exchange SinglePartition`` right below it); the fix is the
  triangular broadcast rank or a real partition key (CLAUDE.md).
* ``python-row-udf`` (warn) — BatchEvalPython is the row-at-a-time
  Python path (~10-100× slower than Arrow); ArrowEvalPython /
  MapInPandas are the sanctioned forms and are not flagged.
* ``single-partition-exchange`` (info) — ``Exchange SinglePartition``
  outside the window case above; the COMMON producer is a global
  final aggregate (benign: partial aggregation bounded the rows), so
  this is informational — read it against the row volume.  Global
  ``orderBy`` is NOT this shape (Spark range-partitions global sorts
  in parallel) and the LIMIT idiom compiles to TakeOrderedAndProject.
* ``unpushed-filter`` (warn) — a Filter sits directly on a file scan
  whose ``PushedFilters`` is empty: the predicate reads every row
  (non-pushable expressions like UDF calls, or a source without
  pushdown).
* ``exchange-count`` (info) — the number of shuffle exchanges; not
  wrong by itself, but the first number to read when comparing two
  plans for the same question.

Detection is over the EXECUTED plan string — the same artifact
`.explain("formatted")` shows and the plan-shape tests assert on —
so the linter can never disagree with what the reviewer sees.
AQE caveat: before execution the string is the initial plan
(isFinalPlan=false); runtime re-optimization can only merge/shrink
exchanges, and the flagged shapes (cartesian, unpartitioned window)
survive AQE unchanged.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


_SORT_DIR = re.compile(r" (ASC|DESC) NULLS (FIRST|LAST)")


def _window_groups(line: str) -> list[str]:
    """Top-level ``[...]`` groups after ``Window `` as strings.  The plan
    line prints (exprs[, partitionSpec][, orderSpec]) and OMITS an empty
    spec, so 2 groups is ambiguous: ``Window [exprs], [g#1]`` is
    partitioned-but-unordered (valid) while ``Window [exprs], [o#1 ASC
    NULLS FIRST]`` is ordered-but-UNpartitioned (the single-task funnel).
    Callers disambiguate via the sort-direction marker — an order spec
    always prints ``ASC|DESC NULLS FIRST|LAST``, a partition spec never
    does (empirically probed for all four spec shapes)."""
    tail = line.split("Window ", 1)[1]
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in tail:
        if ch == "[":
            if depth == 0:
                buf = []
            depth += 1
            if depth == 1:
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(buf))
                continue
        if depth >= 1:
            buf.append(ch)
    return groups


def _window_is_unpartitioned(line: str) -> bool:
    groups = _window_groups(line)
    if len(groups) >= 3:
        return False  # (exprs, partition, order)
    if len(groups) <= 1:
        return True  # exprs only: neither spec
    # Two groups: order-only iff the trailing group carries sort markers.
    return bool(_SORT_DIR.search(groups[-1]))


_TREE_PREFIX = re.compile(r"^[ :+\-]*")


def _node_start(line: str) -> int:
    """Column where the node text begins, past the tree-drawing prefix
    (spaces, ``+-``/``:-`` markers, ``:`` continuation bars)."""
    return _TREE_PREFIX.match(line).end()


def _ancestor_lines(lines: list[str], i: int, limit: int = 3) -> list[str]:
    """The nearest ``limit`` ANCESTORS of line ``i`` in the rendered plan
    tree — lines above whose node text starts strictly left of every
    line between them and ``i``.  Lines at equal/deeper indent above
    belong to sibling branches (the other side of a join) and are
    skipped, so a sibling's Filter is never mis-attributed."""
    out: list[str] = []
    threshold = _node_start(lines[i])
    for j in range(i - 1, -1, -1):
        s = _node_start(lines[j])
        if s < threshold:
            out.append(lines[j])
            threshold = s
            if len(out) >= limit:
                break
    return out


def lint_plan(df: DataFrame) -> list[dict]:
    """Lint a DataFrame's physical plan; returns findings as
    ``{"rule", "severity", "detail"}`` dicts, errors first.  Empty
    list = none of the known anti-patterns present."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    findings: list[dict] = []

    # CartesianProduct appears only when NEITHER side is broadcastable —
    # a bounded-side crossJoin compiles to BroadcastNestedLoopJoin (the
    # repo's 1-row-broadcast idiom) and is not flagged.
    if "CartesianProduct" in plan:
        findings.append(
            {
                "rule": "cartesian-product",
                "severity": "error",
                "detail": "CartesianProduct joins every row pair; broadcast the "
                "small side or add an equi-join key.",
            }
        )

    win_lines = [ln for ln in lines if re.search(r"\bWindow \[", ln)]
    unpart = [ln for ln in win_lines if _window_is_unpartitioned(ln)]
    if unpart:
        findings.append(
            {
                "rule": "unpartitioned-window",
                "severity": "error",
                "detail": f"{len(unpart)} Window operator(s) with no PARTITION BY "
                "funnel the whole input through one task; use a partition key "
                "or the triangular broadcast rank for bounded lists.",
            }
        )

    if "BatchEvalPython" in plan:
        findings.append(
            {
                "rule": "python-row-udf",
                "severity": "warn",
                "detail": "BatchEvalPython is the row-at-a-time Python UDF path; "
                "prefer built-in functions or Arrow-batched pandas UDFs.",
            }
        )

    # SinglePartition exchanges not already accounted to an
    # unpartitioned window directly above them — usually a global final
    # aggregate (benign after partial aggregation), so informational.
    sp = plan.count("Exchange SinglePartition")
    if sp > len(unpart):
        findings.append(
            {
                "rule": "single-partition-exchange",
                "severity": "info",
                "detail": f"{sp - len(unpart)} Exchange SinglePartition outside "
                "unpartitioned windows — typically a global final aggregate; "
                "check the row volume feeding it.",
            }
        )

    # Filter among the scan's nearest ANCESTORS (tree-indent walk — raw
    # line proximity would mis-attribute a sibling branch's Filter, e.g.
    # the other side of a join rendered just above this scan).
    for i, ln in enumerate(lines):
        if "PushedFilters: []" in ln and "Scan" in ln:
            above = "".join(_ancestor_lines(lines, i))
            if re.search(r"\bFilter \(", above) or re.search(r"\bFilter \[", above):
                findings.append(
                    {
                        "rule": "unpushed-filter",
                        "severity": "warn",
                        "detail": "A Filter sits on a scan with no pushed "
                        "predicates; the scan reads every row (non-pushable "
                        "expression or pushdown-less source).",
                    }
                )
                break

    n_exchange = len(re.findall(r"\bExchange ", plan))
    findings.append(
        {
            "rule": "exchange-count",
            "severity": "info",
            "detail": f"{n_exchange} shuffle exchange(s) in the plan.",
        }
    )
    order = {"error": 0, "warn": 1, "info": 2}
    return sorted(findings, key=lambda f: order[f["severity"]])
