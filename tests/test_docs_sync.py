"""README operator counts must track the registry (they drifted by one
in round 5), and every SURVEY.md `module::symbol` citation must resolve
(round-9 verdict: §8 cited `detect_column_type` after the function was
renamed `detect_semantic_type` — nothing failed, so the drift reached
review).  Both guards derive expectations from the code, never the
docs."""

from __future__ import annotations

import importlib
import re

from csv_query_engine_spark.queries import REGISTRY, _load


def test_readme_counts_match_registry():
    _load()
    total = len(REGISTRY)
    oracles = sum(1 for _, o in REGISTRY.values() if o is not None)
    text = open("README.md").read()
    # \s, not a hard \n: a legitimate README reflow must not turn this
    # guard into a false "sentence missing" failure (round-6 ADVICE).
    m = re.search(r"`queries\(\)` \((\d+)\s", text)
    assert m, "README queries() count sentence missing"
    assert int(m.group(1)) == total, f"README says {m.group(1)} operators, registry has {total}"
    m = re.search(r"(\d+) of the (\d+);", text)
    assert m, "README oracle count sentence missing"
    assert (int(m.group(1)), int(m.group(2))) == (oracles, total)


def test_survey_symbol_citations_resolve():
    """Every `path.py::symbol` citation in SURVEY.md must name a real
    attribute: package files resolve via importlib + getattr (dotted
    attrs like ``QueryEngine.sql`` walk the chain, ``a/b`` cites both);
    tests/ files are grepped for the symbol token (importing test
    modules here would re-run fixtures)."""
    text = open("SURVEY.md").read()
    cites = sorted(set(re.findall(r"`([A-Za-z_][\w/]*\.py)::([\w./]+)`", text)))
    assert len(cites) > 50, "SURVEY citation regex matched implausibly few"
    bad = []
    for path, syms in cites:
        if path.startswith("tests/"):
            src = open(path).read()
            for s in syms.split("/"):
                if not re.search(r"\b" + re.escape(s.split(".")[0]) + r"\b", src):
                    bad.append(f"{path}::{s} (token not in file)")
            continue
        mod_name = "csv_query_engine_spark." + path[:-3].replace(
            "/__init__", ""
        ).replace("/", ".")
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            bad.append(f"{path} (module {mod_name} does not import)")
            continue
        for s in syms.split("/"):
            obj = mod
            for part in s.split("."):
                obj = getattr(obj, part, None)
                if obj is None:
                    bad.append(f"{path}::{s}")
                    break
    assert not bad, f"SURVEY.md cites unresolvable symbols: {bad}"
