"""README operator counts must track the registry (they drifted by one
in round 5): derive the numbers from the registry and grep them out of
the README so any future registry growth without a doc update fails
here instead of in review."""

from __future__ import annotations

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
