"""Deterministic pseudonymization of identifier columns — the privacy
transform every shared/training dataset pipeline runs before data
leaves the trust boundary (GDPR Art. 4(5) pseudonymisation; NIST
SP 800-188 de-identification): replace direct identifiers with salted
one-way tokens while PRESERVING referential integrity — the same
(salt, value) always maps to the same token, so joins/group-bys across
tables keep working on the pseudonyms.

Contrast with pipeline/text.py::pii_scan (DETECT free-text PII) and
redaction (DESTROY it): pseudonymization keeps the column join-able.
Re-identification resistance comes from the salt's secrecy and the
one-way hash; rotation = re-run with a new salt.

Scale: a pure per-row codegen'd projection — no shuffle, no state, no
Python; the transform composes under every scan (pushdown-neutral).
Cross-engine: Spark ``sha2(x, 256)`` and DuckDB ``sha256(x)`` both emit
lowercase hex over identical UTF-8 input, so the operator is fully
oracle-pairable (the md5 idiom's stronger sibling).

No reference analog (the reference has no privacy surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pseudonym(col, salt: str, length: int = 16):
    """Salted one-way token for one value: first ``length`` hex chars of
    sha256(salt || value). NULL stays NULL (no token for no value) —
    the null-preserving contract a left join downstream depends on."""
    return F.when(
        col.isNotNull(),
        F.substring(F.sha2(F.concat(F.lit(salt), col.cast("string")), 256), 1, length),
    )


def pseudonymize_columns(
    df: DataFrame, columns: list[str], salt: str, length: int = 16
) -> DataFrame:
    """Replace each named column with its salted token (same name, so
    downstream queries/joins are unchanged); all other columns pass
    through untouched."""
    out = df
    for c in columns:
        out = out.withColumn(c, pseudonym(F.col(c), salt, length))
    return out


def sql_pseudonym(expr: str, salt: str, length: int = 16) -> str:
    """DuckDB twin of :func:`pseudonym` over a SQL expression."""
    return (
        f"CASE WHEN {expr} IS NOT NULL THEN "
        f"substring(sha256('{salt}' || CAST({expr} AS VARCHAR)), 1, {length}) END"
    )
