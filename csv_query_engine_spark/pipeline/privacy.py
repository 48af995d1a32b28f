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


# ----------------------------- erasure propagation (right-to-be-forgotten)

def erase_keys(
    tables: dict[str, DataFrame],
    key_cols: dict[str, str],
    keys: DataFrame,
    key_col: str = "key",
) -> tuple[dict[str, DataFrame], DataFrame]:
    """Right-to-be-forgotten propagation (GDPR Art. 17): remove every
    row referencing any key in `keys` from each table, in ONE pass per
    table, and return (cleaned tables, audit).  The audit —
    (table_name, n_before, n_removed, n_after) — is the deletion
    receipt a compliance pipeline records; n_before = n_removed +
    n_after holds by construction (the two sides partition each table
    on an anti/semi join of the same broadcast key set).

    Scale: the key set is small by definition (it is a request list) —
    it broadcasts, so each table pays one MAP-SIDE-joinable pass and
    NO shuffle of the table itself; audit counts are one aggregate per
    table. Erasure across shards/partitions is embarrassingly parallel.
    `table_name` (not `table`/`constraint`) keeps the audit
    DuckDB-reserved-word-safe (CLAUDE.md)."""
    k = F.broadcast(keys.select(F.col(key_col).alias("_k")).distinct())
    cleaned: dict[str, DataFrame] = {}
    audits = []
    for name, df in tables.items():
        col = key_cols[name]
        cleaned[name] = df.join(k, df[col] == k["_k"], "left_anti")
        removed = df.join(k, df[col] == k["_k"], "left_semi")
        audits.append(
            df.agg(F.count(F.lit(1)).alias("n_before"))
            .crossJoin(F.broadcast(removed.agg(F.count(F.lit(1)).alias("n_removed"))))
            .select(
                F.lit(name).alias("table_name"),
                F.col("n_before").cast("bigint").alias("n_before"),
                F.col("n_removed").cast("bigint").alias("n_removed"),
                (F.col("n_before") - F.col("n_removed")).cast("bigint").alias("n_after"),
            )
        )
    audit = audits[0]
    for a in audits[1:]:
        audit = audit.unionByName(a)
    return cleaned, audit


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination (Sweeney
    2002) — the release check a pipeline runs before publishing
    derived data: every equivalence class (distinct quasi-identifier
    combination) with its row count, an ``at_risk`` flag for classes
    smaller than ``k`` (re-identifiable: an attacker knowing the
    quasi-identifiers narrows to < k people), and the dataset-level
    risk numbers repeated on every row (grouping-sets convention):
    ``n_risk_rows`` (rows in at-risk classes) and ``risk_ppm`` (their
    share in exact parts-per-million — an integer ratio, so both
    engines emit identical values).

    NULL quasi-identifier values form their own class (groupBy keeps
    nulls — they are a linkable value too).  Scale: ONE aggregation
    over the quasi columns + a 1-row broadcast of the totals; output
    is the class table, bounded by the quasi-combination cardinality."""
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    flagged = classes.select(
        *quasi_cols, "n_rows", (F.col("n_rows") < k).alias("at_risk")
    )
    totals = flagged.agg(
        F.coalesce(
            F.sum(F.when(F.col("at_risk"), F.col("n_rows")).otherwise(F.lit(0))),
            F.lit(0),
        )
        .cast("long")
        .alias("n_risk_rows"),
        F.sum("n_rows").cast("long").alias("_n_total"),
    )
    return (
        flagged.crossJoin(F.broadcast(totals))  # 1-row broadcast
        .select(
            *quasi_cols,
            "n_rows",
            "at_risk",
            "n_risk_rows",
            # exact integer-derived ppm: floor(1e6 * risk / total)
            F.floor(
                F.lit(1000000) * F.col("n_risk_rows") / F.col("_n_total")
            )
            .cast("long")
            .alias("risk_ppm"),
        )
    )
