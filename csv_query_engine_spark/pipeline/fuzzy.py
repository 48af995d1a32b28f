"""Fuzzy (edit-distance) similarity join via deletion neighborhoods.

Entity-resolution / typo-canonicalization primitive: find all pairs of
dictionary strings within Levenshtein distance ``d`` WITHOUT the O(V²)
self-join.  The blocking is SymSpell's deletion-neighborhood scheme
(Garbe's symmetric-delete; the same completeness argument as
FastSS, Bocek et al. 2007): if lev(a, b) <= d then deleting the
mismatched positions of an optimal alignment from each side yields a
COMMON string reachable by <= d single-char deletions from both — so
joining the d-deletion neighborhoods on the variant string finds every
true pair, and a final exact ``levenshtein`` check discards the false
candidates.  Exact, not approximate: the oracle twin is the brute-force
quadratic join and hash-matches.

Scale contract: this runs on the DISTINCT-string dictionary, not the
corpus — the step that turns a 100 TB token stream into the dictionary
is an ordinary count aggregate.  Each string of length L expands to
O(L^d) variants (L <= ~20 for natural-language tokens, d <= 2 → ~400
rows), the variant join is an equi-join on a string key, and candidate
multiplicity per variant is bounded by how many dictionary entries
share a deletion — no quadratic term anywhere.  Variant construction
is pure codegen (sequence → explode → substr/concat): per CLAUDE.md,
no per-element HOF lambdas and no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csv_query_engine_spark.pipeline.common import spread


def _del1(df: DataFrame, col: str, out: str) -> DataFrame:
    """All single-character deletions of `col` (one output row per
    position; empty strings produce nothing).  Codegen'd: explode a
    position index, build the variant with substr+concat."""
    i = F.explode(F.sequence(F.lit(1), F.length(F.col(col)))).alias("_i")
    return (
        df.filter(F.length(F.col(col)) > 0)
        .select(*df.columns, i)
        .select(
            *df.columns,
            F.concat(
                F.col(col).substr(F.lit(1), F.col("_i") - 1),
                F.col(col).substr(
                    F.col("_i") + 1, F.length(F.col(col)) - F.col("_i")
                ),
            ).alias(out),
        )
    )


def deletion_neighborhood(
    dictionary: DataFrame, token_col: str = "token", max_dist: int = 2
) -> DataFrame:
    """(token, variant) — every string reachable from `token` by at
    most `max_dist` single-character deletions (including the token
    itself), de-duplicated."""
    n = dictionary.select(
        F.col(token_col).alias("token"), F.col(token_col).alias("variant")
    )
    layer = n
    for _ in range(max_dist):
        nxt = _del1(layer.select("token", "variant"), "variant", "_v").select(
            "token", F.col("_v").alias("variant")
        )
        layer = nxt
        n = n.unionByName(nxt)
    return n.distinct()


def fuzzy_pairs(
    dictionary: DataFrame, token_col: str = "token", max_dist: int = 2
) -> DataFrame:
    """All unordered dictionary pairs (tok_a < tok_b, dist <= max_dist):
    deletion-neighborhood blocking + exact levenshtein verification.

    One equi-join on the variant string; pairs that share several
    variants dedupe BEFORE the levenshtein check (distance is computed
    once per candidate pair, not per collision)."""
    d = spread(dictionary.select(F.col(token_col).alias("token")).distinct())
    nb = deletion_neighborhood(d, "token", max_dist)
    right = nb.select(F.col("token").alias("tok_b"), F.col("variant"))
    cand = (
        nb.select(F.col("token").alias("tok_a"), "variant")
        .join(right, "variant")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .select("tok_a", "tok_b")
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein(F.col("tok_a"), F.col("tok_b"))
    ).filter(F.col("dist") <= F.lit(max_dist))
