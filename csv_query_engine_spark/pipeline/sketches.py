"""Streaming-summary sketches with exact verification — the bounded-
memory answer to "what are the heavy hitters?" when the distinct-key
dictionary is too large to aggregate (the reference has no sketch
layer; SURVEY.md §2 lists sketches under the LLM-data extensions next
to the HLL/quantile family in queries/relational.py).

Misra-Gries heavy hitters, two passes, NO dictionary-wide shuffle:

1. **Summary pass (map-side only)**: each partition streams its tokens
   through a k-counter Misra-Gries summary inside ONE Arrow-batched
   ``mapInPandas`` (dict ops over whole batches — never a per-row
   UDF).  The guarantee (Misra & Gries 1982): a key with global count
   > N/k is, in at least one partition, locally > n_p/k (counts are
   additive, so the global inequality must hold in some part), and MG
   keeps every key whose local count exceeds n_p/k.  Each partition
   emits ≤ k candidate rows plus one total row — the ONLY data that
   ever shuffles is this ≤ (k+1)·P -row summary, not the token stream
   and not the distinct-token dictionary.
2. **Verification pass**: exact counts for the candidate set only
   (broadcast semi-join into the re-scan), thresholded at > N/k.
   Because candidates ⊇ true heavy hitters and verification is exact,
   the output EQUALS the exact answer — which is why the DuckDB twin
   is a plain GROUP BY ... HAVING and the query stays oracle-green
   even though the scale machinery is a sketch.

At 100 TB: pass 1 is embarrassingly parallel with O(k) state per task;
pass 2 shuffles only rows matching ≤ k·P candidate keys.  The naive
form (groupBy token over the full stream) shuffles the whole
dictionary — the thing this operator exists to avoid.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csv_query_engine_spark.pipeline.text import tokens


def _mg_summaries(k: int):
    """mapInPandas stage: one Misra-Gries summary per partition over
    the incoming token batches (closure-self-contained — executors
    cannot import this package).  Emits (token, n_part) candidate rows
    with token = NULL carrying the partition's total row count."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        total = 0
        for pdf in batches:
            vc = pdf["token"].value_counts()
            total += int(vc.sum())
            for tok, c in vc.items():
                c = int(c)
                if tok in counters:
                    counters[tok] += c
                elif len(counters) < k:
                    counters[tok] = c
                else:
                    # batch-decrement: subtract the min of (c, smallest
                    # counter) from everyone — the standard MG step run
                    # in bulk, preserving the error bound (each unit of
                    # decrement is paid by k+1 distinct keys at once)
                    while c > 0 and tok not in counters:
                        if len(counters) < k:
                            counters[tok] = c
                            break
                        m = min(counters.values())
                        dec = min(c, m)
                        counters = {
                            t: v - dec for t, v in counters.items() if v - dec > 0
                        }
                        c -= dec
        yield pd.DataFrame(
            {
                "token": list(counters) + [None],
                "n_part": list(counters.values()) + [total],
            }
        )

    return summarize


def heavy_hitters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
) -> DataFrame:
    """(token, n_occ) for every token with exact global count > N/k,
    where N is the corpus token count — computed with bounded per-task
    state and candidate-only shuffles (module docstring).  Output is
    exact, so the oracle is the plain GROUP BY/HAVING twin."""
    toks = df.select(
        F.explode(tokens(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    summaries = toks.mapInPandas(
        _mg_summaries(k), "token string, n_part long"
    ).persist()
    n_total = summaries.filter(F.col("token").isNull()).agg(
        F.coalesce(F.sum("n_part"), F.lit(0)).cast("long").alias("n")
    )
    candidates = summaries.filter(F.col("token").isNotNull()).select("token").distinct()
    exact = (
        toks.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    )
    # threshold: strict > floor(N/k) in integer arithmetic (bit-stable
    # across engines; DuckDB twin uses N // k)
    return (
        exact.crossJoin(F.broadcast(n_total))  # 1-row broadcast, not cartesian
        .filter(F.col("n_occ") > F.expr(f"n div {k}"))
        .select("token", "n_occ")
    )
