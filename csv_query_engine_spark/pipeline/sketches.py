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
    exact, so the oracle is the plain GROUP BY/HAVING twin.
    Cache lifetime is CALLER-OWNED — wrap the call in
    ``pipeline.cache_scope(spark)`` to release the persisted
    intermediates on exit (the one library-wide convention)."""
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


# ------------------------------------------- Count-Min frequency sketch

def _cm_pos(key_col: str, i: int, width: int, salt: str):
    """Probe i's column index: the cross-engine md5 recipe
    (features._hash32 with a per-row salt) mod width — ONE definition
    shared by build and probe so the two can never drift apart."""
    from csv_query_engine_spark.pipeline.features import _hash32

    return F.pmod(_hash32(F.col(key_col).cast("string"), f"{salt}{i}-"), F.lit(width))


def cm_cells(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    salt: str = "cm",
) -> DataFrame:
    """Count-Min sketch table (Cormode & Muthukrishnan 2005) over
    `key_col`: ≤ depth×width rows (row, col, cnt) — bounded state no
    matter the stream size, mergeable across shards by cell-wise SUM
    (the same additive-summary semantics as the HLL rollup).

    Positions come from the cross-engine md5 recipe, so the sketch —
    INCLUDING its collision overcounts, which are what make it a
    sketch — is bit-for-bit reproducible by DuckDB: this is the rare
    sketch whose *approximation error* is oracle-checkable, not just
    its exact-verified output (contrast heavy_hitters above, whose
    oracle sees only the exact answer).

    Plan: one depth-way explode + ONE (row, col) aggregation with
    map-side partial combine; nothing else shuffles."""
    pos = [_cm_pos(key_col, i, width, salt) for i in range(depth)]
    cells = df.select(
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("r"), p.alias("c")) for i, p in enumerate(pos)])
        ).alias("rc")
    )
    return (
        cells.select(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cm_estimates(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    salt: str = "cm",
) -> DataFrame:
    """Point-frequency estimates for `keys` from a :func:`cm_cells`
    sketch: est(key) = min over rows of the key's cell count (≥ the
    true count always — collisions only ADD). The ≤ depth×width cell
    table BROADCASTS; per key it's depth lookups + one min."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        _cm_pos(key_col, i, width, salt).alias("c"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(key_col, F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    return (
        probes.join(F.broadcast(cells), ["r", "c"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est_count"))
    )


def sql_cm_estimates(
    table: str,
    key_expr: str,
    depth: int = 4,
    width: int = 64,
    salt: str = "cm",
) -> str:
    """DuckDB twin of cm_cells + cm_estimates over every distinct key
    of `key_expr`, with the exact count and the (always ≥ 0)
    overcount alongside."""
    h = (
        f"CAST(('0x' || substring(md5('{salt}' || i || '-' || CAST(k AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {width}"
    )
    return f"""
    WITH seeds AS (SELECT unnest(generate_series(0, {depth - 1})) AS i),
    vals AS (SELECT {key_expr} AS k FROM {table}),
    pos AS (SELECT i, {h} AS c FROM vals CROSS JOIN seeds),
    cells AS (SELECT i, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM pos GROUP BY i, c),
    keys AS (SELECT DISTINCT k FROM vals),
    kpos AS (SELECT k, i, {h} AS c FROM keys CROSS JOIN seeds),
    est AS (
        SELECT kpos.k, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS est_count
        FROM kpos LEFT JOIN cells ON kpos.i = cells.i AND kpos.c = cells.c
        GROUP BY kpos.k
    ),
    exact AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS exact_count FROM vals GROUP BY k)
    SELECT est.k AS key, est_count, exact_count,
           est_count - exact_count AS overcount
    FROM est JOIN exact ON est.k = exact.k
    ORDER BY key
    """


# ---------------------------------------- hand-built HyperLogLog (p=8)

def _hll_const(m: int) -> float:
    """alpha_m · m² · 2⁵⁷ pre-folded in Python (one emitted double, one
    cross-engine division — the fewer float ops the fewer ulp seams)."""
    alpha = 0.7213 / (1 + 1.079 / m)
    return alpha * (m * m) * float(2**57)


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_col: str,
    p: int = 8,
    salt: str = "hll-",
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate (Flajolet et al.
    2007) built FROM SCRATCH on the cross-engine md5 recipe — unlike
    `approx_count_distinct` (whose register layout is engine-internal),
    every register here is reproducible arithmetic, so the ESTIMATE
    ITSELF — bias correction included — oracle-pairs against DuckDB.

    Register derivation (m = 2^p buckets): the 128-bit md5 splits into
    two 32-bit hex parses; bucket = top p bits of `hi`, the remaining
    56 bits form `w`, and rho = 57 − bitlen(w) (via length(bin(w)),
    identical string semantics in both engines; w = 0 → 57).  The
    harmonic sum Σ 2^(−M_b) scales by 2^57 into EXACT integer
    arithmetic (decimal(38,0) here, HUGEINT in the twin — the
    media-pairs precedent), empty registers contributing 2^57 each.
    Small-range correction: E ≤ 2.5m with V zero registers → m·ln(m/V)
    (the one transcendental; the branch compares identical doubles on
    both sides).

    Scale: register state is m rows per group NO MATTER the input
    (mergeable by MAX — the same shard-union semantics as the
    DataSketches rollup in queries/relational.py); one (group, bucket)
    aggregation + one per-group fold."""
    regs = hll_registers(df, key_col, group_col, p, salt)
    return hll_estimate_from_registers(regs, group_col, p)


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_col: str,
    p: int = 8,
    salt: str = "hll-",
) -> DataFrame:
    """The (group_col, b, mb) register table of :func:`hll_distinct` —
    factored out so streaming/shard builds can persist per-batch
    registers and MAX-merge them later (the mergeable contract)."""
    hexd = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    hi = F.conv(F.substring(hexd, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hexd, 9, 8), 16, 10).cast("long")
    parts = df.select(
        F.col(group_col).alias("g"), hi.alias("_hi"), lo.alias("_lo")
    ).select(
        "g",
        F.shiftright("_hi", 32 - p).alias("b"),
        (
            F.shiftleft(F.col("_hi").bitwiseAND(F.lit((1 << (32 - p)) - 1)), 32)
            .bitwiseOR(F.col("_lo"))
        ).alias("w"),
    )
    rho = parts.select(
        "g",
        "b",
        F.when(F.col("w") == 0, F.lit(64 - p + 1))
        .otherwise(F.lit(64 - p + 1) - F.length(F.bin(F.col("w"))))
        .alias("r"),
    )
    return (
        rho.groupBy("g", "b")
        .agg(F.max("r").cast("int").alias("mb"))
        .withColumnRenamed("g", group_col)
    )


def hll_estimate_from_registers(regs: DataFrame, group_col: str, p: int = 8) -> DataFrame:
    """Fold a (group_col, b, mb) register table — direct from
    :func:`hll_registers` or MAX-merged across batches/shards — into
    per-group estimates (exact 2^57-scaled harmonic sum + small-range
    correction; see :func:`hll_distinct`)."""
    m = 1 << p
    per = regs.withColumnRenamed(group_col, "g").groupBy("g").agg(
        F.count(F.lit(1)).cast("int").alias("nb"),
        F.sum(
            F.expr("CAST(shiftleft(1L, CAST(57 - mb AS INT)) AS DECIMAL(38,0))")
        ).alias("sp"),
    )
    s = F.col("sp") + (F.lit(m) - F.col("nb")).cast("decimal(38,0)") * F.lit(
        2**57
    ).cast("decimal(38,0)")
    e_raw = F.lit(_hll_const(m)) / s.cast("double")
    v = F.lit(m) - F.col("nb")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return per.select(
        F.col("g").alias(group_col),
        F.col("nb").alias("n_registers"),
        F.floor(est + F.lit(0.5)).cast("bigint").alias("hll_estimate"),
    )


def sql_hll_distinct(
    table: str,
    key_expr: str,
    group_expr: str,
    p: int = 8,
    salt: str = "hll-",
) -> str:
    """DuckDB twin of :func:`hll_distinct` (same registers, same exact
    harmonic sum in HUGEINT, same pre-folded constant, same correction
    branch) — mirrors hll_distinct's 3-column output exactly; callers
    wanting the exact distinct count alongside join it themselves
    (_hll_oracle / _hll_merge_oracle do)."""
    m = 1 << p
    mask = (1 << (32 - p)) - 1
    return f"""
    WITH vals AS (SELECT {group_expr} AS g, CAST({key_expr} AS VARCHAR) AS k
                  FROM {table}),
    h AS (SELECT g,
                 CAST(('0x' || substring(md5('{salt}' || k), 1, 8)) AS BIGINT) AS hi,
                 CAST(('0x' || substring(md5('{salt}' || k), 9, 8)) AS BIGINT) AS lo
          FROM vals),
    parts AS (SELECT g, hi >> {32 - p} AS b,
                     ((hi & {mask}) << 32) | lo AS w
              FROM h),
    rho AS (SELECT g, b,
                   CASE WHEN w = 0 THEN {64 - p + 1}
                        ELSE {64 - p + 1} - length(bin(w)) END AS r
            FROM parts),
    regs AS (SELECT g, b, MAX(r) AS mb FROM rho GROUP BY g, b),
    per AS (SELECT g, CAST(COUNT(*) AS INT) AS nb,
                   SUM(CAST((CAST(1 AS BIGINT) << CAST(57 - mb AS INT))
                            AS HUGEINT)) AS sp
            FROM regs GROUP BY g),
    folded AS (
        SELECT g, nb,
               CAST({_hll_const(m)!r} AS DOUBLE)
                   / CAST(sp + CAST({m} - nb AS HUGEINT)
                               * (CAST(1 AS HUGEINT) << 57) AS DOUBLE) AS e_raw,
               {m} - nb AS v
        FROM per
    )
    SELECT g AS {group_expr}, nb AS n_registers,
           CAST(FLOOR(CASE WHEN e_raw <= CAST({2.5 * m!r} AS DOUBLE) AND v > 0
                           THEN CAST({float(m)!r} AS DOUBLE)
                                * ln(CAST({float(m)!r} AS DOUBLE) / CAST(v AS DOUBLE))
                           ELSE e_raw END + 0.5) AS BIGINT) AS hll_estimate
    FROM folded
    ORDER BY 1
    """


def hll_overlap(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    p: int = 8,
    salt: str = "hll-",
) -> DataFrame:
    """HLL set algebra between two key sets: one row with ``est_a``,
    ``est_b``, ``est_union`` (MAX-merged registers — the mergeability
    that makes HLL a SET sketch, not just a counter), ``est_intersection``
    via inclusion–exclusion clamped at 0, and ``jaccard_ppm`` =
    FLOOR(|A∩B|·10⁶ / |A∪B|) — the standard sketch-based overlap
    screen (e.g. benchmark-vs-train contamination at corpus scale,
    where exact COUNT(DISTINCT) over two 100 TB key sets needs a
    full shuffle each and the sketch needs 2^p rows per set).

    Each input is scanned ONCE: its register table (from
    :func:`hll_registers`) serves both its own estimate and, MAX-merged
    with the other side's, the union estimate — no second pass, and
    the same register tables could come off per-shard/streaming builds
    (the batch_id-keyed store idiom).  Caller contract: both inputs
    non-empty — an empty side has no registers, so its estimate (and
    everything derived) comes out NULL rather than 0; screen empty
    sides out before sketching.  All estimates are the
    deterministic md5-recipe integers of :func:`hll_distinct`, and the
    Jaccard division is a single IEEE op on those integers, so the
    whole row oracle-pairs bit-for-bit (:func:`sql_hll_overlap`)."""
    ra = hll_registers(
        a.select(F.lit("a").alias("_s"), F.col(key_col)), key_col, "_s", p, salt
    )
    rb = hll_registers(
        b.select(F.lit("b").alias("_s"), F.col(key_col)), key_col, "_s", p, salt
    )
    both = ra.unionByName(rb)
    ru = both.groupBy("b").agg(F.max("mb").alias("mb")).select(
        F.lit("u").alias("_s"), "b", "mb"
    )
    est = hll_estimate_from_registers(both.unionByName(ru), "_s", p)
    one = est.groupBy().agg(
        F.max(F.when(F.col("_s") == "a", F.col("hll_estimate"))).alias("est_a"),
        F.max(F.when(F.col("_s") == "b", F.col("hll_estimate"))).alias("est_b"),
        F.max(F.when(F.col("_s") == "u", F.col("hll_estimate"))).alias("est_union"),
    )
    inter = F.greatest(
        F.lit(0).cast("bigint"), F.col("est_a") + F.col("est_b") - F.col("est_union")
    )
    return one.select(
        "est_a",
        "est_b",
        "est_union",
        inter.alias("est_intersection"),
        F.floor(
            inter.cast("double") * F.lit(1000000.0) / F.col("est_union").cast("double")
        )
        .cast("bigint")
        .alias("jaccard_ppm"),
    )


def sql_hll_overlap(
    table_a: str,
    table_b: str,
    key_expr: str,
    p: int = 8,
    salt: str = "hll-",
) -> str:
    """DuckDB twin of :func:`hll_overlap`: the labeled union re-derives
    the 'u' registers from the concatenated key rows — MAX over the
    combined rows IS the MAX-merge of the two register tables, so the
    twin needs no register plumbing, just :func:`sql_hll_distinct` on a
    three-label derived table (the parenthesized-subquery rule for
    derived oracle inputs) and a conditional-aggregation pivot."""
    labeled = (
        f"(SELECT 'a' AS s, {key_expr} AS k FROM {table_a} "
        f"UNION ALL SELECT 'b', {key_expr} FROM {table_b} "
        f"UNION ALL SELECT 'u', {key_expr} FROM {table_a} "
        f"UNION ALL SELECT 'u', {key_expr} FROM {table_b}) lbl"
    )
    inner = sql_hll_distinct(labeled, "k", "s", p, salt)
    return f"""
    WITH est AS ({inner}),
    piv AS (
        SELECT MAX(CASE WHEN s = 'a' THEN hll_estimate END) AS est_a,
               MAX(CASE WHEN s = 'b' THEN hll_estimate END) AS est_b,
               MAX(CASE WHEN s = 'u' THEN hll_estimate END) AS est_union
        FROM est
    )
    SELECT est_a, est_b, est_union,
           GREATEST(CAST(0 AS BIGINT), est_a + est_b - est_union)
               AS est_intersection,
           CAST(FLOOR(CAST(GREATEST(CAST(0 AS BIGINT),
                                    est_a + est_b - est_union) AS DOUBLE)
                      * 1000000.0 / CAST(est_union AS DOUBLE)) AS BIGINT)
               AS jaccard_ppm
    FROM piv
    """


# ------------------------- integer log-bucket quantile sketch (HDR-style)

def _hdr_bucket_exprs(value_col: str, sub_bits: int):
    """(e, sb) bucket expressions — the ONE definition the ungrouped
    and grouped builds share (the md5-recipe rule: never re-inline a
    reproducible-internals expression at a call site, or the Spark
    side and its DuckDB twin can drift apart silently)."""
    s = int(sub_bits)
    v = F.col(value_col).cast("long")
    e = F.when(v <= 0, F.lit(-1)).otherwise(F.length(F.bin(v)) - F.lit(1)).cast("int")
    sb = (
        F.when(v <= 0, F.lit(0))
        .otherwise(
            F.expr(
                f"shiftright(CAST({value_col} AS BIGINT),"
                f" greatest(length(bin(CAST({value_col} AS BIGINT))) - 1 - {s}, 0))"
                f" - shiftleft(CAST(1 AS BIGINT),"
                f" least(length(bin(CAST({value_col} AS BIGINT))) - 1, {s}))"
            )
        )
        .cast("long")
    )
    return e, sb


def hdr_buckets(df: DataFrame, value_col: str, sub_bits: int = 5) -> DataFrame:
    """Log-bucket quantile-sketch table over POSITIVE integer values
    (HdrHistogram's bucketing — Tene's high-dynamic-range histogram;
    the same two-level exponent/mantissa scheme as DDSketch with
    gamma = 1+2^-sub_bits but in PURE INTEGER arithmetic): bucket =
    (e, sb) where e = floor(log2(v)) via length(bin(v))−1 (the HLL
    twin's identical-string trick) and sb = the next ``sub_bits``
    mantissa bits.  ≤ 63·2^sub_bits + 1 rows no matter the input size,
    mergeable across shards/batches/days by cell-wise SUM (the
    Count-Min contract), and — unlike t-digest/KLL, whose state
    depends on stream order or randomness — fully DETERMINISTIC, so
    the sketch is bit-for-bit reproducible by DuckDB and every
    quantile estimate hash-matches.

    Quantile estimates from the sketch are bucket LOWER BOUNDS: the
    true q-quantile lies in [est, est·(1+2^-sub_bits)) — a guaranteed
    relative error, the property fixed-width histograms lack.

    NULLs are excluded; values ≤ 0 land in the reserved (-1, 0)
    bucket (they sort first and estimate as 0 — data-quality strays,
    not the contract domain).  One projection + ONE aggregation with
    map-side combine; nothing else shuffles."""
    e, sb = _hdr_bucket_exprs(value_col, sub_bits)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(e.alias("e"), sb.alias("sb"))
        .groupBy("e", "sb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def hdr_lower_bound(sub_bits: int = 5):
    """Column expr: the smallest value in bucket (e, sb) — exact
    integer, the estimate :func:`hdr_quantiles` emits."""
    s = int(sub_bits)
    return F.when(F.col("e") < 0, F.lit(0).cast("long")).otherwise(
        F.expr(
            f"shiftleft(shiftleft(CAST(1 AS BIGINT), least(e, {s})) + sb,"
            f" greatest(e - {s}, 0))"
        )
    )


def hdr_quantiles(
    buckets: DataFrame, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.99), sub_bits: int = 5
) -> DataFrame:
    """(q, rank, est, n) quantile estimates from a :func:`hdr_buckets`
    table (possibly SUM-merged across shards): rank = ceil(q·N), est =
    the lower bound of the first bucket whose cumulative count reaches
    the rank — true value within relative 2^-sub_bits above est.

    The bucket table is BOUNDED (≤ 63·2^sub_bits + 1 rows), so the
    cumulative walk is the triangular broadcast self-join idiom (no
    unpartitioned window), and the per-q pick is a min-struct
    aggregate over the broadcast cum table.

    ``buckets`` is usually a corpus AGGREGATE (hdr_buckets) and is
    consumed three times here (total + both triangular-join aliases) —
    persist the bounded table once so the upstream scan/aggregate runs
    once, not three times (round-14)."""
    from pyspark.storagelevel import StorageLevel

    buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    tot = buckets.agg(F.sum("cnt").cast("long").alias("n"))
    before = (F.col("b.e") < F.col("a.e")) | (
        (F.col("b.e") == F.col("a.e")) & (F.col("b.sb") <= F.col("a.sb"))
    )
    cum = (
        buckets.alias("a")
        .join(F.broadcast(buckets.alias("b")), before)
        .groupBy(F.col("a.e").alias("e"), F.col("a.sb").alias("sb"))
        .agg(F.sum("b.cnt").cast("long").alias("cum"))
    )
    targets = tot.select(
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"), "n"
    ).select(
        "q",
        F.greatest(F.lit(1).cast("long"), F.ceil(F.col("q") * F.col("n")).cast("long"))
        .alias("rank"),
        "n",
    )
    pick = (
        targets.join(F.broadcast(cum), F.col("cum") >= F.col("rank"))
        .groupBy("q", "rank", "n")
        .agg(F.min(F.struct("e", "sb")).alias("s"))
        .select("q", "rank", "n", F.col("s.e").alias("e"), F.col("s.sb").alias("sb"))
    )
    return pick.select(
        "q", "rank", hdr_lower_bound(sub_bits).alias("est"), "n"
    ).orderBy("q")


def sql_hdr_quantiles(
    table: str,
    value_expr: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.99),
    sub_bits: int = 5,
) -> str:
    """DuckDB twin of hdr_buckets + hdr_quantiles — identical integer
    bucketing (length(bin()) exponent, shifted mantissa), identical
    cumulative walk, identical lower-bound estimates; hash-exact."""
    s = int(sub_bits)
    qvals = ", ".join(f"({q!r})" for q in qs)
    return f"""
    WITH vals AS (SELECT CAST({value_expr} AS BIGINT) AS v FROM {table}
                  WHERE {value_expr} IS NOT NULL),
    bk AS (SELECT CASE WHEN v <= 0 THEN -1
                       ELSE CAST(length(bin(v)) - 1 AS INT) END AS e,
                  CASE WHEN v <= 0 THEN CAST(0 AS BIGINT)
                       ELSE (v >> greatest(length(bin(v)) - 1 - {s}, 0))
                            - (CAST(1 AS BIGINT) << least(length(bin(v)) - 1, {s}))
                  END AS sb
           FROM vals),
    buckets AS (SELECT e, sb, CAST(COUNT(*) AS BIGINT) AS cnt FROM bk GROUP BY e, sb),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM buckets),
    cum AS (SELECT a.e, a.sb, CAST(SUM(b.cnt) AS BIGINT) AS cum
            FROM buckets a JOIN buckets b
              ON (b.e < a.e) OR (b.e = a.e AND b.sb <= a.sb)
            GROUP BY a.e, a.sb),
    targets AS (SELECT CAST(q AS DOUBLE) AS q,
                       GREATEST(CAST(1 AS BIGINT),
                                CAST(ceil(CAST(q AS DOUBLE) * n) AS BIGINT)) AS rank,
                       n
                FROM (VALUES {qvals}) t(q) CROSS JOIN tot),
    pick AS (SELECT q, rank, n, e, sb FROM (
                 SELECT t.q, t.rank, t.n, c.e, c.sb,
                        ROW_NUMBER() OVER (PARTITION BY t.q ORDER BY c.e, c.sb) AS rn
                 FROM targets t JOIN cum c ON c.cum >= t.rank)
             WHERE rn = 1)
    SELECT q, rank,
           CASE WHEN e < 0 THEN CAST(0 AS BIGINT)
                ELSE ((CAST(1 AS BIGINT) << least(e, {s})) + sb)
                     << greatest(e - {s}, 0) END AS est,
           n
    FROM pick ORDER BY q
    """


def hdr_buckets_by(
    df: DataFrame, group_cols: list[str], value_col: str, sub_bits: int = 5
) -> DataFrame:
    """Per-group :func:`hdr_buckets`: (*group_cols, e, sb, cnt) — the
    per-key quantile-monitoring face (one sketch per tenant/day/
    cohort), ≤ 63·2^sub_bits + 1 rows PER GROUP, mergeable across
    shards by (group, e, sb) SUM.  Same integer bucketing, same
    determinism, same oracle story."""
    e, sb = _hdr_bucket_exprs(value_col, sub_bits)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, e.alias("e"), sb.alias("sb"))
        .groupBy(*group_cols, "e", "sb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def hdr_quantiles_by(
    buckets: DataFrame,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.99),
    sub_bits: int = 5,
) -> DataFrame:
    """(*group_cols, q, rank, est, n) per-group quantile estimates from
    a :func:`hdr_buckets_by` table.  The cumulative walk is a window
    partitioned by the group over ≤ 63·2^sub_bits + 1 sketch rows —
    bounded partitions BY CONSTRUCTION (never the group's raw rows,
    the defect exact percentile has); the per-(group, q) pick is a
    min-struct aggregate."""
    from pyspark.sql import Window as W
    from pyspark.storagelevel import StorageLevel

    g = list(group_cols)
    # two consumers of the (usually aggregate-derived) sketch table —
    # the cumulative window and the per-group totals; persist once
    # (round-14, same as hdr_quantiles)
    buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    w = W.partitionBy(*g).orderBy("e", "sb")
    cum = buckets.withColumn("cum", F.sum("cnt").over(w))
    tot = buckets.groupBy(*g).agg(F.sum("cnt").cast("long").alias("n"))
    targets = tot.select(
        *g, F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"), "n"
    ).select(
        *g,
        "q",
        F.greatest(F.lit(1).cast("long"), F.ceil(F.col("q") * F.col("n")).cast("long"))
        .alias("rank"),
        "n",
    )
    pick = (
        targets.join(cum, g)
        .filter(F.col("cum") >= F.col("rank"))
        .groupBy(*g, "q", "rank", "n")
        .agg(F.min(F.struct("e", "sb")).alias("s"))
        .select(*g, "q", "rank", "n", F.col("s.e").alias("e"), F.col("s.sb").alias("sb"))
    )
    return pick.select(
        *g, "q", "rank", hdr_lower_bound(sub_bits).alias("est"), "n"
    ).orderBy(*g, "q")


def sql_hdr_quantiles_by(
    table: str,
    group_expr: str,
    value_expr: str,
    qs: tuple[float, ...] = (0.5, 0.99),
    sub_bits: int = 5,
) -> str:
    """DuckDB twin of hdr_buckets_by + hdr_quantiles_by (one group
    column aliased ``g``) — identical integer arithmetic, hash-exact."""
    s = int(sub_bits)
    qvals = ", ".join(f"({q!r})" for q in qs)
    return f"""
    WITH vals AS (SELECT {group_expr} AS g, CAST({value_expr} AS BIGINT) AS v
                  FROM {table} WHERE {value_expr} IS NOT NULL),
    bk AS (SELECT g,
                  CASE WHEN v <= 0 THEN -1
                       ELSE CAST(length(bin(v)) - 1 AS INT) END AS e,
                  CASE WHEN v <= 0 THEN CAST(0 AS BIGINT)
                       ELSE (v >> greatest(length(bin(v)) - 1 - {s}, 0))
                            - (CAST(1 AS BIGINT) << least(length(bin(v)) - 1, {s}))
                  END AS sb
           FROM vals),
    buckets AS (SELECT g, e, sb, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM bk GROUP BY g, e, sb),
    cum AS (SELECT g, e, sb,
                   CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY e, sb) AS BIGINT) AS cum
            FROM buckets),
    tot AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM buckets GROUP BY g),
    targets AS (SELECT g, CAST(q AS DOUBLE) AS q,
                       GREATEST(CAST(1 AS BIGINT),
                                CAST(ceil(CAST(q AS DOUBLE) * n) AS BIGINT)) AS rank,
                       n
                FROM tot CROSS JOIN (VALUES {qvals}) t(q)),
    pick AS (SELECT g, q, rank, n, e, sb FROM (
                 SELECT t.g, t.q, t.rank, t.n, c.e, c.sb,
                        ROW_NUMBER() OVER (PARTITION BY t.g, t.q
                                           ORDER BY c.e, c.sb) AS rn
                 FROM targets t JOIN cum c ON c.g = t.g AND c.cum >= t.rank)
             WHERE rn = 1)
    SELECT g, q, rank,
           CASE WHEN e < 0 THEN CAST(0 AS BIGINT)
                ELSE ((CAST(1 AS BIGINT) << least(e, {s})) + sb)
                     << greatest(e - {s}, 0) END AS est,
           n
    FROM pick ORDER BY g, q
    """
