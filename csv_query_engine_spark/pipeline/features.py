"""Feature-hashing (hashing-trick) vectorization of text.

The classic fixed-width featurizer for ML over unbounded vocabularies:
token t contributes sign(t) ∈ {−1, +1} to feature index h(t) mod d —
no vocabulary dictionary to build, broadcast, or keep consistent across
a 100 TB corpus, and collisions are unbiased in expectation because of
the sign hash (Weinberger et al., ICML 2009).

Implementation is the repo's cross-engine md5 recipe
(pipeline/sampling.py): index and sign come from the first 8 hex chars
of salted md5 digests, so DuckDB reproduces the vectors bit-for-bit and
the operator is oracle-checkable — unlike xxhash64, which has no ANSI
twin.  Values are signed integer counts: no floating point anywhere.

Plan shape: one token explode → ONE partial+final aggregation on
(id, feature) → a second tiny conditional-sum aggregation over the
≤ d rows per document that widens to scalar f0..f{d-1} columns (scalar
columns because driver-side canonicalizers can't hash array cells; the
d-column agg runs over the pre-aggregated table, NOT the exploded
tokens — the 64-agg-columns-over-the-fact trap documented in CLAUDE.md
does not apply at that size)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csv_query_engine_spark.pipeline.common import spread as _spread
from csv_query_engine_spark.pipeline.text import tokens


def _hash32(col, salt: str):
    hex8 = F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 8)
    return F.conv(hex8, 16, 10).cast("long")


def feature_hash_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 8,
    salt: str = "fh-",
) -> DataFrame:
    """One row per document: `id_col`, n_tokens, and f0..f{d-1} signed
    hashed-count features (bigint).  ONE md5 per token: the low bit is
    the sign, the remaining 31 bits the feature index — independent
    bits of the same digest, half the hash cost of a second salted
    digest (the per-token hash IS the hot-path cost here)."""
    tok = (
        _spread(df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks")))
        .select("id", F.explode("_toks").alias("_t"))
        .filter(F.col("_t") != "")
    )
    # materialize the digest once; the two consumers below then read a
    # plain column (the repo's materialize-before-reuse rule)
    hashed = tok.select("id", _hash32(F.col("_t"), salt).alias("_h")).select(
        "id",
        (F.shiftright(F.col("_h"), 1) % n_features).alias("_f"),
        F.when(F.col("_h") % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("_s"),
    )
    narrow = hashed.groupBy("id", "_f").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_s").alias("_v")
    )
    wide = narrow.groupBy("id").agg(
        F.sum("_n").cast("bigint").alias("n_tokens"),
        *[
            F.coalesce(
                F.sum(F.when(F.col("_f") == k, F.col("_v"))), F.lit(0)
            )
            .cast("bigint")
            .alias(f"f{k}")
            for k in range(n_features)
        ],
    )
    return wide.withColumnRenamed("id", id_col)


def sql_feature_hash(
    table: str,
    sql_toks: str,
    id_col: str = "doc_id",
    n_features: int = 8,
    salt: str = "fh-",
) -> str:
    """DuckDB twin of :func:`feature_hash_vectors` over `table` whose
    tokens come from the `sql_toks` expression (same single digest,
    same low-bit sign / high-bits index split)."""
    h = f"CAST('0x' || substring(md5('{salt}' || t), 1, 8) AS BIGINT)"
    feats = ",\n           ".join(
        f"CAST(COALESCE(SUM(CASE WHEN _f = {k} THEN _s END), 0) AS BIGINT) AS f{k}"
        for k in range(n_features)
    )
    return f"""
    WITH tok AS (
        SELECT id, t FROM (
            SELECT {id_col} AS id, unnest({sql_toks}) AS t FROM {table}
        ) WHERE t <> ''
    ),
    hashed AS (
        SELECT id, (_h >> 1) % {n_features} AS _f,
               CASE WHEN _h % 2 = 0 THEN 1 ELSE -1 END AS _s
        FROM (SELECT id, {h} AS _h FROM tok)
    )
    SELECT id AS {id_col}, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           {feats}
    FROM hashed GROUP BY id ORDER BY {id_col}
    """


# ----------------------------------- linear quality classifier scoring

def default_quality_weights(n_features: int = 8, salt: str = "qw-") -> list[float]:
    """Deterministic hash-derived weight vector in [-1, 1): the fixed
    stand-in for trained fastText-style classifier weights, so the
    scoring operator is reproducible AND oracle-pairable (a real
    deployment passes its trained weights instead — the plan is
    identical; only the literals change)."""
    import hashlib

    return [
        int.from_bytes(hashlib.md5(f"{salt}{k}".encode()).digest()[:4], "big")
        / float(1 << 31)
        - 1.0
        for k in range(n_features)
    ]


def linear_quality_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 8,
    weights: list[float] | None = None,
    bias: float = 0.0,
    threshold: float = 0.5,
    salt: str = "fh-",
) -> DataFrame:
    """fastText-style LEARNED quality gate (Joulin et al. 2016; the
    GPT-3/CCNet data-filtering recipe): sigmoid(w · x + b) over the
    hashing-trick features, where x_k = f_k / n_tokens (length-
    normalized signed counts). Output: (id_col, n_tokens, logit,
    quality_score, pass_gate 0/1), one row per doc with ≥1 token.

    Contrast with the rule-based Gopher path (pipeline/text.py::
    quality_filter): the rules encode fixed editorial heuristics
    (length/punct/stopword bounds); this is the trained-classifier
    shape — any linear model over hashed features ships as ONE
    broadcast-free expression (the weights are plan literals, the dot
    product is d codegen'd multiply-adds per row, no Python, no join,
    no shuffle beyond the feature aggregation itself).

    Determinism: the weighted sum accumulates left-to-right in a fixed
    order (pure IEEE, same in the DuckDB twin); the logit is
    FLOOR-quantized BEFORE the sigmoid so both engines exponentiate the
    identical double, and the score is FLOOR-quantized after (the
    kneser_ney pre-rounded-transcendental precedent); weight literals
    are emitted as Python-computed reprs (decimal hazard, CLAUDE.md)."""
    w = list(weights) if weights is not None else default_quality_weights(n_features)
    if len(w) != n_features:
        raise ValueError(f"need {n_features} weights, got {len(w)}")
    vecs = feature_hash_vectors(df, id_col, text_col, n_features, salt)
    nt = F.col("n_tokens").cast("double")
    z = F.lit(float(bias))
    for k, wk in enumerate(w):
        z = z + F.lit(float(wk)) * (F.col(f"f{k}").cast("double") / nt)
    zq = F.floor(z * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit")))
    score = F.floor(sig * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return (
        vecs.select(id_col, "n_tokens", zq.alias("logit"))
        .select(
            id_col,
            "n_tokens",
            "logit",
            score.alias("quality_score"),
        )
        .withColumn(
            "pass_gate",
            F.when(F.col("quality_score") >= F.lit(float(threshold)), 1)
            .otherwise(0)
            .cast("int"),
        )
    )


# ------------------------- DSIR importance weights (data selection)

def dsir_importance_weights(
    df: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    salt: str = "dsir-",
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al., NeurIPS
    2023): score every POOL document by how much more likely its hashed
    n-gram features are under the TARGET distribution than under the
    pool's own — log w(d) = Σ_b n_{d,b} · (ln p̂_target[b] − ln p̂_pool[b])
    over hashed unigram+bigram bucket counts with add-1 smoothing.
    `target_pred` is a boolean Column naming the exemplar set (e.g.
    ``F.col("lang") == "en"``); every other document is pool.  Output:
    one row per pool document with ≥1 token — (id_col, n_feats BIGINT,
    dsir_logweight DOUBLE).

    Scale: one gram explode → ONE (bucket) aggregation of size ≤
    n_buckets (driver/broadcast-sized by construction — that is the
    hashing trick's point) → per-doc counts joined against the
    BROADCAST log-ratio table → one integer dot-product aggregation.
    No vocabulary state, no driver loop; the gram explode is persisted
    once for its two consumers (bucket totals + per-doc counts).

    Determinism: buckets come from the cross-engine md5 recipe
    (sampling.py), and the per-bucket log-ratio is ONE ln of a ratio of
    exact integers — (T_b+1)(P_tot+B) / (P_b+1)(T_tot+B) — FLOOR-
    quantized to 1e-6 units BEFORE the per-doc sum, so document weights
    are exact integer arithmetic in any partition order (the quantize-
    before-cross-row-sum invariant).  The integer products stay inside
    long range while count_grams(target)·(count_grams(pool)+B) <
    9.2e18; past that envelope switch the ratio to double division
    before the ln (one extra 0.5-ulp, same FLOOR form).
    Cache lifetime is CALLER-OWNED — wrap the call in
    ``pipeline.cache_scope(spark)`` to release the persisted
    intermediates on exit (the one library-wide convention)."""
    base = _spread(
        df.select(
            F.col(id_col).alias("id"),
            F.coalesce(target_pred, F.lit(False)).alias("is_t"),
            tokens(F.col(text_col)).alias("toks"),
        )
    )
    uni = base.select("id", "is_t", F.explode("toks").alias("g")).filter(F.col("g") != "")
    # bigram rows: explode the position index, build the gram with
    # codegen'd get/concat_ws (the _ngram_rows pattern — HOF-free)
    cnt = F.size("toks") - F.lit(1)
    idx = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)).otherwise(F.array().cast("array<int>"))
    big = base.select("id", "is_t", "toks", F.explode(idx).alias("i")).select(
        "id",
        "is_t",
        F.concat_ws(" ", F.get("toks", F.col("i") - 1), F.get("toks", F.col("i"))).alias("g"),
    )
    feats = (
        uni.unionByName(big)
        .select("id", "is_t", (_hash32(F.col("g"), salt) % n_buckets).alias("b"))
        .persist()
    )
    bc = feats.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).cast("long").alias("tb"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).cast("long").alias("pb"),
    )
    tot = bc.agg(F.sum("tb").alias("tt"), F.sum("pb").alias("pt"))
    bl = F.lit(int(n_buckets)).cast("long")
    lr = bc.crossJoin(F.broadcast(tot)).select(  # 1-row broadcast, not cartesian
        "b",
        F.floor(
            F.log(
                ((F.col("tb") + 1) * (F.col("pt") + bl)).cast("double")
                / ((F.col("pb") + 1) * (F.col("tt") + bl)).cast("double")
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("u"),
    )
    docb = feats.filter(~F.col("is_t")).groupBy("id", "b").agg(F.count(F.lit(1)).alias("n"))
    return (
        docb.join(F.broadcast(lr), "b")  # lr has ≤ n_buckets rows
        .groupBy("id")
        .agg(
            F.sum("n").cast("bigint").alias("n_feats"),
            F.sum(F.col("n") * F.col("u")).alias("_units"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_feats",
            (F.col("_units").cast("double") / F.lit(1e6)).alias("dsir_logweight"),
        )
    )


def sql_dsir_importance(
    table: str,
    sql_toks: str,
    target_pred_sql: str,
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    salt: str = "dsir-",
) -> str:
    """DuckDB twin of :func:`dsir_importance_weights`: same md5
    bucketing, same single-ln integer-ratio log-ratio, same FLOOR
    quantization, same integer dot product."""
    h = f"CAST('0x' || substring(md5('{salt}' || g), 1, 8) AS BIGINT) % {n_buckets}"
    return f"""
    WITH tok AS (
        SELECT id, is_t, pos, t FROM (
            SELECT id, is_t,
                   generate_subscripts(toks, 1) AS pos,
                   unnest(toks) AS t
            FROM (SELECT {id_col} AS id,
                         COALESCE({target_pred_sql}, FALSE) AS is_t,
                         {sql_toks} AS toks
                  FROM {table})
        ) WHERE t <> ''
    ),
    grams AS (
        SELECT id, is_t, t AS g FROM tok
        UNION ALL
        SELECT a.id, a.is_t, a.t || ' ' || b.t AS g
        FROM tok a JOIN tok b ON a.id = b.id AND b.pos = a.pos + 1
    ),
    feats AS (SELECT id, is_t, {h} AS b FROM grams),
    bc AS (
        SELECT b,
               CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS tb,
               CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS pb
        FROM feats GROUP BY b
    ),
    tot AS (SELECT SUM(tb) AS tt, SUM(pb) AS pt FROM bc),
    lr AS (
        SELECT b,
               CAST(FLOOR(ln(CAST((tb + 1) * (pt + {n_buckets}) AS DOUBLE)
                             / CAST((pb + 1) * (tt + {n_buckets}) AS DOUBLE))
                          * 1e6 + 0.5) AS BIGINT) AS u
        FROM bc, tot
    ),
    docb AS (
        SELECT id, b, COUNT(*) AS n FROM feats WHERE NOT is_t GROUP BY id, b
    )
    SELECT id AS {id_col},
           CAST(SUM(n) AS BIGINT) AS n_feats,
           CAST(SUM(n * u) AS DOUBLE) / 1e6 AS dsir_logweight
    FROM docb JOIN lr USING (b)
    GROUP BY id
    """


def sql_linear_quality(
    table: str,
    sql_toks: str,
    id_col: str = "doc_id",
    n_features: int = 8,
    weights: list[float] | None = None,
    bias: float = 0.0,
    threshold: float = 0.5,
    salt: str = "fh-",
) -> str:
    """DuckDB twin of :func:`linear_quality_scores`: the feature-hash
    twin as a CTE, then the identical left-associated weighted sum,
    FLOOR-quantized logit, sigmoid, and gate."""
    w = list(weights) if weights is not None else default_quality_weights(n_features)
    fv = sql_feature_hash(table, sql_toks, id_col, n_features, salt)
    terms = " + ".join(
        f"CAST({wk!r} AS DOUBLE) * (CAST(f{k} AS DOUBLE) / CAST(n_tokens AS DOUBLE))"
        for k, wk in enumerate(w)
    )
    return f"""
    WITH fv AS ({fv}),
    zt AS (
        SELECT {id_col}, n_tokens,
               FLOOR((CAST({float(bias)!r} AS DOUBLE) + {terms}) * 1e6 + 0.5) / 1e6 AS logit
        FROM fv
    )
    SELECT {id_col}, n_tokens, logit,
           FLOOR(1.0 / (1.0 + exp(-logit)) * 1e6 + 0.5) / 1e6 AS quality_score,
           CAST(CASE WHEN FLOOR(1.0 / (1.0 + exp(-logit)) * 1e6 + 0.5) / 1e6
                          >= CAST({float(threshold)!r} AS DOUBLE)
                     THEN 1 ELSE 0 END AS INTEGER) AS pass_gate
    FROM zt ORDER BY {id_col}
    """
