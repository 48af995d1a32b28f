"""Text analysis operators — language ID, quality scoring, token
counting, fingerprinting (SURVEY.md §7 phase 6).

Everything here is built from ``pyspark.sql.functions`` so it runs
JVM-side inside whole-stage codegen — no Python in the hot path. Each
operator has a DuckDB-SQL twin in queries/pipeline_q.py; arithmetic is
integer-ratio based so results are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small fixed stopword sets (public, standard lists truncated for the
# n-gram/stopword heuristics; order matters only for documentation).
STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on", "with", "as", "at", "by")
STOPWORDS_ES = ("el", "la", "los", "las", "de", "y", "o", "en", "es", "un", "una", "por", "con", "para", "del")
STOPWORDS_DE = ("der", "die", "das", "und", "oder", "von", "zu", "im", "ist", "ein", "eine", "mit", "auf", "den")
STOPWORDS_FR = ("le", "la", "les", "de", "et", "ou", "en", "est", "un", "une", "pour", "avec", "dans", "sur", "du")


def normalize_text(col: Column) -> Column:
    """Canonical text form: lowercase, strip non-alphanumerics, collapse
    whitespace — the shared first step of fingerprinting and dedup."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-flavored token estimate: alpha runs, digit runs, and each
    punctuation mark count as separate tokens (a cheap proxy for
    subword tokenizers used to budget LLM training tokens)."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), 0))


def punct_ratio(col: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    total = F.length(col)
    punct = total - F.length(F.regexp_replace(col, "[^a-zA-Z0-9\\s]", ""))
    return F.when(total > 0, punct.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def alpha_ratio(col: Column) -> Column:
    total = F.length(col)
    alpha = F.length(F.regexp_replace(col, "[^a-zA-Z]", ""))
    return F.when(total > 0, alpha.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def stopword_hits(col: Column, stopwords: tuple[str, ...]) -> Column:
    """Number of tokens that are in the given stopword set."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t)))


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    n = token_count(col)
    return F.when(n > 0, stopword_hits(col, stopwords).cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_token_len(col: Column) -> Column:
    t = tokens(col)
    n = F.size(t)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite document quality in [0,1]: favors texts with a sane
    length, low punctuation noise, some stopwords (fluent prose), and
    plausible mean word length. Deterministic double arithmetic only —
    mirrored exactly by the SQL oracle."""
    n_tok = token_count(col).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(col) * F.lit(4.0), F.lit(1.0))
    sw_score = F.least(stopword_ratio(col) * F.lit(4.0), F.lit(1.0))
    mtl = mean_token_len(col)
    wordlen_score = F.when((mtl >= 3.0) & (mtl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_score * F.lit(0.3) + punct_score * F.lit(0.3) + sw_score * F.lit(0.2) + wordlen_score * F.lit(0.2))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: CJK characters -> 'zh'; otherwise the
    language whose stopword set hits the most tokens (ties broken
    en > es > de > fr); no hits at all -> 'unknown'."""
    cjk = F.length(F.regexp_replace(col, "[^\\u4e00-\\u9fff]", ""))
    en = stopword_hits(col, STOPWORDS_EN)
    es = stopword_hits(col, STOPWORDS_ES)
    de = stopword_hits(col, STOPWORDS_DE)
    fr = stopword_hits(col, STOPWORDS_FR)
    best = F.greatest(en, es, de, fr)
    return (
        F.when(cjk > 0, F.lit("zh"))
        .when(best == 0, F.lit("unknown"))
        .when(en == best, F.lit("en"))
        .when(es == best, F.lit("es"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    md5 is identical across engines, so fingerprint-based dedup is
    oracle-checkable (unlike engine-specific hash functions)."""
    return F.md5(normalize_text(col))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the full stat column set to a documents frame."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        alpha_ratio(c).alias("alpha_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        mean_token_len(c).alias("mean_token_len"),
        quality_score(c).alias("quality_score"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 5,
) -> DataFrame:
    """Top-K terms per document by tf·idf (idf = ln(N/df), round 6).

    Scale: term frequencies are one shuffle on (doc, term); document
    frequencies one shuffle on term (bounded by vocabulary size, with
    map-side partial aggregation absorbing the stopword skew); the
    corpus size N joins in as a broadcast scalar — no driver collect,
    no global window.
    """
    from pyspark.sql import Window as W

    toks = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks"))
    terms = toks.select("id", F.explode("_toks").alias("term")).filter(F.col("term") != "")
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfq"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    w = W.partitionBy("id").orderBy(F.desc("tfidf"), "term")
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("dfq").cast("double")), 6),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(F.col("id").alias(id_col), "term", "tfidf", "rank")
    )


ROLLING_HASH_BASE = 31
ROLLING_HASH_MOD = 2147483647  # 2^31 - 1 (Mersenne); products stay < 2^36, ANSI-safe
ROLLING_HASH_SEED = 7


def rolling_fingerprint(norm_col: Column) -> Column:
    """Polynomial rolling hash (Rabin-Karp fold) of a *materialized*
    normalized-text column: fold(acc*31 + charcode mod 2^31-1) over the
    characters in order. Unlike the md5 fingerprint this is incremental
    — the engine-side primitive a rolling/windowed content hash builds
    on. Per-step modulus keeps every intermediate < 2^36, so ANSI-mode
    arithmetic never overflows. Pure built-ins (sequence + aggregate).

    Empty text is special-cased to the bare seed: Spark's
    sequence(1, 0) yields the DESCENDING array [1, 0] (not an empty
    array like DuckDB/Postgres range), which would fold two phantom
    zero-codes into the hash and diverge from the SQL oracle."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(norm_col)),
        lambda i: F.ascii(F.substring(norm_col, i, 1)).cast("long"),
    )
    folded = F.aggregate(
        codes,
        F.lit(ROLLING_HASH_SEED).cast("long"),
        lambda acc, c: F.pmod(acc * F.lit(ROLLING_HASH_BASE) + c, F.lit(ROLLING_HASH_MOD)),
    )
    # NULL length makes the predicate NULL -> otherwise branch -> NULL
    # (null-in-null-out, matching the SQL twin).
    return F.when(F.length(norm_col) < 1, F.lit(ROLLING_HASH_SEED).cast("long")).otherwise(folded)
