"""Unigram-LM (SentencePiece-style) tokenizer training and encoding —
Kudo 2018, "Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates": the second tokenizer family
next to BPE (pipeline/bpe.py), learning a PROBABILISTIC piece vocabulary
by EM + pruning instead of greedy merges.

Shape follows the BPE/dictionary contract: the only corpus-scale step is
the caller's one word-count aggregate; training runs on the bounded
distinct-word dictionary. When the dictionary fits the driver (the
common case — ~10⁷-10⁸ distinct words at web scale) the whole loop runs
in-memory with zero Spark jobs per round; past that bound the loop stays
distributed with ONE job per EM/prune round (Arrow-batched Viterbi
E-step over the dictionary, bounded piece-count rows of driver traffic),
forced in tests via ``driver_max_words=0`` and locked piece-for-piece to
the in-driver path.

Algorithm (hard-EM variant of Kudo §3.2, the standard reimplementation):
1. SEED: all substrings of length 1..max_piece_len, freq-weighted; keep
   the top ``seed_size`` by (count desc, piece asc) plus EVERY single
   character (chars are never pruned — any word stays segmentable).
2. EM rounds: Viterbi-segment each dictionary word under current piece
   log-probs (deterministic DP: on score ties the shortest last piece,
   scanned in fixed length order, wins), count pieces freq-weighted,
   re-estimate p(piece) = count/total. Zero-count non-char pieces drop
   (classic Viterbi-EM behavior).
3. PRUNE (Kudo's loss-based step): each multi-char piece's importance is
   Σ_words freq·(best_logp − best_logp_without_piece) over words whose
   best path uses it — the corpus likelihood lost by removing it. Keep
   chars + the most important pieces, shrinking toward ``vocab_size``;
   repeat EM; stop when the vocab fits.

Cross-path exactness: counts are integers; per-word loss deltas quantize
to 1e-6 long units BEFORE the cross-word sum (float sums are partition-
order dependent — the exact-sum idiom), so the distributed and driver
paths agree bit-for-bit; log-probs are computed once per round in the
driver from exact integer counts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _make_viterbi():
    """Self-contained Viterbi segmenter factory (the _make_image_parser
    shipping pattern: the returned closure references nothing from this
    package, so it serializes by value into executor UDFs).

    viterbi(word, logp, max_len, unk, skip=None) -> (pieces, score):
    best-scoring segmentation of ``word`` under piece log-probs
    ``logp``; single characters absent from the vocab fall back to the
    ``unk`` log-prob (every word is always segmentable); ``skip``
    excludes one multi-char piece (the prune step's counterfactual).
    Deterministic: lengths are scanned ascending and only a STRICTLY
    better score replaces, so ties keep the shortest last piece."""

    def viterbi(word, logp, max_len, unk, skip=None):
        n = len(word)
        best = [0.0] + [None] * n
        back = [0] * (n + 1)
        for i in range(1, n + 1):
            b, bl = None, 0
            for ln in range(1, min(max_len, i) + 1):
                piece = word[i - ln : i]
                if piece == skip:
                    continue
                lp = logp.get(piece)
                if lp is None:
                    if ln != 1:
                        continue
                    lp = unk
                prev = best[i - ln]
                if prev is None:
                    continue
                s = prev + lp
                if b is None or s > b:
                    b, bl = s, ln
            best[i] = b
            back[i] = bl
        pieces = []
        i = n
        while i > 0:
            pieces.append(word[i - back[i] : i])
            i -= back[i]
        pieces.reverse()
        return pieces, (best[n] if best[n] is not None else 0.0)

    return viterbi


def _unk_logp(logp: dict[str, float]) -> float:
    """Floor log-prob for out-of-vocab single characters at encode time
    (and a guard during training): 10 nats under the rarest piece."""
    return (min(logp.values()) if logp else 0.0) - 10.0


def _mstep(counts: dict[str, int], chars: set[str]) -> dict[str, float]:
    """Exact-integer M-step: p(piece) = count/total over positive
    counts; zero-count CHARS keep a count of 1 so every word remains
    segmentable (chars are never dropped)."""
    import math

    kept = {p: c for p, c in counts.items() if c > 0 or p in chars}
    for ch in chars:
        kept.setdefault(ch, 0)
    kept = {p: max(c, 1) if p in chars else c for p, c in kept.items()}
    kept = {p: c for p, c in kept.items() if c > 0}
    total = sum(kept.values())
    return {p: math.log(c) - math.log(total) for p, c in kept.items()}


_DELTA_UNITS = 1e6


def _learn_unigram_driver(
    word_freqs: list[tuple[str, int]],
    vocab_size: int,
    seed_size: int,
    max_piece_len: int,
    em_rounds: int,
    shrink: float,
) -> list[tuple[str, float]]:
    """Pure-Python in-memory training loop — the reference semantics the
    distributed path is locked to (tests/test_unigram.py), zero Spark
    jobs. See the module docstring for the algorithm."""
    viterbi = _make_viterbi()

    # 1. seed candidates
    from collections import defaultdict

    sub_counts: dict[str, int] = defaultdict(int)
    chars: set[str] = set()
    for w, f in word_freqs:
        chars.update(w)
        n = len(w)
        for ln in range(1, max_piece_len + 1):
            for s in range(n - ln + 1):
                sub_counts[w[s : s + ln]] += f
    ranked = sorted(sub_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab_counts = dict(ranked[:seed_size])
    for ch in chars:
        vocab_counts.setdefault(ch, sub_counts[ch])
    logp = _mstep(vocab_counts, chars)

    while True:
        for _ in range(em_rounds):
            counts: dict[str, int] = defaultdict(int)
            unk = _unk_logp(logp)
            for w, f in word_freqs:
                pieces, _s = viterbi(w, logp, max_piece_len, unk)
                for p in pieces:
                    counts[p] += f
            logp = _mstep(counts, chars)
        multi = [p for p in logp if len(p) > 1]
        target = max(vocab_size - len({p for p in logp if len(p) == 1}), 0)
        if len(multi) <= target:
            break
        # 3. loss-based prune (deltas quantized to long units)
        unk = _unk_logp(logp)
        importance: dict[str, int] = defaultdict(int)
        for w, f in word_freqs:
            pieces, s = viterbi(w, logp, max_piece_len, unk)
            for p in set(pieces):
                if len(p) == 1:
                    continue
                _alt, s_wo = viterbi(w, logp, max_piece_len, unk, skip=p)
                d = int((s - s_wo) * _DELTA_UNITS + 0.5)  # floor(x+.5), x ≥ 0
                importance[p] += f * d
        keep_n = max(target, int(len(multi) * shrink))
        kept_multi = sorted(
            multi, key=lambda p: (-importance.get(p, 0), p)
        )[:keep_n]
        logp = {p: lp for p, lp in logp.items() if len(p) == 1 or p in set(kept_multi)}
        # renormalize over the surviving set via one more E-step count
        counts = defaultdict(int)
        unk = _unk_logp(logp)
        for w, f in word_freqs:
            pieces, _s = viterbi(w, logp, max_piece_len, unk)
            for p in pieces:
                counts[p] += f
        logp = _mstep(counts, chars)
        if len(multi) <= keep_n:  # no shrink progress → stop
            break
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def _piece_counts_udf(logp: dict[str, float], max_piece_len: int):
    """array<string> of Viterbi pieces per word (vocab in the closure,
    bounded by seed_size)."""
    viterbi = _make_viterbi()
    unk = _unk_logp(logp)

    @pandas_udf("array<string>")
    def seg(words: pd.Series) -> pd.Series:
        return words.map(lambda w: viterbi(w, logp, max_piece_len, unk)[0])

    return seg


def _piece_loss_udf(logp: dict[str, float], max_piece_len: int):
    """array<struct<piece:string, du:long>> — per-word quantized loss
    delta for each DISTINCT multi-char piece on the word's best path."""
    viterbi = _make_viterbi()
    unk = _unk_logp(logp)

    @pandas_udf("array<struct<piece:string, du:long>>")
    def loss(words: pd.Series) -> pd.Series:
        def per_word(w):
            pieces, s = viterbi(w, logp, max_piece_len, unk)
            out = []
            for p in set(pieces):
                if len(p) == 1:
                    continue
                _alt, s_wo = viterbi(w, logp, max_piece_len, unk, skip=p)
                out.append({"piece": p, "du": int((s - s_wo) * _DELTA_UNITS + 0.5)})
            return out

        return words.map(per_word)

    return loss


def learn_unigram(
    words: DataFrame,
    vocab_size: int = 64,
    seed_size: int = 512,
    max_piece_len: int = 5,
    em_rounds: int = 2,
    shrink: float = 0.75,
    driver_max_words: int = 5_000_000,
) -> list[tuple[str, float]]:
    """Learn a unigram-LM piece vocabulary from a (word, freq)
    dictionary; returns [(piece, logp)] sorted (logp desc, piece).

    Job-count bound (the BPE rationale, bpe.py::learn_bpe): the
    dictionary is bounded independent of corpus size, so under
    ``driver_max_words`` the loop runs in-memory with zero jobs.
    The distributed fallback costs ONE job per EM round and TWO per
    prune round (loss pass + renormalizing E-step), each an
    Arrow-batched Viterbi over the dictionary followed by an exploded
    integer aggregate — bounded-vocab rows back to the driver, never
    word rows."""
    n = words.count()
    if n <= driver_max_words:
        collected = [
            (r["word"], int(r["freq"])) for r in words.select("word", "freq").collect()
        ]
        return _learn_unigram_driver(
            collected, vocab_size, seed_size, max_piece_len, em_rounds, shrink
        )

    from collections import defaultdict

    # distributed seed: one union of max_piece_len substring legs, each
    # a codegen'd explode of start positions + substring — no HOF
    # lambdas (CLAUDE.md), no Python
    base = words.select("word", "freq", F.length("word").alias("_n"))
    legs = []
    for ln in range(1, max_piece_len + 1):
        legs.append(
            base.filter(F.col("_n") >= ln)
            .select(
                F.explode(F.sequence(F.lit(1), F.col("_n") - F.lit(ln - 1))).alias("_s"),
                "word",
                "freq",
            )
            .select(F.expr(f"substring(word, _s, {ln})").alias("piece"), F.col("freq"))
        )
    allsubs = legs[0]
    for leg in legs[1:]:
        allsubs = allsubs.unionByName(leg)
    # two consumers (top-K + char floor) — persist or the 5-leg union
    # re-scans the dictionary (the multi-consumer rule, CLAUDE.md)
    from pyspark.storagelevel import StorageLevel

    sub_counts_df = (
        allsubs.groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    top = sub_counts_df.orderBy(F.col("cnt").desc(), "piece").limit(seed_size).collect()
    char_rows = sub_counts_df.filter(F.length("piece") == 1).collect()
    sub_counts_df.unpersist()
    chars = {r["piece"] for r in char_rows}
    vocab_counts = {r["piece"]: int(r["cnt"]) for r in top}
    for r in char_rows:
        vocab_counts.setdefault(r["piece"], int(r["cnt"]))
    logp = _mstep(vocab_counts, chars)

    dict_df = words.select("word", "freq").localCheckpoint(eager=False)

    def e_counts(cur: dict[str, float]) -> dict[str, int]:
        seg = _piece_counts_udf(cur, max_piece_len)
        rows = (
            dict_df.select(F.explode(seg(F.col("word"))).alias("piece"), "freq")
            .groupBy("piece")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .collect()
        )
        return {r["piece"]: int(r["cnt"]) for r in rows}

    while True:
        for _ in range(em_rounds):
            logp = _mstep(e_counts(logp), chars)
        multi = [p for p in logp if len(p) > 1]
        target = max(vocab_size - len({p for p in logp if len(p) == 1}), 0)
        if len(multi) <= target:
            break
        loss = _piece_loss_udf(logp, max_piece_len)
        rows = (
            dict_df.select(F.explode(loss(F.col("word"))).alias("_e"), "freq")
            .select(F.col("_e.piece").alias("piece"), (F.col("_e.du") * F.col("freq")).alias("wdu"))
            .groupBy("piece")
            .agg(F.sum("wdu").cast("long").alias("imp"))
            .collect()
        )
        importance = {r["piece"]: int(r["imp"]) for r in rows}
        keep_n = max(target, int(len(multi) * shrink))
        kept_multi = sorted(multi, key=lambda p: (-importance.get(p, 0), p))[:keep_n]
        logp = {p: lp for p, lp in logp.items() if len(p) == 1 or p in set(kept_multi)}
        logp = _mstep(e_counts(logp), chars)
        if len(multi) <= keep_n:
            break
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def encode_unigram(
    dictionary: DataFrame, pieces: list[tuple[str, float]], word_col: str = "word"
) -> DataFrame:
    """(word, pieces array<string>): Viterbi-encode every DISTINCT word
    under the trained vocabulary (bounded table in the UDF closure);
    callers join back to the corpus by word — the BPE encode_words
    contract."""
    logp = dict(pieces)
    max_len = max((len(p) for p in logp), default=1)
    seg = _piece_counts_udf(logp, max_len)
    return dictionary.select(
        F.col(word_col).alias("word"), seg(F.col(word_col)).alias("pieces")
    )
