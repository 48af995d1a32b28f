"""Distributed WordPiece tokenizer training and encoding (Schuster &
Nakajima 2012; the BERT tokenizer family) — the third tokenizer next to
BPE (pipeline/bpe.py) and the unigram LM (pipeline/unigram.py).

WordPiece differs from BPE in exactly two public ways:
1. TRAINING picks the merge maximizing LIKELIHOOD GAIN, scored as
   count(ab) / (count(a)·count(b)) — pair frequency normalized by its
   parts — instead of raw pair count;
2. ENCODING is greedy longest-match-first against the final vocabulary
   (continuation pieces carry the ``##`` prefix; a position with no
   match makes the whole word ``[UNK]``) instead of merge-rank replay.

Shape follows the BPE/dictionary contract: the only corpus-scale step
is the caller's word-count aggregate; under ``driver_max_words`` the
merge loop runs in-memory with zero Spark jobs (argmax via a
lazy-invalidation heap — a merge changes the SCORE of every pair
touching either merged symbol, not just the touched pairs as in BPE,
so a symbol→pairs index drives the re-pushes); past the bound the
distributed loop costs two jobs per merge (pair counts + the
score-join argmax row). Both paths are locked to a pure-Python
reference in tests/test_wordpiece.py (the Sennrich-lock precedent).

Scores are IEEE doubles of exact integer counts — the same division on
identical ints in every path, so determinism holds without rational
arithmetic; ties break (left, right) like BPE.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

CONT = "##"
UNK = "[UNK]"


def _merged_symbol(left: str, right: str) -> str:
    """Merge result: the continuation marker survives only from the
    LEFT part ('##a' + '##b' -> '##ab'; 'a' + '##b' -> 'ab')."""
    return left + (right[len(CONT):] if right.startswith(CONT) else right)


def word_symbols(word_col) -> "F.Column":
    """Initial WordPiece symbols of a word: first char bare, every
    following char ##-prefixed. The transform() here is an interpreted
    HOF but runs ONCE on the bounded dictionary to build round-0 state
    (then checkpointed) — never per merge round, which is where the
    CLAUDE.md hot-path rule bites."""
    chars = F.split(word_col, "")
    return F.concat(
        F.slice(chars, 1, 1),
        F.transform(F.slice(chars, 2, 1_000_000), lambda c: F.concat(F.lit(CONT), c)),
    )


def _learn_wordpiece_driver(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str, float]]:
    """In-memory incremental WordPiece loop (zero Spark jobs): exact
    freq-weighted pair counts AND per-symbol occurrence counts; merge
    argmax on score = c(ab)/(c(a)·c(b)) with the (score desc, left,
    right) tie-break, via a lazy-invalidation max-heap. Unlike BPE, a
    merge shifts the score of EVERY pair containing either merged
    symbol (their c(a)/c(b) denominators change), so a symbol→pairs
    index re-pushes all affected entries; a popped entry is valid iff
    its score equals the CURRENT score (stale-high discards; a
    stale-low entry is shadowed by the fresher, larger push)."""
    import heapq
    from collections import defaultdict

    vocab: list[tuple[list[str], int]] = []
    for w, f in word_freqs:
        if not w:
            continue
        vocab.append(([w[0]] + [CONT + c for c in w[1:]], int(f)))
    stats: dict[tuple[str, str], int] = defaultdict(int)
    sym: dict[str, int] = defaultdict(int)
    indices: dict[tuple[str, str], set[int]] = defaultdict(set)
    pairs_by_symbol: dict[str, set[tuple[str, str]]] = defaultdict(set)
    for wi, (seq, freq) in enumerate(vocab):
        for s in seq:
            sym[s] += freq
        for i in range(len(seq) - 1):
            p = (seq[i], seq[i + 1])
            stats[p] += freq
            indices[p].add(wi)
            pairs_by_symbol[p[0]].add(p)
            pairs_by_symbol[p[1]].add(p)

    def score(p):
        c = stats.get(p, 0)
        if c <= 0:
            return None
        # (c / la) / lb, NOT c / (la*lb): the count product overflows
        # int64 at web scale (~1e14 symbol counts → 1e28 product); the
        # two-division form is overflow-free and the distributed path
        # computes the identical IEEE sequence
        return (c / sym[p[0]]) / sym[p[1]]

    heap: list[tuple[float, str, str]] = [
        (-score(p), p[0], p[1]) for p in stats if stats[p] > 0
    ]
    heapq.heapify(heap)
    merges: list[tuple[str, str, float]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negs, hl, hr = heap[0]
            cur = score((hl, hr))
            if cur is not None and cur == -negs:
                best = ((hl, hr), cur)
                break
            heapq.heappop(heap)
        if best is None:
            break
        (left, right), sc = best
        merges.append((left, right, sc))
        merged = _merged_symbol(left, right)
        touched_pairs: set[tuple[str, str]] = set()
        for wi in list(indices[(left, right)]):
            seq, freq = vocab[wi]
            for s in seq:
                sym[s] -= freq
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                stats[p] -= freq
                indices[p].discard(wi)
                touched_pairs.add(p)
            out, i, n = [], 0, len(seq)
            while i < n:
                if i + 1 < n and seq[i] == left and seq[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            vocab[wi] = (out, freq)
            for s in out:
                sym[s] += freq
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                stats[p] += freq
                indices[p].add(wi)
                pairs_by_symbol[p[0]].add(p)
                pairs_by_symbol[p[1]].add(p)
                touched_pairs.add(p)
        # scores moved for every pair touching a symbol whose count
        # changed — the merged parts and the merge result
        for s in (left, right, merged):
            touched_pairs |= pairs_by_symbol.get(s, set())
        for p in touched_pairs:
            sc2 = score(p)
            if sc2 is not None:
                heapq.heappush(heap, (-sc2, p[0], p[1]))
    return merges


def _merge_pair_udf(left: str, right: str):
    """Greedy left-to-right merge of one adjacent pair with WordPiece
    continuation-marker semantics (closure-self-contained)."""
    merged = left + (right[2:] if right.startswith("##") else right)

    @pandas_udf("array<string>")
    def merge_pair(symbols: pd.Series) -> pd.Series:
        def apply(seq):
            out, i, n = [], 0, len(seq)
            while i < n:
                if i + 1 < n and seq[i] == left and seq[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            return out

        return symbols.map(apply)

    return merge_pair


def learn_wordpiece(
    words: DataFrame,
    num_merges: int,
    rows_per_partition: int = 65536,
    driver_max_words: int = 5_000_000,
) -> list[tuple[str, str, float]]:
    """Learn ``num_merges`` WordPiece merges from a (word, freq)
    dictionary; returns [(left, right, score)] in merge order.

    Distributed fallback (forced in tests via ``driver_max_words=0``):
    per round, ONE pair-count + symbol-count job feeding a score join
    (pair counts joined to both symbols' counts — two broadcast-sized
    joins over the bounded symbol table) and a TakeOrdered-1 argmax by
    (score desc, left, right); merge application is the adjacency-
    prefiltered Arrow UDF with per-round lazy localCheckpoints — the
    BPE loop discipline (bpe.py::learn_bpe)."""
    n = words.count()
    if n <= driver_max_words:
        collected = [
            (r["word"], int(r["freq"])) for r in words.select("word", "freq").collect()
        ]
        return _learn_wordpiece_driver(collected, num_merges)
    parts = max(1, -(-n // rows_per_partition))
    vocab = (
        words.filter(F.length("word") >= 1)
        .select(word_symbols(F.col("word")).alias("symbols"), F.col("freq"))
        .repartition(parts)
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str, float]] = []
    for _ in range(num_merges):
        sym_col = F.col("symbols")
        exploded = vocab.select(
            F.posexplode(sym_col).alias("_p", "l"), sym_col.alias("_s"), F.col("freq")
        ).persist()
        pairs = (
            exploded.withColumn("r", F.try_element_at(F.col("_s"), F.col("_p") + 2))
            .filter(F.col("r").isNotNull())
            .groupBy("l", "r")
            .agg(F.sum("freq").alias("cnt"))
        )
        syms = exploded.groupBy(F.col("l").alias("s")).agg(F.sum("freq").alias("sc"))
        scored = (
            pairs.join(F.broadcast(syms.select(F.col("s").alias("l"), F.col("sc").alias("cl"))), "l")
            .join(F.broadcast(syms.select(F.col("s").alias("r"), F.col("sc").alias("cr"))), "r")
            .select(
                "l",
                "r",
                # (cnt/cl)/cr — the driver path's overflow-free IEEE
                # sequence, bit-identical cross-path
                (
                    F.col("cnt").cast("double")
                    / F.col("cl").cast("double")
                    / F.col("cr").cast("double")
                ).alias("score"),
            )
        )
        top = scored.orderBy(F.col("score").desc(), "l", "r").limit(1).collect()
        exploded.unpersist()
        if not top:
            break
        left, right, sc = top[0]["l"], top[0]["r"], float(top[0]["score"])
        merges.append((left, right, sc))
        sep = "\x1f"
        joined = F.concat_ws(sep, F.col("symbols"))
        has = joined.contains(sep + left + sep + right + sep) | joined.startswith(
            left + sep + right + sep
        ) | joined.endswith(sep + left + sep + right) | (joined == left + sep + right)
        mp = _merge_pair_udf(left, right)
        vocab = vocab.select(
            F.when(has, mp(F.col("symbols"))).otherwise(F.col("symbols")).alias("symbols"),
            F.col("freq"),
        ).localCheckpoint(eager=False)
    return merges


def vocab_from_merges(
    word_freqs_chars: set[str], merges: list[tuple[str, str, float]]
) -> set[str]:
    """Final WordPiece vocabulary: every initial symbol (first chars
    bare + ##-continuations) plus each merge's output symbol."""
    vocab = set(word_freqs_chars)
    for left, right, *_ in merges:
        vocab.add(_merged_symbol(left, right))
    return vocab


def initial_symbols(words: list[str]) -> set[str]:
    out: set[str] = set()
    for w in words:
        if not w:
            continue
        out.add(w[0])
        out.update(CONT + c for c in w[1:])
    return out


def _encode_udf(vocab: set[str]):
    """Greedy longest-match-first WordPiece encoding (BERT semantics):
    at each position take the longest vocab match (##-prefixed past
    position 0); no match anywhere -> the whole word is [UNK]."""
    vocab_l = set(vocab)
    cont = CONT
    unk = UNK

    @pandas_udf("array<string>")
    def encode(words: pd.Series) -> pd.Series:
        def apply(w):
            if not w:
                return []
            out, i, n = [], 0, len(w)
            while i < n:
                end = n
                piece = None
                while end > i:
                    cand = w[i:end] if i == 0 else cont + w[i:end]
                    if cand in vocab_l:
                        piece = cand
                        break
                    end -= 1
                if piece is None:
                    return [unk]
                out.append(piece)
                i = end
            return out

        return words.map(apply)

    return encode


def encode_words(
    dictionary: DataFrame, vocab: set[str], word_col: str = "word"
) -> DataFrame:
    """(word, pieces array<string>) for every distinct word — encode the
    DICTIONARY once; callers join back to the corpus by word (the BPE
    encode_words contract)."""
    enc = _encode_udf(vocab)
    return dictionary.select(
        F.col(word_col).alias("word"), enc(F.col(word_col)).alias("pieces")
    )
