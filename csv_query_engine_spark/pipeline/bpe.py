"""Distributed BPE tokenizer training and encoding (Sennrich et al.
2016; greedy lowest-rank merge encoding as in GPT-2's tokenizer).

The tokenizer-training half of an LLM data pipeline: learn a merge
table from corpus statistics, then encode documents with it.  Both
halves follow the dictionary contract (pipeline/fuzzy.py): the only
corpus-scale step is ONE word-count aggregate; everything iterative
runs on the distinct-word table weighted by frequency, which is what
makes 100 TB feasible — web-scale corpora have ~10⁷-10⁸ distinct
words.  When the dictionary fits the driver (the common case) the merge
loop itself runs in-memory with ZERO Spark jobs per merge (`learn_bpe`
collects the bounded dictionary once); past that bound the loop stays
distributed with one argmax row of driver traffic per round.

Learning loop (per merge round):
- pair counts: posexplode the symbol arrays + codegen'd try_element_at —
  per CLAUDE.md, NO per-element HOF lambdas on the (potentially 10⁸-
  row) vocab table — then a freq-weighted sum per adjacent pair;
- argmax with the deterministic (count desc, left, right) tie-break —
  a one-row collect;
- merge application: greedy left-to-right single pass per word.  This
  is inherently sequential per row, so it is the one justified Arrow-
  batched pandas UDF (closure-self-contained: executors cannot import
  this package), applied only to words that CONTAIN the pair (cheap
  codegen'd adjacency pre-filter keeps the Python worker off the
  untouched majority);
- loop state localCheckpoints every round (CLAUDE.md: iterative state
  must truncate lineage or driver planning goes exponential), with the
  argmax collect as the materializing action.

Encoding: the merge table is bounded by the merge-count knob (10⁴-10⁵
in practice) — broadcast it, encode each DISTINCT word once with the
greedy lowest-rank loop (pandas UDF), then join back to the corpus by
word.  Encoding cost is dictionary-sized, corpus cost is one join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

END = "</w>"


def word_symbols(word_col) -> "F.Column":
    """Initial symbol array of a word: its characters plus the
    end-of-word marker symbol (codegen'd split + concat)."""
    return F.concat(
        F.split(word_col, ""), F.array(F.lit(END))
    )


def _merge_pair_udf(left: str, right: str):
    """Greedy left-to-right merge of one adjacent symbol pair —
    non-overlapping, single pass ('aaa' + (a,a) -> ['aa','a'])."""

    @pandas_udf("array<string>")
    def merge_pair(symbols: pd.Series) -> pd.Series:
        merged = left + right

        def apply(seq):
            out = []
            i, n = 0, len(seq)
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


def _learn_bpe_driver(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str, int]]:
    """Classic in-memory incremental Sennrich loop (zero Spark jobs per
    merge): maintain exact freq-weighted adjacent-pair counts plus a
    pair→word index, and on each merge touch ONLY the words that
    contain the winning pair (subtract their old pair contributions,
    apply the greedy non-overlapping merge, add the new ones back).
    Identical semantics to the distributed loop: same per-position pair
    counts, same (count desc, left, right) tie-break, same greedy
    left-to-right merge, same stops-when-fully-merged condition.

    Argmax via a max-heap with LAZY INVALIDATION (round-6 ADVICE: the
    linear dict scan is O(merges × |pairs|) — ~1e11 comparisons at the
    advertised 5M-word / 30k-merge bound, so zero-jobs-per-merge held
    but wall-clock did not): every pair whose count changes gets a
    fresh (−count, left, right) entry pushed; a popped entry is valid
    iff its count equals the pair's CURRENT stats value (stale-high
    entries are discarded; a stale-low entry can't surface first
    because the later, larger push sorts above it). Heap keys order
    exactly like the old scan key (−c, l, r), so merges/tie-breaks are
    unchanged — test_bpe.py locks both paths to the Sennrich reference."""
    import heapq
    from collections import defaultdict

    vocab: list[tuple[list[str], int]] = [
        (list(w) + [END], int(f)) for w, f in word_freqs
    ]
    stats: dict[tuple[str, str], int] = defaultdict(int)
    indices: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (seq, freq) in enumerate(vocab):
        for i in range(len(seq) - 1):
            p = (seq[i], seq[i + 1])
            stats[p] += freq
            indices[p].add(wi)
    heap: list[tuple[int, str, str]] = [
        (-c, p[0], p[1]) for p, c in stats.items() if c > 0
    ]
    heapq.heapify(heap)

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negc, hl, hr = heap[0]
            if stats.get((hl, hr), 0) == -negc:
                best = ((hl, hr), -negc)
                break
            heapq.heappop(heap)  # stale: count changed since push
        if best is None:
            break
        (left, right), cnt = best
        merges.append((left, right, cnt))
        merged = left + right
        touched: set[tuple[str, str]] = set()
        for wi in list(indices[(left, right)]):
            seq, freq = vocab[wi]
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                stats[p] -= freq
                indices[p].discard(wi)
                touched.add(p)
            out, i, n = [], 0, len(seq)
            while i < n:
                if i + 1 < n and seq[i] == left and seq[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            vocab[wi] = (out, freq)
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                stats[p] += freq
                indices[p].add(wi)
                touched.add(p)
        for p in touched:  # one refreshed entry per net-updated pair
            c = stats.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p[0], p[1]))
    return merges


def learn_bpe(
    words: DataFrame,
    num_merges: int,
    rows_per_partition: int = 65536,
    driver_max_words: int = 5_000_000,
) -> list[tuple[str, str, int]]:
    """Learn `num_merges` BPE merges from a (word, freq) dictionary.
    Returns [(left, right, pair_count), ...] in merge order.  Stops
    early when no adjacent pair remains.

    Job-count bound (the scale-killer is rounds, not data): a production
    vocabulary is 30k-100k merges, and one Spark job per merge is hours
    of pure scheduling at ANY data size.  The distinct-word dictionary
    is bounded (~10⁷-10⁸ rows at web scale) independent of corpus size,
    so when it fits the driver (`n ≤ driver_max_words`, the common
    case) we collect it ONCE and run the classic incremental in-memory
    merge loop — zero Spark jobs per merge, total jobs O(1) in
    `num_merges`.  The distributed per-round loop below remains the
    fallback for dictionaries past the driver bound (and is forced in
    tests via `driver_max_words=0`); encoding stays distributed either
    way (`encode_words` joins the bounded merge table back to the
    corpus).

    Distributed-loop state partitioning is sized to the DICTIONARY (one
    count job, amortized over every round): the state is re-scanned
    `num_merges` times, so inheriting the corpus aggregate's partition
    count makes each round pay scheduling + Python-worker fan-out for
    mostly-empty tasks (16 rounds × 32 near-empty partitions measured
    18 s warm at sf0.1; sized to 1 partition the same loop is ~2 s).
    At 10⁸ distinct words the same rule yields ~1.5k partitions of ~65k
    words — bounded merge-UDF batches on a 1000-core cluster."""
    n = words.count()
    if n <= driver_max_words:
        collected = [
            (r["word"], int(r["freq"]))
            for r in words.select("word", "freq").collect()
        ]
        return _learn_bpe_driver(collected, num_merges)
    parts = max(1, -(-n // rows_per_partition))
    # Lazy checkpoints throughout the loop (CLAUDE.md): each round's
    # argmax TakeOrdered is the single materializing action — one job
    # per round instead of a checkpoint job + a collect job.
    vocab = (
        words.select(word_symbols(F.col("word")).alias("symbols"), F.col("freq"))
        .repartition(parts)
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        sym = F.col("symbols")
        pairs = (
            vocab.select(
                F.posexplode(sym).alias("_p", "l"), sym.alias("_s"), F.col("freq")
            )
            .withColumn("r", F.try_element_at(F.col("_s"), F.col("_p") + 2))
            .filter(F.col("r").isNotNull())
            .groupBy("l", "r")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.col("cnt").desc(), F.col("l"), F.col("r")).limit(1).collect()
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((left, right, cnt))
        # adjacency pre-filter: words without the pair skip the Python
        # worker entirely (codegen'd posexplode-free check via concat
        # scan on the joined symbol string with a \x1f unit separator;
        # the raw control char used here before round 7 was invisible
        # in source and read as sep="" — the escape form makes the
        # boundary clauses below legible as the real-separator checks
        # they are. No false NEGATIVES even if a symbol contains \x1f:
        # `joined` literally interleaves the symbols with sep, so an
        # adjacent (left, right) always yields one of the patterns.
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


def _encode_udf(merges: list[tuple[str, str]]):
    """Greedy lowest-rank BPE encoding of whole words (chars + END),
    merge table in the closure (bounded by the merge-count knob)."""
    ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
    end = END

    @pandas_udf("array<string>")
    def encode(words: pd.Series) -> pd.Series:
        def apply(w):
            seq = list(w) + [end]
            while len(seq) > 1:
                best, where = None, -1
                for i in range(len(seq) - 1):
                    rk = ranks.get((seq[i], seq[i + 1]))
                    if rk is not None and (best is None or rk < best):
                        best, where = rk, i
                if best is None:
                    break
                l, r = seq[where], seq[where + 1]
                out, i, n = [], 0, len(seq)
                while i < n:
                    if i + 1 < n and seq[i] == l and seq[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seq = out
            return seq

        return words.map(apply)

    return encode


def encode_words(
    dictionary: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """(word, subwords array<string>) for every distinct word — encode
    the DICTIONARY once; callers join the result back to the corpus by
    word (the corpus-scale step is that join, not the Python loop)."""
    enc = _encode_udf([(l, r) for l, r, *_ in merges])
    return dictionary.select(
        F.col(word_col).alias("word"), enc(F.col(word_col)).alias("subwords")
    )
