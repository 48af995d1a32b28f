"""pipeline/wordpiece.py: training must reproduce a naive pure-Python
WordPiece reference exactly (same merges, same likelihood scores, same
tie-breaks) on BOTH the driver and the forced-distributed path, and
greedy longest-match encoding must match BERT semantics."""

from __future__ import annotations

import pytest

from csv_query_engine_spark.pipeline.wordpiece import (
    CONT,
    UNK,
    _learn_wordpiece_driver,
    encode_words,
    initial_symbols,
    learn_wordpiece,
    vocab_from_merges,
)

FREQS = {
    "hug": 10,
    "pug": 5,
    "pun": 12,
    "bun": 4,
    "hugs": 5,
    "unhug": 3,
}


# ---------------------------------------------------------------- reference


def _ref_learn(word_freqs: dict[str, int], num_merges: int):
    """Naive recount-everything WordPiece: score(ab) = (c(ab)/c(a))/c(b),
    argmax with (score desc, left, right) tie-break."""
    vocab = {}
    for w, f in word_freqs.items():
        seq = tuple([w[0]] + [CONT + c for c in w[1:]])
        vocab[seq] = vocab.get(seq, 0) + f
    merges = []
    for _ in range(num_merges):
        stats: dict[tuple[str, str], int] = {}
        sym: dict[str, int] = {}
        for seq, f in vocab.items():
            for s in seq:
                sym[s] = sym.get(s, 0) + f
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                stats[p] = stats.get(p, 0) + f
        live = {p: c for p, c in stats.items() if c > 0}
        if not live:
            break
        (left, right), _c = min(
            live.items(),
            key=lambda kv: (-((kv[1] / sym[kv[0][0]]) / sym[kv[0][1]]), kv[0][0], kv[0][1]),
        )
        sc = (live[(left, right)] / sym[left]) / sym[right]
        merges.append((left, right, sc))
        merged = left + (right[len(CONT):] if right.startswith(CONT) else right)
        new_vocab = {}
        for seq, f in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return merges


def _words_df(spark):
    return spark.createDataFrame(list(FREQS.items()), "word string, freq long")


def test_driver_loop_matches_reference():
    got = _learn_wordpiece_driver(list(FREQS.items()), 8)
    assert got == _ref_learn(FREQS, 8)


def test_distributed_loop_matches_reference(spark):
    got = learn_wordpiece(_words_df(spark), 8, driver_max_words=0)
    assert got == _ref_learn(FREQS, 8)


def test_driver_path_selected_matches_distributed(spark):
    assert learn_wordpiece(_words_df(spark), 6) == learn_wordpiece(
        _words_df(spark), 6, driver_max_words=0
    )


def test_likelihood_score_prefers_exclusive_pairs():
    """'u'+'##g' has high raw count but 'u' is everywhere; a pair whose
    parts occur ONLY together scores 1/min-part — the WordPiece-vs-BPE
    distinction. With q appearing only before ##z, (q, ##z) must merge
    before the higher-count but diluted pairs."""
    freqs = {"qz": 3, "aqz": 2, "ab": 50, "ba": 40, "ach": 30}
    merges = _learn_wordpiece_driver(list(freqs.items()), 2)
    # both q–z pairs are exclusive (score 0.2, tie broken '##q' < 'q');
    # the raw-count winner ('a', '##b'), c=50 but diluted by a's 122
    # occurrences (score ~0.006), must NOT lead
    assert [m[:2] for m in merges[:2]] == [("##q", "##z"), ("q", "##z")]


def test_encode_longest_match_and_unk(spark):
    merges = _learn_wordpiece_driver(list(FREQS.items()), 8)
    vocab = vocab_from_merges(initial_symbols(list(FREQS)), merges)
    enc = {
        r["word"]: r["pieces"]
        for r in encode_words(
            spark.createDataFrame(
                [("hug",), ("hugs",), ("pugx",), ("zzz",)], "word string"
            ),
            vocab,
        ).collect()
    }
    # every non-UNK encoding reassembles the word with ## stripped
    for w, ps in enc.items():
        if ps == [UNK]:
            continue
        assert "".join(p[len(CONT):] if p.startswith(CONT) else p for p in ps) == w
        assert not ps[0].startswith(CONT)
        assert all(p.startswith(CONT) for p in ps[1:])
    # 'z' was never seen: the whole word becomes [UNK] (BERT semantics)
    assert enc["zzz"] == [UNK]
    # greedy longest-match: 'hug' must be a single piece once merged
    if "hug" in vocab:
        assert enc["hug"] == ["hug"]
