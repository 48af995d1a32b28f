"""Unigram-LM tokenizer (pipeline/unigram.py, Kudo 2018): the
distributed path is locked piece-for-piece (and score-for-score) to the
pure-Python driver path (the Sennrich-lock precedent, tests/test_bpe.py),
and the segmentation/pruning contracts are property-checked."""

from __future__ import annotations

import math

import pytest

from csv_query_engine_spark.pipeline.unigram import (
    _learn_unigram_driver,
    _make_viterbi,
    _unk_logp,
    encode_unigram,
    learn_unigram,
)

CORPUS = [
    ("singing", 12),
    ("running", 10),
    ("jumping", 9),
    ("sing", 7),
    ("ringing", 6),
    ("runner", 5),
    ("jumper", 4),
    ("ring", 4),
    ("sung", 2),
    ("gun", 2),
]


def _words_df(spark):
    return spark.createDataFrame(CORPUS, "word string, freq long")


def test_distributed_path_matches_driver_reference(spark):
    """Force the distributed loop (driver_max_words=0) and require
    bit-identical vocabulary and log-probs vs the in-driver pure-Python
    loop — integer counts and quantized loss deltas make the two paths
    exactly comparable."""
    kw = dict(vocab_size=24, seed_size=40, max_piece_len=4, em_rounds=2, shrink=0.75)
    ref = _learn_unigram_driver(CORPUS, **kw)
    got = learn_unigram(_words_df(spark), driver_max_words=0, **kw)
    assert got == ref


def test_viterbi_segmentation_concatenates_and_is_deterministic():
    viterbi = _make_viterbi()
    logp = {"sing": -1.0, "ing": -1.2, "s": -3.0, "i": -3.0, "n": -3.0, "g": -3.0}
    unk = _unk_logp(logp)
    pieces, score = viterbi("singing", logp, 4, unk)
    assert "".join(pieces) == "singing"
    assert pieces == ["sing", "ing"]  # the high-prob path
    assert score == pytest.approx(-2.2)
    assert viterbi("singing", logp, 4, unk) == (pieces, score)


def test_skip_excludes_piece_and_chars_fall_back():
    viterbi = _make_viterbi()
    logp = {"ab": -0.5, "a": -2.0, "b": -2.0}
    unk = _unk_logp(logp)
    assert viterbi("ab", logp, 2, unk)[0] == ["ab"]
    assert viterbi("ab", logp, 2, unk, skip="ab")[0] == ["a", "b"]
    # 'z' is out-of-vocab: the unk floor keeps the word segmentable
    pieces, score = viterbi("az", logp, 2, unk)
    assert pieces == ["a", "z"] and score == pytest.approx(-2.0 + unk)


def test_training_respects_vocab_budget_and_keeps_chars():
    pieces = _learn_unigram_driver(
        CORPUS, vocab_size=20, seed_size=60, max_piece_len=4, em_rounds=2, shrink=0.7
    )
    vocab = dict(pieces)
    chars = {c for w, _ in CORPUS for c in w}
    assert chars <= set(vocab), "single chars must never be pruned"
    multi = [p for p in vocab if len(p) > 1]
    assert len(multi) <= max(20 - len(chars), 0) or len(multi) <= 1
    # log-probs normalize (sum of probs == 1 over the vocab)
    assert sum(math.exp(lp) for lp in vocab.values()) == pytest.approx(1.0)


def test_frequent_morpheme_survives_pruning_and_segments():
    pieces = _learn_unigram_driver(
        CORPUS, vocab_size=24, seed_size=60, max_piece_len=4, em_rounds=2, shrink=0.75
    )
    vocab = dict(pieces)
    assert "ing" in vocab, "the dominant morpheme must survive the prune"
    viterbi = _make_viterbi()
    segd, _ = viterbi("singing", vocab, 4, _unk_logp(vocab))
    assert "ing" in segd


def test_encode_unigram_joins_back_distributed(spark):
    pieces = _learn_unigram_driver(
        CORPUS, vocab_size=24, seed_size=60, max_piece_len=4, em_rounds=2, shrink=0.75
    )
    enc = encode_unigram(_words_df(spark), pieces)
    rows = {r["word"]: r["pieces"] for r in enc.collect()}
    assert set(rows) == {w for w, _ in CORPUS}
    viterbi = _make_viterbi()
    logp = dict(pieces)
    unk = _unk_logp(logp)
    for w, ps in rows.items():
        assert "".join(ps) == w
        assert ps == viterbi(w, logp, max(len(p) for p in logp), unk)[0]


def test_trained_vocab_beats_char_baseline_likelihood():
    """The learned pieces must compress the corpus: total Viterbi
    log-likelihood under the trained vocab exceeds the chars-only
    unigram baseline trained on the same counts."""
    from collections import defaultdict

    pieces = _learn_unigram_driver(
        CORPUS, vocab_size=24, seed_size=60, max_piece_len=4, em_rounds=2, shrink=0.75
    )
    vocab = dict(pieces)
    char_counts: dict[str, int] = defaultdict(int)
    for w, f in CORPUS:
        for ch in w:
            char_counts[ch] += f
    total = sum(char_counts.values())
    char_lp = {c: math.log(n) - math.log(total) for c, n in char_counts.items()}
    viterbi = _make_viterbi()

    def ll(logp):
        unk = _unk_logp(logp)
        mx = max(len(p) for p in logp)
        return sum(f * viterbi(w, logp, mx, unk)[1] for w, f in CORPUS)

    assert ll(vocab) > ll(char_lp)
