"""pipeline/bpe.py: distributed BPE training must reproduce the
classic single-machine Sennrich algorithm exactly (same merges, same
counts, same deterministic tie-break), and greedy lowest-rank encoding
must match a pure-Python reference and always reconstruct the word."""

from __future__ import annotations

from csv_query_engine_spark.pipeline.bpe import END, encode_words, learn_bpe


# ---------------------------------------------------------------- reference

def _ref_learn(word_freqs: dict[str, int], num_merges: int):
    """Pure-Python Sennrich BPE with the (count desc, left, right)
    tie-break used by learn_bpe."""
    vocab = {tuple(w) + (END,): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for seq, f in vocab.items():
            for i in range(len(seq) - 1):
                counts[(seq[i], seq[i + 1])] = counts.get((seq[i], seq[i + 1]), 0) + f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        vocab = {_ref_merge(seq, left, right): f for seq, f in vocab.items()}
    return merges


def _ref_merge(seq, left, right):
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def _ref_encode(word: str, merges):
    ranks = {(l, r): i for i, (l, r, *_) in enumerate(merges)}
    seq = tuple(word) + (END,)
    while len(seq) > 1:
        best = None
        for i in range(len(seq) - 1):
            rk = ranks.get((seq[i], seq[i + 1]))
            if rk is not None and (best is None or rk < best[0]):
                best = (rk, seq[i], seq[i + 1])
        if best is None:
            break
        seq = _ref_merge(seq, best[1], best[2])
    return list(seq)


FREQS = {
    "low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 4,
    "west": 1, "id": 7, "wide": 2, "lowest": 1, "a": 9,
}


def test_learn_matches_reference(spark):
    words = spark.createDataFrame(list(FREQS.items()), "word string, freq long")
    got = learn_bpe(words, 25)
    want = _ref_learn(FREQS, 25)
    assert got == want
    # the canonical first merges on this corpus: highest-count pair wins
    assert got[0][2] == max(c for _, _, c in got)


def test_learn_stops_when_fully_merged(spark):
    words = spark.createDataFrame([("ab", 3)], "word string, freq long")
    got = learn_bpe(words, 50)
    # "ab</w>" needs exactly 2 merges, then no pair remains
    assert len(got) == 2
    assert got == _ref_learn({"ab": 3}, 50)


def test_encode_matches_reference_and_reconstructs(spark):
    merges = _ref_learn(FREQS, 12)
    held_out = ["lowest", "newest", "wildest", "anew", "zzz", "a"]
    df = spark.createDataFrame([(w,) for w in held_out], "word string")
    got = {
        r["word"]: list(r["subwords"])
        for r in encode_words(df, [(l, r) for l, r, _ in merges]).collect()
    }
    for w in held_out:
        assert got[w] == _ref_encode(w, merges), w
        assert "".join(got[w]) == w + END  # lossless


def test_encode_no_merges_is_chars(spark):
    df = spark.createDataFrame([("hi",)], "word string")
    [row] = encode_words(df, []).collect()
    assert list(row["subwords"]) == ["h", "i", END]


def test_distributed_fallback_matches_reference(spark):
    """`driver_max_words=0` forces the distributed per-round loop; it
    must produce byte-identical merges/counts/tie-breaks to both the
    reference and the (default) driver-side incremental loop."""
    words = spark.createDataFrame(list(FREQS.items()), "word string, freq long")
    got = learn_bpe(words, 25, driver_max_words=0)
    assert got == _ref_learn(FREQS, 25)
    assert got == learn_bpe(words, 25)


def test_driver_path_jobs_do_not_scale_with_merges(spark):
    """Round-6 fix: a production vocabulary is 30k-100k merges, so the
    job count must be O(1) in num_merges (dictionary collected once,
    classic incremental in-memory loop), not one-job-per-merge."""
    rows = [(w * k, f + k) for w, f in FREQS.items() for k in (1, 2, 3)]
    words = spark.createDataFrame(rows, "word string, freq long")
    st = spark.sparkContext.statusTracker()
    before = len(st.getJobIdsForGroup())
    got = learn_bpe(words, 64)
    jobs = len(st.getJobIdsForGroup()) - before
    assert len(got) >= 30  # enough rounds that 1:1 scaling would show
    assert jobs <= 6, jobs  # count + collect (+AQE), NOT >= num_merges
    assert got == _ref_learn(dict(rows), 64)
