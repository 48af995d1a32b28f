"""Property lock for the round-7 heap-based argmax in the BPE driver
loop: on random word-frequency dictionaries the heap+lazy-invalidation
implementation must produce EXACTLY the merge sequence of a naive
linear-scan reference (same counts, same (count desc, left, right)
tie-breaks, same early stop) — pure Python, no Spark session."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from csv_query_engine_spark.pipeline.bpe import END, _learn_bpe_driver


def _naive_reference(word_freqs, num_merges):
    """The pre-round-7 linear-scan loop, kept verbatim as the spec."""
    from collections import defaultdict

    vocab = [(list(w) + [END], int(f)) for w, f in word_freqs]
    stats = defaultdict(int)
    indices = defaultdict(set)
    for wi, (seq, freq) in enumerate(vocab):
        for i in range(len(seq) - 1):
            p = (seq[i], seq[i + 1])
            stats[p] += freq
            indices[p].add(wi)
    merges = []
    for _ in range(num_merges):
        best = None
        for p, c in stats.items():
            if c <= 0:
                continue
            k = (-c, p[0], p[1])
            if best is None or k < best[0]:
                best = (k, p, c)
        if best is None:
            break
        (left, right), cnt = best[1], best[2]
        merges.append((left, right, cnt))
        merged = left + right
        for wi in list(indices[(left, right)]):
            seq, freq = vocab[wi]
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                stats[p] -= freq
                indices[p].discard(wi)
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
    return merges


words = st.lists(
    st.tuples(
        st.text(alphabet="abcdef", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=50),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@settings(max_examples=200, deadline=None)
@given(words=words, num_merges=st.integers(min_value=1, max_value=40))
def test_heap_argmax_equals_naive_scan(words, num_merges):
    assert _learn_bpe_driver(words, num_merges) == _naive_reference(words, num_merges)
