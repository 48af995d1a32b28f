"""LLM-training-data pipeline operators at scale (SURVEY.md §7 phase 6;
no reference code — these extend the engine for the 100 TB use case):

* :mod:`text`       — tokenization, quality scoring, language ID,
                      fingerprinting, vocab coverage, PII scrubbing,
                      repetition/contamination/dup-span screens (all
                      JVM-side built-ins)
* :mod:`dedup`      — exact, n-gram Jaccard, MinHash LSH (one-
                      permutation hashing), SimHash, connected-
                      components clustering (min-label propagation +
                      large-star/small-star contraction), incremental
                      batch admission
* :mod:`chunking`   — overlapping retrieval chunks and deterministic
                      token-budgeted training-shard layout
* :mod:`similarity` — embedding cosine top-k (brute force, LSH-bucketed,
                      IVF, int8-quantized with exact rescoring),
                      banded near-dup pairs, per-label centroids
* :mod:`packing`    — fixed-length training-sequence packing via
                      hierarchical prefix sums
* :mod:`sampling`   — deterministic splits, stratified reservoirs,
                      token-budget mixes
* :mod:`multimodal` — binary media columns with typed metadata and
                      Arrow-batched decode/feature plumbing (real codecs
                      stubbed: no media libs in this environment; the
                      deterministic fakes are oracle-checked)
"""
