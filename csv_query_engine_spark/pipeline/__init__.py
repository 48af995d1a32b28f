"""LLM-training-data pipeline operators at scale (SURVEY.md §7 phase 6;
no reference code — these extend the engine for the 100 TB use case):

* :mod:`text`       — tokenization, quality scoring, language ID,
                      fingerprinting (all JVM-side built-ins)
* :mod:`dedup`      — exact, n-gram Jaccard, MinHash LSH, SimHash
* :mod:`similarity` — embedding cosine top-k (brute force + LSH-bucketed)
* :mod:`multimodal` — binary media columns with typed metadata and
                      Arrow-batched decode/feature plumbing (decode
                      stubbed: no media libs in this environment)
"""
