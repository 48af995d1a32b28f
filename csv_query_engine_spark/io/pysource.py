"""Custom Python DataSource (PySpark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic document-corpus generator with doc_id filter
pushdown and partition pruning.

The reference ingests CSV files only (reference main.py upload path);
this source extends the engine's source family (csv/parquet/json/orc/
jdbc/binaryFile/text) with the *programmatic* source shape: rows are
GENERATED per partition, so a 100 TB test corpus costs zero I/O and
zero driver memory — every partition derives its rows independently
from (seed, doc_id) content hashes.  That makes it the scale-up rig
for the pipeline operators: the same bytes at any SF, bit-reproducible
across runs and cluster sizes.

Scale design:

* ``partitions()`` splits the id space into fixed-size ranges — work
  distributes evenly regardless of corpus size, and the planner sees
  one InputPartition per range (no driver-side row materialization).
* ``pushFilters()`` accepts doc_id range/equality predicates and
  narrows the generated id interval, so ``partitions()`` PRUNES whole
  ranges before any Python worker spins up — the Python-source analog
  of parquet row-group pruning (a `doc_id = k` probe plans exactly one
  single-row partition).  Unsupported predicates are handed back to
  Spark, which keeps applying them post-scan — accepted ones are
  applied exactly here, so results never change, only work.
* Rows derive from md5(seed, doc_id) — no RNG state, no sequential
  dependency, so generation is embarrassingly parallel and a re-read
  (or a different partitioning) reproduces identical bytes.

IMPORTANT (CLAUDE.md): this module is shipped to Python workers by
cloudpickle when the source is registered.  It therefore imports ONLY
pyspark + stdlib (never this package), and ``register()`` marks it for
pickle-by-value so executors need not import the package at all.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)

_SOURCES = ("web", "books", "wiki", "code", "news")
_LANGS = ("en", "de", "fr", "es", "pt")
_VOCAB = (
    "data spark query engine table column filter join group window "
    "stream batch shuffle partition broadcast hash sort merge scan"
).split()


def _doc_row(seed: int, doc_id: int) -> tuple:
    """Deterministic (doc_id, source, lang, text) from content hashes —
    stdlib-only so worker-side generation has no package dependency."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    source = _SOURCES[h[0] % len(_SOURCES)]
    lang = _LANGS[h[1] % len(_LANGS)]
    n_words = 5 + h[2] % 20
    words = []
    stream = h
    while len(words) < n_words:
        stream = hashlib.md5(stream).digest()
        words.extend(_VOCAB[b % len(_VOCAB)] for b in stream[: n_words - len(words)])
    return (doc_id, source, lang, " ".join(words))


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.rows_per_partition = int(options.get("rows_per_partition", 250))
        self.seed = int(options.get("seed", 0))
        # generated id interval [lo, hi); pushFilters narrows it
        self.lo = 0
        self.hi = self.n_docs

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, IsNotNull)
            ) and f.attribute == ("doc_id",):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value) + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                # IsNotNull on a generated key: always true, accepted no-op
            else:
                yield f  # unsupported — Spark applies it post-scan

    def partitions(self) -> list[InputPartition]:
        lo, hi, step = self.lo, self.hi, self.rows_per_partition
        if hi <= lo:
            return [_IdRange(0, 0)]  # fully pruned (API requires >= 1)
        return [_IdRange(s, min(s + step, hi)) for s in range(lo, hi, step)]

    def read(self, partition: _IdRange) -> Iterator[tuple]:
        seed = self.seed
        for doc_id in range(partition.start, partition.end):
            yield _doc_row(seed, doc_id)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n_docs", N)`` —
    see module docstring.  Options: n_docs, rows_per_partition, seed."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id BIGINT NOT NULL, source STRING NOT NULL, lang STRING NOT NULL, text STRING NOT NULL"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Register the source, shipping THIS module by value so executors
    never import the package (CLAUDE.md worker-shipping invariant)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    # runtime conf; off by default in Spark 4.1 — without it the scan
    # REFUSES to plan a reader that implements pushFilters()
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)
