"""Custom Python DataSources (PySpark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic document-corpus generator with doc_id filter
pushdown and partition pruning (``synthetic_docs``), a partition-planned
replayable micro-batch event stream (``synthetic_events``), and a
two-phase-commit JSONL shard sink (``jsonl_shards``) with BOTH write
halves — batch (job-commit renames) and streaming (per-epoch commit
markers, idempotent replay) — completing all four quadrants of the
Python DataSource API: batch read, stream read, batch write, stream
write.

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
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
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


class _BatchRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Partition-planned micro-batch stream of deterministic events.

    Offsets are plain event counters (``{"offset": n}``); each batch
    covers ``[start, end)`` where ``latestOffset`` advances by
    ``rows_per_batch`` per poll, and ``partitions()`` splits the id
    interval into fixed-size ranges read IN PARALLEL on executors —
    unlike :class:`SimpleDataSourceStreamReader`, nothing is generated
    on the driver, so batch size scales with the cluster, not the
    driver.  Replaying any offset range reproduces identical bytes
    (rows derive from (seed, event_id) hashes), which is exactly the
    contract Structured Streaming's checkpoint recovery assumes of a
    replayable source."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.rows_per_partition = int(options.get("rows_per_partition", 25))
        self.max_offset = int(options.get("max_offset", 10**15))
        self.seed = int(options.get("seed", 0))
        self._current = 0

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        self._current = min(self._current + self.rows_per_batch, self.max_offset)
        return {"offset": self._current}

    def partitions(self, start: dict, end: dict):
        lo, hi, step = start["offset"], end["offset"], self.rows_per_partition
        if hi <= lo:
            return [_BatchRange(0, 0)]
        return [_BatchRange(s, min(s + step, hi)) for s in range(lo, hi, step)]

    def read(self, partition: _BatchRange) -> Iterator[tuple]:
        seed = self.seed
        for event_id in range(partition.start, partition.end):
            h = hashlib.md5(f"ev:{seed}:{event_id}".encode()).digest()
            yield (
                event_id,
                int.from_bytes(h[:2], "big") % 100,  # user_id
                ("view", "click", "purchase")[h[2] % 3],
                int.from_bytes(h[3:5], "big"),  # value
            )

    def commit(self, end: dict) -> None:
        pass  # nothing buffered: every range is re-derivable

    def stop(self) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    """``spark.readStream.format("synthetic_events")`` — deterministic
    replayable event micro-batches; options: rows_per_batch,
    rows_per_partition, max_offset, seed."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id BIGINT NOT NULL, user_id INT NOT NULL, event_type STRING NOT NULL, value INT NOT NULL"

    def streamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


class _ShardCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path, self.rows = tmp_path, rows


def _write_tmp_shard(path: str, iterator) -> _ShardCommit:
    """Task-side half of the two-phase protocol, shared by the batch
    and streaming writers: stream rows into a private .tmp- JSONL shard
    and report it for the driver-side rename."""
    import json
    import os
    import uuid

    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".tmp-{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(tmp, "w") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict()) + "\n")
            n += 1
    return _ShardCommit(tmp, n)


def _remove_tmp_shards(messages) -> None:
    import os

    for m in messages:
        if m is not None and os.path.exists(m.tmp_path):
            os.remove(m.tmp_path)


class JsonlShardWriter(DataSourceWriter):
    """Two-phase-commit JSONL sink: each task writes a private
    ``.tmp-<uuid>`` shard and reports it in its commit message; the
    driver's ``commit()`` renames every shard into place only after ALL
    tasks succeeded, and ``abort()`` deletes the orphans — so a failed
    or speculatively-duplicated task never leaves a partial shard
    visible.  This is the same visibility protocol Spark's file sinks
    use (task temp dir + driver-side job commit), expressed through the
    Python writer API."""

    def __init__(self, options):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards sink requires option 'path'")
        # One writer instance is built on the driver per write job: a
        # per-job component in the FINAL shard names keeps successive
        # appends to the same directory from os.replace()-ing each
        # other's shard-00000.jsonl etc. (silent data loss in an
        # append-only sink).
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _ShardCommit:
        return _write_tmp_shard(self.path, iterator)

    def commit(self, messages) -> None:
        import os

        for i, m in enumerate(m for m in messages if m is not None):
            final = os.path.join(self.path, f"shard-{self.job_id}-{i:05d}.jsonl")
            os.replace(m.tmp_path, final)

    def abort(self, messages) -> None:
        _remove_tmp_shards(messages)


class JsonlStreamShardWriter(DataSourceStreamWriter):
    """Streaming half of the JSONL sink (``df.writeStream.format(
    "jsonl_shards")``): per-EPOCH two-phase commit with idempotent
    replay.  Tasks write private ``.tmp-`` shards exactly like the
    batch writer; ``commit(messages, batchId)`` renames them into
    ``batch-<id>-shard-*.jsonl`` and drops a ``_commit-<id>`` marker.
    If the engine replays an epoch (crash AFTER the sink committed but
    BEFORE the checkpoint recorded it — the documented at-least-once
    window every streaming sink must close itself), the marker makes
    the re-commit a no-op that deletes the duplicate tmp shards —
    exactly-once output per epoch, the same idempotence contract
    Spark's own file streaming sink implements with its _spark_metadata
    log.  ``abort()`` deletes the epoch's orphans.

    Scale: tasks stream rows straight to their shard (O(1) memory);
    commit is a driver-side rename of one message per task.  Epoch
    shard names are batch-id-derived (NOT job-unique like the batch
    writer's): a streaming sink owns its output directory exclusively —
    the checkpoint <-> path pairing already forbids two concurrent
    queries sharing one path, and batch ids are unique within the one
    query the directory belongs to."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards sink requires option 'path'")

    def write(self, iterator) -> _ShardCommit:
        return _write_tmp_shard(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:
        import glob
        import os

        marker = os.path.join(self.path, f"_commit-{batchId:09d}")
        live = [m for m in messages if m is not None]
        if os.path.exists(marker):
            # replayed epoch: output already visible; drop duplicates
            _remove_tmp_shards(live)
            return
        # crash-replay hygiene: a previous attempt may have renamed SOME
        # shards before dying short of the marker; if this replay plans
        # fewer tasks, those strays would survive the re-commit and
        # duplicate rows — clear the epoch's namespace first (the
        # marker, not the directory listing, is what readers trust)
        for stray in glob.glob(
            os.path.join(self.path, f"batch-{batchId:09d}-shard-*.jsonl")
        ):
            os.remove(stray)
        total = 0
        for i, m in enumerate(live):
            final = os.path.join(
                self.path, f"batch-{batchId:09d}-shard-{i:05d}.jsonl"
            )
            os.replace(m.tmp_path, final)
            total += m.rows
        with open(marker, "w") as f:
            f.write(f"{total}\n")

    def abort(self, messages, batchId: int) -> None:
        _remove_tmp_shards(messages)


class JsonlShardSink(DataSource):
    """``df.write.format("jsonl_shards").option("path", dir)`` /
    ``df.writeStream.format("jsonl_shards")`` — two-phase-commit JSONL
    shards (local/shared filesystem); the streaming path adds per-epoch
    idempotent replay (commit markers)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema, overwrite: bool) -> JsonlShardWriter:
        if overwrite:
            raise ValueError("jsonl_shards supports append mode only")
        return JsonlShardWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> JsonlStreamShardWriter:
        return JsonlStreamShardWriter(self.options)


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
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonlShardSink)
