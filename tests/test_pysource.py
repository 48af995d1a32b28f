"""io/pysource.py: the custom Python DataSource must generate
bit-reproducible rows, push doc_id predicates into partition pruning
(the filter disappears from the optimized plan), and hand unsupported
predicates back to Spark unchanged."""

from __future__ import annotations

import pytest

from pyspark.sql.datasource import StringStartsWith

from csv_query_engine_spark.io.pysource import EqualTo, SyntheticDocsReader, register


@pytest.fixture(scope="module")
def docs_reader(spark):
    register(spark)
    return lambda **opts: spark.read.format("synthetic_docs").options(**opts).load()


def test_deterministic_and_complete(docs_reader):
    a = sorted(map(tuple, docs_reader(n_docs=300).collect()))
    b = sorted(map(tuple, docs_reader(n_docs=300).collect()))
    assert a == b
    assert len(a) == 300
    assert [r[0] for r in a] == list(range(300))
    # different seed -> different corpus, same ids
    c = sorted(map(tuple, docs_reader(n_docs=300, seed=7).collect()))
    assert [r[0] for r in c] == list(range(300))
    assert a != c


def test_range_pushdown_correct_and_absorbed(docs_reader, spark):
    df = docs_reader(n_docs=500)
    pushed = df.filter("doc_id >= 100 AND doc_id < 150")
    want = [t for t in sorted(map(tuple, df.collect())) if 100 <= t[0] < 150]
    assert sorted(map(tuple, pushed.collect())) == want
    # the accepted predicate is applied INSIDE the source: no Filter
    # node survives optimization
    optimized = pushed._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" not in optimized


def test_equality_probe_prunes_to_one_partition():
    r = SyntheticDocsReader({"n_docs": "1000", "rows_per_partition": "100"})
    assert len(r.partitions()) == 10
    assert list(r.pushFilters([EqualTo(("doc_id",), 42)])) == []
    parts = r.partitions()
    assert len(parts) == 1 and (parts[0].start, parts[0].end) == (42, 43)


def test_unsupported_filter_handed_back_and_still_applied(docs_reader):
    r = SyntheticDocsReader({"n_docs": "100"})
    unsupported = list(r.pushFilters([StringStartsWith(("lang",), "e")]))
    assert len(unsupported) == 1  # returned to Spark, not silently dropped
    df = docs_reader(n_docs=200)
    got = {t[0] for t in df.filter("lang = 'en'").collect()}
    want = {t[0] for t in df.collect() if t[2] == "en"}
    assert got == want and got  # Spark applied it post-scan


def test_contradictory_range_fully_prunes(docs_reader):
    assert docs_reader(n_docs=100).filter("doc_id < 0").count() == 0
    assert (
        docs_reader(n_docs=100).filter("doc_id > 90 AND doc_id <= 60").count() == 0
    )


def test_stream_reader_deterministic_microbatches(docs_reader, spark, tmp_path):
    q = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 120)
        .option("rows_per_partition", 40)
        .load()
        .writeStream.format("memory")
        .queryName("pysource_events")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(map(tuple, spark.sql("SELECT * FROM pysource_events").collect()))
    assert len(rows) == 120
    assert [r[0] for r in rows] == list(range(120))
    # replayability: a fresh reader over the same offsets yields the
    # same bytes (the checkpoint-recovery contract)
    from csv_query_engine_spark.io.pysource import SyntheticEventsStreamReader

    r = SyntheticEventsStreamReader({"rows_per_partition": "40"})
    parts = r.partitions({"offset": 0}, {"offset": 120})
    assert len(parts) == 3
    replay = sorted(t for p in parts for t in r.read(p))
    assert replay == rows


def test_jsonl_shard_sink_round_trip_and_atomicity(docs_reader, spark, tmp_path):
    import os

    out = str(tmp_path / "shards")
    df = docs_reader(n_docs=200)
    df.write.format("jsonl_shards").option("path", out).mode("append").save()
    files = sorted(os.listdir(out))
    assert files and all(f.startswith("shard-") for f in files)  # no .tmp- residue
    back = spark.read.json(os.path.join(out, "shard-*.jsonl"))
    assert sorted(map(tuple, back.select("doc_id", "source", "lang", "text").collect())) == sorted(
        map(tuple, df.collect())
    )


def test_jsonl_shard_sink_abort_removes_tmp(tmp_path):
    import os

    from pyspark.sql import Row

    from csv_query_engine_spark.io.pysource import JsonlShardWriter

    w = JsonlShardWriter({"path": str(tmp_path / "ab")})
    msg = w.write(iter([Row(a=1), Row(a=2)]))
    assert os.path.exists(msg.tmp_path)
    w.abort([msg, None])
    assert not os.path.exists(msg.tmp_path)
    w2 = JsonlShardWriter({"path": str(tmp_path / "ab")})
    m2 = w2.write(iter([Row(a=3)]))
    w2.commit([m2, None])
    files = sorted(os.listdir(tmp_path / "ab"))
    assert len(files) == 1 and files[0].startswith(f"shard-{w2.job_id}-")


def test_jsonl_shard_sink_append_does_not_clobber(docs_reader, spark, tmp_path):
    """Two successive append jobs to the same directory must keep BOTH
    jobs' shards: final names carry a per-job component, so a second
    append can never os.replace() the first job's shard-00000 etc.
    (the silent-loss bug: shards were numbered from 0 every job)."""
    import os

    out = str(tmp_path / "appends")
    a = docs_reader(n_docs=60)
    b = docs_reader(n_docs=40, seed=5)
    a.write.format("jsonl_shards").option("path", out).mode("append").save()
    n_first = len(os.listdir(out))
    b.write.format("jsonl_shards").option("path", out).mode("append").save()
    files = sorted(os.listdir(out))
    assert len(files) > n_first, files  # first job's shards survived
    back = spark.read.json(os.path.join(out, "shard-*.jsonl"))
    assert back.count() == 100
    assert back.select("doc_id", "source", "lang", "text").distinct().count() == 100


def test_jsonl_stream_sink_exactly_once_across_restart(docs_reader, spark, tmp_path):
    """Streaming write path of the JSONL sink: two availableNow runs
    over one checkpoint must produce disjoint epochs with no duplicate
    rows, and the committed shards must carry exactly the offsets the
    source emitted."""
    import glob
    import json
    import os

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")

    # availableNow falls back to single-batch for this source, and a
    # fresh reader's latestOffset counts up from 0 — so each run's
    # rows_per_batch must cover the full target range (the pattern the
    # conversion-join restart test uses); the checkpoint still clamps
    # the batch START to what was already committed.
    def run_once(rows_per_batch):
        q = (
            spark.readStream.format("synthetic_events")
            .option("rows_per_batch", rows_per_batch)
            .option("rows_per_partition", 50)
            .option("max_offset", 400)
            .load()
            .writeStream.format("jsonl_shards")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once(200)
    first_ids = []
    for f in glob.glob(os.path.join(out, "batch-*.jsonl")):
        first_ids += [json.loads(l)["event_id"] for l in open(f)]
    assert sorted(first_ids) == list(range(200))

    run_once(400)  # restart: resumes at offset 200, writes new epochs only
    ids = []
    for f in glob.glob(os.path.join(out, "batch-*.jsonl")):
        ids += [json.loads(l)["event_id"] for l in open(f)]
    assert sorted(ids) == list(range(400)), "duplicate or missing rows after restart"
    # no tmp orphans; every epoch has its commit marker
    assert not glob.glob(os.path.join(out, ".tmp-*"))
    assert glob.glob(os.path.join(out, "_commit-*"))


def test_jsonl_stream_sink_replayed_epoch_is_idempotent(tmp_path):
    """Unit-level replay: committing the same epoch twice must not
    duplicate shards — the marker turns the re-commit into tmp cleanup."""
    import glob
    import json
    import os

    from csv_query_engine_spark.io.pysource import (
        JsonlStreamShardWriter,
        _ShardCommit,
    )

    out = str(tmp_path / "replay")
    w = JsonlStreamShardWriter({"path": out})
    os.makedirs(out, exist_ok=True)

    def make_tmp(rows):
        p = os.path.join(out, f".tmp-{len(glob.glob(out + '/*'))}.jsonl")
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        return _ShardCommit(p, len(rows))

    w.commit([make_tmp([{"a": 1}, {"a": 2}])], batchId=7)
    shards = glob.glob(os.path.join(out, "batch-*.jsonl"))
    assert len(shards) == 1
    # engine replays epoch 7 after a crash-before-checkpoint
    w.commit([make_tmp([{"a": 1}, {"a": 2}])], batchId=7)
    assert glob.glob(os.path.join(out, "batch-*.jsonl")) == shards
    assert not glob.glob(os.path.join(out, ".tmp-*"))
    # abort removes orphans without touching committed output
    w.abort([make_tmp([{"a": 9}])], batchId=8)
    assert glob.glob(os.path.join(out, "batch-*.jsonl")) == shards
    assert not glob.glob(os.path.join(out, ".tmp-*"))


def test_jsonl_stream_sink_replay_clears_stray_partial_shards(tmp_path):
    """Crash window: a prior attempt renamed SOME shards but died before
    the marker. The replay (which may plan fewer tasks) must clear the
    epoch's stray shards before committing, or readers see duplicates."""
    import glob
    import json
    import os

    from csv_query_engine_spark.io.pysource import (
        JsonlStreamShardWriter,
        _ShardCommit,
    )

    out = str(tmp_path / "crash")
    os.makedirs(out, exist_ok=True)
    # simulate the dead attempt: two renamed shards, NO marker
    for i, rows in enumerate(([{"a": 1}], [{"a": 2}])):
        with open(os.path.join(out, f"batch-{5:09d}-shard-{i:05d}.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    # the replay plans ONE task carrying the full epoch
    w = JsonlStreamShardWriter({"path": out})
    tmp = os.path.join(out, ".tmp-replay.jsonl")
    with open(tmp, "w") as f:
        for r in ({"a": 1}, {"a": 2}):
            f.write(json.dumps(r) + "\n")
    w.commit([_ShardCommit(tmp, 2)], batchId=5)
    shards = sorted(glob.glob(os.path.join(out, "batch-*.jsonl")))
    assert len(shards) == 1, shards  # the stray second shard is gone
    rows = [json.loads(l)["a"] for l in open(shards[0])]
    assert sorted(rows) == [1, 2]
