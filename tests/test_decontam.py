"""Bloom decontamination contract: zero false negatives, bounded false
positives, map-only probe plan, mergeable build."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from csv_query_engine_spark.pipeline.decontam import (
    bloom_build,
    bloom_pack,
    bloom_params,
    bloom_probe,
)


def _fit(spark, members):
    m, k = bloom_params(len(members), fpp=0.01)
    bench = spark.createDataFrame([(v,) for v in members], "v string")
    return bloom_pack(bloom_build(bench, "v", m, k), m), m, k


def test_no_false_negatives_bounded_false_positives(spark):
    members = [f"bench-{i}" for i in range(500)]
    packed, m, k = _fit(spark, members)
    probe = spark.createDataFrame(
        [(v, True) for v in members] + [(f"other-{i}", False) for i in range(2000)],
        "v string, is_member boolean",
    )
    out = bloom_probe(probe, "v", packed, m, k).collect()
    fn = [r for r in out if r["is_member"] and not r["maybe_member"]]
    assert not fn, f"false negatives: {fn[:3]}"
    fp = sum(1 for r in out if not r["is_member"] and r["maybe_member"])
    # fpp=0.01 target; allow generous slack on 2000 probes
    assert fp <= 0.05 * 2000, f"false-positive rate too high: {fp}/2000"


def test_probe_is_map_only(spark, tmp_path):
    members = [f"bench-{i}" for i in range(100)]
    packed, m, k = _fit(spark, members)
    p = str(tmp_path / "c.parquet")
    spark.createDataFrame([(f"x{i}",) for i in range(50)], "v string").write.mode(
        "overwrite"
    ).parquet(p)
    out = bloom_probe(spark.read.parquet(p), "v", packed, m, k)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # the corpus subtree must not shuffle: the only exchanges allowed are
    # the broadcast of the packed bitmap and the bitmap build's own
    # (tiny) aggregations feeding it
    corpus_side = plan.split("BroadcastNestedLoopJoin")[0]
    assert "Exchange" not in corpus_side.split("Scan parquet")[-1], plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_build_is_mergeable_bit_or(spark):
    """Two shard filters OR together into exactly the filter built over
    the union — the property that makes the build embarrassingly
    distributable."""
    a = [f"a-{i}" for i in range(50)]
    b = [f"b-{i}" for i in range(50)]
    m, k = bloom_params(100, fpp=0.01)
    fa = bloom_build(spark.createDataFrame([(v,) for v in a], "v string"), "v", m, k)
    fb = bloom_build(spark.createDataFrame([(v,) for v in b], "v string"), "v", m, k)
    merged = (
        fa.unionByName(fb).groupBy("word").agg(F.bit_or("bits").alias("bits"))
    )
    direct = bloom_build(
        spark.createDataFrame([(v,) for v in a + b], "v string"), "v", m, k
    )
    got = {r["word"]: r["bits"] for r in merged.collect()}
    want = {r["word"]: r["bits"] for r in direct.collect()}
    assert got == want


def test_md5_mode_same_contract_and_python_replay(spark):
    """hash_mode="md5" (the oracle-paired path) keeps the Bloom
    contract — zero false negatives — and its positions replay exactly
    in pure Python (int(md5('bl{i}-'+v)[:8],16) % m), so the DuckDB
    twin's position-set reformulation reads the same bits."""
    import hashlib

    members = [f"bench-{i}" for i in range(200)]
    m, k = bloom_params(len(members), fpp=0.01)
    bench = spark.createDataFrame([(v,) for v in members], "v string")
    packed = bloom_pack(bloom_build(bench, "v", m, k, hash_mode="md5"), m)
    probe = spark.createDataFrame(
        [(v, True) for v in members] + [(f"other-{i}", False) for i in range(1000)],
        "v string, is_member boolean",
    )
    out = bloom_probe(probe, "v", packed, m, k, hash_mode="md5").collect()
    assert not [r for r in out if r["is_member"] and not r["maybe_member"]]
    fp = sum(1 for r in out if not r["is_member"] and r["maybe_member"])
    assert fp <= 0.05 * 1000, f"false-positive rate too high: {fp}/1000"

    # pure-Python replay of the position arithmetic = the bloom itself
    def pos(v: str, i: int) -> int:
        return int(hashlib.md5(f"bl{i}-{v}".encode()).hexdigest()[:8], 16) % m

    sset = {pos(v, i) for v in members for i in range(k)}
    expected = {r["v"]: all(pos(r["v"], i) in sset for i in range(k)) for r in out}
    assert {r["v"]: r["maybe_member"] for r in out} == expected
