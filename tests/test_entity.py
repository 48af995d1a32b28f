"""pipeline/entity.py: planted-entity recall/precision, transitive
cluster recovery, and the blocking-completeness guard.  Cross-engine
exactness is covered by test_queries_oracle.py
(customer_entity_resolution_pairs)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from csv_query_engine_spark.pipeline.entity import (
    entity_clusters,
    entity_match_pairs,
    synthetic_entity_records,
)


def _records(spark):
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    return synthetic_entity_records(cust)


def test_planted_pairs_recall_and_precision(spark):
    """Every emitted pair links records of ONE planted entity (zero
    false merges despite the adversarial distance-1 neighbor names),
    and pair recall over the planted duplicates is >= 0.9 (the only
    misses are typo-vs-typo pairs at distance 2, which score 0.741 <
    0.75 by design and are recovered transitively — see the cluster
    test)."""
    recs = _records(spark)
    got = {
        (r["id_a"], r["id_b"])
        for r in entity_match_pairs(recs, max_name_len=20).collect()
    }
    ents: dict[int, list[int]] = {}
    for r in recs.select("rec_id").collect():
        ents.setdefault(r["rec_id"] // 10, []).append(r["rec_id"])
    truth = {
        p
        for ids in ents.values()
        for p in itertools.combinations(sorted(ids), 2)
    }
    assert not (got - truth), f"false merges: {sorted(got - truth)[:5]}"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, recall


def test_clusters_recover_every_planted_entity_exactly(spark):
    """Connected components over the matched pairs must equal the
    planted entity partition EXACTLY: distance-2 typo-typo pairs that
    miss the pairwise threshold still join through the canonical
    record, and no cluster spans two entities."""
    recs = _records(spark)
    out = entity_clusters(recs, max_name_len=20).collect()
    by_entity: dict[int, set[int]] = {}
    for r in out:
        by_entity.setdefault(r["rec_id"] // 10, set()).add(r["entity_id"])
    # one cluster per entity...
    assert all(len(v) == 1 for v in by_entity.values())
    # ...and one entity per cluster
    label_owner: dict[int, int] = {}
    for r in out:
        e = r["rec_id"] // 10
        assert label_owner.setdefault(r["entity_id"], e) == e
    # cluster sizes match the planting rule (1 + [ck%3==0] + [ck%5==0] + [ck%7==0])
    sizes = {r["rec_id"]: r["n_records"] for r in out}
    for r in out:
        ck = r["rec_id"] // 10
        want = 1 + (ck % 3 == 0) + (ck % 5 == 0) + (ck % 7 == 0)
        assert sizes[r["rec_id"]] == want, (ck, sizes[r["rec_id"]], want)


def test_incomplete_blocking_is_rejected(spark):
    """A weight/threshold configuration whose completeness bound
    exceeds the deletion-neighborhood depth must raise, never silently
    drop matches."""
    recs = _records(spark)
    with pytest.raises(ValueError, match="blocking incomplete"):
        entity_match_pairs(recs, threshold=0.55, max_name_len=20)


def test_score_components_are_consistent(spark):
    """Emitted scores equal the integer-unit formula recomputed from
    the emitted agreement columns (internal consistency of the one
    FLOOR-quantized ratio + exact weights)."""
    recs = _records(spark)
    rows = (
        entity_match_pairs(recs, max_name_len=20)
        .join(
            recs.select(
                F.col("rec_id").alias("id_a"), F.length("name").alias("len_a")
            ),
            "id_a",
        )
        .join(
            recs.select(
                F.col("rec_id").alias("id_b"), F.length("name").alias("len_b")
            ),
            "id_b",
        )
        .collect()
    )
    assert rows
    import math

    for r in rows:
        m = max(r["len_a"], r["len_b"])
        units = math.floor(500000.0 * (1.0 - r["name_dist"] / m) + 0.5)
        units += (
            200000 * r["phone_eq"]
            + 100000 * r["city_eq"]
            + 50000 * r["segment_eq"]
            + 150000 * r["bal_cents_eq"]
        )
        assert units >= 750000
        assert abs(r["score"] - units / 1e6) < 1e-12, r
