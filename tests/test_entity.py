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


def test_null_scored_fields_do_not_void_pairs(spark):
    """Round-9 ADVICE: a NULL in any scored field used to NULL the
    whole units sum and silently drop the pair.  Now NULL agreement
    flags coalesce to 0 — a pair whose OTHER fields clear the
    threshold still matches, with the NULL field contributing
    nothing."""
    rows = [
        # identical name+phone+city; one NULL segment, one NULL bal —
        # units = 500k(name) + 200k(phone) + 100k(city) = 800k >= 750k
        (1, "alice beta gamma", "1-234", 3, None, 500),
        (2, "alice beta gamma", "1-234", 3, "B", None),
        # a NULL-name record must not crash anything (it can never
        # reach threshold under the default weights: name term 0 +
        # other 0.5 max < 0.75) — and must not pair
        (3, None, "9-999", 1, "A", 100),
        (4, "delta epsilon zeta", "9-999", 1, "A", 100),
    ]
    recs = spark.createDataFrame(
        rows,
        "rec_id long, name string, phone string, city int, segment string, bal_cents long",
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in entity_match_pairs(recs, max_name_len=20).collect()
    }
    assert (1, 2) in out, out
    r = out[(1, 2)]
    assert r["segment_eq"] == 0 and r["bal_cents_eq"] == 0
    assert abs(r["score"] - 0.8) < 1e-12
    assert all(3 not in pair for pair in out), out


def test_name_longer_than_contract_raises(spark):
    """Round-9 ADVICE: max_name_len was an unchecked caller contract —
    a longer name widens the reachable distance and silently voids the
    completeness proof.  The projection now raises at execution."""
    rows = [
        (1, "a name well beyond twenty characters", "1-1", 0, "A", 1),
        (2, "short name", "2-2", 0, "A", 1),
    ]
    recs = spark.createDataFrame(
        rows,
        "rec_id long, name string, phone string, city int, segment string, bal_cents long",
    )
    with pytest.raises(Exception, match="max_name_len"):
        entity_match_pairs(recs, max_name_len=20).collect()


def test_mass_shared_block_key_raises_not_drops(spark):
    """Round-9 verdict #2: one legitimately mass-shared phone (a
    call-center number, a non-NULL placeholder) makes that key's
    candidate set quadratic in one task.  The guard counts per-key
    block sizes in the same pass and RAISES — never a silent drop,
    which would break the provable-completeness contract.  Below the
    cap the planted pair still comes out (completeness intact)."""
    rows = [
        (i, f"person number {i:03d}x", "0-0000000", i % 5, "A", i * 7)
        for i in range(1, 31)
    ]
    recs = spark.createDataFrame(
        rows,
        "rec_id long, name string, phone string, city int, segment string, bal_cents long",
    )
    with pytest.raises(Exception, match="max_block_key"):
        entity_match_pairs(recs, max_name_len=20, max_block_key=20).collect()
    # same data under a cap that fits: runs clean, and exact-name
    # shared-phone self-dup planted below clears the threshold
    dup = recs.unionByName(
        spark.createDataFrame(
            [(1001, "person number 001x", "0-0000000", 1, "A", 7)],
            "rec_id long, name string, phone string, city int, segment string, bal_cents long",
        )
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in entity_match_pairs(dup, max_name_len=20, max_block_key=100).collect()
    }
    assert (1, 1001) in got


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


def test_blocking_equals_quadratic_truth_or_raises(spark):
    """THE completeness property (fixed-seed random sweep): for random
    weight/threshold/depth configurations, entity_match_pairs either
    refuses (guard) or its blocked output EXACTLY equals the quadratic
    all-pairs truth recomputed in pure Python with the same integer
    scoring — no silently dropped matches, ever."""
    import itertools
    import math
    import random

    from csv_query_engine_spark.pipeline.entity import entity_match_pairs

    rng = random.Random(31)
    segs = ["A", "B", "C"]
    rows = []
    for i in range(1, 41):
        name = f"record#{i:04d}xx"
        phone = f"{i % 7}-{(i * 37) % 1000}"
        rows.append((i, name, phone, i % 5, segs[i % 3], (i * 97) % 400))
        if i % 4 == 0:  # planted typo twin, shared phone
            p = (i % (len(name) - 1)) + 1
            rows.append((i + 1000, name[:p] + name[p + 1:], phone, i % 5, segs[i % 3], (i * 97) % 400))
    recs = spark.createDataFrame(
        rows, "rec_id long, name string, phone string, city int, segment string, bal_cents long"
    )
    max_len = max(len(r[1]) for r in rows)

    def py_truth(wn, wx, t):
        out = set()
        for a, b in itertools.combinations(rows, 2):
            dist = _lev(a[1], b[1])
            m = max(len(a[1]), len(b[1]))
            units = math.floor(wn * (1.0 - dist / m) + 0.5)
            for (f_idx, w) in wx:
                units += w * (a[f_idx] == b[f_idx])
            if units >= t:
                out.add((min(a[0], b[0]), max(a[0], b[0])))
        return out

    def _lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    field_idx = {"phone": 2, "city": 3, "segment": 4, "bal_cents": 5}
    ran = refused = 0
    for _trial in range(8):
        name_w = rng.choice([0.4, 0.5, 0.6])
        ws = {f: rng.choice([0.05, 0.1, 0.2]) for f in field_idx}
        thr = rng.choice([0.6, 0.7, 0.75, 0.8, 0.9])
        depth = rng.choice([1, 2])
        wn = round(name_w * 1e6)
        wx = [(field_idx[f], round(w * 1e6)) for f, w in ws.items()]
        try:
            got = {
                (r["id_a"], r["id_b"])
                for r in entity_match_pairs(
                    recs,
                    name_weight=name_w,
                    exact_weights=ws,
                    threshold=thr,
                    block_dist=depth,
                    max_name_len=max_len,
                ).collect()
            }
        except ValueError:
            refused += 1
            continue
        ran += 1
        truth = py_truth(wn, wx, round(thr * 1e6))
        assert got == truth, (
            name_w, ws, thr, depth,
            sorted(truth - got)[:5], sorted(got - truth)[:5],
        )
    assert ran >= 3 and refused >= 1, (ran, refused)  # both branches exercised
