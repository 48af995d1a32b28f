"""Unit tests for operators/merge.py: MERGE upsert resolution paths and
SCD2 versioning semantics on small synthetic frames (the registry
queries cover the oracle-checked end-to-end paths)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from csv_query_engine_spark.operators.merge import merge_upsert, scd2_apply


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_merge_upsert_update_insert_carry(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, name string, v double"
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k int, name string, v double"
    )
    got = {r["k"]: r for r in merge_upsert(target, source, ["k"]).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["name"] == "a" and got[1]["v"] == 10.0  # carry-through
    assert got[2]["name"] == "B" and got[2]["v"] == 99.0  # updated
    assert got[4]["name"] == "d" and got[4]["v"] == 40.0  # inserted


def test_merge_upsert_partial_update_cols(spark):
    target = spark.createDataFrame([(1, "a", 10.0)], "k int, name string, v double")
    source = spark.createDataFrame([(1, "Z", 99.0)], "k int, name string, v double")
    row = merge_upsert(target, source, ["k"], update_cols=["v"]).collect()[0]
    assert row["name"] == "a" and row["v"] == 99.0  # only v listed


def test_merge_upsert_source_dedup_is_key_unique(spark):
    target = spark.createDataFrame([(1, 0.0)], "k int, v double")
    source = spark.createDataFrame([(1, 5.0), (1, 5.0)], "k int, v double")
    out = merge_upsert(target, source, ["k"]).collect()
    assert len(out) == 1 and out[0]["v"] == 5.0


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k int, attr string, valid_from timestamp, valid_to timestamp, is_current boolean"
    )


def test_scd2_change_closes_and_opens(spark):
    dim = _dim(spark, [(1, "x", _ts("1995-01-01"), None, True)])
    changes = spark.createDataFrame(
        [(1, "y", _ts("2000-01-01"))], "k int, attr string, change_ts timestamp"
    )
    hist = scd2_apply(dim, changes, ["k"], ["attr"], "change_ts")
    rows = sorted(hist.collect(), key=lambda r: (r["valid_from"]))
    assert len(rows) == 2
    closed, opened = rows
    assert closed["attr"] == "x" and closed["valid_to"] == _ts("2000-01-01")
    assert closed["is_current"] is False
    assert opened["attr"] == "y" and opened["valid_from"] == _ts("2000-01-01")
    assert opened["valid_to"] is None and opened["is_current"] is True


def test_scd2_noop_change_is_idempotent(spark):
    dim = _dim(spark, [(1, "x", _ts("1995-01-01"), None, True)])
    changes = spark.createDataFrame(
        [(1, "x", _ts("2000-01-01"))], "k int, attr string, change_ts timestamp"
    )
    rows = scd2_apply(dim, changes, ["k"], ["attr"], "change_ts").collect()
    assert len(rows) == 1 and rows[0]["is_current"] is True
    assert rows[0]["valid_to"] is None


def test_scd2_new_key_inserts_open_row(spark):
    dim = _dim(spark, [(1, "x", _ts("1995-01-01"), None, True)])
    changes = spark.createDataFrame(
        [(2, "z", _ts("2001-06-01"))], "k int, attr string, change_ts timestamp"
    )
    rows = {r["k"]: r for r in scd2_apply(dim, changes, ["k"], ["attr"], "change_ts").collect()}
    assert rows[2]["valid_from"] == _ts("2001-06-01") and rows[2]["is_current"] is True


def test_scd2_latest_change_wins_and_history_passthrough(spark):
    dim = _dim(
        spark,
        [
            (1, "x0", _ts("1990-01-01"), _ts("1995-01-01"), False),  # closed history
            (1, "x", _ts("1995-01-01"), None, True),
        ],
    )
    changes = spark.createDataFrame(
        [(1, "mid", _ts("1999-01-01")), (1, "late", _ts("2000-01-01"))],
        "k int, attr string, change_ts timestamp",
    )
    hist = scd2_apply(dim, changes, ["k"], ["attr"], "change_ts")
    rows = sorted(hist.collect(), key=lambda r: r["valid_from"])
    assert [r["attr"] for r in rows] == ["x0", "x", "late"]
    assert rows[1]["valid_to"] == _ts("2000-01-01")  # closed at the LATEST change
    assert hist.filter(F.col("is_current")).count() == 1


def test_scd2_no_udf_no_cartesian(spark):
    import contextlib
    import io

    dim = _dim(spark, [(1, "x", _ts("1995-01-01"), None, True)])
    changes = spark.createDataFrame(
        [(1, "y", _ts("2000-01-01"))], "k int, attr string, change_ts timestamp"
    )
    df = scd2_apply(dim, changes, ["k"], ["attr"], "change_ts")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Cartesian" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_snapshot_diff_classifies_and_roundtrips(spark):
    from csv_query_engine_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, name string, v double",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 value-changed, 3 deleted, 5 inserted
        [(1, "a", 10.0), (2, "b", 99.0), (4, "D", 41.0), (5, "e", 50.0)],
        "k int, name string, v double",
    )
    d = snapshot_diff(old, new, ["k"])
    rows = {r["k"]: r for r in d.collect()}
    assert set(rows) == {2, 3, 4, 5}  # unchanged key 1 emits nothing
    assert rows[2]["change_type"] == "update" and rows[2]["changed_cols"] == ["v"]
    assert rows[4]["changed_cols"] == ["name", "v"]  # sorted col list
    assert rows[3]["change_type"] == "delete" and rows[3]["v"] is None
    assert rows[5]["change_type"] == "insert" and rows[5]["changed_cols"] == []
    # diff applied back to old reproduces new: upsert the non-deletes,
    # anti-join the deletes.
    upserts = d.filter(F.col("change_type") != "delete").select("k", "name", "v")
    deletes = d.filter(F.col("change_type") == "delete").select("k")
    rebuilt = merge_upsert(old, upserts, ["k"]).join(deletes, "k", "left_anti")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))


def test_refresh_aggregate_merge_equals_full_recompute(spark):
    """state(base) ⊕ state(delta) must be BIT-equal to state(base ∪
    delta) for any split — the associativity contract; and retraction
    cancels exactly, dropping emptied keys."""
    from csv_query_engine_spark.operators.merge import aggregate_state, refresh_aggregate

    rows = [(i % 5, float(i) * 0.7 + 0.01) for i in range(100)]
    df = spark.createDataFrame(rows, "g int, v double")
    base, delta = df.filter("v < 35"), df.filter("v >= 35")
    full = aggregate_state(df, ["g"], {"v_u": F.col("v")})
    merged = refresh_aggregate(
        aggregate_state(base, ["g"], {"v_u": F.col("v")}),
        aggregate_state(delta, ["g"], {"v_u": F.col("v")}),
        ["g"],
        ["v_u"],
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    # retract group 0 entirely: its key must vanish from the state
    retract = aggregate_state(
        df.filter("g = 0"), ["g"], {"v_u": F.col("v")}, sign=-1
    )
    after = refresh_aggregate(merged, retract, ["g"], ["v_u"])
    got = sorted(map(tuple, after.collect()))
    want = sorted(t for t in map(tuple, full.collect()) if t[0] != 0)
    assert got == want


# ----------------------------------------------------- join-view IVM


def _ivm_fixture(spark):
    fact = spark.createDataFrame(
        [(1, 10, "A", 5.0), (2, 10, "B", 6.0), (3, 20, "A", 7.0), (4, 30, "C", 8.0)],
        "fk int, dk int, st string, v double",
    )
    dim = spark.createDataFrame(
        [(10, "x"), (20, "y"), (30, "z")], "dk int, seg string"
    )
    view = fact.join(dim, "dk").select("fk", "dk", "st", "v", "seg")
    return fact, dim, view


def test_refresh_join_view_equals_full_recompute(spark):
    from csv_query_engine_spark.operators.merge import refresh_join_view

    fact, dim, view = _ivm_fixture(spark)
    # delete fk=2, update fk=3 (v -> 70), insert fk=5 (new dim key 20)
    delta = spark.createDataFrame(
        [
            (2, 10, "B", 6.0, "delete"),
            (3, 20, "A", 70.0, "upsert"),
            (5, 20, "D", 9.0, "upsert"),
        ],
        "fk int, dk int, st string, v double, change_type string",
    )
    got = refresh_join_view(view, delta, dim, ["fk"], ["dk"])
    new_fact = spark.createDataFrame(
        [(1, 10, "A", 5.0), (3, 20, "A", 70.0), (4, 30, "C", 8.0), (5, 20, "D", 9.0)],
        "fk int, dk int, st string, v double",
    )
    want = new_fact.join(dim, "dk").select(*got.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_refresh_join_view_dim_update_delete_insert_ignored(spark):
    from csv_query_engine_spark.operators.merge import refresh_join_view_dim

    fact, dim, view = _ivm_fixture(spark)
    delta = spark.createDataFrame(
        [
            (10, "X", "upsert"),   # attribute overwrite
            (20, "y", "delete"),   # dim-key retraction drops view rows
            (99, "q", "upsert"),   # insert of an unseen key: no-op (inner view)
        ],
        "dk int, seg string, change_type string",
    )
    got = refresh_join_view_dim(view, delta, ["dk"], ["seg"]).collect()
    by_fk = {r["fk"]: r for r in got}
    assert set(by_fk) == {1, 2, 4}          # fk=3 dropped with dk=20
    assert by_fk[1]["seg"] == "X" and by_fk[2]["seg"] == "X"
    assert by_fk[4]["seg"] == "z"            # untouched key carries through
    assert all(r["dk"] != 99 for r in got)


def test_refresh_join_view_no_cartesian(spark):
    from csv_query_engine_spark.operators.merge import refresh_join_view

    fact, dim, view = _ivm_fixture(spark)
    delta = spark.createDataFrame(
        [(2, 10, "B", 6.0, "delete")],
        "fk int, dk int, st string, v double, change_type string",
    )
    plan = refresh_join_view(view, delta, dim, ["fk"], ["dk"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_refresh_join_aggregate_equals_full_recompute(spark):
    """The composed IVM stack: maintained agg-over-join state must be
    BIT-equal to re-aggregating the refreshed join from scratch."""
    from csv_query_engine_spark.operators.merge import (
        aggregate_state,
        refresh_aggregate,
        refresh_join_aggregate,
        refresh_join_view,
    )

    fact, dim, view = _ivm_fixture(spark)
    state0 = aggregate_state(view, ["seg"], {"v_u": F.col("v")})
    delta = spark.createDataFrame(
        [
            (2, 10, "B", 6.0, "delete"),
            (3, 20, "A", 70.5, "upsert"),
            (5, 20, "D", 9.25, "upsert"),
        ],
        "fk int, dk int, st string, v double, change_type string",
    )
    got = refresh_join_aggregate(
        state0, view, delta, dim, ["fk"], ["dk"], ["seg"], {"v_u": F.col("v")}
    )
    new_view = refresh_join_view(view, delta, dim, ["fk"], ["dk"])
    want = aggregate_state(new_view, ["seg"], {"v_u": F.col("v")})
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # a group whose every row retracted must drop out of the state
    delta_all = spark.createDataFrame(
        [(4, 30, "C", 8.0, "delete")],
        "fk int, dk int, st string, v double, change_type string",
    )
    got2 = refresh_join_aggregate(
        got, new_view, delta_all, dim, ["fk"], ["dk"], ["seg"], {"v_u": F.col("v")}
    )
    assert all(r["seg"] != "z" for r in got2.collect())


def test_refresh_join_view_shuffled_keys_path(spark):
    """broadcast_keys=False (backfill-sized deltas) must produce the
    same rows through the shuffled anti join."""
    from csv_query_engine_spark.operators.merge import refresh_join_view

    fact, dim, view = _ivm_fixture(spark)
    delta = spark.createDataFrame(
        [(2, 10, "B", 6.0, "delete"), (5, 20, "D", 9.0, "upsert")],
        "fk int, dk int, st string, v double, change_type string",
    )
    a = refresh_join_view(view, delta, dim, ["fk"], ["dk"], broadcast_keys=True)
    b = refresh_join_view(view, delta, dim, ["fk"], ["dk"], broadcast_keys=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
