"""Unit semantics for the temporal join operators (ties, unmatched rows,
inner vs left) on tiny inline frames; the oracle sweep covers scale."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from csv_query_engine_spark.operators.temporal import asof_join, range_join_banded


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05 00:00:00")),  # after both orders
            (2, 10, _ts("2024-01-02 00:00:00")),  # exactly at order B's time
            (3, 10, _ts("2023-12-31 00:00:00")),  # before every order
            (4, 20, _ts("2024-06-01 00:00:00")),  # key with no orders
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:00"), 100, 11.0),
            (10, _ts("2024-01-02 00:00:00"), 200, 22.0),
            (10, _ts("2024-01-02 00:00:00"), 201, 23.0),  # tie on ts
        ],
        "user_id long, o_date timestamp, okey long, price double",
    )
    return left, right


def test_asof_inner_picks_latest_and_breaks_ties(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="o_date",
        value_cols=["okey", "price"], tiebreak_cols=["okey"], how="inner",
    )
    rows = {r.event_id: (r.okey, r.price) for r in out.collect()}
    # event 1: latest order at-or-before is the ts-tie pair -> greatest okey wins
    assert rows[1] == (201, 23.0)
    # event 2: order at exactly ts qualifies (<= semantics), tie -> 201
    assert rows[2] == (201, 23.0)
    # events 3 (too early) and 4 (no key) dropped under inner
    assert set(rows) == {1, 2}


def test_asof_left_keeps_unmatched_with_nulls(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="o_date",
        value_cols=["okey"], tiebreak_cols=["okey"], how="left",
    )
    rows = {r.event_id: r.okey for r in out.collect()}
    assert rows[3] is None and rows[4] is None and rows[1] == 201
    assert len(rows) == 4


def test_asof_rejects_unknown_how(spark):
    import pytest

    left, right = _frames(spark)
    for how in ("right", "full", "lleft"):
        with pytest.raises(ValueError, match="asof_join"):
            asof_join(
                left, right, on="user_id", left_ts="ts", right_ts="o_date",
                value_cols=["okey"], how=how,
            )


def test_range_join_banded_half_open_interval(spark):
    left, right = _frames(spark)
    out = range_join_banded(
        left, right, on="user_id", left_ts="ts",
        right_start="o_date", right_end_expr="o_date + INTERVAL 4 DAYS",
    )
    pairs = {(r.event_id, r.okey) for r in out.select("event_id", "okey").collect()}
    # event 1 (Jan 5): inside [Jan 1, Jan 5) is FALSE (half-open), inside
    # [Jan 2, Jan 6) for both tie orders.
    assert pairs == {(1, 200), (1, 201), (2, 100), (2, 200), (2, 201)}


def test_resample_ffill_semantics(spark):
    """Gap cells appear on the grid with n_events=0, keep a NULL bucket
    sum, and carry the LAST observed bucket value forward."""
    import datetime as dt

    from csv_query_engine_spark.operators.temporal import resample_with_ffill

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t0, 10.0),                                  # cell 00:00
        (1, t0 + dt.timedelta(hours=1), 5.0),           # cell 00:00 (same 6h bucket)
        (1, t0 + dt.timedelta(hours=13), 2.0),          # cell 12:00 — 06:00 is a gap
        (2, t0, 7.0),                                   # single-cell key
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {(r["user_id"], r["grid_ts"].hour): r for r in resample_with_ffill(df).collect()}
    assert set(out) == {(1, 0), (1, 6), (1, 12), (2, 0)}
    assert out[(1, 0)]["n_events"] == 2 and out[(1, 0)]["bucket_value"] == 15.0
    gap = out[(1, 6)]
    assert gap["n_events"] == 0 and gap["bucket_value"] is None
    assert gap["filled_value"] == 15.0          # carried forward across the gap
    assert out[(1, 12)]["filled_value"] == 2.0  # new observation resets the fill
    assert out[(2, 0)]["filled_value"] == 7.0
