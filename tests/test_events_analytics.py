"""Funnel / cohort-retention / SCD2 operator tests (hand-checked)."""

from __future__ import annotations

from datetime import datetime

import pytest

from spark_ifs_spark.operators import events_analytics


def _ts(day: int, hour: int = 0) -> datetime:
    return datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def events(spark):
    # u1: full ordered funnel; u2: click BEFORE any view (must not count
    # as click-after-view); u3: view only
    rows = [
        (0, _ts(1), 1, "view"),
        (1, _ts(2), 1, "click"),
        (2, _ts(3), 1, "purchase"),
        (3, _ts(1), 2, "click"),
        (4, _ts(2), 2, "view"),
        (5, _ts(10), 2, "purchase"),
        (6, _ts(1), 3, "view"),
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])


def test_funnel_order_matters(spark, events):
    out = {
        r["stage"]: r["users"]
        for r in events_analytics.funnel_counts(
            events, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    # u2's click precedes their first view -> only u1 clicks after view;
    # u2's purchase chains off nothing (no click after view)
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_cohort_retention_grid(spark):
    # u1 first active week of Jan 1 (Mon), active again week of Jan 8;
    # u2 first active week of Jan 8 only
    rows = [
        (0, _ts(2), 1, "view"),
        (1, _ts(9), 1, "view"),
        (2, _ts(10), 2, "view"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in events_analytics.cohort_retention(df, "user_id", "ts").collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }


def test_scd2_interval_chain(spark, events):
    out = events_analytics.scd2_intervals(
        events, "user_id", "ts", "event_id", ["event_type"]
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r["valid_from_us"])
        # chain property: each interval ends where the next begins;
        # exactly one open interval per user, and it is the last one
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]
        assert rows[-1]["valid_to_us"] is None
        assert all(r["valid_to_us"] is not None for r in rows[:-1])


def test_transition_matrix_hand_checked(spark):
    rows = [
        (0, _ts(1), 1, "a"),
        (1, _ts(2), 1, "b"),
        (2, _ts(3), 1, "a"),
        (3, _ts(4), 1, "b"),
        (4, _ts(1), 2, "a"),
        (5, _ts(2), 2, "c"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {
        (r["from_type"], r["to_type"]): (r["c"], r["p_micro"])
        for r in events_analytics.transition_matrix(
            df, "user_id", "ts", "event_id", "event_type"
        ).collect()
    }
    # from 'a': a->b twice (u1), a->c once (u2); from 'b': b->a once
    assert out[("a", "b")] == (2, 666666)
    assert out[("a", "c")] == (1, 333333)
    assert out[("b", "a")] == (1, 1000000)
    # transitions never cross users: no (b, a) from u2, no (c, ...) rows
    assert ("c", "a") not in out and len(out) == 3


def test_funnel_empty_first_stage(spark):
    df = spark.createDataFrame(
        [(0, _ts(1), 1, "click")], ["event_id", "ts", "user_id", "event_type"]
    )
    out = {
        r["stage"]: r["users"]
        for r in events_analytics.funnel_counts(
            df, "user_id", "ts", "event_type", ["view", "click"]
        ).collect()
    }
    assert out == {"view": 0, "click": 0}


def test_transition_matrix_single_event_users(spark):
    # one event per user -> no transitions at all
    rows = [(i, _ts(1 + i), i, "a") for i in range(3)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    assert (
        events_analytics.transition_matrix(
            df, "user_id", "ts", "event_id", "event_type"
        ).count()
        == 0
    )


def test_session_journeys_gap_cut_and_order(spark):
    from datetime import timedelta

    base = datetime(2024, 1, 1)
    rows = [
        # u1 session 1: a>b ; 3h gap ; session 2: c
        (0, base, 1, "a"),
        (1, base + timedelta(minutes=5), 1, "b"),
        (2, base + timedelta(hours=3), 1, "c"),
        # u2 one session identical journey a>b
        (3, base, 2, "a"),
        (4, base + timedelta(minutes=30), 2, "b"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = events_analytics.session_journeys(
        df, "user_id", "ts", "event_id", "event_type", gap_s=3600, k=5
    ).collect()
    got = [(r["journey"], r["n"]) for r in out]
    assert got == [("a>b", 2), ("c", 1)]
