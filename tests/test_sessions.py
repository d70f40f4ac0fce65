"""Planted-case tests for operators.sessions (gap sessionization +
ordered funnel). Oracle parity for the bound queries lives in
test_oracle_parity.py; these prove the SEMANTICS on corpora where the
interesting cases (boundaries, ties, drop-off) are planted."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_upc_syllabus_spark.operators.sessions import (
    funnel_reached,
    session_stats,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    # rows: (event_id, user_id, event_type, offset_seconds, value)
    return spark.createDataFrame(
        [(eid, T0 + dt.timedelta(seconds=off), uid, et, val) for eid, uid, et, off, val in rows],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )


def test_sessionize_gap_boundaries(spark):
    gap = 600 * 1_000_000  # 10 minutes
    df = _ev(
        spark,
        [
            # user 1: two events 5 min apart (one session), then a 20 min
            # hole (new session), then exactly-at-gap (NOT a new session:
            # rule is strictly greater), then gap+1us would be new -- use
            # +601s to cross it.
            (1, 1, "view", 0, 1.0),
            (2, 1, "view", 300, 1.0),
            (3, 1, "view", 1500, 1.0),
            (4, 1, "view", 2100, 1.0),  # exactly 600s after -> same session
            (5, 1, "view", 2701, 1.0),  # 601s after -> new session
            # user 2: single event
            (6, 2, "click", 50, 2.5),
        ],
    )
    out = {
        (r["event_id"]): r["session_id"]
        for r in sessionize(df, gap_us=gap).select("event_id", "session_id").collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 1}


def test_sessionize_tie_order_is_event_id(spark):
    # identical timestamps: order_col breaks the tie deterministically,
    # so the lag chain (and session numbering) is stable
    df = _ev(spark, [(10, 1, "view", 0, 1.0), (11, 1, "view", 0, 1.0)])
    out = sessionize(df, gap_us=1).select("event_id", "session_id").collect()
    got = {r["event_id"]: r["session_id"] for r in out}
    assert got == {10: 1, 11: 1}  # 0-gap <= 1us: same session


def test_session_stats_rollup(spark):
    gap = 600 * 1_000_000
    df = _ev(
        spark,
        [
            (1, 1, "view", 0, 1.25),
            (2, 1, "view", 120, 2.50),
            (3, 1, "view", 5000, 4.00),
        ],
    )
    stats = {
        r["session_id"]: r
        for r in session_stats(sessionize(df, gap_us=gap)).collect()
    }
    assert stats[1]["n_events"] == 2
    assert stats[1]["duration_us"] == 120 * 1_000_000
    assert abs(stats[1]["total_value"] - 3.75) < 1e-9
    assert stats[2]["n_events"] == 1 and stats[2]["duration_us"] == 0


def test_funnel_order_matters(spark):
    df = _ev(
        spark,
        [
            # user 1 completes in order
            (1, 1, "view", 0, 0.0),
            (2, 1, "click", 10, 0.0),
            (3, 1, "purchase", 20, 0.0),
            # user 2: purchase BEFORE any view -> purchase must not count;
            # clicks after view count, purchase never re-occurs
            (4, 2, "purchase", 0, 0.0),
            (5, 2, "view", 10, 0.0),
            (6, 2, "click", 20, 0.0),
            # user 3: click only before view -> stuck at stage 1
            (7, 3, "click", 0, 0.0),
            (8, 3, "view", 10, 0.0),
            # user 4: never views -> absent from output entirely
            (9, 4, "click", 0, 0.0),
        ],
    )
    out = {
        r["user_id"]: r
        for r in funnel_reached(df, stages=("view", "click", "purchase")).collect()
    }
    assert set(out) == {1, 2, 3}
    us = 1_000_000
    assert (out[1]["view_us"], out[1]["click_us"], out[1]["purchase_us"]) == (
        T0.timestamp() * us,
        T0.timestamp() * us + 10 * us,
        T0.timestamp() * us + 20 * us,
    )
    assert out[2]["click_us"] > 0 and out[2]["purchase_us"] == -1
    assert out[3]["click_us"] == -1 and out[3]["purchase_us"] == -1


def test_funnel_strictly_after(spark):
    # click at the SAME microsecond as the first view does not count
    df = _ev(
        spark,
        [
            (1, 1, "view", 0, 0.0),
            (2, 1, "click", 0, 0.0),
            (3, 1, "click", 5, 0.0),
        ],
    )
    row = funnel_reached(df, stages=("view", "click")).collect()[0]
    assert row["click_us"] == row["view_us"] + 5 * 1_000_000


def test_debounce_compares_to_last_kept_not_last_event(spark):
    from etl_upc_syllabus_spark.operators.sessions import debounce, sessionize

    # t = 0, 5, 9 with gap 6: debounce keeps {0, 9} (9 - 0 > 6); the
    # session-boundary rule would keep only {0} (no gap-to-previous > 6)
    df = _ev(spark, [(1, 1, "view", 0, 0.0), (2, 1, "view", 5, 0.0), (3, 1, "view", 9, 0.0)])
    gap = 6 * 1_000_000
    kept = sorted(r["event_id"] for r in debounce(df, gap_us=gap).collect())
    assert kept == [1, 3]
    n_sessions = (
        sessionize(df, gap_us=gap).agg(F.max("session_id")).collect()[0][0]
    )
    assert n_sessions == 1  # the rule genuinely differs


def test_debounce_first_event_always_kept_per_user(spark):
    from etl_upc_syllabus_spark.operators.sessions import debounce

    df = _ev(spark, [(1, 1, "view", 0, 0.0), (2, 2, "view", 1, 0.0), (3, 2, "view", 2, 0.0)])
    out = {(r["user_id"], r["event_id"]) for r in debounce(df, gap_us=10**9).collect()}
    assert out == {(1, 1), (2, 2)}
