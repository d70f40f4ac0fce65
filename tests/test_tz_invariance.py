"""A driver session with a hostile timezone must not move values.

The driver (and any production Spark deployment) hands queries() a
session the engine did not build; if that cluster's default timezone
is not UTC, every date_trunc / window boundary / timestamp collect
shifts unless the engine re-pins semantics itself. The contract is
``session.tune()`` inside the ``__spark_entry__._wrap`` layer -- so
this suite deliberately sets the SESSION timezone to Kathmandu
(+05:45, the nastiest real offset) and drives the timestamp-heaviest
queries through the PUBLIC driver surface, asserting oracle values
still match. The full 33-query TZ-hostile sweep (env + JVM
user.timezone + session default all Kathmandu) is recorded in
BASELINE.md r8; this twin pins the session-conf axis per commit.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as mod

from .oracle_harness import compare, duckdb_run

PICKS = [
    "date_functions",
    "events_sessionize",
    "timeseries_gap_fill",
    "window_range_frame",
    "events_hourly_profile",
]


@pytest.fixture(scope="module")
def hostile_tz(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


@pytest.mark.parametrize("name", PICKS)
def test_hostile_session_tz_reproduces_oracle(hostile_tz, sf_dir, name):
    # through the PUBLIC surface: _wrap -> tune() must re-pin UTC
    q, o = mod.queries(), mod.oracle_sql()
    sdf = q[name](hostile_tz, sf_dir)
    compare(sdf, duckdb_run(o[name], sf_dir), name)
    # the fixture's conf is what the NEXT query build sees; tune()
    # re-pins on every wrapped call, so hostile stays hostile here
    # only until the next q[...](...) -- assert the re-pin happened
    assert hostile_tz.conf.get("spark.sql.session.timeZone") == "UTC"
    hostile_tz.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
