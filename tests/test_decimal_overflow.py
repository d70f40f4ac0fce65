"""Decimal-sum overflow posture (r12 axis).

The engine's money aggregates sum DECIMAL casts (relational.py: exact,
cross-engine-stable). Spark widens a sum(decimal(p,s)) accumulator by
10 digits capped at 38 -- sum(decimal(12,2)) -> decimal(22,2), i.e.
10^20 money units of headroom, safe for realistic 100 TB fact tables
(~10^12 rows x ~10^4 prices = 10^16) but NOT for hostile near-max
values (10^10 rows x 10^10 = overflow at exactly lake scale). At the
boundary the three engines-and-configs split three ways, pinned here:
ANSI on (the session default -- deliberately NOT overridden by
session.tune) is LOUD; ANSI off -- the legacy-migration config the
partition sweep proves value-identical at gate SFs -- silently
returns NULL (a downstream coalesce turns total revenue into 0);
DuckDB is loud. Posture: keep ANSI on; if a deployment must run
ansi=false, overflow loudness is forfeited and a magnitude gate on
the money column is the substitute.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F


def test_decimal_sum_overflow_three_postures(spark):
    big = Decimal("9" * 36 + ".99")  # near decimal(38,2) max
    df = spark.createDataFrame([(big,) for _ in range(4)], "v decimal(38,2)")

    # session default: loud
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    import pytest

    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE|overflow"):
        df.agg(F.sum("v")).collect()

    # legacy config: the SILENT class
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        assert df.agg(F.sum("v")).collect()[0][0] is None
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")

    # the oracle engine is loud too -- no cross-engine silent split
    # under the shipping config
    import duckdb

    with pytest.raises(Exception, match="(?i)overflow|out of range"):
        duckdb.connect().execute(
            "SELECT sum(v) FROM (SELECT CAST('"
            + "9" * 36
            + ".99' AS DECIMAL(38,2)) v FROM range(4))"
        ).fetchone()


def test_money_accumulator_headroom_is_ten_digits(spark):
    """The engine's money shape: sum(decimal(12,2)) accumulates in
    decimal(22,2) -- the headroom arithmetic the module docstring
    relies on, pinned so a Spark default change surfaces loudly."""
    df = spark.createDataFrame([(Decimal("1.00"),)], "v decimal(12,2)")
    assert df.agg(F.sum("v")).schema[0].dataType.simpleString() == "decimal(22,2)"
