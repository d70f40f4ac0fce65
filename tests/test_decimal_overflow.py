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


def test_magnitude_gate_closes_the_silent_null_class(spark):
    """VERDICT r12 item 4: the posture table's ansi=false substitute is
    now shipped code. With hostile near-max rows quarantined by
    curation.quarantine_magnitude at the sum_headroom_max_abs bound,
    the ansi=false sum is exact and non-NULL -- the silent-NULL class
    is structurally unreachable on the gated side."""
    from etl_upc_syllabus_spark.operators.curation import (
        quarantine_magnitude,
        sum_headroom_max_abs,
    )

    big = Decimal("9" * 36 + ".99")
    rows = [(big,), (big,), (Decimal("19.99"),), (Decimal("-7.50"),), (None,)]
    df = spark.createDataFrame(rows, "v decimal(38,2)")

    # headroom arithmetic: decimal(38,2) accumulates in decimal(38,2)
    # (already at the cap), capacity (10^38 - 1) units of 0.01 floor-
    # divided over the row bound: (2*10^37 - 1) * 0.01
    bound = sum_headroom_max_abs(38, 2, max_rows=len(rows))
    assert bound == Decimal("1" + "9" * 35 + ".99")

    clean, quarantined = quarantine_magnitude(df, "v", bound)
    # NULL stays clean; both near-max rows carry the magnitude reason
    assert {str(r["quarantine_reason"]) for r in quarantined.collect()} == {
        f"magnitude:{big}"
    }
    assert quarantined.count() == 2

    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        total = clean.agg(F.sum("v")).collect()[0][0]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")
    assert total == Decimal("12.49")  # exact, NOT the silent NULL

    # pure filter: streaming-safe like the sibling gates
    from etl_upc_syllabus_spark.streaming.events import read_events_stream

    from .conftest import SF_DIR

    stream = read_events_stream(spark, SF_DIR)
    c, q = quarantine_magnitude(stream, "value", 1_000_000.0)
    assert c.isStreaming and q.isStreaming


def test_magnitude_gate_nan_stays_clean_inf_is_quarantined(spark):
    """Review r13: Spark orders NaN GREATER than every numeric, so the
    bare abs(NaN) > bound comparison is TRUE -- without the explicit
    ~isnan conjunct the gate would mis-attribute NaN (the nonfinite
    gate's axis). +-Inf IS magnitude-quarantined: its magnitude
    genuinely exceeds any bound."""
    from etl_upc_syllabus_spark.operators.curation import quarantine_magnitude

    df = spark.createDataFrame(
        [(1, float("nan")), (2, float("inf")), (3, float("-inf")),
         (4, 1e9), (5, 3.0), (6, None)],
        "id int, v double",
    )
    clean, quar = quarantine_magnitude(df, "v", 100.0)
    assert {r["id"] for r in clean.collect()} == {1, 5, 6}  # NaN + NULL clean
    reasons = {r["id"]: r["quarantine_reason"] for r in quar.collect()}
    assert set(reasons) == {2, 3, 4}
    assert reasons[2] == "magnitude:Infinity"


def test_sum_headroom_bound_is_representable_and_tight(spark):
    """max_rows rows AT the bound must sum inside the accumulator under
    ansi=false (non-NULL), and the bound itself carries the column's
    scale exactly."""
    from etl_upc_syllabus_spark.operators.curation import sum_headroom_max_abs

    import pytest

    # headroom/rows exceeds what decimal(12,2) can even hold (the
    # 10-digit widening covers up to 10^10 rows), so the bound clamps
    # to the COLUMN max -- the gate is a no-op there, correctly
    bound = sum_headroom_max_abs(12, 2, max_rows=1_000_000)
    assert bound == Decimal("9999999999.99")
    df = spark.createDataFrame([(bound,)] * 4, "v decimal(12,2)")
    # 4 <= max_rows at the bound: exact under both ANSI postures
    assert df.agg(F.sum("v")).collect()[0][0] == bound * 4

    # past 10^10 rows the headroom, not the column, binds: capacity
    # (10^22 - 1) units of 0.01 floor-divided over 10^12 rows
    tight = sum_headroom_max_abs(12, 2, max_rows=10**12)
    assert tight == Decimal("99999999.99")
    assert tight < Decimal("9999999999.99")

    with pytest.raises(ValueError, match="max_rows"):
        sum_headroom_max_abs(12, 2, max_rows=0)


def test_magnitude_gate_predicate_is_pushable(spark, tmp_path):
    """The gate's disjunction form must reach the parquet reader so
    row-group stats prune the quarantine-side scan (abs() would push
    only IsNotNull). Pinned on the executed plan's PushedFilters."""
    import re

    from etl_upc_syllabus_spark.operators.curation import quarantine_magnitude

    d = str(tmp_path / "m")
    spark.createDataFrame(
        [(Decimal("5.00"),), (Decimal("9.75"),)], "v decimal(12,2)"
    ).write.parquet(d)
    m = spark.read.parquet(d)
    _, quar = quarantine_magnitude(m, "v", Decimal("100.00"))
    plan = quar._jdf.queryExecution().executedPlan().toString()
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan).group(1)
    assert "Or(GreaterThan" in pushed and "LessThan" in pushed, pushed
