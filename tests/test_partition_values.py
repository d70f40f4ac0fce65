"""Hostile partition-VALUE posture (r12 probe,
tools/partition_values_probe.py).

A lake laid out by ``partitionBy`` on an uncontrolled string key:
16/18 hostile classes roundtrip and prune exactly (Spark
percent-escapes directory names); the EMPTY STRING and the literal
``__HIVE_DEFAULT_PARTITION__`` silently merge into the NULL sentinel
directory (3-way merge with real NULLs); and the same directories
read DIFFERENTLY from DuckDB (literal sentinel string; no unescaping
of ``a%3Db``-style names). Gate:
``curation.quarantine_partition_keys`` before the write.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_upc_syllabus_spark.operators.curation import quarantine_partition_keys


def test_silent_merge_through_the_null_sentinel_dir(spark, tmp_path):
    """Pinned AS MEASURED: NULL, '' and the literal sentinel all land
    in pv=__HIVE_DEFAULT_PARTITION__ and ALL read back as NULL."""
    d = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "__HIVE_DEFAULT_PARTITION__"), (4, "x")],
        "id int, pv string",
    )
    df.write.partitionBy("pv").parquet(d)
    assert sorted(x for x in os.listdir(d) if x.startswith("pv=")) == [
        "pv=__HIVE_DEFAULT_PARTITION__", "pv=x",
    ]
    back = spark.read.parquet(d)
    assert back.filter(F.col("pv").isNull()).count() == 3  # wrote ONE true null
    assert back.filter(F.col("pv") == "").count() == 0  # the '' row is gone


def test_escaped_classes_roundtrip_and_prune(spark, tmp_path):
    """The non-merging hostile classes are exact: escaped directory
    names roundtrip the value and an equality filter prunes to it."""
    d = str(tmp_path / "t")
    import unicodedata

    # both normalization forms, constructed explicitly (review r12: a
    # precomposed source literal silently pins only the NFC class)
    nfc = unicodedata.normalize("NFC", "S\u00ed")
    nfd = unicodedata.normalize("NFD", "S\u00ed")
    assert nfc != nfd  # distinct partition values by codepoint
    vals = ["a=b", "a/b", "a\nb", "a b", nfc, nfd, "a."]
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id int, pv string"
    ).write.partitionBy("pv").parquet(d)
    back = spark.read.parquet(d)
    assert sorted(r["pv"] for r in back.collect()) == sorted(vals)
    for v in vals:
        assert back.filter(F.col("pv") == v).count() == 1, repr(v)


def test_quarantine_partition_keys_gate(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "__HIVE_DEFAULT_PARTITION__"), (4, "a=b")],
        "id int, pv string",
    )
    clean, quar = quarantine_partition_keys(df, "pv")
    assert {r["id"] for r in clean.collect()} == {1, 4}  # NULL legal by default
    reasons = {r["id"]: r["quarantine_reason"] for r in quar.collect()}
    assert reasons == {
        2: "partition_unsafe:empty_string",
        3: "partition_unsafe:hive_sentinel",
    }

    # multi-engine posture: NULL itself is the divergence -> gate it
    clean2, quar2 = quarantine_partition_keys(df, "pv", allow_null=False)
    assert {r["id"] for r in clean2.collect()} == {4}
    assert {r["quarantine_reason"] for r in quar2.collect()} == {
        "partition_unsafe:empty_string",
        "partition_unsafe:hive_sentinel",
        "partition_unsafe:null",
    }

    # stream-safe: pure filters
    from etl_upc_syllabus_spark.streaming.events import read_events_stream
    from .conftest import SF_DIR

    stream = read_events_stream(spark, SF_DIR).withColumn(
        "pv", F.col("event_type")
    )
    c, q = quarantine_partition_keys(stream, "pv")
    assert c.isStreaming and q.isStreaming

    # string columns only (review r12): on a numeric column the ''
    # comparison would NULL-coerce and silently drop rows from BOTH
    # sides under ANSI-off -- the gate must be loud instead
    import pytest

    with pytest.raises(ValueError, match="needs a string column"):
        quarantine_partition_keys(df, "id")

    # char/varchar hit the same sentinel-directory merge as plain
    # string and are accepted (ADVICE r12)
    vc = spark.createDataFrame([(1, ""), (2, "x")], "id int, pv string").selectExpr(
        "id", "CAST(pv AS varchar(40)) AS pv"
    )
    c_vc, q_vc = quarantine_partition_keys(vc, "pv")
    assert {r["id"] for r in c_vc.collect()} == {2}
    assert {r["quarantine_reason"] for r in q_vc.collect()} == {
        "partition_unsafe:empty_string"
    }


def test_duckdb_reads_the_same_layout_differently(spark, tmp_path):
    """Pinned AS MEASURED (the cross-engine argument for the gate and
    for allow_null=False): DuckDB reads the sentinel directory as the
    LITERAL string and does not unescape percent-escaped names."""
    import duckdb

    d = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, None), (2, "a=b")], "id int, pv string"
    ).write.partitionBy("pv").parquet(d)
    rows = dict(
        duckdb.connect().execute(
            f"SELECT pv, count(*) FROM read_parquet('{d}/*/*.parquet', "
            "hive_partitioning=1) GROUP BY 1"
        ).fetchall()
    )
    assert rows == {"__HIVE_DEFAULT_PARTITION__": 1, "a%3Db": 1}
    # while Spark reads its own layout exactly
    back = spark.read.parquet(d)
    assert back.filter(F.col("pv").isNull()).count() == 1
    assert back.filter(F.col("pv") == "a=b").count() == 1


def test_partition_type_inference_posture(spark, tmp_path):
    """Pinned AS MEASURED (probe --infer): numeric/date-looking string
    partition values are silently RE-TYPED by schema-less reads --
    '01' -> int 1 loses the leading zero, '1.50' -> 1.5 loses the
    trailing zero -- while DuckDB reads the same directory as the
    literal string (cross-engine divergence on top of the value
    change). Both mitigations are exact: an explicit read schema, or
    partitionColumnTypeInference off."""
    import duckdb

    d = str(tmp_path / "t")
    spark.createDataFrame([(1, "01")], "id int, pv string").write.partitionBy(
        "pv"
    ).parquet(d)

    inferred = spark.read.parquet(d)
    assert inferred.schema["pv"].dataType.simpleString() == "int"
    assert inferred.collect()[0]["pv"] == 1  # '01' is gone

    explicit = spark.read.schema("id int, pv string").parquet(d)
    assert explicit.collect()[0]["pv"] == "01"

    # restore the PRIOR value, not a hard-coded 'true' (ADVICE r12): a
    # session that deliberately disabled inference keeps its setting
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prior = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        off = spark.read.parquet(d)
        assert off.schema["pv"].dataType.simpleString() == "string"
        assert off.collect()[0]["pv"] == "01"
    finally:
        spark.conf.set(key, prior)

    assert duckdb.connect().execute(
        f"SELECT pv FROM read_parquet('{d}/*/*.parquet', hive_partitioning=1)"
    ).fetchone()[0] == "01"


def test_engine_period_layout_is_inference_proof_by_construction(spark):
    """The engine's own partitioned layout (S4/S7/S8: partitionBy
    period) never hits the inference classes because parse_filename
    emits 'YYYY-T' -- a dash makes the value un-inferable. Pinned from
    both ends: the parsed format, and the roundtrip through the real
    sink keeping period a string."""
    import tempfile

    from etl_upc_syllabus_spark.pipeline import sinks
    from etl_upc_syllabus_spark.pipeline.parse import parse_filename

    assert parse_filename("UG-202520_1AEL0244-8281.pdf")["period"] == "2025-2"

    df = spark.createDataFrame(
        [("1AEL0244", "2025-2", "Matemática Básica")],
        "id string, period string, name string",
    )
    base = tempfile.mkdtemp(prefix="etl_upc_pti_")
    sinks.write_courses_parquet(df, base)
    back = sinks.read_courses(spark, base)
    assert back.schema["period"].dataType.simpleString() == "string"
    assert back.collect()[0]["period"] == "2025-2"


def test_read_courses_explicit_schema_defeats_inference(spark):
    """VERDICT r12 item 3: read_courses is a library surface -- a user
    who partitions by a numeric-looking period must get the exact
    string back ('01' keeps its leading zero), not the silently
    re-typed inference value, through read_courses AND both point
    reads. Data-file column types are preserved unchanged."""
    import tempfile

    from etl_upc_syllabus_spark.pipeline import sinks

    df = spark.createDataFrame(
        [("C1", "01", 4), ("C2", "2024-01-01", 3)],
        "id string, period string, credits int",
    )
    base = tempfile.mkdtemp(prefix="etl_upc_numperiod_")
    sinks.write_courses_parquet(df, base)

    back = sinks.read_courses(spark, base)
    assert back.schema["period"].dataType.simpleString() == "string"
    assert back.schema["credits"].dataType.simpleString() == "int"
    assert sorted(r["period"] for r in back.collect()) == ["01", "2024-01-01"]

    # the point reads ride the same explicit-schema read: pushdown-able
    # string equality, exact values
    assert sinks.find_by_id(spark, base, "C1").collect()[0]["period"] == "01"
    assert sinks.find_by_period(spark, base, "01").collect()[0]["id"] == "C1"
    assert sinks.find_by_period(spark, base, "2024-01-01").count() == 1


def test_write_courses_parquet_gates_unsafe_periods(spark):
    """VERDICT r12 stretch item 7: the write path validates the period
    key itself -- a library user cannot lay out the silent 3-way
    NULL-sentinel merge by accident."""
    import os
    import tempfile

    import pytest

    from etl_upc_syllabus_spark.pipeline import sinks

    df = spark.createDataFrame(
        [("C1", "2025-2"), ("C2", ""), ("C3", "__HIVE_DEFAULT_PARTITION__")],
        "id string, period string",
    )
    base = tempfile.mkdtemp(prefix="etl_upc_gate_")

    # default: loud, naming both unsafe classes with counts
    with pytest.raises(ValueError, match="empty_string x1.*hive_sentinel x1"):
        sinks.write_courses_parquet(df, base)

    # quarantine: safe rows written, unsafe rows preserved with reasons
    sinks.write_courses_parquet(df, base, on_unsafe="quarantine")
    assert [r["id"] for r in sinks.read_courses(spark, base).collect()] == ["C1"]
    quar = spark.read.parquet(os.path.join(base, "_quarantined_partition_keys"))
    assert {r["quarantine_reason"] for r in quar.collect()} == {
        "partition_unsafe:empty_string",
        "partition_unsafe:hive_sentinel",
    }

    # off: trusted engine-generated keys skip the gate entirely
    safe = df.filter("id = 'C1'")
    base2 = tempfile.mkdtemp(prefix="etl_upc_gate_off_")
    sinks.write_courses_parquet(safe, base2, on_unsafe="off")
    assert sinks.read_courses(spark, base2).count() == 1

    with pytest.raises(ValueError, match="error|quarantine|off"):
        sinks.write_courses_parquet(safe, base2, on_unsafe="nope")


def test_quarantine_journal_survives_clean_batches(spark):
    """Review r13: the quarantine side is an append-only journal -- a
    later gated write of a fully-clean batch must NOT wipe previously
    quarantined rows (the overwrite-to-fixed-path bug)."""
    import os
    import tempfile

    from etl_upc_syllabus_spark.pipeline import sinks

    base = tempfile.mkdtemp(prefix="etl_upc_journal_")
    dirty = spark.createDataFrame(
        [("C1", "2025-1"), ("C2", "")], "id string, period string"
    )
    sinks.write_courses_parquet(dirty, base, on_unsafe="quarantine")
    qpath = os.path.join(base, "_quarantined_partition_keys")
    assert spark.read.parquet(qpath).count() == 1

    clean = spark.createDataFrame([("C3", "2025-2")], "id string, period string")
    sinks.write_courses_period_incremental(clean, base, on_unsafe="quarantine")
    # the journal still carries batch 1's quarantined row
    assert spark.read.parquet(qpath).count() == 1
    assert spark.read.parquet(qpath).collect()[0]["id"] == "C2"


def test_empty_corpus_roundtrips_with_canonical_schema(spark):
    """A zero-row commit writes only _SUCCESS (no footer to discover
    from); read_courses falls back to the canonical PARSED_COURSE_SCHEMA
    so an empty corpus reads as an empty canonical DataFrame instead of
    dying at schema discovery. A missing path stays loud."""
    import tempfile

    import pytest

    from etl_upc_syllabus_spark.pipeline import sinks
    from etl_upc_syllabus_spark.pipeline.schema import PARSED_COURSE_SCHEMA

    base = tempfile.mkdtemp(prefix="etl_upc_empty_")
    empty = spark.createDataFrame([], PARSED_COURSE_SCHEMA)
    sinks.write_courses_parquet(empty, base, on_unsafe="off")
    back = sinks.read_courses(spark, base)
    assert back.count() == 0
    assert back.schema == PARSED_COURSE_SCHEMA

    with pytest.raises(Exception, match="PATH_NOT_FOUND|does not exist"):
        sinks.read_courses(spark, tempfile.mkdtemp() + "/nope").count()


def test_evolved_corpus_needs_merge_schemas(spark):
    """Pinned AS MEASURED (r13): one-footer discovery silently drops a
    column an incremental batch added -- the scan_schema_drift
    listing-order class inside the engine's own read. merge_schemas
    unions the footers: the evolved column surfaces, NULL on
    pre-evolution rows, period still pinned string."""
    import tempfile

    from etl_upc_syllabus_spark.pipeline import sinks

    base = tempfile.mkdtemp(prefix="etl_upc_evolve_")
    v1 = spark.createDataFrame(
        [("C1", "2025-1", "A")], "id string, period string, name string"
    )
    sinks.write_courses_parquet(v1, base)
    v2 = spark.createDataFrame(
        [("C2", "2025-2", "B", 4)],
        "id string, period string, name string, credits int",
    )
    sinks.write_courses_period_incremental(v2, base)

    # default: the evolved column is silently absent (measured posture)
    assert "credits" not in sinks.read_courses(spark, base).columns

    merged = sinks.read_courses(spark, base, merge_schemas=True)
    assert merged.schema["period"].dataType.simpleString() == "string"
    rows = {r["id"]: r for r in merged.collect()}
    assert rows["C2"]["credits"] == 4
    assert rows["C1"]["credits"] is None
