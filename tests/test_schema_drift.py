"""Type-conflict schema-drift posture (r11 probe,
tools/schema_drift_probe.py).

The registry covers ADDITIVE drift (source_schema_evolution); the
probe measured the conflict classes a long-lived ingest produces.
Postures pinned here, most dangerous first:

- a RENAME (value -> amount) under a plain read is SILENT data loss:
  the resolved footer NULL-fills the renamed half, aggregates change
  value with no error;
- a type conflict's plain-read posture flips with FILE LISTING ORDER
  (wide footer first: reads by upcast; narrow first: task-level
  PARQUET_COLUMN_DATA_TYPE_MISMATCH mid-job) -- and column PRUNING
  hides the conflict entirely until a query touches the column;
- Spark's mergeSchema REFUSES the int32/int64 merge the plain reader
  upcasts through (loud, plan time);
- the shipped footer census (sources.formats.scan_schema_drift)
  detects every class for a few KB per file -- the pre-flight that
  makes reader posture a decision instead of listing-order luck.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from schema_drift_probe import build_class  # noqa: E402

from etl_upc_syllabus_spark.sources.formats import scan_schema_drift


def test_census_detects_every_drift_class(spark, tmp_path):
    expected = {
        "narrowed_int": {"event_id": "type_conflict", "value": "stable"},
        "num_to_string": {"event_id": "stable", "value": "type_conflict"},
        "renamed": {"event_id": "stable", "value": "partial", "amount": "partial"},
    }
    for cls, want in expected.items():
        d, _truth = build_class(str(tmp_path), cls)
        got = {r["column"]: r["drift"] for r in scan_schema_drift(spark, d).collect()}
        assert got == want, f"{cls}: {got}"


def test_census_stable_on_uniform_table(spark, sf_dir):
    out = scan_schema_drift(spark, os.path.join(sf_dir, "embeddings.parquet"))
    assert {r["drift"] for r in out.collect()} == {"stable"}


def test_census_reports_unreadable_files_instead_of_dying(spark, tmp_path):
    """One bad footer must not kill the pre-flight (review r11): the
    unreadable file lands as the reserved '<unreadable>' row with the
    error in `types`, and the readable files' census is intact."""
    d, _ = build_class(str(tmp_path), "narrowed_int")
    with open(os.path.join(d, "part-002.parquet"), "wb") as fh:
        fh.write(b"PAR1 this is not a parquet footer")
    rows = {r["column"]: r for r in scan_schema_drift(spark, d).collect()}
    assert rows["<unreadable>"]["drift"] == "unreadable"
    assert rows["<unreadable>"]["n_files_present"] == 1
    assert rows["event_id"]["drift"] == "type_conflict"
    # denominator over READABLE footers only (ADVICE r11): a column in
    # every readable file is 'stable', never 'partial', when the only
    # absence is an unreadable footer that says nothing about it
    assert rows["value"]["drift"] == "stable"
    assert rows["value"]["n_files_total"] == rows["value"]["n_files_present"]


def test_census_separates_real_column_named_unreadable(spark, tmp_path):
    """ADVICE r12 (formats.py:289): a REAL data column literally named
    '<unreadable>' must not group-merge with probe-failure rows -- the
    merged group was labeled 'unreadable', hiding that column's own
    drift. With is_err in the group key the corpus yields TWO rows for
    the name: the failure row (drift 'unreadable') and the genuine
    column's row with its own class."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "t")
    os.makedirs(d)
    # two readable files whose '<unreadable>' column type-conflicts
    pq.write_table(
        pa.table({"<unreadable>": pa.array([1, 2], type=pa.int32())}),
        os.path.join(d, "part-000.parquet"),
    )
    pq.write_table(
        pa.table({"<unreadable>": pa.array(["a"], type=pa.string())}),
        os.path.join(d, "part-001.parquet"),
    )
    # plus one genuinely unreadable footer
    with open(os.path.join(d, "part-002.parquet"), "wb") as fh:
        fh.write(b"PAR1 this is not a parquet footer")

    rows = scan_schema_drift(spark, d).collect()
    by_drift = {r["drift"]: r for r in rows}
    assert len(rows) == 2 and set(by_drift) == {"unreadable", "type_conflict"}
    assert by_drift["unreadable"]["n_files_present"] == 1
    # the real column's own drift is visible, over readable files only
    assert by_drift["type_conflict"]["column"] == "<unreadable>"
    assert by_drift["type_conflict"]["n_files_present"] == 2
    assert by_drift["type_conflict"]["n_files_total"] == 2


def test_rename_is_silent_under_plain_read(spark, tmp_path):
    """Pinned AS MEASURED: the plain reader resolves one footer and
    NULL-fills the renamed column's other half -- the sum silently
    drops the drifted batch's contribution, no error anywhere."""
    d, truth = build_class(str(tmp_path), "renamed")
    df = spark.read.parquet(d)
    assert "amount" not in df.columns
    row = df.agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")).collect()[0]
    assert row["n"] == truth["n"]
    assert row["sv"] == truth["sum_value"] - 200.0  # the renamed half, silently gone


def test_type_conflict_posture_flips_with_listing_order(spark, tmp_path):
    """Wide footer first: the int32 batch reads by upcast (values
    correct). Narrow footer first: the SAME data dies at task level
    once the conflicted column is actually decoded -- and column
    pruning hides the conflict while it is not."""
    d_fwd, truth = build_class(str(tmp_path), "narrowed_int")
    row = (
        spark.read.parquet(d_fwd)
        .agg(F.sum(F.col("event_id").cast("long")).alias("si"))
        .collect()[0]
    )
    assert row["si"] == truth["sum_id"]

    d_rev, _ = build_class(str(tmp_path), "narrowed_int_rev")
    rev = spark.read.parquet(d_rev)
    # pruning hides it: a query not touching event_id runs clean
    assert rev.agg(F.count(F.lit(1))).collect()[0][0] == 200
    # ...until the column is read
    with pytest.raises(Exception, match="DATA_TYPE_MISMATCH|FAILED_READ_FILE"):
        rev.agg(F.sum(F.col("event_id").cast("long"))).collect()


def test_zero_field_schema_file_stays_in_the_denominator(spark, tmp_path):
    """Review r14 pass 4: a readable parquet footer with ZERO schema
    fields must still count toward n_files_total (it emits the
    reserved '<no_columns>' row), so every real column correctly
    classifies 'partial' against it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_upc_syllabus_spark.sources.formats import scan_schema_drift

    d = tmp_path / "t"
    d.mkdir()
    spark.createDataFrame([(1, "a")], "v long, s string").coalesce(
        1
    ).write.mode("append").parquet(str(d))
    pq.write_table(pa.table({}), str(d / "empty_schema.parquet"))

    rows = {r["column"]: r for r in scan_schema_drift(spark, str(d)).collect()}
    assert rows["<no_columns>"]["n_files_present"] == 1
    # denominator counts BOTH readable files; real columns are partial
    assert rows["v"]["n_files_total"] == 2
    assert rows["v"]["drift"] == "partial"
    assert rows["s"]["drift"] == "partial"
