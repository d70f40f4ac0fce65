"""Corrupt-file resilience: skip at task time, audit what was skipped.

A 100 TB lake always carries a few bad objects; the contract is
(a) the default read stays FAIL-FAST (corruption is an error unless a
backfill opts out), (b) read_resilient returns every row of every
healthy file, and (c) scan_corrupt_files names exactly the bad files
so the skip is published, never silent.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from etl_upc_syllabus_spark.sources.formats import read_resilient, scan_corrupt_files

SCHEMA = StructType([StructField("id", LongType()), StructField("v", DoubleType())])


@pytest.fixture()
def lake_with_corruption(spark, tmp_path):
    path = str(tmp_path / "lake")
    os.makedirs(path)
    import pyarrow as pa
    import pyarrow.parquet as pq

    for part in range(3):
        tbl = pa.table(
            {
                "id": pa.array(range(part * 100, part * 100 + 100), pa.int64()),
                "v": pa.array([float(i) for i in range(100)], pa.float64()),
            }
        )
        pq.write_table(tbl, os.path.join(path, f"part-{part}.parquet"))
    # one truncated upload (half a healthy file) and one garbage object
    healthy = open(os.path.join(path, "part-0.parquet"), "rb").read()
    with open(os.path.join(path, "part-3.parquet"), "wb") as f:
        f.write(healthy[: len(healthy) // 2])
    with open(os.path.join(path, "part-4.parquet"), "wb") as f:
        f.write(b"this is not parquet at all")
    return path


def test_default_read_stays_fail_fast(spark, lake_with_corruption):
    with pytest.raises(Exception):
        spark.read.schema(SCHEMA).parquet(lake_with_corruption).count()


def test_resilient_read_returns_all_healthy_rows(spark, lake_with_corruption):
    df = read_resilient(spark, lake_with_corruption, SCHEMA)
    assert df.count() == 300
    assert df.agg(F.countDistinct("id")).collect()[0][0] == 300
    # and the option is per-read: the same session still fails fast
    with pytest.raises(Exception):
        spark.read.schema(SCHEMA).parquet(lake_with_corruption).count()


def test_corruption_audit_names_exactly_the_bad_files(spark, lake_with_corruption):
    report = scan_corrupt_files(spark, lake_with_corruption).collect()
    by_file = {os.path.basename(r["file"]): r for r in report}
    assert len(by_file) == 5
    bad = {f for f, r in by_file.items() if not r["ok"]}
    assert bad == {"part-3.parquet", "part-4.parquet"}
    for f in bad:
        assert by_file[f]["error"], f  # the reason is published
    for f in {"part-0.parquet", "part-1.parquet", "part-2.parquet"}:
        assert by_file[f]["error"] is None


def test_corruption_audit_walks_partition_subdirectories(spark, tmp_path):
    """The audit must probe the TREE a reader consumes (ADVICE r8): a
    corrupt file inside a Hive-style ``key=val/`` partition dir must be
    reported, a healthy nested file must be probed ok, the partition
    directory itself must never be probed-as-a-file (falsely corrupt),
    and ``_``/``.``-prefixed markers are skipped at every depth."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "plake")
    sub_ok = os.path.join(path, "period=2024a")
    sub_bad = os.path.join(path, "period=2024b")
    os.makedirs(sub_ok)
    os.makedirs(sub_bad)
    os.makedirs(os.path.join(path, ".hidden_dir"))
    tbl = pa.table({"id": pa.array(range(10), pa.int64()),
                    "v": pa.array([float(i) for i in range(10)], pa.float64())})
    pq.write_table(tbl, os.path.join(sub_ok, "part-0.parquet"))
    pq.write_table(tbl, os.path.join(path, ".hidden_dir", "part-x.parquet"))
    with open(os.path.join(sub_bad, "part-0.parquet"), "wb") as f:
        f.write(b"truncated garbage")
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        f.write("")
    with open(os.path.join(sub_ok, "_committed_1"), "w") as f:
        f.write("")

    report = scan_corrupt_files(spark, path).collect()
    rel = {os.path.relpath(r["file"], path): r for r in report}
    assert set(rel) == {"period=2024a/part-0.parquet", "period=2024b/part-0.parquet"}
    assert rel["period=2024a/part-0.parquet"]["ok"]
    assert not rel["period=2024b/part-0.parquet"]["ok"]
    assert rel["period=2024b/part-0.parquet"]["error"]


def test_missing_table_path_raises_not_fake_audit(spark, tmp_path):
    """A typo'd table path must fail loudly (ADVICE r9): the previous
    fallback returned [path] for any non-directory, so a MISSING table
    produced a plausible one-'corrupt'-file audit whose error row was
    just the probe's own ENOENT -- indistinguishable from genuine
    corruption."""
    import pytest

    with pytest.raises(FileNotFoundError, match="neither a file nor"):
        scan_corrupt_files(spark, str(tmp_path / "no_such_table"))
