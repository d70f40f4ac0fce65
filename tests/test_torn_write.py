"""Torn-write / job-failure artifact posture (r13 axis,
tools/torn_write_probe.py).

A killed or doubly-retried write job leaves four artifact classes in a
lake directory; the engines' read postures are pinned AS MEASURED and
``sources.formats.audit_write_artifacts`` turns each into a named
report row. The class that motivates the gate: an orphan part file
from a different writer job is silently double-counted by BOTH engines
-- no read-side check can see it, only the write-artifact audit can.
"""

from __future__ import annotations

import os
import shutil
import sys
import uuid

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from torn_write_probe import build_polluted  # noqa: E402

from etl_upc_syllabus_spark.sources.formats import audit_write_artifacts


def _committed_table(spark, base: str, n: int = 20) -> str:
    d = os.path.join(base, "t")
    spark.range(n).withColumnRenamed("id", "v").coalesce(2).write.parquet(d)
    return d


def test_clean_commit_audits_empty(spark, tmp_path):
    d = _committed_table(spark, str(tmp_path))
    report = audit_write_artifacts(spark, d)
    assert report.count() == 0
    assert [f.name for f in report.schema] == ["file", "issue"]


def test_all_four_classes_detected_with_reasons(spark, tmp_path):
    d = build_polluted(spark, str(tmp_path))
    rows = audit_write_artifacts(spark, d).collect()
    by_issue = {}
    for r in rows:
        by_issue.setdefault(r["issue"], []).append(r["file"])
    assert set(by_issue) == {
        "temporary_residue",
        "orphan_writer_uuid",
        "zero_byte",
        "missing_success",
    }
    # build_polluted plants exactly one of each (its zero-byte part and
    # orphan carry distinct UUIDs; the orphan flag is the non-majority,
    # non-empty one)
    assert len(by_issue["temporary_residue"]) == 1
    assert by_issue["temporary_residue"][0].endswith("_temporary")
    assert len(by_issue["zero_byte"]) == 1
    assert len(by_issue["orphan_writer_uuid"]) == 1
    assert by_issue["missing_success"] == [d]


def test_missing_success_respects_the_writer_convention(spark, tmp_path):
    """A commit without its _SUCCESS marker reports missing_success;
    writers that suppress the marker opt out with
    expect_success=False instead of living with a standing false
    positive."""
    d = _committed_table(spark, str(tmp_path))
    os.remove(os.path.join(d, "_SUCCESS"))
    issues = {r["issue"] for r in audit_write_artifacts(spark, d).collect()}
    assert issues == {"missing_success"}
    # suppressed-marker writers opt out
    issues2 = {
        r["issue"]
        for r in audit_write_artifacts(spark, d, expect_success=False).collect()
    }
    assert issues2 == set()


def test_read_postures_pinned_as_measured(spark, tmp_path):
    """The r13 probe matrix: Spark hides _temporary and silently skips
    a zero-byte part even with ignoreCorruptFiles=false, both engines
    silently double-count an orphan part, DuckDB's recursive glob reads
    staged attempts as data."""
    import duckdb

    base = str(tmp_path)
    d = _committed_table(spark, base)

    # stage a 5-row donor part
    stage = os.path.join(base, "stage")
    spark.range(100, 105).withColumnRenamed("id", "v").coalesce(1).write.parquet(stage)
    src = next(
        os.path.join(stage, f) for f in os.listdir(stage) if f.endswith(".parquet")
    )

    # _temporary residue: invisible to Spark, data to DuckDB's ** glob
    tmpdir = os.path.join(d, "_temporary/0/attempt_0")
    os.makedirs(tmpdir)
    shutil.copy(src, os.path.join(tmpdir, os.path.basename(src)))
    assert spark.read.parquet(d).count() == 20
    assert duckdb.sql(
        f"select count(*) from read_parquet('{d}/**/*.parquet')"
    ).fetchone()[0] == 25

    # orphan writer-uuid part: both engines silently double-count
    shutil.copy(src, os.path.join(d, f"part-00000-{uuid.uuid4()}.c000.snappy.parquet"))
    assert spark.read.parquet(d).count() == 25
    assert duckdb.sql(
        f"select count(*) from read_parquet('{d}/*.parquet')"
    ).fetchone()[0] == 25

    # zero-byte part: Spark silently skips (no splits), DuckDB is loud
    zb = os.path.join(d, f"part-00002-{uuid.uuid4()}.snappy.parquet")
    open(zb, "wb").close()
    assert spark.conf.get("spark.sql.files.ignoreCorruptFiles") in ("false", None)
    assert spark.read.parquet(d).count() == 25
    with pytest.raises(Exception, match="(?i)invalid|too small|parquet"):
        duckdb.sql(f"select count(*) from read_parquet('{d}/*.parquet')").fetchone()


def test_append_tables_carry_one_uuid_per_write(spark, tmp_path):
    """The documented caveat, pinned from the mechanism: each append is
    its own committed job, so a legitimate 2-append table reports the
    smaller write's parts as orphan_writer_uuid -- provenance info on
    append tables, damage signal on overwrite tables."""
    d = os.path.join(str(tmp_path), "t")
    spark.range(10).withColumnRenamed("id", "v").coalesce(2).write.parquet(d)
    spark.range(10, 15).withColumnRenamed("id", "v").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    rows = audit_write_artifacts(spark, d).collect()
    assert {r["issue"] for r in rows} == {"orphan_writer_uuid"}
    assert len(rows) == 1  # the 1-part append is the minority


def test_writer_uuid_tie_reports_ambiguous_not_a_guess(spark, tmp_path):
    """Review r13: one real part + one orphan part is a 1-1 tie -- the
    audit cannot know which job was the commit, and a lexicographic
    guess could flag the REAL file as the orphan (an operator acting on
    the report would delete genuine data). On a tie every part of every
    UUID is reported ambiguous instead."""
    d = os.path.join(str(tmp_path), "t")
    spark.range(10).withColumnRenamed("id", "v").coalesce(1).write.parquet(d)
    part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
    shutil.copy(
        os.path.join(d, part),
        os.path.join(d, f"part-00000-{uuid.uuid4()}.c000.snappy.parquet"),
    )
    rows = audit_write_artifacts(spark, d).collect()
    assert {r["issue"] for r in rows} == {"ambiguous_writer_uuids"}
    assert len(rows) == 2  # BOTH files flagged, neither guessed clean


def test_loud_on_typo_and_single_file(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="write-artifact audit"):
        audit_write_artifacts(spark, str(tmp_path / "nope"))
    d = _committed_table(spark, str(tmp_path))
    part = next(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )
    assert audit_write_artifacts(spark, part).count() == 0


def test_submax_groups_stay_orphans_under_a_tie(spark, tmp_path):
    """Review r13 pass 2: a 2-2 retry tie plus a 1-part speculative
    stray -- the stray is an orphan regardless of which tied job
    committed, so its certain signal must survive the tie downgrade."""
    d = os.path.join(str(tmp_path), "t")
    spark.range(10).withColumnRenamed("id", "v").coalesce(2).write.parquet(d)
    part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
    # second "job" with the same part count (the retry shape)
    u2 = uuid.uuid4()
    for i in range(2):
        shutil.copy(
            os.path.join(d, part),
            os.path.join(d, f"part-{i:05d}-{u2}.c000.snappy.parquet"),
        )
    # sub-max stray from a third job
    shutil.copy(
        os.path.join(d, part),
        os.path.join(d, f"part-00000-{uuid.uuid4()}.c000.snappy.parquet"),
    )
    rows = audit_write_artifacts(spark, d).collect()
    issues = {}
    for r in rows:
        issues.setdefault(r["issue"], []).append(r["file"])
    assert len(issues["ambiguous_writer_uuids"]) == 4  # both tied groups
    assert len(issues["orphan_writer_uuid"]) == 1  # the stray, still certain


def test_audit_dirs_pools_census_across_an_explicit_scope(spark, tmp_path):
    """audit_write_artifact_dirs (review r14): the partitions one
    dynamic-overwrite batch touched share ONE writer UUID, so pooling
    the census across the explicit dir list is correct -- an orphan in
    any of them is a minority against the pooled majority -- and the
    whole scope costs one distributed job, not one per dir."""
    d = os.path.join(str(tmp_path), "t")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b")], "v int, p string"
    ).repartition(1).write.partitionBy("p").parquet(d)
    dirs = [os.path.join(d, "p=a"), os.path.join(d, "p=b")]

    from etl_upc_syllabus_spark.sources.formats import audit_write_artifact_dirs

    assert audit_write_artifact_dirs(spark, dirs).count() == 0  # clean

    # seed an orphan into ONE partition: minority vs the pooled census
    src = next(
        os.path.join(dirs[0], f)
        for f in os.listdir(dirs[0])
        if f.endswith(".parquet")
    )
    shutil.copy(
        src, os.path.join(dirs[1], f"part-00000-{uuid.uuid4()}.c000.snappy.parquet")
    )
    rows = audit_write_artifact_dirs(spark, dirs).collect()
    assert [(os.path.dirname(r["file"]), r["issue"]) for r in rows] == [
        (dirs[1], "orphan_writer_uuid")
    ]

    with pytest.raises(FileNotFoundError, match="write-artifact audit"):
        audit_write_artifact_dirs(spark, [os.path.join(d, "p=nope")])


def test_driver_and_distributed_paths_agree(spark, tmp_path):
    """r15 (VERDICT r14 item 5): scopes at/under max_driver_files audit
    driver-side with zero Spark jobs; the findings must be IDENTICAL to
    the distributed path's on every issue class, including the global
    majority/tie logic. The four-classes fixture is exactly that."""
    d = build_polluted(spark, str(tmp_path))
    fast = {(r["file"], r["issue"]) for r in audit_write_artifacts(spark, d).collect()}
    slow = {
        (r["file"], r["issue"])
        for r in audit_write_artifacts(spark, d, max_driver_files=0).collect()
    }
    assert fast == slow and fast  # same findings, and there are findings

    # the explicit-dirs entry point agrees with itself the same way
    from etl_upc_syllabus_spark.sources.formats import audit_write_artifact_dirs

    sub = [d]  # the polluted root as one explicit-dirs scope
    if sub:
        fast2 = {
            (r["file"], r["issue"])
            for r in audit_write_artifact_dirs(spark, sub).collect()
        }
        slow2 = {
            (r["file"], r["issue"])
            for r in audit_write_artifact_dirs(
                spark, sub, max_driver_files=0
            ).collect()
        }
        assert fast2 == slow2


def test_big_scopes_still_distribute(spark, tmp_path):
    """The cap is a short-circuit, not a semantics change: a scope over
    max_driver_files takes the distributed walk and returns the same
    clean verdict."""
    d = str(tmp_path / "wide")
    spark.range(5000).selectExpr("id", "id % 50 as k").repartition(
        8
    ).write.partitionBy("k").parquet(d)
    # 50 partitions x 8 tasks = up to 400 files > cap of 16
    report = audit_write_artifacts(spark, d, max_driver_files=16)
    assert report.count() == 0
