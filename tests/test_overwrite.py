"""Overwrite-semantics posture (r13 axis, tools/overwrite_probe.py).

Pinned AS MEASURED: static partition overwrite (the Spark DEFAULT) is
silent full-table data loss for incremental loads; the per-write
dynamic option scopes the delete to the partitions in the batch; a
read racing an overwrite is loud on the fail-fast path but returns 0
rows SILENTLY on the resilient path (ignoreMissingFiles resolves every
vanished file to nothing).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from etl_upc_syllabus_spark.pipeline import sinks
from etl_upc_syllabus_spark.sources.formats import read_resilient


def _seed(spark, d):
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "v int, p string"
    ).write.mode("overwrite").partitionBy("p").parquet(d)


def test_static_partition_overwrite_is_silent_data_loss(spark, tmp_path):
    d = str(tmp_path / "t")
    _seed(spark, d)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "STATIC"
    spark.createDataFrame([(20, "b")], "v int, p string").write.mode(
        "overwrite"
    ).partitionBy("p").parquet(d)
    # partition a is GONE -- no error anywhere
    assert sorted(
        (r["p"], r["v"]) for r in spark.read.parquet(d).collect()
    ) == [("b", 20)]


def test_dynamic_per_write_option_scopes_the_delete(spark, tmp_path):
    d = str(tmp_path / "t")
    _seed(spark, d)
    spark.createDataFrame([(20, "b")], "v int, p string").write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy("p").parquet(d)
    assert sorted(
        (r["p"], r["v"]) for r in spark.read.parquet(d).collect()
    ) == [("a", 1), ("b", 20)]
    # per-WRITE option: the session conf was never mutated
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "STATIC"


def test_write_courses_period_incremental(spark, tmp_path):
    """The shipped incremental writer: refreshes only the periods in
    the batch, gates the period key like the full writer."""
    base = str(tmp_path)
    df = spark.createDataFrame(
        [("C1", "2025-1", "Algebra"), ("C2", "2025-2", "Física I")],
        "id string, period string, name string",
    )
    sinks.write_courses_parquet(df, base)

    refresh = spark.createDataFrame(
        [("C2", "2025-2", "Física I (rev)"), ("C3", "2025-2", "Química")],
        "id string, period string, name string",
    )
    sinks.write_courses_period_incremental(refresh, base)
    back = {
        (r["id"], r["period"]): r["name"]
        for r in sinks.read_courses(spark, base).collect()
    }
    # 2025-1 untouched; 2025-2 fully replaced by the batch
    assert back == {
        ("C1", "2025-1"): "Algebra",
        ("C2", "2025-2"): "Física I (rev)",
        ("C3", "2025-2"): "Química",
    }

    # the same gate as the full writer
    hostile = spark.createDataFrame(
        [("C4", "", "X")], "id string, period string, name string"
    )
    with pytest.raises(ValueError, match="empty_string"):
        sinks.write_courses_period_incremental(hostile, base)


def test_read_racing_overwrite_loud_vs_silent(spark, tmp_path):
    """The composition trap: fail-fast dies loudly on the stale file
    index; read_resilient returns 0 rows with no error."""
    d = str(tmp_path / "t")
    spark.range(100).withColumnRenamed("id", "v").coalesce(2).write.parquet(d)
    failfast = spark.read.parquet(d)
    resilient = read_resilient(
        spark, d, T.StructType([T.StructField("v", T.LongType())])
    )
    assert failfast.count() == 100 and resilient.count() == 100

    spark.range(5).withColumnRenamed("id", "v").coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    with pytest.raises(Exception, match="FILE_NOT_EXIST|FAILED_READ_FILE"):
        failfast.count()
    assert resilient.count() == 0  # SILENT total loss, pinned as measured


def test_verified_incremental_write_scopes_audit_to_touched_partitions(
    spark, tmp_path, monkeypatch
):
    """VERDICT r13 item 6 on the in-place path: verify=True audits
    exactly the batch's partitions. The untouched partition's
    different writer-UUID (a legitimate earlier refresh) must NOT
    false-positive as an orphan; a seeded orphan inside a touched
    partition must fail the write loudly."""
    import shutil
    import uuid as _uuid

    base = str(tmp_path)
    df = spark.createDataFrame(
        [("C1", "2025-1", "Algebra"), ("C2", "2025-2", "Física I")],
        "id string, period string, name string",
    )
    sinks.write_courses_parquet(df, base)

    refresh = spark.createDataFrame(
        [("C3", "2025-2", "Química")], "id string, period string, name string"
    )
    # clean refresh passes even though period=2025-1 still carries the
    # FIRST write's job UUID (out of scope by design)
    out = sinks.write_courses_period_incremental(refresh, base, verify=True)

    # seeded orphan in the touched partition fails; the injection point
    # is mocked, the audit and raise are real
    stage = str(tmp_path / "stage")
    refresh.write.parquet(stage)
    donor = next(
        os.path.join(stage, f) for f in os.listdir(stage) if f.endswith(".parquet")
    )
    from etl_upc_syllabus_spark.sources import formats

    real = formats.audit_write_artifact_dirs

    def seeded(spark_, dirs):
        shutil.copy(
            donor,
            os.path.join(dirs[0], f"part-00000-{_uuid.uuid4()}.c000.snappy.parquet"),
        )
        return real(spark_, dirs)

    monkeypatch.setattr(formats, "audit_write_artifact_dirs", seeded)
    with pytest.raises(RuntimeError, match="write-artifact audit found"):
        sinks.write_courses_period_incremental(refresh, base, verify=True)
    assert out.endswith("courses_parquet")


def test_verified_full_write_passes_clean(spark, tmp_path):
    base = str(tmp_path)
    df = spark.createDataFrame(
        [("C1", "2025-1", "Algebra")], "id string, period string, name string"
    )
    sinks.write_courses_parquet(df, base, verify=True)
    assert sinks.read_courses(spark, base).count() == 1


def test_verified_incremental_write_includes_null_sentinel_partition(
    spark, tmp_path, monkeypatch
):
    """Review r14: a NULL period lands in period=__HIVE_DEFAULT_PARTITION__
    -- a partition this batch rewrote, so it must be in the verify
    audit's scope (quarantine_partition_keys passes true NULL through
    by default, so such batches are legal)."""
    from etl_upc_syllabus_spark.sources import formats

    base = str(tmp_path)
    df = spark.createDataFrame(
        [("C1", "2025-1", "Algebra"), ("C2", None, "Sin periodo")],
        "id string, period string, name string",
    )
    sinks.write_courses_parquet(df, base, on_unsafe="off")

    captured = {}
    real = formats.audit_write_artifact_dirs

    def capture(spark_, dirs):
        captured["dirs"] = list(dirs)
        return real(spark_, dirs)

    monkeypatch.setattr(formats, "audit_write_artifact_dirs", capture)
    refresh = spark.createDataFrame(
        [("C3", None, "Sin periodo rev")], "id string, period string, name string"
    )
    sinks.write_courses_period_incremental(
        refresh, base, on_unsafe="off", verify=True
    )
    assert [os.path.basename(d) for d in captured["dirs"]] == [
        "period=__HIVE_DEFAULT_PARTITION__"
    ]


def test_verify_scope_comes_from_the_write_not_a_plan_reexecution(
    spark, tmp_path
):
    """ADVICE r14: verify=True used to derive the touched-partition set
    by re-executing the lazy input plan AFTER the write -- a
    nondeterministic or concurrently-changed source then silently
    excluded rewritten dirs from the audit scope. The scope now comes
    from the write itself (partition-dir mtime diff), so the input plan
    executes exactly ONCE, for the write."""
    base = str(tmp_path)
    df = spark.createDataFrame(
        [("C1", "2025-1", "Algebra"), ("C2", "2025-2", "Física I")],
        "id string, period string, name string",
    )
    sinks.write_courses_parquet(df, base)

    ledger = str(tmp_path / "executions.log")

    def tally(batches):
        with open(ledger, "a") as fh:
            fh.write("x\n")
        yield from batches

    refresh = (
        spark.createDataFrame(
            [("C3", "2025-2", "Química")],
            "id string, period string, name string",
        )
        .repartition(1)
        .mapInPandas(tally, "id string, period string, name string")
    )
    # on_unsafe="off" isolates the verify path (the default "error"
    # gate legitimately costs one documented validation pass)
    sinks.write_courses_period_incremental(
        refresh, base, on_unsafe="off", verify=True
    )
    with open(ledger) as fh:
        assert fh.read().count("x") == 1  # the write; never the audit scope


def test_rewrite_within_one_mtime_tick_stays_in_audit_scope(
    spark, tmp_path, monkeypatch
):
    """ADVICE r15 (low): on coarse-timestamp filesystems (1 s ext3,
    2 s FAT/SMB) two back-to-back refreshes of one small partition can
    land in a single dir-mtime tick; a fingerprint of dir mtime alone
    would then classify the genuinely rewritten partition as untouched
    and silently skip its audit. The fingerprint now includes the file
    listing, so the rewrite (fresh writer-UUID part names) is detected
    even when NO timestamp moves.

    (a) unit: a same-tick rewrite (all timestamps pinned identical via
    utime) still changes the fingerprint; (b) e2e: with timestamps
    degenerate (coarsened to a constant -- the FAT worst case), a
    seeded orphan in a re-refreshed partition still fails verify."""
    # (a) same-tick rewrite changes the fingerprint
    d = tmp_path / "period=X"
    d.mkdir()
    f1 = d / "part-00000-aaaa.parquet"
    f1.write_bytes(b"old")
    os.utime(f1, ns=(1_000_000_000, 1_000_000_000))
    os.utime(d, ns=(1_000_000_000, 1_000_000_000))
    fp_before = sinks._partition_fingerprint(str(d))
    f1.unlink()
    f2 = d / "part-00000-bbbb.parquet"
    f2.write_bytes(b"new")  # same size, new name
    os.utime(f2, ns=(1_000_000_000, 1_000_000_000))
    os.utime(d, ns=(1_000_000_000, 1_000_000_000))
    assert sinks._partition_fingerprint(str(d)) != fp_before

    # (b) e2e with all timestamps coarsened to a constant
    import shutil
    import uuid as _uuid

    real_fp = sinks._partition_fingerprint

    def degenerate_clock(path):
        fp = real_fp(path)
        if not fp:
            return fp
        _, entries = fp
        return (0, tuple((n, 0, s) for n, s in ((e[0], e[2]) for e in entries)))

    monkeypatch.setattr(sinks, "_partition_fingerprint", degenerate_clock)
    base = str(tmp_path / "tbl")
    refresh = spark.createDataFrame(
        [("C1", "2025-1", "Algebra")], "id string, period string, name string"
    )
    sinks.write_courses_period_incremental(refresh, base, verify=True)

    stage = str(tmp_path / "stage")
    refresh.write.parquet(stage)
    donor = next(
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet")
    )
    from etl_upc_syllabus_spark.sources import formats

    real_audit = formats.audit_write_artifact_dirs

    def seeded(spark_, dirs):
        assert dirs, "rewritten partition dropped from audit scope"
        shutil.copy(
            donor,
            os.path.join(
                dirs[0], f"part-00000-{_uuid.uuid4()}.c000.snappy.parquet"
            ),
        )
        return real_audit(spark_, dirs)

    monkeypatch.setattr(formats, "audit_write_artifact_dirs", seeded)
    with pytest.raises(RuntimeError, match="write-artifact audit found"):
        sinks.write_courses_period_incremental(refresh, base, verify=True)
