"""r14 receipts: (A) the 9.5x-style O(batch) receipt reproduced on the
SNAPSHOT path (publish_snapshot_incremental vs a whole-table
publish_snapshot for the same 1-of-50-partitions refresh, sf1
lineitem), and (B) the distributed write-audit's file-count scaling
(12.8k files across 200 hive partitions, the r13 reference shape).

Usage: python tools/snapshot_probe.py [sf1_dir]
Prints one JSON line per receipt.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from etl_upc_syllabus_spark.sources.formats import audit_write_artifacts
from etl_upc_syllabus_spark.sources.layout import (
    publish_snapshot,
    publish_snapshot_incremental,
    read_current_snapshot,
)


def snapshot_receipt(spark, sf1_dir: str, work: str) -> dict:
    li = spark.read.parquet(os.path.join(sf1_dir, "lineitem.parquet"))
    df = li.withColumn("pk", (F.col("l_orderkey") % 50).cast("string"))
    n_total = df.count()

    t_inc = os.path.join(work, "tbl_inc")
    t0 = time.perf_counter()
    publish_snapshot_incremental(df, t_inc, "pk")
    full_first = round(time.perf_counter() - t0, 3)

    # the refresh batch: partition pk=7 only, recomputed
    batch = df.filter(F.col("pk") == "7")

    # A1: whole-table snapshot path -- a new version costs the table
    t_whole = os.path.join(work, "tbl_whole")
    publish_snapshot(df, t_whole)
    refreshed_full = df.filter(F.col("pk") != "7").unionByName(batch)
    t0 = time.perf_counter()
    publish_snapshot(refreshed_full, t_whole)
    whole_refresh = round(time.perf_counter() - t0, 3)

    # A2: pointer path -- a new version costs the batch
    t0 = time.perf_counter()
    publish_snapshot_incremental(batch, t_inc)
    inc_refresh = round(time.perf_counter() - t0, 3)

    # A3: apples-to-apples -- the SAME refresh republished FULL on the
    # pointer path (same partitioned layout, same atomic versioning):
    # what a user without incremental pointers would pay per version
    t0 = time.perf_counter()
    publish_snapshot_incremental(refreshed_full, t_inc)
    full_pointer_refresh = round(time.perf_counter() - t0, 3)

    # read back the version published by the INCREMENTAL refresh (the
    # full republish above added a later version with identical rows)
    back = read_current_snapshot(spark, t_inc)
    n_back = back.count()
    t0 = time.perf_counter()
    n_part = back.filter(F.col("pk") == "7").count()
    part_read = round(time.perf_counter() - t0, 3)

    return {
        "receipt": "snapshot_incremental_obatch",
        "rows": n_total,
        "rows_after_refresh": n_back,
        "partition_rows": n_part,
        "first_full_publish_sec": full_first,
        "whole_table_refresh_sec": whole_refresh,
        "full_pointer_refresh_sec": full_pointer_refresh,
        "incremental_refresh_sec": inc_refresh,
        "speedup_vs_full_pointer": round(full_pointer_refresh / inc_refresh, 1),
        "speedup_vs_whole_table": round(whole_refresh / inc_refresh, 1),
        "partition_read_sec": part_read,
    }


def audit_receipt(spark, work: str) -> dict:
    # the r13 reference shape: 200 hive partitions x 64 files = 12.8k
    d = os.path.join(work, "fragmented")
    (
        spark.range(1_280_000)
        .select((F.col("id") % 200).cast("string").alias("k"), F.col("id").alias("v"))
        .repartition(64)
        .write.partitionBy("k")
        .parquet(d)
    )
    n_files = sum(len(fs) for _, _, fs in os.walk(d))
    t0 = time.perf_counter()
    n_issues = audit_write_artifacts(spark, d).count()
    clean_sec = round(time.perf_counter() - t0, 3)
    # torn table: phase 2 runs too
    src = None
    for root, _, fs in os.walk(d):
        for f in fs:
            if f.endswith(".parquet"):
                src = os.path.join(root, f)
                break
        if src:
            break
    import uuid

    shutil.copy(
        src,
        os.path.join(
            os.path.dirname(src), f"part-00000-{uuid.uuid4()}.c000.snappy.parquet"
        ),
    )
    t0 = time.perf_counter()
    n_torn = audit_write_artifacts(spark, d).count()
    torn_sec = round(time.perf_counter() - t0, 3)
    return {
        "receipt": "audit_distributed_listing",
        "n_files": n_files,
        "clean_audit_sec": clean_sec,
        "clean_issues": n_issues,
        "torn_audit_sec": torn_sec,
        "torn_issues": n_torn,
    }


def pointer_width_receipt(spark, work: str, n_parts: int = 2000) -> dict:
    """Manifest-width scaling: a pointer table with n_parts partitions
    -- the cost driver of the pointer read is the explicit path list
    (one dir per partition), so measure publish/refresh/read at a
    width 40x the sf1 receipt's."""
    t = os.path.join(work, "tbl_wide")
    # repartition by the partition column first: without it every task
    # writes a file into every partition dir (32 x 2000 = 64k tiny
    # files; measured 213 s publish / 31 s read on this exact shape) --
    # the standard partitionBy recipe, named in the publish docstring
    df = (
        spark.range(n_parts * 50)
        .select(
            (F.col("id") % n_parts).cast("string").alias("pk"),
            F.col("id").alias("v"),
        )
        .repartition(F.col("pk"))
    )
    t0 = time.perf_counter()
    publish_snapshot_incremental(df, t, "pk")
    full_sec = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    publish_snapshot_incremental(df.filter(F.col("pk") == "7"), t)
    refresh_sec = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    n = read_current_snapshot(spark, t).count()
    read_sec = round(time.perf_counter() - t0, 3)
    return {
        "receipt": "pointer_manifest_width",
        "n_partitions": n_parts,
        "rows": n,
        "full_publish_sec": full_sec,
        "one_partition_refresh_sec": refresh_sec,
        "full_read_sec": read_sec,
    }


def rebase_receipt(spark, work: str, n_parts: int = 50) -> dict:
    """r15 (VERDICT r14 item 4): the read-cost curve vs LIVE snapshot
    count, and what rebase_pointer_table buys back. A table refreshed
    partition-at-a-time converges on one live snapshot PER partition;
    the reader unions one branch per live snapshot, so read cost grows
    with that count. sf1-shaped: 50 partitions x 100k rows."""
    from etl_upc_syllabus_spark.sources.layout import rebase_pointer_table

    t = os.path.join(work, "tbl_rebase")
    df = (
        spark.range(n_parts * 100_000)
        .select(
            (F.col("id") % n_parts).cast("string").alias("pk"),
            F.col("id").alias("v"),
        )
        .repartition(F.col("pk"))
    )
    publish_snapshot_incremental(df, t, "pk")

    def read_sec() -> float:
        t0 = time.perf_counter()
        read_current_snapshot(spark, t).count()
        return round(time.perf_counter() - t0, 3)

    curve = {1: read_sec()}
    # refresh partitions one at a time; each refreshed partition pins
    # its own snapshot -> live count = refreshed + 1
    for i in range(n_parts - 1):
        publish_snapshot_incremental(
            df.filter(F.col("pk") == str(i)).repartition(1), t
        )
        if i + 2 in (10, 25, n_parts):
            curve[i + 2] = read_sec()

    t0 = time.perf_counter()
    rebase_pointer_table(spark, t, vacuum_keep=1)
    rebase_sec = round(time.perf_counter() - t0, 3)
    curve["1_post_rebase"] = read_sec()
    return {
        "receipt": "rebase_read_cost_vs_live_snapshots",
        "n_partitions": n_parts,
        "rows": n_parts * 100_000,
        "read_sec_by_live_snapshots": {str(k): v for k, v in curve.items()},
        "rebase_sec": rebase_sec,
    }


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_data/sf1"
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("snapshot_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="snapshot_probe_")
    try:
        print(json.dumps(audit_receipt(spark, work)))
        print(json.dumps(pointer_width_receipt(spark, work)))
        print(json.dumps(rebase_receipt(spark, work)))
        if os.path.isdir(sf1):
            print(json.dumps(snapshot_receipt(spark, sf1, work)))
        else:
            print(json.dumps({"receipt": "snapshot_incremental_obatch",
                              "skipped": f"no sf1 dir at {sf1}"}))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
