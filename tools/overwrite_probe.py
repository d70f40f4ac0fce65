"""Overwrite-semantics probe (r13 axis).

Two footguns around ``mode("overwrite")`` on a partitioned lake table,
measured:

1. **Static partition overwrite is silent full-table data loss.**
   Spark's default ``partitionOverwriteMode=STATIC`` makes an
   "incremental" write of one partition's refresh DELETE EVERY OTHER
   PARTITION with no error -- writing p=b's new rows leaves only p=b.
   ``dynamic`` (set per-write via the DataFrameWriter option, no
   session conf mutation) overwrites exactly the partitions present in
   the batch. Shipped: ``sinks.write_courses_period_incremental``.

2. **A read racing an overwrite: loud fail-fast, SILENT resilient.**
   A DataFrame snapshots its file listing at analysis; overwrite the
   directory before its action and the fail-fast reader dies loudly
   (FAILED_READ_FILE.FILE_NOT_EXIST), but ``read_resilient``'s
   ignoreMissingFiles resolves every vanished file to nothing and
   returns 0 rows with no error anywhere -- total silent loss from a
   composition of two individually-sane features (same family as the
   r12 checksum x ignoreCorruptFiles caveat).

r13 measured (local[8]): static {'b': 20} (partition a GONE), dynamic
{'a': 1, 'b': 20}; stale fail-fast reader -> FILE_NOT_EXIST, stale
resilient reader -> 0 rows silent (was 100).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(argv: list[str]) -> int:
    from pyspark.sql import types as T

    from etl_upc_syllabus_spark.session import get_spark
    from etl_upc_syllabus_spark.sources.formats import read_resilient

    spark = get_spark("overwrite-probe", cpus=8)
    base = "/tmp/overwrite_probe"
    shutil.rmtree(base, ignore_errors=True)
    d = os.path.join(base, "t")
    out: dict[str, object] = {
        "default_mode": spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    }

    def seed():
        shutil.rmtree(d, ignore_errors=True)
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "v int, p string"
        ).write.partitionBy("p").parquet(d)

    refresh = spark.createDataFrame([(20, "b")], "v int, p string")

    seed()
    refresh.write.mode("overwrite").partitionBy("p").parquet(d)
    out["static"] = sorted(
        (r["p"], r["v"]) for r in spark.read.parquet(d).collect()
    )

    seed()
    refresh.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("p").parquet(d)
    out["dynamic_per_write_option"] = sorted(
        (r["p"], r["v"]) for r in spark.read.parquet(d).collect()
    )

    # the race: analyze, overwrite, act
    shutil.rmtree(d)
    spark.range(100).withColumnRenamed("id", "v").coalesce(2).write.parquet(d)
    failfast = spark.read.parquet(d)
    resilient = read_resilient(
        spark, d, T.StructType([T.StructField("v", T.LongType())])
    )
    assert failfast.count() == 100 and resilient.count() == 100
    spark.range(5).withColumnRenamed("id", "v").coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    try:
        out["stale_failfast"] = failfast.count()
    except Exception as e:  # noqa: BLE001
        out["stale_failfast"] = f"LOUD {type(e).__name__}"
    out["stale_resilient"] = resilient.count()

    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
