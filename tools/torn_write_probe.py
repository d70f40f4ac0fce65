"""Torn-write / job-failure artifact probe (r13 axis).

What does a killed or doubly-retried write job leave in a lake
directory, and what does each engine then read? Four deterministic
classes, measured through a REAL Spark commit (part naming +
_SUCCESS), then polluted:

1. ``_temporary/`` residue (FileOutputCommitter v1 staging surviving a
   driver kill): Spark hides ``_``-prefixed paths -> correct count;
   DuckDB's RECURSIVE glob (``dir/**/*.parquet``) reads the staged
   attempt as data -> SILENT +phantom rows, zero errors.
2. orphan part file from a different writer-job UUID (committer-v2
   crash / speculative attempt / manual copy): BOTH engines silently
   double-count -- the worst class, both agree on the wrong answer.
3. zero-byte torn part: Spark SKIPS it silently even with
   ignoreCorruptFiles=false (zero-length -> no read splits); DuckDB
   refuses the whole glob loudly.
4. missing ``_SUCCESS``: the job never committed; Spark reads the
   partial output with no signal anywhere.

``--gated`` re-runs the matrix with
``sources.formats.audit_write_artifacts`` published first: every class
lands in the report with its issue name, so the posture becomes a
decision instead of a silent read.

r13 measured (local[8], 20-row baseline, 5-row pollution):
raw     {"baseline": 20/20, "temporary": {"spark": 20, "duck_recursive": 25},
         "orphan": {"spark": 25, "duck": 25}, "zero_byte":
         {"spark": 25, "duck": "Invalid Input Error"},
         "no_success": {"spark": 20, "signal": "none"}}
gated   {"temporary_residue": 1, "orphan_writer_uuid": 1,
         "zero_byte": 1, "missing_success": 1} -- 0 silent classes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import uuid

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def build_polluted(spark, base: str) -> str:
    """A real committed table + all four artifact classes."""
    d = os.path.join(base, "t")
    spark.range(20).withColumnRenamed("id", "v").coalesce(2).write.parquet(d)
    stage = os.path.join(base, "stage")
    spark.range(100, 105).withColumnRenamed("id", "v").coalesce(1).write.parquet(stage)
    src = next(
        os.path.join(stage, f) for f in os.listdir(stage) if f.endswith(".parquet")
    )
    tmpdir = os.path.join(
        d, "_temporary/0/_temporary/attempt_202608160001_0001_m_000000_0"
    )
    os.makedirs(tmpdir)
    shutil.copy(src, os.path.join(tmpdir, os.path.basename(src)))
    shutil.copy(src, os.path.join(d, f"part-00000-{uuid.uuid4()}.c000.snappy.parquet"))
    open(os.path.join(d, f"part-00002-{uuid.uuid4()}.snappy.parquet"), "wb").close()
    os.remove(os.path.join(d, "_SUCCESS"))  # the job "never committed"
    return d


def main(argv: list[str]) -> int:
    import duckdb

    from etl_upc_syllabus_spark.session import get_spark
    from etl_upc_syllabus_spark.sources.formats import audit_write_artifacts

    gated = "--gated" in argv
    spark = get_spark("torn-write-probe", cpus=8)
    base = "/tmp/torn_write_probe"
    shutil.rmtree(base, ignore_errors=True)
    d = build_polluted(spark, base)

    out: dict[str, object] = {}
    if gated:
        report = audit_write_artifacts(spark, d).collect()
        out["report"] = sorted(
            (os.path.relpath(r["file"], d), r["issue"]) for r in report
        )
        out["n_issues"] = len(report)
    else:
        out["spark_read"] = spark.read.parquet(d).count()
        try:
            out["duck_recursive"] = duckdb.sql(
                f"select count(*) from read_parquet('{d}/**/*.parquet')"
            ).fetchone()[0]
        except Exception as e:  # noqa: BLE001
            out["duck_recursive"] = f"{type(e).__name__}: {str(e)[:80]}"
        try:
            out["duck_flat"] = duckdb.sql(
                f"select count(*) from read_parquet('{d}/*.parquet')"
            ).fetchone()[0]
        except Exception as e:  # noqa: BLE001
            out["duck_flat"] = f"{type(e).__name__}: {str(e)[:80]}"
    print(json.dumps({"mode": "gated" if gated else "raw", **out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
