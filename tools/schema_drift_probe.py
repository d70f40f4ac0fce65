"""Type-conflict schema-drift probe (r11): what happens when the SAME
column lands with DIFFERENT types across a lake table's files.

The registry already covers ADDITIVE drift (`source_schema_evolution`:
a new column appears, mergeSchema NULL-fills the old batch -- parity
with an explicit-SQL oracle). This probe measures the uglier classes a
long-lived ingest actually produces -- a writer downgrade flips int64
to int32, a format change lands a numeric column as strings, a rename
splits one logical column across two names -- against three reader
postures:

- **spark_plain**: `spark.read.parquet(dir)` -- trusts ONE footer
  (which one is a listing accident);
- **spark_merge**: `mergeSchema=true` -- the documented reconciler;
- **duckdb**: `read_parquet(glob, union_by_name=true)` -- the oracle
  engine's reconciler.

Posture classes per (reader, drift class): ``parity`` (reads, values
equal the explicit cast-and-union ground truth), ``loud`` (refuses
with a named error), ``SILENT`` (reads without error, values differ
from ground truth). Ground truth per class is the hand-reconciled
union (explicit casts), computed in plain pyarrow/python -- not via
either reader under test.

``--gated`` runs the shipped census FIRST --
`sources.formats.scan_schema_drift` (footers-only, executor-side) --
and asserts it detects every planted class (`type_conflict` /
`partial` rows), which is the 100 TB defense: census, then choose the
reader posture per column, never first-footer luck.

Usage: python tools/schema_drift_probe.py [--gated]
Prints one posture row per (class, reader) and a JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

#: base batch: (event_id int64, value double)
BASE = {"event_id": list(range(100)), "value": [float(i) / 4 for i in range(100)]}


def _write(d, path, schema):
    pq.write_table(pa.table(d, schema=schema), path)


def build_class(tmp: str, cls: str) -> tuple[str, dict]:
    """Write [base, drifted] into tmp/cls; return (dir, ground truth).

    Ground truth = the explicit reconciliation a careful engineer would
    write: per-batch cast to the WIDEST type, union. Computed in plain
    python so no reader under test defines it.
    """
    d = os.path.join(tmp, cls)
    os.makedirs(d)
    base_schema = pa.schema([("event_id", pa.int64()), ("value", pa.float64())])
    # _rev classes plant the DRIFTED file first in listing order: the
    # plain reader resolves its schema from a footer chosen by listing
    # order, so posture can flip with file naming alone (measured:
    # int64-footer-first reads int32 chunks fine by upcast; int32-
    # footer-first dies at TASK level mid-job with
    # PARQUET_COLUMN_DATA_TYPE_MISMATCH)
    base_name = "part-001.parquet" if cls.endswith("_rev") else "part-000.parquet"
    drift_name = "part-000.parquet" if cls.endswith("_rev") else "part-001.parquet"
    cls = cls.removesuffix("_rev")
    _write(BASE, os.path.join(d, base_name), base_schema)
    drift_ids = list(range(100, 200))
    if cls == "narrowed_int":
        # writer downgrade: event_id arrives as int32 in the new batch
        sch = pa.schema([("event_id", pa.int32()), ("value", pa.float64())])
        _write({"event_id": drift_ids, "value": [1.0] * 100},
               os.path.join(d, drift_name), sch)
        truth = {"n": 200, "sum_value": sum(BASE["value"]) + 100.0,
                 "sum_id": sum(BASE["event_id"]) + sum(drift_ids)}
    elif cls == "num_to_string":
        # format change: value lands as strings
        sch = pa.schema([("event_id", pa.int64()), ("value", pa.string())])
        _write({"event_id": drift_ids, "value": [str(float(i)) for i in range(100)]},
               os.path.join(d, drift_name), sch)
        truth = {"n": 200,
                 "sum_value": sum(BASE["value"]) + sum(float(i) for i in range(100)),
                 "sum_id": sum(BASE["event_id"]) + sum(drift_ids)}
    elif cls == "renamed":
        # value -> amount: one logical column under two names
        sch = pa.schema([("event_id", pa.int64()), ("amount", pa.float64())])
        _write({"event_id": drift_ids, "amount": [2.0] * 100},
               os.path.join(d, drift_name), sch)
        # ground truth coalesces the rename
        truth = {"n": 200, "sum_value": sum(BASE["value"]) + 200.0,
                 "sum_id": sum(BASE["event_id"]) + sum(drift_ids)}
    else:
        raise ValueError(cls)
    return d, truth


def classify(reader, truth):
    """Every ground-truth column must flow through the reader: column
    pruning otherwise HIDES a type-conflict (the reversed narrowed-int
    case reads clean while the drifted column is never decoded -- the
    task-level mismatch is lazy per-column; measured r11)."""
    try:
        n, sv, si = reader()
    except Exception as e:  # noqa: BLE001 -- the probe IS the catch
        return "loud", f"{type(e).__name__}: {str(e)[:90]}"
    if (n == truth["n"] and sv is not None and si is not None
            and abs(sv - truth["sum_value"]) < 1e-9 and si == truth["sum_id"]):
        return "parity", ""
    return "SILENT", (f"n={n} sum={sv} sum_id={si} "
                      f"(want n={truth['n']} sum={truth['sum_value']} "
                      f"sum_id={truth['sum_id']})")


def main(argv):
    gated = "--gated" in argv
    import duckdb
    from pyspark.sql import functions as F

    from etl_upc_syllabus_spark.session import get_spark
    from etl_upc_syllabus_spark.sources.formats import scan_schema_drift

    spark = get_spark("schema-drift-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        for cls in ("narrowed_int", "narrowed_int_rev", "num_to_string", "renamed"):
            d, truth = build_class(tmp, cls)

            def spark_read(merge):
                def go():
                    r = spark.read
                    if merge:
                        r = r.option("mergeSchema", "true")
                    df = r.parquet(d)
                    cols = df.columns
                    val = (
                        F.coalesce(F.col("value").cast("double"),
                                   F.col("amount").cast("double"))
                        if "amount" in cols else F.col("value").cast("double")
                    )
                    row = df.agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum(val).alias("sv"),
                        F.sum(F.col("event_id").cast("long")).alias("si"),
                    ).collect()[0]
                    return row["n"], row["sv"], row["si"]
                return go

            def duck():
                con = duckdb.connect()
                cols = [r[0] for r in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{d}/*.parquet', union_by_name=true)"
                ).fetchall()]
                val = ("coalesce(CAST(value AS DOUBLE), CAST(amount AS DOUBLE))"
                       if "amount" in cols else "CAST(value AS DOUBLE)")
                n, sv, si = con.execute(
                    f"SELECT count(*), sum({val}), sum(CAST(event_id AS BIGINT)) FROM "
                    f"read_parquet('{d}/*.parquet', union_by_name=true)"
                ).fetchone()
                return n, sv, si

            for reader_name, fn in [
                ("spark_plain", spark_read(False)),
                ("spark_merge", spark_read(True)),
                ("duckdb_union_by_name", duck),
            ]:
                posture, detail = classify(fn, truth)
                results[f"{cls}/{reader_name}"] = posture
                print(f"{cls:15s} {reader_name:22s} {posture:8s} {detail}", flush=True)

            if gated:
                census = {r["column"]: r["drift"]
                          for r in scan_schema_drift(spark, d).collect()}
                expect = {
                    "narrowed_int": {"event_id": "type_conflict", "value": "stable"},
                    "narrowed_int_rev": {"event_id": "type_conflict", "value": "stable"},
                    "num_to_string": {"event_id": "stable", "value": "type_conflict"},
                    "renamed": {"event_id": "stable", "value": "partial",
                                "amount": "partial"},
                }[cls]
                ok = census == expect
                results[f"{cls}/census"] = "detected" if ok else f"MISSED {census}"
                print(f"{cls:15s} {'scan_schema_drift':22s} "
                      f"{'detected' if ok else 'MISSED'} {census}", flush=True)

    n_silent = sum(1 for v in results.values() if v == "SILENT")
    print(json.dumps({"probe": "schema_drift", "gated": gated,
                      "cells": len(results), "silent": n_silent,
                      "postures": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
