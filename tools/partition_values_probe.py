"""Hostile partition-VALUE posture probe (r12 axis).

A 100 TB lake is laid out by ``partitionBy`` on string keys the
pipeline does not control (period codes, language tags, source
names). This probe measures what each hostile value class does to the
hive directory layout, the Spark read-back, partition pruning, and
the cross-engine (DuckDB ``hive_partitioning``) view of the SAME
directories.

Measured matrix (18 classes, local[8], Spark 4.1):

- 16/18 classes roundtrip AND prune exactly -- Spark percent-escapes
  the directory name (``a=b`` -> ``pv=a%3Db``, newline -> ``%0A``,
  ...) and unescapes on read; equality filters on the hostile value
  prune to the right directory. Trailing dot/space, NFC/NFD, ``#``,
  ``*``, ``?``, quotes: all exact.
- 2/18 SILENT value changes, both through the null sentinel
  directory: the EMPTY STRING and the literal string
  ``__HIVE_DEFAULT_PARTITION__`` are written into
  ``pv=__HIVE_DEFAULT_PARTITION__`` -- the same directory real NULLs
  use -- and ALL of them read back as NULL. On a table carrying all
  three, a 3-way silent merge: groupBy(pv) returns (NULL, 3), a
  filter ``pv = ''`` matches nothing, every '' row is gone.
- Cross-engine divergence on the same layout: DuckDB
  ``hive_partitioning=1`` reads that directory as the LITERAL string
  ``__HIVE_DEFAULT_PARTITION__`` (3 rows) where Spark reads NULL --
  the two engines disagree on every row in the sentinel directory
  with zero errors anywhere. And DuckDB does NOT unescape the hive
  percent-escapes either: every directory Spark escaped reads back
  literally (``a=b`` -> ``a%3Db``, newline -> ``a%0Ab``, ...), so on
  a multi-engine lake EVERY value Spark had to escape is a silent
  cross-engine divergence -- 12 of 18 classes in this matrix.
  Spark-side the escaping is exact; the posture for multi-engine
  lakes is to keep partition values in the unescaped-safe alphabet
  (or read the layout only through engines honoring the escaping).

Gate: ``operators.curation.quarantine_partition_keys`` -- a pure
filter (stream-safe, composable with quarantine_hostile's sides)
quarantining rows whose value for an intended partition column is the
empty string or the hive sentinel BEFORE the write lays them out.
True NULL stays clean by default (Spark-defined round-trip) but the
probe's duckdb row is the argument for ``allow_null=False`` on
multi-engine lakes.

TYPE-INFERENCE classes (the second half of the matrix, ``--infer``):
numeric/date-LOOKING string partition values are re-typed by Spark's
partition-column type inference on schema-less reads --
``'01'`` -> int 1 (the leading zero is GONE: month/code columns),
``'1e5'`` -> decimal 100000, ``'1.50'`` -> double 1.5,
``'2024-01-01'`` -> date -- all silent, and all DIVERGENT from DuckDB,
which reads every hive partition value as its literal string. Both
mitigations are exact: an explicit read schema (the read_resilient
posture -- schema-first reads are inference-proof by construction) or
``spark.sql.sources.partitionColumnTypeInference.enabled=false``.
The engine's own period layout is inference-proof by construction
(parse_filename emits 'YYYY-T', never a bare number -- pinned);
hardening ``sinks.read_courses`` with an explicit schema is the r13
candidate (its two registry queries are r9-cohort, rotating r13).

Usage::

    python tools/partition_values_probe.py [--gated] [--infer]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


CLASSES: dict[str, str | None] = {
    "space": "a b",
    "equals": "a=b",
    "slash": "a/b",
    "percent_seq": "a%2Fb",
    "colon": "a:b",
    "hash": "a#b",
    "nfc_accent": "Sí",
    "nfd_accent": "Sí",
    "newline": "a\nb",
    "tab": "a\tb",
    "dot_end": "a.",
    "space_end": "a ",
    "hive_sentinel": "__HIVE_DEFAULT_PARTITION__",
    "null": None,
    "empty": "",
    "star": "a*b",
    "question": "a?b",
    "quote": 'a"b',
}


#: numeric/date-looking string values vs what a schema-less read
#: re-types them to (None = survives as the same string)
INFER_CLASSES: dict[str, str] = {
    "leading_zero": "01",
    "plain_int": "7",
    "sci_notation": "1e5",
    "float_like": "1.50",
    "date_like": "2024-01-01",
    "bool_like": "true",
    "hex_like": "0x1A",
}


def _run_infer(spark, root: str) -> int:
    from pyspark.sql import functions as F  # noqa: F401

    out = {}
    for k, v in INFER_CLASSES.items():
        d = os.path.join(root, f"i_{k}")
        spark.createDataFrame([(1, v)], "id int, pv string").write.partitionBy(
            "pv"
        ).parquet(d)
        back = spark.read.parquet(d)
        got = back.collect()[0]["pv"]
        dtype = back.schema["pv"].dataType.simpleString()
        if got == v and dtype == "string":
            out[k] = "survives"
        else:
            out[k] = f"SILENT: {v!r} -> {got!r} ({dtype})"
        # both mitigations must be exact; restore the PRIOR conf value,
        # not a hard-coded 'true' -- a session that deliberately
        # disabled inference must not get it silently re-enabled
        # (ADVICE r12)
        a = spark.read.schema("id int, pv string").parquet(d).collect()[0]["pv"]
        key = "spark.sql.sources.partitionColumnTypeInference.enabled"
        prior = spark.conf.get(key)
        spark.conf.set(key, "false")
        try:
            b = spark.read.parquet(d).collect()[0]["pv"]
        finally:
            spark.conf.set(key, prior)
        out[k] += f"; explicit_schema={'exact' if a == v else 'DIVERGED'}"
        out[k] += f"; inference_off={'exact' if b == v else 'DIVERGED'}"
    n_silent = sum(1 for v in out.values() if v.startswith("SILENT"))
    print(json.dumps({"mode": "infer", "classes": out, "n_silent": n_silent}),
          flush=True)
    return 0


def main(argv: list[str]) -> int:
    gated = "--gated" in argv
    infer = "--infer" in argv

    from etl_upc_syllabus_spark.session import get_spark

    spark = get_spark("partition-values-probe")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="partition_values_probe_")
    try:
        if infer:
            return _run_infer(spark, root)
        return _run(spark, root, gated)
    finally:
        # the probe exists to catch regressions, so it must clean up
        # on the failing path too (review r12)
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


def _run(spark, root: str, gated: bool) -> int:
    from pyspark.sql import functions as F

    out: dict[str, str] = {}
    rows = [(i, k, v) for i, (k, v) in enumerate(CLASSES.items())]
    df = spark.createDataFrame(rows, "id int, cls string, pv string")

    if gated:
        from etl_upc_syllabus_spark.operators.curation import (
            quarantine_partition_keys,
        )

        df, quarantined = quarantine_partition_keys(df, "pv")
        dropped = {r["cls"]: r["quarantine_reason"] for r in quarantined.collect()}
    else:
        dropped = {}

    d = os.path.join(root, "t")
    df.write.partitionBy("pv").parquet(d)
    back = {r["cls"]: r["pv"] for r in spark.read.parquet(d).collect()}
    for k, v in CLASSES.items():
        if k in dropped:
            out[k] = f"gated:{dropped[k]}"
        elif k not in back:
            out[k] = "SILENT: row missing"
        elif back[k] != v:
            out[k] = f"SILENT: {v!r} -> {back[k]!r}"
        else:
            out[k] = "roundtrip ok"

    # pruning spot-check on the escaped classes
    prune_ok = all(
        spark.read.parquet(d).filter(F.col("pv") == CLASSES[k]).count() == 1
        for k in ("equals", "slash", "newline")
        if k not in dropped
    )

    # cross-engine view of the same layout
    try:
        import duckdb

        con = duckdb.connect()
        duck = con.execute(
            f"SELECT pv, count(*) FROM read_parquet('{d}/*/*.parquet', "
            "hive_partitioning=1) GROUP BY 1 ORDER BY 1 NULLS FIRST"
        ).fetchall()
        duck_view = [[p, int(n)] for p, n in duck]
    except Exception as e:  # noqa: BLE001 -- posture capture
        duck_view = [[f"LOUD {type(e).__name__}", 0]]

    n_silent = sum(1 for v in out.values() if v.startswith("SILENT"))
    print(
        json.dumps(
            {
                "gated": gated,
                "classes": out,
                "n_silent": n_silent,
                "prune_exact_on_escaped": prune_ok,
                "duckdb_view_of_sentinel_layout": duck_view,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
