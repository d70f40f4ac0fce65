"""Degenerate-input robustness sweep: every registry query vs a
ZERO-ROW corpus (default) or a NULL-HEAVY corpus (``--mode nulls``).

At 100 TB a pipeline constantly sees empty slices -- a date partition
with no events, a language shard with no documents, a filter that
matches nothing upstream of a join -- and null-riddled rows: scraped
documents with NULL text, embedding rows whose vector failed to
compute, events with NULL payloads.  Correctness at the gate SFs says
nothing about those paths: a query whose build step ``collect()``s a
codebook, derives a quantile cut, or folds a sampled truth set can
crash (or mis-plan) on them even though every clean fixture passes,
and Python/Arrow seams are the classic crash site for None values.

Modes:

- ``empty`` (default): the full 10-table schema at zero rows (schemas
  copied from the sf0.001 fixture via ``limit(0)``);
- ``nulls``: the fixture's rows with every non-key column replaced by
  NULL of its own type (key/id/join columns keep their values so the
  relational shape survives; what is tested is null VALUES, not
  broken referential integrity).

Runs ALL registry queries against the degenerate corpus, asserting
each one builds and executes without raising.  Output is one JSON
line::

    {"total": N, "ok": N, "failed": {"name": "ExcType: msg", ...},
     "slowest": [["name", sec], ...]}

Usage::

    python tools/empty_sweep.py [--mode empty|nulls]
                                [--only NAME[,NAME..]] [--src SF_DIR]

Findings feed fixes in the operator library (guard the degenerate
branch), then the pytest twin (tests/test_empty_corpus.py) pins the
property so a regression fails CI, not a production backfill.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_upc_syllabus_spark.plans import all_specs
from etl_upc_syllabus_spark.session import get_spark
from etl_upc_syllabus_spark.sources.tables import TABLES, load_table


def build_empty_fixture(spark, src_sf_dir: str, dest_dir: str) -> None:
    """Write every fixture table at zero rows, schema copied from src.

    Tables go through load_table, NOT a raw parquet read: a raw read
    of a TIMESTAMP(NANOS)-generation events fixture under the
    nanosAsLong conf resolves ts to bare int64, and writing THAT back
    produces a column with no timestamp logical type -- which
    events_ts_kind refuses by design. load_table normalizes ts to
    TimestampType first, so the degenerate fixture keeps a proper
    logical type whatever the source generation used."""
    for name in TABLES:
        df = load_table(spark, src_sf_dir, name).limit(0)
        df.write.mode("overwrite").parquet(os.path.join(dest_dir, f"{name}.parquet"))


def build_tiny_fixture(spark, src_sf_dir: str, dest_dir: str, n: int = 5) -> None:
    """Write every fixture table truncated to its first ``n`` rows (in
    id order where one exists) -- the small-sample degenerate:
    percentiles over fewer rows than buckets, codebook prefixes at the
    corpus size boundary, windows with single-row partitions."""
    for name in TABLES:
        df = load_table(spark, src_sf_dir, name)
        id_cols = [c for c in df.columns if c.lower().endswith(("key", "_id", "id"))]
        if id_cols:
            df = df.orderBy(*id_cols[:1])
        df.limit(n).write.mode("overwrite").parquet(
            os.path.join(dest_dir, f"{name}.parquet")
        )


#: columns that keep their values in --mode nulls: join/identity keys
#: (nulling them tests broken referential integrity, not null payloads)
#: and the event timestamp (a stream row with no event time is dropped
#: at ingestion in any real pipeline, not processed).
_KEY_SUFFIXES = ("key", "_id", "id")
_KEEP_ALWAYS = {"ts"}


def build_nulls_fixture(spark, src_sf_dir: str, dest_dir: str) -> None:
    """Write every fixture table with all non-key columns NULLed.

    Same load_table route as build_empty_fixture (ts keeps a real
    timestamp logical type whatever the source generation)."""
    from pyspark.sql import functions as F

    for name in TABLES:
        df = load_table(spark, src_sf_dir, name)
        cols = []
        for f in df.schema.fields:
            keep = f.name in _KEEP_ALWAYS or f.name.lower().endswith(_KEY_SUFFIXES)
            cols.append(
                F.col(f.name)
                if keep
                else F.lit(None).cast(f.dataType).alias(f.name)
            )
        df.select(*cols).write.mode("overwrite").parquet(
            os.path.join(dest_dir, f"{name}.parquet")
        )


def main(argv: list[str]) -> int:
    src = "/root/testdata/sf0.001"
    only: set[str] | None = None
    mode = "empty"
    args = list(argv)
    while args:
        a = args.pop(0)
        if a == "--src":
            src = args.pop(0)
        elif a == "--only":
            only = set(args.pop(0).split(","))
        elif a == "--mode":
            mode = args.pop(0)
            assert mode in ("empty", "nulls", "tiny"), mode
        else:
            raise SystemExit(f"unknown arg {a!r}")

    spark = get_spark("empty_sweep")
    failed: dict[str, str] = {}
    times: dict[str, float] = {}
    n = 0
    builders = {
        "empty": build_empty_fixture,
        "nulls": build_nulls_fixture,
        "tiny": build_tiny_fixture,
    }
    with tempfile.TemporaryDirectory(prefix=f"{mode}_corpus_") as tmp:
        builders[mode](spark, src, tmp)
        for spec in all_specs().values():
            if only is not None and spec.name not in only:
                continue
            n += 1
            t0 = time.monotonic()
            try:
                df = spec.fn(spark, tmp)
                df.count()  # execute the full plan
            except Exception as exc:  # noqa: BLE001 -- survey, not assert
                tb_last = traceback.format_exc().strip().splitlines()[-1]
                failed[spec.name] = f"{type(exc).__name__}: {tb_last[:300]}"
            times[spec.name] = round(time.monotonic() - t0, 2)
            spark.catalog.clearCache()
    slowest = sorted(times.items(), key=lambda kv: -kv[1])[:8]
    print(
        json.dumps(
            {"total": n, "ok": n - len(failed), "failed": failed, "slowest": slowest}
        )
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
