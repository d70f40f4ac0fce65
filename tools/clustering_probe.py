"""Quantify write_range_clustered's scan-pruning value (r11).

sources/layout.py has shipped range clustering since the early rounds
with the CLAIM that parquet min/max statistics then let range
predicates skip whole row groups/files -- but the claim was never
measured. This probe writes the SAME corpus (scale events) in two
physical layouts:

- **clustered**: ``layout.write_range_clustered`` on ``ts`` (the
  shipped operator -- range-repartition + sortWithinPartitions, one
  contiguous key range per file);
- **shuffled**: the adversarial layout -- rows ordered by a hash, so
  every row group's [min, max] spans the whole month and statistics
  prune nothing.

and runs the same pushable range aggregate (one day out of ~30 --
~3% selectivity) on both, reporting:

- wall-clock (min of N),
- STRUCTURAL pruning evidence from the parquet footers themselves:
  how many row groups' ts [min, max] intersect the queried window --
  what a stats-respecting reader must touch -- in each layout.

This is the same physics the DPP decade row measured for partition
pruning, one level down (row-group statistics instead of directory
partitions), and it is the layout lever a 100 TB time-series lake
pulls first: the query is identical, only the write-time layout
differs.

``--smallfiles`` measures layout.py's OTHER operator, ``compact``:
sf1 events written as 2000 tiny files (the classic streaming-ingest
fragmentation) vs the compacted rewrite -- full-scan aggregate
wall-clock, file counts, and the one-time compaction cost that
amortizes over every later read.

Usage: python tools/clustering_probe.py [--wide|--smallfiles] [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_RUNS = 5
WINDOW = ("2024-01-10 00:00:00", "2024-01-11 00:00:00")


def rowgroups_overlapping(path: str, lo, hi) -> tuple[int, int, int, int]:
    """(overlapping, total, bytes_overlapping, bytes_total) over the
    row groups whose ts [min, max] intersects [lo, hi), read straight
    from the parquet footers. Zero-row-group files (an empty write
    partition is legal) contribute nothing (review r11)."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    total = hit = 0
    bytes_total = bytes_hit = 0
    for f in files:
        pf = pq.ParquetFile(f)
        md = pf.metadata
        if md.num_row_groups == 0:
            continue
        ts_idx = pf.schema_arrow.names.index("ts")
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            st = rg.column(ts_idx).statistics
            total += 1
            bytes_total += rg.total_byte_size
            if st is None or st.min is None:
                hit += 1  # no stats: the reader must touch it
                bytes_hit += rg.total_byte_size
            else:
                # footer stats are tz-aware (UTC); compare naive-UTC
                smin = st.min.replace(tzinfo=None)
                smax = st.max.replace(tzinfo=None)
                if smin < hi and smax >= lo:
                    hit += 1
                    bytes_hit += rg.total_byte_size
    return hit, total, bytes_hit, bytes_total


def smallfiles(argv) -> int:
    import glob

    from pyspark.sql import functions as F

    from etl_upc_syllabus_spark.session import get_spark
    from etl_upc_syllabus_spark.sources.layout import compact
    from etl_upc_syllabus_spark.sources.tables import load_table

    sf_dir = argv[0] if argv else os.path.join(ROOT, "scale_data", "sf1")
    spark = get_spark("smallfiles-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events")

    def scan(path):
        best = float("inf")
        res = None
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            res = (
                spark.read.parquet(path)
                .agg(F.count(F.lit(1)).alias("n"),
                     F.round(F.sum("value"), 2).alias("sv"))
                .collect()[0]
            )
            best = min(best, time.perf_counter() - t0)
        return best, res

    out = {"sf_dir": os.path.basename(sf_dir), "runs": N_RUNS}
    with tempfile.TemporaryDirectory() as tmp:
        frag = os.path.join(tmp, "fragmented")
        comp = os.path.join(tmp, "compacted")
        ev.repartition(2000).write.parquet(frag)
        t0 = time.perf_counter()
        compact(spark, frag, comp, target_files=16)
        compact_cost = round(time.perf_counter() - t0, 3)
        t_f, r_f = scan(frag)
        t_c, r_c = scan(comp)
        assert (r_f["n"], r_f["sv"]) == (r_c["n"], r_c["sv"])
        out.update({
            "files_fragmented": len(glob.glob(frag + "/*.parquet")),
            "files_compacted": len(glob.glob(comp + "/*.parquet")),
            "scan_fragmented_s": round(t_f, 3),
            "scan_compacted_s": round(t_c, 3),
            "speedup": round(t_f / t_c, 2),
            "compact_cost_s": compact_cost,
            "reads_to_amortize": (
                max(1, round(compact_cost / max(t_f - t_c, 1e-9)))
                if t_f > t_c else None
            ),
        })
    print(json.dumps(out))
    spark.stop()
    return 0


def main(argv):
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_upc_syllabus_spark.session import get_spark
    from etl_upc_syllabus_spark.sources.layout import write_range_clustered
    from etl_upc_syllabus_spark.sources.tables import load_table

    if "--smallfiles" in argv:
        return smallfiles([a for a in argv if a != "--smallfiles"])
    wide = "--wide" in argv
    argv = [a for a in argv if a != "--wide"]
    sf_dir = argv[0] if argv else os.path.join(ROOT, "scale_data", "sf10")
    spark = get_spark("clustering-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events")
    if wide:
        # ~1 KB opaque payload per row (shared builder so fusion_bench
        # and this probe measure the identical shape): touching 5/96
        # row groups vs 96/96 then costs real decode work even
        # page-cached
        from _bench_common import wide_payload_col

        ev = ev.withColumn("payload", wide_payload_col())

    lo = dt.datetime.fromisoformat(WINDOW[0])
    hi = dt.datetime.fromisoformat(WINDOW[1])

    def agg(path):
        df = spark.read.parquet(path)
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sv"),
        ]
        if wide:
            # force the fat column through the reader: column pruning
            # would otherwise never touch payload and the layouts
            # would only differ on the two narrow predicate columns
            aggs.append(F.sum(F.length("payload")).alias("pl"))
        return (
            df.filter((F.col("ts") >= WINDOW[0]) & (F.col("ts") < WINDOW[1]))
            .agg(*aggs)
            .collect()[0]
        )

    out = {"sf_dir": os.path.basename(sf_dir), "wide": wide,
           "window_days": 1, "runs": N_RUNS}
    with tempfile.TemporaryDirectory() as tmp:
        clustered = os.path.join(tmp, "clustered")
        shuffled = os.path.join(tmp, "shuffled")
        write_range_clustered(ev, clustered, ["ts"], n_ranges=32)
        (
            ev.withColumn("_h", F.md5(F.col("event_id").cast("string")))
            .repartitionByRange(32, "_h")
            .sortWithinPartitions("_h")
            .drop("_h")
            .write.mode("overwrite")
            .parquet(shuffled)
        )
        for label, path in (("clustered", clustered), ("shuffled", shuffled)):
            res = None
            best = float("inf")
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                res = agg(path)
                best = min(best, time.perf_counter() - t0)
            hit, total, bhit, btotal = rowgroups_overlapping(path, lo, hi)
            out[label] = {
                "best_s": round(best, 3),
                "rows": res["n"],
                "sum_value": float(res["sv"]),
                "rowgroups_touched": hit,
                "rowgroups_total": total,
                "mb_touched": round(bhit / 1e6, 1),
                "mb_total": round(btotal / 1e6, 1),
            }
    assert out["clustered"]["rows"] == out["shuffled"]["rows"], "same data, same answer"
    assert out["clustered"]["sum_value"] == out["shuffled"]["sum_value"]
    out["speedup"] = round(out["shuffled"]["best_s"] / out["clustered"]["best_s"], 2)
    out["rowgroup_skip_ratio"] = round(
        1 - out["clustered"]["rowgroups_touched"] / max(out["clustered"]["rowgroups_total"], 1), 3
    )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
