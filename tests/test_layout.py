"""Write-time layout: range clustering bounds per-file key ranges (the
row-group-skipping precondition) and compaction bounds file counts."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from etl_upc_syllabus_spark.sources.layout import compact, write_range_clustered


def test_range_clustered_files_cover_disjoint_ranges(spark, tmp_path):
    df = spark.range(0, 10_000).select(
        (F.col("id") * 7919 % 10_000).alias("k"), F.col("id").alias("v")
    )
    out = os.path.join(str(tmp_path), "clustered")
    write_range_clustered(df, out, ["k"], n_ranges=8)

    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert 1 < len(files) <= 8
    # each file holds one contiguous, non-overlapping k-range
    spans = []
    for f in files:
        mn, mx = spark.read.parquet(f).agg(F.min("k"), F.max("k")).collect()[0]
        spans.append((mn, mx))
    spans.sort()
    for (_, prev_max), (nxt_min, _) in zip(spans, spans[1:]):
        assert prev_max < nxt_min
    # nothing lost
    assert spark.read.parquet(out).count() == 10_000


def test_compact_bounds_file_count(spark, tmp_path):
    src = os.path.join(str(tmp_path), "fragmented")
    # simulate an incremental sink: many tiny appends
    for i in range(10):
        spark.range(i * 10, (i + 1) * 10).write.mode("append").parquet(src)
    assert len(glob.glob(os.path.join(src, "part-*.parquet"))) >= 10

    out = os.path.join(str(tmp_path), "compacted")
    compact(spark, src, out, target_files=2)
    assert len(glob.glob(os.path.join(out, "part-*.parquet"))) <= 2
    assert spark.read.parquet(out).count() == 100


def test_fan_out_metadata_probe(spark, sf_dir, tmp_path):
    from etl_upc_syllabus_spark.sources.tables import fan_out, load_table

    cores = spark.sparkContext.defaultParallelism
    # tiny single-file scan -> repartitioned to full parallelism
    small = load_table(spark, sf_dir, "documents")
    assert fan_out(small).rdd.getNumPartitions() == cores
    # no file-based lineage (in-memory DF) -> conservative no-op
    mem = spark.range(10).toDF("x")
    assert fan_out(mem) is mem
    # already >= cores files -> no-op (identity, no shuffle added)
    many_dir = str(tmp_path / "many")
    spark.range(1000).repartition(cores + 1).write.parquet(many_dir)
    many = spark.read.parquet(many_dir)
    assert fan_out(many) is many
