"""Physical data layout at write time: range clustering and compaction.

At 100 TB, read performance is decided before the first query runs --
by how the data was written:

- **Range-clustered layout**: `repartitionByRange` on the query-time
  filter keys + `sortWithinPartitions` makes every parquet row group
  cover a narrow key range, so the reader's min/max statistics skip
  almost all of the file for a selective predicate. This is the
  poor-man's Z-order, and for single-key range predicates (dates,
  ids) it is optimal.
- **Compaction**: streaming/incremental sinks accumulate small files;
  a 100 TB table with 1 MB files spends more time listing and opening
  than scanning. `compact` rewrites a directory to a bounded file
  count with `maxRecordsPerFile` as the safety valve.

The reference has no layout control at all -- it writes one JSON file
per record (reference etl_infrastructure.py:153-158), the pathological
small-files case; `pipeline/sinks.py` already replaces that with
partitioned parquet, and this module adds the intra-partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_ranges: int,
    max_records_per_file: int | None = None,
) -> None:
    """Write `df` range-partitioned AND sorted on `cluster_cols`.

    Every output file then holds one contiguous key range; parquet
    min/max stats make range predicates on those columns skip whole
    row groups/files at read time.
    """
    writer = (
        df.repartitionByRange(n_ranges, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def compact(spark: SparkSession, path: str, out_path: str, target_files: int) -> int:
    """Rewrite a (small-file-fragmented) parquet dir into `target_files`
    files; returns the input file count for before/after reporting.

    coalesce (not repartition): merging needs no shuffle -- each output
    task reads several input files sequentially.
    """
    df = spark.read.parquet(path)
    n_in = df.rdd.getNumPartitions()
    df.coalesce(target_files).write.mode("overwrite").parquet(out_path)
    return n_in
