"""Table profiling (data-quality observability).

Every serious ingest pipeline profiles what it lands: row counts,
null rates, distinct cardinalities, value ranges per column. The
profile is computed as one single-column aggregate per column, unioned
-- ON A COLUMNAR SOURCE THIS IS THE SINGLE PASS: each branch's scan
prunes to exactly its one column (PushedFilters/ReadSchema show a
one-column parquet read), so N branches read the same total bytes as
one N-column scan, and every branch is a plain partial/final hash
aggregate.

The tempting alternative -- one .agg() with N count_distincts -- plans
as an Expand (xN+1 row multiplication) feeding multi-key
SortAggregates: measured 7 s vs 1.6 s on a 600k-row fixture, and the
full-width expanded sort would be catastrophic at 100 TB. (That shape
is what Spark must do when the distincts genuinely share one pass of a
ROW store; for parquet it is strictly worse.)

Reference scope: none (the reference has no profiling); part of the
brief's pipeline-observability surface.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, specs: list[tuple[str, Column, Column]]) -> DataFrame:
    """Profile columns: one row per column.

    ``specs``: (name, value_col, display_col) per column --
    ``display_col`` is the string rendering used for min/max so both
    engines format identically (e.g. decimal-cast numerics, strftime'd
    dates). Returns (column, n_rows, n_null, n_distinct, min_s, max_s).
    """
    branches = []
    for name, col, disp in specs:
        branches.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
                F.count_distinct(col).cast("long").alias("n_distinct"),
                F.min(disp).alias("min_s"),
                F.max(disp).alias("max_s"),
            ).select(F.lit(name).alias("column"), "*")
        )
    return functools.reduce(lambda a, b: a.unionByName(b), branches)
