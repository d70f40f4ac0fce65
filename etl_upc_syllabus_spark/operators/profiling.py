"""Single-pass table profiling (data-quality observability).

Every serious ingest pipeline profiles what it lands: row counts,
null rates, distinct cardinalities, value ranges per column. This
operator computes the whole profile in ONE aggregation over the table
-- Spark plans the multiple count_distincts as a single Expand +
aggregate (one logical pass, one shuffle family), versus the naive
one-scan-per-column loop that re-reads a 100 TB table N times. The
one-row aggregate then explodes into the long (column, metric...)
form reporting tools expect.

Reference scope: none (the reference has no profiling); part of the
brief's pipeline-observability surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, specs: list[tuple[str, Column, Column]]) -> DataFrame:
    """Profile columns in one aggregation pass.

    ``specs``: (name, value_col, display_col) per column --
    ``display_col`` is the string rendering used for min/max so both
    engines format identically (e.g. decimal-cast numerics, strftime'd
    dates). Returns one row per column:
    (column, n_rows, n_null, n_distinct, min_s, max_s).
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, col, disp in specs:
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("long").alias(f"_null_{name}"),
            F.count_distinct(col).cast("long").alias(f"_dist_{name}"),
            F.min(disp).alias(f"_min_{name}"),
            F.max(disp).alias(f"_max_{name}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(name).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_null_{name}").alias("n_null"),
            F.col(f"_dist_{name}").alias("n_distinct"),
            F.col(f"_min_{name}").alias("min_s"),
            F.col(f"_max_{name}").alias("max_s"),
        )
        for name, _, _ in specs
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
