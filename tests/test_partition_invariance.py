"""Results must be a function of the input tables, never the layout.

Tests and the driver gate run with single-digit shuffle partitions; a
1000-executor deployment runs with thousands. Any dependence on how
rows land in partitions (per-partition seeds, merge-order-sensitive
aggregates, ordering satisfied by luck in one task) passes every gate
SF and silently corrupts answers at scale. ``shuffle.partitions`` is
a RUNTIME conf, so this suite replays the most layout-sensitive
registry queries against their DuckDB oracles under an alien prime
partition count in the same session. The full-registry version is
``tools/partition_sweep.py`` (198/198 green at npart=200 and npart=7,
BASELINE.md r8); this pytest twin pins the property per-commit on the
queries most likely to regress:

- sampling/splitting (hash-derived priorities and cuts -- the exact
  surfaces rand()-based designs get wrong);
- LSH banding + recall sampling (bucket collision structure);
- approx sketches (HLL merge must be commutative across layouts);
- windowed top-k (rank ties must break on explicit keys);
- the reservoir (hash-priority top-k, not per-partition quotas).
"""

from __future__ import annotations

import pytest

from etl_upc_syllabus_spark.plans import all_specs

from .oracle_harness import compare, duckdb_run

SPECS = all_specs()

#: layout-sensitive-by-construction picks; every one has a full value
#: oracle, so a partition dependence fails loudly on values
SENSITIVE = [
    "sample_weighted_reservoir",
    "split_train_val_test",
    "sample_stratified_by_lang",
    "domain_cap_sample",
    "dedup_minhash_lsh",
    "dedup_lsh_recall",
    "agg_approx",
    "window_topk_per_group",
]

ALIEN_NPART = 193  # prime, far from the conftest session's core count


@pytest.fixture(scope="module")
def alien_layout(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(ALIEN_NPART))
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", SENSITIVE)
def test_partition_invariance(alien_layout, sf_dir, name):
    spec = SPECS[name]
    assert spec.oracle is not None, f"{name} lost its oracle"
    sdf = spec.fn(alien_layout, sf_dir)
    compare(sdf, duckdb_run(spec.oracle, sf_dir), name)
