"""Every registered query with an oracle must match it (driver-gate replica)."""

from __future__ import annotations

import pytest

from etl_upc_syllabus_spark.plans import all_specs

from .oracle_harness import compare, duckdb_run

SPECS = all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
NO_ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir)
    odf = duckdb_run(spec.oracle, sf_dir)
    compare(sdf, odf, name)


@pytest.mark.parametrize("name", NO_ORACLE_NAMES)
def test_rows_only(spark, sf_dir, name):
    """Weaker check for non-SQL-expressible ops: runs, has stable schema."""
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir)
    assert len(sdf.columns) > 0
    assert sdf.count() >= 0
