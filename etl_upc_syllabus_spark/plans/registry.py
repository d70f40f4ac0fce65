"""Query registry: the single source of truth for the driver contract.

Every operator class from SURVEY.md section 2 (plus the LLM-pipeline
extension) registers one QuerySpec here: a Spark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` re-exports the
two maps.

Oracle-parity ground rules (applied in every spec, both engines):

- output columns are only string / int / bigint / double -- never raw
  timestamp or date (timezone + dtype drift across engines);
- every derived integer is cast to BIGINT on the Spark side (Spark
  ``size``/``length``/``year`` return int32, DuckDB returns int64);
- every float aggregate is ``round(x, N)`` with the same N on both
  sides (summation order differs across engines; rounding makes the
  hash stable);
- collected lists are sorted then joined to a single string
  (``array_join(sort_array(collect_list(..)))`` vs
  ``string_agg(.. ORDER BY ..)``) -- list order is nondeterministic in
  any parallel engine, exactly as it was in the reference's
  thread-pool (reference etl_pipeline.py:39-41).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name {spec.name!r}")
    _REGISTRY[spec.name] = spec
    return spec


def query(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator form of :func:`register`."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        register(QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags))
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers specs (idempotent)."""
    from . import dedup_queries  # noqa: F401
    from . import extended_queries  # noqa: F401
    from . import multimodal_queries  # noqa: F401
    from . import pipeline_queries  # noqa: F401
    from . import relational  # noqa: F401
    from . import sampling_queries  # noqa: F401
    from . import similarity_queries  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import text_queries  # noqa: F401
    from . import tpch_gap_queries  # noqa: F401


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def queries_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
