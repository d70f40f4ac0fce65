"""Caller-owned persist lifecycle for plan functions.

Plan functions that persist corpus-sized intermediates (shingle
arrays, LSH candidate pairs) must not pin those caches for the life of
a shared session: bench and driver runs execute hundreds of registry
queries in ONE SparkSession, so never-released caches accumulate and
starve later queries' hash aggregates of unified-pool memory (ADVICE
r6). The convention -- set by operators/graph.py's triangle family --
is release-after-materialize: eagerly materialize the BOUNDED result
via localCheckpoint, then unpersist the big inputs in a finally block
so even a failed materialization cannot leak them.

Use this for results that are small relative to the cached inputs
(pair lists, per-doc scalars, recall tables).

DOCUMENTED EXCEPTION LIST -- plan functions that keep plain persist
because warm-cache reuse across repeated invocations is deliberate
(CacheManager dedupes canonically-equal plans into one shared entry,
so bench/registry re-runs reuse one warm cache instead of recomputing
per run):

- ``dedup_queries.dedup_minhash_lsh`` (the bench HEADLINE query; its
  shingle/pair caches are the warm state every headline bench run
  deliberately shares).

Every other plan function that persists corpus-sized intermediates
must route them through :func:`release_after_materialize`
(``dedup_pipeline_e2e`` was moved onto the contract in r8; the
``_build_*`` companions release via their registry-fn callers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_after_materialize(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize ``result`` eagerly, then unpersist ``cached`` inputs.

    The returned DataFrame reads from the localCheckpoint, so it no
    longer references the cached inputs' lineage; callers get a plain
    scan with identical schema and values.
    """
    try:
        return result.localCheckpoint(eager=True)
    finally:
        for df in cached:
            df.unpersist()
