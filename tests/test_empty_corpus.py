"""Degenerate-input robustness: registry queries over a ZERO-ROW
corpus and a NULL-HEAVY corpus.

At scale a pipeline constantly sees empty slices -- a date partition
with no events, a language shard with no documents, a filter matching
nothing upstream of a join -- and null-riddled rows: scraped documents
with NULL text, embeddings that failed to compute, events with NULL
payloads. The r8 sweeps (tools/empty_sweep.py) found 16 of 198
queries crashing on zero-row input (single-file-only events staging;
prefix-codebook ANN asserting on the empty codebook / VOID-typed
empty literal arrays / ANSI element_at past the end; PageRank 1/0 on
an empty vertex set) and 7 crashing on null values (NULL embeddings
iterated driver-side or folded into distance literals; NaN cents in
the stateful state function). This module pins the fixes.

The default run covers the once-broken queries plus one
representative per family; ``SPARK_GRAFT_EMPTY_FULL=1`` sweeps all
198 in both modes (what tools/empty_sweep.py does standalone).
"""

from __future__ import annotations

import os

import pytest

from etl_upc_syllabus_spark.plans import all_specs

from .conftest import SF_DIR

# every query the r8 sweep found crashing on a zero-row corpus
ONCE_BROKEN = [
    "stream_window_counts",
    "stream_sliding_window",
    "stream_stream_join",
    "stream_static_enrich",
    "stream_dedup",
    "stream_stateful_totals",
    "stream_incremental_etl",
    "stream_cdc_upsert",
    "stream_anomaly_flags",
    "similarity_topk_ivf",
    "similarity_kmeans_lloyd",
    "embedding_pq_encode",
    "similarity_topk_pq_adc",
    "similarity_ann_recall",
    "similarity_topk_ivf_pq",
    "graph_pagerank_copurchase",
]

# one build-time-collect-free representative per family: these exercise
# the declarative path where emptiness flows through Catalyst untouched
REPRESENTATIVES = [
    "q1_pricing_summary",
    "join_asof",
    "window_topk_per_group",
    "dedup_minhash_lsh",
    "dedup_lsh_recall",
    "text_quality_score",
    "corpus_curation_pipeline",
    "sample_weighted_reservoir",
    "events_sessionize",
    "stats_linear_regression",
    "scd2_dimension_merge",
    "multimodal_media_meta",
    "graph_triangle_count",
    "similarity_topk_bruteforce",
    "feature_quantile_bucket",
    "agg_approx",
]


def _selected() -> list[str]:
    specs = all_specs()
    if os.environ.get("SPARK_GRAFT_EMPTY_FULL"):
        return list(specs)
    names = [n for n in ONCE_BROKEN + REPRESENTATIVES if n in specs]
    # a rename in the registry must not silently shrink this net
    missing = [n for n in ONCE_BROKEN + REPRESENTATIVES if n not in specs]
    assert not missing, f"empty-corpus test names drifted from registry: {missing}"
    return names


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory) -> str:
    """All fixture tables at zero rows, schemas copied from SF_DIR.

    Built by THE SAME builder the sweep tool uses (imported, not
    duplicated -- so the pytest twin can never drift from the sweep
    that found the bugs). Written as Spark parquet DIRECTORIES
    deliberately: that is the layout every production table has, so
    this fixture also covers the directory-layout events staging path
    (single-file staging is what the real gate fixtures exercise).
    """
    from tools.empty_sweep import build_empty_fixture

    dest = str(tmp_path_factory.mktemp("empty_corpus"))
    build_empty_fixture(spark, SF_DIR, dest)
    return dest


@pytest.mark.parametrize("name", _selected())
def test_query_survives_empty_corpus(spark, empty_sf_dir, name):
    spec = all_specs()[name]
    df = spec.fn(spark, empty_sf_dir)
    # executing the full plan must not raise; the result row count is
    # whatever the query's semantics say about an empty corpus (usually
    # 0; constant/VALUES-backed queries may legitimately emit rows)
    assert df.count() >= 0
    assert df.schema.fieldNames(), f"{name} lost its schema on empty input"
    spark.catalog.clearCache()


# queries the r8 nulls sweep found crashing on NULL payload values
NULLS_ONCE_BROKEN = [
    "stream_stateful_totals",
    "similarity_topk_ivf",
    "similarity_kmeans_lloyd",
    "embedding_pq_encode",
    "similarity_topk_pq_adc",
    "similarity_ann_recall",
    "similarity_topk_ivf_pq",
]


@pytest.fixture(scope="module")
def nulls_sf_dir(spark, tmp_path_factory) -> str:
    """The fixture rows with every non-key column NULLed, built by the
    sweep tool's own builder (join/id keys and the event ts keep their
    values -- null PAYLOADS are the production degenerate, not broken
    referential integrity)."""
    from tools.empty_sweep import build_nulls_fixture

    dest = str(tmp_path_factory.mktemp("nulls_corpus"))
    build_nulls_fixture(spark, SF_DIR, dest)
    return dest


@pytest.mark.parametrize("name", NULLS_ONCE_BROKEN)
def test_query_survives_null_payloads(spark, nulls_sf_dir, name):
    spec = all_specs()[name]
    df = spec.fn(spark, nulls_sf_dir)
    assert df.count() >= 0
    assert df.schema.fieldNames(), f"{name} lost its schema on null input"
    spark.catalog.clearCache()
