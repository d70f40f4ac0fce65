"""Non-finite embedding posture (r9 probe, tools/nan_probe.py).

Two hostile element classes the r8 sweeps never injected:

- **NaN / +-Infinity elements** (fp16 overflow at export, broken
  normalizers): measured 11/11 value-parity across engines on the full
  embedding-reading registry family -- both Spark and DuckDB order NaN
  greater than every double and agree on round(NaN)/round(inf), so
  rankings and hashes match. Pinned here on a representative subset.
- **NULL elements inside a non-NULL vector** (parquet allows them;
  pandas->Arrow conversion PRODUCES them silently from NaN): measured
  divergence -- Spark's zip_with/aggregate null-propagates the whole
  dot product while SQL SUM skips NULLs -- and a driver-side TypeError
  in the PQ family's codebook collect. This is DOCUMENTED undefined
  behavior (the engine contract is finite-or-NULL vectors, not
  element-null); the crash posture is pinned so the r10 fix (extend
  the NULL-vector contract to element level, post-rotation per the
  registry freeze) changes this test deliberately, not silently.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from nan_probe import build_nonfinite_fixture  # noqa: E402

from etl_upc_syllabus_spark.plans import all_specs

from .oracle_harness import compare, duckdb_run

NAN_SUBSET = [
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "similarity_topk_ivf_pq_rerank",
    "embedding_outlier_detection",
]


@pytest.fixture(scope="module")
def nan_fixture(tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("nanfix"))
    build_nonfinite_fixture("/root/testdata/sf0.001", dest, mode="nan")
    return dest


@pytest.fixture(scope="module")
def elemnull_fixture(tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("elemnullfix"))
    build_nonfinite_fixture("/root/testdata/sf0.001", dest, mode="elemnull")
    return dest


@pytest.mark.parametrize("name", NAN_SUBSET)
def test_nan_inf_embeddings_keep_oracle_parity(spark, nan_fixture, name):
    spec = all_specs()[name]
    sdf = spec.fn(spark, nan_fixture)
    odf = duckdb_run(spec.oracle, nan_fixture)
    compare(sdf, odf, f"{name}@nan")


def test_element_null_vectors_are_documented_ub(spark, elemnull_fixture):
    """Posture pin, not an endorsement: a vector with NULL ELEMENTS is
    outside the engine contract today. The PQ family's driver-side
    codebook collect raises TypeError on it (loud, not silent-wrong).
    When the element-level NULL contract lands (r10+), this pin flips
    to a parity assertion on purpose."""
    spec = all_specs()["embedding_pq_encode"]
    with pytest.raises(TypeError):
        spec.fn(spark, elemnull_fixture).collect()


def test_quarantine_nonfinite_splits_and_names_culprits(spark):
    """The ingestion guard the events probe motivates: non-finite
    scalars split from the clean stream with per-column culprit names;
    NULL stays clean (absent is legal, poisoned is not); downstream
    decimal aggregation of the CLEAN side then agrees across engines
    by construction."""
    from etl_upc_syllabus_spark.operators.curation import quarantine_nonfinite

    rows = [
        (1, 1.0, 2.0),
        (2, float("nan"), 2.0),
        (3, 1.0, float("inf")),
        (4, float("-inf"), float("nan")),
        (5, None, 2.0),
    ]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    clean, quar = quarantine_nonfinite(df)
    assert sorted(r["id"] for r in clean.collect()) == [1, 5]
    got = {r["id"]: r["quarantine_reason"] for r in quar.collect()}
    assert got == {2: "nonfinite:a", 3: "nonfinite:b", 4: "nonfinite:a,b"}

    # no float columns: everything is clean, empty quarantine
    ints = spark.createDataFrame([(1,)], "id long")
    c2, q2 = quarantine_nonfinite(ints)
    assert c2.count() == 1 and q2.count() == 0


EVENTS_NAN_SUBSET = [
    "events_hourly_profile",
    "events_funnel_conversion",
    "window_lag_delta",
    "events_debounce",
]


@pytest.fixture(scope="module")
def events_nan_fixture(tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("evnanfix"))
    build_nonfinite_fixture("/root/testdata/sf0.001", dest, mode="events")
    return dest


@pytest.mark.parametrize("name", EVENTS_NAN_SUBSET)
def test_nonfinite_event_values_keep_oracle_parity(spark, events_nan_fixture, name):
    """The 31-green leg of the events probe, pinned on a subset: NaN /
    +-Inf event values flow through windows, funnels, debounce, and
    hourly profiles identically in both engines (the 7 measured
    exceptions -- poisoned DECIMAL/BIGINT casts and pandas rank -- are
    documented UB in BASELINE.md, guarded by quarantine_nonfinite)."""
    spec = all_specs()[name]
    sdf = spec.fn(spark, events_nan_fixture)
    odf = duckdb_run(spec.oracle, events_nan_fixture)
    compare(sdf, odf, f"{name}@events-nan")


def test_quarantine_gate_keeps_stateful_stream_alive(spark, events_nan_fixture):
    """The probe's worst measured posture, then the guard fixing it:
    a single poisoned event value kills the stateful
    applyInPandasWithState stream mid-batch (loud, but in production
    that is an outage); the same stream behind quarantine_nonfinite
    completes and its totals equal the batch groupBy over the clean
    rows -- the documented pre-aggregation composition."""
    from etl_upc_syllabus_spark.operators.curation import quarantine_nonfinite
    from etl_upc_syllabus_spark.sources.tables import load_table
    from etl_upc_syllabus_spark.streaming import stateful as st
    from etl_upc_syllabus_spark.streaming.events import (
        read_events_stream,
        run_stream_to_table,
    )

    # posture: ungated stream dies on the poisoned micro-batch
    with pytest.raises(Exception):
        st.stream_user_totals(spark, events_nan_fixture).collect()

    # guard: gate the stream, run to completion
    stream = read_events_stream(spark, events_nan_fixture)
    clean, _ = quarantine_nonfinite(stream, cols=["value"])
    out = run_stream_to_table(st.running_user_totals(clean), "update")
    got = {
        r["user_id"]: (r["n_events"], r["total_cents"])
        for r in out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_cents").alias("total_cents"),
        )
        .collect()
    }

    # oracle: batch groupBy over the same gated rows
    batch = load_table(spark, events_nan_fixture, "events")
    bclean, _ = quarantine_nonfinite(batch, cols=["value"])
    want = {
        r["user_id"]: (r["n"], r["cents"])
        for r in bclean.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == want and got


def test_quarantine_nonfinite_no_float_cols_is_stream_safe(spark, events_nan_fixture):
    """Review fix: the no-float-columns branch used limit(0), which is
    unsupported on streaming Datasets -- the empty split must stay
    startable as a stream on both sides."""
    from etl_upc_syllabus_spark.operators.curation import quarantine_nonfinite
    from etl_upc_syllabus_spark.streaming.events import (
        read_events_stream,
        run_stream_to_table,
    )

    stream = read_events_stream(spark, events_nan_fixture).select(
        "event_id", "ts", "event_type"
    )  # no float columns left
    clean, quar = quarantine_nonfinite(stream)
    assert clean.isStreaming and quar.isStreaming
    out = run_stream_to_table(
        clean.withWatermark("ts", "10 seconds")
        .groupBy("event_type")
        .count(),
        "update",
    )
    assert out.count() > 0
