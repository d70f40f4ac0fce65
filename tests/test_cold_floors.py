"""Cold-path guards (VERDICT r7 item 3).

The r6 HOF trap (Catalyst CollapseProject re-evaluating a projected
tokenizer per array ELEMENT -- 98.8 s at sf1) survived two rounds
because the bench's warmup pass populated caches the timed runs
reused: every recorded number was warm, and only the cold path paid
the blowup.  Two guards institutionalize the lesson:

1. ``test_cold_bench_mode`` drives ``bench.py --cold`` (fresh
   SparkSession per query, no warmup) over the dedup/text family at
   the test SF in a subprocess.  Functional assertions (mode, query
   set, valid JSON) always run; the wall-clock bounds -- single
   samples on a host with documented 3-10x load inflation -- are
   opt-in via SPARK_GRAFT_TIMING_ASSERTS, the repo's convention for
   timing assertions (test_cli.py).  The sensitive regression
   detector is the scaling test below, which needs no absolute
   bounds.

2. ``test_shingle_build_scales_linearly`` measures the property the
   trap violates, in a host-noise-cancelling way: cold shingle-build
   time on the same number of docs at token length L vs 8L.  A linear
   build costs ~8x more compute (measured ~1x wall: fixed overhead
   dominates at this size); a per-element re-evaluation costs ~64x
   compute (tokenizer rerun per shingle, measured ~35x wall).
   Min-of-3 consecutive same-session measurements cancel load spikes,
   and the ratio bound (15x) sits between the regimes with wide
   margin on both sides.  This catches the trap pattern even in a NEW
   expression the plan-text occurrence test
   (test_plan_invariants.py) was never taught to look for.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

from etl_upc_syllabus_spark.operators import dedup as dd
from etl_upc_syllabus_spark.operators import textanalysis as ta

from .conftest import SF_DIR

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# recorded sf0.01 cold floors (BASELINE.md r8, quiet-ish host, first
# query pays one-time JVM/JIT warmup): lsh 7.6, ngram_jaccard 1.2,
# simhash 0.5, fingerprint 0.3, novelty 1.3, gopher 0.3, decontam 0.8
_COLD_FAMILY_BOUNDS = {
    "dedup_minhash_lsh": 60.0,
    "dedup_ngram_jaccard": 20.0,
    "dedup_simhash": 15.0,
    "text_fingerprint": 15.0,
    "text_ngram_novelty": 20.0,
    "gopher_repetition_filter": 15.0,
    "decontaminate_ngram_overlap": 20.0,
}


@pytest.mark.cold
def test_cold_bench_mode():
    """bench.py --cold runs the family fresh-session/no-warmup;
    wall-clock bounds are opt-in (single samples cannot be asserted
    unconditionally on a host with 3-10x load inflation)."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF_DIR,
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_MAX_WAIT="5",
        SPARK_GRAFT_BENCH_QUERIES=",".join(_COLD_FAMILY_BOUNDS),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py"), "--cold"],
        env=env,
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=600,
        check=True,
    )
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["mode"] == "cold"
    assert set(payload["queries"]) == set(_COLD_FAMILY_BOUNDS)
    if os.environ.get("SPARK_GRAFT_TIMING_ASSERTS"):
        for name, secs in payload["queries"].items():
            assert secs < _COLD_FAMILY_BOUNDS[name], (
                f"{name} cold run {secs:.1f}s exceeds the catastrophic-"
                f"regression bound {_COLD_FAMILY_BOUNDS[name]}s -- check for "
                "a reintroduced per-element re-evaluation (HOF trap)"
            )


def _time_shingles(spark, n_docs: int, n_tokens: int) -> float:
    """Min-of-3 cold-cache shingle-build wall time on a synthetic
    corpus of ``n_docs`` docs x ``n_tokens`` tokens each."""
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(n_tokens)),
                lambda i: F.concat(
                    F.lit("w"), ((F.col("id") * 131 + i) % 997).cast("string")
                ),
            ),
        ).alias("text"),
    ).localCheckpoint(eager=True)  # exclude corpus synthesis from timing
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        dd.shingle_sets(docs, "doc_id", "text", k=3).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
    return best


@pytest.mark.cold
def test_shingle_build_scales_linearly(spark):
    spark.catalog.clearCache()
    _time_shingles(spark, 50, 80)  # warmup: JIT + codegen for this shape
    t_short = _time_shingles(spark, 400, 80)
    t_long = _time_shingles(spark, 400, 640)
    ratio = t_long / max(t_short, 1e-3)
    # linear build: ~8x work (8x tokens => ~8x shingles), measured
    # ~1-3x once fixed overhead is amortized; per-element
    # re-evaluation: ~64x compute (tokenizer rerun per shingle),
    # measured ~40x. 15x splits the regimes with wide margin for host
    # drift on min-of-3 samples (calibration run recorded in this
    # test's git history: fixed 0.9x, trapped 10.3x at the narrower
    # 4x lever; the 8x lever roughly squares the separation).
    assert ratio < 15.0, (
        f"shingle build scaled {ratio:.1f}x for 8x token length "
        f"({t_short:.3f}s -> {t_long:.3f}s): super-linear growth means "
        "the tokenizer is being re-evaluated per element again"
    )


def _time_fingerprint(spark, n_docs: int, n_chars: int) -> float:
    """Min-of-3 cold fingerprint wall time on ``n_docs`` docs of
    ``n_chars`` characters each."""
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(n_chars // 6)),
                lambda i: F.concat(
                    F.lit("tok"), ((F.col("id") * 131 + i) % 997).cast("string")
                ),
            ),
        ).alias("text"),
    ).localCheckpoint(eager=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        docs.select("doc_id", ta.fingerprint("text").alias("fp")).write.format(
            "noop"
        ).mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


@pytest.mark.cold
def test_fingerprint_scales_linearly_in_doc_length(spark):
    """Char-shingle fingerprinting must be linear in DOCUMENT LENGTH.

    The substr-based shingle build was O(len^2/stride) per document:
    UTF8String indexes by codepoint, so substr at char position i is an
    O(i) scan, summed over len/stride strided positions (measured 3.7x
    wall per length doubling; 1 MB pages effectively hung). The chunked
    rewrite (operators/textanalysis.py char_shingles) is linear. An 8x
    length lever separates the regimes: linear ~<=8x, quadratic ~64x
    (calibrated: chunked 1.4x, substr form 38x on this harness)."""
    spark.catalog.clearCache()
    _time_fingerprint(spark, 16, 2048)  # warmup: JIT + codegen
    t_short = _time_fingerprint(spark, 64, 4096)
    t_long = _time_fingerprint(spark, 64, 32768)
    ratio = t_long / max(t_short, 1e-3)
    assert ratio < 20.0, (
        f"fingerprint scaled {ratio:.1f}x for 8x doc length "
        f"({t_short:.3f}s -> {t_long:.3f}s): super-linear growth means "
        "per-position substr scans are back in the shingle build"
    )


# --- wobble-outlier selection (r9: embedded drift attribution) --------------


def test_wobble_outlier_selection(tmp_path, monkeypatch):
    """The embedded wobble probe must fire only for genuine outliers
    (>1.25x the recorded floor, floors-SF match, not disabled), list
    beyond-cap outliers un-probed, and stay silent otherwise. Probing
    itself spawns subprocesses, so selection is tested with the probe
    cap at 0 -- every selected outlier lands in the un-probed listing."""
    import importlib

    bench = importlib.import_module("bench")

    floors = {"sf": 0.1, "floors": {"q_a": 1.0, "q_b": 1.0, "q_c": 1.0}}
    # a TMP floors file via SPARK_GRAFT_BENCH_FLOORS -- the committed
    # BENCH_FLOORS.json artifact must never be mutated by a test (a
    # crash mid-test would permanently clobber it with fake floors)
    floors_file = str(tmp_path / "floors.json")
    json.dump(floors, open(floors_file, "w"))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FLOORS", floors_file)
    monkeypatch.setattr(bench, "WOBBLE_MAX_QUERIES", 0)

    # below threshold: no outliers
    assert bench._wobble_outliers({"q_a": 1.2, "q_b": 0.9}, 0.1, "x") == {}
    # SF mismatch: never fires
    assert bench._wobble_outliers({"q_a": 9.0}, 0.001, "x") == {}
    # disabled: never fires
    monkeypatch.setenv("SPARK_GRAFT_BENCH_WOBBLE", "0")
    assert bench._wobble_outliers({"q_a": 9.0}, 0.1, "x") == {}
    monkeypatch.delenv("SPARK_GRAFT_BENCH_WOBBLE")
    # genuine outliers: listed with floor + ratio (un-probed at cap 0),
    # non-outliers and unknown queries excluded
    out = bench._wobble_outliers(
        {"q_a": 2.0, "q_b": 1.2, "q_c": 1.3, "q_unknown": 50.0}, 0.1, "x"
    )
    assert set(out) == {"q_a", "q_c"}
    assert out["q_a"] == {"recorded_floor": 1.0, "ratio": 2.0, "probed": False}


def test_wobble_trigger_keys_to_recent_era_floor(tmp_path, monkeypatch):
    """VERDICT r10 item 6: the >1.25x trigger compares against the
    RECENT-ERA floor (min over the last 3 round artifacts) so a busier
    host era does not fire probes on pure drift against all-time
    quiet-era records; the all-time ledger floor stays in the row as
    recorded_floor, with recent_floor added when it differs. A query
    with no recent reading falls back to the ledger."""
    import importlib

    bench = importlib.import_module("bench")

    floors = {
        "sf": 0.1,
        "floors": {"q_a": 1.0, "q_b": 1.0},
        "recent_floors": {"q_a": 1.6},
    }
    floors_file = str(tmp_path / "floors.json")
    json.dump(floors, open(floors_file, "w"))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FLOORS", floors_file)
    monkeypatch.setattr(bench, "WOBBLE_MAX_QUERIES", 0)

    # 1.9x the all-time floor but only 1.19x the recent era: no probe
    assert bench._wobble_outliers({"q_a": 1.9}, 0.1, "x") == {}
    # past 1.25x the recent era: fires, ratio is vs the trigger floor,
    # both floors are in the row
    out = bench._wobble_outliers({"q_a": 2.1}, 0.1, "x")
    assert out == {"q_a": {"recorded_floor": 1.0, "recent_floor": 1.6,
                           "ratio": round(2.1 / 1.6, 2), "probed": False}}
    # no recent reading: the ledger floor is the trigger, row unchanged
    out = bench._wobble_outliers({"q_b": 1.3}, 0.1, "x")
    assert out == {"q_b": {"recorded_floor": 1.0, "ratio": 1.3, "probed": False}}


def test_wobble_row_keys_track_their_sources(tmp_path, monkeypatch):
    """ADVICE r11 (bench.py:192): a query known ONLY to the recent era
    (no all-time ledger entry -- e.g. a renamed/new headline) must
    present its value as recent_floor, never under the ledger's
    recorded_floor key; and recent_floor appears whenever the trigger
    came from the recent era, even when the two eras compare equal."""
    import importlib

    bench = importlib.import_module("bench")

    floors = {
        "sf": 0.1,
        "floors": {"q_equal": 2.0},
        "recent_floors": {"q_recent_only": 1.0, "q_equal": 2.0},
    }
    floors_file = str(tmp_path / "floors.json")
    json.dump(floors, open(floors_file, "w"))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FLOORS", floors_file)
    monkeypatch.setattr(bench, "WOBBLE_MAX_QUERIES", 0)

    out = bench._wobble_outliers({"q_recent_only": 1.5, "q_equal": 3.0}, 0.1, "x")
    assert out["q_recent_only"] == {
        "recent_floor": 1.0, "ratio": 1.5, "probed": False,
    }
    assert out["q_equal"] == {
        "recorded_floor": 2.0, "recent_floor": 2.0, "ratio": 1.5, "probed": False,
    }


# --- artifact emission (r10: the driver tail-captures ~2000 chars) ----------


def test_summary_line_fits_tail_window():
    """BENCH_r09 came back parsed:null because the single JSON line
    outgrew the driver's 2000-char tail-capture window (VERDICT r9
    finding #1). The fix splits emission: extended evidence on a
    preceding line, a compact summary LAST. Pin the summary's
    worst-case length — 15 queries with the longest real registry
    names, 5-figure timings, full cold suite, and every query flagged
    as a wobble outlier — under 1800 chars with margin, and pin that
    the bulky keys stay OFF the summary line."""
    import importlib

    bench = importlib.import_module("bench")

    names = list(bench.HEADLINE)
    assert len(names) == 15
    timings = {n: 99999.999 for n in names}
    samples = {n: [99999.999, 99999.999, 99999.999] for n in names}
    warmups = {n: 99999.999 for n in names}
    cold = {n: 99999.999 for n in names}
    wobble = {
        n: {
            "recorded_floor": 99999.999,
            "ratio": 99.99,
            "probed": True,
            "floors": [99999.999] * 3,
            "best": 99999.999,
            "preflight": [[99.99, 99.99, 99.99]] * 3,
            "probe_contended": True,
            "budget_exhausted": True,
        }
        for n in names
    }
    extended, summary = bench.build_artifact(
        timings, samples, warmups, [99.99, 99.99, 99.99],
        [99.99, 99.99, 99.99], True, 3, 0.1, cold, wobble,
        cpus=32, parallelism=32,
    )
    line = json.dumps(summary)
    assert len(line) < 1800, f"summary line is {len(line)} chars"
    # the self-evidencing core count (VERDICT r16 item 2) rides the
    # summary so the driver's scaling check can read it from the tail
    assert summary["cpus"] == 32 and summary["parallelism"] == 32
    # the bulky evidence must ride the extended line, never the summary
    for bulky in ("samples", "warmup", "cold_queries", "wobble_floors"):
        assert bulky not in summary
        assert bulky in extended or bulky in ("cold_queries", "wobble_floors")
    assert extended["samples"] == samples
    assert extended["cold_queries"] == cold
    assert extended["wobble_floors"] == wobble
    # summary still carries everything the graded tail parse needs
    assert summary["metric"] == "headline_suite_total"
    assert summary["value"] == round(sum(timings.values()), 3)
    assert summary["unit"] == "sec"
    assert summary["queries"] == timings
    assert summary["contended"] is True
    assert summary["sf"] == 0.1
    assert summary["cold_value"] == round(sum(cold.values()), 3)
    assert summary["wobble_outliers"] == sorted(names)
    # the invocation-mode stamp (VERDICT r12 item 5): a warm suite's
    # embedded cold numbers must never be compared to standalone --cold
    # artifacts (first-JVM JIT lands inside query 1 there)
    assert summary["cold_mode"] == "embedded"
    # no cold timings -> neither cold key appears
    _, no_cold = bench.build_artifact(
        timings, samples, warmups, [1.0, 1.0, 1.0],
        [1.0, 1.0, 1.0], False, 2, 0.1, {}, {},
    )
    assert "cold_value" not in no_cold and "cold_mode" not in no_cold


def test_preflight_gates_on_load5_too(monkeypatch):
    """r13 measurement (BASELINE.md): same HEAD, load1<1.0 both times,
    suite 15.37 s at load5=1.79 vs 10.98 s at load5=0.49 -- a sub-gate
    load1 at the decision instant only means the neighbors are between
    bursts. The preflight must require BOTH load1 and load5 quiet."""
    import importlib

    bench = importlib.import_module("bench")

    monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_WAIT", "0")
    # quiet on both: passes
    monkeypatch.setattr(os, "getloadavg", lambda: (0.2, 0.5, 1.0))
    load, contended = bench._preflight_load()
    assert not contended and load == [0.2, 0.5, 1.0]
    # the r13 trap window: load1 passes, load5 does not -> contended
    monkeypatch.setattr(os, "getloadavg", lambda: (0.91, 1.79, 1.89))
    _, contended = bench._preflight_load()
    assert contended
    # knob widens the load5 gate independently
    monkeypatch.setenv("SPARK_GRAFT_BENCH_LOAD5_GATE", "2.0")
    _, contended = bench._preflight_load()
    assert not contended


def test_cpu_calibration_rides_the_extended_line():
    """The absolute host-speed reference (r13): a fixed single-thread
    workload whose reading separates 'host slower' from 'neighbors
    busier' across rounds. Extended line only -- the summary stays
    inside its tail-capture budget."""
    import importlib

    bench = importlib.import_module("bench")

    cal = bench._cpu_calibration()
    assert 0.0 < cal < 30.0  # sane wall-clock for 200k hashes
    cal_mt = bench._cpu_calibration_mt()
    assert 0.0 < cal_mt < 60.0  # 2 GB hashed across a 32-thread pool

    extended, summary = bench.build_artifact(
        {"q": 1.0}, {"q": [1.0]}, {"q": 1.0}, [0.1, 0.1, 0.1],
        [0.1, 0.1, 0.1], False, 2, 0.1, {}, {},
        cpu_cal_sec=cal, cpu_cal_mt_sec=cal_mt,
    )
    assert extended["cpu_cal_sec"] == cal
    assert extended["cpu_cal_mt_sec"] == cal_mt
    assert "cpu_cal_sec" not in summary and "cpu_cal_mt_sec" not in summary
    # omitted when not measured (pure-function callers)
    ext2, _ = bench.build_artifact(
        {"q": 1.0}, {"q": [1.0]}, {"q": 1.0}, [0.1, 0.1, 0.1],
        [0.1, 0.1, 0.1], False, 2, 0.1, {}, {},
    )
    assert "cpu_cal_sec" not in ext2 and "cpu_cal_mt_sec" not in ext2


def test_floors_ignore_cold_mode_artifacts(tmp_path):
    """A standalone --cold artifact also carries a "queries" dict -- of
    COLD timings. tools/floors.py must never fold those into the warm
    floors ledger (VERDICT r12 item 5: the consumer filters on mode)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "floors", os.path.join(_REPO, "tools", "floors.py")
    )
    floors = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(floors)

    cold_artifact = {
        "parsed": {
            "metric": "cold_suite_total",
            "mode": "cold",
            "cold_mode": "standalone",
            "sf": 0.1,
            "queries": {"q1_pricing_summary": 42.0},
            "loadavg_preflight": [0.5, 0.5, 0.5],
        }
    }
    p = tmp_path / "BENCH_cold.json"
    p.write_text(json.dumps(cold_artifact))
    vals, load = floors._readings(str(p), None)
    assert vals == {} and load is None

    warm_artifact = {
        "parsed": {
            "metric": "headline_suite_total",
            "sf": 0.1,
            "queries": {"q1_pricing_summary": 0.8},
            "loadavg_preflight": [0.5, 0.5, 0.5],
        }
    }
    p2 = tmp_path / "BENCH_warm.json"
    p2.write_text(json.dumps(warm_artifact))
    vals2, _ = floors._readings(str(p2), None)
    assert vals2 == {"q1_pricing_summary": 0.8}


def test_headline_registry_and_floors_stay_coherent():
    """Consistency pin: every headline query must exist in the registry
    (a renamed query would silently vanish from the official artifact)
    and carry an all-time floor (so the wobble trigger can ever fire
    for it). Guards the three artifacts' shared vocabulary."""
    import importlib

    bench = importlib.import_module("bench")

    from etl_upc_syllabus_spark.plans import all_specs

    specs = all_specs()
    missing_in_registry = [n for n in bench.HEADLINE if n not in specs]
    assert not missing_in_registry, missing_in_registry

    with open(os.path.join(_REPO, "BENCH_FLOORS.json"), encoding="utf-8") as fh:
        floors = json.load(fh)
    missing_floor = [n for n in bench.HEADLINE if n not in floors.get("floors", {})]
    assert not missing_floor, missing_floor


def test_preflight_waives_load5_after_sustained_quiet_load1(monkeypatch):
    """ADVICE r13: load5 carries the bench's OWN previous invocation
    for ~5 minutes, so back-to-back runs on an idle host would burn the
    full max-wait and stamp themselves contended. Six consecutive
    sub-gate load1 polls (10 s apart, ~50 s of sustained quiet) waive the load5
    conjunct; a single load1 blip resets the streak."""
    import importlib
    import time as _time

    bench = importlib.import_module("bench")

    monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_WAIT", "300")
    sleeps = []
    monkeypatch.setattr(_time, "sleep", lambda s: sleeps.append(s))
    # self-inflicted residue: load1 quiet, load5 high forever
    monkeypatch.setattr(os, "getloadavg", lambda: (0.2, 5.0, 5.0))
    load, contended = bench._preflight_load()
    assert not contended
    assert len(sleeps) == 5  # passed on the 6th consecutive quiet poll

    # a load1 blip resets the streak: 1 failing poll + 6 quiet again
    sleeps.clear()
    seq = iter([(2.0, 5.0, 5.0)] + [(0.2, 5.0, 5.0)] * 6)
    monkeypatch.setattr(os, "getloadavg", lambda: next(seq))
    _, contended = bench._preflight_load()
    assert not contended
    assert len(sleeps) == 6


def test_cal_contended_self_flags_when_the_load_gate_lied(monkeypatch):
    """r14 measured case: preflight load1 0.14 passed the gate while
    cpu_cal_mt read 0.764 vs 0.196 free -- the suite was 3x inflated
    with contended:false. The calibration pair's own verdict is
    stamped as cal_contended so the artifact self-flags."""
    import importlib

    bench = importlib.import_module("bench")

    # pin the host class the recorded readings came from (review r14:
    # the threshold scales with effective cores, so the 32-thread-host
    # readings below only mean what they meant on 32 cores)
    monkeypatch.setattr(bench, "_effective_cal_cores", lambda: 32)
    ext_busy, summ = bench.build_artifact(
        {"q": 1.0}, {"q": [1.0]}, {"q": 1.0}, [0.14, 1.16, 3.23],
        [0.1, 0.1, 0.1], False, 2, 0.1, {}, {},
        cpu_cal_sec=0.114, cpu_cal_mt_sec=0.764,
    )
    assert ext_busy["cal_contended"] is True
    assert "cal_contended" not in summ  # summary stays length-capped
    ext_free, _ = bench.build_artifact(
        {"q": 1.0}, {"q": [1.0]}, {"q": 1.0}, [0.1, 0.1, 0.1],
        [0.1, 0.1, 0.1], False, 2, 0.1, {}, {},
        cpu_cal_sec=0.086, cpu_cal_mt_sec=0.196,
    )
    assert ext_free["cal_contended"] is False
    ext_nocal, _ = bench.build_artifact(
        {"q": 1.0}, {"q": [1.0]}, {"q": 1.0}, [0.1, 0.1, 0.1],
        [0.1, 0.1, 0.1], False, 2, 0.1, {}, {},
    )
    assert "cal_contended" not in ext_nocal
