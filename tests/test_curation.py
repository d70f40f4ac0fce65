"""Unit tests for operators.curation (planted-case level; oracle
parity for the bound queries lives in test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_upc_syllabus_spark.operators import curation as cu


def test_pii_scrub_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "write to jane.doe+x@corp.example.org or call 555-123-4567"),
            (2, "server at 192.168.1.200 port 80; no mail"),
            (3, "clean text, nothing to redact"),
        ],
        ["id", "t"],
    )
    counts = cu.pii_counts("t")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            counts["n_emails"].alias("e"),
            counts["n_phones"].alias("p"),
            counts["n_ips"].alias("i"),
            cu.pii_scrub("t").alias("s"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["p"], out[1]["i"]) == (1, 1, 0)
    assert out[1]["s"] == "write to <EMAIL> or call <PHONE>"
    assert out[2]["i"] == 1 and out[2]["s"] == "server at <IP> port 80; no mail"
    assert out[3]["s"] == "clean text, nothing to redact"


def test_domain_cap_keeps_first_k(spark):
    rows = [(f"d{i % 3}", i) for i in range(30)]
    df = spark.createDataFrame(rows, ["dom", "i"])
    kept = cu.domain_cap(df, "dom", "i", 2)
    got = sorted((r["dom"], r["i"]) for r in kept.collect())
    assert got == [("d0", 0), ("d0", 3), ("d1", 1), ("d1", 4), ("d2", 2), ("d2", 5)]
    assert "_rn" not in kept.columns


def test_repetition_metrics_flags_boilerplate(spark):
    df = spark.createDataFrame(
        [(1, "buy now buy now buy now buy now"), (2, "all tokens here are unique"), (3, "one")],
        ["id", "t"],
    )
    m = cu.repetition_metrics("t")
    out = {
        r["id"]: r
        for r in df.select(
            "id", m["n_bigrams"].alias("n"), m["dup_frac"].alias("f")
        ).collect()
    }
    # "buy now"x4 -> 7 bigrams, 2 distinct ("buy now", "now buy")
    assert out[1]["n"] == 7 and out[1]["f"] == (7 - 2) / 7
    assert out[2]["f"] == 0.0
    assert out[3]["n"] == 0 and out[3]["f"] == 0.0  # <2 tokens: no bigrams


def test_decontaminate_planted_overlap(spark):
    df = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta", 1),   # benchmark
            (1, "x alpha beta gamma y", 0),       # shares 'alpha beta gamma'
            (2, "beta gamma delta z w", 0),       # shares 'beta gamma delta'
            (3, "no overlap at all here", 0),
        ],
        ["doc_id", "text", "bench"],
    )
    out = {
        r["doc_id"]: r["n_shared_grams"]
        for r in cu.decontaminate(df, F.col("bench") == 1, n=3).collect()
    }
    assert out == {1: 1, 2: 1}


def test_decontaminate_plan_broadcasts_benchmark(spark, sf_dir):
    """The benchmark gram set must reach the corpus side as a broadcast
    hash join -- a shuffle of the exploded corpus by gram would be the
    100 TB scale-killer."""
    from etl_upc_syllabus_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = cu.decontaminate(d, F.col("doc_id") % 97 == 0, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_fuzzy_match_pairs_blocked(spark):
    df = spark.createDataFrame(
        [("red widget",), ("rad widget",), ("red widget",), ("blue bolt",),
         ("blue widget",), ("completely different widget",)],
        ["nm"],
    )
    out = {
        (r["name_a"], r["name_b"]): r["lev"]
        for r in cu.fuzzy_match_pairs(
            df, "nm", F.element_at(F.split(F.col("name"), " "), -1), max_dist=4
        ).collect()
    }
    # duplicates collapse; cross-block pairs never appear; far pair cut by max_dist
    assert out == {
        ("rad widget", "red widget"): 1,
        ("blue widget", "red widget"): 4,
        ("blue widget", "rad widget"): 4,
    }


def test_profile_columns_metrics(spark):
    from pyspark.sql import functions as F

    from etl_upc_syllabus_spark.operators.profiling import profile_columns

    df = spark.createDataFrame(
        [(1.5, "a"), (2.5, "b"), (None, "b"), (2.5, None)],
        "x double, s string",
    )
    specs = [
        ("x", F.col("x"), F.col("x").cast("decimal(12,2)").cast("string")),
        ("s", F.col("s"), F.col("s")),
    ]
    out = {r["column"]: r for r in profile_columns(df, specs).collect()}
    assert out["x"]["n_rows"] == 4 and out["s"]["n_rows"] == 4
    assert out["x"]["n_null"] == 1 and out["s"]["n_null"] == 1
    assert out["x"]["n_distinct"] == 2  # nulls excluded, 2.5 deduped
    assert out["s"]["n_distinct"] == 2
    assert (out["x"]["min_s"], out["x"]["max_s"]) == ("1.50", "2.50")
    assert (out["s"]["min_s"], out["s"]["max_s"]) == ("a", "b")


from .conftest import SF_DIR  # noqa: E402

# --- duplicate-key quarantine (r10 probe: tools/dupkey_probe.py) ------------


def test_quarantine_duplicate_keys_splits_all_copies(spark):
    """All rows of a duplicated key are quarantined (the engine cannot
    know which copy is true) with the copy count in the reason; unique
    rows stay clean; NULL keys stay clean (the repo's NULL-is-absent
    convention -- joins never match NULL keys); a streaming input
    raises toward the watermark-dedup analog."""
    import pytest
    from pyspark.sql import functions as F

    from etl_upc_syllabus_spark.operators.curation import quarantine_duplicate_keys
    from etl_upc_syllabus_spark.streaming.events import read_events_stream

    rows = [
        (1, "a"),
        (2, "b"),
        (2, "b-retry"),
        (3, "c"),
        (3, "c-retry"),
        (3, "c-again"),
        (None, "n1"),
        (None, "n2"),
    ]
    df = spark.createDataFrame(rows, "k long, payload string")
    clean, quar = quarantine_duplicate_keys(df, "k")
    assert sorted(r["payload"] for r in clean.collect()) == ["a", "n1", "n2"]
    got = sorted((r["k"], r["quarantine_reason"]) for r in quar.collect())
    assert got == [(2, "dupkey:2"), (2, "dupkey:2"),
                   (3, "dupkey:3"), (3, "dupkey:3"), (3, "dupkey:3")]

    # bounded-broadcast fallback produces the identical split
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        c2, q2 = quarantine_duplicate_keys(df, "k", broadcast_max=1)
        assert any("broadcast assumption failed" in str(x.message) for x in w)
    assert sorted(r["payload"] for r in c2.collect()) == ["a", "n1", "n2"]
    assert q2.count() == 5

    with pytest.raises(ValueError, match="batch input"):
        quarantine_duplicate_keys(
            read_events_stream(spark, SF_DIR), "event_id"
        )


def test_dupkey_gate_restores_parity(spark, tmp_path):
    """The r10 duplicate-key probe measured 20/102 SILENT divergences
    (zero loud -- the worst posture class): driver-side {id: vec}
    collects keep one arbitrary copy where the relational oracle keeps
    both, and id tiebreaks stop being total orders. Pin one
    representative restoration: brute-force ANN over the gate's clean
    side matches the oracle over a corpus with the duplicated ids
    physically absent. Family-wide evidence: dupkey_probe --gated,
    97/102 + 5 loud prefix-seed config errors, 0 silent."""
    import os
    import shutil
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from dupkey_probe import DUPLICATIONS, build_dupkey_fixture

    from etl_upc_syllabus_spark.operators import similarity as sim
    from etl_upc_syllabus_spark.operators.curation import quarantine_duplicate_keys
    from etl_upc_syllabus_spark.plans import all_specs
    from etl_upc_syllabus_spark.sources.tables import TABLES, load_table

    from .oracle_harness import compare, duckdb_run

    fixture = str(tmp_path / "dupfix")
    build_dupkey_fixture(SF_DIR, fixture)

    cleaned = str(tmp_path / "cleaned")
    os.makedirs(cleaned)
    dup_vec_ids = {i for i, _m in DUPLICATIONS["embeddings"][1]}
    for t in TABLES:
        src = os.path.join(fixture, f"{t}.parquet")
        dst = os.path.join(cleaned, f"{t}.parquet")
        if t == "embeddings":
            tbl = pq.read_table(src)
            mask = [v not in dup_vec_ids for v in tbl.column("vec_id").to_pylist()]
            pq.write_table(tbl.filter(mask), dst)
        elif os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copyfile(src, dst)

    emb = load_table(spark, fixture, "embeddings")
    clean, quar = quarantine_duplicate_keys(emb, "vec_id")
    assert sorted(
        r["vec_id"] for r in quar.select("vec_id").distinct().collect()
    ) == sorted(dup_vec_ids)

    spec = all_specs()["similarity_topk_bruteforce"]
    compare(
        sim.cosine_topk_bruteforce(clean, k=5),
        duckdb_run(spec.oracle, cleaned),
        "bruteforce@dupkey-gated",
    )


# ---------------------------------------------------------------------------
# quarantine_hostile: the fused single-scan composition (VERDICT r10 #3)


def _collected(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def _sequential_hostile(df, *, cols=None, vec_col=None, dim=None, ts_col=None,
                        ts_lo="1900-01-01", ts_hi="2100-01-01"):
    """The three single-axis gates chained in the documented order,
    quarantined sides unioned -- the baseline quarantine_hostile must
    reproduce exactly."""
    quars = []
    cur, q = cu.quarantine_nonfinite(df, cols)
    quars.append(q)
    if vec_col is not None:
        cur, q = cu.quarantine_vector_width(cur, vec_col, dim)
        quars.append(q)
    if ts_col is not None:
        cur, q = cu.quarantine_timestamp_range(cur, ts_col, ts_lo, ts_hi)
        quars.append(q)
    quar = quars[0]
    for q in quars[1:]:
        quar = quar.unionByName(q)
    return cur, quar


def test_quarantine_hostile_equals_sequential_on_probe_fixtures(
    spark, tmp_path_factory
):
    """Fused == sequential, pinned on the hostile fixtures from all
    three r9/r10 probes (never a synthetic approximation): the
    events-NaN corpus (non-finite axis), the extreme-timestamp corpus
    (range axis), and the ragged-embedding corpus (width axis). Each
    fixture must actually quarantine rows, or the pin proves nothing."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from nan_probe import build_nonfinite_fixture
    from ts_probe import build_ts_fixture

    from etl_upc_syllabus_spark.sources.tables import load_table

    nan_dir = str(tmp_path_factory.mktemp("hostile_nanev"))
    build_nonfinite_fixture(SF_DIR, nan_dir, mode="events")
    ts_dir = str(tmp_path_factory.mktemp("hostile_ts"))
    build_ts_fixture(SF_DIR, ts_dir)
    rag_dir = str(tmp_path_factory.mktemp("hostile_ragged"))
    build_nonfinite_fixture(SF_DIR, rag_dir, mode="ragged")

    for sf_dir, table, kw in [
        (nan_dir, "events", dict(ts_col="ts")),
        (ts_dir, "events", dict(ts_col="ts")),
        (rag_dir, "embeddings", dict(vec_col="embedding")),
    ]:
        df = load_table(spark, sf_dir, table)
        fc, fq = cu.quarantine_hostile(df, **kw)
        sc_, sq = _sequential_hostile(df, **kw)
        assert fq.count() > 0, f"{sf_dir}/{table}: fixture quarantined nothing"
        assert _collected(fc) == _collected(sc_), f"{table}@{sf_dir}: clean side"
        assert _collected(fq) == _collected(sq), f"{table}@{sf_dir}: quarantine side"


def test_quarantine_hostile_first_gate_wins(spark):
    """A row hostile on several axes carries the reason of the FIRST
    failing gate in composition order (nonfinite -> width -> ts), the
    modal width derives over the NONFINITE-CLEAN rows exactly as the
    sequential chain's second gate would see them, NULL stays clean on
    every axis, and the whole thing still equals the sequential
    composition row-for-row."""
    nan, inf = float("nan"), float("inf")
    rows = [
        (1, 1.0, [1.0, 2.0], "2020-01-01"),
        (2, nan, [1.0], "9999-01-01"),          # all three axes -> nonfinite
        (3, 2.0, [1.0, 2.0, 3.0], "1800-01-01"),  # width + ts -> width
        (4, 3.0, [1.0, 2.0], "2150-06-01"),     # ts only
        (5, None, None, None),                  # NULL everywhere: clean
        (6, inf, [5.0, 6.0], "2021-05-05"),     # nonfinite only
    ]
    df = spark.createDataFrame(
        rows, "id long, x double, v array<double>, d string"
    ).withColumn("ts", F.to_timestamp("d")).drop("d")
    clean, quar = cu.quarantine_hostile(df, vec_col="v", ts_col="ts")
    assert sorted(r["id"] for r in clean.collect()) == [1, 5]
    reasons = {r["id"]: r["quarantine_reason"] for r in quar.collect()}
    assert reasons[2] == "nonfinite:x"
    assert reasons[3] == "width:3!=2"
    assert reasons[4] == "ts_out_of_range:2150-06-01 00:00:00"
    assert reasons[6] == "nonfinite:x"

    sc_, sq = _sequential_hostile(df, vec_col="v", ts_col="ts")
    assert _collected(clean) == _collected(sc_)
    assert _collected(quar) == _collected(sq)

    # every axis inactive: schema-stable no-op split
    plain = df.select("id", "v", "ts")
    nc, nq = cu.quarantine_hostile(plain, cols=[])
    assert nc.count() == 6 and nq.count() == 0
    assert "quarantine_reason" in nq.columns


def test_quarantine_hostile_single_scan(spark, tmp_path):
    """The point of the fusion: BOTH returned sides are one corpus scan
    each (the sequential chain's unioned quarantine report is three).
    Counted on the executed plan of a real parquet read."""
    from etl_upc_syllabus_spark.explain import plan_of

    nan = float("nan")
    rows = [
        (1, 1.0, [1.0, 2.0], "2020-01-01"),
        (2, nan, [1.0], "9999-01-01"),
        (3, 2.0, [1.0, 2.0, 3.0], "1800-01-01"),
    ]
    src = str(tmp_path / "hostile.parquet")
    spark.createDataFrame(
        rows, "id long, x double, v array<double>, d string"
    ).withColumn("ts", F.to_timestamp("d")).drop("d").write.parquet(src)
    df = spark.read.parquet(src)

    fc, fq = cu.quarantine_hostile(df, vec_col="v", dim=2, ts_col="ts")
    for side, label in [(fc, "clean"), (fq, "quarantine")]:
        tree, _ = plan_of(side)
        n = tree.count("Scan parquet")
        assert n == 1, f"fused {label} side reads the corpus {n}x, want 1"

    _, sq = _sequential_hostile(df, vec_col="v", dim=2, ts_col="ts")
    tree, _ = plan_of(sq)
    assert tree.count("Scan parquet") == 3, "sequential union should be 3 scans"


def test_quarantine_hostile_is_streaming_startable(spark):
    """The fused gate's stream-safety claim, pinned: pure filters only,
    so both sides of the split stay streaming DataFrames (usable BEFORE
    a watermark); the width axis demands explicit dim= on streams (the
    modal count is impossible), same rule as the single gate."""
    import pytest

    from etl_upc_syllabus_spark.streaming.events import read_events_stream

    stream = read_events_stream(spark, SF_DIR)
    clean, quar = cu.quarantine_hostile(stream, ts_col="ts")
    assert clean.isStreaming and quar.isStreaming

    with_vec = stream.withColumn(
        "v", F.array(F.col("value"), F.col("value"))
    )
    c2, q2 = cu.quarantine_hostile(with_vec, vec_col="v", dim=2, ts_col="ts")
    assert c2.isStreaming and q2.isStreaming
    with pytest.raises(ValueError, match="streaming input needs an explicit dim"):
        cu.quarantine_hostile(with_vec, vec_col="v")


def test_streaming_ingest_recipe_end_to_end(spark, tmp_path):
    """The README streaming-ingest recipe, pinned end-to-end (VERDICT
    r11 item 7): gates BEFORE the watermark -- quarantine_hostile is
    pure filters, the ts axis is what makes watermark poisoning
    impossible (a year-9999 row would otherwise drag the watermark past
    every real window and silently drop them as late), and the width
    axis takes explicit dim= (a stream has no corpus to derive the
    modal width from). Then withWatermark -> tumbling window -> append
    sink. Drained with the staged-sentinel shape the harness uses:
    data + sentinel 1 in micro-batch 1 (advances the watermark),
    sentinel 2 as the trailing data batch that emits the real windows.
    """
    import datetime as dt
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_upc_syllabus_spark.streaming.events import run_stream_to_table

    def table(rows):
        ids, tss, vals, vecs = zip(*rows)
        return pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(list(tss), pa.timestamp("us")),
                "value": pa.array(vals, pa.float64()),
                "vec": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )

    t = lambda m, h=10: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    data = [
        (1, t(1), 1.0, [1.0, 2.0, 3.0]),          # clean, window 10:00
        (2, t(5), 2.0, [1.0, 1.0, 1.0]),          # clean, window 10:00
        (3, t(12), 3.0, [2.0, 2.0, 2.0]),         # clean, window 10:10
        (4, t(2), float("nan"), [1.0, 1.0, 1.0]),  # nonfinite axis
        (5, t(3), 4.0, [1.0, 1.0]),                # width axis (dim=3)
        (6, dt.datetime(9999, 1, 1), 5.0, [1.0, 1.0, 1.0]),  # ts axis
    ]
    sentinel = [(100, dt.datetime(2099, 1, 1), 0.0, [0.0, 0.0, 0.0])]
    d = str(tmp_path / "stream_src")
    os.makedirs(d)
    now = time.time()
    for i, (name, rows) in enumerate(
        [("data", data), ("zz_sentinel_0", sentinel), ("zz_sentinel_1", sentinel)]
    ):
        p = os.path.join(d, f"{name}.parquet")
        pq.write_table(table(rows), p)
        os.utime(p, (now - 100 + 40 * i, now - 100 + 40 * i))

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, value double, vec array<double>"
        )
        .option("maxFilesPerTrigger", "2")
        .parquet(d)
    )
    clean, quar = cu.quarantine_hostile(
        stream, cols=["value"], vec_col="vec", dim=3, ts_col="ts"
    )
    agg = (
        clean.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    wins = {
        (r["ws"].hour, r["ws"].minute): r["n"]
        for r in run_stream_to_table(agg, "append").collect()
        if r["ws"].year < 2099  # sentinel windows are harness scaffolding
    }
    assert wins == {(10, 0): 2, (10, 10): 1}

    reasons = {
        r["event_id"]: r["quarantine_reason"]
        for r in run_stream_to_table(
            quar.select("event_id", "quarantine_reason"), "append"
        ).collect()
    }
    assert set(reasons) == {4, 5, 6}
    assert reasons[4].startswith("nonfinite:")
    assert reasons[5].startswith("width:")
    assert reasons[6].startswith("ts_out_of_range:")
