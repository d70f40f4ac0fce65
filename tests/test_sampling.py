"""Invariants of deterministic splitting / sampling (operators/sampling.py):
splits partition the input exactly; assignment is content-determined, so
it survives repartitioning and corpus growth; stratified sampling keeps
a subset with per-stratum rates near their targets."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_upc_syllabus_spark.operators import sampling

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("lang"),
    )


def test_split_partitions_input(spark):
    d = _docs(spark)
    got = dict(
        sampling.hash_split(d, "doc_id", WEIGHTS)
        .groupBy("split").count().collect()
    )
    assert set(got) == set(WEIGHTS)
    assert sum(got.values()) == 2000
    # Within 5 points of target on 2000 ids -- deterministic, not a flake gate.
    for name, w in WEIGHTS.items():
        assert abs(got[name] / 2000 - w) < 0.05, (name, got)


def test_split_stable_under_repartition_and_growth(spark):
    d = _docs(spark)
    base = {r["doc_id"]: r["split"] for r in sampling.hash_split(d, "doc_id", WEIGHTS).collect()}
    shuffled = {
        r["doc_id"]: r["split"]
        for r in sampling.hash_split(d.repartition(13), "doc_id", WEIGHTS).collect()
    }
    assert base == shuffled
    grown = {
        r["doc_id"]: r["split"]
        for r in sampling.hash_split(_docs(spark, 4000), "doc_id", WEIGHTS).collect()
    }
    assert all(grown[k] == v for k, v in base.items())


def test_stratified_sample_is_exact_subset_with_rates(spark):
    d = _docs(spark)
    kept = sampling.stratified_sample(d, "lang", {"0": 0.2, "1": 0.5}, "doc_id")
    rows = kept.collect()
    all_ids = {r["doc_id"] for r in d.collect()}
    assert {r["doc_id"] for r in rows} <= all_ids
    by_lang = dict(kept.groupBy("lang").count().collect())
    assert abs(by_lang["0"] / 500 - 0.2) < 0.08
    assert abs(by_lang["1"] / 500 - 0.5) < 0.08
    assert by_lang["2"] == 500 and by_lang["3"] == 500  # default_rate=1.0


def test_rebalance_mixture_waterfills_without_upsampling(spark):
    # 1200/600/200 rows of a/b/c, targets 50/30/20: c is the binding
    # stratum (200*100//20 = 1000 = n_out), so targets are 500/300/200.
    d = _docs(spark, 2000).withColumn(
        "src",
        F.when(F.col("doc_id") < 1200, "a").when(F.col("doc_id") < 1800, "b").otherwise("c"),
    )
    kept = sampling.rebalance_mixture(d, "src", {"a": 50, "b": 30, "c": 20}, "doc_id")
    got = dict(kept.groupBy("src").count().collect())
    assert got["c"] == 200  # binding stratum kept whole (threshold = buckets)
    # hash-threshold keeps ~target; exact count varies binomially
    assert abs(got["a"] - 500) <= 50 and abs(got["b"] - 300) <= 40, got
    # never upsample
    assert got["a"] <= 1200 and got["b"] <= 600


def test_sequence_packing_invariants(spark, sf_dir):
    from etl_upc_syllabus_spark.plans import all_specs
    from etl_upc_syllabus_spark.sources.tables import load_table

    packs = all_specs()["sequence_packing"].fn(spark, sf_dir).collect()
    max_doc = load_table(spark, sf_dir, "documents").agg(F.max("n_chars")).first()[0]
    n_docs_total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in packs) == n_docs_total  # every doc packed once
    by_bucket = {}
    for r in packs:
        by_bucket.setdefault(r["bucket"], []).append(r)
        # a greedy streaming pack overflows its budget by at most one document
        assert r["sum_chars"] < 4096 + max_doc, r
        assert r["n_docs"] >= 1
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r["pack_id"])
        # packs take consecutive doc_id ranges within their bucket
        for a, b in zip(rows, rows[1:]):
            assert a["last_doc"] < b["first_doc"], (a, b)


def test_weighted_reservoir_deterministic_under_partitioning(spark, sf_dir):
    """The A-ES hash-priority sample is a pure function of content:
    identical top-50 regardless of physical partitioning."""
    from etl_upc_syllabus_spark.plans.registry import all_specs

    fn = all_specs()["sample_weighted_reservoir"].fn
    base = [tuple(r) for r in fn(spark, sf_dir).collect()]
    # same query over a repartitioned view of the same table
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(7)
    docs.createOrReplaceTempView("_wres_tmp")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#wres")))
    u = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") + 1) / F.lit(4294967296.0)
    key = F.round(F.log(u) / F.col("n_chars"), 9)
    again = [
        tuple(r)
        for r in (
            docs.filter(F.col("n_chars") > 0)
            .select("doc_id", "lang", "n_chars", key.alias("k"))
            .orderBy(F.desc("k"), "doc_id")
            .limit(50)
        ).collect()
    ]
    assert base == again


def test_weighted_reservoir_favors_heavy_docs(spark, sf_dir):
    """Weighting sanity: the sampled docs' mean n_chars exceeds the
    corpus mean (chars-weighted sampling upweights long docs)."""
    from etl_upc_syllabus_spark.plans.registry import all_specs

    fn = all_specs()["sample_weighted_reservoir"].fn
    sampled = fn(spark, sf_dir).agg(F.avg("n_chars")).first()[0]
    corpus = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert sampled > corpus
