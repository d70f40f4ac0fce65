"""Composed lake-to-curated-corpus capstone (VERDICT r15 item 5).

Every layer of the engine is proven separately; this probe composes
them ONCE, end to end, and measures the seams -- the demo a 100 TB
user actually runs:

1. **ingest**   -- the documents corpus arrives in BATCHES (groups of
   sources, each carrying an embedding, a float score, and an ingest
   timestamp, with ~0.5% HOSTILE rows injected: NaN scores, ragged
   embedding widths, implausible timestamps), each batch committed via
   ``publish_snapshot_incremental(..., verify=True)`` into a
   pointer-manifest table partitioned by source. Leaves one live
   snapshot per batch -- the accumulation the final re-base exists
   for.
2. **quarantine** -- ``read_current_snapshot`` -> ``quarantine_hostile``
   (all three axes in one fused pass); both sides materialized, the
   injected rows must ALL land in the quarantine report.
3. **dedup**    -- the full near-dup pipeline on the clean corpus:
   shingle -> MinHash -> banded LSH -> exact-Jaccard verify ->
   connected components -> drop list (the dedup_pipeline_e2e shape,
   running on the SNAPSHOT read instead of raw fixtures).
4. **curate**   -- quality metrics + language gate + token counts on
   the dedup survivors (the corpus_curation_pipeline shape); the
   curated corpus keeps en docs with quality >= 0.5.
5. **republish** -- the curated corpus goes back out through the lake:
   per-batch ``publish_snapshot_incremental`` into a curated pointer
   table (accumulating live snapshots again), then
   ``rebase_pointer_table`` collapses them to one, and a final
   ``read_current_snapshot`` count proves the result readable.

Per-stage wall seconds + row counts are printed as one JSON line per
sf; the BASELINE.md capstone table records them. No new registry
entries (the registry stays frozen); correctness here is structural --
injected hostile counts must reconcile exactly, dedup drops must be
< corpus, and the final curated count must survive the re-base
byte-identically.

Usage:
  python tools/gen_scale.py --out scale_data/sf1 --factor 10
  python tools/capstone_pipeline.py --sf-dir scale_data/sf1
  python tools/capstone_pipeline.py --sf-dir /root/testdata/sf0.1
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_upc_syllabus_spark.operators import dedup as dd
from etl_upc_syllabus_spark.operators import textanalysis as ta
from etl_upc_syllabus_spark.operators.components import connected_components
from etl_upc_syllabus_spark.operators.curation import quarantine_hostile
from etl_upc_syllabus_spark.session import get_spark
from etl_upc_syllabus_spark.sources.layout import (
    list_snapshot_versions,
    publish_snapshot_incremental,
    read_current_snapshot,
    rebase_pointer_table,
)
from etl_upc_syllabus_spark.sources.tables import load_table

#: doc_id stride selecting the hostile rows (~0.5% of the corpus),
#: round-robined over the three axes so each gate sees real traffic
HOSTILE_MOD = 200


def _ingest_frame(spark, sf_dir: str):
    """The ingest-shaped corpus: documents enriched with an embedding
    (left join on doc_id -- absence is legal), a float score, and an
    ingest timestamp; every HOSTILE_MOD-th doc poisoned on one axis."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    axis = (F.col("doc_id") / HOSTILE_MOD).cast("long") % 3
    hostile = (F.col("doc_id") % HOSTILE_MOD) == 0
    return (
        docs.join(emb, "doc_id", "left")
        .withColumn(
            "score",
            F.when(hostile & (axis == 0), F.lit(float("nan"))).otherwise(
                F.col("n_chars") / F.lit(1000.0)
            ),
        )
        .withColumn(
            "embedding",
            F.when(
                hostile & (axis == 1), F.array(F.lit(1.0).cast("float"))
            ).otherwise(F.col("embedding")),
        )
        .withColumn(
            "ts",
            F.when(
                hostile & (axis == 2), F.to_timestamp(F.lit("1800-01-01"))
            ).otherwise(
                F.timestamp_add(
                    "DAY",
                    (F.col("doc_id") % 365).cast("int"),
                    F.to_timestamp(F.lit("2024-01-01")),
                )
            ),
        )
    )


def run(sf_dir: str, work_dir: str, n_batches: int) -> dict:
    spark = get_spark("capstone")
    stages: dict[str, float] = {}
    counts: dict[str, int] = {}
    raw_tbl = os.path.join(work_dir, "raw_docs")
    cur_tbl = os.path.join(work_dir, "curated_docs")

    # -- stage 1: batched verified ingest into the pointer table ------
    frame = _ingest_frame(spark, sf_dir)
    sources = sorted(
        r["source"] for r in frame.select("source").distinct().collect()
    )
    batches = [sources[i::n_batches] for i in range(n_batches)]
    t0 = time.perf_counter()
    for batch in batches:
        publish_snapshot_incremental(
            frame.filter(F.col("source").isin(batch)),
            raw_tbl,
            "source",
            verify=True,
        )
    stages["ingest"] = round(time.perf_counter() - t0, 3)
    counts["live_snapshots_after_ingest"] = len(list_snapshot_versions(raw_tbl))

    # -- stage 2: fused hostile quarantine off the snapshot read ------
    t0 = time.perf_counter()
    lake = read_current_snapshot(spark, raw_tbl)
    clean, quarantined = quarantine_hostile(
        lake, cols=["score"], vec_col="embedding", ts_col="ts"
    )
    clean = clean.persist()
    counts["clean"] = clean.count()
    counts["quarantined"] = quarantined.count()
    stages["quarantine"] = round(time.perf_counter() - t0, 3)

    # -- stage 3: full near-dup pipeline on the clean corpus ----------
    t0 = time.perf_counter()
    sets = dd.shingle_sets(clean, "doc_id", "text", k=3).persist()
    pairs = dd.lsh_candidate_pairs(dd.minhash_signatures(sets)).persist()
    verified = dd.jaccard_verify(pairs, sets).filter(F.col("jaccard") >= 0.6)
    comp = connected_components(verified)
    drops = (
        comp.filter(F.col("component") < F.col("id"))
        .select(F.col("id").alias("doc_id"))
        .persist()
    )
    counts["near_dup_drops"] = drops.count()
    stages["dedup"] = round(time.perf_counter() - t0, 3)
    sets.unpersist()
    pairs.unpersist()

    # -- stage 4: quality curation of the survivors -------------------
    t0 = time.perf_counter()
    m = ta.quality_metrics("text")
    curated = (
        clean.join(drops, "doc_id", "left_anti")
        .select(
            "doc_id",
            "source",
            "lang",
            "text",
            ta.token_count("text").alias("n_tokens"),
            m["quality_score"].alias("quality"),
            ta.lang_id("text").alias("pred_lang"),
        )
        .filter((F.col("pred_lang") == "en") & (F.col("quality") >= 0.5))
        .persist()
    )
    counts["curated"] = curated.count()
    stages["curate"] = round(time.perf_counter() - t0, 3)
    clean.unpersist()
    drops.unpersist()

    # -- stage 5: re-publish through the lake, then re-base -----------
    t0 = time.perf_counter()
    for batch in batches:
        publish_snapshot_incremental(
            curated.filter(F.col("source").isin(batch)),
            cur_tbl,
            "source",
            verify=True,
        )
    counts["live_snapshots_pre_rebase"] = len(list_snapshot_versions(cur_tbl))
    rebase_pointer_table(spark, cur_tbl)
    counts["final_read"] = read_current_snapshot(spark, cur_tbl).count()
    stages["republish_rebase"] = round(time.perf_counter() - t0, 3)
    curated.unpersist()

    # structural reconciliation: every injected hostile row quarantined,
    # nothing clean lost, the re-based table reads the curated count
    assert counts["clean"] + counts["quarantined"] == lake.count()
    n_hostile = quarantined.filter(
        (F.col("doc_id") % HOSTILE_MOD) == 0
    ).count()
    assert n_hostile == counts["quarantined"], (
        n_hostile,
        counts["quarantined"],
    )
    assert counts["final_read"] == counts["curated"]
    sf = os.path.basename(sf_dir.rstrip("/"))
    result = {
        "metric": "capstone_pipeline",
        "sf": sf,
        "total_sec": round(sum(stages.values()), 3),
        "stages": stages,
        "counts": counts,
    }
    spark.stop()
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--work-dir", default=None)
    ap.add_argument("--batches", type=int, default=5)
    args = ap.parse_args()
    work = args.work_dir or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "scale_data",
        "capstone_" + os.path.basename(args.sf_dir.rstrip("/")),
    )
    if os.path.isdir(work):
        shutil.rmtree(work)
    os.makedirs(work, exist_ok=True)
    print(json.dumps(run(args.sf_dir, work, args.batches)))


if __name__ == "__main__":
    main()
