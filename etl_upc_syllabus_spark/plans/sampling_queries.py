"""Driver-contract queries for deterministic splitting / sampling.

Both queries are pure per-row projections plus one aggregation -- the
scan fans out, the only shuffle is the final small groupBy. The hash
family is the engine-portable salted-md5-hex8 used across the repo
(operators/dedup.py), mirrored digit-by-digit in the DuckDB oracle via
plans/_fragments.hex8_value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sampling
from ..sources.tables import fan_out, load_table
from . import _fragments as fr
from .registry import query

_SPLIT_BUCKET = fr.hex8_value("h") + " % 100"
_SAMPLE_BUCKET = fr.hex8_value("h") + " % 1000"


@query(
    "split_train_val_test",
    f"""
    WITH b AS (
      SELECT n_chars, {_SPLIT_BUCKET} AS bucket
      FROM (SELECT n_chars, md5(doc_id::VARCHAR || '#split') AS h FROM documents))
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM b GROUP BY 1
    """,
    doc="Deterministic 80/10/10 train/val/test assignment by salted "
    "content hash (operators/sampling.py hash_split): reproducible "
    "across runs/engines/partitionings, stable as the corpus grows -- "
    "the split surface Spark's sample() cannot provide. Per-split "
    "doc and char counts.",
    tags=("sampling", "split", "llm-pipeline"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    s = sampling.hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return s.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


@query(
    "sample_stratified_by_lang",
    f"""
    WITH b AS (
      SELECT lang, doc_id, {_SAMPLE_BUCKET} AS bucket
      FROM (SELECT lang, doc_id, md5(doc_id::VARCHAR || '#sample') AS h FROM documents))
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM b
    WHERE bucket < CASE WHEN lang = 'en' THEN 250 ELSE 1000 END
    GROUP BY lang
    """,
    doc="Per-stratum deterministic downsampling (operators/sampling.py "
    "stratified_sample): cap the over-represented language at 25% while "
    "keeping the rest -- the rebalancing shape of corpus curation. "
    "Hash-threshold per row, no shuffle before the final count; "
    "id_checksum pins the exact kept set, not just its size.",
    tags=("sampling", "stratified", "llm-pipeline"),
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    kept = sampling.stratified_sample(d, "lang", {"en": 0.25}, "doc_id", default_rate=1.0)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )


_CORPUS = (
    "CASE WHEN CAST(substr(source, 4, 8) AS INT) <= 6 THEN 'web' "
    "WHEN CAST(substr(source, 4, 8) AS INT) <= 13 THEN 'wiki' "
    "ELSE 'books' END"
)


@query(
    "corpus_mixture_rebalance",
    f"""
    WITH d AS (
      SELECT doc_id, {_CORPUS} AS corpus,
             {fr.hex8_value("md5(doc_id::VARCHAR || '#mixture')")} % 1000 AS bucket
      FROM documents),
    c AS (SELECT corpus, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY corpus),
    w AS (SELECT * FROM (VALUES ('web', 50), ('wiki', 30), ('books', 20)) t(corpus, w)),
    no AS (SELECT min(n * 100 // w) AS n_out FROM c JOIN w USING (corpus)),
    thr AS (SELECT corpus, (1000 * ((n_out * w) // 100)) // n AS thr
            FROM c JOIN w USING (corpus) CROSS JOIN no)
    SELECT corpus,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM d JOIN thr USING (corpus)
    WHERE bucket < thr
    GROUP BY corpus
    """,
    doc="Pretraining data mixing (operators/sampling.py "
    "rebalance_mixture): water-fill the largest output satisfying "
    "50/30/20 corpus weights without upsampling, then hash-filter each "
    "stratum to its computed keep-threshold. BIGINT-only threshold "
    "math (DIV mirrors //), so the kept set is engine-exact. Plan: "
    "tiny count agg + broadcast of (stratum, threshold) back onto the "
    "fanned-out scan -- the corpus itself is never shuffled.",
    tags=("sampling", "mixture", "llm-pipeline"),
)
def corpus_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents")).withColumn(
        "corpus", F.expr(_CORPUS)
    )
    kept = sampling.rebalance_mixture(
        d, "corpus", {"web": 50, "wiki": 30, "books": 20}, "doc_id"
    )
    return kept.groupBy("corpus").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )


@query(
    "sequence_packing",
    f"""
    WITH b AS (
      SELECT doc_id, n_chars, {fr.hex8_value("md5(doc_id::VARCHAR || '#pack')")} % 100 % 8 AS bucket
      FROM documents),
    c AS (
      SELECT bucket, doc_id, n_chars,
             CAST(sum(n_chars) OVER (PARTITION BY bucket ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM b),
    p AS (
      SELECT bucket, doc_id, n_chars,
             CAST((cum - n_chars) // 4096 AS BIGINT) AS pack_id FROM c)
    SELECT bucket, pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM p GROUP BY bucket, pack_id
    """,
    doc="Sequence packing for training batches: assign consecutive "
    "documents to fixed 4096-char budget packs via a running sum and "
    "integer division (greedy streaming pack; a pack overflows by at "
    "most one document). Packing runs INSIDE 8 deterministic hash "
    "buckets, not one global window -- a global ORDER BY window "
    "serializes onto a single partition at 100 TB, while per-bucket "
    "windows scale linearly and keep pack ids stable. BIGINT-only "
    "math (DIV mirrors //); window frame is deterministic via the "
    "doc_id order.",
    tags=("sampling", "packing", "window", "llm-pipeline"),
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = fan_out(load_table(spark, sf_dir, "documents"))
    b = d.select(
        "doc_id",
        "n_chars",
        (sampling.hash_bucket("doc_id", 100, "pack") % 8).alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = b.withColumn("cum", F.sum("n_chars").over(w)).withColumn(
        "pack_id", F.expr("(cum - n_chars) DIV 4096")
    )
    return p.groupBy("bucket", "pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


@query(
    "sample_weighted_reservoir",
    f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             round(ln(({fr.hex8_value("md5(doc_id::VARCHAR || '#wres')")} + 1)
                      / 4294967296.0) / n_chars, 9) AS k
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, lang, n_chars, k
    FROM keyed ORDER BY k DESC, doc_id LIMIT 50
    """,
    doc="Weighted reservoir sampling (Efraimidis-Spirakis A-ES): each "
    "doc draws a deterministic uniform u from its salted content hash "
    "and competes with key ln(u)/weight (weight = n_chars, "
    "log-domain form of u^(1/w)); the global top-50 by key IS an exact "
    "weighted-without-replacement sample. One narrow projection plus a "
    "TakeOrdered top-k -- a single pass, no per-partition state, "
    "mergeable across 1000 executors, and reproducible across "
    "runs/engines/partitionings (the property rand() sampling cannot "
    "give). Key is rounded at 9 dp with doc_id tiebreak so the cutoff "
    "is engine-stable.",
    tags=("sampling", "reservoir", "weighted", "llm-pipeline"),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#wres")))
    u = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") + 1) / F.lit(4294967296.0)
    key = F.round(F.log(u) / F.col("n_chars"), 9)
    return (
        d.filter(F.col("n_chars") > 0)
        .select("doc_id", "lang", "n_chars", key.alias("k"))
        .orderBy(F.desc("k"), "doc_id")
        .limit(50)
    )
