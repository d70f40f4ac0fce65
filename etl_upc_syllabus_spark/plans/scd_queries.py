"""Warehouse-shape queries: SCD2 dimension merge and corpus vocabulary.

SCD2 binds operators.scd to the customer dimension; the vocab query is
the canonical explode -> two-phase agg -> top-k shape over documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textanalysis as ta
from ..operators.scd import cdc_apply, scd2_merge
from ..sources.tables import fan_out, load_table
from . import _fragments as fr
from .registry import query


@query(
    "scd2_dimension_merge",
    """
    WITH cur AS (
      SELECT c_custkey AS custkey, c_mktsegment AS segment,
             '2020-01-01' AS valid_from, '9999-12-31' AS valid_to,
             CAST(1 AS BIGINT) AS is_current
      FROM customer),
    upd AS (
      SELECT c_custkey AS custkey,
             CASE WHEN c_custkey % 20 = 0 THEN c_mktsegment
                  ELSE 'MIGRATED' END AS segment
      FROM customer WHERE c_custkey % 10 = 0),
    chg AS (
      SELECT cur.custkey, cur.segment AS old_seg, upd.segment AS new_seg,
             cur.valid_from
      FROM cur JOIN upd USING (custkey)
      WHERE cur.segment <> upd.segment)
    SELECT custkey, segment, valid_from, valid_to, is_current FROM (
      SELECT cur.custkey, cur.segment, cur.valid_from, cur.valid_to, cur.is_current
      FROM cur LEFT JOIN chg USING (custkey) WHERE chg.custkey IS NULL
      UNION ALL
      SELECT custkey, old_seg, valid_from, '2024-06-01', CAST(0 AS BIGINT) FROM chg
      UNION ALL
      SELECT custkey, new_seg, '2024-06-01', '9999-12-31', CAST(1 AS BIGINT) FROM chg)
    """,
    doc="SCD2 MERGE (lakehouse upsert as pure DataFrame ops): a batch "
    "updating every 10th customer's segment -- half of them no-ops "
    "(c_custkey % 20: new value equals old) that change-detection must "
    "pass through untouched -- closes the changed rows at the effective "
    "date and opens new versions. Update batch broadcasts; the "
    "dimension is never shuffled. operators/scd.py.",
    tags=("relational", "merge", "scd2"),
)
def scd2_dimension_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    current = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("2020-01-01").alias("valid_from"),
        F.lit("9999-12-31").alias("valid_to"),
        F.lit(1).cast("long").alias("is_current"),
    )
    updates = (
        cust.filter(F.col("c_custkey") % 10 == 0)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.when(F.col("c_custkey") % 20 == 0, F.col("c_mktsegment"))
            .otherwise(F.lit("MIGRATED"))
            .alias("segment"),
        )
    )
    return scd2_merge(current, updates, "custkey", ["segment"], "2024-06-01")


@query(
    "vocab_topk_terms",
    f"""
    WITH t AS (SELECT unnest({fr.TOKENS}) AS term FROM documents),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY term),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM t)
    SELECT term, n, round(CAST(n AS DOUBLE) / total, 9) AS term_frac
    FROM c, tot
    ORDER BY n DESC, term
    LIMIT 20
    """,
    doc="Corpus vocabulary: global term frequencies, top 20 with "
    "corpus-fraction -- tokenizer-coverage estimation over training "
    "data. The canonical explode -> aggregate shape done right: "
    "map-side partial aggregation shrinks the token shuffle to "
    "distinct terms per partition, top-k is TakeOrderedAndProject "
    "(never a global sort), and the one-row total broadcasts.",
    tags=("text", "vocab", "agg", "llm-pipeline"),
)
def vocab_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = d.select(F.explode(ta.tokens("text")).alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("n"))
    total = toks.agg(F.count(F.lit(1)).cast("long").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "term",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 9).alias("term_frac"),
        )
        .orderBy(F.desc("n"), "term")
        .limit(20)
    )


@query(
    "cdc_apply_changes",
    """
    WITH log AS (SELECT o_orderkey // 8 AS k, o_orderkey AS seq,
                        CASE WHEN o_orderkey % 11 = 3 THEN 'D' ELSE 'U' END AS op,
                        o_totalprice AS price, o_orderstatus AS status
                 FROM orders),
    r AS (SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
          FROM log)
    SELECT k, seq, price, status FROM r WHERE rn = 1 AND op <> 'D'
    """,
    doc="CDC log compaction (the apply half of lakehouse MERGE / Delta "
    "CDF / Hudi upsert): a keyed change log (deterministically derived "
    "from orders: ~8 versions per key, every 11th entry a delete) "
    "compacts to the latest-per-key snapshot with delete tombstones "
    "dropped. One key-shuffle window top-1 -- free when the log is "
    "bucketed by key, which is the layout any CDC sink writes "
    "(operators/scd.py cdc_apply).",
    tags=("cdc", "lakehouse", "window"),
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    log = orders.select(
        F.expr("o_orderkey div 8").alias("k"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 11 == 3, "D").otherwise("U").alias("op"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    return cdc_apply(log, key="k", seq="seq")
