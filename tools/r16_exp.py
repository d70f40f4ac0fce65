"""Round-16 optimization experiments: time candidate plan variants
against the shipping implementation in ONE session, and check value
identity (exact row equality) before any variant is promoted.

Usage: python tools/r16_exp.py <exp> [--runs N]
Experiments: q1_fanout, rollup_fanout, flagship_fanout, q3_fanout,
             q5_fanout, sort_fanout, leftjoin_fanout, curation_let,
             quality_let, bruteforce_norms, stream_parts
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_upc_syllabus_spark.plans import all_specs  # noqa: E402
from etl_upc_syllabus_spark.session import get_spark  # noqa: E402
from etl_upc_syllabus_spark.sources.tables import fan_out, load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timeit(df_fn, runs: int = 3) -> float:
    # warmup
    df_fn().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def paired(base_fn, var_fn, pairs: int = 6) -> tuple[float, float, float]:
    """Interleave base/variant single runs and compare PAIRED samples:
    adjacent-in-time pairs cancel the host's slow load drift, which a
    sequential best-of-N comparison on this shared box does not
    (observed: the same A/B flipping between 1.3x and 0.7x minutes
    apart). Returns (median base, median variant, median per-pair
    ratio)."""
    base_fn().write.format("noop").mode("overwrite").save()
    var_fn().write.format("noop").mode("overwrite").save()
    bs, vs, ratios = [], [], []
    for _ in range(pairs):
        t0 = time.perf_counter()
        base_fn().write.format("noop").mode("overwrite").save()
        b = time.perf_counter() - t0
        t0 = time.perf_counter()
        var_fn().write.format("noop").mode("overwrite").save()
        v = time.perf_counter() - t0
        bs.append(b)
        vs.append(v)
        ratios.append(b / v)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    return round(med(bs), 3), round(med(vs), 3), round(med(ratios), 2)


def rows_equal(a: DataFrame, b: DataFrame) -> bool:
    ra = sorted(map(repr, a.collect()))
    rb = sorted(map(repr, b.collect()))
    return ra == rb


def _q1_variant(spark: SparkSession) -> DataFrame:
    from etl_upc_syllabus_spark.plans.relational import _dec, _dsum

    li = fan_out(load_table(spark, SF_DIR, "lineitem")).filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - disc)
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(_dec("l_quantity")).alias("sum_qty"),
        _dsum(_dec("l_extendedprice")).alias("sum_base_price"),
        _dsum(disc_price).alias("sum_disc_price"),
        _dsum(disc_price * (F.lit(1) + tax)).alias("sum_charge"),
        (_dsum(_dec("l_quantity")) / n).alias("avg_qty"),
        (_dsum(_dec("l_extendedprice")) / n).alias("avg_price"),
        (F.sum(disc).cast("double") / n).alias("avg_disc"),
        n.alias("count_order"),
    )


def _rollup_variant(spark: SparkSession) -> DataFrame:
    from etl_upc_syllabus_spark.plans.relational import _dec, _dsum

    return (
        fan_out(load_table(spark, SF_DIR, "lineitem"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(_dsum(_dec("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


def _flagship_variant(spark: SparkSession) -> DataFrame:
    from etl_upc_syllabus_spark.plans.relational import _dec, _dsum

    li = fan_out(load_table(spark, SF_DIR, "lineitem"))
    orders = load_table(spark, SF_DIR, "orders").filter(F.year("o_orderdate") == 1997)
    revenue = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.weekofyear("o_orderdate").cast("long").alias("week"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            _dsum(revenue).alias("revenue"),
            F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias("priorities"),
        )
        .orderBy("week")
    )


def _q3_variant(spark: SparkSession) -> DataFrame:
    from etl_upc_syllabus_spark.plans.relational import _dec, _dsum

    cust = load_table(spark, SF_DIR, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, SF_DIR, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = fan_out(load_table(spark, SF_DIR, "lineitem")).filter(
        F.col("l_shipdate") > F.lit("1996-06-30")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(_dsum(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def _q5_variant(spark: SparkSession) -> DataFrame:
    from etl_upc_syllabus_spark.plans.relational import _dec, _dsum

    li = fan_out(load_table(spark, SF_DIR, "lineitem"))
    sup = load_table(spark, SF_DIR, "supplier")
    nat = F.broadcast(load_table(spark, SF_DIR, "nation"))
    reg = F.broadcast(load_table(spark, SF_DIR, "region"))
    orders = load_table(spark, SF_DIR, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("r_name", "n_name")
        .agg(_dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def _sort_variant(spark: SparkSession) -> DataFrame:
    return (
        fan_out(load_table(spark, SF_DIR, "lineitem"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


def _leftjoin_variant(spark: SparkSession) -> DataFrame:
    from etl_upc_syllabus_spark.plans.relational import _dec

    cust = fan_out(load_table(spark, SF_DIR, "customer"))
    orders = load_table(spark, SF_DIR, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0)).cast("double").alias("spend"),
        )
    )


def _curation_let_variant(spark: SparkSession) -> DataFrame:
    """corpus_curation_pipeline with norm/token evaluation let-bound:
    one norm_text pass and one split per row instead of one per
    consumer reference."""
    from etl_upc_syllabus_spark.operators import textanalysis as ta
    from etl_upc_syllabus_spark.operators.dedup import survivors

    d = fan_out(load_table(spark, SF_DIR, "documents"))
    surv = survivors(d, "doc_id", "text")

    def metrics(n):
        def from_tokens(tk):
            n_chars = F.length(n).cast("long")
            n_toks = (
                F.when(F.length(n) == 0, F.lit(0)).otherwise(F.size(tk)).cast("long")
            )
            n_punct = (
                F.length(n) - F.length(F.regexp_replace(n, ta.PUNCT_CLASS, ""))
            ).cast("long")
            hits = {
                lang: F.size(F.filter(tk, lambda t: t.isin(*words))).cast("long")
                for lang, words in ta.LANG_MARKERS.items()
            }
            n_stop = F.size(F.filter(tk, lambda t: t.isin(*ta.STOPWORDS))).cast("long")
            avg_token_len = (n_chars - (n_toks - 1)).cast("double") / n_toks
            punct_ratio = n_punct.cast("double") / n_chars
            stop_ratio = n_stop.cast("double") / n_toks
            q = (
                0.4 * stop_ratio
                + 0.3 * F.least(avg_token_len / 8.0, F.lit(1.0))
                + 0.3 * (1.0 - punct_ratio)
            )
            expr = F.lit(ta.LANG_ORDER[-1])
            for lang in reversed(ta.LANG_ORDER[:-1]):
                later = ta.LANG_ORDER[ta.LANG_ORDER.index(lang) + 1 :]
                cond = None
                for other in later:
                    c = hits[lang] >= hits[other]
                    cond = c if cond is None else (cond & c)
                expr = F.when(cond, F.lit(lang)).otherwise(expr)
            n_bpe = F.regexp_count(n, F.lit(ta.BPE_PATTERN)).cast("long")
            return F.struct(
                n_toks.alias("n_tokens"),
                n_bpe.alias("n_bpe"),
                q.alias("q"),
                expr.alias("plang"),
            )

        return ta.let_bind(F.split(n, " "), from_tokens)

    m = ta.let_bind(ta.norm_text("text"), metrics)
    scored = surv.select("source", m.alias("m")).select(
        "source", "m.n_tokens", "m.n_bpe", "m.q", "m.plang"
    )
    return (
        scored.filter((F.col("plang") == "en") & (F.col("q") >= 0.5))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_ws_tokens"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.min("q").alias("min_quality"),
            F.max("q").alias("max_quality"),
        )
    )


def _quality_let_variant(spark: SparkSession) -> DataFrame:
    """text_quality_score with let-bound norm/tokens."""
    from etl_upc_syllabus_spark.operators import textanalysis as ta

    d = fan_out(load_table(spark, SF_DIR, "documents"))

    def metrics(n):
        def from_tokens(tk):
            n_chars = F.length(n).cast("long")
            n_toks = (
                F.when(F.length(n) == 0, F.lit(0)).otherwise(F.size(tk)).cast("long")
            )
            n_punct = (
                F.length(n) - F.length(F.regexp_replace(n, ta.PUNCT_CLASS, ""))
            ).cast("long")
            n_stop = F.size(F.filter(tk, lambda t: t.isin(*ta.STOPWORDS))).cast("long")
            avg_token_len = (n_chars - (n_toks - 1)).cast("double") / n_toks
            punct_ratio = n_punct.cast("double") / n_chars
            stop_ratio = n_stop.cast("double") / n_toks
            q = (
                0.4 * stop_ratio
                + 0.3 * F.least(avg_token_len / 8.0, F.lit(1.0))
                + 0.3 * (1.0 - punct_ratio)
            )
            return F.struct(
                n_chars.alias("n_chars"),
                n_toks.alias("n_tokens"),
                avg_token_len.alias("avg_token_len"),
                punct_ratio.alias("punct_ratio"),
                stop_ratio.alias("stop_ratio"),
                q.alias("quality_score"),
            )

        return ta.let_bind(F.split(n, " "), from_tokens)

    m = ta.let_bind(ta.norm_text("text"), metrics)
    return d.select("doc_id", m.alias("m")).select(
        "doc_id",
        "m.n_chars",
        "m.n_tokens",
        "m.avg_token_len",
        "m.punct_ratio",
        "m.stop_ratio",
        "m.quality_score",
    )


def _bruteforce_norms_variant(spark: SparkSession) -> DataFrame:
    """similarity_topk_bruteforce with per-row precomputed norms (the
    per-pair expression recomputes both norms per candidate pair)."""
    from pyspark.sql.window import Window as W

    from etl_upc_syllabus_spark.operators.similarity import _dot, _norm, indexable

    emb = fan_out(load_table(spark, SF_DIR, "embeddings"))
    id_col, vec_col, k = "vec_id", "embedding", 5
    q = emb.filter((F.col(id_col) < 10) & indexable(vec_col)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        _norm(vec_col).alias("q_nrm"),
    )
    c = emb.filter(indexable(vec_col)).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_emb"),
        _norm(vec_col).alias("c_nrm"),
    )
    sim = F.round(_dot("q_emb", "c_emb") / (F.col("q_nrm") * F.col("c_nrm")), 6)
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _q5_dims_variant(spark: SparkSession) -> DataFrame:
    """q5 with the supplier->nation->region snowflake collapsed FIRST
    into one 1000-row broadcast dim, so lineitem probes one hash table
    instead of three and two broadcast builds disappear."""
    from etl_upc_syllabus_spark.plans.relational import _dec, _dsum

    li = load_table(spark, SF_DIR, "lineitem")
    sup = load_table(spark, SF_DIR, "supplier")
    nat = F.broadcast(load_table(spark, SF_DIR, "nation"))
    reg = F.broadcast(load_table(spark, SF_DIR, "region"))
    sup_dim = F.broadcast(
        sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "n_name", "r_name")
    )
    orders = load_table(spark, SF_DIR, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    return (
        li.join(sup_dim, li.l_suppkey == sup_dim.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("r_name", "n_name")
        .agg(_dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def _flagship_preagg_variant(spark: SparkSession) -> DataFrame:
    """flagship with lineitem pre-aggregated by orderkey before the
    join: the countDistinct two-phase agg over item rows becomes a
    plain count over unique orderkeys."""
    from etl_upc_syllabus_spark.plans.relational import _dec

    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders").filter(F.year("o_orderdate") == 1997)
    revenue = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n_items"), F.sum(revenue).alias("_rev")
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .groupBy(F.weekofyear("o_orderdate").cast("long").alias("week"))
        .agg(
            F.sum("_n_items").alias("n_items"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("_rev").cast("double").alias("revenue"),
            F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias("priorities"),
        )
        .orderBy("week")
    )


def _dedup_exact_nofan_variant(spark: SparkSession) -> DataFrame:
    from etl_upc_syllabus_spark.operators import dedup as dd

    return dd.exact_dedup(load_table(spark, SF_DIR, "documents"), "doc_id", "text")


def _q5_dims_nohint_variant(spark: SparkSession) -> DataFrame:
    """q5 snowflake collapse WITHOUT a forced broadcast on the enriched
    supplier dim: the planner (or AQE at runtime) picks broadcast at
    gate SFs and falls back to a shuffled join at a scale where a
    SF-proportional supplier no longer fits -- a forced hint would not."""
    from etl_upc_syllabus_spark.plans.relational import _dec, _dsum

    li = load_table(spark, SF_DIR, "lineitem")
    sup = load_table(spark, SF_DIR, "supplier")
    nat = F.broadcast(load_table(spark, SF_DIR, "nation"))
    reg = F.broadcast(load_table(spark, SF_DIR, "region"))
    sup_dim = (
        sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "n_name", "r_name")
    )
    orders = load_table(spark, SF_DIR, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    return (
        li.join(sup_dim, li.l_suppkey == sup_dim.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("r_name", "n_name")
        .agg(_dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def _curation_nofan_variant(spark: SparkSession) -> DataFrame:
    """corpus_curation_pipeline (fused metrics, as shipped) minus the
    fan_out round-robin pre-shuffle: the survivors window re-shuffles
    by text-hash anyway, so the RR exchange only parallelizes the
    pre-window md5."""
    from etl_upc_syllabus_spark.operators import textanalysis as ta
    from etl_upc_syllabus_spark.operators.dedup import survivors

    d = load_table(spark, SF_DIR, "documents")
    surv = survivors(d, "doc_id", "text")
    m = ta.curation_metrics("text")
    scored = surv.select("source", m.alias("m")).select(
        "source",
        F.col("m.n_tokens").alias("n_tokens"),
        F.col("m.n_bpe").alias("n_bpe"),
        F.col("m.quality_score").alias("q"),
        F.col("m.predicted_lang").alias("plang"),
    )
    return (
        scored.filter((F.col("plang") == "en") & (F.col("q") >= 0.5))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_ws_tokens"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.min("q").alias("min_quality"),
            F.max("q").alias("max_quality"),
        )
    )


def _rollup_preagg_variant(spark: SparkSession) -> DataFrame:
    """agg_rollup computed as a 2-key groupBy first, then rollup over
    the tiny per-(flag,status) aggregate: sum/count are decomposable,
    so the 3x Expand multiplication runs over |groups| rows instead of
    the whole fact table."""
    from etl_upc_syllabus_spark.plans.relational import _dec

    base = (
        load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(_dec("l_quantity")).alias("_s"), F.count(F.lit(1)).alias("_n"))
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("_s").cast("double").alias("sum_qty"), F.sum("_n").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


def _leftjoin_preagg_variant(spark: SparkSession) -> DataFrame:
    """join_left_groupby with orders pre-aggregated by custkey before
    the join (aggregate before you shuffle the join): the outer join
    then matches 15k aggregate rows instead of 150k order rows."""
    from etl_upc_syllabus_spark.plans.relational import _dec

    cust = load_table(spark, SF_DIR, "customer")
    per_cust = (
        load_table(spark, SF_DIR, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("o_orderkey").alias("_n"),
            F.sum(_dec("o_totalprice")).alias("_s"),
        )
    )
    return cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("_n", F.lit(0)).alias("n_orders"),
        F.coalesce("_s", F.lit(0)).cast("double").alias("spend"),
    )


EXPERIMENTS = {
    "q5_dims": ("q5_region_revenue", _q5_dims_variant),
    "q5_dims_nohint": ("q5_region_revenue", _q5_dims_nohint_variant),
    "curation_nofan": ("corpus_curation_pipeline", _curation_nofan_variant),
    "rollup_preagg": ("agg_rollup", _rollup_preagg_variant),
    "leftjoin_preagg": ("join_left_groupby", _leftjoin_preagg_variant),
    "flagship_preagg": ("flagship_weekly_calendar", _flagship_preagg_variant),
    "dedup_exact_nofan": ("dedup_exact", _dedup_exact_nofan_variant),
    "q1_fanout": ("q1_pricing_summary", _q1_variant),
    "rollup_fanout": ("agg_rollup", _rollup_variant),
    "flagship_fanout": ("flagship_weekly_calendar", _flagship_variant),
    "q3_fanout": ("q3_shipping_priority", _q3_variant),
    "q5_fanout": ("q5_region_revenue", _q5_variant),
    "sort_fanout": ("sort_topk", _sort_variant),
    "leftjoin_fanout": ("join_left_groupby", _leftjoin_variant),
    "curation_let": ("corpus_curation_pipeline", _curation_let_variant),
    "quality_let": ("text_quality_score", _quality_let_variant),
    "bruteforce_norms": ("similarity_topk_bruteforce", _bruteforce_norms_variant),
}


def main() -> int:
    args = sys.argv[1:]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args or list(EXPERIMENTS)
    specs = all_specs()
    spark = get_spark("r16-exp")
    for exp in names:
        base_name, variant = EXPERIMENTS[exp]
        base_fn = specs[base_name].fn
        t_base, t_var, ratio = paired(
            lambda: base_fn(spark, SF_DIR), lambda: variant(spark), runs
        )
        same = rows_equal(base_fn(spark, SF_DIR), variant(spark))
        print(
            f"{exp:24s} base_med={t_base:7.3f}  var_med={t_var:7.3f}  "
            f"paired_speedup={ratio:5.2f}x  rows_equal={same}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
