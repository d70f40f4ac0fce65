"""Round-17 optimization experiments: order-balanced paired timing of
candidate plan variants vs the shipping implementation in ONE session,
with exact row-equality checks before any variant is promoted.

The r16 lesson, institutionalized: on this shared host, sequential A/B
flips sign with load drift, and even INTERLEAVED fixed-order pairs
carry a ~4% whoever-runs-second bias (the r16 local.dir control).
``paired_balanced`` therefore alternates which side runs first on each
pair and reports the median per-pair ratio, so order bias cancels by
construction.

Usage: python tools/r17_exp.py <exp> [--pairs N]
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


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def paired_balanced(
    base_fn, var_fn, pairs: int = 10
) -> tuple[float, float, float, list[float]]:
    """Alternating-order paired sampling. Returns (median base, median
    variant, median per-pair ratio base/var, all ratios). ratio > 1
    means the variant is faster."""
    noop(base_fn())  # warm both plans (JIT, page cache, codegen)
    noop(var_fn())
    bs, vs, ratios = [], [], []
    for i in range(pairs):
        order = (base_fn, var_fn) if i % 2 == 0 else (var_fn, base_fn)
        t = {}
        for fn in order:
            t0 = time.perf_counter()
            noop(fn())
            t[fn] = time.perf_counter() - t0
        b, v = t[base_fn], t[var_fn]
        bs.append(b)
        vs.append(v)
        ratios.append(b / v)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    return med(bs), med(vs), med(ratios), [round(r, 3) for r in ratios]


def jobs_of(spark: SparkSession, df_fn, label: str) -> int:
    """Count Spark jobs one warm execution schedules (AQE stage-jobs
    included): the per-query fixed-latency figure the r16 'not yet
    optimized' list blames for dedup_minhash_lsh's warm floor."""
    noop(df_fn())  # warm first so caches/persists are materialized
    sc = spark.sparkContext
    group = f"r17jobs_{label}_{time.monotonic_ns()}"
    sc.setJobGroup(group, label)
    try:
        noop(df_fn())
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def rows_equal(a: DataFrame, b: DataFrame) -> bool:
    ra = sorted(map(repr, a.collect()))
    rb = sorted(map(repr, b.collect()))
    if ra != rb:
        for x, y in zip(ra, rb):
            if x != y:
                print("  first diff:\n   base:", x, "\n   var: ", y)
                break
        print(f"  base rows={len(ra)} var rows={len(rb)}")
    return ra == rb


def report(name: str, base_fn, var_fn, pairs: int) -> None:
    spark = base_fn().sparkSession
    jb = jobs_of(spark, base_fn, f"{name}_base")
    jv = jobs_of(spark, var_fn, f"{name}_var")
    b, v, r, ratios = paired_balanced(base_fn, var_fn, pairs)
    eq = rows_equal(base_fn(), var_fn())
    print(
        f"{name}: base={b:.3f}s var={v:.3f}s ratio(med)={r:.3f} "
        f"jobs {jb}->{jv} rows_equal={eq}\n  ratios={ratios}"
    )


# --------------------------------------------------------------------------
# dedup_minhash_lsh verify-stage variants
# --------------------------------------------------------------------------


def _lsh_inputs(spark: SparkSession):
    from etl_upc_syllabus_spark.operators import dedup as dd
    from etl_upc_syllabus_spark.plans.dedup_queries import _docs

    sets = dd.shingle_sets(_docs(spark, SF_DIR), "doc_id", "text", k=3).persist()
    pairs = dd.lsh_candidate_pairs(dd.minhash_signatures(sets)).persist()
    return sets, pairs


def _verify_base(pairs: DataFrame, sets: DataFrame) -> DataFrame:
    from etl_upc_syllabus_spark.operators.dedup import jaccard_verify

    return jaccard_verify(pairs, sets)


def _verify_nodistinct(pairs: DataFrame, sets: DataFrame) -> DataFrame:
    """Drop the .distinct() on cand_ids: a left-semi probe side needs
    no dedup, so the union can stay narrow (one fewer exchange+agg)."""
    cand_ids = pairs.select(F.col("a").alias("id")).union(
        pairs.select(F.col("b").alias("id"))
    )
    cand_sets = sets.join(cand_ids, "id", "left_semi")
    n_inter = F.size(F.array_intersect("ss_a", "ss_b"))
    return (
        pairs.join(
            cand_sets.select(F.col("id").alias("a"), F.col("ss").alias("ss_a")), "a"
        )
        .join(cand_sets.select(F.col("id").alias("b"), F.col("ss").alias("ss_b")), "b")
        .select(
            "a",
            "b",
            (
                n_inter.cast("double") / (F.size("ss_a") + F.size("ss_b") - n_inter)
            ).alias("jaccard"),
        )
    )


def _verify_melt(pairs: DataFrame, sets: DataFrame) -> DataFrame:
    """Fetch both sides' arrays through ONE join: melt each pair to two
    (pair, id) rows, join sets once, pivot back by role. Trades the
    two scoring joins + semi-join for one join + one groupBy whose
    exchange carries only the candidate NEIGHBORHOOD's arrays."""
    m = pairs.select(
        "a", "b", F.explode(F.array(F.col("a"), F.col("b"))).alias("id")
    )
    j = m.join(sets, "id")
    per = (
        j.groupBy("a", "b")
        .agg(
            F.first(
                F.when(F.col("id") == F.col("a"), F.col("ss")), ignorenulls=True
            ).alias("ss_a"),
            F.first(
                F.when(F.col("id") == F.col("b"), F.col("ss")), ignorenulls=True
            ).alias("ss_b"),
        )
        .filter(F.col("ss_a").isNotNull() & F.col("ss_b").isNotNull())
    )
    n_inter = F.size(F.array_intersect("ss_a", "ss_b"))
    return per.select(
        "a",
        "b",
        (
            n_inter.cast("double") / (F.size("ss_a") + F.size("ss_b") - n_inter)
        ).alias("jaccard"),
    )


def exp_verify(pairs_n: int) -> None:
    spark = get_spark("r17-exp")
    sets, pairs = _lsh_inputs(spark)
    noop(_verify_base(pairs, sets))  # materialize persists once
    report(
        "verify_nodistinct",
        lambda: _verify_base(pairs, sets),
        lambda: _verify_nodistinct(pairs, sets),
        pairs_n,
    )
    report(
        "verify_melt",
        lambda: _verify_base(pairs, sets),
        lambda: _verify_melt(pairs, sets),
        pairs_n,
    )


# --------------------------------------------------------------------------
# q1 fan_out adjudication (VERDICT r16 item 1)
# --------------------------------------------------------------------------


def _q1_with(spark: SparkSession, use_fanout: bool) -> DataFrame:
    from etl_upc_syllabus_spark.plans.relational import _dec, _dsum

    li = load_table(spark, SF_DIR, "lineitem")
    if use_fanout:
        li = fan_out(li)
    li = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
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


def exp_q1(pairs_n: int) -> None:
    spark = get_spark("r17-exp")
    # base = WITHOUT fan_out (the r15 shape), variant = WITH (the r16
    # adoption under adjudication); ratio > 1 keeps the fan_out
    report(
        "q1_fanout",
        lambda: _q1_with(spark, False),
        lambda: _q1_with(spark, True),
        pairs_n,
    )


# --------------------------------------------------------------------------
# q3 pre-aggregate-before-join (VERDICT r16 item 4)
# --------------------------------------------------------------------------


def _q3_base(spark: SparkSession) -> DataFrame:
    return all_specs()["q3_shipping_priority"].fn(spark, SF_DIR)


def _q3_preagg(spark: SparkSession) -> DataFrame:
    from etl_upc_syllabus_spark.plans.relational import _dec, _dsum

    cust = load_table(spark, SF_DIR, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    li = load_table(spark, SF_DIR, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-30")
    )
    revenue = _dec("l_extendedprice") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    per_order = li.groupBy("l_orderkey").agg(_dsum(revenue).alias("revenue"))
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def exp_q3(pairs_n: int) -> None:
    spark = get_spark("r17-exp")
    report("q3_preagg", lambda: _q3_base(spark), lambda: _q3_preagg(spark), pairs_n)


EXPERIMENTS = {
    "verify": exp_verify,
    "q1": exp_q1,
    "q3": exp_q3,
}


def main() -> int:
    args = sys.argv[1:]
    pairs_n = 10
    if "--pairs" in args:
        i = args.index("--pairs")
        pairs_n = int(args[i + 1])
        del args[i : i + 2]
    if not args or args[0] not in EXPERIMENTS:
        print(__doc__)
        print("experiments:", ", ".join(EXPERIMENTS))
        return 2
    EXPERIMENTS[args[0]](pairs_n)
    return 0


if __name__ == "__main__":
    sys.exit(main())
