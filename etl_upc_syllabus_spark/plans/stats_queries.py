"""Statistical-analytics queries: closed-form regression, A/B test
inference, Benford data-quality audit, robust (MAD) anomaly flags,
truncated-EWMA smoothing, an l-diversity release gate, and a
heavy-hitter skew detector.

Cross-engine determinism strategy (the reason these hash-match):

- every corpus-sized SUM that feeds later arithmetic is either an
  exact integer/DECIMAL aggregate (bit-identical across engines) or a
  per-group double sum rounded at a fixed dp (the repo-wide q1
  convention, registry.py ground rules);
- once the aggregates are exact-and-identical, the closed-form math
  (multiply / subtract / divide / sqrt) is IEEE-754 correctly-rounded
  in both engines, so the *derived statistics are bit-identical* --
  only transcendental functions (ln) need a rounding fence.

The reference has no statistics surface at all; this is part of the
engine-completion layer the blueprint's phase 3 calls for
(SURVEY.md section 7).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import fan_out, load_table
from .registry import query

# month index since 1992-01: identical integer expression both engines
_MONTH_SPARK = "(year(l_shipdate) - 1992) * 12 + month(l_shipdate) - 1"
_MONTH_SQL = "(year(l_shipdate) - 1992) * 12 + month(l_shipdate) - 1"


@query(
    "stats_linear_regression",
    f"""
    WITH monthly AS (
      SELECT CAST({_MONTH_SQL} AS BIGINT) AS m,
             CAST(round(sum(l_extendedprice * (1 - l_discount)), 2)
                  AS DECIMAL(18,2)) AS y
      FROM lineitem GROUP BY 1),
    s AS (
      SELECT CAST(count(*) AS DOUBLE)            AS n,
             CAST(sum(m) AS DOUBLE)              AS sx,
             CAST(sum(y) AS DOUBLE)              AS sy,
             CAST(sum(m * y) AS DOUBLE)          AS sxy,
             CAST(sum(m * m) AS DOUBLE)          AS sxx,
             -- DECIMAL(19) operands force DuckDB onto int128 decimal
             -- multiply (18+18 stays int64 and overflows at sf>=0.01);
             -- 19+19=38 is still inside DuckDB's width cap
             CAST(sum(CAST(y AS DECIMAL(19,2)) * CAST(y AS DECIMAL(19,2)))
                  AS DOUBLE)                     AS syy
      FROM monthly)
    SELECT CAST(n AS BIGINT) AS n_months,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
    doc="Ordinary-least-squares trend of monthly revenue vs month index, "
    "closed form from ONE pass of map-combinable sums (n, Sx, Sy, Sxy, "
    "Sxx, Syy) -- the distributed-regression shape: partial sums "
    "combine associatively, so 100 TB needs one scan + one 6-number "
    "reduce, no driver iteration. Parity design: the monthly sums are "
    "exact DECIMAL (engine-identical), cast once to double, and every "
    "later op is IEEE-deterministic, so slope/intercept/r2 are "
    "bit-identical before the display rounding.",
    tags=("stats", "regression", "analytics"),
)
def stats_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(F.expr(_MONTH_SPARK).cast("long").alias("m")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .cast("decimal(18,2)")
        .alias("y")
    )
    s = monthly.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("m").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("m") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("m") * F.col("m")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = num / den
    return s.select(
        n.cast("long").alias("n_months"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(num * num / (den * (n * syy - sy * sy)), 6).alias("r2"),
    )


@query(
    "stats_ab_test_ztest",
    """
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
             max(CASE WHEN event_type = 'purchase' AND value > 180
                 THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1, 2),
    v AS (
      SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n0,
             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
             CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS DOUBLE) AS c0,
             CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS DOUBLE) AS c1
      FROM u),
    z AS (
      SELECT n0, n1, c0, c1,
             (c1 / n1 - c0 / n0)
               / sqrt((c0 + c1) / (n0 + n1) * (1 - (c0 + c1) / (n0 + n1))
                      * (1 / n0 + 1 / n1)) AS zs
      FROM v)
    SELECT CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treatment,
           CAST(c0 AS BIGINT) AS conv_control, CAST(c1 AS BIGINT) AS conv_treatment,
           round(c0 / n0, 6) AS rate_control, round(c1 / n1, 6) AS rate_treatment,
           round(zs, 6) AS z_score,
           CAST(CASE WHEN abs(zs) > 1.959964 THEN 1 ELSE 0 END AS BIGINT)
             AS significant_95
    FROM z
    """,
    doc="Two-proportion pooled z-test over the events stream (variant = "
    "user parity, conversion = a high-value purchase -- the plain "
    "purchase flag saturates at rate 1.0 in this fixture, degenerating "
    "the pooled variance to 0): per-user collapse, "
    "4-counter conditional aggregate, closed-form z. The experimentation "
    "readout every event pipeline needs; at 100 TB it is one per-user "
    "shuffle then a scalar reduce. All counters are exact integers, so "
    "the z statistic is bit-identical across engines (IEEE div/sqrt); "
    "the significance flag compares the unrounded value.",
    tags=("stats", "abtest", "events"),
)
def stats_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("long").alias("variant")
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 180), 1
            ).otherwise(0)
        ).alias("conv")
    )
    v = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("double").alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0))
        .cast("double")
        .alias("c0"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0))
        .cast("double")
        .alias("c1"),
    )
    n0, n1, c0, c1 = F.col("n0"), F.col("n1"), F.col("c0"), F.col("c1")
    pp = (c0 + c1) / (n0 + n1)
    zs = (c1 / n1 - c0 / n0) / F.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
    return v.select(
        n0.cast("long").alias("n_control"),
        n1.cast("long").alias("n_treatment"),
        c0.cast("long").alias("conv_control"),
        c1.cast("long").alias("conv_treatment"),
        F.round(c0 / n0, 6).alias("rate_control"),
        F.round(c1 / n1, 6).alias("rate_treatment"),
        F.round(zs, 6).alias("z_score"),
        F.when(F.abs(zs) > 1.959964, 1).otherwise(0).cast("long").alias("significant_95"),
    )


# Benford expectations ln(1+1/d)/ln(10), rounded 6 dp in Python once and
# inlined as literals in BOTH engines -- no cross-engine ln() at all.
_BENFORD = {d: round(math.log10(1 + 1 / d), 6) for d in range(1, 10)}


@query(
    "dq_benford_first_digit",
    f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM lineitem),
    obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM obs),
    exp(digit, e) AS (VALUES {", ".join(f"({d}, {e})" for d, e in _BENFORD.items())})
    SELECT o.digit, o.n,
           round(o.n / t.t, 6) AS observed_pct,
           e.e AS benford_pct,
           round((o.n - t.t * e.e) * (o.n - t.t * e.e) / (t.t * e.e), 6)
             AS chi2_term
    FROM obs o JOIN exp e ON e.digit = o.digit CROSS JOIN tot t
    """,
    doc="Benford first-significant-digit audit of the price column: "
    "digit histogram vs the log expectation, per-digit chi-square "
    "contribution. The data-quality screen for fabricated/truncated "
    "numeric feeds. First digit is taken from the exact cents INTEGER "
    "(int-to-string is engine-stable; no float formatting), Benford "
    "expectations are Python-rounded literals, so no transcendental is "
    "evaluated inside either engine. One scan + a 9-row reduce at any "
    "scale. TPC-H prices are range-bounded so the audit correctly "
    "reports a Benford violation -- the point of the check.",
    tags=("dq", "benford", "audit"),
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    digits = li.select(
        F.substring(
            F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").cast("double").alias("t"))
    exp = spark.createDataFrame(
        [(d, e) for d, e in _BENFORD.items()], "digit BIGINT, e DOUBLE"
    )
    o = obs.join(F.broadcast(exp), "digit").crossJoin(F.broadcast(tot))
    dev = F.col("n") - F.col("t") * F.col("e")
    return o.select(
        "digit",
        "n",
        F.round(F.col("n") / F.col("t"), 6).alias("observed_pct"),
        F.col("e").alias("benford_pct"),
        F.round(dev * dev / (F.col("t") * F.col("e")), 6).alias("chi2_term"),
    )


@query(
    "events_anomaly_mad",
    """
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY 1),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS d
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, round(quantile_cont(d, 0.5), 6) AS mad
      FROM dev GROUP BY 1)
    SELECT d.event_id, d.event_type,
           round(d.value, 6) AS value,
           round(d.d / (1.4826 * m.mad), 4) AS mad_score
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad > 0 AND d.d / (1.4826 * m.mad) > 3.0
    """,
    doc="Robust per-type anomaly flags: median / MAD (the "
    "outlier-insensitive z-score) with flag at 3 sigma-equivalents. "
    "Both medians run over the (value, frequency) pre-aggregate -- "
    "bounded by the distinct domain, the same sf10-OOM fix as "
    "feature_quantile_bucket -- and are rounded at 6 dp, after which "
    "the score arithmetic is IEEE-identical in both engines, so the "
    ">3.0 cut has no boundary risk. The monitoring primitive for "
    "metric streams: two narrow aggregates + two broadcast joins back.",
    tags=("stats", "anomaly", "mad", "events"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import anomaly

    ev = fan_out(load_table(spark, sf_dir, "events"))
    ref = anomaly.mad_reference(ev)
    return anomaly.mad_flags(ev.select("event_id", "event_type", "value"), ref)


def _ewma_expr() -> str:
    """Truncated-EWMA as a lag-chain with exact-decimal literal weights.

    alpha=0.3, 10-tap truncation: weight_j = 3*7^j / 10^(j+1) is an
    exact decimal, rendered identically into BOTH engines' SQL, and the
    left-associative addition chain fixes the summation order -- so the
    smoothed value is bit-identical across engines (no in-engine
    power(), no HOF ordering ambiguity). Missing taps (series warmup)
    are zero-padded.
    """
    over = "OVER (PARTITION BY event_type ORDER BY day)"
    terms = []
    for j in range(10):
        num, den = 3 * 7**j, 10 ** (j + 1)
        # exact decimal string: num / den with den a power of ten
        s = str(num)
        dp = len(str(den)) - 1
        s = s.rjust(dp, "0")
        w = "0." + s[-dp:] if len(s) == dp else s[:-dp] + "." + s[-dp:]
        if j == 0:
            terms.append(f"{w} * y")
        else:
            terms.append(f"{w} * coalesce(lag(y, {j}) {over}, 0.0)")
    return " + ".join(terms)


@query(
    "events_ewma_smoothing",
    f"""
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             round(sum(value), 6) AS y
      FROM events GROUP BY 1, 2)
    SELECT event_type, day, y, round({_ewma_expr()}, 6) AS ewma
    FROM daily
    """,
    doc="Exponentially-weighted moving average of the daily metric per "
    "event type (alpha=0.3, 10-tap truncated kernel -- the tail weight "
    "beyond 10 taps is <3%, zero-padded warmup). The recursive EWMA "
    "definition is inherently sequential; the truncated form is a "
    "fixed dot-product with constant weights, expressible as a lag "
    "chain inside ONE window pass -- embarrassingly parallel across "
    "keys, no iteration, no state. Weights are exact-decimal literals "
    "shared verbatim by both engines and the addition order is fixed "
    "by the expression text, so the smoothed series is bit-identical "
    "before the display rounding.",
    tags=("stats", "ewma", "timeseries", "events"),
)
def events_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    return daily.select(
        "event_type", "day", "y", F.expr(f"round({_ewma_expr()}, 6)").alias("ewma")
    )


@query(
    "privacy_l_diversity",
    """
    WITH s AS (
      SELECT c_nationkey, c_mktsegment,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 5000 THEN 'mid'
                  ELSE 'high' END AS sens
      FROM customer),
    classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(count(*) AS BIGINT) AS class_size,
             CAST(count(DISTINCT sens) AS BIGINT) AS l_distinct
      FROM s GROUP BY 1, 2)
    SELECT c_nationkey, c_mktsegment, class_size, l_distinct,
           CAST(CASE WHEN l_distinct < 3 THEN 1 ELSE 0 END AS BIGINT)
             AS below_l
    FROM classes
    """,
    doc="l-diversity audit (l=3) over the same quasi-identifier classes "
    "as privacy_k_anonymity, with account-balance band as the sensitive "
    "attribute: a class can be k-anonymous yet still leak (everyone in "
    "it shares one sensitive value), so release gates need BOTH checks. "
    "Distinct-sensitive count per class, below-l flag; one "
    "groupBy+distinct aggregate.",
    tags=("privacy", "l-diversity", "governance"),
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    sens = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("sens")
    )
    return (
        cust.select("c_nationkey", "c_mktsegment", sens)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct("sens").alias("l_distinct"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            "l_distinct",
            F.when(F.col("l_distinct") < 3, 1).otherwise(0).cast("long").alias("below_l"),
        )
    )


@query(
    "dq_heavy_hitters",
    """
    WITH kc AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS n
                FROM lineitem GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t,
                   CAST(avg(n) AS DOUBLE) AS a FROM kc),
    ranked AS (SELECT k, n, CAST(row_number() OVER (
                   ORDER BY n DESC, k) AS BIGINT) AS rank FROM kc)
    SELECT r.k AS key, r.n, r.rank,
           round(r.n / t.t, 6) AS share,
           round(r.n / t.a, 4) AS skew_factor
    FROM ranked r CROSS JOIN tot t
    WHERE r.rank <= 20
    """,
    doc="Heavy-hitter / skew diagnostic on the join key: top-20 keys by "
    "frequency with corpus share and skew factor (count / mean count). "
    "The pre-flight check that decides whether a 100 TB join needs "
    "salting or AQE skew handling BEFORE it runs (operators/skew.py is "
    "the mitigation; this is the detector). One groupBy bounded by the "
    "key domain + a broadcast scalar; top-k via TakeOrdered.",
    tags=("dq", "skew", "profiling"),
)
def dq_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    kc = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = kc.agg(
        F.sum("n").cast("double").alias("t"), F.avg("n").cast("double").alias("a")
    )
    from pyspark.sql.window import Window as W

    # top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps, no global sort); the rank window then runs over only the
    # 20 surviving rows. A bare row_number window over the full key
    # domain would single-partition-sort millions of keys at scale.
    top = kc.orderBy(F.desc("n"), "k").limit(20)
    ranked = top.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("n"), "k")).cast("long")
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        F.col("k").alias("key"),
        "n",
        "rank",
        F.round(F.col("n") / F.col("t"), 6).alias("share"),
        F.round(F.col("n") / F.col("a"), 4).alias("skew_factor"),
    )


@query(
    "events_time_to_convert",
    """
    WITH fv AS (SELECT user_id, min(epoch_us(ts)) AS v
                FROM events WHERE event_type = 'view' GROUP BY 1),
    fp AS (SELECT user_id, min(epoch_us(ts)) AS p
           FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT fv.user_id,
           CAST(floor(CAST(fp.p - fv.v AS DOUBLE) / 1000000) AS BIGINT)
             AS tt_seconds,
           CASE WHEN fp.p < fv.v THEN 'pre_exposure'
                WHEN fp.p - fv.v < 3600000000 THEN 'under_1h'
                WHEN fp.p - fv.v < 86400000000 THEN 'under_1d'
                ELSE 'over_1d' END AS band
    FROM fv JOIN fp ON fp.user_id = fv.user_id
    """,
    doc="Time-to-convert: per user, seconds from first view to first "
    "purchase with latency bands (including the pre-exposure edge "
    "where the purchase precedes any view -- real event streams have "
    "it and dropping it silently biases the funnel metric). Two "
    "filtered min-aggregates + one key join; exact integer epoch "
    "microseconds throughout. Seconds use an explicit floor() of the "
    "same double division in both engines: DuckDB's // truncates "
    "toward zero while Spark's floor() floors, and the two differ by "
    "one on the negative pre-exposure deltas.",
    tags=("events", "funnel", "latency"),
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def first_ts(etype: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy("user_id")
            .agg(F.min(F.unix_micros("ts")).alias(out))
        )

    j = first_ts("view", "v").join(first_ts("purchase", "p"), "user_id")
    delta = F.col("p") - F.col("v")
    return j.select(
        "user_id",
        F.floor(delta / F.lit(1000000.0)).cast("long").alias("tt_seconds"),
        F.when(F.col("p") < F.col("v"), "pre_exposure")
        .when(delta < 3600000000, "under_1h")
        .when(delta < 86400000000, "under_1d")
        .otherwise("over_1d")
        .alias("band"),
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_pairs_sql() -> str:
    parts = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            parts.append(
                f"""SELECT '{a}~{b}' AS pair,
       round((n * s_xy - s_x * s_y)
             / sqrt((n * s_xx - s_x * s_x) * (n * s_yy - s_y * s_y)), 6)
         AS pearson
FROM (SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(xa) AS DOUBLE) AS s_x, CAST(sum(xb) AS DOUBLE) AS s_y,
             CAST(sum(xa * xb) AS DOUBLE) AS s_xy,
             CAST(sum(CAST(xa AS DECIMAL(19,2)) * CAST(xa AS DECIMAL(19,2)))
                  AS DOUBLE) AS s_xx,
             CAST(sum(CAST(xb AS DECIMAL(19,2)) * CAST(xb AS DECIMAL(19,2)))
                  AS DOUBLE) AS s_yy
      FROM (SELECT CAST(round({a} * 100) AS DECIMAL(18,2)) AS xa,
                   CAST(round({b} * 100) AS DECIMAL(18,2)) AS xb
            FROM lineitem))"""
            )
    return "\nUNION ALL\n".join(parts)


@query(
    "stats_correlation_matrix",
    _corr_pairs_sql(),
    doc="Pairwise Pearson correlation of the four numeric fact columns "
    "(the feature-selection screen). Values are exact 2-dp decimals, "
    "so every sum is DECIMAL-exact and engine-identical (cents-scaled; "
    "correlation is scale-invariant), and the closed form is "
    "IEEE-deterministic after one cast -- the same parity design as "
    "stats_linear_regression. ALL 13 moments (count, 4 sums, 4 sums of "
    "squares, 6 cross-products) come from ONE fused scan whose 1-row "
    "result is checkpointed and fanned out to the six pair rows -- at "
    "100 TB this is one pass over the fact table, not one per pair "
    "(the oracle spells the same values per pair for checkability).",
    tags=("stats", "correlation", "analytics"),
)
def stats_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cols = _CORR_COLS

    def cents(c: str):
        return F.round(F.col(c) * 100).cast("decimal(18,2)")

    def big(c: str):
        return F.col(c).cast("decimal(19,2)")

    d = li.select(*[cents(c).alias(c) for c in cols])
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in cols:
        aggs.append(F.sum(c).cast("double").alias(f"s_{c}"))
        aggs.append(F.sum(big(c) * big(c)).cast("double").alias(f"ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(
                F.sum(F.col(a) * F.col(b)).cast("double").alias(f"sp_{a}_{b}")
            )
    # ONE scan computes every moment; the 1-row result is checkpointed
    # so the six per-pair selects below read it instead of re-running
    # the aggregate per union branch (Catalyst does not share subplans
    # across union arms)
    s = d.agg(*aggs).localCheckpoint(eager=True)
    out = None
    n = F.col("n")
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            sx, sy = F.col(f"s_{a}"), F.col(f"s_{b}")
            sxx, syy = F.col(f"ss_{a}"), F.col(f"ss_{b}")
            sxy = F.col(f"sp_{a}_{b}")
            r = s.select(
                F.lit(f"{a}~{b}").alias("pair"),
                F.round(
                    (n * sxy - sx * sy)
                    / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                    6,
                ).alias("pearson"),
            )
            out = r if out is None else out.unionAll(r)
    return out


@query(
    "agg_histogram_fixed_bins",
    """
    SELECT CAST(CAST(round(l_extendedprice * 100) AS BIGINT) // 1000000
                AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS lo_cents,
           CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS hi_cents
    FROM lineitem GROUP BY 1
    """,
    doc="Equi-WIDTH histogram (fixed $10k bins), the complement of "
    "feature_quantile_bucket's equi-depth binning: bin assignment is "
    "exact-integer cents division (positive, so truncation == floor in "
    "both engines), one map-combinable groupBy bounded by the bin "
    "count. The distribution profile that feeds range-partition and "
    "file-layout decisions.",
    tags=("agg", "histogram", "profiling"),
)
def agg_histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.select(cents.alias("c"))
        .groupBy(F.floor(F.col("c") / 1000000).cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c").alias("lo_cents"),
            F.max("c").alias("hi_cents"),
        )
    )


@query(
    "events_level_shift_detect",
    """
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             round(sum(value), 6) AS y
      FROM events GROUP BY 1, 2),
    win AS (
      SELECT event_type, day, y,
             round(avg(y) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS m_recent,
             count(*) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_recent,
             round(avg(y) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND 7 PRECEDING), 6) AS m_prior,
             count(*) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND 7 PRECEDING) AS n_prior
      FROM daily)
    SELECT event_type, day, m_recent, m_prior,
           round(abs(m_recent - m_prior) / abs(m_prior), 4) AS shift_ratio,
           CAST(CASE WHEN abs(m_recent - m_prior) / abs(m_prior) > 0.25
                THEN 1 ELSE 0 END AS BIGINT) AS is_shift
    FROM win
    WHERE n_recent = 7 AND n_prior = 7 AND m_prior <> 0
    """,
    doc="Level-shift detection on the daily metric per event type: "
    "trailing 7-day mean vs the preceding 7-day mean, flag when the "
    "relative shift exceeds 25% -- the windowed changepoint screen "
    "(CUSUM's recursive max is not windowable; the two-window contrast "
    "is its parallel-friendly stand-in and the standard monitoring "
    "primitive). Full-window rows only; both means are rounded at 6 dp "
    "so the ratio arithmetic is engine-identical, and the flag "
    "compares the same deterministic expression. One shuffle on the "
    "key; window state is 14 rows per key.",
    tags=("stats", "changepoint", "monitoring", "events"),
)
def events_level_shift_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    base = W.partitionBy("event_type").orderBy("day")
    recent = base.rowsBetween(-6, 0)
    prior = base.rowsBetween(-13, -7)
    win = daily.select(
        "event_type",
        "day",
        F.round(F.avg("y").over(recent), 6).alias("m_recent"),
        F.count(F.lit(1)).over(recent).alias("n_recent"),
        F.round(F.avg("y").over(prior), 6).alias("m_prior"),
        F.count(F.lit(1)).over(prior).alias("n_prior"),
    )
    ratio = F.abs(F.col("m_recent") - F.col("m_prior")) / F.abs(F.col("m_prior"))
    return (
        win.filter(
            (F.col("n_recent") == 7) & (F.col("n_prior") == 7) & (F.col("m_prior") != 0)
        )
        .select(
            "event_type",
            "day",
            "m_recent",
            "m_prior",
            F.round(ratio, 4).alias("shift_ratio"),
            F.when(ratio > 0.25, 1).otherwise(0).cast("long").alias("is_shift"),
        )
    )


@query(
    "stats_seasonal_decompose",
    f"""
    WITH monthly AS (
      SELECT CAST({_MONTH_SQL} AS BIGINT) AS m,
             CAST(round(sum(l_extendedprice * (1 - l_discount)), 2)
                  AS DECIMAL(18,2)) AS y
      FROM lineitem GROUP BY 1),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(m) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(m * y) AS DOUBLE) AS sxy,
             CAST(sum(m * m) AS DOUBLE) AS sxx
      FROM monthly),
    fit AS (
      SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
               AS intercept
      FROM s),
    detr AS (
      SELECT m, CAST(y AS DOUBLE) AS yd,
             round(intercept + slope * m, 6) AS trend
      FROM monthly CROSS JOIN fit),
    seas AS (
      SELECT m % 12 AS moy, round(avg(yd - trend), 6) AS seasonal
      FROM detr GROUP BY 1)
    SELECT d.m, round(d.yd, 2) AS y, d.trend, se.seasonal,
           round(d.yd - d.trend - se.seasonal, 2) AS residual
    FROM detr d JOIN seas se ON se.moy = d.m % 12
    """,
    doc="Classical seasonal decomposition of monthly revenue (STL-lite): "
    "OLS trend (same DECIMAL-exact fit as stats_linear_regression), "
    "calendar-month seasonal component as the mean detrended deviation "
    "per month-of-year, residual as the remainder. The time-series "
    "triage that separates growth from seasonality from anomalies. "
    "The fit is a 1-row broadcast onto the monthly spine, the seasonal "
    "table is 12 rows broadcast back; month count is bounded, so every "
    "stage after the first scan is constant-size at any fact scale. "
    "Trend/seasonal rounded at 6 dp fence the per-group mean's "
    "summation order; residual rounds at 2 dp on top of fenced inputs.",
    tags=("stats", "seasonality", "timeseries", "analytics"),
)
def stats_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(F.expr(_MONTH_SPARK).cast("long").alias("m")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .cast("decimal(18,2)")
        .alias("y")
    )
    s = monthly.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("m").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("m") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("m") * F.col("m")).cast("double").alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    fit = s.select(
        slope.alias("slope"), ((sy - slope * sx) / n).alias("intercept")
    )
    detr = monthly.crossJoin(F.broadcast(fit)).select(
        "m",
        F.col("y").cast("double").alias("yd"),
        F.round(F.col("intercept") + F.col("slope") * F.col("m"), 6).alias("trend"),
    )
    seas = detr.groupBy((F.col("m") % 12).alias("moy")).agg(
        F.round(F.avg(F.col("yd") - F.col("trend")), 6).alias("seasonal")
    )
    return (
        detr.join(F.broadcast(seas), detr.m % 12 == seas.moy)
        .select(
            "m",
            F.round("yd", 2).alias("y"),
            "trend",
            "seasonal",
            F.round(F.col("yd") - F.col("trend") - F.col("seasonal"), 2).alias(
                "residual"
            ),
        )
    )


@query(
    "stats_pareto_concentration",
    """
    WITH cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY 1),
    tot AS (SELECT CAST(sum(rev_cents) AS DOUBLE) AS t,
                   CAST(count(*) AS BIGINT) AS n_cust FROM cust),
    ranked AS (
      SELECT rev_cents,
             CAST(row_number() OVER (ORDER BY rev_cents DESC, o_custkey)
                  AS BIGINT) AS rnk,
             CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey)
                  AS BIGINT) AS cum_cents
      FROM cust)
    SELECT b.pct AS top_pct,
           round(max(r.cum_cents) / t.t, 6) AS revenue_share
    FROM ranked r
    CROSS JOIN tot t
    JOIN (VALUES (1), (5), (10), (20), (50)) b(pct)
      ON r.rnk <= greatest(1, t.n_cust * b.pct // 100)
    GROUP BY b.pct, t.t
    """,
    doc="Pareto/concentration analysis: revenue share captured by the "
    "top 1/5/10/20/50% of customers (the 80/20 screen behind key-skew "
    "expectations and account prioritization). Exact integer cents "
    "end-to-end; the running sum ranks the customer aggregate (bounded "
    "by |customers|, not |orders|), and each banded share is the max "
    "cumulative at the band cutoff over one broadcast scalar. "
    "The global rank window runs over the customer AGGREGATE -- "
    "domain-bounded -- not the fact table.",
    tags=("stats", "pareto", "analytics"),
)
def stats_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents")
    )
    tot = cust.agg(
        F.sum("rev_cents").cast("double").alias("t"),
        F.count(F.lit(1)).alias("n_cust"),
    )
    w = W.orderBy(F.desc("rev_cents"), "o_custkey")
    ranked = cust.select(
        "rev_cents",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.sum("rev_cents").over(w).cast("long").alias("cum_cents"),
    )
    bands = spark.createDataFrame([(1,), (5,), (10,), (20,), (50,)], "pct BIGINT")
    r = ranked.crossJoin(F.broadcast(tot)).join(
        F.broadcast(bands),
        F.col("rnk")
        <= F.greatest(F.lit(1), F.expr("n_cust * pct div 100")),
    )
    return r.groupBy(F.col("pct").alias("top_pct"), "t").agg(
        F.round(F.max("cum_cents") / F.col("t"), 6).alias("revenue_share")
    ).select("top_pct", "revenue_share")


@query(
    "orders_open_backlog_sweepline",
    """
    WITH done AS (
      SELECT l_orderkey AS ok, max(l_shipdate) AS done_ts
      FROM lineitem GROUP BY 1),
    deltas AS (
      SELECT strftime(o.o_orderdate, '%Y-%m') AS month, 1 AS delta
      FROM orders o
      UNION ALL
      SELECT strftime(d.done_ts, '%Y-%m') AS month, -1 AS delta
      FROM orders o JOIN done d ON d.ok = o.o_orderkey),
    monthly AS (
      SELECT month, CAST(sum(delta) AS BIGINT) AS net
      FROM deltas GROUP BY 1)
    SELECT month, net,
           CAST(sum(net) OVER (ORDER BY month) AS BIGINT) AS open_backlog
    FROM monthly
    """,
    doc="Sweep-line interval aggregation: how many orders are OPEN "
    "(placed, not yet fully shipped) at each month end. Every interval "
    "becomes a +1 at its start and a -1 at its completion (max ship "
    "date across the order's lines), deltas aggregate per month, and "
    "one running sum over the BOUNDED month spine yields the "
    "concurrent-interval count -- the O(n) distributed pattern for "
    "interval overlap questions that would otherwise need a "
    "range join of every order against every time point. The global "
    "window runs over ~84 month rows, not the fact table.",
    tags=("stats", "sweepline", "intervals", "analytics"),
)
def orders_open_backlog_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    done = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.max("l_shipdate").alias("done_ts")
    )
    starts = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"), F.lit(1).alias("delta")
    )
    ends = (
        orders.join(done, orders.o_orderkey == done.ok)
        .select(F.date_format("done_ts", "yyyy-MM").alias("month"), F.lit(-1).alias("delta"))
    )
    monthly = starts.unionAll(ends).groupBy("month").agg(
        F.sum("delta").cast("long").alias("net")
    )
    return monthly.select(
        "month",
        "net",
        F.sum("net").over(W.orderBy("month")).cast("long").alias("open_backlog"),
    )


@query(
    "events_dau_wau_stickiness",
    """
    WITH act AS (
      SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
      FROM events),
    dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM act GROUP BY 1),
    cover AS (
      SELECT unnest(range(day, day + 7)) AS day, user_id FROM act),
    wau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
            FROM cover GROUP BY 1)
    SELECT CAST(d.day AS BIGINT) AS day, d.dau, w.wau,
           round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w USING (day)
    """,
    doc="DAU / WAU engagement stickiness: daily actives over trailing-"
    "7-day actives per day. Sliding-window DISTINCT cannot use the "
    "running-sum marker trick (elements expire), and a BETWEEN range "
    "join of days x activity is quadratic -- instead each (day, user) "
    "activity row EXPANDS to the 7 future days it covers (a bounded "
    "x7 fan-out of the day-user table, which is itself bounded by "
    "users x days, not events), then one distinct-count per day. The "
    "join with dau implicitly drops cover-days with no activity of "
    "their own. Day indices are exact integer epoch-day divisions.",
    tags=("stats", "engagement", "events", "sliding-distinct"),
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        F.expr("unix_micros(ts) div 86400000000").alias("day"), "user_id"
    ).distinct()
    dau = act.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    cover = act.select(
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day"), "user_id"
    )
    wau = cover.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            F.col("day").cast("long").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
        )
    )


@query(
    "stats_gini_inequality",
    """
    WITH uc AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1),
    ranked AS (
      SELECT n_events,
             CAST(row_number() OVER (ORDER BY n_events, user_id) AS BIGINT)
               AS rnk
      FROM uc),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_events) AS BIGINT) AS tot,
             CAST(sum(rnk * n_events) AS BIGINT) AS weighted
      FROM ranked)
    SELECT n AS n_users, tot AS n_events,
           round((2.0 * weighted) / (n * tot) - (n + 1.0) / n, 6) AS gini
    FROM s
    """,
    doc="Gini coefficient of per-user event volume -- the scalar "
    "inequality summary next to stats_pareto_concentration's banded "
    "view (0 = uniform engagement, 1 = one user generates everything). "
    "Uses the rank formulation G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n "
    "over the ascending-sorted user aggregate: every sum is an exact "
    "integer, so the statistic is IEEE-deterministic. The rank window "
    "runs over the user aggregate (domain-bounded); at extreme user "
    "counts the same sums come from a quantile-bucketed two-phase "
    "rank, identical formula.",
    tags=("stats", "gini", "inequality", "events"),
)
def stats_gini_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    uc = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    ranked = uc.select(
        "n_events",
        F.row_number().over(W.orderBy("n_events", "user_id")).cast("long").alias("rnk"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_events").alias("tot"),
        F.sum(F.col("rnk") * F.col("n_events")).alias("weighted"),
    )
    n, tot, weighted = F.col("n"), F.col("tot"), F.col("weighted")
    return s.select(
        n.alias("n_users"),
        tot.alias("n_events"),
        F.round((2.0 * weighted) / (n * tot) - (n + 1.0) / n, 6).alias("gini"),
    )


@query(
    "orders_cohort_ltv",
    """
    WITH fo AS (
      SELECT o_custkey,
             min((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1)
               AS cohort_m
      FROM orders GROUP BY 1),
    rev AS (
      SELECT f.cohort_m,
             (year(o.o_orderdate) - 1992) * 12 + month(o.o_orderdate) - 1
               - f.cohort_m AS months_since,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders o JOIN fo f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2),
    sizes AS (SELECT cohort_m, CAST(count(*) AS BIGINT) AS cohort_users
              FROM fo GROUP BY 1)
    SELECT CAST(r.cohort_m AS BIGINT) AS cohort_m,
           CAST(r.months_since AS BIGINT) AS months_since,
           s.cohort_users,
           CAST(sum(r.rev_cents) OVER (PARTITION BY r.cohort_m
               ORDER BY r.months_since) AS BIGINT) AS cum_rev_cents,
           round(CAST(sum(r.rev_cents) OVER (PARTITION BY r.cohort_m
               ORDER BY r.months_since) AS DOUBLE)
               / (100.0 * s.cohort_users), 2) AS ltv_per_user
    FROM rev r JOIN sizes s ON s.cohort_m = r.cohort_m
    WHERE r.months_since <= 12
    """,
    doc="Cohort lifetime-value curve: customers grouped by first-order "
    "month, cumulative revenue per cohort over months-since-first "
    "(capped at 12), normalized per cohort user -- the monetary dual "
    "of events_cohort_retention's count curve, and the readout LTV/CAC "
    "decisions hang on. Exact integer cents throughout; the cumulative "
    "window partitions by cohort over a bounded month axis. Two "
    "shuffles (first-order aggregate + cohort-month rollup) plus a "
    "domain-bounded window.",
    tags=("stats", "cohort", "ltv", "analytics"),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    m = (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1
    fo = orders.groupBy("o_custkey").agg(F.min(m).alias("cohort_m"))
    rev = (
        orders.join(fo, "o_custkey")
        .groupBy("cohort_m", (m - F.col("cohort_m")).alias("months_since"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents")
        )
    )
    sizes = fo.groupBy("cohort_m").agg(F.count(F.lit(1)).alias("cohort_users"))
    w = W.partitionBy("cohort_m").orderBy("months_since")
    cum = F.sum("rev_cents").over(w)
    return (
        rev.filter(F.col("months_since") <= 12)
        .join(sizes, "cohort_m")
        .select(
            F.col("cohort_m").cast("long").alias("cohort_m"),
            F.col("months_since").cast("long").alias("months_since"),
            "cohort_users",
            cum.cast("long").alias("cum_rev_cents"),
            F.round(cum.cast("double") / (100.0 * F.col("cohort_users")), 2).alias(
                "ltv_per_user"
            ),
        )
    )


@query(
    "events_interarrival_stats",
    """
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
                 PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
      FROM events),
    g AS (SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap_us, 0.5) / 1000000, 6) AS p50_s,
           round(quantile_cont(gap_us, 0.9) / 1000000, 6) AS p90_s,
           round(CAST(max(gap_us) AS DOUBLE) / 1000000, 6) AS max_s
    FROM g GROUP BY 1
    """,
    doc="Inter-arrival cadence profile per event type: p50/p90/max gap "
    "between consecutive events -- the freshness/SLA readout that "
    "tells a pipeline operator each stream's natural tick and its "
    "tail (a p90 collapse means a burst; a max blowup means an "
    "outage). Gaps are exact integer microseconds from one lag "
    "window; the exact percentiles run over the (gap, frequency) "
    "pre-aggregate, interpolation is IEEE-identical, and the /1e6 "
    "second conversions are fenced at 6 dp.",
    tags=("stats", "interarrival", "monitoring", "events"),
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    vc = gaps.groupBy("event_type", "gap_us").agg(F.count(F.lit(1)).alias("cnt"))
    return vc.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("n_gaps"),
        F.round(F.expr("percentile(gap_us, 0.5D, cnt)") / 1000000, 6).alias("p50_s"),
        F.round(F.expr("percentile(gap_us, 0.9D, cnt)") / 1000000, 6).alias("p90_s"),
        F.round(F.max("gap_us").cast("double") / 1000000, 6).alias("max_s"),
    )


@query(
    "stats_hhi_concentration",
    """
    WITH sup AS (
      SELECT n.n_regionkey AS region, l.l_suppkey AS supp,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY 1, 2),
    tot AS (SELECT region, CAST(sum(rev_cents) AS DOUBLE) AS t
            FROM sup GROUP BY 1)
    SELECT s.region,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(sum((s.rev_cents / t.t) * (s.rev_cents / t.t)) * 10000, 4)
             AS hhi
    FROM sup s JOIN tot t USING (region)
    GROUP BY 1
    """,
    doc="Herfindahl-Hirschman market-concentration index per region "
    "(supplier revenue shares squared, scaled to the conventional "
    "0-10000 range): the antitrust-style screen that complements the "
    "Gini/Pareto inequality views with a per-market grouping. Exact "
    "integer cents up to the share division; each share is a single "
    "IEEE division against the broadcast region total, and the "
    "squared-share sum is fenced at 4 dp. Supplier aggregate is "
    "domain-bounded; supplier join AQE-sized, nation broadcast.",
    tags=("stats", "hhi", "concentration", "analytics"),
)
def stats_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    # supplier scales with SF -- no forced broadcast (AQE decides)
    rev = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_regionkey").alias("region"), F.col("l_suppkey").alias("supp"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "rev_cents"
            )
        )
    )
    tot = rev.groupBy("region").agg(F.sum("rev_cents").cast("double").alias("t"))
    share = F.col("rev_cents") / F.col("t")
    return (
        rev.join(tot, "region")
        .groupBy("region")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(share * share) * 10000, 4).alias("hhi"),
        )
    )


@query(
    "stats_abc_classification",
    """
    WITH parts AS (
      SELECT l_partkey AS pk,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM lineitem GROUP BY 1),
    tot AS (SELECT CAST(sum(rev_cents) AS DOUBLE) AS t FROM parts),
    ranked AS (
      SELECT rev_cents,
             CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC, pk)
                  AS BIGINT) AS cum_cents
      FROM parts),
    classed AS (
      SELECT r.rev_cents,
             CASE WHEN (r.cum_cents - r.rev_cents) / t.t < 0.80 THEN 'A'
                  WHEN (r.cum_cents - r.rev_cents) / t.t < 0.95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked r CROSS JOIN tot t)
    SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(rev_cents) / t.t, 6) AS revenue_share
    FROM classed CROSS JOIN tot t
    GROUP BY abc, t.t
    """,
    doc="ABC inventory classification: parts ranked by revenue, classed "
    "A/B/C at the 80%/95% cumulative-share boundaries (a part's class "
    "comes from the share BEFORE it, so the first part is always A). "
    "The stock-policy segmentation dual of the Pareto bands. Exact "
    "integer cents through the running sum; the class boundary "
    "compares identical IEEE divisions in both engines. Rank window "
    "over the part aggregate -- domain-bounded.",
    tags=("stats", "abc", "inventory", "analytics"),
)
def stats_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    parts = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("rev_cents")
    )
    tot = parts.agg(F.sum("rev_cents").cast("double").alias("t"))
    w = W.orderBy(F.desc("rev_cents"), "pk")
    ranked = parts.select(
        "rev_cents", F.sum("rev_cents").over(w).cast("long").alias("cum_cents")
    )
    prior_share = (F.col("cum_cents") - F.col("rev_cents")) / F.col("t")
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "rev_cents",
        "t",
        F.when(prior_share < 0.80, "A")
        .when(prior_share < 0.95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return classed.groupBy("abc", "t").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("rev_cents") / F.col("t"), 6).alias("revenue_share"),
    ).select("abc", "n_parts", "revenue_share")


@query(
    "supplier_lead_time_percentiles",
    """
    WITH lt AS (
      SELECT l.l_suppkey AS supp,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS lead_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    vc AS (SELECT supp, lead_days, count(*) AS cnt FROM lt GROUP BY 1, 2),
    agg AS (
      SELECT supp, CAST(sum(cnt) AS BIGINT) AS n_lines
      FROM vc GROUP BY 1),
    pct AS (
      SELECT supp,
             round(quantile_cont(lead_days, 0.5), 4) AS p50_days,
             round(quantile_cont(lead_days, 0.9), 4) AS p90_days
      FROM lt GROUP BY 1)
    SELECT a.supp, a.n_lines, p.p50_days, p.p90_days
    FROM agg a JOIN pct p USING (supp)
    WHERE a.n_lines >= 20
    """,
    doc="Supplier lead-time SLA profile: p50/p90 days from order "
    "placement to line shipment per supplier (min 20 lines for a "
    "stable estimate) -- the vendor scorecard metric. Lead times are "
    "exact integer day differences; the Spark side feeds the exact "
    "percentile from the (value, frequency) pre-aggregate (bounded by "
    "the distinct day-count domain, the sf10-safe shape) while the "
    "oracle verifies against raw quantile_cont -- identical "
    "frequency-weighted semantics.",
    tags=("stats", "leadtime", "percentiles", "operations"),
)
def supplier_lead_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lt = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("l_suppkey").alias("supp"),
        F.datediff("l_shipdate", "o_orderdate").alias("lead_days"),
    )
    vc = lt.groupBy("supp", "lead_days").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        vc.groupBy("supp")
        .agg(
            F.sum("cnt").cast("long").alias("n_lines"),
            F.round(F.expr("percentile(lead_days, 0.5D, cnt)"), 4).alias("p50_days"),
            F.round(F.expr("percentile(lead_days, 0.9D, cnt)"), 4).alias("p90_days"),
        )
        .filter(F.col("n_lines") >= 20)
    )


@query(
    "events_error_rate_sli",
    """
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(count_if(event_type = 'error') AS BIGINT) AS n_err
      FROM events GROUP BY 1),
    win AS (
      SELECT day, n_total, n_err,
             CAST(sum(n_total) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS w_total,
             CAST(sum(n_err) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS w_err
      FROM daily)
    SELECT CAST(day AS BIGINT) AS day, n_total, n_err,
           round(CAST(n_err AS DOUBLE) / n_total, 6) AS daily_rate,
           round(CAST(w_err AS DOUBLE) / w_total, 6) AS rolling_7d_rate,
           CAST(CASE WHEN CAST(w_err AS DOUBLE) / w_total > 0.22
                THEN 1 ELSE 0 END AS BIGINT) AS slo_breach
    FROM win
    """,
    doc="Error-rate SLI with a rolling error budget: daily error share "
    "plus the trailing-7-day rate and an SLO breach flag -- the "
    "reliability readout a pipeline operator alarms on (daily rate is "
    "noisy; the rolling window IS the error budget). Integer event "
    "counts end-to-end; both rates are single IEEE divisions of "
    "identical integers, so the breach flag compares the same double "
    "in both engines. One groupBy bounded by days + one ordered window "
    "over the day spine.",
    tags=("stats", "sli", "reliability", "events"),
)
def events_error_rate_sli(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_if(F.col("event_type") == "error").alias("n_err"),
    )
    w = W.orderBy("day").rowsBetween(-6, 0)
    win = daily.select(
        "day",
        "n_total",
        "n_err",
        F.sum("n_total").over(w).cast("long").alias("w_total"),
        F.sum("n_err").over(w).cast("long").alias("w_err"),
    )
    rolling = F.col("w_err").cast("double") / F.col("w_total")
    return win.select(
        F.col("day").cast("long").alias("day"),
        "n_total",
        "n_err",
        F.round(F.col("n_err").cast("double") / F.col("n_total"), 6).alias("daily_rate"),
        F.round(rolling, 6).alias("rolling_7d_rate"),
        F.when(rolling > 0.22, 1).otherwise(0).cast("long").alias("slo_breach"),
    )


@query(
    "part_return_rate",
    """
    WITH j AS (
      SELECT p.p_brand AS brand,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(count_if(l.l_returnflag = 'R') AS BIGINT) AS n_returned
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1)
    SELECT brand, n_lines, n_returned,
           round(CAST(n_returned AS DOUBLE) / n_lines, 6) AS return_rate
    FROM j WHERE n_lines >= 50
    """,
    doc="Product-quality screen: return rate per brand (share of lines "
    "with returnflag R, min 50 lines for stability) -- the downstream "
    "metric a curation pipeline joins against when deciding which "
    "product feeds to trust. One dim join (AQE-sized, since part "
    "scales with SF) + one domain-bounded groupBy; integer counts, "
    "one IEEE division.",
    tags=("stats", "returns", "quality", "analytics"),
)
def part_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # no broadcast hint: part scales linearly with SF, so a forced hint
    # would bypass the size-based guard and OOM at large SFs -- AQE
    # broadcasts it whenever it actually fits under the threshold
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
        )
    )
    return j.filter(F.col("n_lines") >= 50).select(
        "brand",
        "n_lines",
        "n_returned",
        F.round(F.col("n_returned").cast("double") / F.col("n_lines"), 6).alias(
            "return_rate"
        ),
    )


@query(
    "events_hourly_profile",
    """
    WITH h AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    tot AS (SELECT event_type, CAST(sum(n) AS DOUBLE) AS t
            FROM h GROUP BY 1)
    SELECT h.event_type, h.hod, h.n,
           round(h.n / t.t, 6) AS share,
           round((h.n / t.t) * 24, 4) AS activity_index
    FROM h JOIN tot t USING (event_type)
    """,
    doc="Hour-of-day activity profile per event type: share of events "
    "per hour plus an activity index (1.0 = uniform; peaks and dead "
    "zones drive batch-window placement and autoscaling schedules). "
    "hour() on the normalized UTC timestamp is identical in both "
    "engines; counts are exact, shares single divisions. Two "
    "domain-bounded aggregates.",
    tags=("stats", "seasonality", "events", "profiling"),
)
def events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hod")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = h.groupBy("event_type").agg(F.sum("n").cast("double").alias("t"))
    share = F.col("n") / F.col("t")
    return h.join(tot, "event_type").select(
        "event_type",
        "hod",
        "n",
        F.round(share, 6).alias("share"),
        F.round(share * 24, 4).alias("activity_index"),
    )


@query(
    "stats_psi_category_drift",
    """
    WITH mo AS (
      SELECT (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS m,
             o_orderpriority AS p, CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2),
    mt AS (SELECT m, CAST(sum(n) AS DOUBLE) AS t FROM mo GROUP BY 1),
    base AS (SELECT p, CAST(sum(n) AS DOUBLE) AS b FROM mo GROUP BY 1),
    bt AS (SELECT CAST(sum(b) AS DOUBLE) AS bt FROM base),
    terms AS (
      SELECT mo.m,
             round((mo.n / mt.t - base.b / bt.bt)
                   * round(ln((mo.n / mt.t) / (base.b / bt.bt)), 9), 9)
               AS term
      FROM mo JOIN mt USING (m)
              JOIN base USING (p) CROSS JOIN bt)
    SELECT CAST(m AS BIGINT) AS m, round(sum(term), 6) AS psi,
           CAST(CASE WHEN sum(term) > 0.1 THEN 1 ELSE 0 END AS BIGINT)
             AS drift_flag
    FROM terms GROUP BY 1
    """,
    doc="Population stability index per month for the order-priority "
    "mix: PSI = sum((p_month - p_base) * ln(p_month / p_base)) against "
    "the all-time baseline, flag at the conventional 0.1 threshold -- "
    "the categorical-drift monitor every ML feature pipeline runs on "
    "its inputs. Shares are exact-count divisions; ln is fenced at "
    "9 dp and each term at 9 dp before the per-month sum (5 terms), "
    "so the 0.1 flag compares engine-identical values. All aggregates "
    "are month x category bounded.",
    tags=("stats", "psi", "drift", "monitoring"),
)
def stats_psi_category_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1).alias("m")
    # the month x priority aggregate (~months*5 rows) feeds THREE
    # consumers; checkpoint it so the fact scan runs once, not per
    # consumer (Catalyst shares no subplans across them)
    mo = (
        orders.groupBy(m, F.col("o_orderpriority").alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    mt = mo.groupBy("m").agg(F.sum("n").cast("double").alias("t"))
    base = mo.groupBy("p").agg(F.sum("n").cast("double").alias("b"))
    bt = base.agg(F.sum("b").cast("double").alias("bt"))
    pm = F.col("n") / F.col("t")
    pb = F.col("b") / F.col("bt")
    term = F.round((pm - pb) * F.round(F.log(pm / pb), 9), 9)
    terms = (
        mo.join(mt, "m")
        .join(F.broadcast(base), "p")
        .crossJoin(F.broadcast(bt))
        .select("m", term.alias("term"))
    )
    return terms.groupBy("m").agg(
        F.round(F.sum("term"), 6).alias("psi"),
        F.when(F.sum("term") > 0.1, 1).otherwise(0).cast("long").alias("drift_flag"),
    ).select(F.col("m").cast("long").alias("m"), "psi", "drift_flag")


@query(
    "stats_revenue_yoy_growth",
    """
    WITH yearly AS (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2),
    l AS (
      SELECT nation, yr, rev_cents,
             lag(rev_cents) OVER (PARTITION BY nation ORDER BY yr)
               AS prev_cents
      FROM yearly)
    SELECT nation, CAST(yr AS BIGINT) AS yr, rev_cents,
           round(100.0 * (rev_cents - prev_cents) / prev_cents, 4)
             AS yoy_pct
    FROM l WHERE prev_cents IS NOT NULL
    """,
    doc="Year-over-year revenue growth per customer nation: the "
    "comparison-window reporting shape (lag over the bounded "
    "nation x year grid after the dim joins; customer is AQE-sized, "
    "nation broadcast). "
    "Exact integer cents; the growth percentage is one IEEE division "
    "fenced at 4 dp. First year per nation is excluded (no prior).",
    tags=("stats", "yoy", "growth", "analytics"),
)
def stats_revenue_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    # customer scales with SF -- no forced broadcast (AQE decides);
    # nation is a fixed 25-row dim, safe to hint at any scale
    yearly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents")
        )
    )
    w = W.partitionBy("nation").orderBy("yr")
    l = yearly.withColumn("prev_cents", F.lag("rev_cents").over(w))
    return l.filter(F.col("prev_cents").isNotNull()).select(
        "nation",
        F.col("yr").cast("long").alias("yr"),
        "rev_cents",
        F.round(
            100.0 * (F.col("rev_cents") - F.col("prev_cents")) / F.col("prev_cents"), 4
        ).alias("yoy_pct"),
    )
