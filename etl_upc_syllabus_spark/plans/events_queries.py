"""Event-analytics queries: sessionization, funnels, cohort retention.

Batch product-analytics surface over the events table (the streaming
forms live in streaming_queries; reference scope: none -- this is the
large-scale-pipeline extension). All three are pure JVM-side
DataFrame ops; timestamps cross the engine boundary as exact
``unix_micros`` / ``epoch_us`` bigints (the registry ground rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sessions import funnel_reached, session_stats, sessionize
from ..sources.tables import load_table
from .registry import query

_GAP_US = 4 * 3600 * 1_000_000  # 4h inactivity ends a session


@query(
    "events_sessionize",
    f"""
    WITH b AS (SELECT user_id, event_id, value, ts, epoch_us(ts) AS ts_us,
                      CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_GAP_US}
                             OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS newb
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    t AS (SELECT *, sum(newb) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
          FROM b)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           max(ts_us) - min(ts_us) AS duration_us,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM t GROUP BY 1, 2
    """,
    doc="Gap-rule sessionization (operators/sessions.py): a 4h inactivity "
    "gap starts a new per-user session; lag-flag + running-sum counter "
    "inside ONE user-keyed window pass, then a per-session rollup. At "
    "100 TB the cost is the single user-key exchange every per-user "
    "analysis pays -- no global sort, no self-join. The streaming twin "
    "(session_window watermark state) is stream_sessionization.",
    tags=("events", "window", "sessionize"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session_stats(sessionize(ev, gap_us=_GAP_US))


@query(
    "events_funnel_conversion",
    """
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events),
    v AS (SELECT user_id, min(t_us) AS view_us FROM e
          WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(t_us) AS click_us FROM e JOIN v USING (user_id)
          WHERE event_type = 'click' AND t_us > view_us GROUP BY 1),
    p AS (SELECT e.user_id, min(t_us) AS purchase_us FROM e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND t_us > click_us GROUP BY 1)
    SELECT v.user_id, view_us,
           coalesce(click_us, -1)    AS click_us,
           coalesce(purchase_us, -1) AS purchase_us
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
    doc="Ordered funnel (view -> click -> purchase): stage k counts only "
    "events strictly after the user's stage k-1 attainment. One "
    "conditional-min agg + user-key equi-join per stage over a "
    "shrinking user set (operators/sessions.py funnel_reached) -- no "
    "window over the raw stream, no self-cross-join.",
    tags=("events", "funnel"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return funnel_reached(ev, stages=("view", "click", "purchase"))


@query(
    "events_cohort_retention",
    """
    WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
               FROM events GROUP BY 1),
    a AS (SELECT e.user_id, f.cw, date_trunc('week', e.ts) AS wk
          FROM events e JOIN f USING (user_id))
    SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cw, wk) / 7 AS BIGINT) AS week_offset,
           count(DISTINCT user_id) AS n_users
    FROM a GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: users bucketed by first-seen ISO week, "
    "counted distinct in each subsequent active week. Two aggregations "
    "joined on the user key; the first-seen dim is tiny relative to "
    "events, so at scale it broadcasts and the events table shuffles "
    "once (the final distinct-count exchange).",
    tags=("events", "cohort", "retention"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cw"))
    active = ev.join(first, "user_id").select(
        "user_id", "cw", F.date_trunc("week", "ts").alias("wk")
    )
    return active.groupBy(
        F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
        (F.datediff("wk", "cw") / 7).cast("long").alias("week_offset"),
    ).agg(F.countDistinct("user_id").alias("n_users"))


_DEBOUNCE_GAP_US = 2 * 3600 * 1_000_000  # 2h


@query(
    "events_debounce",
    f"""
    WITH RECURSIVE ord AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    deb AS (
      SELECT user_id, event_id, t, rn, t AS last_kept, TRUE AS kept
      FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.event_id, o.t, o.rn,
             CASE WHEN o.t - d.last_kept > {_DEBOUNCE_GAP_US}
                  THEN o.t ELSE d.last_kept END,
             o.t - d.last_kept > {_DEBOUNCE_GAP_US}
      FROM ord o JOIN deb d ON o.user_id = d.user_id AND o.rn = d.rn + 1)
    SELECT user_id, event_id, t AS ts_us FROM deb WHERE kept
    """,
    doc="True per-user debounce (keep only events > 2h after the last "
    "KEPT event): a sequential recurrence over each user's timeline "
    "that no window function expresses -- kept-ness depends on the "
    "previous survivor, not the previous event. One user-key hash "
    "repartition + in-partition sort (user, ts, event_id -- NULLS "
    "LAST, the pandas/oracle tie-break), then a single mapInPandas "
    "scan whose recurrence state carries across Arrow batches (r16: "
    "one Python call per batch instead of per key, 5.6x); the oracle "
    "replays the identical recurrence as a DuckDB recursive CTE "
    "(operators/sessions.py debounce). The per-key-sequential batch "
    "twin of applyInPandasWithState.",
    tags=("events", "debounce", "mapInPandas", "stateful"),
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessions import debounce

    ev = load_table(spark, sf_dir, "events")
    return debounce(ev, gap_us=_DEBOUNCE_GAP_US)


@query(
    "timeseries_gap_fill",
    """
    WITH f AS (SELECT CAST(o_orderdate AS DATE) AS d, o_totalprice FROM orders
               WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 350000),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM f),
    allspine AS (SELECT CAST(gs.g AS DATE) AS d
                 FROM generate_series(DATE '1992-01-01', DATE '2003-12-31',
                                      INTERVAL 1 DAY) gs(g)),
    spine AS (SELECT d FROM allspine, bounds WHERE d BETWEEN lo AND hi),
    daily AS (SELECT d, CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS rev,
                     count(*) AS n
              FROM f GROUP BY 1),
    j AS (SELECT s.d, daily.rev, coalesce(daily.n, 0) AS n_orders
          FROM spine s LEFT JOIN daily USING (d))
    SELECT strftime(d, '%Y-%m-%d') AS day,
           coalesce(rev, 0.0) AS revenue,
           n_orders,
           CAST(CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS BIGINT) AS gap_filled,
           coalesce(last_value(rev IGNORE NULLS)
                    OVER (ORDER BY d ROWS UNBOUNDED PRECEDING), 0.0) AS ff_revenue
    FROM j
    """,
    doc="Time-series gap filling: a calendar spine (sequence of every "
    "day between the sparse series' bounds) left-joins the daily "
    "aggregate, zero-fills missing days, and forward-fills the last "
    "seen value with last(ignorenulls). The sequential window runs over "
    "the AGGREGATED day spine (|days| rows, broadcast-scalar bounds), "
    "never the fact table -- the fact pays one groupBy(day) exchange "
    "regardless of scale. The classic warehouse densification step "
    "before any rolling-window feature.",
    tags=("timeseries", "gapfill", "window"),
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 350000)
    ).select(F.to_date("o_orderdate").alias("d"), "o_totalprice")
    daily = f.groupBy("d").agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("rev"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    bounds = f.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    j = spine.join(daily, "d", "left")
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return j.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce("rev", F.lit(0.0)).alias("revenue"),
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
        F.when(F.col("rev").isNull(), 1).otherwise(0).cast("long").alias("gap_filled"),
        F.coalesce(F.last("rev", ignorenulls=True).over(w), F.lit(0.0)).alias("ff_revenue"),
    )


@query(
    "events_rfm_segmentation",
    """
    WITH maxts AS (SELECT max(epoch_us(ts)) AS now_us FROM events
                   WHERE event_type = 'purchase'),
    rfm AS (
      SELECT user_id,
             CAST((m.now_us - max(epoch_us(ts))) // 86400000000 AS BIGINT) AS recency_days,
             count(*) AS frequency,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS monetary
      FROM events, maxts m
      WHERE event_type = 'purchase'
      GROUP BY user_id, m.now_us)
    SELECT user_id, recency_days, frequency, monetary,
           CASE WHEN recency_days <= 3 AND frequency >= 15 THEN 'champion'
                WHEN recency_days <= 7 THEN 'active'
                WHEN frequency >= 10 THEN 'loyal_lapsing'
                ELSE 'at_risk' END AS segment
    FROM rfm
    """,
    doc="RFM segmentation (recency / frequency / monetary per customer "
    "with fixed deterministic band thresholds): one filtered aggregate "
    "over purchases plus the broadcast-scalar corpus max-timestamp -- "
    "the classic entity-scoring shape; the purchase filter pushes to "
    "the scan, and the events table shuffles once on the user key.",
    tags=("events", "rfm", "segmentation"),
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("t_us"), "value"
    )
    now = purchases.agg(F.max("t_us").alias("now_us"))
    rfm = (
        purchases.crossJoin(F.broadcast(now))
        .groupBy("user_id", "now_us")
        .agg(
            F.max("t_us").alias("last_us"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("monetary"),
        )
        .select(
            "user_id",
            F.expr("(now_us - last_us) div 86400000000").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    seg = (
        F.when((F.col("recency_days") <= 3) & (F.col("frequency") >= 15), "champion")
        .when(F.col("recency_days") <= 7, "active")
        .when(F.col("frequency") >= 10, "loyal_lapsing")
        .otherwise("at_risk")
    )
    return rfm.select("user_id", "recency_days", "frequency", "monetary", seg.alias("segment"))


@query(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events),
    pairs AS (SELECT from_type, to_type, count(*) AS n
              FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
    totals AS (SELECT from_type, sum(n) AS n_from FROM pairs GROUP BY 1)
    SELECT p.from_type, p.to_type, p.n,
           CAST(p.n * 1000000 // t.n_from AS BIGINT) AS prob_ppm
    FROM pairs p JOIN totals t USING (from_type)
    """,
    doc="Behavioral Markov transition matrix: per-user event bigrams "
    "(lead over the user-keyed timeline -- the same single exchange "
    "sessionization pays), counted into a |types|^2 matrix with "
    "integer-exact ppm transition probabilities (n * 1e6 div n_from, "
    "no float). The sequence-model foundation for next-event "
    "prediction and anomalous-flow detection.",
    tags=("events", "markov", "sequence"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    pairs = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr("n * 1000000 div n_from").cast("long").alias("prob_ppm"),
    )
