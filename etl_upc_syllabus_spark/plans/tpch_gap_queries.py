"""TPC-H query shapes q2/q7/q8/q9/q11/q12/q14/q15/q16/q20/q21.

Completes the 22-shape TPC-H suite (the other 11 shapes live in
relational.py). The reference has no joins at all (SURVEY.md section
2.3 -- reference etl_pipeline.py implements a single-entity pipeline),
so this whole battery is engine surface the reference lacks; it is the
canonical proof that every classical join/subquery/agg plan shape runs
on this engine.

The driver fixtures are TPC-H-ish, not TPC-H: there is no ``partsupp``
table and lineitem lacks shipmode/commitdate/receiptdate. Where the
official query needs a missing column, the query here keeps the PLAN
SHAPE (the thing the optimizer and the 100 TB story care about) and
substitutes a semantically-equivalent predicate on existing columns;
each docstring states the substitution.

Parity rules follow relational.py: money sums over DECIMAL(12,2)
casts (exact, order-independent, identical in Spark and DuckDB), cast
to DOUBLE only at output; derived ints cast to BIGINT; dates formatted
to strings; decimal (never double) equality for having/threshold
comparisons.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(col: str | Column) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return col.cast("decimal(12,2)")


def _rev() -> Column:
    """extendedprice * (1 - discount), exact decimal."""
    return _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))


@query(
    "q2_min_cost_supplier",
    """
    WITH supply AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY 1, 2),
    eu AS (
        SELECT sp.l_partkey, sp.unit_cost, s.s_name, s.s_acctbal, n.n_name
        FROM supply sp
        JOIN supplier s ON sp.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'),
    cheapest AS (SELECT l_partkey, min(unit_cost) AS min_cost FROM eu GROUP BY 1)
    SELECT p.p_partkey, p.p_name, e.s_name, e.n_name, e.s_acctbal,
           e.unit_cost
    FROM eu e
    JOIN cheapest m ON e.l_partkey = m.l_partkey AND e.unit_cost = m.min_cost
    JOIN part p ON e.l_partkey = p.p_partkey
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'LARGE'
    ORDER BY e.s_acctbal DESC, e.s_name, p.p_partkey LIMIT 100
    """,
    doc="TPC-H Q2 shape: per-group minimum joined back (correlated scalar "
    "subquery, decorrelated) under a dim-chain region filter, then "
    "top-100. No partsupp fixture, so the supply relation is derived "
    "from lineitem (unit_cost = min extendedprice/quantity per "
    "part+supplier -- IEEE division, bit-identical across engines). "
    "Scale: supply agg shuffles on (partkey, suppkey); the min-per-part "
    "re-agg reuses the partkey hash; nation/region broadcast; the "
    "filtered part side broadcasts into the final join; "
    "TakeOrderedAndProject caps the output without a global sort.",
    tags=("join", "subquery", "topk"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(F.min(unit).alias("unit_cost"))
    nr = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu = supply.join(sup, supply.l_suppkey == sup.s_suppkey).select(
        "l_partkey", "unit_cost", "s_name", "s_acctbal", "n_name"
    )
    cheapest = eu.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    return (
        eu.join(cheapest, ["l_partkey"])
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(p), eu.l_partkey == p.p_partkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q7_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: six-way join with a symmetric two-nation "
    "disjunction, grouped by nation pair and year. The per-side "
    "implication of the OR (each nation column IN the pair) is applied "
    "before the join, so both dimension paths shrink first; nation "
    "broadcasts, the lineitem-orders and orders-customer joins shuffle "
    "on their natural keys. Grouping keys have tiny cardinality "
    "(2 pairs x years) so the final shuffle is negligible at any scale.",
    tags=("join", "agg", "disjunction"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ("NATION_1", "NATION_2")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    """
    WITH vol AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n2.n_regionkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01')
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume
                         ELSE CAST(0.00 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: eight-way snowflake join, then a conditional-"
    "aggregate ratio (one nation's volume over all volume) per year. "
    "Substitution: p_type = 'PROMO' for the official 'ECONOMY ANODIZED "
    "STEEL' (fixture types are single words). Both sums are exact "
    "decimals, cast to double only for the final division, so the "
    "share is bit-stable across engines. Scale: the customer-side "
    "region filter and the part filter shrink both fact inputs before "
    "the shuffling joins; conditional agg needs no extra pass.",
    tags=("join", "agg", "conditional"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nr = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cnk"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nr), F.col("c_nationkey") == F.col("cnk"))
        .select("c_custkey")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(_t(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit("0.00").cast("decimal(12,2)")
    nation_vol = F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(zero)
    return vol.groupBy("o_year").agg(
        (F.sum(nation_vol).cast("double") / F.sum("volume").cast("double")).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                    - CAST(p.p_retailprice AS DECIMAL(12,2))
                      * CAST(l.l_quantity AS DECIMAL(12,2))
                      * CAST(0.1 AS DECIMAL(2,1))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape: five-way join with a LIKE filter on part name "
    "and a profit expression spanning three tables, grouped by supplier "
    "nation and order year. Substitution: no partsupp.ps_supplycost "
    "fixture, so cost = 0.1 * p_retailprice * quantity -- still exact "
    "decimal arithmetic end-to-end, summed before a single double cast. "
    "Scale: the part LIKE filter broadcasts; lineitem-orders shuffles "
    "once on orderkey; group keys (nation x year) are tiny.",
    tags=("join", "agg", "expression"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(_t(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    profit = _rev() - _dec("p_retailprice") * _dec("l_quantity") * F.lit("0.1").cast(
        "decimal(2,1)"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@query(
    "q11_important_parts",
    """
    WITH val AS (
        SELECT l.l_partkey,
               sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS value_dec
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_1', 'NATION_6')
        GROUP BY 1),
    total AS (SELECT sum(value_dec) AS total_dec FROM val)
    SELECT v.l_partkey AS partkey, CAST(v.value_dec AS DOUBLE) AS value
    FROM val v, total t
    WHERE v.value_dec > t.total_dec * CAST(0.001 AS DECIMAL(4,3))
    """,
    doc="TPC-H Q11 shape: grouped value per part restricted to one "
    "nation's suppliers, kept only where it exceeds a fraction of the "
    "global total (scalar subquery). Substitution: value = sum of "
    "extendedprice from lineitem (no partsupp availqty*supplycost). "
    "The global total is a 1-row exact-decimal aggregate broadcast as "
    "a cross join -- never collected to the driver -- and the "
    "threshold comparison stays in decimal so both engines agree at "
    "the boundary. Scale: one shuffle for the per-part agg; the total "
    "reuses its partials.",
    tags=("agg", "subquery", "having"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_1", "NATION_6"))
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("value_dec"))
    )
    total = val.agg(F.sum("value_dec").alias("total_dec"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("total_dec") * F.lit("0.001").cast("decimal(4,3)"))
        .select(F.col("l_partkey").alias("partkey"), F.col("value_dec").cast("double").alias("value"))
    )


@query(
    "q12_priority_shipping",
    """
    SELECT l.l_linestatus AS shipgroup,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_quantity BETWEEN 5 AND 45
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape: fact-fact join with all selective predicates on "
    "the lineitem side, then per-category conditional counts of order "
    "priorities. Substitution: l_linestatus stands in for the missing "
    "l_shipmode (same grouping role), the quantity band for the "
    "commit/receipt date sandwich. Scale: the filters push to the "
    "lineitem scan so the join moves only the qualifying year; "
    "conditional sums fold into one aggregate pass (no per-branch "
    "scans).",
    tags=("join", "agg", "conditional"),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(5, 45)
        & (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("l_linestatus").alias("shipgroup"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    """
    SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                         ELSE CAST(0.00 AS DECIMAL(12,2)) END) AS DOUBLE)
             AS promo_revenue,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS total_revenue,
           (100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                         ELSE CAST(0.00 AS DECIMAL(12,2)) END) AS DOUBLE))
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    doc="TPC-H Q14 shape: single-month join + conditional-revenue "
    "percentage. Both the promo and total sums are exact decimals; the "
    "percentage is computed as (100.0 * double) / double in the same "
    "association order in both engines, so even the derived float is "
    "reproducible. Scale: month filter pushes to the scan; part "
    "broadcasts; single-row result needs no shuffle beyond the "
    "aggregate partials.",
    tags=("join", "agg", "conditional"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit("0.00").cast("decimal(12,2)")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.sum(_rev()).cast("double").alias("total_revenue"),
        ((F.lit(100.0) * F.sum(promo).cast("double")) / F.sum(_rev()).cast("double")).alias(
            "promo_pct"
        ),
    )


@query(
    "q15_top_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_dec
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY 1),
    best AS (SELECT max(total_dec) AS max_dec FROM rev)
    SELECT s.s_suppkey, s.s_name, CAST(r.total_dec AS DOUBLE) AS total_revenue
    FROM rev r, best b
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_dec = b.max_dec
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape: revenue view per supplier over a quarter, then "
    "the supplier(s) achieving the global maximum (scalar subquery on "
    "the view itself). The max and the equality test stay in exact "
    "decimal -- a double re-sum could disagree between engines at the "
    "boundary and drop/add a winner. Scale: one shuffle for the "
    "per-supplier agg; max is a 1-row broadcast; supplier joins on the "
    "tiny qualifying set.",
    tags=("agg", "subquery", "join"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total_dec"))
    best = rev.agg(F.max("total_dec").alias("max_dec"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_dec") == F.col("max_dec"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_dec").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_cnt",
    """
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0.0)
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 shape: negated dim predicates + IN-list, an anti-join "
    "excluding a blacklist of suppliers, then count(DISTINCT suppkey) "
    "per (brand, type, size). Substitution: the 'customer complaints' "
    "comment scan becomes s_acctbal < 0 (fixtures have no comment "
    "column). Scale: the part filter broadcasts, the blacklist is a "
    "broadcast anti-join, and distinct-count expands to a two-phase "
    "aggregate -- all shuffle-parallel, no driver collection.",
    tags=("join", "anti", "distinct"),
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_excess_suppliers",
    """
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red %'),
    heavy AS (
        SELECT l_suppkey
        FROM lineitem l JOIN red ON l.l_partkey = red.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_partkey, l_suppkey
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2)))
                 > CAST(60.00 AS DECIMAL(12,2)))
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND s.s_suppkey IN (SELECT l_suppkey FROM heavy)
    ORDER BY s.s_name
    """,
    doc="TPC-H Q20 shape: nested semi-join chain -- parts by name prefix, "
    "per (part, supplier) shipped-quantity aggregate with a HAVING "
    "threshold (substituting for partsupp availqty), distinct "
    "qualifying suppliers semi-joined into a region-filtered supplier "
    "list. The HAVING compares exact decimals. Scale: the name-filtered "
    "part set broadcasts into lineitem; the agg shuffles on (partkey, "
    "suppkey); the final semi-join broadcasts the small qualifying-"
    "supplier set.",
    tags=("join", "semi", "having"),
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red %")).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    heavy = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > F.lit("60.00").cast("decimal(12,2)"))
        .select("l_suppkey")
    )
    nr = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(nr), s.s_nationkey == F.col("n_nationkey"))
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "q21_waiting_suppliers",
    """
    SELECT s.s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 25
    """,
    doc="TPC-H Q21 shape: the double-correlated EXISTS / NOT EXISTS self-"
    "join ('the only late supplier on a multi-supplier order'). "
    "Substitution: late = shipdate > orderdate + 60 days (no commit/"
    "receipt dates in the fixtures). Decorrelation: instead of two "
    "self-joins over lineitem, ONE per-order aggregate computes "
    "n_suppliers and n_late_suppliers (countDistinct with a "
    "conditional); late lineitems then join those order stats -- "
    "EXISTS ≡ n_suppliers >= 2, NOT-EXISTS ≡ n_late_suppliers = 1. "
    "Scale: lineitem shuffles once on orderkey for both the aggregate "
    "and the join-back (co-partitioned), versus three shuffles for the "
    "naive triple self-join; top-25 is TakeOrderedAndProject.",
    tags=("join", "semi", "anti", "subquery", "topk"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(o_f, li.l_orderkey == o_f.o_orderkey).withColumn(
        "is_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    stats = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lo.filter(F.col("is_late"))
        .join(stats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )
