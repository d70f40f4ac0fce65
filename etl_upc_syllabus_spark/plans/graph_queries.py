"""Graph-analytics queries (iterative PageRank over a co-purchase
graph derived from the fact table). Oracle = unrolled-CTE replay of
the identical fixed-round trajectory, the same technique as
similarity_kmeans_lloyd and the connected-components recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import copurchase_edges, pagerank
from ..sources.tables import load_table
from .registry import query


def _pagerank_ctes(n_iter: int) -> str:
    """Unrolled PageRank CTEs over `edges`: p0 -> s1,p1 -> ... -> p{n}.

    Mirrors operators.graph.pagerank step for step: 1/deg contribution
    weights, 12-dp rounding of each round's contribution sum AND rank.
    """
    parts = [
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "w AS (SELECT e.src, e.dst, 1.0 / d.d AS wt FROM edges e JOIN deg d USING (src))",
        "p0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn)",
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f"s{t} AS (SELECT w.dst AS node, round(sum(p.pr * w.wt), 12) AS s "
            f"FROM w JOIN p{t - 1} p ON p.node = w.src GROUP BY 1)"
        )
        parts.append(
            f"p{t} AS (SELECT node, round(0.15 / nn.n + 0.85 * s, 12) AS pr FROM s{t}, nn)"
        )
    return ",\n    ".join(parts)


@query(
    "graph_pagerank_copurchase",
    f"""
    WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    edges AS (SELECT DISTINCT a.pk AS src, b.pk AS dst
              FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
    {_pagerank_ctes(3)}
    SELECT node AS part_key, round(pr, 9) AS pagerank FROM p3
    """,
    doc="Fixed-round PageRank (3 iterations, d=0.85) over the symmetric "
    "part co-purchase graph (parts sharing an order). Per round: ranks "
    "join the 1/deg-weighted edge list on src, contributions aggregate "
    "by dst -- two exchanges of (node, double) pairs, lineage truncated "
    "by localCheckpoint; at 100 TB the edge list is bucketed by src and "
    "only the rank vector moves. 12-dp rounding fences every "
    "summation-order divergence, so the DuckDB unrolled-CTE oracle "
    "replays the identical trajectory (operators/graph.py).",
    tags=("graph", "pagerank", "iterative"),
)
def graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pr = pagerank(copurchase_edges(li), n_iter=3)
    return pr.select(F.col("node").alias("part_key"), F.round("pr", 9).alias("pagerank"))


@query(
    "copurchase_affinity_topk",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    n_orders AS (SELECT count(DISTINCT ok) AS n FROM li),
    item AS (SELECT pk, count(*) AS n_item FROM li GROUP BY 1),
    pair AS (SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_both
             FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
             GROUP BY 1, 2)
    SELECT part_a, part_b, n_both,
           round(CAST(n_both * n.n AS DOUBLE) / (ia.n_item * ib.n_item), 6) AS lift
    FROM pair JOIN item ia ON ia.pk = part_a
              JOIN item ib ON ib.pk = part_b
              CROSS JOIN n_orders n
    ORDER BY n_both DESC, lift DESC, part_a, part_b
    LIMIT 20
    """,
    doc="Market-basket affinity: top-20 co-purchased part pairs by "
    "support with exact integer-ratio lift (n_both * N / (n_a * n_b), "
    "identical division operands in both engines). The pair expansion "
    "is the bounded within-order self-join (quadratic only in "
    "lines-per-order); per-item counts broadcast back onto the pair "
    "table and the global order count is the broadcast-scalar pattern. "
    "Top-k plans as TakeOrderedAndProject -- per-partition heaps, no "
    "global sort.",
    tags=("graph", "affinity", "topk"),
)
def copurchase_affinity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    n_orders = li.select(F.count_distinct("ok").alias("n"))
    item = li.groupBy("pk").agg(F.count(F.lit(1)).alias("n_item"))
    a, b = li.alias("a"), li.alias("b")
    pair = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ia = item.select(F.col("pk").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("pk").alias("part_b"), F.col("n_item").alias("n_b"))
    return (
        pair.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.round(
                (F.col("n_both") * F.col("n")).cast("double")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_both"), F.desc("lift"), "part_a", "part_b")
        .limit(20)
    )


@query(
    "graph_triangle_count",
    """
    WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    edges AS (SELECT DISTINCT a.pk AS src, b.pk AS dst
              FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
    und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM edges WHERE src <> dst),
    deg AS (SELECT node, count(*) AS d
            FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
            GROUP BY 1),
    o AS (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                      THEN a ELSE b END AS u,
                 CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                      THEN b ELSE a END AS v,
                 CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                      THEN db.d ELSE da.d END AS dv
          FROM und JOIN deg da ON da.node = a JOIN deg db ON db.node = b),
    wedges AS (SELECT x.u, x.v, y.v AS w
               FROM o x JOIN o y ON x.u = y.u
               WHERE x.dv < y.dv OR (x.dv = y.dv AND x.v < y.v)),
    tri AS (SELECT u, v, w FROM wedges wg
            WHERE EXISTS (SELECT 1 FROM o WHERE o.u = wg.v AND o.v = wg.w))
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (SELECT unnest([u, v, w]) AS node FROM tri)
    GROUP BY 1
    """,
    doc="Triangle counting over the part co-purchase graph via "
    "degree-ordered edge orientation: every triangle enumerates once "
    "from its lowest-(degree,id) vertex, bounding wedge fan-out at hub "
    "nodes by oriented out-degree (O(sqrt(|E|))) -- the formulation "
    "that survives skewed 100 TB graphs where the naive wedge join is "
    "quadratic in hub degree. Per-node triangle membership counts; "
    "three narrow (long,long) shuffles (operators/graph.py "
    "triangle_counts).",
    tags=("graph", "triangles", "clustering"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_und, triangle_counts

    # copurchase_und + canonical=True (r17): the a < b self-join emits
    # each unordered pair once, replacing the both-directions distinct
    # + re-canonicalization distinct with ONE distinct -- same edge
    # set, one exchange fewer (und build 2.31 s -> 1.40 s at sf0.1)
    li = load_table(spark, sf_dir, "lineitem")
    return triangle_counts(copurchase_und(li), canonical=True)


def _build_triangle_pipeline(spark: SparkSession, sf_dir: str):
    """(per-node counts, *caches) -- the live pre-checkpoint wedge
    pipeline (orientation join + wedge self-join + closing semi-join)
    for the plan-invariant tests: triangle_counts localCheckpoints its
    bounded result and releases the edge caches, so the registry fn's
    plan is a bare scan and the real shape is only inspectable here."""
    from ..operators.graph import _oriented, _tri_of, copurchase_und

    li = load_table(spark, sf_dir, "lineitem")
    und, _, o = _oriented(copurchase_und(li), canonical=True)
    return _tri_of(o), und, o


@query(
    "graph_clustering_coefficient",
    """
    WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    edges AS (SELECT DISTINCT a.pk AS src, b.pk AS dst
              FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
    und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM edges WHERE src <> dst),
    deg AS (SELECT node, count(*) AS d
            FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
            GROUP BY 1),
    o AS (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                      THEN a ELSE b END AS u,
                 CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                      THEN b ELSE a END AS v,
                 CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                      THEN db.d ELSE da.d END AS dv
          FROM und JOIN deg da ON da.node = a JOIN deg db ON db.node = b),
    wedges AS (SELECT x.u, x.v, y.v AS w
               FROM o x JOIN o y ON x.u = y.u
               WHERE x.dv < y.dv OR (x.dv = y.dv AND x.v < y.v)),
    tri AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
            FROM (SELECT unnest([u, v, w]) AS node
                  FROM wedges wg
                  WHERE EXISTS (SELECT 1 FROM o
                                WHERE o.u = wg.v AND o.v = wg.w))
            GROUP BY 1)
    SELECT dg.node, CAST(dg.d AS BIGINT) AS d,
           coalesce(t.n_triangles, 0) AS n_triangles,
           round(2.0 * coalesce(t.n_triangles, 0) / (dg.d * (dg.d - 1)), 6)
             AS cc
    FROM deg dg LEFT JOIN tri t ON t.node = dg.node
    WHERE dg.d >= 2
    """,
    doc="Local clustering coefficient per node: 2T/(d(d-1)) over the "
    "co-purchase graph, triangle-free nodes reporting 0 -- the "
    "community-structure readout on top of graph_triangle_count, "
    "sharing its persisted degree-ordered wedge pipeline "
    "(operators/graph.py clustering_coefficient). The LEFT join keeps "
    "the full deg>=2 node set; all arithmetic is exact-int ratios "
    "rounded at 6 dp.",
    tags=("graph", "triangles", "clustering"),
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import clustering_coefficient, copurchase_und

    # canonical und input: see graph_triangle_count (r17)
    li = load_table(spark, sf_dir, "lineitem")
    return clustering_coefficient(copurchase_und(li), canonical=True)
