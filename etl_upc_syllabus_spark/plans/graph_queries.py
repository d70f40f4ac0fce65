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
