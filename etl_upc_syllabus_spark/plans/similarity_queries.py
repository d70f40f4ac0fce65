"""Similarity-search queries over the embeddings table (ANN surface).

Cosine values are rounded to 6 decimals *before* ranking in both
engines, so rank order (and therefore the top-k cut) is identical even
though double summation order differs across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import similarity as sim
from ..sources.tables import load_table
from . import _fragments as fr
from .registry import query


@query(
    "similarity_topk_bruteforce",
    f"""
    WITH {fr.dims_cte()},
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM dims GROUP BY vec_id),
    dots AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, sum(q.x * c.x) AS dot
             FROM dims q JOIN dims c ON q.i = c.i
             WHERE q.vec_id < 10 AND q.vec_id != c.vec_id
             GROUP BY 1, 2),
    sims AS (SELECT query_id, cand_id,
                    round(dot / (nq.nrm * nc.nrm), 6) AS cosine
             FROM dots JOIN norms nq ON nq.vec_id = query_id
                       JOIN norms nc ON nc.vec_id = cand_id),
    ranked AS (SELECT *, CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS BIGINT) AS rank
               FROM sims)
    SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= 5
    """,
    doc="Exact top-5 cosine neighbors for 10 query vectors: broadcast the "
    "query set, scan the corpus once (zip_with/aggregate dot products, "
    "JVM-side). The exact baseline ANN answers are measured against.",
    tags=("similarity", "ann", "bruteforce"),
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk_bruteforce(emb, k=5)


@query(
    "similarity_topk_lsh",
    f"""
    WITH {fr.plane_weights_cte(64)},
    {fr.dims_cte()},
    proj AS (SELECT vec_id, p, sum(x * wt) AS dot
             FROM dims JOIN w USING (i) GROUP BY vec_id, p),
    sig AS (SELECT vec_id,
                   string_agg(CASE WHEN dot > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
            FROM proj GROUP BY vec_id),
    norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM dims GROUP BY vec_id),
    cand AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id
             FROM sig q JOIN sig c ON q.bucket = c.bucket
             WHERE q.vec_id < 50 AND q.vec_id != c.vec_id),
    dots AS (SELECT cand.query_id, cand.cand_id, sum(dq.x * dc.x) AS dot
             FROM cand JOIN dims dq ON dq.vec_id = cand.query_id
                       JOIN dims dc ON dc.vec_id = cand.cand_id AND dc.i = dq.i
             GROUP BY 1, 2),
    sims AS (SELECT query_id, cand_id, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
             FROM dots JOIN norms nq ON nq.vec_id = query_id
                       JOIN norms nc ON nc.vec_id = cand_id),
    ranked AS (SELECT *, CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS BIGINT) AS rank
               FROM sims)
    SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= 3
    """,
    doc="Random-hyperplane LSH ANN: 8 deterministic md5-derived planes "
    "bucket each vector into a 256-way signature; candidates are the "
    "query's bucket only (equi-join, no cross join). The 100 TB path -- "
    "recall tunable via planes/bands. Sign bits could in principle flip "
    "across engines when a projection is ~0 (|dot| < 1e-13); measure-zero "
    "for real embeddings.",
    tags=("similarity", "ann", "lsh"),
)
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk_lsh(emb, dim=64, k=3)
