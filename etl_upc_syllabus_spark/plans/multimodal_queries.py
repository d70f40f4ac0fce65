"""Multimodal-column queries (binary payload plumbing + metadata).

The decode path itself is a Python mapInPandas stage (stubbed decode
kernels -- no codecs in the container), but its *outputs* here are
deterministic functions of payload length, so the pipeline is fully
oracle-checkable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import as_media_table, extract_media_metadata
from ..sources.tables import load_table
from .registry import query


@query(
    "multimodal_media_meta",
    """
    WITH media AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             encode(text) AS payload
      FROM documents)
    SELECT doc_id, media_type,
           CAST(octet_length(payload) AS BIGINT) AS n_bytes,
           CASE WHEN media_type = 'image' THEN octet_length(payload) % 640 ELSE 0 END
             + CASE WHEN media_type = 'video' THEN octet_length(payload) % 640 ELSE 0 END AS width,
           CASE WHEN media_type = 'image' THEN (octet_length(payload) * 7) % 480 ELSE 0 END
             + CASE WHEN media_type = 'video' THEN (octet_length(payload) * 7) % 480 ELSE 0 END AS height,
           CASE media_type WHEN 'image' THEN 1
                           ELSE octet_length(payload) % 30 + 1 END AS n_frames
    FROM media
    """,
    doc="Binary media column -> mapInPandas decode stage -> typed metadata "
    "struct. Decode kernels are stubbed (no codecs in container) with "
    "deterministic length-derived features, so the full distributed "
    "pipeline -- binary column, Arrow batches, per-type dispatch, "
    "error-degradation for the unimplemented video decoder -- is "
    "oracle-checked.",
    tags=("multimodal", "binary", "mapInPandas"),
)
def multimodal_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_media_metadata(as_media_table(docs, "doc_id", "text"))
