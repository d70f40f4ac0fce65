"""Multimodal-column queries (binary payload plumbing + metadata).

The decode path itself is a Python mapInPandas stage (stubbed decode
kernels -- no codecs in the container), but its *outputs* here are
deterministic functions of payload length, so the pipeline is fully
oracle-checkable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (
    as_media_table,
    extract_media_metadata,
    resize_thumbnails,
    sample_frames,
)
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


@query(
    "multimodal_frame_sample",
    """
    WITH vids AS (
      SELECT doc_id, text,
             octet_length(encode(text)) % 30 + 1 AS n_frames
      FROM documents WHERE doc_id % 3 = 2)
    SELECT doc_id,
           CAST(i AS BIGINT) AS frame_idx,
           md5(text || '#' || i::VARCHAR) AS frame_hash
    FROM vids, UNNEST(range(0, n_frames, 5)) r(i)
    """,
    doc="Frame sampling: video rows fan out 1->N inside mapInPandas "
    "(UDTF-shaped decode; operators/multimodal.py sample_frames). "
    "Non-video payloads are filtered before the Python stage so they "
    "never cross the Arrow boundary. Stub kernel = deterministic "
    "payload-derived frame count + md5 frame ids; a real ffmpeg "
    "kernel drops in without touching the plumbing.",
    tags=("multimodal", "mapInPandas", "fanout"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(as_media_table(docs, "doc_id", "text"), step=5)


@query(
    "multimodal_resize",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_in,
           CAST(64 AS BIGINT) AS thumb_w,
           CAST(64 AS BIGINT) AS thumb_h,
           md5(substr(text, 1, 256)) AS thumb_hash
    FROM documents WHERE doc_id % 3 = 0
    """,
    doc="Resize/thumbnail stage: payload-transforming kernel over Arrow "
    "batches (operators/multimodal.py resize_thumbnails), image rows "
    "only, filtered before the Python stage. The stub thumbnail is a "
    "deterministic prefix of the payload, md5-checked -- proving the "
    "transform byte-for-byte so a real PIL/opencv resize can drop in.",
    tags=("multimodal", "mapInPandas"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return resize_thumbnails(as_media_table(docs, "doc_id", "text"), w=64, h=64)
