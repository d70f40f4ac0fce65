"""Multimodal-column queries (binary payload plumbing + REAL decode).

Image and audio payloads are genuine PNG/BMP/WAV files encoded
executor-side from deterministic doc_id-derived dimensions and ASCII-
range pixel bytes (operators/media_codecs.py). The Spark query DECODES
those containers (zlib inflate, PNG filter reversal, CRC verify, RIFF
chunk walk); the DuckDB oracle reconstructs the expected width/height
and the md5 of the raw pixel bytes directly from the generation
formula with chr()/string_agg() -- so a kernel that faked the decode
(e.g. derived dimensions from payload length) would hash-mismatch.
Video remains the one honest stub (no stdlib video codec in the
container): length-derived degraded features, mirrored in the oracle.
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
    WITH docs AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             text
      FROM documents),
    idx AS (SELECT range AS i FROM range(300)),
    img AS (
      SELECT d.doc_id,
             md5(string_agg(chr(CAST((d.doc_id + r.i) % 95 + 32 AS INT)), '' ORDER BY r.i)) AS content_hash
      FROM docs d JOIN idx r ON r.i < (d.doc_id % 13 + 4) * (d.doc_id % 11 + 4)
      WHERE d.media_type = 'image'
      GROUP BY d.doc_id),
    aud AS (
      SELECT d.doc_id,
             md5(string_agg(chr(CAST((d.doc_id * 3 + r.i) % 95 + 32 AS INT)), '' ORDER BY r.i)) AS content_hash
      FROM docs d JOIN idx r ON r.i < d.doc_id % 97 + 16
      WHERE d.media_type = 'audio'
      GROUP BY d.doc_id)
    SELECT d.doc_id, d.media_type,
           CAST(CASE d.media_type
             WHEN 'image' THEN d.doc_id % 13 + 4
             WHEN 'video' THEN octet_length(encode(d.text)) % 640
             ELSE 0 END AS BIGINT) AS width,
           CAST(CASE d.media_type
             WHEN 'image' THEN d.doc_id % 11 + 4
             WHEN 'video' THEN (octet_length(encode(d.text)) * 7) % 480
             ELSE 0 END AS BIGINT) AS height,
           CAST(CASE d.media_type
             WHEN 'image' THEN 1
             WHEN 'audio' THEN d.doc_id % 97 + 16
             ELSE octet_length(encode(d.text)) % 30 + 1 END AS BIGINT) AS n_frames,
           CASE d.media_type
             WHEN 'image' THEN i.content_hash
             WHEN 'audio' THEN a.content_hash
             ELSE md5(d.text) END AS content_hash
    FROM docs d
    LEFT JOIN img i USING (doc_id)
    LEFT JOIN aud a USING (doc_id)
    """,
    doc="Binary media column -> mapInPandas decode stage -> typed metadata. "
    "The decode is REAL for image/audio: payloads are genuine PNG/BMP/WAV "
    "files and the kernel sniffs magic bytes, walks chunks, verifies "
    "CRCs, inflates, reverses PNG scanline filters, and md5s the raw "
    "pixel/PCM bytes. The oracle reconstructs width/height/pixel-md5 "
    "from the deterministic generation formula, so only a true decode "
    "matches. Video (no stdlib codec) degrades to length-derived "
    "features, mirrored in the oracle.",
    tags=("multimodal", "binary", "mapInPandas", "codec"),
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
    WITH img AS (
      SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 11 + 4 AS h
      FROM documents WHERE doc_id % 3 = 0),
    t AS (SELECT range AS i FROM range(256))
    SELECT i.doc_id,
           CAST(i.w AS BIGINT) AS src_w,
           CAST(i.h AS BIGINT) AS src_h,
           CAST(16 AS BIGINT) AS thumb_w,
           CAST(16 AS BIGINT) AS thumb_h,
           md5(string_agg(
             chr(CAST((i.doc_id
                       + (((t.i // 16) * i.h) // 16) * i.w
                       + (((t.i % 16) * i.w) // 16)) % 95 + 32 AS INT)),
             '' ORDER BY t.i)) AS thumb_hash
    FROM img i CROSS JOIN t
    GROUP BY i.doc_id, i.w, i.h
    """,
    doc="Resize/thumbnail stage: REAL decode (PNG or BMP) + nearest-"
    "neighbor resample to 16x16 over Arrow batches (operators/"
    "multimodal.py resize_thumbnails), image rows only, filtered "
    "before the Python stage. The oracle recomputes the exact "
    "resampled pixel bytes from the generation formula and md5s them "
    "-- byte-for-byte proof of decode + resample.",
    tags=("multimodal", "mapInPandas", "codec"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return resize_thumbnails(as_media_table(docs, "doc_id", "text"), w=16, h=16)
