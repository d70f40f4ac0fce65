"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata (SURVEY.md north star).

The container has no image/audio codecs, so the *decode kernels* are
stubbed behind ``NotImplementedError`` / a deterministic fake -- but
every piece of Spark-side plumbing is real and tested: the binary
column schema, the Arrow batch shape through ``mapInPandas``, the
partitioning contract, and the metadata struct.

At 100 TB: binary payloads ride in their own column so column pruning
skips them unless a decode stage needs them; decode runs as
``mapInPandas`` over row-group-sized Arrow batches (one Python worker
per core, payloads never pass through the driver).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width bigint, height bigint, n_frames bigint"
)


def as_media_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Model a corpus as a multimodal table: (id, media_type, payload binary).

    The fixtures carry no real media, so payload = utf-8 bytes of the
    text column and media_type is assigned deterministically -- the
    schema and partitioning behavior are what matters.
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def decode_image(payload: bytes) -> dict:
    """Real image decode requires a codec library (PIL/opencv) that is
    not in this container. STUB: deterministic fake dimensions derived
    from the payload length, so the distributed plumbing is testable.
    Swap this function for a real decoder in production."""
    n = len(payload)
    return {"width": n % 640, "height": (n * 7) % 480, "n_frames": 1}


def decode_audio(payload: bytes) -> dict:
    n = len(payload)
    return {"width": 0, "height": 0, "n_frames": n % 30 + 1}  # frames ~ samples


def decode_video(payload: bytes) -> dict:
    raise NotImplementedError(
        "video decode requires ffmpeg bindings not present in this container"
    )


_DECODERS = {"image": decode_image, "audio": decode_audio, "video": decode_video}


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_hash string"

THUMB_SCHEMA = "doc_id bigint, n_chars_in bigint, thumb_w bigint, thumb_h bigint, thumb_hash string"


def sample_frames(media: DataFrame, step: int = 5) -> DataFrame:
    """Frame-sampling stage: one output row per sampled frame (1->N
    fan-out inside mapInPandas -- the UDTF-shaped decode pattern).

    STUB kernel: n_frames is the deterministic fake from decode
    (payload_len % 30 + 1) and a 'frame' is identified by md5 of the
    payload text + frame index; a real ffmpeg kernel drops in without
    touching the Spark plumbing. Only video rows are decoded -- the
    filter happens BEFORE the Python stage so image/audio payloads
    never cross the Arrow boundary.
    """
    import hashlib

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                text = raw.decode("utf-8")
                n_frames = len(raw) % 30 + 1
                for i in range(0, n_frames, step):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(f"{text}#{i}".encode()).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_hash": hashes})

    videos = media.filter(F.col("media_type") == "video").select("doc_id", "payload")
    return videos.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


def resize_thumbnails(media: DataFrame, w: int = 64, h: int = 64) -> DataFrame:
    """Resize stage: payload-transforming kernel over Arrow batches.

    STUB kernel: the 'thumbnail' is the first w*h/16 characters of the
    payload text, hashed -- deterministic, so the transform is oracle-
    checkable byte-for-byte. A real PIL/opencv resize drops in without
    touching the batch plumbing. Image rows only, filtered before the
    Python stage.
    """
    import hashlib

    keep = (w * h) // 16

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = [bytes(p).decode("utf-8") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_chars_in": [len(t) for t in texts],
                    "thumb_w": w,
                    "thumb_h": h,
                    "thumb_hash": [
                        hashlib.md5(t[:keep].encode()).hexdigest() for t in texts
                    ],
                }
            )

    images = media.filter(F.col("media_type") == "image").select("doc_id", "payload")
    return images.mapInPandas(resize_batches, schema=THUMB_SCHEMA)


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """Decode/feature-extract stage: mapInPandas over Arrow batches.

    Real shape of a production decode stage: per-batch vectorized loop,
    errors per record (video -> NotImplementedError) degrade to
    length-derived fake features rather than failing the job (quarantine
    philosophy of reference etl_pipeline.py:17-30).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len),
            }
            feats = []
            for mt, payload in zip(pdf["media_type"], pdf["payload"]):
                try:
                    feats.append(_DECODERS[mt](bytes(payload)))
                except NotImplementedError:
                    n = len(payload)
                    feats.append({"width": n % 640, "height": (n * 7) % 480, "n_frames": n % 30 + 1})
            fdf = pd.DataFrame(feats)
            yield pd.DataFrame({**out, **{c: fdf[c] for c in ("width", "height", "n_frames")}})

    return media.mapInPandas(decode_batches, schema=MEDIA_META_SCHEMA)
