"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata (SURVEY.md north star).

The decode kernels are REAL for all three modalities: payloads are
genuine PNG / BMP (image), WAV (audio) and animated GIF / uncompressed
AVI (video) files (stdlib codecs in :mod:`.media_codecs` -- zlib
inflate, PNG filter reversal, CRC verification, RIFF chunk walking,
GIF LZW decompression, AVI DIB frame unswizzling) and the decode
stages sniff the container by magic bytes and parse it. The fixtures
carry no media, so :func:`as_media_table` *encodes* real files with
deterministic dimensions and pixel bytes -- which means the oracle can
reconstruct the expected width/height/frame-count/pixel-md5 from
doc_id alone, and a decoder that faked the decode would hash-mismatch.

The honest limit that remains: true COMPRESSED video codecs
(H.264/VP9/AV1) need ffmpeg bindings absent from this container; such
a payload raises ``NotImplementedError`` and the metadata stage
degrades to length-derived features, mirroring the reference's
quarantine-not-crash philosophy (reference etl_pipeline.py:17-30).

At 100 TB: binary payloads ride in their own column so column pruning
skips them unless a decode stage needs them; decode runs Arrow-batched
executor-side (one Python worker per core, payloads never pass through
the driver), and modality filters push below the Python stage so a
frames-only consumer never decodes image/audio rows.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .media_codecs import (
    MediaFormatError,
    decode_avi,
    decode_bmp,
    decode_gif,
    decode_png,
    decode_wav,
    encode_avi,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_wav,
    sniff,
)

MEDIA_SCHEMA = "doc_id bigint, media_type string, payload binary"

MEDIA_META_SCHEMA = (
    "doc_id bigint, media_type string, width bigint, height bigint, "
    "n_frames bigint, content_hash string"
)

# Deterministic generation parameters -- shared contract between the
# encoder below and the DuckDB oracles in plans/multimodal_queries.py.
# Pixel/sample bytes stay in printable-ASCII range [32, 126] so the
# oracle can reconstruct the exact byte stream with chr()/string_agg().
_PIX_MOD, _PIX_OFF = 95, 32


def _image_dims(doc_id: int) -> tuple[int, int]:
    return doc_id % 13 + 4, doc_id % 11 + 4


def _image_pixels(doc_id: int) -> bytes:
    w, h = _image_dims(doc_id)
    return bytes((doc_id + i) % _PIX_MOD + _PIX_OFF for i in range(w * h))


def _audio_samples(doc_id: int) -> bytes:
    n = doc_id % 97 + 16
    return bytes((doc_id * 3 + i) % _PIX_MOD + _PIX_OFF for i in range(n))


def _video_dims(doc_id: int) -> tuple[int, int, int]:
    """(width, height, n_frames) of the GIF generated for doc_id."""
    return doc_id % 7 + 4, doc_id % 5 + 4, doc_id % 12 + 2


def _video_frames(doc_id: int) -> list[bytes]:
    w, h, nf = _video_dims(doc_id)
    return [
        bytes((doc_id + f * 7 + i) % _PIX_MOD + _PIX_OFF for i in range(w * h))
        for f in range(nf)
    ]


def _encode_payload(doc_id: int, media_type: str) -> bytes:
    if media_type == "image":
        w, h = _image_dims(doc_id)
        px = _image_pixels(doc_id)
        # Alternate container so BOTH decoders are exercised in every run.
        if doc_id % 6 == 0:
            return encode_png(w, h, px)
        return encode_bmp(w, h, px)
    if media_type == "audio":
        return encode_wav(_audio_samples(doc_id))
    w, h, _ = _video_dims(doc_id)
    # Alternate container so BOTH video decoders are exercised; frame
    # pixels are identical either way, so the metadata oracle is
    # container-agnostic (video doc_ids are 2 or 5 mod 6).
    if doc_id % 6 == 2:
        return encode_avi(w, h, _video_frames(doc_id))
    return encode_gif(w, h, _video_frames(doc_id))


def as_media_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Model a corpus as a multimodal table: (doc_id, media_type, payload).

    Payloads are REAL encoded files (PNG/BMP for image rows, WAV for
    audio rows, animated GIF or uncompressed AVI for video rows) built
    from deterministic doc_id-derived dimensions and pixel bytes.

    media_type is a RELATIONAL column and the payload a scalar
    pandas_udf PROJECTION (not an opaque mapInPandas): Catalyst pushes
    a downstream ``media_type = 'video'`` filter below the Arrow
    Python stage, so a consumer that wants one modality never pays the
    encode/decode of the others -- the difference between touching 1/3
    and 3/3 of a 100 TB corpus. Encoding still runs executor-side over
    Arrow batches, never on the driver.
    """
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )

    @F.pandas_udf("binary")
    def encode_payload(doc_id: pd.Series, media_type: pd.Series) -> pd.Series:
        return pd.Series(
            [_encode_payload(int(i), m) for i, m in zip(doc_id, media_type)]
        )

    # text_col is part of the corpus-table API but the deterministic
    # encoder derives everything from doc_id -- not feeding it through
    # the UDF keeps the text column out of the Arrow transfer entirely.
    del text_col
    return df.select(
        F.col(id_col).alias("doc_id"),
        mt.alias("media_type"),
        encode_payload(F.col(id_col), mt).alias("payload"),
    )


def decode_image(payload: bytes) -> dict:
    """REAL image decode: sniff PNG vs BMP by magic bytes, then parse
    the container (PNG: chunk walk + CRC verify + zlib inflate + filter
    reversal; BMP: header parse + bottom-up row unswizzle). Returns true
    decoded dimensions and an md5 of the raw pixel bytes."""
    kind = sniff(payload)
    if kind == "png":
        w, h, _, px = decode_png(payload)
    elif kind == "bmp":
        w, h, _, px = decode_bmp(payload)
    else:
        raise MediaFormatError("image payload is neither PNG nor BMP")
    return {
        "width": w,
        "height": h,
        "n_frames": 1,
        "content_hash": hashlib.md5(px).hexdigest(),
    }


def decode_audio(payload: bytes) -> dict:
    """REAL audio decode: RIFF chunk walk -> PCM samples."""
    n_samples, _, pcm = decode_wav(payload)
    return {
        "width": 0,
        "height": 0,
        "n_frames": n_samples,
        "content_hash": hashlib.md5(pcm).hexdigest(),
    }


def decode_video(payload: bytes) -> dict:
    """REAL video decode for animated GIFs (container walk, LZW
    decompression, palette lookup) and uncompressed AVIs (RIFF LIST
    traversal, DIB unswizzle) -- one pixel buffer per frame either
    way. True compressed codecs (H.264/VP9/AV1) need ffmpeg bindings
    absent from this container and raise NotImplementedError -- the
    metadata stage degrades those rather than failing the job."""
    kind = sniff(payload)
    if kind == "gif":
        w, h, frames = decode_gif(payload)
    elif kind == "avi":
        w, h, frames = decode_avi(payload)
    else:
        raise NotImplementedError(
            "compressed video decode requires ffmpeg bindings not "
            "present in this container"
        )
    return {
        "width": w,
        "height": h,
        "n_frames": len(frames),
        "content_hash": hashlib.md5(b"".join(frames)).hexdigest(),
    }


_DECODERS = {"image": decode_image, "audio": decode_audio, "video": decode_video}


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_hash string"

THUMB_SCHEMA = (
    "doc_id bigint, src_w bigint, src_h bigint, thumb_w bigint, "
    "thumb_h bigint, thumb_hash string"
)


def sample_frames(media: DataFrame, step: int = 5) -> DataFrame:
    """Frame-sampling stage: one output row per sampled frame (1->N
    fan-out inside mapInPandas -- the UDTF-shaped decode pattern).

    REAL kernel: each video payload is an animated GIF or an
    uncompressed AVI; the container is walked (sniffed by magic
    bytes), every ``step``-th frame is decoded to pixels (LZW
    decompression for GIF, DIB unswizzle for AVI), and the frame is
    identified by the md5 of its raw pixel bytes -- so the oracle
    (which reconstructs the same pixels from the generation formula)
    proves the frames were truly decoded in BOTH containers. Only
    video rows enter the Python stage: the media_type filter pushes
    below the encode projection, so image/audio rows are never even
    encoded.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                dec = decode_avi if sniff(raw) == "avi" else decode_gif
                _w, _h, frames = dec(raw)
                for i in range(0, len(frames), step):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(frames[i]).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_hash": hashes})

    videos = media.filter(F.col("media_type") == "video").select("doc_id", "payload")
    return videos.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


def resize_thumbnails(media: DataFrame, w: int = 16, h: int = 16) -> DataFrame:
    """Resize stage: REAL decode + nearest-neighbor resample over Arrow
    batches. Each image payload is decoded (PNG or BMP), resampled to
    ``w x h`` with nearest-neighbor (src_x = floor(x*W/w), src_y =
    floor(y*H/h)), and the thumbnail pixel bytes are md5'd -- so the
    oracle reconstructs the exact resample from the generation formula
    and a kernel that skipped the decode or the resample would mismatch.
    Image rows only, filtered before the Python stage.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sw, sh, hashes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                kind = sniff(raw)
                W, H, _, px = decode_png(raw) if kind == "png" else decode_bmp(raw)
                thumb = bytes(
                    px[(y * H // h) * W + (x * W // w)]
                    for y in range(h)
                    for x in range(w)
                )
                ids.append(doc_id)
                sw.append(W)
                sh.append(H)
                hashes.append(hashlib.md5(thumb).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "src_w": sw,
                    "src_h": sh,
                    "thumb_w": w,
                    "thumb_h": h,
                    "thumb_hash": hashes,
                }
            )

    images = media.filter(F.col("media_type") == "image").select("doc_id", "payload")
    return images.mapInPandas(resize_batches, schema=THUMB_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, n_samples bigint, sample_rate bigint, duration_us bigint, "
    "amp_sum bigint, amp_sq_sum bigint"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio feature-extraction stage: REAL WAV decode -> per-clip
    features (duration, amplitude sum, energy) -- the audio analog of
    frame sampling for a multimodal training pipeline (e.g. duration
    filtering and energy-based silence gating before transcription).

    Features are exact integers over the decoded PCM bytes, so the
    oracle reconstructs them from the generation formula and a kernel
    that skipped the RIFF parse would mismatch. Audio rows only,
    filtered below the encode projection.
    """

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n, rate, pcm = decode_wav(bytes(payload))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": n,
                        "sample_rate": rate,
                        "duration_us": n * 1_000_000 // rate,
                        "amp_sum": sum(pcm),
                        "amp_sq_sum": sum(b * b for b in pcm),
                    }
                )
            yield pd.DataFrame(rows)

    audio = media.filter(F.col("media_type") == "audio").select("doc_id", "payload")
    return audio.mapInPandas(feature_batches, schema=AUDIO_FEATURES_SCHEMA)


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """Decode/feature-extract stage: mapInPandas over Arrow batches.

    All three modalities go through the REAL decoders above (PNG/BMP,
    WAV, animated GIF, AVI). A payload in a codec we cannot parse (a
    true H.264 video -- NotImplementedError) OR a corrupt/truncated
    container (MediaFormatError, and the struct/zlib errors a malformed
    header can surface before our own validation does) degrades to
    length-derived features rather than failing the stage (quarantine
    philosophy of reference etl_pipeline.py:17-30).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for mt, payload in zip(pdf["media_type"], pdf["payload"]):
                raw = bytes(payload)
                try:
                    feats.append(_DECODERS[mt](raw))
                except (NotImplementedError, MediaFormatError, struct.error, zlib.error):
                    n = len(raw)
                    feats.append(
                        {
                            "width": n % 640,
                            "height": (n * 7) % 480,
                            "n_frames": n % 30 + 1,
                            "content_hash": hashlib.md5(raw).hexdigest(),
                        }
                    )
            fdf = pd.DataFrame(feats)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    **{c: fdf[c] for c in ("width", "height", "n_frames", "content_hash")},
                }
            )

    return media.mapInPandas(decode_batches, schema=MEDIA_META_SCHEMA)


SCENE_SCHEMA = (
    "doc_id bigint, frame_idx bigint, n_pixels bigint, abs_diff_sum bigint, "
    "is_cut bigint"
)


def detect_scene_changes(media: DataFrame, cut_mean_threshold: int = 20) -> DataFrame:
    """Temporal video analysis: per-transition frame-difference energy.

    REAL kernel over both video containers (GIF LZW / AVI DIB): every
    frame is decoded to raw pixel bytes and each consecutive-frame
    transition emits one row with the EXACT integer sum of per-pixel
    absolute differences -- so the oracle (which reconstructs the same
    pixels from the generation formula) proves a true temporal decode,
    and the features are bigint-exact with no float drift. A
    transition is flagged ``is_cut`` when its mean absolute difference
    exceeds ``cut_mean_threshold`` (integer compare:
    abs_diff_sum > threshold * n_pixels). frame_idx is the TARGET
    frame of the transition (1..n_frames-1).

    Video rows only enter the Arrow stage (filter below the encode
    projection); single-frame videos emit no rows.
    """

    def scene_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, npx, sums, cuts = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                dec = decode_avi if sniff(raw) == "avi" else decode_gif
                _w, _h, frames = dec(raw)
                for f in range(1, len(frames)):
                    a, b = frames[f - 1], frames[f]
                    s = sum(abs(x - y) for x, y in zip(a, b))
                    n = len(a)
                    ids.append(doc_id)
                    idxs.append(f)
                    npx.append(n)
                    sums.append(s)
                    cuts.append(1 if s > cut_mean_threshold * n else 0)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "n_pixels": npx,
                    "abs_diff_sum": sums,
                    "is_cut": cuts,
                }
            )

    videos = media.filter(F.col("media_type") == "video").select("doc_id", "payload")
    return videos.mapInPandas(scene_batches, schema=SCENE_SCHEMA)


AHASH_SCHEMA = "doc_id bigint, src_w bigint, src_h bigint, ahash string"


def perceptual_ahash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Average-hash (aHash) perceptual image fingerprints.

    REAL kernel: decode (PNG or BMP), nearest-neighbor resample to
    ``grid`` x ``grid``, then one bit per cell -- 1 iff the cell
    exceeds the thumbnail mean. The mean compare is exact integer
    arithmetic (px * grid^2 > sum), so the hash is bit-identical in
    the SQL oracle with no float anywhere.

    This is the container-independent image-dedup primitive: the SAME
    pixels encoded as PNG and as BMP produce the SAME ahash (proven in
    tests), so grouping by ahash catches re-encoded/duplicate images
    the byte-level exact dedup can never see. Near-dup extends by
    hamming distance over the bit string -- same banding trick as
    SimHash. Image rows only; Arrow-batched.
    """
    n_cells = grid * grid

    def ahash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, hashes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                kind = sniff(raw)
                W, H, _, px = decode_png(raw) if kind == "png" else decode_bmp(raw)
                cells = [
                    px[(y * H // grid) * W + (x * W // grid)]
                    for y in range(grid)
                    for x in range(grid)
                ]
                s = sum(cells)
                ids.append(doc_id)
                ws.append(W)
                hs.append(H)
                hashes.append("".join("1" if c * n_cells > s else "0" for c in cells))
            yield pd.DataFrame(
                {"doc_id": ids, "src_w": ws, "src_h": hs, "ahash": hashes}
            )

    images = media.filter(F.col("media_type") == "image").select("doc_id", "payload")
    return images.mapInPandas(ahash_batches, schema=AHASH_SCHEMA)


AUDIO_FP_SCHEMA = "doc_id bigint, n_samples bigint, n_frames bigint, fingerprint string"


def audio_fingerprint(media: DataFrame, frame: int = 8) -> DataFrame:
    """Chromaprint-style audio fingerprints from REAL WAV decode.

    The PCM stream splits into fixed ``frame``-sample windows (partial
    trailing window dropped); each adjacent window pair contributes
    one bit -- 1 iff the later window's energy (exact integer sum of
    sample bytes) exceeds the earlier's. Energy-delta signs are what
    real audio fingerprinters (Chromaprint/Shazam) quantize, reduced
    here to integer-exact arithmetic so the oracle reconstructs the
    identical bit string from the generation formula. Like the image
    aHash, equal PCM fingerprints identically regardless of container
    framing, and near-dup matching extends by hamming banding.
    Single-window clips emit an empty fingerprint. Audio rows only.
    """

    def fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, nf, fps = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_samples, _, pcm = decode_wav(bytes(payload))
                frames = [
                    sum(pcm[i : i + frame]) for i in range(0, (len(pcm) // frame) * frame, frame)
                ]
                ids.append(doc_id)
                ns.append(n_samples)
                nf.append(len(frames))
                fps.append(
                    "".join(
                        "1" if frames[f + 1] > frames[f] else "0"
                        for f in range(len(frames) - 1)
                    )
                )
            yield pd.DataFrame(
                {"doc_id": ids, "n_samples": ns, "n_frames": nf, "fingerprint": fps}
            )

    audio = media.filter(F.col("media_type") == "audio").select("doc_id", "payload")
    return audio.mapInPandas(fp_batches, schema=AUDIO_FP_SCHEMA)


DECODABLE_SCHEMA = "doc_id bigint, media_type string, decodable boolean, error string"


def probe_decodable(media: DataFrame) -> DataFrame:
    """Per-payload decodability audit: (doc_id, media_type, decodable,
    error) via the REAL decoders -- the media analog of
    sources.formats.scan_corrupt_files (and of curation.
    quarantine_nonfinite): corruption is audited and PUBLISHED, never
    silently skipped.

    Exists because the per-frame decode stages (sample_frames,
    resize_thumbnails, perceptual_ahash, ...) intentionally have no
    error branch -- their outputs are per-frame/per-thumb rows where a
    degraded placeholder would be indistinguishable from real pixels
    (the same silent-wrongness extract_media_metadata's length-derived
    fallback avoids by construction, documented there). So ONE corrupt
    object in a 100 TB decode job kills the stage (measured posture,
    pinned in tests). The production composition is
    probe -> :func:`filter_decodable` -> decode stage. The probe is a
    full decode pass -- headers-only would be cheaper but cannot catch
    mid-stream corruption (truncated LZW, bad IDAT), the same trade
    scan_corrupt_files documents for row formats.
    """

    def probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            oks, errs = [], []
            for mt, payload in zip(pdf["media_type"], pdf["payload"]):
                if payload is None:
                    # a NULL payload is undecodable BY the probe, not a
                    # probe crash: bytes(None) raises TypeError, which
                    # must not kill the very stage that exists to stop
                    # one bad object from killing stages
                    oks.append(False)
                    errs.append("null payload")
                    continue
                try:
                    _DECODERS[mt](bytes(payload))
                    oks.append(True)
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 -- audit path:
                    # a hostile payload can raise OUTSIDE any fixed
                    # tuple (MemoryError/OverflowError from an
                    # adversarially large declared dimension driving a
                    # huge buffer allocation, an unexpected ValueError)
                    # and the probe exists precisely to stop one bad
                    # object from killing stages -- record type+message
                    # instead of dying (ADVICE r9). The narrow tuple
                    # stays on the metadata DEGRADE path (media_meta),
                    # where silently swallowing an unexpected error
                    # class would be silent-wrongness.
                    oks.append(False)
                    errs.append(f"{type(e).__name__}: {str(e)[:120]}")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "decodable": oks,
                    "error": errs,
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        probe_batches, schema=DECODABLE_SCHEMA
    )


#: Max undecodable ids filter_decodable will broadcast; past it the
#: "corruption is rare" assumption has failed (wrong-format bucket,
#: mass truncation) and the anti join falls back to a shuffled join
#: rather than OOM the driver -- the same bound-and-fall-back contract
#: as dedup.LSH_OVERSIZED_BROADCAST_MAX.
BAD_IDS_BROADCAST_MAX = 10_000_000


def filter_decodable(
    media: DataFrame, bad_broadcast_max: int = BAD_IDS_BROADCAST_MAX
) -> DataFrame:
    """Media rows whose payload the real decoder accepts -- the
    pre-decode gate that keeps one corrupt object from killing a
    100 TB frame-sample/resize job.

    Plan shape matters here: the UNDECODABLE id list is small by
    nature (corruption is the exception), so it broadcasts into a
    left_anti join -- payloads never cross an exchange. A semi-join on
    the full probe output would shuffle every payload byte; the anti
    side is the one that is bounded. The bad id list is
    localCheckpoint-materialized first (EAGER: the probe decode pass
    runs here, once) so the size guard and the join reuse one pass
    instead of decoding the corpus twice; mass-corruption inputs past
    ``bad_broadcast_max`` fall back to a shuffled anti join with a
    warning (payloads then do shuffle -- survival beats locality when
    most of the corpus is bad anyway).
    """
    bad = (
        probe_decodable(media)
        .filter(~F.col("decodable"))
        .select("doc_id")
        .localCheckpoint()
    )
    n_bad = bad.limit(bad_broadcast_max + 1).count()
    if n_bad > bad_broadcast_max:
        import warnings

        warnings.warn(
            f"filter_decodable: {n_bad}+ undecodable payloads exceed "
            f"bad_broadcast_max={bad_broadcast_max}; mass corruption -- "
            f"falling back to a shuffled anti join (payloads will cross "
            f"an exchange). Audit the source with probe_decodable.",
            RuntimeWarning,
            stacklevel=2,
        )
        return media.join(bad, "doc_id", "left_anti")
    return media.join(F.broadcast(bad), "doc_id", "left_anti")
